from .scalar import dec_avg, dec_sum, null_safe_div  # noqa: F401
