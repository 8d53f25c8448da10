from .transforms import (  # noqa: F401
    clean_identifier,
    coerce_int64,
    melt_wide,
    normalize_min_max,
    apply_chunked,
    transform_sources,
)
from .loader import (  # noqa: F401
    OverlapResult,
    check_data_overlap,
    validate_unique,
    write_idempotent,
)
