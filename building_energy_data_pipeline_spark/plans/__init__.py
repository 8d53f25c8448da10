from .queries import HEADLINE, REGISTRY, QuerySpec  # noqa: F401
