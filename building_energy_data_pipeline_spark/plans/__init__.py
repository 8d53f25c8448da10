"""Importing this package registers every query module's specs."""

from .registry import HEADLINE, QuerySpec, REGISTRY  # noqa: F401
from . import queries  # noqa: F401  (relational surface q01–q25)
from . import training_queries  # noqa: F401  (dedup/similarity/text q26–q35)
from . import extended_queries  # noqa: F401  (asof/percentile/json q36–q40)
from . import window_queries  # noqa: F401  (windows/sessions/clusters q41–q44)
from . import olap_queries  # noqa: F401  (rollup/cube/range-join/set-ops q45–q51)
from . import streaming_queries  # noqa: F401  (streaming-executed rollup q52, session windows q62)
from . import multimodal_queries  # noqa: F401  (binary media columns q53–q54)
from . import array_queries  # noqa: F401  (explode/higher-order/pivot q59–q61)
