from .maintenance import compact, table_health  # noqa: F401
from .observe import QueryHistory, explain_str  # noqa: F401
