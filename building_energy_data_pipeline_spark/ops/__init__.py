from .maintenance import compact, recover_compact, table_health  # noqa: F401
from .observe import QueryHistory, explain_str  # noqa: F401
