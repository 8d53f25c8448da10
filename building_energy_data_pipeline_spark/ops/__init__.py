from .maintenance import compact, recover_compact, table_health  # noqa: F401
from .sessionctl import (  # noqa: F401
    active_job_ids,
    active_stage_ids,
    cancel_job_group,
    run_in_job_group,
    run_with_timeout,
)
from .observe import QueryHistory, explain_str  # noqa: F401
