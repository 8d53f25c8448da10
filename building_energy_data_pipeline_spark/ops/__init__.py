from .maintenance import (  # noqa: F401
    compact,
    recover_compact,
    restore_table,
    snapshot_table,
    table_health,
)
from .sessionctl import (  # noqa: F401
    active_job_ids,
    active_stage_ids,
    cancel_job_group,
    run_in_job_group,
    run_with_timeout,
)
from .observe import QueryHistory, explain_analyze, explain_str, shuffle_count  # noqa: F401
from .access import AccessControl  # noqa: F401
from .tls import (  # noqa: F401
    configure_spark_ssl,
    generate_self_signed_cert,
    validate_certificate,
)
