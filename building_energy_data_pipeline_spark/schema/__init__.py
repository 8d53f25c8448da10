from .inference import ColumnProfile, infer_sql_type, sql_to_spark_type  # noqa: F401
from .profiler import ColumnInfo, profile_columns, is_monotonic  # noqa: F401
from .sampling import (  # noqa: F401
    random_sample,
    stratified_sample,
    systematic_sample,
)
from .ddl import (  # noqa: F401
    derive_table_name,
    generate_ddl,
    schema_diff,
)
