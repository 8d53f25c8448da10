from .ingest import (  # noqa: F401
    dedup_stream,
    read_meter_stream,
    windowed_rollup,
    write_stream_parquet,
)
from .stateful import meter_gap_stats  # noqa: F401
