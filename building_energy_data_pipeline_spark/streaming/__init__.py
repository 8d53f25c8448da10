from .ingest import (  # noqa: F401
    dedup_stream,
    enrich_stream,
    read_meter_stream,
    windowed_rollup,
    write_stream_idempotent,
    write_stream_parquet,
)
from .stateful import event_gap_stats, meter_gap_stats  # noqa: F401
