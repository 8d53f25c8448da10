from .ingest import (  # noqa: F401
    dedup_stream,
    enrich_stream,
    read_meter_stream,
    windowed_rollup,
    write_stream_idempotent,
    write_stream_parquet,
)
from .stateful import event_gap_stats, meter_gap_stats  # noqa: F401
from .statestore import (  # noqa: F401
    ROCKSDB_PROVIDER,
    enable_rocksdb_state,
    read_state,
    read_state_metadata,
    restore_state_conf,
    rocksdb_metrics,
    rocksdb_state_conf,
)
