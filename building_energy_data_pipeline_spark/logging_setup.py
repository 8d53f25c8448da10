"""Logging configuration — the engine's equivalent of the reference's
``src/logging_configuration/logging_config.py:5-37`` (tested at
``reference/tests/test_logging.py:10-188``): root logger at DEBUG,
console handler at INFO, rotating file handler at DEBUG (5 MiB × 3
backups by default), one shared ``name - level - message`` format.

Differences from the reference, on purpose:

- idempotent: re-invoking replaces the handlers this module installed
  instead of stacking duplicates (the reference's own test suite
  expects non-duplication);
- the log directory is created if missing (the reference crashes on a
  fresh checkout without ``./logs``);
- this configures the PYTHON side only. Spark's JVM logging is
  controlled by ``SparkContext.setLogLevel`` / log4j2 — see
  ``session.get_spark``.
"""

from __future__ import annotations

import logging
from logging.handlers import RotatingFileHandler
from pathlib import Path

DEFAULT_MAX_BYTES = 5 * 1024 * 1024
DEFAULT_BACKUP_COUNT = 3
_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"

#: marker attribute so repeat calls replace exactly our handlers
_OWNED = "_bedp_spark_logging_handler"


def setup_logging(
    log_file: str | Path | None = None,
    max_bytes: int = DEFAULT_MAX_BYTES,
    backup_count: int = DEFAULT_BACKUP_COUNT,
) -> logging.Logger:
    """Configure the root logger; returns it for convenience."""
    path = Path(log_file) if log_file else Path.cwd() / "logs" / "application.log"
    path.parent.mkdir(parents=True, exist_ok=True)

    root = logging.getLogger()
    root.setLevel(logging.DEBUG)

    for handler in [h for h in root.handlers if getattr(h, _OWNED, False)]:
        root.removeHandler(handler)
        handler.close()

    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    file_handler = RotatingFileHandler(
        str(path), maxBytes=max_bytes, backupCount=backup_count
    )
    file_handler.setLevel(logging.DEBUG)

    formatter = logging.Formatter(_FORMAT)
    for handler in (console, file_handler):
        handler.setFormatter(formatter)
        setattr(handler, _OWNED, True)
        root.addHandler(handler)
    return root
