"""Observability (SURVEY §2.10 C9/C13/C14).

- :func:`explain_str` — C9 EXPLAIN passthrough as a string (the
  reference captures PostgreSQL EXPLAIN JSON,
  ``postgres_manager.py:1134-1151``).
- :class:`QueryHistory` — C14: the reference records its last 1 000
  queries with latency by wrapping its own ``execute_query``
  (``postgres_manager.py:99-100,418-428``); this is the same wrapper
  pattern around DataFrame actions, plus C13's result caching.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """C9: the physical plan as a string (``df.explain`` prints to
    stdout; tooling wants the text)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


@dataclass
class QueryRecord:
    name: str
    duration_s: float
    started_at: float
    n_rows: int | None


class QueryHistory:
    """Ring buffer of executed queries with latency (C14) and an
    optional per-name DataFrame cache (C13: the reference LRU-caches
    SELECT results keyed by SQL+params; here the cache is Spark's
    own ``persist`` — cluster-wide, partition-granular)."""

    def __init__(self, maxlen: int = 1000):
        self.records: deque[QueryRecord] = deque(maxlen=maxlen)
        self._cached: dict[str, DataFrame] = {}

    def run(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        action: Callable[[DataFrame], Any] | None = None,
        cache: bool = False,
    ) -> Any:
        """Execute ``fn`` (a DataFrame program), time its action
        (default ``count``), record it, and return the action's
        result."""
        t0 = time.time()
        df = fn()
        if cache:
            if name not in self._cached:
                self._cached[name] = df.persist()
            df = self._cached[name]
        result = (action or (lambda d: d.count()))(df)
        self.records.append(
            QueryRecord(
                name=name,
                duration_s=time.time() - t0,
                started_at=t0,
                n_rows=result if isinstance(result, int) else None,
            )
        )
        return result

    def clear_cache(self) -> None:
        for df in self._cached.values():
            df.unpersist()
        self._cached.clear()

    def stats(self) -> dict[str, Any]:
        """Fold the ring buffer the way the reference folds load
        statistics (``data_loader.py:938-979``)."""
        if not self.records:
            return {"n_queries": 0}
        durs = sorted(r.duration_s for r in self.records)
        return {
            "n_queries": len(durs),
            "total_s": sum(durs),
            "mean_s": sum(durs) / len(durs),
            "p50_s": durs[len(durs) // 2],
            "max_s": durs[-1],
        }
