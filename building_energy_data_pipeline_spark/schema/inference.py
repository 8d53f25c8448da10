"""Type inference (SURVEY §1.4, §2.9 T10) — the reference's 3-tier
engine (``src/schema_generator/type_inference_engine.py:26-133``) as
a pure function over a :class:`ColumnProfile`, decoupled from pandas
so the same logic runs on stats gathered by one Spark ``agg`` pass
(``profiler.py``).

Tiers (exact reference parity, golden-tested):

1. column-NAME pattern override (direct match, then substring) —
   ``type_inference_engine.py:38-69``;
2. VALUE-based narrowing — ints sized by min/max into
   SMALLINT/INTEGER/BIGINT (``:93-100``); floats by max decimal
   places into INTEGER / NUMERIC(15,2) / NUMERIC(12,6) /
   DOUBLE PRECISION (``:103-118``); BOOLEAN (``:121-122``);
   TIMESTAMP [WITH TIME ZONE] (``:125-128``);
3. string fallback — ``VARCHAR(max_len)`` if ≤ 255 else TEXT
   (``:131-133``).

Documented divergence: the reference measures string length over
``astype(str)`` (so NaN counts as the 3-char string ``'nan'``); we
measure non-null values only.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

#: reference COLUMN_TYPE_PATTERNS (``type_inference_engine.py:38-51``)
#: — insertion order matters for the substring pass.
COLUMN_TYPE_PATTERNS: dict[str, str] = {
    "lat": "NUMERIC(10,6)",
    "latitude": "NUMERIC(10,6)",
    "lng": "NUMERIC(10,6)",
    "longitude": "NUMERIC(10,6)",
    "price": "NUMERIC(15,2)",
    "amount": "NUMERIC(15,2)",
    "cost": "NUMERIC(15,2)",
    "zip": "VARCHAR(10)",
    "zipcode": "VARCHAR(10)",
    "postal": "VARCHAR(10)",
    "email": "VARCHAR(255)",
    "phone": "VARCHAR(20)",
}


@dataclass
class ColumnProfile:
    """Everything tier 2/3 needs, computable in one Spark agg pass."""

    name: str
    kind: str  # 'numeric' | 'boolean' | 'timestamp' | 'string' | 'empty'
    count: int = 0  # non-null values
    min_val: float | None = None
    max_val: float | None = None
    all_integral: bool = False
    max_decimal_places: int = 0
    max_str_len: int = 0
    has_tz: bool = False


def _pattern_type(column_name: str) -> str | None:
    low = column_name.lower()
    if low in COLUMN_TYPE_PATTERNS:
        return COLUMN_TYPE_PATTERNS[low]
    for pattern, sql_type in COLUMN_TYPE_PATTERNS.items():
        if pattern in low:
            return sql_type
    return None


def infer_sql_type(p: ColumnProfile) -> str:
    """Reference ``infer_type`` (``type_inference_engine.py:71-133``)."""
    predefined = _pattern_type(p.name)
    if predefined:
        return predefined
    if p.kind == "empty" or p.count == 0:
        return "TEXT"
    if p.kind == "numeric":
        if p.all_integral:
            if p.min_val >= -32768 and p.max_val <= 32767:
                return "SMALLINT"
            if p.min_val >= -2147483648 and p.max_val <= 2147483647:
                return "INTEGER"
            return "BIGINT"
        if p.max_decimal_places == 0:
            return "INTEGER"
        low = p.name.lower()
        if "price" in low or "amount" in low:
            return "NUMERIC(15,2)"
        if p.max_decimal_places <= 6:
            return "NUMERIC(12,6)"
        return "DOUBLE PRECISION"
    if p.kind == "boolean":
        return "BOOLEAN"
    if p.kind == "timestamp":
        return "TIMESTAMP WITH TIME ZONE" if p.has_tz else "TIMESTAMP"
    return f"VARCHAR({p.max_str_len})" if p.max_str_len <= 255 else "TEXT"


#: SURVEY §1.3 SQL→Spark mapping
_SQL_TO_SPARK: dict[str, T.DataType] = {
    "SMALLINT": T.ShortType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "REAL": T.FloatType(),
    "DOUBLE PRECISION": T.DoubleType(),
    "TEXT": T.StringType(),
    "BOOLEAN": T.BooleanType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampNTZType(),
    "TIMESTAMP WITH TIME ZONE": T.TimestampType(),
    "JSON": T.StringType(),
    "JSONB": T.StringType(),
}


def sql_to_spark_type(sql_type: str) -> T.DataType:
    """Map an inferred SQL type string to the Spark type (VARCHAR(n)
    length and JSON-ness are metadata only — StringType in Spark)."""
    up = sql_type.upper()
    if up.startswith("VARCHAR"):
        return T.StringType()
    if up.startswith("NUMERIC"):
        inside = up[up.index("(") + 1 : up.index(")")]
        prec, scale = (int(x) for x in inside.split(","))
        return T.DecimalType(prec, scale)
    if up in _SQL_TO_SPARK:
        return _SQL_TO_SPARK[up]
    raise ValueError(f"unknown SQL type: {sql_type!r}")
