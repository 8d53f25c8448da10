"""Engine-portable hashing primitives (dedup/LSH substrate).

Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` are different
functions, so any operator whose *output* (or grouping) depends on a
hash value could never pass the DuckDB oracle gate if it used them.
Every hashed operator in this engine therefore builds on **md5**,
which both engines implement identically (RFC 1321), with the first 8
hex chars reinterpreted as a 32-bit unsigned int when a numeric hash
is needed.

Each helper returns a *pair of expression strings* — one Spark SQL,
one DuckDB SQL — generated from the same template so the twins cannot
drift apart. Spark callers wrap the string in ``F.expr``.

At 100 TB scale md5 is ~2-3× slower per byte than xxhash64; the
operators accept a ``portable=False`` escape hatch that swaps in
``xxhash64`` for production runs where oracle comparability is not
required (the structure of the plan is identical).
"""

from __future__ import annotations

HASH_BITS = 32
#: number of distinct md5-derived hash functions available via seeds
MAX_SEED = 2**31


def spark_hash32(expr: str, seed: int = 0) -> str:
    """Spark SQL: 32-bit unsigned int hash of a string expression."""
    return (
        f"cast(conv(substring(md5(concat({expr}, ':', {seed})), 1, 8), 16, 10)"
        f" as bigint)"
    )


def duck_hash32(expr: str, seed: int = 0) -> str:
    """DuckDB twin of :func:`spark_hash32` (verified bit-identical)."""
    return (
        f"CAST(concat('0x', substring(md5(concat({expr}, ':', '{seed}')), 1, 8))"
        f" AS BIGINT)"
    )


def spark_xxhash32(expr: str, seed: int = 0) -> str:
    """Production (non-portable) variant: xxhash64 folded to 32 bits.

    Same value range as :func:`spark_hash32` so downstream band/bucket
    arithmetic is unchanged; ~2-3× cheaper per byte.
    """
    return f"(xxhash64(concat({expr}, ':', {seed})) & 4294967295)"
