"""Cross-engine deterministic 60-bit hash ("portable mode").

The engine's fast hash is ``xxhash64`` (JVM-side, zero-copy) — but it is
Spark-specific, so hash-derived operators (MinHash, SimHash, hyperplane
LSH, HLL) built on it cannot be twinned in an external SQL engine. Portable
mode swaps in ``hash60``: the first 15 hex digits of md5, parsed as an
integer — a uniform 60-bit value any engine with ``md5()`` can compute
bit-identically (DuckDB: ``cast('0x' || substr(md5(x),1,15) as bigint)``).

60 bits (not 64) keeps every value strictly positive in a signed BIGINT on
both engines, which makes ``min``/comparison/shift semantics trivially
identical. Parity is pinned by tests/test_portable_hash.py across Spark,
DuckDB and Python's hashlib.

Use portable mode for cross-engine verification and reproducibility
contracts; use the (faster) xxhash64 default for production throughput —
the operator shapes (shuffles, bucketing) are identical.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH60_BITS = 60
HASH60_MAX = (1 << 60) - 1


def hash60(c: Column) -> Column:
    """Spark: 60-bit md5-derived hash of a string column (non-negative)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_py(s: str) -> int:
    """Driver-side twin of :func:`hash60` (same bytes -> same value)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def hash60_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`hash60` over an arbitrary expression."""
    return f"cast(concat('0x', substr(md5({expr}), 1, 15)) as bigint)"
