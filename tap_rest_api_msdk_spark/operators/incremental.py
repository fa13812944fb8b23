"""F10/F11/F3 — incremental replication filter, result limit, bookmarks.

Reference semantics:

* F10 — ``replication_key`` names a monotonically increasing field; each
  run filters server-side ``rk > $last_run_date``
  (/root/reference/tap_rest_api_msdk/streams.py:373-390, 426-443, 556-573).
  Spark: a plain ``filter(col(rk) > lit(bookmark))`` — Catalyst pushes it
  into the Parquet scan (PushedFilters) and prunes row groups via min/max
  stats, the distributed analog of the tap's server-side filter AND of the
  descending-scan early exit (pagination.py:182-218).
* F11 — ``pagination_results_limit``: the SDK aborts at the limit
  (streams.py:191-209); header-link style exits cleanly
  (pagination.py:152-161). Spark: ``df.limit(n)`` (clean stop; the
  "raises" flavor is surfaced as a planner-side cap, see plans/planner.py).
* F3 — bookmark resolution (utils.py:99-115): datetime bookmarks are
  *string-serialized* as ``%Y-%m-%dT%H:%M:%S`` — timezone and sub-second
  TRUNCATED. We replicate the truncation only in the serialized STATE
  representation; comparisons always use native types (SURVEY §4 note).
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOOKMARK_DATETIME_FORMAT = "%Y-%m-%dT%H:%M:%S"  # utils.py:113


def incremental_filter(
    df: DataFrame, replication_key: str, bookmark: Any, inclusive: bool = False
) -> DataFrame:
    """``rk > bookmark`` pushdown filter; no-op when bookmark is None/''.

    Type-aware seeding: a datetime ``start_date`` seed only applies to a
    timestamp replication key (the reference's get_starting_timestamp path,
    utils.py:99-115); a non-numeric string seed against a numeric rk is
    ignored (full replay) instead of producing an un-castable predicate.
    """
    if bookmark is None or bookmark == "":
        return df
    import datetime as _dt

    from pyspark.sql import types as T

    rk_type = df.schema[replication_key].dataType
    lit = F.lit(bookmark)
    if isinstance(rk_type, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        if isinstance(bookmark, str):
            lit = F.lit(bookmark).cast(rk_type)
        elif isinstance(bookmark, (_dt.datetime, _dt.date)):
            lit = F.lit(bookmark)
    elif isinstance(rk_type, T.NumericType) and isinstance(bookmark, str):
        try:
            lit = F.lit(float(bookmark) if "." in bookmark else int(bookmark))
        except ValueError:
            return df  # seed not applicable to this key type -> full replay
    col = F.col(replication_key)
    return df.filter(col >= lit if inclusive else col > lit)


def result_limit(df: DataFrame, limit: Optional[int]) -> DataFrame:
    """F11 result cap. Documented divergence: clean stop, never raises."""
    return df if not limit else df.limit(int(limit))


def serialize_bookmark(value: Any) -> Any:
    """STATE string form of a bookmark, with the reference's truncation.

    datetime -> "%Y-%m-%dT%H:%M:%S" (tz + microseconds dropped,
    utils.py:113); anything else passes through (the
    ``get_starting_replication_key_value`` fallback, utils.py:115).
    """
    if isinstance(value, dt.datetime):
        return value.strftime(BOOKMARK_DATETIME_FORMAT)
    return value


def compute_high_watermark(df: DataFrame, replication_key: str) -> Any:
    """Max observed replication-key value in a batch (the next bookmark)."""
    row = df.agg(F.max(F.col(replication_key)).alias("hw")).collect()[0]
    return row["hw"]
