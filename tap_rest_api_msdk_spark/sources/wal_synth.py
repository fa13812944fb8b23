"""FX4/FX6 — deterministic synthetic change-event WAL over the
source-code-repo subject table (BASELINE input_hint:
``(repo, path, commit, lang, content)``).

Everything is generated **distributed and column-native** from
``spark.range`` — no driver-side loops, no Python UDFs — so the same
generator scales from the 5k-row unit fixture to a 10^10-event cluster run:
every column is a deterministic pure function of the row id (seed folded
into the hashes), which also makes the DuckDB oracle reproducible.

Shape choices mirror the reference model:
- ``seq``       monotonic replication key (tap.py:71-77 analog)
- ``ts``        event time (start_date seeding, tap.py:100-107)
- ``repo/path`` merge keys (primary_keys analog, tap.py:66-70); repo draws
                from a Zipf-ish skew so hot-repo salting (SURVEY M7) is
                actually exercised
- ``commit``    hex LWW tie-break after seq
- ``op``        upsert | delete (engine CDC extension; reference has none)
- ``payload``   nested JSON (content + metadata struct + tags array) that
                the F1 flatten kernel processes
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "rs", "go", "java", "ts", "c"]


def synth_repo_wal(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 50,
    n_paths: int = 200,
    skew: float = 3.0,
    delete_mod: int = 50,
    seed: int = 42,
    evolve_at: int | None = None,
    partitions: int | None = None,
    shredded: bool = False,
) -> DataFrame:
    """Deterministic CDC event log; columns are pure functions of ``id``.

    ``skew`` > 1 concentrates events on low repo ids (hot repos).
    ``delete_mod``: one delete per ~delete_mod events.
    ``evolve_at``: events with seq >= evolve_at carry an extra payload field
    ``stars`` and a widened double ``size`` (FX6 schema-evolution fixture);
    ``to_json`` drops null fields, so earlier events simply lack them.

    ``shredded=True`` emits the payload as a NATIVE STRUCT column instead
    of a JSON string — the pre-shredded columnar WAL format (a Debezium->
    parquet landing zone that shreds at ingest). Replay over it skips the
    JSON parse entirely (the r1-measured CPU bound), reads only the payload
    fields a query projects (columnar pruning inside the struct), and
    needs no schema inference — the parquet schema IS the payload schema.
    """
    df = spark.range(0, n_events, numPartitions=partitions or max(4, n_events // 250_000))
    sid = F.lit(int(seed))
    h1 = F.abs(F.xxhash64(F.col("id"), sid))
    h2 = F.abs(F.xxhash64(F.col("id"), sid + F.lit(1)))
    h3 = F.abs(F.xxhash64(F.col("id"), sid + F.lit(2)))

    # Zipf-ish repo skew: u in [0,1) -> floor(R * u^skew)
    u = (h1 % F.lit(1_000_000)).cast("double") / F.lit(1_000_000.0)
    repo_id = F.floor(F.pow(u, F.lit(float(skew))) * F.lit(n_repos)).cast("long")
    path_id = (h2 % F.lit(n_paths)).cast("long")

    repo = F.format_string("org/repo-%04d", repo_id)
    path = F.format_string(
        "src/%s/file_%04d.%s",
        F.element_at(F.lit(LANGS), (path_id % F.lit(len(LANGS)) + F.lit(1)).cast("int")),
        path_id,
        F.element_at(F.lit(LANGS), (path_id % F.lit(len(LANGS)) + F.lit(1)).cast("int")),
    )
    lang = F.element_at(F.lit(LANGS), (path_id % F.lit(len(LANGS)) + F.lit(1)).cast("int"))
    commit = F.substring(F.sha2(F.concat_ws("|", repo, path, F.col("id").cast("string")), 256), 1, 12)
    op = F.when(h3 % F.lit(delete_mod) == 0, F.lit("delete")).otherwise(F.lit("upsert"))
    content = F.format_string(
        "// %s:%s@%s\nfn item_%d() -> u64 { %d }\n",
        repo, path, commit, path_id, F.col("id"),
    )
    size_long = (h2 % F.lit(100_000)).cast("long")

    meta_base = [
        F.col("lang").alias("lang"),
        F.struct(
            F.format_string("dev-%03d", (h3 % F.lit(500))).alias("name"),
            F.format_string("dev-%03d@example.com", (h3 % F.lit(500))).alias("email"),
        ).alias("author"),
    ]
    if evolve_at is None:
        size_col = size_long.alias("size")
        stars_col = F.lit(None).cast("long").alias("stars")
    else:
        size_col = (
            F.when(F.col("id") >= F.lit(int(evolve_at)), size_long.cast("double") + F.lit(0.5))
            .otherwise(size_long.cast("double"))
            .alias("size")
        )
        stars_col = (
            F.when(F.col("id") >= F.lit(int(evolve_at)), (h1 % F.lit(10_000)).cast("long"))
            .cast("long")
            .alias("stars")
        )

    payload_struct = F.struct(
        F.col("content").alias("content"),
        F.struct(*meta_base, size_col, stars_col).alias("metadata"),
        F.array(F.col("lang"), F.lit("synthetic")).alias("tags"),
    )
    out = (
        df.withColumn("repo", repo)
        .withColumn("path", path)
        .withColumn("lang", lang)
        .withColumn("commit", commit)
        .withColumn("op", op)
        .withColumn("content", content)
        .select(
            F.col("id").alias("seq"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
            F.col("repo"),
            F.col("path"),
            F.col("commit"),
            F.col("lang"),
            F.col("op"),
            (payload_struct if shredded else F.to_json(payload_struct)).alias("payload"),
        )
    )
    return out


def write_wal_slices(
    df: DataFrame, wal_dir: str, n_slices: int, seq_col: str = "seq"
) -> list[str]:
    """Materialize the WAL as numbered parquet slice files.

    Slices partition the seq domain contiguously (like rotated binlog
    files); a file-streaming source tails the directory in slice order.
    Returns slice paths in commit order.
    """
    import glob
    import shutil

    os.makedirs(wal_dir, exist_ok=True)
    bounds = df.agg(F.min(seq_col), F.max(seq_col)).collect()[0]
    lo, hi = bounds[0], bounds[1]
    span = (hi - lo + 1) if hi is not None else 0
    paths = []
    for i in range(n_slices):
        s = lo + (span * i) // n_slices
        e = lo + (span * (i + 1)) // n_slices
        tmp_dir = os.path.join(wal_dir, f".tmp-slice-{i:05d}")
        (
            df.filter((F.col(seq_col) >= s) & (F.col(seq_col) < e))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp_dir)
        )
        # a WAL slice is ONE plain file (binlog-rotation model); the file
        # streaming source lists plain files, not nested dirs
        part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
        slice_path = os.path.join(wal_dir, f"slice-{i:05d}.parquet")
        os.replace(part, slice_path)
        shutil.rmtree(tmp_dir)
        paths.append(slice_path)
    return paths
