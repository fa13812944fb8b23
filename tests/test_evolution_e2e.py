"""FX6 end-to-end: payload schema drift across micro-batches -> additive
lake-table evolution (new column appears, nulls backfilled, int->double
widening; discovered schemas track drift, supplied schemas stay fixed)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig, run_batch_replay

N = 4000
EVOLVE_AT = 2000


@pytest.fixture(scope="module")
def evolving_wal(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ewal"))
    synth_repo_wal(
        spark, N, n_repos=8, n_paths=30, evolve_at=EVOLVE_AT
    ).write.mode("overwrite").parquet(d + "/full")
    return spark.read.parquet(d + "/full"), d


def test_discovered_schema_tracks_drift(spark, evolving_wal, tmp_path):
    wal, d = evolving_wal
    conf = PipelineConfig(stream="fx6", payload_col="payload", payload_schema=None)
    # two batches split exactly at the evolution boundary
    table = run_batch_replay(
        spark, wal, str(tmp_path / "t"),
        conf, slices=[(-1, EVOLVE_AT), (EVOLVE_AT, N)],
    )
    df = table.to_df()
    # the drift fields exist (stars new; size widened int->double)
    assert "metadata_stars" in df.columns
    assert dict(df.dtypes)["metadata_size"] == "double"
    # rows whose latest write predates the evolution have null stars
    old = df.filter(F.col("seq") < EVOLVE_AT)
    new = df.filter(F.col("seq") >= EVOLVE_AT)
    assert old.count() > 0 and new.count() > 0
    assert old.filter(F.col("metadata_stars").isNotNull()).count() == 0
    assert new.filter(F.col("metadata_stars").isNull()).count() == 0

    # DuckDB oracle over the raw WAL: latest non-delete per key + stars
    con = duckdb.connect()
    con.sql(f"create view wal as select * from read_parquet('{d}/full/*.parquet')")
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.sql(
            """
            with ranked as (
                select *, row_number() over (
                    partition by repo, path order by seq desc, commit desc
                ) rn from wal
            )
            select repo, path, seq,
                   cast(json_extract(payload, '$.metadata.stars') as bigint)
            from ranked where rn = 1 and op <> 'delete'
            """
        ).fetchall()
    }
    got = {
        (r.repo, r.path): (r.seq, r.metadata_stars)
        for r in df.select("repo", "path", "seq", "metadata_stars").collect()
    }
    assert got == want


def test_supplied_schema_stays_fixed(spark, evolving_wal, tmp_path):
    """F5 bypass: with a user-supplied schema, later drift fields are NOT
    added (the reference's no-discovery path has a fixed catalog)."""
    wal, _ = evolving_wal
    from tap_rest_api_msdk_spark.sources.reader import infer_payload_struct

    pre = infer_payload_struct(wal.filter(F.col("seq") < 100), "payload")
    conf = PipelineConfig(stream="fx6f", payload_col="payload", payload_schema=pre)
    table = run_batch_replay(
        spark, wal, str(tmp_path / "t2"),
        conf, slices=[(-1, EVOLVE_AT), (EVOLVE_AT, N)],
    )
    assert "metadata_stars" not in table.to_df().columns


def test_full_mode_catches_midbatch_drift(spark, evolving_wal, tmp_path):
    """'full' inference sees fields even when they appear mid-batch (after
    the N+1 sample horizon)."""
    wal, _ = evolving_wal
    conf = PipelineConfig(
        stream="fx6full", payload_col="payload", payload_schema=None,
        schema_evolution="full", inference_records=10,
    )
    # ONE batch covering the whole WAL: drift starts at row 2000, far past
    # the 11-record sample -> "sample" would miss it on this batch split
    table = run_batch_replay(spark, wal, str(tmp_path / "t3"), conf)
    assert "metadata_stars" in table.to_df().columns
