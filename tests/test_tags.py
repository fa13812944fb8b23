"""Named snapshot refs (Iceberg tag analog): tagged versions survive
expire_manifests and vacuum regardless of rolling retention; reads
accept tag names; dropping a tag returns the version to the normal
retention windows."""

from __future__ import annotations

import pytest

from tap_rest_api_msdk_spark.streaming.laketable import LakeTable


def _rows(spark, ids, seq, text):
    return spark.createDataFrame(
        [(int(i), int(seq), f"{text}-{i}") for i in ids],
        "id long, seq long, text string",
    )


def test_tag_pins_snapshot_through_expiry_and_vacuum(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    t.merge_upsert(_rows(spark, range(30), 0, "base"), keys=["id"],
                   order_by=["seq"], batch_id=0)
    v_rel = t.tag("release-1")
    assert t.tags() == {"release-1": v_rel}
    # pile on history so the rolling windows leave the tag behind
    for i in range(1, 9):
        t.merge_upsert(_rows(spark, [i], i, f"b{i}"), keys=["id"],
                       order_by=["seq"], batch_id=i, mode="cow")
    t.expire_manifests(retain_last=2, grace_seconds=0.0)
    t.vacuum(retain_last=1)
    # the tagged snapshot is STILL fully readable — by tag or version
    got = {r["id"]: r["text"] for r in t.to_df(version="release-1").collect()}
    assert got == {i: f"base-{i}" for i in range(30)}
    assert t.to_df(version=v_rel).count() == 30
    # the untagged interior versions expired as usual
    assert t.manifest_at(v_rel + 1) is None
    # current state unaffected
    assert t.to_df().count() == 30

    # dropping the tag re-joins retention: next expiry removes it
    assert t.drop_tag("release-1") is True
    assert t.drop_tag("release-1") is False
    t.expire_manifests(retain_last=2, grace_seconds=0.0)
    assert t.manifest_at(v_rel) is None
    with pytest.raises(ValueError, match="unknown tag"):
        t.to_df(version="release-1")


def test_tag_overwrite_and_validation(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=2)
    t.merge_upsert(_rows(spark, [1], 0, "a"), keys=["id"], order_by=["seq"],
                   batch_id=0)
    v0 = t.tag("prod")
    t.merge_upsert(_rows(spark, [1], 1, "b"), keys=["id"], order_by=["seq"],
                   batch_id=1)
    with pytest.raises(ValueError, match="exists"):
        t.tag("prod")
    v1 = t.tag("prod", overwrite=True)
    assert v1 > v0 and t.tags()["prod"] == v1
    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("bad/name")
    # r4 ADVICE: all-digit names are unresolvable by construction —
    # resolve_version tries int(ref) first, so tag '2024' would silently
    # time-travel to manifest v2024; reject at creation
    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("2024")
    assert t.resolve_version("7") == 7  # numeric strings still coerce
    with pytest.raises(ValueError, match="missing or expired"):
        t.tag("ghost", version=99)
    # a second handle sees the same tags (files, not memory)
    t2 = LakeTable(spark, str(tmp_path / "t"), num_buckets=2)
    assert t2.tags() == {"prod": v1}


def test_tag_race_and_traversal_guards(spark, tmp_path):
    """Review-pass regressions: reserved '.tmp.' names rejected (tags()
    filters them, so they'd pin nothing); drop_tag validates the name (no
    path traversal out of tags/); exclusive create (no clobber without
    overwrite); a tag that lost a race with maintenance fails LOUDLY and
    removes itself instead of dangling."""
    import os

    import pytest

    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=2)
    t.merge_upsert(_rows(spark, [1], 0, "a"), keys=["id"], order_by=["seq"],
                   batch_id=0)
    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("model.tmp.2")
    with pytest.raises(ValueError, match="invalid tag name"):
        t.drop_tag("../manifests/v0000000000")
    # exclusive create: the losing creator raises, the pin is not clobbered
    v0 = t.tag("rel")
    with pytest.raises(ValueError, match="exists"):
        t.tag("rel")
    assert t.tags() == {"rel": v0}
    # race with maintenance: delete a data file of the snapshot between
    # the existence check and the post-publish verify (simulated by
    # removing it up front — the verify runs after the tag file lands)
    t.merge_upsert(_rows(spark, [1], 1, "b"), keys=["id"], order_by=["seq"],
                   batch_id=1)
    t.drop_tag("rel")
    t.expire_manifests(retain_last=1, grace_seconds=0.0)
    victim = t.current_manifest()
    f = sorted(victim["files"].values())[0][0]
    os.rename(f, f + ".hidden")
    try:
        with pytest.raises(ValueError, match="lost a race with maintenance"):
            t.tag("rel2")
        assert "rel2" not in t.tags()  # the half-made pin removed itself
    finally:
        os.rename(f + ".hidden", f)


def test_tag_overwrite_verify_failure_restores_previous_pin(spark, tmp_path):
    """An overwrite whose post-publish verify fails must RESTORE the
    previous (still valid) pin, not delete it — and maintenance passes
    must treat an unreadable tag file as an abort, not as unpinned."""
    import os

    import pytest

    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=2)
    t.merge_upsert(_rows(spark, [1, 2], 0, "a"), keys=["id"],
                   order_by=["seq"], batch_id=0)
    v_good = t.tag("rel")
    t.merge_upsert(_rows(spark, [1], 1, "b"), keys=["id"], order_by=["seq"],
                   batch_id=1)
    v_bad = t.current_manifest()["version"]
    f = sorted(t.current_manifest()["files"].values())[0][0]
    os.rename(f, f + ".hidden")
    try:
        with pytest.raises(ValueError, match="lost a race"):
            t.tag("rel", version=v_bad, overwrite=True)
        assert t.tags() == {"rel": v_good}  # previous pin restored
    finally:
        os.rename(f + ".hidden", f)

    # strict mode: a corrupt tag file ABORTS maintenance instead of
    # silently unpinning
    with open(os.path.join(str(tmp_path / "t"), "tags", "rel.json"), "w") as fh:
        fh.write("{not json")
    with pytest.raises(Exception):
        t.vacuum(retain_last=1)
    with pytest.raises(Exception):
        t.expire_manifests(retain_last=1, grace_seconds=0.0)
    assert t.tags() == {}  # lenient listing still skips it


def test_changes_reads_accept_tag_refs(spark, tmp_path):
    """'Changes since release-1': changes_since, the batch changelog
    source, and stream_net_changes all accept a tag name as the window
    anchor."""
    from tap_rest_api_msdk_spark.streaming.changes_source import (
        LakeTableChangesDataSource,
    )
    from tap_rest_api_msdk_spark.streaming.net_changes import (
        stream_net_changes,
    )

    spark.dataSource.register(LakeTableChangesDataSource)
    path = str(tmp_path / "t")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, range(10), 0, "a"), keys=["id"],
                   order_by=["seq"], batch_id=0)
    t.tag("release-1")
    t.merge_upsert(_rows(spark, [3, 4], 1, "b"), keys=["id"],
                   order_by=["seq"], batch_id=1, mode="mor")

    assert t.changes_since("release-1").count() == 2
    df = (spark.read.format("laketable_changes").option("path", path)
          .option("start_version", "release-1").load())
    assert df.count() == 2

    got = {}
    stream_net_changes(
        t, lambda d, b, w: got.update({r["id"]: r["change"] for r in d.collect()}),
        str(tmp_path / "ck"), starting_version="release-1",
    )
    assert got == {3: "update", 4: "update"}

    import pytest

    with pytest.raises(Exception, match="neither a version nor a known tag"):
        (spark.read.format("laketable_changes").option("path", path)
         .option("start_version", "no-such-tag").load().count())
