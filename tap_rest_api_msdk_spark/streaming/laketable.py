"""Exactly-once MERGE-upsert lake table over Parquet (SURVEY §4.1).

No Iceberg/Delta jars ship in this sandbox, so this implements the minimal
Iceberg-style contract the engine needs, behind an interface a real cluster
can swap for ``MERGE INTO`` with zero pipeline changes:

* **Atomic snapshot commit** — data files are written first, then a JSON
  manifest (naming live files, schema, committed batch id, bookmarks) is
  published by an atomic POSIX ``rename`` of the version pointer. Readers
  only ever see a fully-committed snapshot.
* **Idempotent batch ids** — ``merge_upsert(batch_id=...)`` is a no-op when
  ``batch_id <= last_committed_batch_id``: the standard Structured
  Streaming ``foreachBatch`` idempotent-sink contract; replay from any
  checkpoint reconverges (north_rule). Merges are ALSO semantically
  idempotent (LWW by (seq, commit)), so even out-of-ledger replays of old
  events cannot corrupt state.
* **Bucketed copy-on-write MERGE** — the table is hash-bucketed on the
  merge keys; a batch only rewrites the buckets its keys touch. At 10^10
  rows this is the difference between rewriting ~(batch_keys/num_buckets
  fraction) of the table and rewriting all of it. Untouched buckets carry
  their old files forward in the new manifest (metadata-only). The
  bucket column is also how the merge join avoids a global shuffle: both
  sides are pre-partitioned by the same function.
* **Additive schema evolution** — manifest records the table schema; a
  batch with new columns widens it via
  :func:`tap_rest_api_msdk_spark.functions.infer.merge_schemas` (append
  nullable, int->double widening, never narrow); old files are read with
  missing columns as nulls.

Single-writer assumption: one streaming query owns a table (the reference
equally runs one tap process per config; Singer parallelism is per-stream,
tap.py:454-553).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_rest_api_msdk_spark.functions.infer import merge_schemas

LATEST_POINTER = "_latest.json"


def mm3_hash_int(value: int, seed: int = 42) -> int:
    """Spark-compatible Murmur3_x86_32 hash of a 32-bit int (signed result).

    Mirrors ``org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt`` — the
    function behind ``HashPartitioning`` / ``F.hash`` — so the driver can
    compute which shuffle partition (and therefore which output file) each
    bucket id landed in, without an extra Spark job. Verified against
    ``F.hash`` and ``spark_partition_id`` in tests/test_laketable.py.
    """
    mask = 0xFFFFFFFF
    k = value & mask
    k = (k * 0xCC9E2D51) & mask
    k = ((k << 15) | (k >> 17)) & mask
    k = (k * 0x1B873593) & mask
    h = seed & mask
    h ^= k
    h = ((h << 13) | (h >> 19)) & mask
    h = (h * 5 + 0xE6546B64) & mask
    h ^= 4  # length in bytes
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & mask
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & mask
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def bucket_to_partition(bucket: int, num_partitions: int) -> int:
    """pmod(murmur3(bucket), K) — HashPartitioning's partition assignment."""
    return mm3_hash_int(bucket) % num_partitions


def bucket_salt_to_partition(bucket: int, salt: int, num_partitions: int) -> int:
    """HashPartitioning over TWO int columns (bucket, salt): Spark chains
    murmur3 per column, each previous hash seeding the next — verified
    against ``F.hash(b, s)`` + ``spark_partition_id`` in tests."""
    return mm3_hash_int(salt, mm3_hash_int(bucket, 42)) % num_partitions


class LakeTable:
    """A bucketed, manifest-committed Parquet lake table with MERGE-upsert."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        num_buckets: int = 16,
        files_per_bucket: Optional[int] = None,
    ):
        self.spark = spark
        self.path = path
        self.num_buckets = num_buckets
        # merge shuffle width is DECOUPLED from the bucket count: each
        # bucket may be written as up to ``files_per_bucket`` files, split
        # by a key-salt, so a 16-bucket table still merges with cores-scale
        # parallelism (None = auto from defaultParallelism). Unlike
        # num_buckets this is NOT a table property — it's a per-writer
        # execution knob; the manifest records whatever files each commit
        # produced.
        self.files_per_bucket = files_per_bucket
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)
        # bucket count is a TABLE property: once committed, the manifest's
        # value wins over the constructor arg (a mismatched reopen would
        # silently mis-route keys to the wrong buckets otherwise)
        m = self.current_manifest()
        if m and "num_buckets" in m:
            self.num_buckets = m["num_buckets"]

    def _fpb(self, n_affected: int) -> int:
        """Files (salt slices) per bucket for this commit: auto mode spreads
        the merge across ~defaultParallelism tasks regardless of how few
        buckets a batch touches; capped so tiny tables don't fragment."""
        if self.files_per_bucket is not None:
            return max(1, self.files_per_bucket)
        cores = self.spark.sparkContext.defaultParallelism
        return max(1, min(8, -(-cores // max(1, n_affected))))

    # ------------------------------------------------------------------
    # manifest plumbing
    # ------------------------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.path, LATEST_POINTER)

    def current_manifest(self) -> Optional[dict]:
        try:
            with open(self._pointer_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def manifest_at(self, version: int) -> Optional[dict]:
        """Historical snapshot manifest (time travel): every commit's
        manifest is retained under manifests/ until vacuumed."""
        p = os.path.join(self.path, "manifests", f"v{version:010d}.json")
        try:
            with open(p) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def _publish(self, manifest: dict) -> None:
        """Write manifest then atomically swing the pointer (POSIX rename)."""
        version = manifest["version"]
        mpath = os.path.join(self.path, "manifests", f"v{version:010d}.json")
        with open(mpath, "w") as fh:
            json.dump(manifest, fh)
        tmp = self._pointer_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, self._pointer_path())  # atomic commit point

    @property
    def last_committed_batch_id(self) -> int:
        m = self.current_manifest()
        return -1 if m is None else m.get("batch_id", -1)

    def bookmarks(self) -> dict:
        m = self.current_manifest()
        return {} if m is None else m.get("bookmarks", {})

    def schema(self) -> Optional[T.StructType]:
        m = self.current_manifest()
        if m is None or not m.get("schema"):
            return None
        return T.StructType.fromJson(m["schema"])

    # ------------------------------------------------------------------
    # read path
    # ------------------------------------------------------------------
    def read(
        self,
        buckets: Optional[Sequence[int]] = None,
        version: Optional[int] = None,
    ) -> Optional[DataFrame]:
        """Snapshot read (with ``__bucket`` column); optionally restricted
        to a set of buckets — only that subset's files are listed (bucket
        pruning), and because a file may be shared by several colliding
        buckets, a residual ``__bucket IN (...)`` filter keeps exactly the
        requested rows. ``version`` time-travels to a historical snapshot
        (valid until ``vacuum()`` reclaims its files)."""
        m = self.manifest_at(version) if version is not None else self.current_manifest()
        if m is None:
            return None
        schema = T.StructType.fromJson(m["schema"])
        stored = T.StructType(schema.fields + [T.StructField("__bucket", T.IntegerType(), True)])
        want = None if buckets is None else {int(b) for b in buckets}
        files: set[str] = set()
        pairs: list[tuple[str, int]] = []  # (file basename, bucket) ownership
        for section in ("files", "deltas"):
            for b, flist in m.get(section, {}).items():
                if want is None or int(b) in want:
                    files.update(flist)
                    pairs.extend((os.path.basename(f), int(b)) for f in flist)
        if not files:
            return self.spark.createDataFrame([], stored)
        # schema evolution: read each file with the CURRENT table schema;
        # parquet reader fills missing columns with null by name.
        df = self.spark.read.schema(stored).parquet(*sorted(files))
        # ownership semi-join: a physical file may be SHARED by several
        # colliding buckets, and a later commit can rewrite one of them —
        # rows only count for (file, bucket) pairs the manifest still
        # references, otherwise the sharing bucket's old file would leak
        # the rewritten bucket's stale rows. File basenames are unique
        # (epoch dir + task uuid).
        lookup = self.spark.createDataFrame(
            sorted(set(pairs)), "__file string, __owned_bucket int"
        )
        df = df.withColumn(
            "__file", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        df = df.join(
            F.broadcast(lookup),
            (df["__file"] == lookup["__file"])
            & (df["__bucket"] == lookup["__owned_bucket"]),
            "leftsemi",
        ).drop("__file")
        return df

    def read_state(
        self,
        buckets: Optional[Sequence[int]] = None,
        version: Optional[int] = None,
    ) -> Optional[DataFrame]:
        """Resolved state: LWW over base ∪ delta rows (time-travelable).

        For a pure copy-on-write table this is a no-op dedup (base is
        already one row per key); for merge-on-read it resolves the delta
        log against the base — the read-side half of the MOR contract.
        """
        df = self.read(buckets, version=version)
        m = self.manifest_at(version) if version is not None else self.current_manifest()
        if df is None or m is None:
            return df
        if not m.get("deltas"):
            return df
        from tap_rest_api_msdk_spark.operators.dedup import lww_dedup

        return lww_dedup(df, list(m["keys"]) + ["__bucket"], m["order_by"])

    def changes_since(self, version: int) -> Optional[DataFrame]:
        """Incremental CDC read: rows in data files ADDED after ``version``.

        Under merge-on-read these are exactly the change rows (delta files
        hold within-batch LWW winners, incl. tombstones). Under
        copy-on-write, rewritten buckets carry unchanged rows along —
        filter by ``replication_key > bookmarks[stream]@version`` for an
        exact stream (the caller knows its stream name).
        """
        old = self.manifest_at(version)
        new = self.current_manifest()
        if new is None:
            return None
        def all_files(m):
            out = set()
            for section in ("files", "deltas"):
                for flist in m.get(section, {}).values():
                    out.update(flist)
            return out
        added = sorted(all_files(new) - (all_files(old) if old else set()))
        schema = T.StructType.fromJson(new["schema"])
        stored = T.StructType(schema.fields + [T.StructField("__bucket", T.IntegerType(), True)])
        if not added:
            return self.spark.createDataFrame([], stored)
        return self.spark.read.schema(stored).parquet(*added)

    # ------------------------------------------------------------------
    # write path
    # ------------------------------------------------------------------
    def _bucket_col(self, keys: Sequence[str]):
        return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(self.num_buckets)).cast("int")

    def merge_upsert(
        self,
        batch_df: DataFrame,
        keys: Sequence[str],
        order_by: Sequence[str],
        batch_id: int,
        op_col: Optional[str] = None,
        bookmark_updates: Optional[dict] = None,
        extra_manifest: Optional[dict] = None,
        affected_buckets: Optional[Sequence[int]] = None,
        mode: str = "cow",
    ) -> dict:
        """LWW MERGE of a change batch into the table (exactly-once).

        Returns a small stats dict (for the metrics/lineage table).
        Semantics: per key, the row with max (order_by...) wins across
        {existing table row} ∪ {batch rows}. Delete winners are PERSISTED
        as tombstone rows (``op_col == 'delete'``) rather than dropped, so
        a late lower-seq upsert arriving in a later batch cannot resurrect
        a deleted key — replay converges regardless of batch boundaries.
        ``to_df(drop_deletes=True)`` exposes the live state; compaction can
        purge tombstones once the low watermark passes them.

        ``mode``:
        * ``"cow"`` — copy-on-write: affected buckets are rewritten fully
          merged; reads are one-row-per-key with zero resolve cost.
        * ``"mor"`` — merge-on-read: the batch's within-batch LWW winners
          are appended as DELTA files without touching the base — write
          amplification is O(batch), not O(table); readers resolve via
          ``read_state`` and ``compact()`` folds deltas into a new base.
          This is the steady-state streaming-CDC write path (Hudi/Iceberg
          MOR equivalent); both modes share semantics and the batch-id
          ledger, and may be mixed batch-by-batch.
        """
        m = self.current_manifest()
        if batch_id <= (m["batch_id"] if m else -1):
            return {"skipped": True, "batch_id": batch_id}

        t0 = time.time()
        # --- schema evolution (driver-side, metadata only)
        batch_schema = T.StructType(
            [f for f in batch_df.schema.fields if f.name != "__bucket"]
        )
        old_schema = self.schema()
        new_schema = merge_schemas(old_schema, batch_schema) if old_schema else batch_schema
        # REFUSE type drift on merge-key columns: __bucket = hash(keys), so
        # widening a key (long -> double) re-hashes existing rows into
        # different buckets than the manifest has them filed under — rows
        # would silently vanish or duplicate. Keys must keep their creation
        # type; cast upstream if a source starts sending a wider type.
        if old_schema is not None:
            old_types = {f.name: f.dataType for f in old_schema.fields}
            new_types = {f.name: f.dataType for f in new_schema.fields}
            for k in keys:
                if k in old_types and old_types[k] != new_types.get(k, old_types[k]):
                    raise ValueError(
                        f"merge-key type drift on '{k}': "
                        f"{old_types[k].simpleString()} -> {new_types[k].simpleString()}; "
                        "widening a key column would re-bucket existing rows (refused)"
                    )

        def align(df: DataFrame) -> DataFrame:
            cols = []
            have = {f.name: f for f in df.schema.fields}
            for f in new_schema.fields:
                if f.name in have:
                    c = F.col(f.name)
                    if have[f.name].dataType != f.dataType:
                        c = c.cast(f.dataType)
                    cols.append(c.alias(f.name))
                else:
                    cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            return df.select(*cols)

        batch = align(batch_df).withColumn("__bucket", self._bucket_col(keys))

        if affected_buckets is not None:
            # caller already knows the touched buckets (e.g. from its
            # lineage-metrics pass) — skip the extra distinct scan
            affected = [int(b) for b in affected_buckets]
        else:
            affected = [int(r[0]) for r in batch.select("__bucket").distinct().collect()]

        if mode == "mor":
            return self._append_delta(
                batch, keys, order_by, batch_id, op_col, affected,
                new_schema, m, bookmark_updates, extra_manifest, t0,
            )

        if m:
            existing = self.read(buckets=affected).drop("__bucket")
            # re-derive the bucket after align (same pure function of keys)
            ex_aligned = align(existing).withColumn("__bucket", self._bucket_col(keys))
            all_rows = ex_aligned.unionByName(batch)
        else:
            all_rows = batch

        # --- single-shuffle LWW merge (SURVEY §4.3 physical plan):
        # one hash exchange on (__bucket, __salt) — the salt is a pure
        # function of the merge keys, so every row of a key still
        # co-locates — then an in-partition sort and a first-row-per-key
        # filter via lag(). No second exchange: the window's required
        # distribution is exactly the repartition columns, and the write
        # consumes the clustered layout directly (sort doubles as file
        # order -> contiguous __bucket runs -> row-group stats).
        # The salt DECOUPLES shuffle width from num_buckets: a batch
        # touching 16 buckets on a 512-core cluster still merges 16*S-wide
        # (S files per bucket, recorded per-commit in the manifest).
        # Skew note: a pathologically hot KEY still lands in one partition;
        # operators/dedup.lww_dedup_salted pre-shrinks such batches first.
        from pyspark.sql import Window

        S = self._fpb(len(affected))
        k_parts = max(1, len(affected) * S)
        salt = F.pmod(
            F.xxhash64(*[F.col(k) for k in keys], F.lit("__salt__")), F.lit(S)
        ).cast("int")
        rep = all_rows.withColumn("__salt", salt).repartition(
            k_parts, "__bucket", "__salt"
        )
        w = Window.partitionBy("__bucket", "__salt").orderBy(
            *[F.col(k).asc() for k in keys],
            *[F.col(o).desc() for o in order_by],
        )
        key_changed = F.lit(False)
        for k in keys:
            lagged = F.lag(F.col(k)).over(w)
            key_changed = key_changed | lagged.isNull() | (lagged != F.col(k))
        merged = (
            rep.withColumn("__first", key_changed)
            .filter(F.col("__first"))
            .drop("__first", "__salt")
        )

        # --- write new files for affected buckets only (copy-on-write)
        epoch = (m["version"] + 1) if m else 0
        out_dir = os.path.join(self.path, "data", f"epoch={epoch:010d}")
        merged.write.mode("overwrite").parquet(out_dir)

        # map buckets -> written files via HashPartitioning's assignment
        by_index: dict[int, str] = {}
        for fname in os.listdir(out_dir):
            if fname.endswith(".parquet") and fname.startswith("part-"):
                by_index[int(fname.split("-")[1])] = os.path.join(out_dir, fname)

        files = dict(m["files"]) if m else {}
        deltas = dict(m.get("deltas", {})) if m else {}
        for b in affected:
            fset = {
                by_index[p]
                for s in range(S)
                if (p := bucket_salt_to_partition(b, s, k_parts)) in by_index
            }
            files[str(b)] = sorted(fset)
            deltas.pop(str(b), None)  # folded into the new base

        bookmarks = dict(m.get("bookmarks", {})) if m else {}
        bookmarks.update(bookmark_updates or {})

        manifest = {
            "version": epoch,
            "batch_id": batch_id,
            "committed_at": time.time(),
            "schema": new_schema.jsonValue(),
            "files": files,
            "deltas": deltas,
            "bookmarks": bookmarks,
            "num_buckets": self.num_buckets,
            "keys": list(keys),
            "order_by": list(order_by),
            "op_col": op_col,
            **(extra_manifest or {}),
        }
        self._publish(manifest)
        return {
            "skipped": False,
            "batch_id": batch_id,
            "version": epoch,
            "affected_buckets": len(affected),
            "merge_seconds": time.time() - t0,
        }

    def _append_delta(
        self, batch, keys, order_by, batch_id, op_col, affected,
        new_schema, m, bookmark_updates, extra_manifest, t0,
    ) -> dict:
        """MOR write: within-batch LWW winners appended as delta files.

        Never reads the base — write cost is O(batch). The within-batch
        LWW is the map-side-combined aggregate (operators/dedup.lww_dedup),
        so duplicate-heavy batches shuffle pre-combined rows only.
        """
        from tap_rest_api_msdk_spark.operators.dedup import lww_dedup

        winners = lww_dedup(batch, list(keys) + ["__bucket"], order_by)
        S = self._fpb(len(affected))
        k_parts = max(1, len(affected) * S)
        salt = F.pmod(
            F.xxhash64(*[F.col(k) for k in keys], F.lit("__salt__")), F.lit(S)
        ).cast("int")
        epoch = (m["version"] + 1) if m else 0
        out_dir = os.path.join(self.path, "data", f"epoch={epoch:010d}")
        (
            winners.withColumn("__salt", salt)
            .repartition(k_parts, "__bucket", "__salt")
            .drop("__salt")
            .write.mode("overwrite")
            .parquet(out_dir)
        )

        by_index: dict[int, str] = {}
        for fname in os.listdir(out_dir):
            if fname.endswith(".parquet") and fname.startswith("part-"):
                by_index[int(fname.split("-")[1])] = os.path.join(out_dir, fname)

        deltas = dict(m.get("deltas", {})) if m else {}
        for b in affected:
            fset = {
                by_index[p]
                for s in range(S)
                if (p := bucket_salt_to_partition(b, s, k_parts)) in by_index
            }
            for f in sorted(fset):
                deltas.setdefault(str(b), [])
                if f not in deltas[str(b)]:
                    deltas[str(b)] = deltas[str(b)] + [f]

        bookmarks = dict(m.get("bookmarks", {})) if m else {}
        bookmarks.update(bookmark_updates or {})
        manifest = {
            "version": epoch,
            "batch_id": batch_id,
            "committed_at": time.time(),
            "schema": new_schema.jsonValue(),
            "files": dict(m["files"]) if m else {},
            "deltas": deltas,
            "bookmarks": bookmarks,
            "num_buckets": self.num_buckets,
            "keys": list(keys),
            "order_by": list(order_by),
            "op_col": op_col,
            **(extra_manifest or {}),
        }
        self._publish(manifest)
        return {
            "skipped": False,
            "batch_id": batch_id,
            "version": epoch,
            "mode": "mor",
            "affected_buckets": len(affected),
            "merge_seconds": time.time() - t0,
        }

    # ------------------------------------------------------------------
    # maintenance
    # ------------------------------------------------------------------
    def compact(self, tombstone_watermark: Optional[int] = None) -> dict:
        """Rewrite the full table into one fresh epoch: merges small files
        and purges delete tombstones whose seq <= ``tombstone_watermark``
        (safe once the source can no longer replay events older than the
        watermark — the classic log-compaction contract).

        Runs as a normal commit (bumps version, keeps batch-id ledger), so
        readers never see a partial compaction.
        """
        m = self.current_manifest()
        if m is None:
            return {"skipped": True, "reason": "empty table"}
        df = self.read_state()  # resolves MOR deltas before rewriting
        op_col = m.get("op_col")
        rk = (m.get("order_by") or [None])[0]
        if op_col and tombstone_watermark is not None and rk:
            df = df.filter(
                ~((F.col(op_col) == "delete") & (F.col(rk) <= F.lit(tombstone_watermark)))
            )
        epoch = m["version"] + 1
        out_dir = os.path.join(self.path, "data", f"epoch={epoch:010d}")
        S = self._fpb(self.num_buckets)
        k_parts = max(1, self.num_buckets * S)
        salt = F.pmod(
            F.xxhash64(*[F.col(k) for k in m["keys"]], F.lit("__salt__")), F.lit(S)
        ).cast("int")
        (
            df.withColumn("__salt", salt)
            .repartition(k_parts, "__bucket", "__salt")
            .drop("__salt")
            .write.mode("overwrite")
            .parquet(out_dir)
        )
        by_index: dict[int, str] = {}
        for fname in os.listdir(out_dir):
            if fname.endswith(".parquet") and fname.startswith("part-"):
                by_index[int(fname.split("-")[1])] = os.path.join(out_dir, fname)
        files = {
            str(b): sorted(
                {
                    by_index[p]
                    for s in range(S)
                    if (p := bucket_salt_to_partition(b, s, k_parts)) in by_index
                }
            )
            for b in range(self.num_buckets)
        }
        manifest = {
            **m, "version": epoch, "files": files, "deltas": {},
            "committed_at": time.time(),
        }
        self._publish(manifest)
        return {"skipped": False, "version": epoch, "files": len(by_index)}

    def vacuum(self, retain_last: int = 1) -> int:
        """Delete data files not referenced by the last ``retain_last``
        manifests (default 1 = current snapshot only). Returns the number
        of files removed. ``retain_last > 1`` keeps that many historical
        snapshots time-travelable after maintenance — the Iceberg
        expire-snapshots retention contract. Single-writer assumption means
        no reader can hold an unretained snapshot across this call."""
        m = self.current_manifest()
        if m is None:
            return 0
        live: set = set()
        newest = m["version"]
        for v in range(max(0, newest - max(1, retain_last) + 1), newest + 1):
            snap = self.manifest_at(v)
            if snap is None:
                continue
            live |= {f for flist in snap["files"].values() for f in flist}
            live |= {f for flist in snap.get("deltas", {}).values() for f in flist}
        removed = 0
        data_root = os.path.join(self.path, "data")
        for epoch_dir in sorted(os.listdir(data_root)):
            full = os.path.join(data_root, epoch_dir)
            for fname in os.listdir(full):
                fpath = os.path.join(full, fname)
                if fname.endswith(".parquet") and fpath not in live:
                    os.remove(fpath)
                    removed += 1
            if not os.listdir(full):
                os.rmdir(full)
        return removed

    def register_view(self, name: str, drop_deletes: bool = True) -> str:
        """Expose the table's CURRENT resolved state as a temp view so any
        ``spark.sql`` query runs against it (the engine's catalog hook; on
        a real deployment this is the Iceberg/HMS table registration).
        Re-register after new commits to pick up a fresh snapshot."""
        df = self.to_df(drop_deletes=drop_deletes)
        if df is None:
            raise ValueError(f"table at {self.path} has no committed snapshot")
        df.createOrReplaceTempView(name)
        return name

    # convenience for tests / oracle comparison
    def to_df(
        self, drop_deletes: bool = True, version: Optional[int] = None
    ) -> Optional[DataFrame]:
        """State of the table (MOR deltas resolved, tombstones filtered by
        default; ``version`` time-travels)."""
        df = self.read_state(version=version)
        if df is None:
            return None
        df = df.drop("__bucket")
        m = self.manifest_at(version) if version is not None else self.current_manifest()
        op_col = m.get("op_col") if m else None
        if drop_deletes and op_col and op_col in df.columns:
            # NULL-safe: a row whose op is null (e.g. null-filled by schema
            # alignment) is a LIVE row, not a tombstone — a plain != would
            # evaluate NULL and silently drop it
            df = df.filter(F.col(op_col).isNull() | (F.col(op_col) != F.lit("delete")))
        return df
