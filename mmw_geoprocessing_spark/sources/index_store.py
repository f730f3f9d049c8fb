"""Durable, restart-surviving index store (r10 verdict #2).

The retrieval/dedup families build their ingest-time indexes (BM25
postings / document frequencies / corpus totals, IVF cell assignments
/ centroids, minhash band signatures) through the session-memory
PlanCache — correct and amortized within one service lifetime, but a
restarted service rebuilds everything (the sf1~ ngram index alone is
~220 s). The reference's analogue is durable (its layer catalog lives
in S3, ``Utils.scala:22-23``); the zone-map family
(``sources/zonemap.py``) already demonstrates the right pattern in
this repo: the index is WRITTEN at ingest and SERVED from parquet.

This module generalizes that pattern: an index table is written once
per (corpus identity, index spec) as parquet — optionally BUCKETED on
its probe key — under a deterministic keyed directory, then every
session (including a fresh process) re-attaches it instead of
rebuilding. Bucketed indexes re-attach via CLUSTERED BY DDL so probes
prune to the query keys' buckets: ``filter(term IN (...))`` over a
term-bucketed postings table plans with
``SelectedBucketsCount: m out of n`` — the scan reads only the
probed buckets' files, which at 100 TB is the difference between a
query-sized read and a corpus-sized one.

Concurrency/atomicity discipline shared with sources/maintenance.py:
builds run under a per-key flock (lock dies with the holder), and a
directory counts as built only once Spark's _SUCCESS marker lands.
"""

from __future__ import annotations

import hashlib
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

_STORE_DIR = "/tmp/spark_graft_index_store"

# (session id, table name) -> attached DataFrame (skip catalog chatter)
_ATTACHED: dict[tuple[int, str], DataFrame] = {}


def clear_index_store_cache() -> None:
    """Forget session-level attachments (NOT the on-disk indexes —
    those are the point). Tests use this to simulate a fresh session."""
    _ATTACHED.clear()


def _complete(d: str) -> bool:
    return os.path.isdir(d) and os.path.isfile(os.path.join(d, "_SUCCESS"))


@contextmanager
def _build_lock(path: str):
    import fcntl

    os.makedirs(_STORE_DIR, exist_ok=True)
    fd = os.open(path + ".lock", os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def corpus_fingerprint(sf_dir: str, *tables: str) -> str:
    """Identity of the corpus an index was built from: source parquet
    size+mtime per table. Regenerated testdata therefore invalidates
    stale indexes instead of silently serving them (the
    fixtures/tpch_layout rule)."""
    parts = [sf_dir]
    for t in tables:
        try:
            st = os.stat(os.path.join(sf_dir, f"{t}.parquet"))
            parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
        except OSError:
            parts.append(f"{t}:nostat")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def _table_name(
    name: str,
    fingerprint: str,
    bucket_col: str | None = None,
    n_buckets: int = 16,
    partition_col: str | None = None,
    spec_version: str = "v1",
) -> str:
    tag = f"{name}_{spec_version}_{fingerprint}"
    if bucket_col:
        tag += f"_b{n_buckets}"
    if partition_col:
        tag += f"_p{partition_col}"
    return f"sgi_{tag}"


def append_once(
    spark: SparkSession,
    name: str,
    fingerprint: str,
    append_tag: str,
    build: "callable[[], DataFrame]",
    bucket_col: str,
    n_buckets: int = 16,
    spec_version: str = "v1",
) -> bool:
    """Append ``build()``'s rows into the existing bucketed index —
    EXACTLY ONCE per ``append_tag`` (a crawl-drop / ingest-epoch id):
    a marker file under the build flock makes retries and concurrent
    appenders idempotent, the lakehouse commit discipline in
    miniature. The appended rows land as one extra file per touched
    bucket with the same bucket spec, so probes keep bucket-pruning
    across base + appended files. Returns True if this call performed
    the append, False if the tag had already been applied.

    The index must already exist (``get_or_build_index`` with the same
    identity) and must be ATTACHED in this session — appending goes
    through the catalog table so Spark enforces the bucket spec."""
    tbl = _table_name(name, fingerprint, bucket_col, n_buckets, None, spec_version)
    path = f"{_STORE_DIR}/{tbl}"
    if not _complete(path):
        raise ValueError(f"append target index does not exist: {tbl}")
    marker = f"{path}.append_{append_tag}"
    if os.path.isfile(marker):
        return False
    with _build_lock(path):
        if os.path.isfile(marker):  # re-check under the lock
            return False
        if not spark.catalog.tableExists(tbl):
            # attach via the shared read path (registers the DDL)
            get_or_build_index(
                spark, name, fingerprint,
                lambda: (_ for _ in ()).throw(AssertionError("exists on disk")),
                bucket_col=bucket_col, n_buckets=n_buckets,
                spec_version=spec_version,
            )
        (
            build()
            .repartition(n_buckets, bucket_col)
            .write.bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .option("path", path)
            .mode("append")
            .saveAsTable(tbl)
        )
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(append_tag)
        os.replace(tmp, marker)
    # drop session memos so readers see the appended files
    _ATTACHED.pop((id(spark), tbl), None)
    spark.catalog.refreshTable(tbl)
    return True


def _stored_schema(spark: SparkSession, path: str):
    """Index schema: the sidecar written at build time, else inferred
    from the data files (pre-sidecar layouts)."""
    sidecar = f"{path}.schema.json"
    if os.path.isfile(sidecar):
        from pyspark.sql.types import StructType

        with open(sidecar) as f:
            return StructType.fromJson(__import__("json").loads(f.read()))
    return spark.read.parquet(path).schema


def get_or_build_index(
    spark: SparkSession,
    name: str,
    fingerprint: str,
    build: "callable[[], DataFrame]",
    bucket_col: str | None = None,
    n_buckets: int = 16,
    partition_col: str | None = None,
    spec_version: str = "v1",
) -> DataFrame:
    """Serve the index table ``name`` for the corpus ``fingerprint``
    from disk, building it (once, under a lock) if absent.

    - ``bucket_col`` set: written as an external BUCKETED table
      (one file per bucket, sorted by the bucket column) so equality /
      IN probes on that column bucket-prune; re-attached across
      processes via CLUSTERED BY DDL.
    - ``partition_col`` set: written as a directory-PARTITIONED table
      (one dir per value — the IVF-list layout) so probes prune via
      static or dynamic partition pruning.
    - neither: plain parquet directory (small sibling tables: df,
      totals, centroids).
    """
    if bucket_col and partition_col:
        raise ValueError("bucket_col and partition_col are exclusive")
    tbl = _table_name(
        name, fingerprint, bucket_col, n_buckets, partition_col, spec_version
    )
    path = f"{_STORE_DIR}/{tbl}"
    memo = (id(spark), tbl)
    if memo in _ATTACHED:
        return _ATTACHED[memo]

    if not _complete(path):
        with _build_lock(path):
            if not _complete(path):  # re-check under the lock
                df = build()
                # schema sidecar: an index that is legitimately EMPTY
                # at build time (day-zero streaming bootstrap) writes
                # no parquet data files, so a later attach cannot
                # infer its schema from the directory
                os.makedirs(_STORE_DIR, exist_ok=True)
                tmp = f"{path}.schema.json.tmp"
                with open(tmp, "w") as f:
                    f.write(df.schema.json())
                os.replace(tmp, f"{path}.schema.json")
                if bucket_col:
                    (
                        df.repartition(n_buckets, bucket_col)
                        .write.bucketBy(n_buckets, bucket_col)
                        .sortBy(bucket_col)
                        .option("path", path)
                        .mode("overwrite")
                        .saveAsTable(f"{tbl}_w")
                    )
                    # saveAsTable was only the writer; serving goes
                    # through the attach path below so fresh sessions
                    # and the building session share one code path
                    spark.sql(f"DROP TABLE IF EXISTS {tbl}_w")
                elif partition_col:
                    df.write.partitionBy(partition_col).mode(
                        "overwrite"
                    ).parquet(path)
                else:
                    df.write.mode("overwrite").parquet(path)

    if bucket_col:
        if not spark.catalog.tableExists(tbl):
            schema = _stored_schema(spark, path)
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema
            )
            spark.sql(
                f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
                f"CLUSTERED BY (`{bucket_col}`) SORTED BY (`{bucket_col}`) "
                f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
            )
        # bucket pruning works regardless of autoBucketedScan, but the
        # exchange-free probe joins need the bucket-mode confs; enter
        # the session mode through the shared helper
        from mmw_geoprocessing_spark.sources import fixtures as fx

        fx.enter_bucket_mode(spark)
        out = spark.table(tbl)
    else:
        out = spark.read.parquet(path)
    _ATTACHED[memo] = out
    return out
