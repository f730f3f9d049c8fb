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
    if not os.path.isdir(dst):
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
