"""File-level zone maps: a min/max statistics index consulted at
planning time, and the scan pruning it enables.

Why this exists at 100 TB: directory partitioning prunes exactly the
dimensions you physically partitioned by, and parquet row-group
statistics are consulted only AFTER a file is opened — the driver
still lists, schedules, and opens every file in the table. Lakehouse
table formats (Delta, Iceberg, Hudi) all fix this the same way: a
table-level per-file statistics index that the planner intersects
with the query predicate BEFORE any data file is touched. Delta calls
the technique data skipping; Iceberg keeps it in manifest files. This
module rebuilds that capability on plain parquet directories, which
is what the rest of this repo reads:

- ``build_zonemap`` computes per-file ``min``/``max`` per indexed
  column plus a row count in ONE distributed scan (``input_file_name``
  + hash aggregate keyed by file — n_files groups, a tiny shuffle);
- ``zonemap_pruned_read`` intersects a conjunction of range
  predicates with the index. The intersection itself is a DataFrame
  filter over the (small) index relation; only the SURVIVING file
  names are collected to the driver — at a million-file table that
  collect is bounded by the selectivity, not the table size. The
  survivors are handed to ``spark.read.parquet(*files)`` and the
  residual predicate re-applied, so the result is bit-identical to
  the full scan (zone maps are a superset filter: a file may survive
  on min/max overlap yet contain no matching row).

The pruning is only as good as the physical layout — a table whose
files all span the full value range skips nothing. That is the
``sort_cols`` / Z-order half of :mod:`.maintenance`: cluster the
rewrite, then the zone map turns the clustering into skipped I/O.
tests/test_zonemap.py pins both halves: bit-equality of pruned vs
full scans, and files_read < files_total on a clustered layout.

Reference parity note: the reference's only planning-time pruning is
its S3 layer catalog keyed by grid extent (Utils.scala:241-248 —
fetch only the tiles intersecting the AOI bbox); sources/catalog.py
mirrors that for rasters. Zone maps generalize the same idea to
arbitrary columns of arbitrary tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_zonemap(df_or_path, spark: SparkSession | None = None,
                  cols: list[str] | None = None) -> DataFrame:
    """Per-file statistics index: one row per data file with
    ``file, n_rows, min_<c>, max_<c>`` for each indexed column.

    One distributed scan + one n_files-group hash aggregate. The
    aggregate is partial+final (map-side combine), so the shuffle
    carries at most n_files × n_partitions tiny rows.

    EMPTY data files are invisible to the index (no rows → no
    ``input_file_name`` group; found by the hypothesis layout test).
    That is sound everywhere the index is consulted — an empty file
    can never contribute rows to a pruned read, and a delete manifest
    that omits it loses nothing (vacuum then reclaims it as an
    orphan) — but it means ``files_total`` counts non-empty files,
    not physical files.
    """
    if isinstance(df_or_path, str):
        assert spark is not None
        df = spark.read.parquet(df_or_path)
    else:
        df = df_or_path
    cols = cols or []
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.select(F.input_file_name().alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def prune_files(zonemap: DataFrame, ranges: dict[str, tuple]) -> tuple[list[str], int]:
    """Intersect a conjunction of closed ranges ``{col: (lo, hi)}``
    with the index; returns (surviving file paths, total files).

    A file survives when every predicate interval overlaps its
    [min, max] envelope: ``max_c >= lo AND min_c <= hi``. NULL
    envelopes (all-NULL file for that column) survive conservatively.
    The index relation is one row per data file, so the whole decision
    comes back in ONE single-stage collect of ``(file, keep)`` pairs —
    the former global ``agg(count, collect_list(...))`` form paid a
    partial+final aggregate and its exchange on every serving-path
    query for the same information (optimization r14, guide §1.4/§2.4:
    the planning-time index consult should cost one stage, not two).
    Driver-side data is still the index size (one row per file), which
    a manifest-plane object is by definition.
    """
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        overlap = (F.col(f"max_{c}") >= F.lit(lo)) & (F.col(f"min_{c}") <= F.lit(hi))
        cond = cond & (overlap | F.col(f"min_{c}").isNull())
    rows = zonemap.select(F.col("file"), cond.alias("_keep")).collect()
    return sorted(r["file"] for r in rows if r["_keep"]), len(rows)


def zonemap_pruned_read(
    spark: SparkSession,
    zonemap: DataFrame,
    ranges: dict[str, tuple],
    schema_src: str | None = None,
) -> tuple[DataFrame, dict]:
    """Plan a scan through the zone map: read only surviving files,
    re-apply the residual predicate (min/max overlap is necessary,
    not sufficient). Returns (DataFrame, skip stats).

    ``schema_src``: directory to borrow the schema from when every
    file is pruned (an empty relation still needs a schema).
    """
    files, total = prune_files(zonemap, ranges)
    if files:
        df = spark.read.parquet(*files)
    else:
        assert schema_src is not None, "all files pruned and no schema_src"
        df = spark.read.parquet(schema_src).where(F.lit(False))
    for c, (lo, hi) in ranges.items():
        df = df.where(F.col(c).between(F.lit(lo), F.lit(hi)))
    return df, {"files_total": total, "files_read": len(files)}


def extend_zonemap(existing: DataFrame, df_or_path, spark: SparkSession,
                   cols: list[str]) -> DataFrame:
    """Incremental index maintenance: index rows for NEW files union'd
    onto the existing index (no rebuild of indexed files). ``existing``
    rows for files that no longer exist are dropped by the caller via
    the manifest; appended files only need their own one-file scans —
    the shape of a daily ingest appending to a 100 TB table."""
    new_rows = build_zonemap(df_or_path, spark, cols)
    return existing.unionByName(new_rows)
