"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query key.

Column names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mmw_geoprocessing_spark import oracle
from mmw_geoprocessing_spark.operators import zonal
from mmw_geoprocessing_spark.sources import fixtures as fx
from mmw_geoprocessing_spark.sources.tables import register_views

# ---------------------------------------------------------------------------
# Zonal fixture wiring: the reference's 7-template benchmark suite
# (reference scripts/benchmark-mapshed:25-107) instantiated on our
# deterministic fixtures.
# ---------------------------------------------------------------------------


def _prep(spark: SparkSession, sf_dir: str) -> None:
    register_views(spark, sf_dir)


def _q_grouped_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    layers = [fx.raster_df(spark, r) for r in ("nlcd", "soil")]
    return zonal.raster_grouped_count(layers, fx.mask_df(spark, "huc8_01"))


def _q_grouped_count_nodata(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gwn is missing tile columns -> exercises the full-outer NODATA fill
    # (reference Utils.scala:221-232, CHANGELOG.md:51-64)
    _prep(spark, sf_dir)
    layers = [fx.raster_df(spark, r) for r in ("nlcd", "gwn")]
    return zonal.raster_grouped_count(layers, fx.mask_df(spark, "huc8_01"))


def _q_grouped_count_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    layers = [fx.raster_df(spark, r) for r in ("nlcd", "soil")]
    return zonal.raster_grouped_count_many(layers, fx.mask_all_df(spark))


def _q_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    return zonal.raster_average(fx.raster_df(spark, "slope"), fx.mask_df(spark, "huc8_01"))


def _q_grouped_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    return zonal.raster_grouped_average(
        [fx.raster_df(spark, "nlcd")], fx.raster_df(spark, "slope"), fx.mask_df(spark, "huc8_01")
    )


def _q_grouped_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    return zonal.raster_grouped_sum(
        [fx.raster_df(spark, "nlcd")], fx.raster_df(spark, "awc"), fx.mask_df(spark, "huc8_01")
    )


def _q_lines_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    layers = [fx.raster_df(spark, r) for r in ("nlcd", "soil")]
    return zonal.raster_lines_join(layers, fx.line_pixels_df(spark), fx.mask_df(spark, "huc8_01"))


def _q_lines_join_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # empty-result contract: AOI intersecting no lines -> {} not an error
    # (reference CHANGELOG.md:66-79)
    _prep(spark, sf_dir)
    return zonal.raster_lines_join(
        [fx.raster_df(spark, "nlcd")], fx.line_pixels_df(spark), fx.mask_df(spark, "huc12_empty")
    )


def _q_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    targets = [fx.raster_df(spark, r) for r in ("slope", "awc", "kfactor")]
    return zonal.raster_summary(targets, fx.mask_df(spark, "huc8_01"))


def _q_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    nlcd, soil = fx.raster_df(spark, "nlcd"), fx.raster_df(spark, "soil")
    slope, awc = fx.raster_df(spark, "slope"), fx.raster_df(spark, "awc")
    mask8 = fx.mask_df(spark, "huc8_01")
    return zonal.multi_operation(
        grouped_counts={"nlcd_soil": ([nlcd, soil], fx.mask_all_df(spark))},
        grouped_averages={"nlcd_slope": ([nlcd], slope, mask8)},
        averages={"avg_awc": (awc, mask8)},
    )


_ZONAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "raster_grouped_count": _q_grouped_count,
    "raster_grouped_count_nodata": _q_grouped_count_nodata,
    "raster_grouped_count_many": _q_grouped_count_many,
    "raster_average": _q_average,
    "raster_grouped_average": _q_grouped_average,
    "raster_grouped_sum": _q_grouped_sum,
    "raster_lines_join": _q_lines_join,
    "raster_lines_join_empty": _q_lines_join_empty,
    "raster_summary": _q_summary,
    "multi_operation": _q_multi,
}

_ZONAL_ORACLES: dict[str, str] = {
    "raster_grouped_count": oracle.grouped_count(["nlcd", "soil"], "huc8_01"),
    "raster_grouped_count_nodata": oracle.grouped_count(["nlcd", "gwn"], "huc8_01"),
    "raster_grouped_count_many": oracle.grouped_count_many(["nlcd", "soil"]),
    "raster_average": oracle.average("slope", "huc8_01"),
    "raster_grouped_average": oracle.grouped_average(["nlcd"], "slope", "huc8_01"),
    "raster_grouped_sum": oracle.grouped_sum(["nlcd"], "awc", "huc8_01"),
    "raster_lines_join": oracle.lines_join(["nlcd", "soil"], "huc8_01"),
    "raster_lines_join_empty": oracle.lines_join(["nlcd"], "huc12_empty"),
    "raster_summary": oracle.summary(["slope", "awc", "kfactor"], "huc8_01"),
    "multi_operation": oracle.multi(
        grouped_counts={"nlcd_soil": ["nlcd", "soil"]},
        grouped_averages={"nlcd_slope": (["nlcd"], "slope", "huc8_01")},
        averages={"avg_awc": ("awc", "huc8_01")},
    ),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: zonal histogram (RasterGroupedCount) at sf0.001."""
    return _q_grouped_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_ZONAL_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ZONAL_ORACLES)
