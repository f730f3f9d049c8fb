"""mmw_geoprocessing_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of WikiWatershed/mmw-geoprocessing.

The reference (read-only at /root/reference) is a stateless HTTP service
answering zonal-statistics queries over tiled raster layers
(api/src/main/scala/Geoprocessing.scala). This engine re-expresses that
surface — plus a general relational surface and LLM-data-pipeline
operators — as idiomatic Spark DataFrame plans:

    scan (parquet, predicate pushdown)
      → multi-way full-outer join on pixel key (Utils.scala:221-232)
      → mask semi/inner join (Geoprocessing.scala:356)
      → hash aggregate grouped by the value tuple (Geoprocessing.scala:357)

Everything relational is stock Catalyst; the only Python-side compute is
geometry handling and (optional) rasterization pandas UDFs.
"""

from mmw_geoprocessing_spark.session import get_spark  # noqa: F401

NODATA_INT = -2147483648  # Int.MinValue; leaks into group keys by design
# (reference CHANGELOG.md:61-63, Utils.scala:225)

__version__ = "0.1.0"
