from mmw_geoprocessing_spark.sources.tables import TABLE_NAMES, load_tables, register_views  # noqa: F401
