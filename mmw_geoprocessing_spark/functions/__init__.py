from mmw_geoprocessing_spark.functions.nodata import (  # noqa: F401
    NODATA_INT,
    list_key,
    nodata_filled,
)
