"""API parity: dispatch, result shapes, error taxonomy
(reference WebServer.scala:64-111, ErrorHandler.scala:8-46)."""

from __future__ import annotations

import pytest

from mmw_geoprocessing_spark.errors import (
    InvalidOperationError,
    MissingStreamLinesError,
    MissingTargetRasterError,
    MissingVectorCRSError,
    MissingVectorError,
    UnknownCRSError,
)
from mmw_geoprocessing_spark.plans import api
from mmw_geoprocessing_spark.plans.model import InputData, MultiInput, Operation


def test_ping():
    assert api.ping() == "pong"


def test_run_grouped_count_list_keys(spark, tables):
    res = api.run_request(
        spark,
        InputData("RasterGroupedCount", rasters=["nlcd", "soil"], aoi_ids=["huc12_01"]),
    )
    assert res and all(k.startswith("List(") and k.endswith(")") for k in res)
    assert all(isinstance(v, int) for v in res.values())


def test_run_ungrouped_average_key(spark, tables):
    res = api.run_request(
        spark,
        InputData(
            "RasterGroupedAverage", rasters=[], target_raster="slope", aoi_ids=["huc12_01"]
        ),
    )
    assert set(res) == {"List(0)"}


def test_run_summary_order(spark, tables):
    res = api.run_request(
        spark,
        InputData("RasterSummary", rasters=["slope", "awc"], aoi_ids=["huc12_01"]),
    )
    assert isinstance(res, list) and len(res) == 2
    assert set(res[0]) == {"min", "avg", "max"}


def test_multi_nested_shape_and_empty_contract(spark, tables):
    res = api.multi_request(
        spark,
        MultiInput(
            shapes=["huc12_01", "huc12_empty"],
            operations=[
                Operation("RasterGroupedCount", "nlcd_soil", rasters=["nlcd", "soil"]),
                Operation("RasterLinesJoin", "nlcd_streams", rasters=["nlcd"]),
            ],
        ),
    )
    assert "nlcd_soil" in res["huc12_01"] and "nlcd_streams" in res["huc12_01"]
    # the empty AOI intersects no lines -> that op label is absent ({} contract)
    assert "nlcd_streams" not in res["huc12_empty"]


def test_error_taxonomy(spark, tables):
    with pytest.raises(InvalidOperationError):
        api.run_request(spark, InputData("NoSuchOp"))
    with pytest.raises(MissingVectorError):
        api.run_request(spark, InputData("RasterGroupedCount", rasters=["nlcd"]))
    with pytest.raises(MissingTargetRasterError):
        api.run_request(
            spark, InputData("RasterGroupedAverage", rasters=["nlcd"], aoi_ids=["huc12_01"])
        )
    with pytest.raises(MissingStreamLinesError):
        api.run_request(
            spark, InputData("RasterLinesJoin", rasters=["nlcd"], aoi_ids=["huc12_01"])
        )
    with pytest.raises(MissingVectorCRSError):
        api.run_request(
            spark,
            InputData(
                "RasterGroupedCount",
                rasters=["nlcd"],
                shape_geojson=['{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]}'],
            ),
        )
    with pytest.raises(UnknownCRSError):
        api.run_request(
            spark,
            InputData(
                "RasterGroupedCount",
                rasters=["nlcd"],
                shape_geojson=['{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]}'],
                shape_crs="EPSG:9999",
            ),
        )


def test_geometry_path_rasterized_mask(spark, tables):
    """GeoJSON AOI -> numpy rasterizer -> grouped count (the geometry
    path end-to-end: a 16x16-cell square should mask 256 cell centers)."""
    res = api.run_request(
        spark,
        InputData(
            "RasterGroupedCount",
            rasters=["nlcd"],
            shape_geojson=[
                '{"type":"Polygon","coordinates":[[[0,0],[16,0],[16,16],[0,16],[0,0]]]}'
            ],
            shape_crs="ConusAlbers",
        ),
    )
    assert sum(res.values()) == 256


def test_multi_geojson_shapes_path(spark, tables):
    """/multi with GeoJSON shapes (the reference's wire form,
    Geoprocessing.scala:23-26): shapes are rasterized to per-shape
    masks; results keyed shape_{i} in input order; grouped-count totals
    equal each shape's pixel count."""
    import json

    from mmw_geoprocessing_spark.plans.api import multi_request
    from mmw_geoprocessing_spark.plans.model import MultiInput, Operation

    def square(x0, y0, x1, y1):
        return json.dumps(
            {"type": "Polygon",
             "coordinates": [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]]}
        )

    out = multi_request(
        spark,
        MultiInput(
            shapes=[square(0, 0, 4, 4), square(8, 0, 14, 3)],
            operations=[
                Operation(name="RasterGroupedCount", label="nlcd", rasters=["nlcd"]),
                Operation(
                    name="RasterGroupedAverage", label="avg_slope",
                    rasters=[], target_raster="slope",
                ),
            ],
            shape_crs="ConusAlbers",
        ),
    )
    assert set(out) == {"shape_0", "shape_1"}
    # 4x4 and 6x3 pixel squares
    assert sum(out["shape_0"]["nlcd"].values()) == 16
    assert sum(out["shape_1"]["nlcd"].values()) == 18
    assert out["shape_0"]["avg_slope"]["List(0)"] > 0


def test_multi_geojson_respects_per_op_pixel_is_area(spark, tables):
    """Each /multi operation carries its own pixelIsArea (reference
    Utils.scala:109-118): an area-sampled count over a corner-clipping
    shape must see MORE pixels than the point-sampled count."""
    import json

    from mmw_geoprocessing_spark.plans.api import multi_request
    from mmw_geoprocessing_spark.plans.model import MultiInput, Operation

    shape = json.dumps(
        {"type": "Polygon",
         "coordinates": [[[0.9, 0.9], [3.1, 0.9], [3.1, 3.1], [0.9, 3.1], [0.9, 0.9]]]}
    )
    out = multi_request(
        spark,
        MultiInput(
            shapes=[shape],
            operations=[
                Operation(name="RasterGroupedCount", label="pt", rasters=["nlcd"]),
                Operation(
                    name="RasterGroupedCount", label="ar", rasters=["nlcd"],
                    pixel_is_area=True,
                ),
            ],
            shape_crs="ConusAlbers",
        ),
    )
    n_pt = sum(out["shape_0"]["pt"].values())
    n_ar = sum(out["shape_0"]["ar"].values())
    assert n_pt == 4 and n_ar == 16
