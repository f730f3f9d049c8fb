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


def test_multi_geojson_lines_join_without_streamlines_typed_400(spark, tables):
    """A /multi RasterLinesJoin on the GEOMETRY path with no request
    streamLines must raise the typed MissingStreamLines error
    (Geoprocessing.scala:70-74), not silently fall back to the fixture
    line-pixel table (ADVICE r6). The pre-rasterized aoi-id path keeps
    the fixture fallback."""
    import json

    import pytest as pt

    from mmw_geoprocessing_spark.errors import MissingStreamLinesError
    from mmw_geoprocessing_spark.plans.api import multi_request
    from mmw_geoprocessing_spark.plans.model import MultiInput, Operation

    shape = json.dumps(
        {"type": "Polygon",
         "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]}
    )
    with pt.raises(MissingStreamLinesError):
        multi_request(
            spark,
            MultiInput(
                shapes=[shape],
                operations=[
                    Operation(name="RasterLinesJoin", label="streams", rasters=["nlcd"])
                ],
                shape_crs="ConusAlbers",
            ),
        )
    # aoi-id path: same op, fixture line pixels -> still served
    out = multi_request(
        spark,
        MultiInput(
            shapes=["huc8_01"],
            operations=[
                Operation(name="RasterLinesJoin", label="streams", rasters=["nlcd"])
            ],
        ),
    )
    assert out["huc8_01"]["streams"]


def test_multi_geojson_shape_ids_key_results(spark, tables):
    """Wire HUC ids key the /multi response map (WebServer.scala:32-35);
    entries without an id fall back to positional labels."""
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
            shape_ids=["huc12__99", None],
            operations=[
                Operation(name="RasterGroupedCount", label="nlcd", rasters=["nlcd"])
            ],
            shape_crs="ConusAlbers",
        ),
    )
    assert set(out) == {"huc12__99", "shape_1"}
    assert sum(out["huc12__99"]["nlcd"].values()) == 16


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


def test_multi_geojson_latlng_reprojected_matches_native(spark, tables):
    """A /multi payload carrying LatLng shapes against the ConusAlbers
    raster frame (the reference's wire default, Geoprocessing.scala:
    23-24 normalizeHuc) must produce the SAME result as the equivalent
    request whose shapes are already in the raster frame."""
    import json

    from mmw_geoprocessing_spark import projection
    from mmw_geoprocessing_spark.plans.api import multi_request
    from mmw_geoprocessing_spark.plans.model import MultiInput, Operation

    native_rings = [
        [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
        [[8, 0], [14, 0], [14, 3], [8, 3], [8, 0]],
    ]

    def poly(ring):
        return json.dumps({"type": "Polygon", "coordinates": [ring]})

    ops = [Operation(name="RasterGroupedCount", label="nlcd", rasters=["nlcd"])]

    native = multi_request(
        spark,
        MultiInput(
            shapes=[poly(r) for r in native_rings],
            operations=ops,
            shape_crs="ConusAlbers",  # == raster_crs default -> no reprojection
        ),
    )

    latlng_rings = [
        [list(projection.conus_albers_to_latlng(x, y)) for x, y in ring]
        for ring in native_rings
    ]
    via_latlng = multi_request(
        spark,
        MultiInput(
            shapes=[poly(r) for r in latlng_rings],
            operations=ops,
            shape_crs="LatLng",  # wire default; normalized -> ConusAlbers
        ),
    )
    assert native == via_latlng
    assert sum(native["shape_0"]["nlcd"].values()) == 16


def test_multi_geojson_rejects_unknown_raster_crs(spark, tables):
    import json

    shape = json.dumps(
        {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]}
    )
    with pytest.raises(UnknownCRSError):
        api.multi_request(
            spark,
            MultiInput(
                shapes=[shape],
                operations=[Operation("RasterGroupedCount", "n", rasters=["nlcd"])],
                shape_crs="LatLng",
                raster_crs="Mars2000",
            ),
        )


def _zoom_shape(scale: float) -> str:
    import json

    c = 64.0 * scale
    return json.dumps(
        {"type": "Polygon",
         "coordinates": [[[0, 0], [c, 0], [c, c], [0, c], [0, 0]]]}
    )


def _mask_at(spark, zoom, shape):
    from mmw_geoprocessing_spark.plans.api import _mask

    return _mask(
        spark,
        InputData(
            "RasterGroupedCount", rasters=["nlcd"],
            shape_geojson=[shape], shape_crs="ConusAlbers",
            raster_crs=None, zoom=zoom,
        ),
    )


def test_run_zoom_selects_grid_layout(spark, tables):
    """Zoom resolves to a REGISTERED layer layout only (the reference
    derives the grid from the tile layer, Geoprocessing.scala:219-221):
    the ladder registers 0 (fixture frame), 13 (native 30 m) and 12
    (60 m); an unregistered zoom is a typed 400 — serving a mask in an
    unmatched frame would join mismatched pixel keys and return
    silently wrong counts. The pyramid formula stays available for
    deployments registering their own layers."""
    import pytest

    from mmw_geoprocessing_spark import geometry
    from mmw_geoprocessing_spark.errors import InvalidZoomError

    # the candidate enumeration is clipped to the LAYER grid extent
    # (GridLayout.extent_keys — GeoTrellis rasterizes against the
    # layer's TileLayerMetadata extent), so the 64x64-cell request
    # square yields 64 cells per covered row, bounded by the fixture
    # grid's tile rows at this sf
    from mmw_geoprocessing_spark.sources import fixtures as fx

    kc0, kr0, kc1, kr1 = fx.grid_key_extent(spark)
    covered_rows = min(64, (kr1 + 1) * 8) - max(0, kr0 * 8)
    assert _mask_at(spark, 0, _zoom_shape(1.0)).count() == 64 * covered_rows
    with pytest.raises(InvalidZoomError):
        _mask_at(spark, 5, _zoom_shape(1.0))

    # registered ladder: grid tile size comes from the LAYER (8x8
    # fixture tiles), cell size from the pyramid level
    assert geometry.ZOOM_LAYOUTS[13].cellsize == 30.0
    assert geometry.ZOOM_LAYOUTS[12].cellsize == 60.0
    assert geometry.layout_for_zoom(0) is geometry.DEFAULT_LAYOUT
    # unregistered levels still resolve via the 512-tile formula for
    # explicit-layout callers
    lay5 = geometry.layout_for_zoom(5)
    assert lay5.tile_size == 512 and lay5.cellsize == 30.0 * 2.0 ** 8


def test_zoom_ladder_mask_parity(spark, tables):
    """Mask parity across the ladder: the same WORLD region rasterized
    at zoom 13 (30 m cells) / zoom 12 (60 m cells) covers exactly the
    pixel keys of the equivalent zoom-0 request — the fixture layers
    are keyed once, the zoom only changes the world->grid frame."""
    base = {tuple(r) for r in _mask_at(spark, 0, _zoom_shape(1.0)).collect()}
    z13 = {tuple(r) for r in _mask_at(spark, 13, _zoom_shape(30.0)).collect()}
    z12 = {tuple(r) for r in _mask_at(spark, 12, _zoom_shape(60.0)).collect()}
    assert z13 == base
    assert z12 == base


def _run_at_zoom(spark, zoom, scale):
    return api.run_request(
        spark,
        InputData(
            "RasterGroupedCount", rasters=["nlcd", "soil"],
            shape_geojson=[_zoom_shape(scale)], shape_crs="ConusAlbers",
            raster_crs=None, zoom=zoom,
        ),
    )


def test_run_request_at_zoom_13(spark, tables):
    """A full /run at the native zoom (13): grouped counts over a
    GeoJSON AOI given in the zoom-13 world frame (meters) equal the
    zoom-0 counts of the equivalent AOI — 13 serves the stored native
    layer, only the world->grid frame differs."""
    base = _run_at_zoom(spark, 0, 1.0)
    # counts cover mask ∩ layer-present pixels (inner join; sf0.001's
    # pixel space is smaller than the 64x64 AOI)
    assert base and sum(base.values()) > 0
    assert _run_at_zoom(spark, 13, 30.0) == base


def test_run_request_at_zoom_12_serves_pyramid_level(spark, tables):
    """/run at zoom 12 serves the REAL derived pyramid level (the
    reference fetches a per-zoom layer, Geoprocessing.scala:219-221 +
    the -512 layer pyramid): results equal a direct zonal grouped count
    over pyramid_down'ed layers with the zoom-12 mask, and differ from
    the native-resolution answer (coarser data, ~quarter the pixels)."""
    from mmw_geoprocessing_spark import geometry
    from mmw_geoprocessing_spark.operators import zonal
    from mmw_geoprocessing_spark.sources import fixtures as fx

    got = _run_at_zoom(spark, 12, 60.0)
    polys = geometry.parse_multipolygon(_zoom_shape(60.0))
    mask = geometry.rasterize_polygons(
        spark, polys, layout=geometry.ZOOM_LAYOUTS[12]
    )
    layers = [fx.raster_df_at_zoom(spark, r, 12) for r in ("nlcd", "soil")]
    want = {
        r["list_key"]: r["cnt"]
        for r in zonal.raster_grouped_count(layers, mask).collect()
    }
    assert got == want and got
    native = _run_at_zoom(spark, 0, 1.0)
    n12, n0 = sum(got.values()), sum(native.values())
    assert 0 < n12 <= (n0 // 2)  # coarser level: ~quarter the pixels


def test_lines_join_geometric_clip_boundary_cell(spark, tables):
    """Convex-corner divergence pinned CLOSED (VERDICT r2 What's-wrong
    #2): a stream segment that crosses a masked cell only where the AOI
    does NOT cover it must contribute nothing. The cell-level semi-join
    alone would count cell (1,6): its center (1.5, 6.5) is inside the
    triangle, while the whole segment lies strictly outside (x + y >
    8.2). The reference clips line geometry to the AOI before
    rasterizing (Utils.scala:196-198)."""
    import json

    tri = json.dumps(
        {"type": "Polygon",
         "coordinates": [[[0, 0], [8.2, 0], [0, 8.2], [0, 0]]]}
    )
    seg = json.dumps(
        {"type": "LineString", "coordinates": [[1.4, 6.9], [2.5, 6.9]]}
    )
    res = api.run_request(
        spark,
        InputData(
            "RasterLinesJoin", rasters=["nlcd"],
            shape_geojson=[tri], shape_crs="ConusAlbers", raster_crs=None,
            stream_lines_geojson=[seg],
        ),
    )
    assert res == {}

    # control: a segment that DOES run inside the AOI produces counts
    seg_in = json.dumps(
        {"type": "LineString", "coordinates": [[0.2, 6.9], [2.5, 6.9]]}
    )
    res_in = api.run_request(
        spark,
        InputData(
            "RasterLinesJoin", rasters=["nlcd"],
            shape_geojson=[tri], shape_crs="ConusAlbers", raster_crs=None,
            stream_lines_geojson=[seg_in],
        ),
    )
    assert res_in and sum(res_in.values()) > 0


def test_run_zoom_12_with_aoi_ids_serves_pyramided_mask(spark, tables):
    """ADVICE r5 high: pre-rasterized masks are native-frame; a /run at
    zoom 12 must serve them pyramid_down'ed into the zoom-12 keyspace
    (not join native mask keys against pyramided layers — silently
    wrong counts). Pinned: /run(zoom=12, aoi_ids) == a direct zonal
    count over pyramided layers with the pyramided mask."""
    from mmw_geoprocessing_spark.operators import zonal
    from mmw_geoprocessing_spark.sources import fixtures as fx

    got = api.run_request(
        spark,
        InputData(
            "RasterGroupedCount", rasters=["nlcd", "soil"],
            aoi_ids=["huc12_01", "huc12_02"], zoom=12,
        ),
    )
    layers = [fx.raster_df_at_zoom(spark, r, 12) for r in ("nlcd", "soil")]
    many = fx.mask_all_df_at_zoom(spark, 12)
    mask = (
        many.filter(many.aoi_id.isin(["huc12_01", "huc12_02"]))
        .drop("aoi_id")
        .dropDuplicates(zonal.PIXEL_KEY)
    )
    want = {
        r["list_key"]: r["cnt"]
        for r in zonal.raster_grouped_count(layers, mask).collect()
    }
    assert got == want and got
    # and the native-frame answer is different (coarser level)
    native = api.run_request(
        spark,
        InputData(
            "RasterGroupedCount", rasters=["nlcd", "soil"],
            aoi_ids=["huc12_01", "huc12_02"],
        ),
    )
    assert sum(got.values()) < sum(native.values())


def test_run_zoom_12_count_many_and_lines_join_consistent_frames(spark, tables):
    """The CountMany and LinesJoin pre-rasterized paths must also serve
    zoom-12 masks/line-pixels in the zoom-12 keyspace."""
    from mmw_geoprocessing_spark.operators import zonal
    from mmw_geoprocessing_spark.sources import fixtures as fx

    got = api.run_request(
        spark,
        InputData(
            "RasterGroupedCountMany", rasters=["nlcd"],
            aoi_ids=["huc12_01"], zoom=12,
        ),
    )
    many = fx.mask_all_df_at_zoom(spark, 12)
    many = many.filter(many.aoi_id == "huc12_01")
    want_df = zonal.raster_grouped_count_many(
        [fx.raster_df_at_zoom(spark, "nlcd", 12)], many
    )
    want = {"huc12_01": {r["list_key"]: r["cnt"] for r in want_df.collect()}}
    assert got == want and got["huc12_01"]

    got_lines = api.run_request(
        spark,
        InputData(
            "RasterLinesJoin", rasters=["nlcd"],
            aoi_ids=["huc8_01"], use_line_pixels=True, zoom=12,
        ),
    )
    want_lines_df = zonal.raster_lines_join(
        [fx.raster_df_at_zoom(spark, "nlcd", 12)],
        fx.line_pixels_df_at_zoom(spark, 12),
        fx.mask_df_at_zoom(spark, "huc8_01", 12),
    )
    want_lines = {r["list_key"]: r["cnt"] for r in want_lines_df.collect()}
    assert got_lines == want_lines and got_lines


def test_run_unregistered_zoom_with_aoi_ids_still_typed_400(spark, tables):
    from mmw_geoprocessing_spark.errors import InvalidZoomError

    for req in (
        InputData("RasterGroupedCount", rasters=["nlcd"], aoi_ids=["huc12_01"], zoom=5),
        InputData("RasterGroupedCountMany", rasters=["nlcd"], aoi_ids=["huc12_01"], zoom=5),
        InputData(
            "RasterLinesJoin", rasters=["nlcd"], aoi_ids=["huc8_01"],
            use_line_pixels=True, zoom=5,
        ),
    ):
        with pytest.raises(InvalidZoomError):
            api.run_request(spark, req)


def test_multi_streamlines_matches_run_lines_join(spark, tables):
    """/multi with request streamLines (reference MultiInput.streamLines,
    WebServer.scala:47) must produce the same nlcd_streams result as the
    equivalent /run RasterLinesJoin over the same polygon + vector."""
    import json

    from mmw_geoprocessing_spark.plans.api import multi_request, run_request
    from mmw_geoprocessing_spark.plans.model import InputData, MultiInput, Operation

    poly = json.dumps(
        {"type": "Polygon", "coordinates": [[[0, 0], [6, 0], [6, 6], [0, 6], [0, 0]]]}
    )
    line = json.dumps(
        {"type": "MultiLineString", "coordinates": [[[0.2, 0.7], [5.6, 4.9]], [[1.1, 5.2], [4.8, 0.3]]]}
    )

    via_run = run_request(
        spark,
        InputData(
            operation_type="RasterLinesJoin",
            rasters=["nlcd"],
            shape_geojson=[poly],
            shape_crs="ConusAlbers",
            stream_lines_geojson=[line],
            raster_crs="ConusAlbers",
        ),
    )
    assert via_run and sum(via_run.values()) > 0

    via_multi = multi_request(
        spark,
        MultiInput(
            shapes=[poly],
            stream_lines_geojson=[line],
            operations=[
                Operation(name="RasterLinesJoin", label="nlcd_streams", rasters=["nlcd"])
            ],
            shape_crs="ConusAlbers",
            raster_crs="ConusAlbers",
        ),
    )
    assert via_multi["shape_0"]["nlcd_streams"] == {
        k: float(v) for k, v in via_run.items()
    }
