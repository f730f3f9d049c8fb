"""Geometry path: rasterizer semantics including the PixelIsPoint vs
PixelIsArea divergence (FIXTURES.md §7.8, reference Utils.scala:109-118)."""

from __future__ import annotations

from mmw_geoprocessing_spark import geometry


def _mask_set(spark, polys, pixel_is_area):
    df = geometry.rasterize_polygons(spark, polys, pixel_is_area)
    return {
        (r.key_col, r.key_row, r.cell_col, r.cell_row) for r in df.collect()
    }


def test_point_vs_area_sampling_diverge(spark):
    """A polygon clipping cell corners but missing centers: PixelIsArea
    (includePartial) must cover strictly more cells than PixelIsPoint."""
    polys = geometry.parse_multipolygon(
        '{"type":"Polygon","coordinates":[[[0.9,0.9],[3.1,0.9],[3.1,3.1],[0.9,3.1],[0.9,0.9]]]}'
    )
    pt = _mask_set(spark, polys, pixel_is_area=False)
    ar = _mask_set(spark, polys, pixel_is_area=True)
    assert pt  # centers of cells 1..2 x 1..2
    assert pt < ar  # area sampling adds the partially-covered rim cells
    assert len(pt) == 4 and len(ar) == 16


def test_polygon_with_hole(spark):
    """Even-odd ring handling: the hole's cells are excluded."""
    polys = geometry.parse_multipolygon(
        '{"type":"Polygon","coordinates":['
        "[[0,0],[8,0],[8,8],[0,8],[0,0]],"
        "[[2,2],[6,2],[6,6],[2,6],[2,2]]"
        "]}"
    )
    pt = _mask_set(spark, polys, pixel_is_area=False)
    assert len(pt) == 64 - 16  # 8x8 outer minus 4x4 hole
    assert (0, 0, 3, 3) not in pt  # inside the hole


def test_area_sampling_catches_sliver(spark):
    """A thin sliver crossing cells 1..6 touches them ONLY via edge
    crossings — no cell center inside, no cell corner inside, no polygon
    vertex in those cells. Exact PixelIsArea must still include them."""
    polys = geometry.parse_multipolygon(
        '{"type":"Polygon","coordinates":[[[0.4,0.1],[7.6,0.2],[0.4,0.2],[0.4,0.1]]]}'
    )
    pt = _mask_set(spark, polys, pixel_is_area=False)
    ar = _mask_set(spark, polys, pixel_is_area=True)
    assert pt == set()  # no cell centers (y=0.5) inside
    assert {(0, 0, c, 0) for c in range(8)} <= ar  # all 8 crossed cells


def test_non_polygon_geojson_tolerant(spark):
    assert geometry.parse_multipolygon('{"type":"Point","coordinates":[1,2]}') == []


def test_line_walk_crosses_tiles(spark):
    df = geometry.rasterize_lines(spark, [[(0.5, 0.5), (20.5, 0.5)]])
    rows = df.collect()
    assert {r.key_col for r in rows} == {0, 1, 2}  # crosses 3 tiles of 8
    assert len(rows) == 21  # 21 cells under the 20-unit horizontal segment
