"""Property-based tests (hypothesis): zonal operator invariants on
randomized pixel tables, checked against an independent pandas
reference implementation — inputs the oracle suite never generates
(adversarial NODATA density, tiny/degenerate masks, value collisions).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mmw_geoprocessing_spark.functions.nodata import NODATA_INT
from mmw_geoprocessing_spark.operators import zonal

CELLS = [(kc, kr, cc, cr) for kc in range(2) for kr in range(2) for cc in range(3) for cr in range(3)]


def _layer_strategy():
    # per-cell: None (tile missing), or value in a tiny domain incl. NULL
    return st.lists(
        st.one_of(st.none(), st.integers(min_value=-1, max_value=3)),
        min_size=len(CELLS),
        max_size=len(CELLS),
    )


def _mk_layer(spark, values):
    rows = [
        (kc, kr, cc, cr, v)
        for (kc, kr, cc, cr), v in zip(CELLS, values)
        if v != -1  # -1 encodes "cell absent from this layer's extent"
    ]
    return spark.createDataFrame(
        rows or [(0, 0, 0, 0, None)],
        "key_col int, key_row int, cell_col int, cell_row int, value int",
    ).filter("key_col >= 0" if rows else "key_col < 0")


def _mk_mask(spark, members):
    rows = [CELLS[i] for i in sorted(members)]
    return spark.createDataFrame(
        rows or [(-1, -1, -1, -1)],
        "key_col int, key_row int, cell_col int, cell_row int",
    ).filter("key_col >= 0")


@settings(max_examples=12, deadline=None)
@given(
    a=_layer_strategy(),
    b=_layer_strategy(),
    mask=st.sets(st.integers(min_value=0, max_value=len(CELLS) - 1)),
)
def test_grouped_count_matches_pandas_reference(spark, a, b, mask):
    la, lb = _mk_layer(spark, a), _mk_layer(spark, b)
    m = _mk_mask(spark, mask)
    got = {
        r["list_key"]: r["cnt"]
        for r in zonal.raster_grouped_count([la, lb], m).collect()
    }

    # independent reference: dict-based full-outer join + mask + count
    da = {c: v for c, v in zip(CELLS, a) if v != -1}
    db = {c: v for c, v in zip(CELLS, b) if v != -1}
    want: dict[str, int] = {}
    for i in mask:
        c = CELLS[i]
        if c not in da and c not in db:
            continue  # pixel exists in no layer -> not in the key union
        va = da.get(c)
        vb = db.get(c)
        va = NODATA_INT if (c not in da or va is None) else va
        vb = NODATA_INT if (c not in db or vb is None) else vb
        k = f"List({va}, {vb})"
        want[k] = want.get(k, 0) + 1
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    t=_layer_strategy(),
    mask=st.sets(st.integers(min_value=0, max_value=len(CELLS) - 1), min_size=1),
)
def test_average_matches_pandas_reference(spark, t, mask):
    lt = _mk_layer(spark, t)
    m = _mk_mask(spark, mask)
    got = zonal.raster_average(lt, m).collect()[0]["avg_value"]
    # reference model of the O3 key set: only mask pixels PRESENT in the
    # target layer are visited (NODATA present rows count as 0.0; absent
    # rows are never visited — zonal.raster_average docstring)
    dt = {c: v for c, v in zip(CELLS, t) if v != -1}
    vals = [
        float(dt[CELLS[i]]) if dt[CELLS[i]] is not None else 0.0
        for i in mask
        if CELLS[i] in dt
    ]
    if vals:
        assert abs(got - sum(vals) / len(vals)) < 1e-9
    else:
        assert got is None  # empty intersection -> NULL average


@settings(max_examples=10, deadline=None)
@given(
    a=_layer_strategy(),
    mask=st.sets(st.integers(min_value=0, max_value=len(CELLS) - 1)),
)
def test_grouped_count_totals_invariant(spark, a, mask):
    """Σ counts == |mask ∩ union-of-layer-extents| for any layer/mask."""
    la = _mk_layer(spark, a)
    m = _mk_mask(spark, mask)
    rows = zonal.raster_grouped_count([la], m).collect()
    total = sum(r["cnt"] for r in rows)
    extent = {c for c, v in zip(CELLS, a) if v != -1}
    want = len([i for i in mask if CELLS[i] in extent])
    assert total == want


@settings(max_examples=10, deadline=None)
@given(
    g=_layer_strategy(),
    t=_layer_strategy(),
    mask=st.sets(st.integers(min_value=0, max_value=len(CELLS) - 1), min_size=1),
)
def test_grouped_average_union_key_set_matches_reference(spark, g, t, mask):
    """O4 union key-set semantics (joinCollectionLayers(target +: layers)):
    the pixel universe is (group-keys UNION target-keys) ∩ mask; pixels
    the group layer misses group under NODATA; missing/NULL target -> 0.0
    counted in the denominator."""
    lg, lt = _mk_layer(spark, g), _mk_layer(spark, t)
    m = _mk_mask(spark, mask)
    got = {
        r["list_key"]: r["avg_value"]
        for r in zonal.raster_grouped_average([lg], lt, m).collect()
    }

    dg = {c: v for c, v in zip(CELLS, g) if v != -1}
    dt = {c: v for c, v in zip(CELLS, t) if v != -1}
    sums: dict[str, list[float]] = {}
    for i in mask:
        c = CELLS[i]
        if c not in dg and c not in dt:
            continue  # in neither layer -> outside the key union
        vg = dg.get(c)
        vg = NODATA_INT if (c not in dg or vg is None) else vg
        tv = dt.get(c)
        tv = 0.0 if (c not in dt or tv is None) else float(tv)
        sums.setdefault(f"List({vg})", []).append(tv)
    want = {k: sum(v) / len(v) for k, v in sums.items()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])


@settings(max_examples=12, deadline=None)
@given(a=_layer_strategy())
def test_pyramid_down_mode_matches_python_reference(spark, a):
    """pyramid_down(mode) == the literal definition: per 2x2 world
    block, most frequent non-NULL child value, ties to the smallest,
    all-NULL blocks preserved as NULL parents."""
    from collections import Counter, defaultdict

    layer = _mk_layer(spark, a)
    got = {
        (r.key_col, r.key_row, r.cell_col, r.cell_row): r.value
        for r in zonal.pyramid_down(layer, tile_size=3).collect()
    }
    blocks = defaultdict(list)
    for (kc, kr, cc, cr), v in zip(CELLS, a):
        if v == -1:
            continue  # cell absent from the layer extent
        px, py = (kc * 3 + cc) // 2, (kr * 3 + cr) // 2
        blocks[(px // 3, py // 3, px % 3, py % 3)].append(v)
    want = {}
    for k, vs in blocks.items():
        nn = [v for v in vs if v is not None]
        if not nn:
            want[k] = None
        else:
            cnt = Counter(nn)
            want[k] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
    assert got == want


# ------------------------------------------------------------------ geometry
# Bit-exactness of the round-10 vectorized clip_lines against a direct
# scalar transliteration of the pre-vectorization algorithm (the numpy
# path claims IDENTICAL per-element float formulas; this pins it on
# random inputs, including bbox-pruned and degenerate segments).


def _clip_lines_scalar_reference(lines, polys):
    from mmw_geoprocessing_spark.geometry import _point_in_polys, _poly_simple_flags

    flags = _poly_simple_flags(polys)
    edges = [
        (ax, ay, bx, by)
        for poly in polys
        for ring in poly
        for (ax, ay), (bx, by) in zip(ring, ring[1:])
    ]
    out = []
    for line in lines:
        for (x0, y0), (x1, y1) in zip(line, line[1:]):
            dx, dy = x1 - x0, y1 - y0
            ts = {0.0, 1.0}
            for ax, ay, bx, by in edges:
                ex, ey = bx - ax, by - ay
                den = dx * ey - dy * ex
                if den == 0.0:
                    continue
                t = ((ax - x0) * ey - (ay - y0) * ex) / den
                u = ((ax - x0) * dy - (ay - y0) * dx) / den
                if 0.0 < t < 1.0 and 0.0 <= u <= 1.0:
                    ts.add(t)
            cuts = sorted(ts)
            for ta, tb in zip(cuts, cuts[1:]):
                tm = (ta + tb) / 2.0
                if _point_in_polys(x0 + dx * tm, y0 + dy * tm, polys, flags):
                    out.append(
                        [(x0 + dx * ta, y0 + dy * ta), (x0 + dx * tb, y0 + dy * tb)]
                    )
    return out


@settings(max_examples=60, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(-8, 8, allow_nan=False, width=32),
            st.floats(-8, 8, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=6,
    ),
    sq=st.floats(0.5, 5.0, allow_nan=False, width=32),
    off=st.floats(-3, 3, allow_nan=False, width=32),
)
def test_clip_lines_vectorized_matches_scalar_reference(pts, sq, off):
    from mmw_geoprocessing_spark.geometry import clip_lines

    sq, off = float(sq), float(off)
    square = [[[(off, off), (off + sq, off), (off + sq, off + sq), (off, off + sq), (off, off)]]]
    # also a self-crossing bowtie ring (nonzero-winding branch)
    bowtie = [[[(0.0, 0.0), (4.0, 4.0), (4.0, 0.0), (0.0, 4.0), (0.0, 0.0)]]]
    lines = [[(float(x), float(y)) for x, y in pts]]
    for polys in (square, bowtie, square + bowtie):
        got = clip_lines(lines, polys)
        want = _clip_lines_scalar_reference(lines, polys)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            for (gx, gy), (wx, wy) in zip(g, w):
                assert float(gx) == wx and float(gy) == wy  # BIT equality
