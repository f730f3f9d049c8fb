"""Replay the reference's checked-in example REQUEST documents through
this engine's wire parser and dispatch (reference examples/*.json —
read from /root/reference at test time, never copied into this repo).

What this pins: the wire schema (operationType / polygon / polygonCRS /
rasterCRS / streamLines / zoom and the /multi shapes+operations form)
parses VERBATIM reference payloads; real-world LatLng geometry flows
through CRS validation, reprojection, and rasterization; and an AOI
that does not intersect the grid returns the documented empty contract
(CHANGELOG.md:66-79) rather than an error. Raster ids are remapped to
the synthetic fixture layers (the reference's S3 catalog names have no
local data); everything else is byte-for-byte the reference's payload.
"""

from __future__ import annotations

import json
import os

import pytest

REF_EXAMPLES = "/root/reference/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_EXAMPLES), reason="reference examples not present"
)

FIXTURE_RASTERS = ["nlcd", "soil", "gwn"]


def _remap_rasters(names):
    """Stable mapping reference layer name -> fixture layer id."""
    table = {}
    for n in names:
        if n not in table:
            table[n] = FIXTURE_RASTERS[len(table) % len(FIXTURE_RASTERS)]
    return table


# every input-style example replays, including DRB_Medium's 1.4 MB
# 1856-line payload (feasible since the round-10 clip_lines/
# ring_is_simple vectorization; it was excluded for speed before)
INPUT_EXAMPLES = [
    "EmptyTileRequest.json",
    "MapshedJob_DRB_Small.json",
    "MapshedJob_DRB_Medium.json",
    "MapshedJob_NHD.json",
    "MapshedJob_RasterAverage.json",
    "MapshedJob_RasterGroupedAverage.json",
    "MapshedJob_RasterGroupedCount.json",
    "MapshedJob_RasterGroupedSum.json",
    "MapshedJob_RasterSummary.json",
    "TR55_RasterGroupedCountMany.json",
]


@pytest.mark.parametrize("fname", INPUT_EXAMPLES)
def test_replay_reference_run_example(spark, tables, fname):
    from mmw_geoprocessing_spark.http_server import input_data_from_json
    from mmw_geoprocessing_spark.plans import api

    with open(os.path.join(REF_EXAMPLES, fname)) as f:
        doc = json.load(f)["input"]
    inp = input_data_from_json(doc)
    remap = _remap_rasters(inp.rasters + ([inp.target_raster] if inp.target_raster else []))
    inp.rasters = [remap[r] for r in inp.rasters]
    if inp.target_raster:
        inp.target_raster = remap[inp.target_raster]
    # The examples' zoom 0 means "the catalog's native 30 m level"; this
    # engine's native frame is the zoom-13 ladder entry (same pixel
    # keyspace, world coordinates in meters — geometry.ZOOM_LAYOUTS).
    # Replaying real ~10 km geometry in the synthetic unit-cell frame
    # would rasterize a 10^8-cell candidate box for nothing.
    inp.zoom = 13

    result = api.run_request(spark, inp)
    json.dumps(result)  # the wire response must serialize
    # These AOIs are real Delaware-basin geometry — far outside the
    # synthetic grid — so every replay exercises parse + CRS handling +
    # reprojection + rasterization and ends at the empty-AOI contract
    # of its result shape (never an error).
    if inp.operation_type == "RasterSummary":
        # ResultSummary: one {min, avg, max} map per input raster
        assert isinstance(result, list) and len(result) == len(inp.rasters)
        assert all(set(d) == {"min", "avg", "max"} for d in result)
    elif inp.operation_type == "RasterGroupedCountMany":
        # ResultManyInt: one histogram per input polygon, input order
        assert result == [{} for _ in inp.shape_geojson]
    elif inp.operation_type == "RasterGroupedAverage" and not inp.rasters:
        # ungrouped average: the constant "List(0)" key with a NULL mean
        # (avg over zero pixels)
        assert result == {"List(0)": None}
    else:
        assert result == {}


def test_replay_reference_multi_example(spark, tables):
    from mmw_geoprocessing_spark.http_server import multi_input_from_json
    from mmw_geoprocessing_spark.plans import api

    with open(os.path.join(REF_EXAMPLES, "MultiOperationRequestHUC12.json")) as f:
        doc = json.load(f)
    # the reference wire shape passes VERBATIM: shapes are HUC objects
    # {"shape": geojson, "id": hucId} (WebServer.scala:32-35) and the
    # response map is keyed by those ids
    multi = multi_input_from_json(doc)
    multi.zoom = 13  # native 30 m frame, as above
    all_rasters = [r for op in multi.operations for r in op.rasters] + [
        op.target_raster for op in multi.operations if op.target_raster
    ]
    remap = _remap_rasters(all_rasters)
    for op in multi.operations:
        op.rasters = [remap[r] for r in op.rasters]
        if op.target_raster:
            op.target_raster = remap[op.target_raster]

    result = api.multi_request(spark, multi)
    json.dumps(result)
    assert set(result) == {s["id"] for s in doc["shapes"]} == {"huc12__55174"}
    # non-intersecting shapes emit {} per the reference contract
    assert all(v == {} for v in result.values())


def test_replay_legacy_summary_job_is_typed_400(spark, tables):
    """SummaryJob.json is the reference's PRE-1.0 schema (geometry /
    tileCRS / polyCRS / nlcdLayer — the retired /summary endpoint). The
    current wire schema has no operationType for it, so dispatch must
    answer with the typed InvalidOperationError, not a crash."""
    from mmw_geoprocessing_spark.errors import InvalidOperationError
    from mmw_geoprocessing_spark.http_server import input_data_from_json
    from mmw_geoprocessing_spark.plans import api

    with open(os.path.join(REF_EXAMPLES, "SummaryJob.json")) as f:
        doc = json.load(f)["input"]
    with pytest.raises(InvalidOperationError):
        api.run_request(spark, input_data_from_json(doc))


def test_recorded_response_grammar_matches_ours():
    """Every result key in the reference's RECORDED responses
    (MultiOperationResponse*.json) must parse under this engine's
    result-key grammar — 'List(v1[, v2, ...])' with integer values
    (functions/nodata.list_key) — and every op label must be one the
    suite knows. Values are environment data we cannot reproduce; the
    grammar and label surface are the wire contract."""
    import re

    from mmw_geoprocessing_spark.operators.mapshed import TEMPLATES

    key_re = re.compile(r"^List\(-?\d+(, -?\d+)*\)$")
    # the oldest recorded response spells one label 'nlcd_soils'; the
    # request schema (and every later recording) uses 'nlcd_soil'
    aliases = {"nlcd_soils": "nlcd_soil"}
    for fname in (
        "MultiOperationResponseHUC12.json",
        "MultiOperationResponseHUC12HiResStreams.json",
        "MultiOperationResponse.json",
    ):
        with open(os.path.join(REF_EXAMPLES, fname)) as f:
            doc = json.load(f)
        for huc, ops in doc.items():
            assert isinstance(ops, dict), huc
            for label, hist in ops.items():
                assert aliases.get(label, label) in TEMPLATES, (
                    f"unknown op label {label!r}"
                )
                assert isinstance(hist, dict)
                for key in hist:
                    assert key_re.match(key), f"{fname}:{huc}:{label}: {key!r}"


def test_unknown_vector_crs_is_typed_400(spark, tables):
    """A bogus vectorCRS must raise the typed UnknownCRSError taxonomy
    entry (Utils.scala:208-213), not leak a projection KeyError."""
    from mmw_geoprocessing_spark.errors import UnknownCRSError
    from mmw_geoprocessing_spark.http_server import input_data_from_json
    from mmw_geoprocessing_spark.plans import api

    with open(os.path.join(REF_EXAMPLES, "MapshedJob_NHD.json")) as f:
        doc = json.load(f)["input"]
    doc["vectorCRS"] = "MarsEquirectangular"
    inp = input_data_from_json(doc)
    inp.rasters = ["nlcd"]
    inp.zoom = 13
    with pytest.raises(UnknownCRSError):
        api.run_request(spark, inp)


def _replay_multi(spark, fname):
    from mmw_geoprocessing_spark.http_server import multi_input_from_json
    from mmw_geoprocessing_spark.plans import api

    with open(os.path.join(REF_EXAMPLES, fname)) as f:
        doc = json.load(f)
    multi = multi_input_from_json(doc)
    multi.zoom = 13  # native 30 m frame (see module docstring)
    all_rasters = [r for op in multi.operations for r in op.rasters] + [
        op.target_raster for op in multi.operations if op.target_raster
    ]
    remap = _remap_rasters(all_rasters)
    for op in multi.operations:
        op.rasters = [remap[r] for r in op.rasters]
        if op.target_raster:
            op.target_raster = remap[op.target_raster]
    result = api.multi_request(spark, multi)
    json.dumps(result)  # the wire response must serialize
    assert set(result) == {s["id"] for s in doc["shapes"]}
    # real Delaware-basin geometry never intersects the synthetic grid:
    # each HUC answers the documented empty contract, not an error
    assert all(v == {} for v in result.values())
    return doc, result


@pytest.mark.slow
def test_replay_61_huc_multi_operation_request(spark, tables):
    """The reference's flagship batch payload (r9 verdict #5):
    examples/MultiOperationRequest.json — 61 HUC-12 shapes x 10
    operations (RasterGroupedCount / RasterLinesJoin /
    RasterGroupedAverage incl. pixelIsArea variants) + a basin-wide
    streamLines network; the workload CHANGELOG.md:82-91 credits with
    'almost an order of magnitude' speedup from shared raster fetches.
    This engine answers it in ONE union plan over all 61 masks — the
    per-shape cost is the driver-side geometry (reproject + clip +
    rasterize), which is why the streamLines clip is numpy-vectorized.

    ~2-3 min wall at local[32]; kept unconditional because it is the
    single most representative reference request."""
    doc, result = _replay_multi(spark, "MultiOperationRequest.json")
    assert len(result) == 61
    # the full 3.2 MB payload parsed verbatim: 10 operations, every
    # label unique and echoed per shape only when non-empty
    assert len(doc["operations"]) == 10


@pytest.mark.parametrize(
    "fname",
    ["MultiOperationRequestHUC8.json", "MultiOperationRequestHUC12HiResStreams.json"],
)
def test_replay_single_huc_multi_requests(spark, tables, fname):
    """The HUC-8 (1.7 MB geometry) and HiRes-streams (dense streamLines)
    single-shape variants of the same wire shape."""
    doc, result = _replay_multi(spark, fname)
    assert len(result) == 1
