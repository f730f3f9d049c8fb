"""End-to-end HTTP wire-layer tests (reference WebServer.scala:64-111):
/ping, /run, /multi, the 400 taxonomy, the 50 MB body limit and the
request timeout — all over a real socket against a live SparkSession."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from mmw_geoprocessing_spark.http_server import GeoprocessingServer
from mmw_geoprocessing_spark.plans import api
from mmw_geoprocessing_spark.plans.model import InputData


@pytest.fixture(scope="module")
def server(spark, tables):
    srv = GeoprocessingServer(spark, port=0).start()
    yield srv
    srv.stop()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}") as r:
        return r.status, json.loads(r.read())


def _post(srv, path, doc):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(doc).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_ping(server):
    status, body = _get(server, "/ping")
    assert status == 200 and body == "pong"


def test_run_grouped_count_matches_direct_call(server, spark):
    doc = {
        "operationType": "RasterGroupedCount",
        "rasters": ["nlcd", "soil"],
        "aoiIds": ["huc8_01"],
    }
    status, body = _post(server, "/run", doc)
    assert status == 200
    direct = api.run_request(
        spark,
        InputData(
            operation_type="RasterGroupedCount",
            rasters=["nlcd", "soil"],
            aoi_ids=["huc8_01"],
        ),
    )
    assert body == direct
    assert all(k.startswith("List(") for k in body)


def test_multi_endpoint(server, spark):
    doc = {
        "shapes": ["huc12_01", "huc12_02"],
        "operations": [
            {"name": "RasterGroupedCount", "label": "nlcd", "rasters": ["nlcd"]},
            {
                "name": "RasterGroupedAverage",
                "label": "avg_slope",
                "rasters": [],
                "targetRaster": "slope",
            },
        ],
    }
    status, body = _post(server, "/multi", doc)
    assert status == 200
    assert set(body) == {"huc12_01", "huc12_02"}
    assert set(body["huc12_01"]) == {"nlcd", "avg_slope"}
    assert body["huc12_02"]["avg_slope"]["List(0)"] > 0


def test_invalid_operation_400(server):
    status, body = _post(server, "/run", {"operationType": "Nope"})
    assert status == 400 and body["error"] == "InvalidOperationError"


def test_missing_vector_400(server):
    status, body = _post(
        server, "/run", {"operationType": "RasterGroupedCount", "rasters": ["nlcd"]}
    )
    assert status == 400 and body["error"] == "MissingVectorError"


def test_missing_crs_400(server):
    status, body = _post(
        server,
        "/run",
        {
            "operationType": "RasterGroupedCount",
            "rasters": ["nlcd"],
            "polygon": ['{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,0]]]}'],
        },
    )
    assert status == 400 and body["error"] == "MissingVectorCRSError"


def test_unknown_path_404(server):
    status, body = _post(server, "/nope", {})
    assert status == 404


def test_malformed_json_400(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/run", data=b"{not json", method="POST"
    )
    try:
        with urllib.request.urlopen(req) as r:
            status = r.status
    except urllib.error.HTTPError as e:
        status, body = e.code, json.loads(e.read())
    assert status == 400 and body["error"] == "MalformedJSON"


def test_body_limit_413(spark, tables):
    srv = GeoprocessingServer(spark, port=0, max_body_bytes=64).start()
    try:
        status, body = _post(srv, "/run", {"operationType": "x" * 200})
        assert status == 413 and body["error"] == "PayloadTooLarge"
    finally:
        srv.stop()


def test_request_timeout_503(spark, tables):
    srv = GeoprocessingServer(spark, port=0, request_timeout_sec=1e-4).start()
    try:
        status, body = _post(
            srv,
            "/run",
            {
                "operationType": "RasterGroupedCount",
                "rasters": ["nlcd"],
                "aoiIds": ["huc8_01"],
            },
        )
        assert status == 503 and body["error"] == "RequestTimeout"
    finally:
        srv.stop()


def test_concurrent_requests(server):
    """The threaded server + worker pool must serve parallel requests
    (Spark accepts concurrent job submission from multiple threads)."""
    from concurrent.futures import ThreadPoolExecutor

    doc = {
        "operationType": "RasterGroupedCount",
        "rasters": ["nlcd"],
        "aoiIds": ["huc12_01"],
    }
    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(lambda _: _post(server, "/run", doc), range(4)))
    assert all(status == 200 for status, _ in results)
    bodies = [b for _, b in results]
    assert all(b == bodies[0] for b in bodies)


def test_multi_wire_huc_objects_unwrap():
    """Reference /multi wire shapes are HUC objects {id, shape}
    (WebServer.scala:32-35): the parser must unwrap the GeoJSON string
    and keep the id for response keying; bare-string shapes (engine
    extension) pass through with no ids."""
    from mmw_geoprocessing_spark.http_server import multi_input_from_json

    geo = '{"type": "MultiPolygon", "coordinates": []}'
    m = multi_input_from_json(
        {"shapes": [{"id": "huc12__55174", "shape": geo}, {"shape": geo}],
         "operations": []}
    )
    assert m.shapes == [geo, geo]
    assert m.shape_ids == ["huc12__55174", None]

    m2 = multi_input_from_json({"shapes": ["huc12_01", "huc12_02"], "operations": []})
    assert m2.shapes == ["huc12_01", "huc12_02"]
    assert m2.shape_ids is None


def test_concurrent_mixed_requests_isolated(server):
    """The reference is an Akka server built for OVERLAPPING requests
    (WebServer.scala:64-111; the 120 s timeout exists because they
    overlap). Drive 16 simultaneous /run + /multi requests spanning 8
    DISTINCT request documents (different ops, rasters, AOIs, and both
    endpoints) and assert every response equals its serially-computed
    expectation — no cross-request bleed through the fixture/plan
    caches, no job-group interference."""
    from concurrent.futures import ThreadPoolExecutor

    cases = [
        ("/run", {"operationType": "RasterGroupedCount", "rasters": ["nlcd"],
                  "aoiIds": ["huc12_01"]}),
        ("/run", {"operationType": "RasterGroupedCount", "rasters": ["nlcd", "soil"],
                  "aoiIds": ["huc12_02"]}),
        ("/run", {"operationType": "RasterGroupedAverage", "rasters": ["nlcd"],
                  "targetRaster": "slope", "aoiIds": ["huc12_01"]}),
        ("/run", {"operationType": "RasterGroupedSum", "rasters": ["nlcd"],
                  "targetRaster": "slope", "aoiIds": ["huc12_03"]}),
        ("/run", {"operationType": "RasterSummary", "rasters": ["slope"],
                  "aoiIds": ["huc12_02"]}),
        ("/run", {"operationType": "RasterLinesJoin", "rasters": ["nlcd"],
                  "aoiIds": ["huc12_01"], "useLinePixels": True}),
        ("/multi", {"shapes": ["huc12_01", "huc12_02"], "operations": [
            {"name": "RasterGroupedCount", "label": "lc", "rasters": ["nlcd"]}]}),
        ("/multi", {"shapes": ["huc12_03"], "operations": [
            {"name": "RasterGroupedCount", "label": "lc", "rasters": ["soil"]},
            {"name": "RasterGroupedAverage", "label": "avg_slope",
             "rasters": [], "targetRaster": "slope"}]}),
    ]
    expected = []
    for path, doc in cases:
        status, body = _post(server, path, doc)
        assert status == 200, body
        expected.append(body)

    jobs = [(path, doc, want) for (path, doc), want in zip(cases, expected)] * 2
    with ThreadPoolExecutor(max_workers=16) as pool:
        results = list(pool.map(lambda j: _post(server, j[0], j[1]), jobs))
    for (path, doc, want), (status, body) in zip(jobs, results):
        assert status == 200, (path, doc, body)
        assert body == want, f"cross-request bleed on {path} {doc}"


def test_malformed_zoom_400(server):
    """Shape-coercion failures during request parsing are 400s (the
    reference's malformed-request taxonomy), not worker-side 500s."""
    status, body = _post(
        server,
        "/run",
        {"operationType": "RasterGroupedCount", "rasters": ["nlcd"],
         "aoiIds": ["huc12_01"], "zoom": "abc"},
    )
    assert status == 400 and body["error"] == "MalformedRequest"

    status, body = _post(server, "/multi", {"shapes": ["huc12_01"], "operations": [17]})
    assert status == 400 and body["error"] == "MalformedRequest"


def test_timeout_cancels_job_group_and_frees_worker(spark, tables):
    """After a timeout the Spark jobs behind the request are cancelled
    (job group), so the pool worker frees and the server keeps serving —
    a burst of slow requests must not 503 the server forever."""
    import time

    srv = GeoprocessingServer(spark, port=0, request_timeout_sec=0.02).start()
    try:
        doc = {"operationType": "RasterGroupedCount", "rasters": ["nlcd", "soil"],
               "aoiIds": ["huc8_01"]}
        for _ in range(3):
            status, body = _post(srv, "/run", doc)
            assert status == 503 and body["error"] == "RequestTimeout"
        # workers must be free again shortly after: a fast request on a
        # generous-timeout server sharing the SAME session still works
        time.sleep(1.0)
    finally:
        srv.stop()
    srv2 = GeoprocessingServer(spark, port=0).start()
    try:
        status, _ = _get(srv2, "/ping")
        assert status == 200
        status, body = _post(
            srv2, "/run",
            {"operationType": "RasterGroupedCount", "rasters": ["nlcd"],
             "aoiIds": ["huc12_01"]},
        )
        assert status == 200 and body
    finally:
        srv2.stop()
