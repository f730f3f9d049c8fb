"""Golden-file regression tests — the reference's own test strategy
(SURVEY.md §5: 434 checked-in golden JSONs verified with a 1e-8 double
tolerance, scripts/benchmark-mapshed:146). Our analogue pins the full
7-template MapShed/Subbasin suite at sf0.001 against a checked-in
snapshot, independent of the DuckDB oracle path — a second, frozen
line of defense against semantic drift."""

from __future__ import annotations

import json
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "mapshed_sf0.001.json")
TOL = 1e-8  # the reference's dictdiffer tolerance


def test_mapshed_suite_matches_golden(spark, tables):
    import __spark_entry__ as m

    rows = m.queries()["mapshed_suite"](spark, "/root/testdata/sf0.001").collect()
    got = sorted([r["op_label"], r["aoi_id"], r["list_key"], r["value"]] for r in rows)
    with open(GOLDEN) as f:
        want = json.load(f)
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g[:3] == w[:3], (g, w)
        assert abs(g[3] - w[3]) <= TOL, (g, w)
