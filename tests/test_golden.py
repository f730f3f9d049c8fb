"""Golden-file regression tests — the reference's own test strategy
(SURVEY.md §5: 434 checked-in golden JSONs verified with a 1e-8 double
tolerance, scripts/benchmark-mapshed:146). Our analogue pins the full
7-template MapShed/Subbasin suite at sf0.001 against a checked-in
snapshot, independent of the DuckDB oracle path — a second, frozen
line of defense against semantic drift."""

from __future__ import annotations

import json
import os

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
TOL = 1e-8  # the reference's dictdiffer tolerance


def _close(a, b):
    if isinstance(a, float) or isinstance(b, float):
        return a == b or abs(a - b) <= TOL
    return a == b


def test_mapshed_suite_matches_golden(spark, tables):
    import __spark_entry__ as m

    rows = m.queries()["mapshed_suite"](spark, "/root/testdata/sf0.001").collect()
    got = sorted([r["op_label"], r["aoi_id"], r["list_key"], r["value"]] for r in rows)
    with open(os.path.join(GOLDEN_DIR, "mapshed_sf0.001.json")) as f:
        want = json.load(f)
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g[:3] == w[:3], (g, w)
        assert abs(g[3] - w[3]) <= TOL, (g, w)


import pytest


@pytest.mark.parametrize("name", ["dedup_minhash_lsh", "events_windows_showcase"])
def test_query_matches_golden(spark, tables, name):
    """One golden per major capability family beyond zonal (dedup,
    streaming windows) — same frozen-snapshot strategy."""
    import __spark_entry__ as m

    rows = m.queries()[name](spark, "/root/testdata/sf0.001").collect()
    with open(os.path.join(GOLDEN_DIR, f"{name}_sf0.001.json")) as f:
        golden = json.load(f)
    cols = golden["columns"]
    got = sorted([r[c] for c in cols] for r in rows)
    want = golden["rows"]
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert all(_close(x, y) for x, y in zip(g, w)), (g, w)
