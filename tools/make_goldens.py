"""(Re)generate tests/golden/*.json — frozen result snapshots at
sf0.001, the engine's analogue of the reference's 434 checked-in golden
JSONs (scripts/benchmark-mapshed:146, SURVEY.md §5).

Run deliberately (results are then frozen in git and diffed at 1e-8 by
tests/test_golden.py); never run from tests. The snapshot format is
``{"columns": [...], "rows": [[...], ...]}`` with rows sorted by their
JSON encoding — the same canonical order the test re-applies.

Usage: python tools/make_goldens.py [name ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)
SF_DIR = "/root/testdata/sf0.001"

# one per operator family: zonal suite, relational, window, dedup,
# similarity, text, multimodal, event-time streaming
NAMES = [
    "raster_grouped_count",
    "raster_grouped_count_many",
    "raster_grouped_average",
    "raster_grouped_sum",
    "raster_lines_join",
    "raster_summary",
    "multi_operation",
    "pricing_summary",
    "dedup_minhash_lsh",
    "similarity_cosine_topk",
    "text_quality_scores",
    "multimodal_frame_sample",
    "events_windows_showcase",
]


def _coerce(v):
    if isinstance(v, bytes):
        return {"__hex__": v.hex()}
    if hasattr(v, "isoformat"):
        return {"__ts__": v.isoformat()}
    return v


def main() -> None:
    import __spark_entry__ as entrymod
    from mmw_geoprocessing_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="make-goldens")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in NAMES:
        if only and name not in only:
            continue
        df = qs[name](spark, SF_DIR)
        cols = df.columns
        rows = [[_coerce(r[c]) for c in cols] for r in df.collect()]
        rows.sort(key=lambda row: json.dumps(row, default=str))
        path = os.path.join(GOLDEN_DIR, f"{name}_sf0.001.json")
        with open(path, "w") as f:
            json.dump({"columns": cols, "rows": rows}, f)
        print(f"{path}: {len(rows)} rows x {len(cols)} cols")
    spark.stop()


if __name__ == "__main__":
    main()
