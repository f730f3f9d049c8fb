"""(Re)generate tests/golden/*.json — frozen result snapshots at
sf0.001, the engine's analogue of the reference's 434 checked-in golden
JSONs (scripts/benchmark-mapshed:146, SURVEY.md §5).

Round 5 widens the corpus from 14 to the full discipline:
- EVERY registry query (one frozen snapshot per `queries()` entry,
  50 files) — a second, oracle-independent line of defense;
- per-HUC-12 zonal goldens (8 subbasins x {nlcd_soil grouped count,
  nlcd_streams lines join}, 16 files) — the reference's per-HUC golden
  naming (`huc12_54842_nlcd_streams.json`,
  scripts/benchmark-subbasin:110-121).

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

# the reference's per-subbasin benchmark templates we pin per HUC-12
HUC12_AOIS = [f"huc12_0{k + 1}" for k in range(8)]
HUC12_TEMPLATES = ("nlcd_soil", "nlcd_streams")


def huc12_case(spark, aoi_id: str, template: str):
    """Build one per-HUC-12 zonal case (shared with tests/test_golden)."""
    from mmw_geoprocessing_spark.operators import zonal
    from mmw_geoprocessing_spark.sources import fixtures as fx
    from mmw_geoprocessing_spark.sources.tables import register_views

    register_views(spark, SF_DIR)
    mask = fx.mask_df(spark, aoi_id)
    if template == "nlcd_soil":
        layers = [fx.raster_df(spark, "nlcd"), fx.raster_df(spark, "soil")]
        return zonal.raster_grouped_count(layers, mask)
    if template == "nlcd_streams":
        return zonal.raster_lines_join(
            [fx.raster_df(spark, "nlcd")], fx.line_pixels_df(spark), mask
        )
    raise ValueError(template)


def huc12_names() -> list[str]:
    return [f"{aoi}_{tpl}" for aoi in HUC12_AOIS for tpl in HUC12_TEMPLATES]


def _coerce(v):
    if isinstance(v, bytes):
        return {"__hex__": v.hex()}
    if hasattr(v, "isoformat"):
        return {"__ts__": v.isoformat()}
    return v


def snapshot(name: str, df) -> str:
    cols = df.columns
    rows = [[_coerce(r[c]) for c in cols] for r in df.collect()]
    rows.sort(key=lambda row: json.dumps(row, default=str))
    path = os.path.join(GOLDEN_DIR, f"{name}_sf0.001.json")
    with open(path, "w") as f:
        json.dump({"columns": cols, "rows": rows}, f)
    print(f"{path}: {len(rows)} rows x {len(cols)} cols")
    return path


def main() -> None:
    import __spark_entry__ as entrymod
    from mmw_geoprocessing_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="make-goldens")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in sorted(qs):
        if only and name not in only:
            continue
        snapshot(name, qs[name](spark, SF_DIR))
    for aoi in HUC12_AOIS:
        for tpl in HUC12_TEMPLATES:
            name = f"{aoi}_{tpl}"
            if only and name not in only:
                continue
            snapshot(name, huc12_case(spark, aoi, tpl))
    spark.stop()


if __name__ == "__main__":
    main()
