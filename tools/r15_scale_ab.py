"""r15 verdict #1: measure the five r14 rewrites at the sf1~ (10x)
replica, OLD (r13) shape vs NEW (HEAD) shape, interleaved in ONE
process so co-tenant bursts hit both variants symmetrically.

The r14 round proved these rewrites' at-scale superiority from plan
shape only (everything is floor-bound at sf0.1); this script measures
it. OLD shapes are loaded from git (`git show <pre-opt-commit>:<path>`)
and exec'd as side modules, so both variants run against the same
session, same replica, same fixture layout:

- mapshed_suite        10-branch union  -> fused single-pass
- raster_summary       N-branch union   -> one-pass 3N-stat aggregate
- raster_grouped_count broadcast mask   -> zero-exchange merge SMJ
- search_hybrid_rrf    full-outer fuse  -> co-partitioned union fuse
                       (NOTE: the r14 change also moved the sparse leg
                       to the session postings index — this A/B times
                       the registered entries as shipped, old basis vs
                       new basis, disclosed in OPTIMIZATION_r15.md)
- cdc_merge_into /     generic 4-scan join forms -> row-local folds
  cdc_incremental_rollup

Protocol: warm-up both variants (index/fixture builds land there),
then REPS interleaved (new, old) noop-sink runs of FRESH plans;
DuckDB twin of the same oracle SQL afterwards for the vs-oracle ratio
row (BASELINE.md). Engine-default config at the replica (AQE ON) —
size-appropriate config per scale is the point of the crossover table.

Usage: python tools/r15_scale_ab.py [case ...]   (default: all)
Env: R15_AB_REPS (default 5), R15_AB_DUCK_RUNS (default 3),
     R15_AB_SF_DIR (default the crossover sf1~ replica, built if absent)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

#: the inherited pre-optimization r14 HEAD — the last commit carrying
#: the r13 plan shapes for mapshed/zonal/search/cdc
PRE_OPT_COMMIT = "5175624"

REPS = int(os.environ.get("R15_AB_REPS", "5"))
DUCK_RUNS = int(os.environ.get("R15_AB_DUCK_RUNS", "3"))


def _old_module(path: str, name: str, rewrite: dict[str, str] | None = None):
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{PRE_OPT_COMMIT}:{path}"],
        capture_output=True, text=True, check=True,
    ).stdout
    for a, b in (rewrite or {}).items():
        assert a in src, f"rewrite anchor missing in {path}: {a}"
        src = src.replace(a, b)
    mod = types.ModuleType(name)
    mod.__dict__["__name__"] = name
    sys.modules[name] = mod
    exec(compile(src, f"<{PRE_OPT_COMMIT}:{path}>", "exec"), mod.__dict__)
    return mod


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_BUCKETED_FIXTURES", "1")
    import crossover

    sf_dir = os.environ.get("R15_AB_SF_DIR", crossover.DST)
    if sf_dir == crossover.DST:
        crossover.build_replica()
    elif sf_dir == crossover.DST10:
        crossover.build_replica(crossover.DST10, crossover.COPIES10)

    import __spark_entry__ as entrymod
    from mmw_geoprocessing_spark.session import get_spark
    from mmw_geoprocessing_spark.sources import fixtures as fx
    from mmw_geoprocessing_spark.sources.tables import load_tables

    spark = get_spark(app_name="r15_scale_ab")
    spark.sparkContext.setLogLevel("ERROR")
    # engine defaults at replica scale (AQE ON) — no sf0.1 micro-tuning

    zonal_r13 = _old_module(
        "mmw_geoprocessing_spark/operators/zonal.py", "r13_zonal"
    )
    mapshed_r13 = _old_module(
        "mmw_geoprocessing_spark/operators/mapshed.py", "r13_mapshed",
        rewrite={
            "from mmw_geoprocessing_spark.operators.zonal import PIXEL_KEY, join_layers":
            "from r13_zonal import PIXEL_KEY, join_layers",
        },
    )
    search_r13 = _old_module(
        "mmw_geoprocessing_spark/operators/search.py", "r13_search"
    )
    cdc_r13 = _old_module(
        "mmw_geoprocessing_spark/operators/cdc.py", "r13_cdc"
    )

    qs = entrymod.queries(prepared=False)

    def _prep():
        entrymod._prep(spark, sf_dir)

    def t(name):
        return load_tables(spark, sf_dir)[name]

    cases: dict[str, tuple] = {
        # name: (old_builder, new_builder, oracle_name_or_None)
        "mapshed_suite": (
            lambda: (_prep(), mapshed_r13.mapshed_suite(spark))[1],
            lambda: qs["mapshed_suite"](spark, sf_dir),
            "mapshed_suite",
        ),
        "raster_summary": (
            lambda: (_prep(), zonal_r13.raster_summary(
                [fx.raster_df(spark, r) for r in ("slope", "awc", "kfactor")],
                fx.mask_df(spark, "huc8_01"),
            ))[1],
            lambda: qs["raster_summary"](spark, sf_dir),
            "raster_summary",
        ),
        "raster_grouped_count": (
            lambda: (_prep(), zonal_r13.raster_grouped_count(
                [fx.raster_df(spark, r) for r in ("nlcd", "soil")],
                fx.mask_df(spark, "huc8_01"),
            ))[1],
            lambda: qs["raster_grouped_count"](spark, sf_dir),
            "raster_grouped_count",
        ),
        "search_hybrid_rrf_topk": (
            lambda: search_r13.hybrid_rrf_topk(
                spark, t("documents"), t("embeddings")
            ),
            lambda: qs["search_hybrid_rrf_topk"](spark, sf_dir),
            "search_hybrid_rrf_topk",
        ),
        "cdc_merge_into": (
            lambda: cdc_r13.merge_into_orders(t("orders")),
            lambda: qs["cdc_merge_into"](spark, sf_dir),
            "cdc_merge_into",
        ),
        "cdc_incremental_rollup": (
            lambda: cdc_r13.incremental_rollup_orders(t("orders")),
            lambda: qs["cdc_incremental_rollup"](spark, sf_dir),
            "cdc_incremental_rollup",
        ),
        # r15 verdict #8 (preagg adjudication, sf10 tier): "old" = the
        # raw 3-way-join query, "new" = the revenue-MV serving path the
        # r14 build added to answer the r13 weak grading of q3/q10 —
        # both Spark, same result rows; the DuckDB twin recomputes the
        # full join every run (the serving-path-only basis, disclosed
        # in bench.py).
        "tpch_q3_preagg": (
            lambda: qs["tpch_q3"](spark, sf_dir),
            lambda: qs["tpch_q3_preagg"](spark, sf_dir),
            "tpch_q3_preagg",
        ),
        "tpch_q10_preagg": (
            lambda: qs["tpch_q10"](spark, sf_dir),
            lambda: qs["tpch_q10_preagg"](spark, sf_dir),
            "tpch_q10_preagg",
        ),
    }
    wanted = sys.argv[1:] or list(cases)

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    results = {}
    for name in wanted:
        old_b, new_b, oracle = cases[name]
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        run(new_b())
        run(old_b())
        olds, news = [], []
        for rep in range(REPS):
            spark.sparkContext.setJobDescription(f"{name}: new rep{rep}")
            t0 = time.time(); run(new_b()); news.append(time.time() - t0)
            spark.sparkContext.setJobDescription(f"{name}: old rep{rep}")
            t0 = time.time(); run(old_b()); olds.append(time.time() - t0)
        # value identity of the two shapes at this scale
        a = sorted(map(tuple, old_b().collect()))
        b = sorted(map(tuple, new_b().collect()))
        equal = a == b
        duck = None
        if oracle is not None and DUCK_RUNS > 0:
            import duckdb

            from mmw_geoprocessing_spark.sources.tables import TABLE_NAMES

            con = duckdb.connect()
            con.execute(f"SET threads={int(os.environ.get('BENCH_DUCK_THREADS', '16'))}")
            for tn in TABLE_NAMES:
                con.execute(
                    f"CREATE VIEW {tn} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{tn}.parquet')"
                )
            sql = entrymod.oracle_sql()[oracle]
            con.execute(sql).df()
            ds = []
            for _ in range(DUCK_RUNS):
                t0 = time.time(); con.execute(sql).df(); ds.append(time.time() - t0)
            con.close()
            duck = ds

        def med(xs):
            s = sorted(xs); n = len(s)
            return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

        row = {
            "case": name,
            "sf_dir": sf_dir,
            "old_median_s": round(med(olds), 3),
            "new_median_s": round(med(news), 3),
            "old_min_s": round(min(olds), 3),
            "new_min_s": round(min(news), 3),
            "speedup_median": round(med(olds) / med(news), 2),
            "old_series": [round(x, 3) for x in olds],
            "new_series": [round(x, 3) for x in news],
            "results_equal": equal,
            "duck_series": [round(x, 3) for x in duck] if duck else None,
            "new_vs_duck_min": (
                round(min(news) / min(duck), 3) if duck else None
            ),
        }
        results[f"{name}@{os.path.basename(sf_dir.rstrip('/'))}"] = row
        print(json.dumps(row), flush=True)
    out = os.path.join(REPO, "plans", "r15", "scale_ab_results.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing.update(results)
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
