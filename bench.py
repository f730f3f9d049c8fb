"""Benchmark harness — reference protocol (5 runs per case, mean of
wall-clock seconds; reference scripts/benchmark-sync:38-49) over the
engine's headline queries at $SPARK_GRAFT_SF_DIR.

Timing model: each timed run builds a FRESH DataFrame (raw
``queries(prepared=False)`` builders) and executes it end-to-end —
py4j plan construction, Catalyst analysis/optimization, scan, shuffle,
aggregate, Arrow collect. That is this engine's per-request serving
shape (the HTTP layer builds a plan per request, like the reference's
Akka service). A warm-up call first pays one-time costs that a live
session amortizes (codegen compile cache, fixture materialization,
bucketed-table write), recorded per query as ``queries_build``.

Re-timing a MEMOIZED handle is deliberately NOT the headline: Spark
keeps a prepared handle's shuffle map outputs alive (ShuffleExchangeExec
caches its ShuffledRowRDD, so re-execution skips every map stage —
scan and partial agg included). That steady-state number is real for
repeated identical requests and is reported separately as
``queries_prepared_exec``, but it measures final-stage + collect, not
query execution. DuckDB gets the mirror of the headline: same process,
same window, warmed once, full oracle SQL re-executed per run.

Prints ONE JSON line:
  {"metric": "...", "value": <total mean sec>, "unit": "sec",
   "queries": {name: mean_sec, ...}, "sf": ...,
   "queries_min": floors, "queries_build": one-time prepare cost,
   "duck_queries"/"duck_total"/"ratio_vs_duck": same-window baseline,
   "prev_delta": {name: {mean, min} - prior BENCH_r*.json}}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # zonal surface (the reference's workload shapes)
    "raster_grouped_count",
    "raster_grouped_count_many",
    "raster_grouped_average",
    "raster_lines_join",
    "raster_summary",
    "multi_operation",
    "mapshed_suite",
    # relational surface
    "pricing_summary",
    "top_customers_by_revenue",
    "window_running_total",
    # LLM pipeline
    "dedup_minhash_lsh",
    "similarity_cosine_topk",
    # event-time windows
    "events_windows_showcase",
]

RUNS = int(os.environ.get("BENCH_RUNS", "5"))


def main() -> None:
    # Production fixture layout: pixel tables bucketed on the pixel key
    # -> exchange-free layer joins (fixtures._bucketed_fixture; the
    # one-time write happens during warm-up). Halves the zonal query
    # times at sf0.1. Set here (not at import) so merely importing this
    # module never flips the mode for a host process.
    os.environ.setdefault("SPARK_GRAFT_BUCKETED_FIXTURES", "1")

    import __spark_entry__ as entrymod
    from mmw_geoprocessing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Small-SF tuning (measured at sf0.1, see SCALE.md "AQE crossover"):
    # AQE inserts a materialization barrier + re-plan round per shuffle
    # stage (~50-150 ms each), which DOMINATES sub-second stages — total
    # dropped 13.4 s -> 7.6 s with AQE off on this workload. On a real
    # cluster with multi-minute stages the trade inverts (skew splitting,
    # runtime coalescing) and the engine default (session.py) keeps AQE
    # ON; the bench overrides it because the input size is known-small.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))

    qs = entrymod.queries(prepared=False)
    results: dict[str, float] = {}
    floors: dict[str, float] = {}
    builds: dict[str, float] = {}
    prepared_exec: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        # materialize via Arrow (toPandas): the engine's result fast
        # path, symmetric with DuckDB's native .df()/fetchall — row
        # collect() pays a py4j per-row tax that is transport, not
        # query execution (window_running_total: 0.72 s -> 0.28 s)
        t0 = time.time()
        handle = fn(spark, sf_dir)
        handle.toPandas()  # warm-up: codegen compile + fixture materialization
        builds[name] = round(time.time() - t0, 4)
        times = []
        for _ in range(RUNS):
            t0 = time.time()
            fn(spark, sf_dir).toPandas()  # fresh plan: full build + execute
            times.append(time.time() - t0)
        results[name] = round(sum(times) / len(times), 4)
        floors[name] = round(min(times), 4)
        # informational: steady-state re-execution of the warmed handle
        # (prepared-statement serving; upstream shuffle stages reused)
        pe = []
        for _ in range(2):
            t0 = time.time()
            handle.toPandas()
            pe.append(time.time() - t0)
        prepared_exec[name] = round(min(pe), 4)

    total = round(sum(results.values()), 4)

    # Same-window DuckDB baseline on the identical oracle SQL: this box
    # carries +-2x co-tenant noise bursts, so a Spark total measured in
    # a loud window vs a DuckDB total measured in a quiet one is not a
    # comparison. Running both engines back-to-back in one process makes
    # the ratio noise-symmetric.
    duck_results: dict[str, float] = {}
    try:
        import duckdb

        from mmw_geoprocessing_spark.sources.tables import TABLE_NAMES

        oracles = entrymod.oracle_sql()
        con = duckdb.connect()
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in HEADLINE:
            sql = oracles[name]
            con.execute(sql).df()  # warm-up
            times = []
            for _ in range(RUNS):
                t0 = time.time()
                con.execute(sql).df()
                times.append(time.time() - t0)
            duck_results[name] = round(sum(times) / len(times), 4)
        con.close()
    except Exception:
        duck_results = {}

    duck_total = round(sum(duck_results.values()), 4) if duck_results else None

    # Regression hygiene: per-query mean/min deltas vs the most recent
    # recorded round, so burst-hit rows are self-diagnosing (a mean that
    # regressed while its min held = co-tenant noise, not a plan change).
    prev_delta: dict[str, dict[str, float]] = {}
    try:
        import glob

        prior = sorted(glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
        if prior:
            with open(prior[-1]) as f:
                prev = json.load(f).get("parsed", {})
            for name in HEADLINE:
                if name in prev.get("queries", {}):
                    prev_delta[name] = {
                        "mean": round(results[name] - prev["queries"][name], 4),
                        "min": round(
                            floors[name] - prev.get("queries_min", {}).get(name, floors[name]), 4
                        ),
                    }
    except Exception:
        prev_delta = {}

    print(
        json.dumps(
            {
                "metric": "headline_queries_mean_total",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
                "runs": RUNS,
                # noise floor: this box shows +-2x co-tenant bursts; the
                # per-query MIN is the reproducible cost (mean stays the
                # headline per the reference's 5-run protocol)
                "value_min": round(sum(floors.values()), 4),
                "queries_min": floors,
                # one-time warm-up cost per query (codegen compile +
                # fixture materialization + first execution)
                "queries_build": builds,
                # steady-state re-execution of a memoized handle
                # (prepared-statement serving path; shuffle map stages
                # reused) — informational, NOT the headline
                "queries_prepared_exec": prepared_exec,
                "prev_delta": prev_delta,
                # same-window DuckDB oracle baseline + noise-symmetric ratio
                "duck_total": duck_total,
                "duck_queries": duck_results,
                "ratio_vs_duck": round(total / duck_total, 3) if duck_total else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
