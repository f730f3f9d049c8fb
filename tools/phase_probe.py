"""Per-query phase attribution for the bench workload (guide §1).

For each requested query the probe times, over the SAME session and
fixture state the bench uses (bucketed fixtures, AQE off, 16 shuffle
partitions):

- build_s:   the Python builder call (py4j expression construction)
- plan_s:    Catalyst analysis + optimization + physical planning
             (forced via queryExecution().executedPlan())
- exec1_s:   first end-to-end execution through the noop sink
             (guide §1.4 — computes every column, discards the result)
- exec2_s:   a SECOND noop execution of a FRESH builder+plan (the
             bench's fresh-plan serving shape, steady-state)
- collect_s: fresh plan executed via toPandas() (what bench.py times)

Also writes ``plans/r14/<name>_<tag>.txt`` with explain("formatted")
when --plans <tag> is passed.

Usage: python tools/phase_probe.py [--plans TAG] [query ...]
With no query args, probes the full HEADLINE + LLM_SECTION list.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_BUCKETED_FIXTURES", "1")


def main() -> None:
    args = sys.argv[1:]
    plan_tag = None
    if args and args[0] == "--plans":
        plan_tag = args[1]
        args = args[2:]

    import bench
    import __spark_entry__ as entrymod
    from mmw_geoprocessing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="phase_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))

    qs = entrymod.queries(prepared=False)
    names = args or (bench.HEADLINE + bench.LLM_SECTION)

    out: dict[str, dict[str, float]] = {}
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        # warm-up: fixture materialization + codegen compile
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        t0 = time.time()
        df = fn(spark, sf_dir)
        build_s = time.time() - t0

        t0 = time.time()
        df._jdf.queryExecution().executedPlan()
        plan_s = time.time() - t0

        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        exec1_s = time.time() - t0

        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        exec2_s = time.time() - t0

        t0 = time.time()
        fn(spark, sf_dir).toPandas()
        collect_s = time.time() - t0

        out[name] = {
            "build_s": round(build_s, 4),
            "plan_s": round(plan_s, 4),
            "exec1_s": round(exec1_s, 4),
            "exec2_s": round(exec2_s, 4),
            "collect_s": round(collect_s, 4),
        }
        print(
            f"{name:40s} build={build_s:7.3f} plan={plan_s:7.3f} "
            f"exec1={exec1_s:7.3f} exec2={exec2_s:7.3f} collect={collect_s:7.3f}",
            flush=True,
        )
        if plan_tag:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{plan_tag}.txt"), "w") as f:
                f.write(buf.getvalue())

    path = os.environ.get("PHASE_PROBE_JSON", "/tmp/phase_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
