"""Measure the IVM claim directly: refreshing a MATERIALIZED rollup by
delta algebra vs recomputing it from the merged snapshot, same Spark
session, same inputs — the comparison that matters for the nightly
refresh job (DuckDB is not involved; this is Spark vs Spark).

The registered `cdc_incremental_rollup` derives base_rollup in-plan
(the fixture has no stored view), so registry timings can't show the
delta win. Here the rollup and base are pre-materialized parquet (the
deployment state), and we time:
  A) delta refresh: changelog⋈base old-value join + delta agg +
     union with the STORED rollup + re-agg      (O(|changelog|))
  B) full recompute: merge base⊕changelog, re-aggregate everything
     (O(|base|))

Usage: python tools/ivm_refresh_bench.py [sf_dir]
Prints one JSON line {sf_dir, rows, changelog_rows, delta_s, full_s,
speedup}. Results recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from mmw_geoprocessing_spark.operators import cdc
    from mmw_geoprocessing_spark.session import get_spark
    from mmw_geoprocessing_spark.sources.tables import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    spark = get_spark(app_name="ivm-bench")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "orders")
    work = tempfile.mkdtemp(prefix="ivm_bench_")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")

    # deployment state: base and its rollup are stored tables
    base_path = os.path.join(work, "base")
    rollup_path = os.path.join(work, "rollup")
    base.write.parquet(base_path)
    (
        base.groupBy("o_orderdate")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents"))
        .write.parquet(rollup_path)
    )
    stored_base = spark.read.parquet(base_path)
    stored_rollup = spark.read.parquet(rollup_path)
    n_base = stored_base.count()

    # churn levels: the registered synthetic changelog touches ~33% of
    # keys (an adversarial bulk backfill); a realistic daily feed is
    # well under 1%. IVM's win is churn-dependent — measure both.
    full_changelog = cdc.synth_changelog(stored_base)
    churn_filters = {
        "bulk_33pct": None,
        "daily_0.4pct": F.abs(F.col("o_orderkey")) % 233 == 3,
    }

    def timed(fn, runs=3):
        fn()  # warm-up
        ts = []
        for _ in range(runs):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return min(ts)

    from pyspark.sql import Window

    def delta_refresh(changelog):
        w = Window.partitionBy("o_orderkey").orderBy(
            F.col("seq").desc(), F.col("op").asc()
        )
        winner = (
            changelog.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_orderkey", "op", "o_orderdate", "o_totalprice")
        )
        old = stored_base.select(
            "o_orderkey",
            F.col("o_orderdate").alias("old_date"),
            F.col("o_totalprice").alias("old_price"),
        )
        d = winner.join(old, "o_orderkey", "left")
        negate = d.filter(F.col("old_date").isNotNull()).select(
            F.col("old_date").alias("o_orderdate"),
            F.lit(-1).cast("bigint").alias("n"),
            (-F.round(F.col("old_price") * 100).cast("bigint")).alias("cents"),
        )
        add = d.filter(F.col("op") != "D").select(
            "o_orderdate",
            F.lit(1).cast("bigint").alias("n"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        (
            stored_rollup.unionByName(negate)
            .unionByName(add)
            .groupBy("o_orderdate")
            .agg(F.sum("n").alias("n_orders"), F.sum("cents").alias("revenue_cents"))
            .filter(F.col("n_orders") > 0)
            .toPandas()
        )

    def full_recompute(changelog):
        merged = cdc.changelog_merge(stored_base, changelog)
        (
            merged.groupBy("o_orderdate")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(cents).alias("revenue_cents"),
            )
            .toPandas()
        )

    def before_image_refresh(bi_path):
        # the Debezium contract: the feed delivers (before, after) per
        # change, so the refresh NEVER reads base — O(|changelog|) pure
        bi = spark.read.parquet(bi_path)
        negate = bi.filter(F.col("old_date").isNotNull()).select(
            F.col("old_date").alias("o_orderdate"),
            F.lit(-1).cast("bigint").alias("n"),
            (-F.round(F.col("old_price") * 100).cast("bigint")).alias("cents"),
        )
        add = bi.filter(F.col("op") != "D").select(
            "o_orderdate",
            F.lit(1).cast("bigint").alias("n"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        (
            stored_rollup.unionByName(negate)
            .unionByName(add)
            .groupBy("o_orderdate")
            .agg(F.sum("n").alias("n_orders"), F.sum("cents").alias("revenue_cents"))
            .filter(F.col("n_orders") > 0)
            .toPandas()
        )

    for label, flt in churn_filters.items():
        changelog = full_changelog if flt is None else full_changelog.filter(flt)
        n_change = changelog.count()
        delta_s = timed(lambda: delta_refresh(changelog))
        full_s = timed(lambda: full_recompute(changelog))
        # before-image feed for the same changes, materialized like a
        # real CDC topic would deliver it (built OUTSIDE the timed path)
        w = Window.partitionBy("o_orderkey").orderBy(
            F.col("seq").desc(), F.col("op").asc()
        )
        winner = (
            changelog.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_orderkey", "op", "o_orderdate", "o_totalprice")
        )
        bi_path = os.path.join(work, f"bi_{label}")
        (
            winner.join(
                stored_base.select(
                    "o_orderkey",
                    F.col("o_orderdate").alias("old_date"),
                    F.col("o_totalprice").alias("old_price"),
                ),
                "o_orderkey",
                "left",
            ).write.mode("overwrite").parquet(bi_path)
        )
        bi_s = timed(lambda: before_image_refresh(bi_path))
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "churn": label,
                    "base_rows": n_base,
                    "changelog_rows": n_change,
                    "delta_refresh_s": round(delta_s, 3),
                    "before_image_refresh_s": round(bi_s, 3),
                    "full_recompute_s": round(full_s, 3),
                    "speedup_delta": round(full_s / delta_s, 2) if delta_s else None,
                    "speedup_before_image": round(full_s / bi_s, 2) if bi_s else None,
                }
            )
        )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
