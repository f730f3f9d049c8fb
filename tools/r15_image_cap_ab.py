"""r15 verdict #5: A/B the inherited image hot-band cap's LOCAL cost.

`dedup_image_phash` was the one r13→r14 noise-fair bench regression
with a plausible code cause: the r14 build commit added a
per-(chunk_idx, chunk_value) candidate cap (`IMG_BAND_CAP`, a
row_number window before the banded self-join) that bounds the
constant-image hot-bucket blowup at crawl scale. At sf0.1 no bucket
exceeds the cap (truncation stats empty), so results are identical —
this script measures what the extra window costs locally, interleaved
capped/uncapped in ONE process over the same warm fingerprint index.

Usage: python tools/r15_image_cap_ab.py   (env: R15_AB_REPS, default 7)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPS = int(os.environ.get("R15_AB_REPS", "7"))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_BUCKETED_FIXTURES", "1")
    from pyspark.sql import DataFrame, Window
    from pyspark.sql import functions as F

    from mmw_geoprocessing_spark.operators import image_dedup as im
    from mmw_geoprocessing_spark.session import get_spark
    from mmw_geoprocessing_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r15_image_cap_ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))

    docs = load_table(spark, sf_dir, "documents")

    def uncapped_pairs(fp: DataFrame) -> DataFrame:
        """The pre-cap (r13) banded self-join — `_banded_pairs` minus
        the row_number cap window."""
        bands = im._chunk_bands(fp)
        a = bands.select(
            F.col("doc_id").alias("a_id"),
            *[F.col(f"d{i}").alias(f"x{i}") for i in range(4)],
            "ci", "cv",
        )
        b = bands.select(
            F.col("doc_id").alias("b_id"),
            *[F.col(f"d{i}").alias(f"y{i}") for i in range(4)],
            "ci", "cv",
        )
        ham = sum(
            F.bit_count(F.col(f"x{i}").bitwiseXOR(F.col(f"y{i}")))
            for i in range(4)
        )
        return (
            a.join(b, ["ci", "cv"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", ham.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= im.HAMMING_T)
            .dropDuplicates(["a_id", "b_id"])
        )

    def capped():
        return im.dedup_image_phash(docs)

    def uncapped():
        return uncapped_pairs(im.image_phash_fingerprints(docs))

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up: fingerprint index build (PlanCache) + codegen
    run(capped()); run(uncapped())
    # identity at this scale (no bucket exceeds the cap)
    eq = sorted(map(tuple, capped().collect())) == sorted(
        map(tuple, uncapped().collect())
    )
    caps, uncs = [], []
    for rep in range(REPS):
        spark.sparkContext.setJobDescription(f"capped rep{rep}")
        t0 = time.time(); run(capped()); caps.append(time.time() - t0)
        spark.sparkContext.setJobDescription(f"uncapped rep{rep}")
        t0 = time.time(); run(uncapped()); uncs.append(time.time() - t0)

    def med(xs):
        s = sorted(xs); n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    # plan shapes, for the adjudication
    pc = capped()._jdf.queryExecution().executedPlan().toString()
    pu = uncapped()._jdf.queryExecution().executedPlan().toString()
    row = {
        "results_equal": eq,
        "capped_median_s": round(med(caps), 3),
        "uncapped_median_s": round(med(uncs), 3),
        "capped_series": [round(x, 3) for x in caps],
        "uncapped_series": [round(x, 3) for x in uncs],
        "capped_plan": {
            "exchanges": pc.count("Exchange hashpartitioning"),
            "broadcasts": pc.count("BroadcastExchange"),
            "reused": pc.count("ReusedExchange"),
        },
        "uncapped_plan": {
            "exchanges": pu.count("Exchange hashpartitioning"),
            "broadcasts": pu.count("BroadcastExchange"),
            "reused": pu.count("ReusedExchange"),
        },
    }
    print(json.dumps(row, indent=1))
    with open(os.path.join(REPO, "plans", "r15", "image_cap_ab.json"), "w") as f:
        json.dump(row, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
