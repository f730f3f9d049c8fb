"""Measure the per-run cost of the durable-index rows' idempotent
re-entry (the ``append_once`` no-op path + re-attach) vs the pure
serving probe.

The bench's timed runs for ``search_bm25_index_append``,
``search_bm25_index_compact``, ``dedup_incremental_append`` and
``similarity_ann_ivf_append`` rebuild the full lifecycle plan every run:
the appends no-op on their markers, but the no-op path refreshes the
attached table (drops the cached file listing), so every timed run
pays catalog re-resolution + re-listing it does not need. This probe
times N repetitions of each registered builder + noop-sink execution
(guide §1.4) so the overhead is visible in isolation.

Usage: python tools/append_noop_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_BUCKETED_FIXTURES", "1")

QUERIES = [
    "search_bm25_disk_topk",
    "search_bm25_index_append",
    "search_bm25_index_compact",
    "dedup_incremental_disk",
    "dedup_incremental_append",
    "similarity_ann_ivf_disk_topk",
    "similarity_ann_ivf_append",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import __spark_entry__ as entrymod
    from mmw_geoprocessing_spark.session import get_spark

    spark = get_spark(app_name="append_noop_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))

    qs = entrymod.queries(prepared=False)
    for name in QUERIES:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        build = time.time() - t0
        series = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"probe:{name}:{i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            series.append(round(time.time() - t0, 4))
        print(f"{name}: build={build:.3f} runs={series}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
