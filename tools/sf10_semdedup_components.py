"""sf10 (100x replica) gate for semantic_dedup_components.

Like lib_semantic_dedup_pairs, the registered fixed-16-cell config is
outside its documented envelope at this SF (~12.5k vectors/cell ->
~1.2B within-cell pairs), so the at-scale verdict uses the
scale-appropriate quantizer (SCALE.md: k ~ N/1e3 -> n_cells=256, ~780
vectors/cell — the identical config the round-8
``lib_semantic_dedup_pairs_scaled`` row measured). Spark runs the
iterative pointer-jumping closure; the oracle recomputes the pair set
in DuckDB and derives exact min-labels via python union-find (the
recursive-CTE closure is the sub-sf1 oracle; at this SF its reach
table is sum(|component|^2) rows — >75 GB spill, measured). Records:

- ``semantic_dedup_components_scaled``: full hash-matched verdict.
- ``semantic_dedup_components``: skipped-with-reason row for the
  registered 16-cell config, citing the (existing) SELFCHECK_SF1 row
  and the scaled row here.

Usage: python tools/sf10_semdedup_components.py [sf_dir] [out.json]
Env: SF10_DUCK_MEM (default 70GB), SF10_DUCK_THREADS (default 4).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from selfcheck import _hash  # noqa: E402

N_CELLS_SCALED = 256


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10_parts/semdedup_components.json"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    from mmw_geoprocessing_spark.operators import similarity as sim
    from mmw_geoprocessing_spark.session import get_spark
    from mmw_geoprocessing_spark.sources.tables import TABLE_NAMES, load_table

    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    emb = load_table(spark, sf_dir, "embeddings")
    spdf = sim.semantic_dedup_components(
        emb, n_cells=N_CELLS_SCALED, max_iters=30
    ).toPandas()
    spark_secs = time.time() - t0

    shutil.rmtree("/tmp/duck_spill", ignore_errors=True)
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('SF10_DUCK_MEM', '70GB')}'")
    con.execute(f"SET threads={int(os.environ.get('SF10_DUCK_THREADS', '4'))}")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    # Oracle: DuckDB recomputes the PAIR SET independently (the
    # engine-vs-engine check that matters), then an exact union-find in
    # plain Python derives the expected min-label components. The
    # recursive-CTE closure used at smaller SFs materializes reach =
    # sum(|component|^2) rows — measured >75 GB of spill at this SF
    # before being killed — while union-find over the same 510k edges
    # is linear; same math, same labels.
    t0 = time.time()
    pairs = con.execute(
        sim.semantic_dedup_pairs_sql(n_cells=N_CELLS_SCALED)
    ).df()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for v1, v2 in zip(pairs["v1"].astype(int), pairs["v2"].astype(int)):
        for v in (v1, v2):
            if v not in parent:
                parent[v] = v
        a, b = find(v1), find(v2)
        if a != b:
            # union by min id so the root IS the min label
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
    import pandas as pd

    odf = pd.DataFrame(
        {"vec_id": list(parent), "component": [find(v) for v in parent]}
    )
    oracle_secs = time.time() - t0
    con.close()
    shutil.rmtree("/tmp/duck_spill", ignore_errors=True)

    rows_match = len(spdf) == len(odf)
    schema_match = sorted(spdf.columns) == sorted(odf.columns)
    hash_match = rows_match and schema_match and _hash(spdf) == _hash(odf)
    print(
        f"{'OK  ' if hash_match else 'FAIL'}  semantic_dedup_components_scaled: "
        f"spark {len(spdf)} ({spark_secs:.1f}s) / duck {len(odf)} "
        f"({oracle_secs:.1f}s)",
        flush=True,
    )

    artifact = {
        "sf_dir": sf_dir,
        "note": (
            "sf10 semantic_dedup_components at the scale-appropriate "
            f"quantizer (n_cells={N_CELLS_SCALED}, SCALE.md k ~ N/1e3)"
        ),
        "n_queries": 2,
        "n_failures": int(not hash_match),
        "queries": {
            "semantic_dedup_components_scaled": {
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "spark_rows": len(spdf),
                "oracle_rows": len(odf),
                "n_cells": N_CELLS_SCALED,
                "spark_secs": round(spark_secs, 1),
                "oracle_secs": round(oracle_secs, 1),
                "method": (
                    "scaled-quantizer variant of semantic_dedup_components: "
                    "Spark pointer-jumping closure vs DuckDB-recomputed pair "
                    "set + exact python union-find labels (the recursive-CTE "
                    "closure materializes sum(|comp|^2) reach rows — >75 GB "
                    "spill at this SF, measured; union-find is linear)"
                ),
            },
            "semantic_dedup_components": {
                "skipped": True,
                "reason": (
                    "registered 16-cell config outside the documented "
                    "cell-population envelope at this SF (same analysis as "
                    "lib_semantic_dedup_pairs: ~12.5k vectors/cell -> ~1.2B "
                    "within-cell pairs). At-scale verdicts: the sf1~ row "
                    "(SELFCHECK_SF1.json, hash-matched) and the "
                    "semantic_dedup_components_scaled row in this artifact "
                    "(n_cells=256 per SCALE.md)."
                ),
            },
        },
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}")
    return 0 if hash_match else 1


if __name__ == "__main__":
    sys.exit(main())
