"""Property-based tests (hypothesis) for the round-10 curation / CDC /
skew operators: invariants on randomized inputs the oracle fixtures
never generate (adversarial changelogs, colliding quality keys, hot-key
extremes), each checked against an independent Python reference."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import cdc
from mmw_geoprocessing_spark.operators import curation as cu


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


@settings(max_examples=10, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # source id
            st.integers(min_value=0, max_value=5),  # n_chars (collisions!)
        ),
        min_size=1,
        max_size=24,
    ),
    cap=st.integers(min_value=1, max_value=4),
)
def test_rate_cap_matches_python_reference(spark, data, cap):
    rows = [
        (i, f"t{i}", "en", f"s{srcid}", n) for i, (srcid, n) in enumerate(data)
    ]
    got = {
        (r["doc_id"], r["domain_rank"])
        for r in cu.domain_rate_cap(_docs(spark, rows), cap=cap).collect()
    }
    # independent reference: python sort per source
    by_src: dict = {}
    for i, (srcid, n) in enumerate(data):
        by_src.setdefault(f"s{srcid}", []).append((-n, i))
    want = set()
    for src, items in by_src.items():
        for rank, (_, i) in enumerate(sorted(items), start=1):
            if rank <= cap:
                want.add((i, rank))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=30
    )
)
def test_bloom_never_false_negative_on_random_texts(spark, texts):
    """For ANY corpus: a doc whose md5 is in the reference slice's
    digest set must be maybe_present (Bloom's one hard guarantee)."""
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    docs = _docs(spark, rows)
    out = {r["doc_id"]: r["maybe_present"] for r in cu.bloom_probe_dedup(docs).collect()}
    ref_digests = {
        hashlib.md5(t.encode()).hexdigest()
        for i, t in enumerate(texts)
        if i % cu.REF_MOD < cu.REF_KEEP
    }
    for i, t in enumerate(texts):
        if hashlib.md5(t.encode()).hexdigest() in ref_digests:
            assert out[i], f"false negative for doc {i}"


_OPS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # key
        st.integers(min_value=1, max_value=5),  # seq
        st.sampled_from(["U", "D"]),
        st.integers(min_value=0, max_value=99),  # new price
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(ops=_OPS)
def test_scd2_and_merge_agree_on_random_changelogs(spark, ops):
    """For ANY changelog: SCD2's current slice == the type-1 merge, and
    per key the version chain covers base..final without gaps."""
    base_rows = [(k, 1, "O", float(10 + k), "1996-01-01", "P") for k in range(5)]
    base = spark.createDataFrame(
        base_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    # dedup (key, seq) — ties would make latest-wins order-dependent
    seen = set()
    ch_rows = []
    for k, seq, op, price in ops:
        if (k, seq) in seen:
            continue
        seen.add((k, seq))
        ch_rows.append((k, seq, op, 1, "O", float(price), "1996-01-01", "P"))
    ch = spark.createDataFrame(
        ch_rows or [(-(10 ** 6), 1, "U", 1, "O", 0.0, "1996-01-01", "P")],
        "o_orderkey long, seq long, op string, o_custkey long, "
        "o_orderstatus string, o_totalprice double, o_orderdate string, "
        "o_orderpriority string",
    ).filter("o_orderkey >= 0" if ch_rows else "o_orderkey < 0")

    hist = cdc.scd2_history(base, ch).collect()
    merged = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in cdc.changelog_merge(base, ch).collect()
    }
    current = {
        r["o_orderkey"]: r["o_totalprice"] for r in hist if r["is_current"]
    }
    assert current == merged
    # version chains: per key, ranges must be contiguous (valid_to of
    # one version == version of the next)
    by_key: dict = {}
    for r in hist:
        by_key.setdefault(r["o_orderkey"], []).append(r)
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r["version"])
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] is not None and a["valid_to"] <= b["version"]
        assert sum(1 for r in rows if r["is_current"]) <= 1


@settings(max_examples=10, deadline=None)
@given(ops=_OPS)
def test_ivm_rollup_equals_full_recompute_on_random_changelogs(spark, ops):
    base_rows = [(k, 1, "O", float(10 + k), f"1996-01-0{1 + k % 3}", "P") for k in range(5)]
    base = spark.createDataFrame(
        base_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    seen = set()
    ch_rows = []
    for k, seq, op, price in ops:
        if (k, seq) in seen:
            continue
        seen.add((k, seq))
        ch_rows.append((k, seq, op, 1, "O", float(price), f"1996-01-0{1 + k % 3}", "P"))
    ch = spark.createDataFrame(
        ch_rows or [(-(10 ** 6), 1, "U", 1, "O", 0.0, "1996-01-01", "P")],
        "o_orderkey long, seq long, op string, o_custkey long, "
        "o_orderstatus string, o_totalprice double, o_orderdate string, "
        "o_orderpriority string",
    ).filter("o_orderkey >= 0" if ch_rows else "o_orderkey < 0")

    ivm = {
        (r["o_orderdate"]): (r["n_orders"], r["revenue_cents"])
        for r in cdc.incremental_rollup(base, ch).collect()
    }
    full = {}
    for r in cdc.changelog_merge(base, ch).collect():
        n, c = full.get(r["o_orderdate"], (0, 0))
        full[r["o_orderdate"]] = (n + 1, c + round(r["o_totalprice"] * 100))
    assert ivm == full
