"""End-to-end corpus curation (operators/pipelines.py): the composed
featurize -> gate -> dedup -> near-dup prune -> split pipeline,
hash-checked against its DuckDB twin plus semantic properties."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import dedup as dd
from mmw_geoprocessing_spark.operators import pipelines as pl


def test_curate_corpus_matches_oracle(spark, tables, duck):
    out = pl.curate_corpus(tables["documents"]).toPandas()
    want = duck.execute(pl.curate_corpus_sql()).df()
    cols = ["doc_id", "n_words", "split"]
    a = out[cols].sort_values("doc_id").reset_index(drop=True)
    b = want[cols].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) > 0  # the gate keeps a real corpus, not an empty set


def test_curate_corpus_semantics(spark, tables):
    docs = tables["documents"]
    out = pl.curate_corpus(docs)
    kept = {r.doc_id for r in out.select("doc_id").collect()}

    # near-dup rule: no verified pair survives with BOTH sides kept —
    # d2 may be kept only when its d1 was itself gated/deduped away
    # (the "last representative" rule)
    pairs = dd.minhash_lsh_neardup(docs).select("d1", "d2").collect()
    assert not any(r.d1 in kept and r.d2 in kept for r in pairs)

    # exact-dup rule: kept docs have unique text digests, and each is
    # its digest group's minimum doc_id within the gated set
    digests = (
        docs.join(out.select("doc_id"), "doc_id", "left_semi")
        .select(F.md5("text").alias("m"), "doc_id")
    )
    n = digests.count()
    assert digests.select("m").distinct().count() == n

    # split labels are well-formed
    labels = {r.split for r in out.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"}


def test_curate_corpus_keeps_last_representative(spark):
    """A doc whose ONLY lower-id near-duplicate was itself removed by
    the language gate must survive: dropping it too would leave no
    representative of that content. Counter-case: when the lower-id
    side passes the gate, the higher-id near-dup is dropped as usual."""
    core_a = " ".join(f"wa{i}" for i in range(100))
    core_b = " ".join(f"wb{i}" for i in range(100))
    rows = [
        # doc 1: Spanish-guessed (es stopword tail) -> gated away
        (1, core_a + " el la de que y los"),
        # doc 2: near-dup of doc 1 (shared 100-word core), English tail
        (2, core_a + " the and of to in is a"),
        # doc 3: English, survives; doc 4: its higher-id near-dup
        (3, core_b + " the and of to in is a"),
        (4, core_b + " the and of in is to a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # the scenario's premise: both pairs ARE detected by the LSH path
    pairs = {
        (r.d1, r.d2) for r in dd.minhash_lsh_neardup(docs).select("d1", "d2").collect()
    }
    assert (1, 2) in pairs and (3, 4) in pairs

    kept = {r.doc_id for r in pl.curate_corpus(docs).select("doc_id").collect()}
    assert kept == {2, 3}

    # the SQL twin agrees on the same corpus (fresh connection: the
    # shared fixture already binds `documents` to the sf parquet)
    import duckdb

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = set(con.execute(pl.curate_corpus_sql()).df()["doc_id"])
    con.close()
    assert want == {2, 3}


def test_curate_corpus_is_one_declarative_plan(spark, tables):
    """The composition must stay lazy and join-structured: no cartesian
    product, no Python row UDF, and the near-dup side planned as a
    broadcast (it is orders of magnitude smaller than the corpus)."""
    out = pl.curate_corpus(tables["documents"])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# PII scan / redaction (text_analysis.pii_*) on documents with injected
# synthetic PII — one email / ipv4 / phone / ssn per doc, built with the
# same SQL on both engines.
# ---------------------------------------------------------------------------


def _injection_sql(cast_t: str) -> str:
    return (
        "SELECT doc_id, text || ' u' || CAST(doc_id AS {c}) || '@ex.org"
        " 10.0.0.' || CAST(doc_id % 255 AS {c}) ||"
        " ' 555-867-5309 123-45-6789' AS text FROM documents"
    ).format(c=cast_t)


def test_pii_counts_matches_oracle(spark, tables, duck):
    from mmw_geoprocessing_spark.operators import text_analysis as ta

    injected = spark.sql(_injection_sql("STRING"))
    out = ta.pii_counts(injected).toPandas().sort_values("doc_id").reset_index(drop=True)
    duck.execute(f"CREATE OR REPLACE VIEW pii_docs AS {_injection_sql('VARCHAR')}")
    want = (
        duck.execute(ta.pii_counts_sql("pii_docs")).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert (out[["n_email", "n_ssn", "n_phone", "n_ipv4"]] >= 1).all().all()


def test_pii_redact_matches_oracle_and_is_complete(spark, tables, duck):
    from mmw_geoprocessing_spark.operators import text_analysis as ta

    injected = spark.sql(_injection_sql("STRING"))
    red = ta.pii_redact(injected)
    out = red.toPandas().sort_values("doc_id").reset_index(drop=True)
    duck.execute(f"CREATE OR REPLACE VIEW pii_docs AS {_injection_sql('VARCHAR')}")
    want = (
        duck.execute(ta.pii_redact_sql("pii_docs")).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert (out["n_redactions"] >= 4).all()
    assert out["clean_text"].str.contains("<EMAIL>").all()

    # completeness: re-scanning the redacted text finds nothing
    rescanned = ta.pii_counts(
        red.select("doc_id", F.col("clean_text").alias("text"))
    ).toPandas()
    assert (rescanned[["n_email", "n_ssn", "n_phone", "n_ipv4"]] == 0).all().all()


# ---------------------------------------------------------------------------
# Near-dup connected components (dedup.neardup_components): iterative
# min-label propagation vs DuckDB's recursive-CTE closure.
# ---------------------------------------------------------------------------


def test_neardup_components_match_recursive_cte_oracle(spark, tables, duck):
    out = (
        dd.neardup_components(tables["documents"])
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        duck.execute(dd.neardup_components_sql()).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert len(out) > 0

    # invariants: the component label is a member and the component min
    comp = out.groupby("component")["doc_id"].agg(["min", "count"])
    assert (comp.index == comp["min"]).all()

    # every verified pair's endpoints share a component
    pairs = dd.minhash_lsh_neardup(tables["documents"]).select("d1", "d2").toPandas()
    lab = dict(zip(out["doc_id"], out["component"]))
    assert all(lab[a] == lab[b] for a, b in zip(pairs["d1"], pairs["d2"]))


def test_connected_components_chain_graph(spark):
    """Pointer jumping must collapse a long CHAIN (worst case for plain
    min-propagation: rounds = diameter) within the default max_iters —
    200 nodes, diameter 199, converges in O(log n) rounds. Oracle:
    every node's component is the chain head; a second disjoint clique
    keeps its own min."""
    chain = [(i, i + 1) for i in range(199)]         # 0-1-2-...-199
    clique = [(1000 + a, 1000 + b) for a in range(4) for b in range(a + 1, 4)]
    pairs = spark.createDataFrame(chain + clique, "d1 long, d2 long")
    out = dd.connected_components(pairs).toPandas()
    lab = dict(zip(out["doc_id"], out["component"]))
    assert all(lab[i] == 0 for i in range(200))
    assert all(lab[1000 + i] == 1000 for i in range(4))
    assert len(lab) == 204


def test_connected_components_nonconvergence_raises(spark):
    """max_iters too small for the graph must raise, never return
    silently wrong labels."""
    import pytest as pt

    chain = [(i, i + 1) for i in range(199)]
    pairs = spark.createDataFrame(chain, "d1 long, d2 long")
    with pt.raises(RuntimeError, match="did not converge"):
        dd.connected_components(pairs, max_iters=2)


def _html_injection_sql(cast_t: str) -> str:
    return (
        "SELECT doc_id, '<div class=\"x\">' || text || '</div> &amp;&nbsp;"
        "<br/>tail&#39;s &lt;tag&gt;' AS text FROM documents"
    )


def test_normalize_text_matches_oracle(spark, tables, duck):
    from mmw_geoprocessing_spark.operators import text_analysis as ta

    injected = spark.sql(_html_injection_sql("STRING"))
    out = (
        ta.normalize_text(injected).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    duck.execute(f"CREATE OR REPLACE VIEW html_docs AS {_html_injection_sql('VARCHAR')}")
    want = (
        duck.execute(ta.normalize_text_sql("html_docs")).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert (out["n_tags"] >= 3).all()
    # stripped: no tags survive; entities decoded AFTER tag removal stay text
    assert not out["clean_text"].str.contains("<div|<br|&amp|&nbsp|&#39").any()
    assert out["clean_text"].str.contains("<tag>").all()  # decoded entity is literal text
    assert not out["clean_text"].str.contains("  ").any()  # whitespace collapsed


def test_normalize_and_redact_are_idempotent(spark, tables):
    """Both normalization stages must be fixpoints: running them on
    their own output changes nothing (the property that makes re-running
    an ingest stage safe)."""
    from mmw_geoprocessing_spark.operators import text_analysis as ta

    injected = spark.sql(_injection_sql("STRING"))
    # markup + non-angle entities only: normalize IS a fixpoint here
    # (angle-bracket entities decode to literal <tag> text by design —
    # see the normalize_text docstring — so they are excluded)
    html = spark.sql(
        "SELECT doc_id, '<div>' || text || '</div> &amp;&nbsp;&quot;x&#39;'"
        " AS text FROM documents"
    )

    once = ta.normalize_text(html).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = ta.normalize_text(once)
    joined = once.join(
        twice.select("doc_id", F.col("clean_text").alias("t2")), "doc_id"
    )
    assert joined.filter(F.col("text") != F.col("t2")).count() == 0

    ronce = ta.pii_redact(injected).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    rtwice = ta.pii_redact(ronce)
    rj = ronce.join(
        rtwice.select("doc_id", F.col("clean_text").alias("t2"), "n_redactions"),
        "doc_id",
    )
    assert rj.filter(F.col("text") != F.col("t2")).count() == 0
    assert rj.filter(F.col("n_redactions") != 0).count() == 0


def test_ingest_stages_compose_into_curation(spark, tables):
    """The full ingest chain — normalize -> redact -> curate — composes
    as ONE lazy plan over documents with markup and PII injected; the
    curated output is non-empty, PII-free and markup-free."""
    from mmw_geoprocessing_spark.operators import text_analysis as ta

    dirty = spark.sql(
        "SELECT doc_id, '<p>' || text || '</p> contact u' ||"
        " CAST(doc_id AS STRING) || '@ex.org' AS text FROM documents"
    )
    normalized = ta.normalize_text(dirty).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    redacted = ta.pii_redact(normalized).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    curated = pl.curate_corpus(redacted)
    n = curated.count()
    assert n > 0

    kept_text = redacted.join(curated.select("doc_id"), "doc_id", "left_semi")
    bad = kept_text.filter(
        F.col("text").rlike("<p>|</p>|@ex\\.org")
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# benchmark-contamination detection (text_analysis.contamination_check)
# ---------------------------------------------------------------------------


def test_contamination_check_matches_oracle(spark, tables, duck):
    """13-gram benchmark-overlap scan: Spark's broadcast-join plan and
    the DuckDB twin agree row-for-row, benchmark members score ratio
    1.0, and docs shorter than n words report (0, 0, 0.0) rather than
    vanishing."""
    from mmw_geoprocessing_spark.operators import text_analysis as ta

    docs = tables["documents"]
    bench = docs.where("doc_id % 101 = 7")
    out = (
        ta.contamination_check(docs, bench, n=13)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duck.execute(ta.contamination_check_sql("doc_id % 101 = 7", 13))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert len(out) == docs.count()  # every doc gets a verdict
    bench_ids = {r["doc_id"] for r in bench.select("doc_id").collect()}
    scored = out.set_index("doc_id")
    assert all(scored.loc[i, "contamination_ratio"] == 1.0 for i in bench_ids)
    # at least the benchmark members themselves are flagged
    assert (out["hit_ngrams"] > 0).sum() >= len(bench_ids)


def test_contamination_check_short_docs_and_clean_benchmark(spark):
    from mmw_geoprocessing_spark.operators import text_analysis as ta

    docs = spark.createDataFrame(
        [(1, "too short"), (2, " ".join(f"w{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, "completely disjoint benchmark text")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in ta.contamination_check(docs, bench, n=13).collect()}
    assert (out[1]["doc_ngrams"], out[1]["hit_ngrams"], out[1]["contamination_ratio"]) == (0, 0, 0.0)
    assert out[2]["doc_ngrams"] == 8 and out[2]["hit_ngrams"] == 0


# ---------------------------------------------------------------------------
# cross-document duplicated spans (text_analysis.duplicate_spans)
# ---------------------------------------------------------------------------


def test_duplicate_spans_matches_oracle(spark, tables, duck):
    from mmw_geoprocessing_spark.operators import text_analysis as ta

    docs = tables["documents"]
    out = (
        ta.duplicate_spans(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duck.execute(ta.duplicate_spans_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert len(out) == docs.count()


def test_duplicate_spans_cross_doc_only(spark):
    """A span shared across two docs is flagged in BOTH; a span repeated
    only WITHIN one doc is not (cross-document semantics, unlike the
    Gopher repetition signals); short docs report (0, 0, 0.0)."""
    from mmw_geoprocessing_spark.operators import text_analysis as ta

    shared = " ".join(f"s{i}" for i in range(8))  # one exact 8-word span
    within = " ".join(f"r{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, shared + " " + " ".join(f"a{i}" for i in range(8))),
            (2, shared + " " + " ".join(f"b{i}" for i in range(8))),
            (3, within + " x " + within),  # repeats only inside doc 3
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ta.duplicate_spans(docs, n=8).collect()}
    assert out[1]["dup_spans"] == 1 and out[2]["dup_spans"] == 1
    assert out[3]["dup_spans"] == 0  # within-doc repeat is not cross-doc
    assert (out[4]["doc_spans"], out[4]["dup_spans"], out[4]["dup_ratio"]) == (0, 0, 0.0)
    assert out[1]["dup_ratio"] == 1.0 / out[1]["doc_spans"]


# ---------------------------------------------------------------------------
# hashed-feature classifier scoring (text_analysis.classifier_score)
# ---------------------------------------------------------------------------


def test_classifier_score_matches_oracle(spark, tables, duck):
    from mmw_geoprocessing_spark.operators import text_analysis as ta

    docs = tables["documents"]
    out = (
        ta.classifier_score(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        duck.execute(ta.classifier_score_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert len(out) == docs.count()


def test_classifier_score_is_linear_and_zero_shuffle(spark):
    """The score must be the sum of per-token bucket weights (linearity:
    score(a+b) = score(a) + score(b) over concatenation), and the plan a
    pure projection — zero shuffle exchanges."""
    from mmw_geoprocessing_spark.operators import text_analysis as ta

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ta.classifier_score(docs).collect()}
    assert (
        out[3]["clf_score_scaled"]
        == out[1]["clf_score_scaled"] + out[2]["clf_score_scaled"]
    )
    assert out[3]["n_tokens"] == 4
    plan = (
        ta.classifier_score(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# repeated-n-gram quality signals (text_analysis.repetition_scores)
# ---------------------------------------------------------------------------


def test_repetition_scores_matches_oracle(spark, tables, duck):
    """Gopher-style repetition signals: Spark's explode-and-aggregate
    plan and the DuckDB twin agree row-for-row; every doc gets a
    verdict."""
    from mmw_geoprocessing_spark.operators import text_analysis as ta

    docs = tables["documents"]
    out = (
        ta.repetition_scores(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duck.execute(ta.repetition_scores_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert len(out) == docs.count()
    assert ((out["top2_ratio"] >= 0) & (out["top2_ratio"] <= 1)).all()
    # dup fraction includes every occurrence of a repeated gram, so it
    # can never be smaller than the top-gram fraction when repeats exist
    rep = out[out["dup2_ratio"] > 0]
    assert (rep["dup2_ratio"] >= rep["top2_ratio"] - 1e-12).all()


def test_repetition_scores_known_values(spark):
    from mmw_geoprocessing_spark.operators import text_analysis as ta

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),        # 2-grams: ab ba ab ba ab -> top 3/5, dup 5/5
            (2, "x y z w"),            # all 2-grams distinct -> top 1/3, dup 0
            (3, "solo"),               # shorter than 2 words -> zeros
            (4, "A a a A"),            # lowercased: aa aa aa -> top 3/3
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ta.repetition_scores(docs).collect()}
    assert out[1]["top2_ratio"] == 3 / 5 and out[1]["dup2_ratio"] == 1.0
    assert out[2]["top2_ratio"] == 1 / 3 and out[2]["dup2_ratio"] == 0.0
    assert out[3]["top2_ratio"] == 0.0 and out[3]["dup3_ratio"] == 0.0
    assert out[4]["top2_ratio"] == 1.0
    # 3-grams of doc 1: "a b a" x2, "b a b" x2 -> top 2/4, dup 4/4
    assert out[1]["top3_ratio"] == 0.5 and out[1]["dup3_ratio"] == 1.0
