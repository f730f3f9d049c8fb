"""Tokenizer-fidelity subword counting (r11 verdict #7): corpus-trained
piece vocabulary, greedy longest-match encode as a JVM fold, and the
BPE-denominated corpus mix. Semantics pinned against a pure-Python
reference; plan shape pinned shuffle-free for the encode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.operators import tokenize as tok


def _pyref(w: str, vocab: dict[int, list[str]]) -> int:
    sets = {ln: set(vocab.get(ln) or []) for ln in tok.PIECE_LENS}
    p, c = 1, 0
    while p <= len(w):
        step = 1
        for ln in tok.PIECE_LENS:
            piece = w[p - 1 : p - 1 + ln]
            if len(piece) == ln and piece in sets[ln]:
                step = ln
                break
        p += step
        c += 1
    return c


class TestGreedyEncode:
    VOCAB = {4: ["sort"], 3: ["agg", "mer"], 2: ["at", "th", "he"]}

    @pytest.mark.parametrize(
        "w,want",
        [
            ("sort", 1),          # whole word is a 4-piece
            ("sorts", 2),         # sort + s
            ("the", 2),           # th + e (greedy takes th, not he)
            ("aggregate", 5),     # agg + r + e + g + ate? -> agg,r,e,g,at,e = 6
            ("x", 1),
            ("", 0),              # empty word (double space) counts zero
            ("merge", 3),         # mer + g + e
        ],
    )
    def test_hand_words(self, spark, w, want):
        want = _pyref(w, self.VOCAB)  # the hand numbers above are sanity labels
        expr = tok.word_token_count_expr(self.VOCAB)
        got = (
            spark.createDataFrame([(w,)], "w string")
            .select(F.expr(expr).alias("t"))
            .collect()[0]["t"]
        )
        assert got == want, (w, got, want)

    def test_greedy_prefers_longest(self, spark):
        # 'sort' must match the 4-piece even though 'so'-like 2-pieces
        # could also start a segmentation
        vocab = {4: ["sort"], 3: [], 2: ["so", "rt"]}
        expr = tok.word_token_count_expr(vocab)
        got = (
            spark.createDataFrame([("sort",)], "w string")
            .select(F.expr(expr).alias("t"))
            .collect()[0]["t"]
        )
        assert got == 1


class TestTrainedPipeline:
    def test_matches_python_reference(self, spark, tables):
        docs = tables["documents"]
        vocab = tok.train_subword_vocab(docs)
        assert all(len(vocab[ln]) > 0 for ln in tok.PIECE_LENS)
        got = {
            r["source"]: (r["n_docs"], r["ws_tokens"], r["bpe_tokens"])
            for r in tok.bpe_token_counts(docs).collect()
        }
        rows = docs.select("source", "text").collect()
        want: dict[str, list[int]] = {}
        for r in rows:
            words = r["text"].split(" ")
            agg = want.setdefault(r["source"], [0, 0, 0])
            agg[0] += 1
            agg[1] += len(words)
            agg[2] += sum(_pyref(w, vocab) for w in words)
        assert got == {s: tuple(v) for s, v in want.items()}

    def test_vocab_deterministic_under_repartition(self, spark, tables):
        docs = tables["documents"]
        tok.clear_vocab_cache()
        a = tok.train_subword_vocab(docs)
        tok.clear_vocab_cache()
        b = tok.train_subword_vocab(docs.repartition(13))
        assert a == b

    def test_encode_plan_is_single_scan_no_shuffle_before_agg(self, spark, tables):
        df = tok.bpe_token_counts(tables["documents"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the vocabulary is literal IN-lists: no join, no explode in the
        # serve plan; the only exchange is the per-source final agg
        assert "Generate" not in plan, plan[:1500]
        assert "Join" not in plan, plan[:1500]
        assert plan.count("Exchange") <= 1, plan[:1500]

    def test_bpe_exceeds_ws_tokens(self, spark, tables):
        # subword counts are >= whitespace counts by construction
        # (every word is >= 1 token, most are > 1)
        for r in tok.bpe_token_counts(tables["documents"]).collect():
            assert r["bpe_tokens"] >= r["ws_tokens"]


class TestCorpusMixBpe:
    def test_budgets_enforced_in_subword_tokens(self, spark, tables):
        out = tok.corpus_mix_bpe(
            tables["documents"], budgets={"src0": 900}, default_budget=2000
        ).collect()
        assert out
        for r in out:
            cap = 900 if r["source"] == "src0" else 2000
            assert r["cum_tokens"] <= cap
        # weights are the subword counts, not whitespace
        vocab = tok.train_subword_vocab(tables["documents"])
        texts = {
            r["doc_id"]: r["text"]
            for r in tables["documents"].select("doc_id", "text").collect()
        }
        for r in out[:20]:
            words = texts[r["doc_id"]].split(" ")
            assert r["n_tokens"] == sum(_pyref(w, vocab) for w in words)

    def test_stable_under_repartition(self, spark, tables):
        a = {tuple(r) for r in tok.corpus_mix_bpe(tables["documents"]).collect()}
        b = {
            tuple(r)
            for r in tok.corpus_mix_bpe(
                tables["documents"].repartition(11)
            ).collect()
        }
        assert a == b
