"""Tokenizer-fidelity subword token counting (r11 verdict #7).

Every token-budgeted operator in this repo (corpus_mix, nucleus_topp,
pack_token_batches, the decontaminated mixes) weighs documents by
WHITESPACE tokens — the stand-in a real pretraining pipeline replaces
with its tokenizer's subword counts, because budgets, batch packing
and mixture ratios are all denominated in model tokens. This module
supplies that fidelity with a BPE-style subword tokenizer expressed
Spark-first:

- TRAIN: the vocabulary is the top-``VOCAB_K`` character pieces per
  length (4, 3, 2) by overlapping occurrence count across the corpus's
  words, deterministic tie-break (count desc, piece asc). This is the
  frequency-merge idea of BPE collapsed to one rank pass so BOTH
  engines can replay it exactly — iterative merge rounds are
  sequential by construction and would make the oracle a simulation
  instead of a query. One corpus scan + one bounded-key aggregation.
- ENCODE: greedy longest-match segmentation per word (the WordPiece
  serving rule): from the current position try piece lengths 4, 3, 2
  against the BROADCAST vocabulary (a literal IN-list inside one
  parsed SQL expression — the ``_cell_scores`` lesson from
  operators/similarity.py), else consume one character. Implemented as
  a JVM-side ``aggregate`` fold over character positions inside
  ``transform`` over words — whole-stage codegen, zero shuffle, no
  Python in the loop. The walk state is ``(cursor, count)``; a
  position only advances the fold when it equals the cursor, so the
  data-dependent jumps of greedy matching become a pure left fold.

Scale shape at 100 TB: training shuffles on the piece key (distinct
pieces are bounded by the alphabet, not the corpus) and collects
3 x VOCAB_K rows driver-side (the ``_centroids`` bounded-boundary
class); encoding is a single scan with the vocabulary folded into the
expression — no join, no shuffle, Arrow-free. The DuckDB twin retrains
the identical vocabulary in CTEs and walks the same greedy rule via a
per-position bestlen array (three hash LEFT JOINs + one list_reduce) —
join-based rather than literal-based because DuckDB 1.0 mis-binds
correlated columns inside depth-2 lambdas (observed: the FIRST outer
element loses the capture; everything here stays depth-1).

Reference parity note: the reference has no tokenizer (it counts
pixels, Geoprocessing.scala:226); this family belongs to the
training-data-pipeline surface the engine adds beyond SURVEY §2.
"""

from __future__ import annotations

import threading
from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: piece lengths tried longest-first by the greedy matcher
PIECE_LENS = (4, 3, 2)
#: vocabulary size per piece length (3 x 32 = 96 pieces total)
VOCAB_K = 32

# (session id, corpus semantic hash) -> trained vocab; the same bounded
# memo discipline as similarity._CENTROID_CACHE
_VOCAB_CACHE: OrderedDict[tuple, dict[int, list[str]]] = OrderedDict()
_VOCAB_CACHE_MAX = 8
_VOCAB_CACHE_LOCK = threading.Lock()


def clear_vocab_cache() -> None:
    with _VOCAB_CACHE_LOCK:
        _VOCAB_CACHE.clear()


def train_subword_vocab(
    documents: DataFrame, k: int = VOCAB_K
) -> dict[int, list[str]]:
    """Top-``k`` pieces per length by overlapping occurrence count over
    every word instance (natural frequency weighting — common words
    vote more, exactly like BPE merge counting). Deterministic:
    (count desc, piece asc). Returns {piece_len: sorted pieces};
    3 x k rows cross the driver boundary, nothing else."""
    try:
        key = (
            documents.sparkSession.sparkContext.applicationId,
            documents._jdf.queryExecution().analyzed().semanticHash(),
            k,
        )
    except Exception:
        key = None
    if key is not None:
        with _VOCAB_CACHE_LOCK:
            hit = _VOCAB_CACHE.get(key)
            if hit is not None:
                _VOCAB_CACHE.move_to_end(key)
                return hit
    words = documents.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
    vocab: dict[int, list[str]] = {}
    for ln in PIECE_LENS:
        top = (
            words.filter(F.length("w") >= ln)
            .select(
                F.explode(
                    F.expr(
                        f"transform(sequence(1, length(w) - {ln - 1}), "
                        f"i -> substring(w, i, {ln}))"
                    )
                ).alias("piece")
            )
            .groupBy("piece")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "piece")
            .limit(k)
            .collect()
        )
        vocab[ln] = sorted(r["piece"] for r in top)
    if key is not None:
        with _VOCAB_CACHE_LOCK:
            while len(_VOCAB_CACHE) >= _VOCAB_CACHE_MAX:
                _VOCAB_CACHE.popitem(last=False)
            _VOCAB_CACHE[key] = vocab
    return vocab


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _bestlen_case(vocab: dict[int, list[str]], w: str = "w", pos: str = "acc.p") -> str:
    """Longest vocab piece starting at ``pos`` (1 if none) as one
    parsed CASE over literal IN-lists — codegen-resident, no join."""
    branches = []
    for ln in PIECE_LENS:
        pieces = vocab.get(ln) or []
        if pieces:
            lits = ", ".join(_sql_str(p) for p in pieces)
            branches.append(f"WHEN substring({w}, {pos}, {ln}) IN ({lits}) THEN {ln}")
    if not branches:
        return "1"
    return "CASE " + " ".join(branches) + " ELSE 1 END"


def word_token_count_expr(vocab: dict[int, list[str]], w: str = "w") -> str:
    """SQL expression: greedy longest-match token count of one word
    (a lambda variable ``w``). The fold advances a cursor through the
    character positions; ``IF(i = acc.p, …)`` makes each position a
    no-op unless the cursor is on it."""
    best = _bestlen_case(vocab, w=w)
    return (
        f"CASE WHEN length({w}) < 1 THEN CAST(0 AS BIGINT) ELSE aggregate("
        f"sequence(1, length({w})), named_struct('p', 1, 'c', 0), "
        f"(acc, i) -> IF(i = acc.p, "
        f"named_struct('p', acc.p + {best}, 'c', acc.c + 1), acc), "
        f"acc -> CAST(acc.c AS BIGINT)) END"
    )


def doc_token_count_expr(vocab: dict[int, list[str]], text_col: str = "text") -> str:
    """SQL expression: subword token count of a document — the
    per-word greedy fold summed across ``split(text, ' ')``."""
    wt = word_token_count_expr(vocab)
    return (
        f"aggregate(transform(split({text_col}, ' '), w -> {wt}), "
        f"CAST(0 AS BIGINT), (a, x) -> a + x)"
    )


def bpe_token_counts(documents: DataFrame) -> DataFrame:
    """Per-source tokenizer-fidelity accounting: document counts,
    whitespace-token totals (the stand-in) and subword-token totals
    (the model-denominated number budgets should use). Output:
    ``(source, n_docs, ws_tokens, bpe_tokens)``."""
    vocab = train_subword_vocab(documents)
    return (
        documents.select(
            "source",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("ws"),
            F.expr(doc_token_count_expr(vocab)).alias("bpe"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
        )
    )


def _vocab_ctes(k: int = VOCAB_K) -> str:
    """The training CTEs: words, per-length piece counts, top-k piece
    tables — identical rank rule to ``train_subword_vocab``."""
    parts = [
        "words_all AS (SELECT source, doc_id,"
        " unnest(string_split(text, ' ')) AS w FROM documents)"
    ]
    for ln in PIECE_LENS:
        parts.append(
            f"pc{ln} AS (SELECT piece, COUNT(*) AS cnt FROM ("
            f"SELECT unnest(list_transform("
            f"range(1, greatest(length(w) - {ln - 1}, 0) + 1), "
            f"i -> substr(w, i, {ln}))) AS piece FROM words_all) GROUP BY piece)"
        )
        parts.append(
            f"v{ln} AS (SELECT piece FROM pc{ln} "
            f"QUALIFY row_number() OVER (ORDER BY cnt DESC, piece) <= {k})"
        )
    return ",\n    ".join(parts)


def _wtok_ctes() -> str:
    """Encoding CTEs over DISTINCT words (token count is a pure
    function of the word; DuckDB encodes each once and joins back —
    the Spark side inlines the fold per instance instead, zero
    shuffle): per-position bestlen via three hash LEFT JOINs, then the
    greedy cursor walk as a RECURSIVE CTE — lambda-free on purpose.
    A list_reduce walk was correct on small filtered inputs but
    returned wrong counts for a subset of rows on full scans (DuckDB
    1.0 lambda vectorization, the same bug family as the depth-2
    capture loss in the module docstring); the recursive join walk is
    deterministic and bounded by max word length."""
    return """
    dw AS (SELECT DISTINCT w FROM words_all WHERE length(w) >= 1),
    pos AS (SELECT w, unnest(range(1, length(w) + 1)) AS p FROM dw),
    m AS (
      SELECT pos.w, pos.p,
        CASE WHEN v4.piece IS NOT NULL THEN 4
             WHEN v3.piece IS NOT NULL THEN 3
             WHEN v2.piece IS NOT NULL THEN 2
             ELSE 1 END AS bl
      FROM pos
      LEFT JOIN v4 ON substr(pos.w, pos.p, 4) = v4.piece
      LEFT JOIN v3 ON substr(pos.w, pos.p, 3) = v3.piece
      LEFT JOIN v2 ON substr(pos.w, pos.p, 2) = v2.piece
    ),
    walk AS (
      SELECT w, 1 AS p, 0 AS c FROM dw
      UNION ALL
      SELECT walk.w, walk.p + m.bl, walk.c + 1
      FROM walk JOIN m ON m.w = walk.w AND m.p = walk.p
    ),
    wtok AS (SELECT w, c AS t FROM walk WHERE p > length(w))"""


def bpe_token_counts_sql(k: int = VOCAB_K) -> str:
    return f"""
    WITH RECURSIVE {_vocab_ctes(k)},
    {_wtok_ctes()},
    inst AS (
      SELECT wa.source, COALESCE(wt.t, 0) AS t
      FROM words_all wa LEFT JOIN wtok wt ON wa.w = wt.w
    ),
    bpe AS (SELECT source, CAST(SUM(t) AS BIGINT) AS bpe_tokens
            FROM inst GROUP BY source)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS ws_tokens,
           ANY_VALUE(b.bpe_tokens) AS bpe_tokens
    FROM documents d JOIN bpe b ON d.source = b.source
    GROUP BY d.source
    """


def corpus_mix_bpe(
    documents: DataFrame,
    budgets: dict[str, int] | None = None,
    default_budget: int = 2000,
    n_buckets: int = 32,
) -> DataFrame:
    """``corpus_mix`` with its budgets denominated in SUBWORD tokens —
    the fidelity upgrade the whitespace stand-in was standing in for:
    per-source budgets fill with model-token counts, so the mixture
    ratios mean what the training run will actually see. Same
    decomposed two-phase prefix sum, same take-order; only the weight
    column changes (computed inline by the codegen fold — the scan
    stays single-pass, zero extra shuffle)."""
    from mmw_geoprocessing_spark.operators.sampling import corpus_mix

    vocab = train_subword_vocab(documents)
    return corpus_mix(
        documents,
        budgets=budgets,
        default_budget=default_budget,
        n_buckets=n_buckets,
        tokens_col=F.expr(doc_token_count_expr(vocab)),
    )


def corpus_mix_bpe_sql(
    budgets: dict[str, int] | None = None,
    default_budget: int = 2000,
    n_buckets: int = 32,
    k: int = VOCAB_K,
) -> str:
    """DuckDB twin: retrain the vocab, per-doc subword counts via the
    distinct-word encode + instance join, then the one-window mix over
    the same deterministic take-order."""
    from mmw_geoprocessing_spark.functions.text import H28_SQL
    from mmw_geoprocessing_spark.operators.sampling import _budget_case

    budgets = budgets or {}
    # qualified: base joins documents d with doctok dt, so bare doc_id
    # is ambiguous in that scope
    hb = H28_SQL.format(x="CAST(d.doc_id AS VARCHAR)")
    ho = H28_SQL.format(
        x="CAST(d.source AS VARCHAR) || '|' || CAST(d.doc_id AS VARCHAR)"
    )
    return f"""
    WITH RECURSIVE {_vocab_ctes(k)},
    {_wtok_ctes()},
    doctok AS (
      SELECT wa.doc_id, CAST(SUM(COALESCE(wt.t, 0)) AS BIGINT) AS n_tokens
      FROM words_all wa LEFT JOIN wtok wt ON wa.w = wt.w
      GROUP BY wa.doc_id
    ),
    base AS (
      SELECT d.doc_id,
             d.source,
             dt.n_tokens,
             CAST(({hb}) % {n_buckets} AS INT) AS bucket,
             ({ho}) AS ord
      FROM documents d JOIN doctok dt ON d.doc_id = dt.doc_id
    ),
    cum AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source
                    ORDER BY bucket, ord, doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM base
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM cum
    WHERE cum_tokens <= ({_budget_case(budgets, default_budget, 'source')})
    """
