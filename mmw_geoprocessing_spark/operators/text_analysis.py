"""Text-analysis operators for training-data pipelines.

All computation stays JVM-side (built-in string/array/regexp functions,
higher-order array folds) — no Python UDFs in any hot path. Ratios are
single divisions of exact integers, so they hash identically across
engines without rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.functions.text import h60

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
}
LANG_ORDER = ["en", "es", "fr", "de"]  # deterministic argmax tiebreak


def _wordlist(col):
    return F.split(col, " ")


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace tokens + regex token classes (BPE-ish pre-tokenizer
    counts). Output: ``(doc_id, ws_tokens, alpha_tokens, num_tokens)``.
    """
    return documents.select(
        "doc_id",
        F.size(_wordlist(F.col("text"))).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+")).alias("alpha_tokens"),
        F.regexp_count(F.col("text"), F.lit("[0-9]+")).alias("num_tokens"),
    )


def token_counts_sql() -> str:
    return """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS alpha_tokens,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS num_tokens
    FROM documents
    """


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality features: length, lexical diversity, mean word
    length, stopword density — the standard pre-filter stack for web
    corpora. Output: ``(doc_id, n_words, n_distinct, distinct_ratio,
    avg_word_len, stopword_ratio)``.
    """
    wl = _wordlist(F.col("text"))
    n_words = F.size(wl)
    n_distinct = F.size(F.array_distinct(wl))
    sum_len = F.aggregate(
        F.transform(wl, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    en = STOPWORDS["en"]
    n_stop = F.size(F.filter(wl, lambda w: w.isin(*en)))
    return documents.select(
        "doc_id",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct"),
        (n_distinct / n_words).alias("distinct_ratio"),
        (sum_len / n_words).alias("avg_word_len"),
        (n_stop / n_words).alias("stopword_ratio"),
    )


def quality_scores_sql() -> str:
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    SELECT doc_id,
           CAST(len(l) AS INT) AS n_words,
           CAST(len(list_distinct(l)) AS INT) AS n_distinct,
           len(list_distinct(l)) / len(l) AS distinct_ratio,
           list_reduce(list_apply(l, w -> length(w)), (a, b) -> a + b) / len(l) AS avg_word_len,
           len(list_filter(l, w -> w IN ({en}))) / len(l) AS stopword_ratio
    FROM base
    """


def lang_scores_and_guess(wl):
    """Per-language stopword-hit scores and the argmax guess column for a
    word-array column — the reusable core of ``lang_id``, shared with the
    corpus-curation pipeline so featurization stays a single scan."""

    def _score(ws: list[str]):
        # one-arg lambda via closure: a default-arg lambda would make
        # PySpark treat it as a two-arg (element, index) HOF callback
        return F.size(F.filter(wl, lambda w: w.isin(*ws)))

    scores = {lang: _score(ws) for lang, ws in STOPWORDS.items()}
    best = None
    for lang in LANG_ORDER:
        cond = (scores[lang] > 0) & F.lit(True)
        for other in LANG_ORDER:
            if LANG_ORDER.index(other) < LANG_ORDER.index(lang):
                cond = cond & (scores[lang] > scores[other])
            elif other != lang:
                cond = cond & (scores[lang] >= scores[other])
        piece = F.when(cond, F.lit(lang))
        best = piece if best is None else best.when(cond, F.lit(lang))
    return scores, best.otherwise(F.lit("unknown"))


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-profile language guess (n-gram-free heuristic): count
    stopword hits per language, argmax with a fixed tiebreak order.
    Output: ``(doc_id, lang_guess, score_en, score_es, score_fr,
    score_de)``.
    """
    scores, guess = lang_scores_and_guess(_wordlist(F.col("text")))
    return documents.select(
        "doc_id",
        guess.alias("lang_guess"),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_ORDER],
    )


def lang_score_exprs_sql() -> dict[str, str]:
    """DuckDB stopword-score expressions over a word-list column ``l``."""
    return {
        lang: f"len(list_filter(l, w -> w IN ({', '.join(chr(39) + w + chr(39) for w in ws)})))"
        for lang, ws in STOPWORDS.items()
    }


def lang_guess_case_sql() -> str:
    """DuckDB argmax CASE over ``score_<lang>`` columns (same tiebreak
    order as the Spark side)."""
    cases = []
    for lang in LANG_ORDER:
        conds = [f"score_{lang} > 0"]
        for other in LANG_ORDER:
            if LANG_ORDER.index(other) < LANG_ORDER.index(lang):
                conds.append(f"score_{lang} > score_{other}")
            elif other != lang:
                conds.append(f"score_{lang} >= score_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(cases) + " ELSE 'unknown' END"


def lang_id_sql() -> str:
    sel = ", ".join(f"{e} AS score_{lang}" for lang, e in lang_score_exprs_sql().items())
    case_sql = lang_guess_case_sql()
    return f"""
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    scored AS (SELECT doc_id, {sel} FROM base)
    SELECT doc_id, {case_sql} AS lang_guess,
           CAST(score_en AS INT) AS score_en, CAST(score_es AS INT) AS score_es,
           CAST(score_fr AS INT) AS score_fr, CAST(score_de AS INT) AS score_de
    FROM scored
    """


def fingerprints(documents: DataFrame) -> DataFrame:
    """Content fingerprints: md5 digest of the normalized text plus a
    60-bit rolling-style hash of the first/last words (cheap locality
    signal). Output: ``(doc_id, fp_md5, fp_head)``.
    """
    wl = _wordlist(F.lower(F.col("text")))
    # try_element_at + F.concat (not element_at/concat_ws): out-of-bounds
    # yields NULL (Spark 4 ANSI element_at throws) and NULL propagates
    # through the concat — matching the oracle's l[2] || ... semantics
    head = F.concat(
        F.try_element_at(wl, F.lit(1)),
        F.lit(" "),
        F.try_element_at(wl, F.lit(2)),
        F.lit(" "),
        F.try_element_at(wl, F.lit(-1)),
    )
    return documents.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("fp_md5"),
        h60(head).alias("fp_head"),
    )


def fingerprints_sql() -> str:
    from mmw_geoprocessing_spark.functions.text import H60_SQL

    h = H60_SQL.format(x="l[1] || ' ' || l[2] || ' ' || l[-1]")
    return f"""
    WITH base AS (SELECT doc_id, lower(text) AS lt, string_split(lower(text), ' ') AS l
                  FROM documents)
    SELECT doc_id, md5(lt) AS fp_md5, {h} AS fp_head
    FROM base
    """


# ---------------------------------------------------------------------------
# PII scan / redaction — the compliance stage of a training-data
# pipeline. Patterns are deliberately written in the portable subset of
# regex syntax (character classes, bounded repetition, \b) so the Java
# (Spark) and RE2 (DuckDB) engines match identical spans; replacement is
# a single fused regexp_replace chain per row, JVM-side, no Python.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    # order matters: ssn before phone (a 3-2-4 digit group must win over
    # looser phone shapes), email before anything that could eat its dots
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_counts(documents: DataFrame) -> DataFrame:
    """Per-document PII hit counts per pattern class.

    Output: ``(doc_id, n_email, n_ssn, n_phone, n_ipv4)``.
    """
    return documents.select(
        "doc_id",
        *[
            F.regexp_count(F.col("text"), F.lit(p)).alias(f"n_{k}")
            for k, p in PII_PATTERNS.items()
        ],
    )


def pii_counts_sql(table: str = "documents") -> str:
    sel = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{p}')) AS INT) AS n_{k}"
        for k, p in PII_PATTERNS.items()
    )
    return f"SELECT doc_id, {sel} FROM {table}"


def pii_redact(documents: DataFrame) -> DataFrame:
    """Replace every PII span with its typed placeholder (``<EMAIL>``,
    ``<SSN>``, ``<PHONE>``, ``<IPV4>``) in declaration order, and count
    the total redactions. Output: ``(doc_id, clean_text, n_redactions)``.
    """
    clean = F.col("text")
    total = F.lit(0)
    for k, p in PII_PATTERNS.items():
        total = total + F.regexp_count(clean, F.lit(p))
        clean = F.regexp_replace(clean, p, f"<{k.upper()}>")
    return documents.select(
        "doc_id", clean.alias("clean_text"), total.cast("int").alias("n_redactions")
    )


def pii_redact_sql(table: str = "documents") -> str:
    clean = "text"
    totals = []
    for k, p in PII_PATTERNS.items():
        totals.append(f"len(regexp_extract_all({clean}, '{p}'))")
        clean = f"regexp_replace({clean}, '{p}', '<{k.upper()}>', 'g')"
    total = " + ".join(totals)
    return f"SELECT doc_id, {clean} AS clean_text, CAST({total} AS INT) AS n_redactions FROM {table}"


# ---------------------------------------------------------------------------
# Boilerplate normalization — the first stage of web-corpus ingestion:
# strip markup, decode the common entities, canonicalize whitespace.
# Same portable-regex discipline as the PII stage; a fused JVM-side
# replace chain, no Python.
# ---------------------------------------------------------------------------

_HTML_TAG = r"<[^>]*>"
_WS_RUN = r"[ \t\r\n]+"
_ENTITIES = [
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
]


def normalize_text(documents: DataFrame) -> DataFrame:
    """Markup/whitespace normalization: count then strip tags, decode
    common entities (after tag removal, so ``&lt;b&gt;`` cannot become a
    live tag), collapse whitespace runs, trim.
    Output: ``(doc_id, clean_text, n_tags)``.

    Idempotence: a second pass is a no-op EXCEPT on text produced by
    decoding angle-bracket entities — ``&lt;b&gt;`` decodes to the
    literal text ``<b>``, which a re-run would strip as markup. That is
    the deliberate trade-off of preserving entity-encoded markup as
    text (the alternative — decoding before stripping — treats it as
    live markup and loses it). Run once per document, which the
    curation pipeline's deterministic staging guarantees.
    """
    n_tags = F.regexp_count(F.col("text"), F.lit(_HTML_TAG))
    clean = F.regexp_replace(F.col("text"), _HTML_TAG, " ")
    for ent, rep in _ENTITIES:
        clean = F.replace(clean, F.lit(ent), F.lit(rep))
    clean = F.trim(F.regexp_replace(clean, _WS_RUN, " "))
    return documents.select(
        "doc_id", clean.alias("clean_text"), n_tags.cast("int").alias("n_tags")
    )


def normalize_text_sql(table: str = "documents") -> str:
    clean = f"regexp_replace(text, '{_HTML_TAG}', ' ', 'g')"
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        clean = f"replace({clean}, '{ent}', '{rep_sql}')"
    clean = f"trim(regexp_replace({clean}, '{_WS_RUN}', ' ', 'g'))"
    return (
        f"SELECT doc_id, {clean} AS clean_text, "
        f"CAST(len(regexp_extract_all(text, '{_HTML_TAG}')) AS INT) AS n_tags "
        f"FROM {table}"
    )


# ---------------------------------------------------------------------------
# benchmark-contamination detection
# ---------------------------------------------------------------------------


def _ngram_strings(words_col, n: int):
    """Array of word n-grams of ``words_col`` (space-joined strings).

    Guarded for short docs: Spark's ``sequence(1, k)`` is DESCENDING
    for k < 1 (``sequence(1, 0)`` -> ``[1, 0]``), so the start index
    list only materializes when at least one n-gram exists.
    """
    k = F.size(words_col) - F.lit(n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words_col, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination_check(
    documents: DataFrame, benchmark: DataFrame, n: int = 13
) -> DataFrame:
    """Benchmark-contamination scan: for each training document, how
    many of its distinct word ``n``-grams appear verbatim in the
    evaluation ``benchmark`` corpus (the standard decontamination test
    — GPT-3 App. C / PaLM-style 13-gram overlap).

    Output: ``(doc_id, doc_ngrams, hit_ngrams, contamination_ratio)``
    where ``doc_ngrams`` counts the document's DISTINCT n-grams,
    ``hit_ngrams`` how many of those occur anywhere in the benchmark,
    and the ratio divides the two exact ints once (0 for docs shorter
    than n words).

    100 TB shape: the benchmark n-gram set is the SMALL side by
    construction (eval suites are MBs against a TB corpus) — distinct
    n-grams, broadcast to every executor; the corpus side is one
    projection-pruned scan, per-row n-gram expansion via JVM
    higher-order functions (zero Python), a broadcast LEFT join tagging
    hits, and ONE hash aggregation back to doc_id. No shuffle touches
    the corpus until the final partial+final agg on doc_id keys.
    """
    # The word list is materialized as its OWN projection before the
    # n-gram lambda references it (the sampling._word_hashes rule:
    # higher-order-function lambdas get no common-subexpression
    # elimination, so an inlined split(text) re-evaluates for EVERY
    # gram — O(len²) splits per document).
    bench_grams = (
        benchmark.select(_wordlist(F.col("text")).alias("w"))
        .select(F.explode(_ngram_strings(F.col("w"), n)).alias("ng"))
        .distinct()
        .withColumn("is_hit", F.lit(1))
    )
    exploded = documents.select(
        "doc_id", _wordlist(F.col("text")).alias("w")
    ).select(
        "doc_id",
        F.array_distinct(_ngram_strings(F.col("w"), n)).alias("grams"),
    ).select(
        "doc_id",
        F.size("grams").alias("doc_ngrams"),
        F.explode_outer("grams").alias("ng"),
    )
    return (
        exploded.join(F.broadcast(bench_grams), "ng", "left")
        .groupBy("doc_id")
        .agg(
            F.max("doc_ngrams").alias("doc_ngrams"),
            F.coalesce(F.sum("is_hit"), F.lit(0)).cast("long").alias("hit_ngrams"),
        )
        .select(
            "doc_id",
            "doc_ngrams",
            "hit_ngrams",
            (
                F.col("hit_ngrams")
                / F.greatest(F.col("doc_ngrams"), F.lit(1)).cast("double")
            ).alias("contamination_ratio"),
        )
    )


CLF_BUCKETS = 1024
CLF_WEIGHT_MULT = 2654435761  # Knuth multiplicative constant
CLF_WEIGHT_MOD = 2001  # weights span [-1000, 1000]


def classifier_score(documents: DataFrame) -> DataFrame:
    """Model-based quality scoring via the hashing trick — the
    linear-classifier filter stage every modern curation pipeline runs
    (fastText-style quality classifiers in DCLM / FineWeb-Edu): each
    token hashes to one of ``CLF_BUCKETS`` feature buckets, the doc
    score is the sum of the buckets' weights, filter on the sign/value
    downstream.

    The WEIGHTS here are a deterministic stub (a fixed multiplicative
    hash of the bucket id) standing in for trained coefficients — the
    same stub policy as the multimodal decode family: the Spark-side
    plumbing is the deliverable. That plumbing is the point at 100 TB:
    inference is a PURE PROJECTION — ``aggregate(transform(tokens, w ->
    weight(h(w))), 0, +)`` evaluated per row inside whole-stage codegen,
    ZERO shuffles, no Python, no model server; swapping real fastText
    coefficients in means broadcasting a 2 M-entry int map into the same
    expression (or a generated CASE), not changing the plan. Integer
    weights make the sum order-free and the row hash-exact cross-engine.

    Output: ``(doc_id, n_tokens, clf_score_scaled, clf_score)`` —
    exact-int token count and scaled score, plus the one division.
    """
    words = F.split(F.col("text"), " ")
    # weight(w) = ((h28(w) % B) * MULT) % MOD - (MOD-1)/2  — all BIGINT
    weight = lambda w: (  # noqa: E731
        (F.conv(F.substring(F.md5(w), 1, 7), 16, 10).cast("bigint") % CLF_BUCKETS)
        * CLF_WEIGHT_MULT
    ) % CLF_WEIGHT_MOD - (CLF_WEIGHT_MOD - 1) // 2
    score = F.aggregate(
        F.transform(words, weight), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    return documents.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_tokens"),
        score.alias("clf_score_scaled"),
        (
            score / F.greatest(F.size(words), F.lit(1)).cast("double")
        ).alias("clf_score"),
    )


def classifier_score_sql(table: str = "documents") -> str:
    """DuckDB twin: identical per-token weight expression folded with
    an integer list_reduce (order-free sum)."""
    from mmw_geoprocessing_spark.functions.text import H28_SQL

    h = H28_SQL.format(x="w")
    half = (CLF_WEIGHT_MOD - 1) // 2
    wexpr = f"(({h} % {CLF_BUCKETS}) * {CLF_WEIGHT_MULT}) % {CLF_WEIGHT_MOD} - {half}"
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM {table}),
    scored AS (
        SELECT doc_id,
               CAST(len(l) AS BIGINT) AS n_tokens,
               CAST(list_reduce(
                   list_concat([CAST(0 AS BIGINT)],
                               list_transform(l, w -> CAST({wexpr} AS BIGINT))),
                   (a, b) -> a + b) AS BIGINT) AS clf_score_scaled
        FROM toks
    )
    SELECT doc_id, n_tokens, clf_score_scaled,
           clf_score_scaled / CAST(greatest(n_tokens, 1) AS DOUBLE) AS clf_score
    FROM scored
    """


def duplicate_spans(documents: DataFrame, n: int = 8) -> DataFrame:
    """Cross-document duplicated-span detection — the word-window
    approximation of exact-substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better": ExactSubstr): for each
    document, how many of its DISTINCT ``n``-word spans appear verbatim
    in at least one OTHER document.

    Output: ``(doc_id, doc_spans, dup_spans, dup_ratio)`` — exact ints
    plus one division (0 for docs shorter than ``n`` words). Downstream
    use: cut documents above a dup_ratio threshold, or feed the span
    table to a segment-removal pass.

    100 TB shape: ONE corpus scan, per-row span expansion via JVM
    higher-order functions (no Python); the span-frequency aggregate is
    a partial+final hash agg on the span string (map-side combine
    collapses within-partition repeats); the shared-span set — spans
    seen in >=2 distinct docs — is the SMALL side in a real corpus
    (dup spans are the tail), so the tag-back join broadcasts under AQE;
    final partial+final agg on doc_id. Unlike suffix-array ExactSubstr
    this needs no global sort — the price is window granularity (a
    duplicated run shorter than ``n`` words is invisible), the standard
    trade recorded in the paper's n=50-token operating point.
    """
    # word list materialized as its own projection first — an inlined
    # split(text) inside the n-gram lambda re-evaluates per gram
    # (O(len²) splits per doc; see contamination_check note)
    exploded = documents.select(
        "doc_id", _wordlist(F.col("text")).alias("w")
    ).select(
        "doc_id",
        F.array_distinct(_ngram_strings(F.col("w"), n)).alias("grams"),
    ).select(
        "doc_id",
        F.size("grams").alias("doc_spans"),
        F.explode_outer("grams").alias("ng"),
    )
    # a span is shared iff >=2 distinct docs contain it; exploded rows
    # are per-doc DISTINCT already, so count(*) == count(distinct doc)
    shared = (
        exploded.filter(F.col("ng").isNotNull())
        .groupBy("ng")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("ng", F.lit(1).alias("is_shared"))
    )
    return (
        exploded.join(shared, "ng", "left")
        .groupBy("doc_id")
        .agg(
            F.max("doc_spans").alias("doc_spans"),
            F.coalesce(F.sum("is_shared"), F.lit(0)).cast("long").alias("dup_spans"),
        )
        .select(
            "doc_id",
            "doc_spans",
            "dup_spans",
            (
                F.col("dup_spans")
                / F.greatest(F.col("doc_spans"), F.lit(1)).cast("double")
            ).alias("dup_ratio"),
        )
    )


def duplicate_spans_sql(n: int = 8, table: str = "documents") -> str:
    """DuckDB twin: identical span expansion, >=2-distinct-doc shared
    set, left-join tag-back. ``ex`` is MATERIALIZED — it feeds both the
    shared-set aggregate and the tag-back join (the multiple-evaluation
    hazard, SCALE.md 'Oracle-side evaluation discipline')."""
    span = n - 1
    grams = (
        f"list_transform(range(1, greatest(len(w) - {span}, 0) + 1), "
        f"i -> array_to_string(w[i:i+{span}], ' '))"
    )
    return f"""
    WITH dw AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}),
    ex AS MATERIALIZED (
        SELECT doc_id, len(list_distinct({grams})) AS doc_spans,
               unnest(list_concat(list_distinct({grams}), [NULL])) AS ng
        FROM dw
    ),
    shared AS (
        SELECT ng FROM ex WHERE ng IS NOT NULL
        GROUP BY ng HAVING COUNT(*) >= 2
    ),
    agg AS (
        SELECT ex.doc_id,
               CAST(max(ex.doc_spans) AS INT) AS doc_spans,
               CAST(count(shared.ng) AS BIGINT) AS dup_spans
        FROM ex LEFT JOIN shared ON ex.ng = shared.ng
        WHERE ex.ng IS NOT NULL OR ex.doc_spans = 0
        GROUP BY ex.doc_id
    )
    SELECT doc_id, doc_spans, dup_spans,
           dup_spans / CAST(greatest(doc_spans, 1) AS DOUBLE) AS dup_ratio
    FROM agg
    """


def repetition_scores(documents: DataFrame, ns: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Repeated-n-gram quality signals (the Gopher/MassiveText repetition
    filters, adapted to word streams): for each ``n`` in ``ns``, the
    fraction of the document's n-gram occurrences taken by its single
    most frequent n-gram (``top{n}_ratio``) and the fraction of n-gram
    occurrences belonging to any n-gram seen more than once
    (``dup{n}_ratio``). High values flag boilerplate / spam / template
    pages that per-word lexical-diversity scores miss.

    Output: ``(doc_id, top2_ratio, dup2_ratio, top3_ratio, dup3_ratio)``
    (for the default ``ns``); ratios are 0.0 for docs shorter than n
    words. Each ratio is ONE division of exact longs, so values hash
    identically cross-engine.

    100 TB shape: per-row n-gram frequency is NOT computed with per-row
    O(L²) array scans — n-grams are expanded JVM-side and exploded, then
    counted with ONE hash aggregation on ``(doc_id, n, gram)`` (linear
    in corpus size, map-side partial agg carries most of the weight
    since repeats are doc-local), followed by two doc_id-keyed folds
    whose input is already one row per distinct gram. All shuffles key
    on doc_id-prefixed tuples, so there is no hot key at any corpus
    size; no Python anywhere. ``explode_outer`` keeps gram-less docs as
    null-gram rows through the whole aggregation chain, so "every doc
    gets a verdict" costs no re-join against the corpus (one scan,
    three doc_id-prefixed exchanges, no broadcast of a per-doc table).
    """
    # word list materialized as its own projection first — an inlined
    # split() inside the n-gram lambdas re-evaluates per gram
    # (O(len²) splits per doc; see contamination_check note)
    wl = F.col("w")

    def _tag(n: int):
        # one-arg lambda via closure: a default-arg lambda would make
        # PySpark treat it as a two-arg (element, index) HOF callback
        return F.transform(
            _ngram_strings(wl, n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram")),
        )

    tagged = F.flatten(F.array(*[_tag(n) for n in ns]))
    grams = documents.select(
        "doc_id", _wordlist(F.lower(F.col("text"))).alias("w")
    ).select("doc_id", F.explode_outer(tagged).alias("t")).select(
        "doc_id", F.col("t.n").alias("n"), F.col("t.gram").alias("gram")
    )
    counts = grams.groupBy("doc_id", "n", "gram").agg(F.count("*").alias("c"))
    per_n = counts.groupBy("doc_id", "n").agg(
        F.sum("c").alias("total"),
        F.max("c").alias("top"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup"),
    )
    ratio_cols = []
    for n in ns:
        is_n = F.col("n") == n
        ratio_cols.append(
            F.coalesce(
                F.max(F.when(is_n, F.col("top") / F.col("total"))), F.lit(0.0)
            ).alias(f"top{n}_ratio")
        )
        ratio_cols.append(
            F.coalesce(
                F.max(F.when(is_n, F.col("dup") / F.col("total"))), F.lit(0.0)
            ).alias(f"dup{n}_ratio")
        )
    return per_n.groupBy("doc_id").agg(*ratio_cols)


def repetition_scores_sql(ns: tuple[int, ...] = (2, 3), table: str = "documents") -> str:
    gram_selects = []
    for n in ns:
        span = n - 1
        grams = (
            f"list_transform(range(1, greatest(len(l) - {span}, 0) + 1), "
            f"i -> array_to_string(l[i:i+{span}], ' '))"
        )
        gram_selects.append(
            f"SELECT doc_id, {n} AS n, unnest({grams}) AS gram FROM base"
        )
    gram_union = " UNION ALL ".join(gram_selects)
    ratio_exprs = ", ".join(
        f"max(CASE WHEN n = {n} THEN {top} / total END) AS {alias}"
        for n in ns
        for top, alias in (("top", f"top{n}_ratio"), ("dup", f"dup{n}_ratio"))
    )
    out_exprs = ", ".join(
        f"COALESCE({c}, 0.0) AS {c}"
        for n in ns
        for c in (f"top{n}_ratio", f"dup{n}_ratio")
    )
    return f"""
    WITH base AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM {table}),
    grams AS ({gram_union}),
    counts AS (SELECT doc_id, n, gram, CAST(count(*) AS BIGINT) AS c
               FROM grams GROUP BY ALL),
    per_n AS (SELECT doc_id, n,
                     CAST(sum(c) AS BIGINT) AS total,
                     CAST(max(c) AS BIGINT) AS top,
                     CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup
              FROM counts GROUP BY ALL),
    agg AS (SELECT doc_id, {ratio_exprs} FROM per_n GROUP BY doc_id)
    SELECT b.doc_id, {out_exprs}
    FROM (SELECT doc_id FROM {table}) b LEFT JOIN agg USING (doc_id)
    """


def contamination_check_sql(
    bench_where: str, n: int = 13, table: str = "documents"
) -> str:
    """DuckDB twin: ``bench_where`` selects the benchmark rows from the
    same table (e.g. ``doc_id % 101 = 7``)."""
    span = n - 1
    grams = (
        f"list_transform(range(1, greatest(len(w) - {span}, 0) + 1), "
        f"i -> array_to_string(w[i:i+{span}], ' '))"
    )
    return f"""
    WITH dw AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}),
    bg AS (
        SELECT DISTINCT unnest({grams}) AS ng
        FROM dw WHERE {bench_where}
    ),
    dg AS (
        SELECT doc_id, len(list_distinct({grams})) AS doc_ngrams,
               unnest(list_concat(list_distinct({grams}), [NULL])) AS ng
        FROM dw
    ),
    agg AS (
        SELECT dg.doc_id,
               CAST(max(dg.doc_ngrams) AS INT) AS doc_ngrams,
               CAST(count(bg.ng) AS BIGINT) AS hit_ngrams
        FROM dg LEFT JOIN bg ON dg.ng = bg.ng
        WHERE dg.ng IS NOT NULL OR dg.doc_ngrams = 0
        GROUP BY dg.doc_id
    )
    SELECT doc_id, doc_ngrams, hit_ngrams,
           hit_ngrams / CAST(greatest(doc_ngrams, 1) AS DOUBLE)
               AS contamination_ratio
    FROM agg
    """


def unigram_surprisal_scores(documents: DataFrame) -> DataFrame:
    """Corpus-LM quality scoring (the CCNet / "perplexity filter" shape,
    Wenzek et al. 2020): score each doc by how surprising its tokens are
    under the corpus's own unigram distribution. Rare-token-heavy docs
    (OCR noise, codes, spam) score high; boilerplate scores low.

    Surprisal is computed in EXACT INTEGER BITS: per token,
    ``bits = bitlen(total_tokens) - bitlen(df)`` where ``bitlen`` is
    the binary-digit count (``length(bin(x))``) — an integer within
    ±1 bit of true ``-log2 p(w)``. Chosen deliberately: transcendental
    log implementations differ bitwise between engines (measured: ~8
    ulps DuckDB vs libm), so a float-log score cannot be value-hashed
    cross-engine; integer bits can, and for FILTERING (a rank
    threshold) the ±1-bit quantization is immaterial. A production
    deployment can swap true ``log2`` into the same plan.

    Output: ``(doc_id, n_tokens, sum_surprisal_bits,
    mean_surprisal_bits, n_hapax, hapax_ratio)`` — means/ratios are
    single divisions of exact longs.

    100 TB shape: one scan -> explode -> ONE hash agg builds the
    vocabulary (word, df) -> equi-join tokens back on the word (AQE
    broadcasts the vocab when it fits — Heaps' law keeps it orders of
    magnitude smaller than the corpus; shuffle-join otherwise) -> one
    doc_id hash agg of integer sums. The 1-row totals frame joins by
    broadcast. No Python, no windows, no skew (word-frequency skew
    lands in the map-side partials of the vocab agg, not in a join
    key: the token->vocab join's build side is the DISTINCT vocab).
    """
    toks = documents.select(
        "doc_id", F.explode(_wordlist(F.lower(F.col("text")))).alias("w")
    )
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    totals = vocab.agg(F.sum("df").alias("tot"))
    bits = F.length(F.bin(F.col("tot"))) - F.length(F.bin(F.col("df")))
    scored = toks.join(vocab, "w").crossJoin(F.broadcast(totals))
    n_tokens = F.count(F.lit(1))
    sum_bits = F.sum(bits).alias("sum_surprisal_bits")
    n_hapax = F.sum((F.col("df") == 1).cast("bigint"))
    return scored.groupBy("doc_id").agg(
        n_tokens.alias("n_tokens"),
        sum_bits,
        (F.sum(bits) / n_tokens).alias("mean_surprisal_bits"),
        n_hapax.alias("n_hapax"),
        (n_hapax / n_tokens).alias("hapax_ratio"),
    )


def unigram_surprisal_scores_sql(table: str = "documents") -> str:
    """DuckDB twin: same tokenization, same integer bit-surprisal."""
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM {table}
    ),
    vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY w),
    totals AS (SELECT CAST(SUM(df) AS BIGINT) AS tot FROM vocab)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(length(bin(tot)) - length(bin(df))) AS BIGINT)
               AS sum_surprisal_bits,
           SUM(length(bin(tot)) - length(bin(df)))
               / CAST(COUNT(*) AS DOUBLE) AS mean_surprisal_bits,
           CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE) AS hapax_ratio
    FROM toks t JOIN vocab v USING (w) CROSS JOIN totals
    GROUP BY t.doc_id
    """


def quality_percentile_filter(
    documents: DataFrame, p: float = 0.5
) -> DataFrame:
    """Global percentile quality gate — keep the top ``(1-p)`` fraction
    of the corpus by score — WITHOUT a global sort. "Filter to the top
    X% by quality score" is the standard final gate after quality
    scoring, and the naive plan (percent_rank over the whole corpus) is
    a single-partition total order: the 100 TB trap.

    Scalable construction: (1) ONE hash agg builds the score HISTOGRAM
    (distinct score -> count) — for integer scores its cardinality is
    bounded by the score range, thousands of rows at any corpus size;
    (2) a running sum over the tiny histogram (the only ordered window,
    over histogram rows, never corpus rows) finds the threshold = the
    smallest score whose ascending cumulative count strictly exceeds
    floor(p * N); (3) one broadcast of the 1-row threshold filters the
    corpus. Ties at the threshold are KEPT (deterministic; the kept
    fraction may exceed 1-p by the tie mass — documented semantics).

    Score = whitespace token count (integer, hash-exact cross-engine).
    Output: kept ``(doc_id, score)``.
    """
    scored = documents.select(
        "doc_id", F.size(_wordlist(F.col("text"))).cast("bigint").alias("score")
    )
    hist = scored.groupBy("score").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    total = scored.agg(F.floor(F.count(F.lit(1)) * F.lit(p)).alias("cut"))
    thresh = (
        cum.crossJoin(F.broadcast(total))
        .filter(F.col("cum") > F.col("cut"))
        .agg(F.min("score").alias("threshold"))
    )
    return (
        scored.crossJoin(F.broadcast(thresh))
        .filter(F.col("score") >= F.col("threshold"))
        .select("doc_id", "score")
    )


def quality_percentile_filter_sql(p: float = 0.5, table: str = "documents") -> str:
    """DuckDB twin: same histogram -> running-sum -> threshold -> filter."""
    return f"""
    WITH scored AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS score
      FROM {table}
    ),
    hist AS (SELECT score, COUNT(*) AS cnt FROM scored GROUP BY score),
    cum AS (SELECT score, SUM(cnt) OVER (ORDER BY score
                    ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
    total AS (SELECT FLOOR(COUNT(*) * {p}) AS cut FROM scored),
    thresh AS (SELECT MIN(score) AS threshold FROM cum, total WHERE cum > cut)
    SELECT s.doc_id, s.score FROM scored s, thresh t
    WHERE s.score >= t.threshold
    """


def chunk_documents(
    documents: DataFrame, window: int = 64, stride: int = 48
) -> DataFrame:
    """Context-window chunking — split each document into overlapping
    token windows (the step that turns a raw corpus into fixed-length
    training sequences). Whitespace tokens; windows start at 0, stride,
    2*stride, ... and the LAST window is the one whose start is the
    first position where start + window >= n_tokens (so every token is
    covered exactly once by a final possibly-short window, and no empty
    windows are emitted for short docs — a 1-token doc yields 1 chunk).

    Output: ``(doc_id, chunk_id, start_tok, n_tok, chunk_text)``.

    100 TB shape: pure built-ins — split once, `sequence` generates the
    window starts, `posexplode` fans out, `slice`+`concat_ws`
    materialize each chunk JVM-side. No shuffle at all (a projection +
    generator over the scan); chunk rows inherit the input partitioning,
    which is exactly what the downstream tokenizer/pack stage wants.
    """
    toks = F.split(F.col("text"), " ")
    n = F.col("n")
    # number of windows: 1 + ceil(max(0, n - window) / stride)
    n_win = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(window), F.lit(0)) / F.lit(stride)
    ).cast("int")
    starts = F.sequence(F.lit(0), (n_win - 1) * stride, F.lit(stride))
    return (
        documents.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.size("toks").alias("n"))
        .select(
            "doc_id",
            "n",
            "toks",
            F.posexplode(starts).alias("chunk_id", "start_tok"),
        )
        .select(
            "doc_id",
            "chunk_id",
            "start_tok",
            F.least(F.lit(window), F.col("n") - F.col("start_tok")).alias("n_tok"),
            F.concat_ws(
                " ", F.slice(F.col("toks"), F.col("start_tok") + 1, window)
            ).alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    window: int = 64, stride: int = 48, table: str = "documents"
) -> str:
    """DuckDB twin: same window-start arithmetic via generate_series."""
    return f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM {table}
    ),
    wins AS (
      SELECT doc_id, n, toks,
             CAST(1 + CEIL(GREATEST(n - {window}, 0) / {stride}.0) AS INT) AS n_win
      FROM base
    )
    SELECT doc_id,
           CAST(g.s AS INT) AS chunk_id,
           CAST(g.s * {stride} AS INT) AS start_tok,
           CAST(LEAST({window}, n - g.s * {stride}) AS INT) AS n_tok,
           array_to_string(toks[(g.s * {stride} + 1):(g.s * {stride} + {window})], ' ')
               AS chunk_text
    FROM wins, LATERAL (SELECT unnest(generate_series(0, n_win - 1)) AS s) g
    """


def bigram_surprisal_scores(documents: DataFrame) -> DataFrame:
    """Conditional-LM quality scoring (round 10): per-document mean
    bigram surprisal under the corpus's own bigram model — the step up
    from ``unigram_surprisal_scores`` toward CCNet's KenLM perplexity
    filter (Wenzek et al. 2020). A document whose word TRANSITIONS are
    improbable (shuffled text, keyword stuffing, OCR scramble) scores
    high even when its individual words are common — the failure mode a
    unigram model cannot see.

    Same cross-engine-exact device as the unigram operator: per bigram
    (a, b), ``bits = bitlen(count(a, *)) - bitlen(count(a, b))`` — an
    integer within ±1 bit of true ``-log2 P(b | a)``; sums of exact
    integers value-hash across engines where transcendental logs
    cannot. Documents with fewer than 2 tokens emit no row (they have
    no transitions; both engines agree).

    Output: ``(doc_id, n_bigrams, sum_bigram_bits, mean_bigram_bits)``.

    100 TB shape (mirrors the unigram plan): one scan -> per-doc
    bigram explode (arrays_zip of the shifted word array — zero
    shuffle) -> ONE hash agg builds the bigram table (a, b, cnt_ab);
    the context marginals (a, cnt_a) aggregate the SMALL bigram table,
    not the corpus. Token pairs join back on (a, b) and on a (AQE
    broadcasts both when they fit), then one doc_id agg of integer
    sums. Transition-frequency skew lands in map-side partials, not in
    a hot join key.
    """
    w = _wordlist(F.lower(F.col("text")))
    pairs = documents.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(w) >= 2,
                F.arrays_zip(
                    F.slice(w, 1, F.size(w) - 1).alias("a"),
                    F.slice(w, 2, F.size(w) - 1).alias("b"),
                ),
            ).otherwise(F.array())
        ).alias("p"),
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    bigrams = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cnt_ab"))
    contexts = bigrams.groupBy("a").agg(F.sum("cnt_ab").alias("cnt_a"))
    bits = F.length(F.bin(F.col("cnt_a"))) - F.length(F.bin(F.col("cnt_ab")))
    scored = pairs.join(bigrams, ["a", "b"]).join(contexts, "a")
    n = F.count(F.lit(1))
    return scored.groupBy("doc_id").agg(
        n.alias("n_bigrams"),
        F.sum(bits).alias("sum_bigram_bits"),
        (F.sum(bits) / n).alias("mean_bigram_bits"),
    )


def bigram_surprisal_scores_sql(table: str = "documents") -> str:
    """DuckDB twin: same tokenization, same shifted-pair construction
    (1-based w[i], w[i+1] over i in [1, len)), same integer bits."""
    return f"""
    WITH dw AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w FROM {table}
    ),
    prs AS (
        SELECT doc_id, w[i] AS a, w[i + 1] AS b
        FROM dw, UNNEST(range(1, len(w))) AS t(i)
    ),
    bigrams AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cnt_ab
        FROM prs GROUP BY a, b
    ),
    contexts AS (
        SELECT a, CAST(SUM(cnt_ab) AS BIGINT) AS cnt_a
        FROM bigrams GROUP BY a
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(length(bin(cnt_a)) - length(bin(cnt_ab))) AS BIGINT)
               AS sum_bigram_bits,
           SUM(length(bin(cnt_a)) - length(bin(cnt_ab)))
               / CAST(COUNT(*) AS DOUBLE) AS mean_bigram_bits
    FROM prs p JOIN bigrams USING (a, b) JOIN contexts USING (a)
    GROUP BY p.doc_id
    """
