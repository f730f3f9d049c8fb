"""URL canonicalization + canonical-URL dedup — the C4/RefinedWeb
crawl pre-stage (r11 verdict #7's second stretch candidate).

A crawl sees the same page under many spellings: scheme/host case,
``www.`` prefixes, default ports, trailing slashes, fragments,
tracking parameters (``utm_*``, ``fbclid``, ``gclid``, ``ref``), and
permuted query order. Deduplicating BEFORE content processing is the
cheapest dedup a pipeline runs — string normalization plus one
group-by — and per-registered-domain accounting (eTLD+1) is what
domain caps and per-site quality priors key on.

Both operators are pure JVM expressions (regexp + array functions, no
UDF, no explode):

- ``url_canonicalize``: parse → lowercase scheme/host → strip
  fragment, default port, ``www.``, ONE trailing path slash → drop
  tracking params → sort surviving params → reassemble; plus the
  registered domain via a public-suffix rule (two labels, or three
  over the multi-label suffixes ``co.uk``/``com.au``/…).
- ``dedup_url_canonical``: group by the canonical form, keep the
  smallest doc_id, count the collapsed duplicates.

The fixture documents carry no URL column, so the registered rows use
the repo's deterministic-injection convention (``text_pii_redact``'s
pattern, __spark_entry__._pii_injected): BOTH engines synthesize the
SAME raw URL per document — host case, ``www.`` case, an explicit
``:443``, path ``item-<doc_id % 50>``, a trailing slash, ``utm_*`` /
``ref`` noise, permuted ``a``/``b`` params, and a fragment all vary
with ``doc_id`` — so canonicalization provably collapses each
``(source, doc_id % 50)`` group to one URL and every normalization
rule is exercised by the hash gate.

100 TB shape: canonicalization is a zero-shuffle projection;
the dedup is ONE hash aggregation on the canonical string (the
exact-dedup class — partial aggregation collapses duplicates map-side
because duplicate URLs of one page cluster within crawl segments).

Reference parity note: the reference's closest analogue is layer-name
canonicalization before catalog reads (``Utils.scala:241-248``); this
family belongs to the training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.functions.text import H28_SQL, h28

#: public suffixes under which the registered domain takes THREE labels
TWO_LABEL_SUFFIXES = ("co.uk", "com.au", "co.jp", "org.uk")

#: query parameters dropped by canonicalization (tracking noise)
TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "ref=")

#: collapsed-group modulus for the synthetic raw URLs: each
#: (source, doc_id % URL_GROUP_MOD) group canonicalizes to ONE URL
URL_GROUP_MOD = 50


def with_raw_url(documents: DataFrame) -> DataFrame:
    """Deterministic synthetic raw URL per document (injection
    convention: the oracle builds the identical string)."""
    d = F.col("doc_id")
    item = (d % URL_GROUP_MOD).cast("string")
    url = F.concat(
        F.when(d % 3 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(d % 2 == 0, F.lit("WWW.")).otherwise(F.lit("www.")),
        F.col("source"),
        F.when(h28(F.col("source")) % 5 == 0, F.lit(".co.uk")).otherwise(
            F.lit(".example.com")
        ),
        F.when(d % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/articles/item-"),
        item,
        F.when(d % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&id="),
        item,
        F.when(d % 3 == 0, F.lit("&ref=tw")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit("&b=2&a=1")).otherwise(F.lit("&a=1&b=2")),
        F.when(d % 6 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return documents.withColumn("url", url)


def raw_url_sql() -> str:
    """The identical injection as DuckDB SQL (one expression)."""
    hsrc = H28_SQL.format(x="source")
    return f"""
      (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END) || '://'
      || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'www.' END) || source
      || (CASE WHEN ({hsrc}) % 5 = 0 THEN '.co.uk' ELSE '.example.com' END)
      || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
      || '/articles/item-' || CAST(doc_id % {URL_GROUP_MOD} AS VARCHAR)
      || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
      || '?utm_source=feed&id=' || CAST(doc_id % {URL_GROUP_MOD} AS VARCHAR)
      || (CASE WHEN doc_id % 3 = 0 THEN '&ref=tw' ELSE '' END)
      || (CASE WHEN doc_id % 4 = 0 THEN '&b=2&a=1' ELSE '&a=1&b=2' END)
      || (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)
    """


def url_canonicalize(documents_with_url: DataFrame) -> DataFrame:
    """Canonical URL + registered domain per document. Input must carry
    a ``url`` column (``with_raw_url`` for the fixture corpus). Output:
    ``(doc_id, url, canonical_url, registered_domain)`` — a
    zero-shuffle projection.

    STAGED selects on purpose (the ``_word_hashes`` materialized-column
    lesson, measured here as 3.0× → see BASELINE round 12): named
    intermediate columns evaluate each parse step once.

    ZERO regex in the hot path (r12 verdict #6: the staged plan was
    already single-evaluation, so the remaining lever was the JVM
    java.util.regex engine itself vs DuckDB's RE2 — 8 regex
    executions/row across 5 M rows cost ~1.3 s at the 100× replica
    where the whole agg costs ~0.2 s). The parse is rewritten on
    ``substring_index`` / ``instr`` / ``startswith`` byte primitives,
    semantically identical to the oracle's regex CTEs INCLUDING
    malformed inputs (r13 ADVICE): the scheme grammar is anchored
    ``[A-Za-z][A-Za-z0-9+.-]*`` via translate() charset checks, every
    offset is computed on pre-lowercase strings (lower() is not
    length-preserving for e.g. 'İ'), and the registered-domain port
    strip is last-colon. The one ``split`` left runs on the literal
    '&'. The adversarial-corpus parity test
    (tests/test_urls.py::test_adversarial_parity_with_oracle) pins the
    agreement on inputs the fixture injection never produces."""
    # r12 ADVICE: LIKE treats "_" as a single-char wildcard, so
    # 'utm_%' also matched params named utmX... — substr-prefix
    # comparison is wildcard-free and identical in both engines
    drop = " OR ".join(
        f"substr(p, 1, {len(pre)}) = '{pre}'" for pre in TRACKING_PREFIXES
    )
    suf = ", ".join(f"'{s}'" for s in TWO_LABEL_SUFFIXES)
    d1 = documents_with_url.select(
        "doc_id",
        "url",
        # fragment strip = everything before the first '#'
        F.expr("substring_index(url, '#', 1)").alias("u2"),
    )
    # r13 ADVICE: the scheme grammar is ANCHORED —
    # [A-Za-z][A-Za-z0-9+.-]* — on the RAW (pre-lowercase) prefix, so
    # '1http://x' and 'foo bar://x' canonicalize to '' exactly like the
    # oracle's anchored regex. translate() emptiness is the
    # wildcard-free charset check (same trick as the port-digits guard).
    _ALPHA = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    d1b = d1.select(
        "doc_id",
        "url",
        "u2",
        F.expr(
            "CASE WHEN instr(u2, '://') > 0 "
            "THEN substring_index(u2, '://', 1) ELSE '' END"
        ).alias("rawscheme"),
    )
    d2 = d1b.select(
        "doc_id",
        "url",
        "u2",
        "rawscheme",
        F.expr(
            f"rawscheme != '' "
            f"AND translate(substr(rawscheme, 1, 1), '{_ALPHA}', '') = '' "
            f"AND translate(rawscheme, '{_ALPHA}0123456789+.-', '') = ''"
        ).alias("scheme_ok"),
    )
    d2b = d2.select(
        "doc_id",
        "url",
        F.expr(
            "CASE WHEN scheme_ok THEN lower(rawscheme) ELSE '' END"
        ).alias("scheme"),
        # rest via RAW length arithmetic (not instr on a lowered copy):
        # lower() does not preserve length for some Unicode ('İ'), so
        # every offset below is computed on the un-lowered string
        F.expr(
            "CASE WHEN scheme_ok "
            "THEN substring(u2, length(rawscheme) + 4) ELSE '' END"
        ).alias("rest"),
    )
    d3 = d2b.select(
        "doc_id",
        "url",
        "scheme",
        "rest",
        # authority = rest up to the first '/' or '?', whichever first
        # — kept UN-lowered so pathq's offset is length-exact
        F.expr(
            "substring_index(substring_index(rest, '/', 1), '?', 1)"
        ).alias("rawhostport"),
    )
    d4 = d3.select(
        "doc_id",
        "url",
        "scheme",
        F.expr("lower(rawhostport)").alias("hostport"),
        # pathq = rest after the authority (offset from the RAW length)
        F.expr("substring(rest, length(rawhostport) + 1)").alias("pathq"),
    )
    d5 = d4.select(
        "doc_id",
        "url",
        "scheme",
        "hostport",
        F.expr(
            "CASE WHEN endswith(substring_index(pathq, '?', 1), '/') "
            "THEN left(substring_index(pathq, '?', 1), "
            "length(substring_index(pathq, '?', 1)) - 1) "
            "ELSE substring_index(pathq, '?', 1) END"
        ).alias("path"),
        F.expr(
            "CASE WHEN instr(pathq, '?') > 0 "
            "THEN substring(pathq, instr(pathq, '?') + 1) ELSE '' END"
        ).alias("query"),
    )
    d6 = d5.select(
        "doc_id",
        "url",
        "scheme",
        "path",
        "query",
        # default-port strip, staged so the www-strip evaluates it once
        F.expr(
            "CASE WHEN scheme = 'https' AND endswith(hostport, ':443') "
            "THEN left(hostport, length(hostport) - 4) "
            "WHEN scheme = 'http' AND endswith(hostport, ':80') "
            "THEN left(hostport, length(hostport) - 3) ELSE hostport END"
        ).alias("hp1"),
    )
    d6b = d6.select(
        "doc_id",
        "url",
        "scheme",
        "path",
        F.expr(
            "CASE WHEN startswith(hp1, 'www.') THEN substring(hp1, 5) "
            "ELSE hp1 END"
        ).alias("host"),
        F.expr(
            f"array_join(array_sort(filter(split(query, '&'), "
            f"p -> p != '' AND NOT ({drop}))), '&')"
        ).alias("qs"),
    )
    d7 = d6b.select(
        "doc_id",
        "url",
        F.expr(
            "concat(scheme, '://', host, path, "
            "CASE WHEN qs != '' THEN concat('?', qs) ELSE '' END)"
        ).alias("canonical_url"),
        # registered domain needs the NUMERIC-port-free host (the
        # oracle's ':[0-9]+$'): strip after the LAST ':' only when the
        # suffix is non-empty all-digits — r13 ADVICE: first-colon
        # truncation broke multi-colon authorities ('[::1]:8080' must
        # keep '[::1]', not '['); left(len - portlen - 1) is the
        # last-colon twin of the oracle's anchored regex
        F.expr(
            "CASE WHEN instr(host, ':') > 0 "
            "AND substring_index(host, ':', -1) != '' "
            "AND translate(substring_index(host, ':', -1), '0123456789', '') = '' "
            "THEN left(host, length(host) - length(substring_index(host, ':', -1)) - 1) "
            "ELSE host END"
        ).alias("hnp"),
    )
    return d7.select(
        "doc_id",
        "url",
        "canonical_url",
        F.expr(
            f"CASE WHEN length(hnp) - length(replace(hnp, '.', '')) >= 2 "
            f"AND substring_index(hnp, '.', -2) IN ({suf}) "
            f"THEN substring_index(hnp, '.', -3) "
            f"ELSE substring_index(hnp, '.', -2) END"
        ).alias("registered_domain"),
    )


def dedup_url_canonical(documents_with_url: DataFrame) -> DataFrame:
    """Canonical-URL dedup: one row per canonical form with the kept
    (smallest) doc_id and the number of collapsed spellings. Output:
    ``(canonical_url, registered_domain, keep_doc_id, n_dups)``."""
    canon = url_canonicalize(documents_with_url)
    return canon.groupBy("canonical_url", "registered_domain").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


def _canonical_sql_ctes(raw_select: str | None = None) -> str:
    """DuckDB twin of the parse + canonicalization, as chained CTEs
    (readable and single-evaluation; list_filter is depth-1 with
    literal prefixes — the shape DuckDB 1.0's lambda engine handles).

    ``raw_select`` overrides the source rows (default: the synthetic
    injection over ``documents``) so parity tests can feed an
    adversarial (doc_id, url) corpus through the SAME oracle."""
    # r12 ADVICE: LIKE treats "_" as a single-char wildcard, so
    # 'utm_%' also matched params named utmX... — substr-prefix
    # comparison is wildcard-free and identical in both engines
    drop = " OR ".join(
        f"substr(p, 1, {len(pre)}) = '{pre}'" for pre in TRACKING_PREFIXES
    )
    suf = ", ".join(f"'{s}'" for s in TWO_LABEL_SUFFIXES)
    raw = raw_select or f"SELECT doc_id, ({raw_url_sql()}) AS url FROM documents"
    # r13 ADVICE: the rest-extraction regex is anchored on the SAME
    # scheme grammar as the scheme extraction ([A-Za-z][A-Za-z0-9+.-]*)
    # — previously it accepted digit-led schemes ('1http://x') that the
    # scheme regex rejected, so the two CTE columns disagreed with each
    # other (and with the Spark byte-primitive parse) on malformed URLs
    return f"""
    raw AS (
      {raw}
    ),
    parts AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
        regexp_extract(regexp_replace(url, '#.*$', ''),
                       '^[A-Za-z][A-Za-z0-9+.\\-]*://(.*)$', 1) AS rest
      FROM raw
    ),
    hostpath AS (
      SELECT doc_id, url, scheme, rest,
        regexp_replace(
          CASE WHEN scheme = 'https'
               THEN regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)), ':443$', '')
               WHEN scheme = 'http'
               THEN regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)), ':80$', '')
               ELSE lower(regexp_extract(rest, '^([^/?]*)', 1)) END,
          '^www\\.', '') AS host,
        regexp_replace(regexp_extract(rest, '^[^/?]*([^?]*)', 1), '/$', '') AS path,
        regexp_extract(rest, '\\?(.*)$', 1) AS query
      FROM parts
    ),
    canon AS (
      SELECT doc_id, url, host,
        scheme || '://' || host || path ||
        CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical_url,
        CASE WHEN len(labels) >= 3
                  AND array_to_string(list_slice(labels, len(labels) - 1, len(labels)), '.') IN ({suf})
             THEN array_to_string(list_slice(labels, len(labels) - 2, len(labels)), '.')
             ELSE array_to_string(list_slice(labels, len(labels) - 1, len(labels)), '.')
        END AS registered_domain
      FROM (
        SELECT *,
          array_to_string(
            list_sort(list_filter(string_split(query, '&'),
                                  p -> p <> '' AND NOT ({drop}))), '&') AS qs,
          string_split(regexp_replace(host, ':[0-9]+$', ''), '.') AS labels
        FROM hostpath
      )
    )"""


def url_canonicalize_sql() -> str:
    return f"""
    WITH {_canonical_sql_ctes()}
    SELECT doc_id, url, canonical_url, registered_domain FROM canon
    """


def dedup_url_canonical_sql() -> str:
    return f"""
    WITH {_canonical_sql_ctes()}
    SELECT canonical_url, registered_domain,
           MIN(doc_id) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM canon
    GROUP BY canonical_url, registered_domain
    """
