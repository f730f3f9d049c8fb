"""Text/hash column helpers shared by the LLM-pipeline operators.

All hashing is md5-derived so Spark and DuckDB agree bit-for-bit:
Spark ``conv(substr(md5(x),1,n),16,10)`` == DuckDB
``CAST('0x' || substr(md5(x),1,n) AS BIGINT)``. 7 hex digits -> 28-bit
values (safe headroom for modular arithmetic in 64-bit), 15 hex digits
-> 60-bit values (simhash width; avoids BIGINT sign overflow).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# MinHash universal-hash parameters: h_i(x) = (a_i * x + b_i) mod P.
# P prime > 2^28 domain; a_i odd, b_i from a Knuth-style multiplier.
MINHASH_P = 2147483647
MINHASH_N = 64


def minhash_params(i: int) -> tuple[int, int]:
    return 2 * i + 1, (2654435761 * (i + 1)) % MINHASH_P


def words(text: Column) -> Column:
    return F.split(text, " ")


def h28(col: Column) -> Column:
    """28-bit md5-derived hash (cross-engine deterministic)."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("bigint")


def h60(col: Column) -> Column:
    """60-bit md5-derived hash (fits BIGINT without sign issues)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles: overlapping word windows joined by spaces.

    Documents with fewer than k words yield an empty array (matching the
    oracle's generate_series, which emits no rows). ``sequence(1, 0)``
    is NOT empty in Spark — it is the descending ``[1, 0]`` and slice
    with start 0 throws — so the start list is built as a slice of
    ``sequence(1, n)`` instead.
    """
    t = _n(text)
    n = f"size(split({t}, ' '))"
    return F.expr(
        f"transform(slice(sequence(1, {n}), 1, greatest({n} - {k - 1}, 0)), "
        f"i -> array_join(slice(split({t}, ' '), i, {k}), ' '))"
    )


def shingles_from_words(words_col: Column, k: int = 3) -> Column:
    """``shingles`` over a PRE-MATERIALIZED word-array column.

    Higher-order-function lambdas get no common-subexpression
    elimination, so ``shingles(text)`` re-evaluates ``split(text)`` for
    EVERY window — O(len²) characters per document. Materializing the
    word list as its own projection first (the sampling._word_hashes
    rule) and slicing the attribute keeps it O(len·k)."""
    l = _n(words_col)
    n = f"size({l})"
    return F.expr(
        f"transform(slice(sequence(1, {n}), 1, greatest({n} - {k - 1}, 0)), "
        f"i -> array_join(slice({l}, i, {k}), ' '))"
    )


def _n(col: Column) -> str:
    """Column -> SQL name for use inside expr() (works for simple refs)."""
    return col._jc.toString()  # noqa: SLF001


# SQL twins (DuckDB dialect) -------------------------------------------------

H28_SQL = "CAST(('0x' || substr(md5({x}), 1, 7)) AS BIGINT)"
H60_SQL = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"

# Shingle list built PER DOC then unnested. The previous form
# cross-joined each doc's word list with generate_series and indexed it
# per row — the intermediate then carries the FULL list on every
# shingle row (~120 words x ~60 M rows ≈ 150 GB at the sf10 replica;
# both big-SF gate OOMs traced here). One list_transform per doc keeps
# the intermediate at one shingle-list per document.
SHINGLES_CTE_SQL = (
    "SELECT doc_id, UNNEST(list_transform(generate_series(1, len(l) - 2), "
    "i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s "
    "FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)"
)
