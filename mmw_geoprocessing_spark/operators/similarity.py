"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against the full corpus; dot products computed JVM-side with
higher-order array functions (``zip_with`` + sequential ``aggregate``
fold), which keeps the hot loop out of Python *and* makes the float
arithmetic order-deterministic, so the DuckDB oracle (``list_reduce``
over ``list_zip``) matches bit-for-bit.

Scale path: BANDED random-hyperplane LSH — 64 deterministic md5-sign
hyperplanes grouped into bands; two vectors are candidates iff they
agree on every sign in at least one band. Candidate generation is an
equi-join on (band, band_key) — the shuffle key at 100 TB — followed by
exact cosine verification/ranking. Both the near-dup pair search and
the approximate top-k use this shape; the all-pairs and brute-force
variants remain as exact small-corpus baselines.

A vectorized Arrow/pandas variant (numpy matmul) exists for raw
throughput (`cosine_topk_pandas`) — same results up to float summation
order; registered as ``similarity_cosine_topk_pandas`` with a full
rank-only DuckDB oracle (scores projected away, (query_id, rank,
doc_id) hash-matched), so it is both benchmarked and oracle-verified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.functions.plan_cache import PlanCache
from mmw_geoprocessing_spark.functions.plan_cache import session_token as _session_token

DIM = 64

# Corpus-wide similarity INDEXES (LSH band signatures, IVF inverted
# file, norm table) are ingest-time artifacts, not per-request work —
# built once per (session, corpus) and persisted, mirroring the minhash
# shingle cache (operators/dedup.py).
_INDEX_CACHE = PlanCache()


def clear_similarity_index_cache() -> None:
    """Invalidate every cached similarity index (between corpora in a
    long-lived service session)."""
    _INDEX_CACHE.clear()
    with _CENTROID_CACHE_LOCK:
        _CENTROID_CACHE.clear()


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (order-deterministic across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


# SQL-string twins of _as_double/_dot/_norm (optimization r14, the
# _cell_scores/_band_structs lesson): the Column versions cost one py4j
# round trip per operator and ~27 ms per HOF lambda at BUILD time; the
# string parses JVM-side in one call into the IDENTICAL expression tree
# (same zip_with/aggregate fold, same literals), so results are
# bit-equal. Per-request serving builders use these.


def _as_double_expr(col: str) -> str:
    return f"transform({col}, x -> cast(x as double))"


def _dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _norm_expr(a: str) -> str:
    return f"sqrt({_dot_expr(a, a)})"


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


DOT_SQL = (
    "list_reduce(list_apply(list_zip({a}, {b}), t -> t[1] * t[2]), (x, y) -> x + y)"
)


def _cos_sql(a: str, b: str) -> str:
    dot = DOT_SQL.format(a=a, b=b)
    na = f"sqrt({DOT_SQL.format(a=a, b=a)})"
    nb = f"sqrt({DOT_SQL.format(a=b, b=b)})"
    return f"({dot}) / (({na}) * ({nb}))"


def cosine_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k: query rows (vec_id < n_queries) against
    the whole corpus. The query side is broadcast; ranking is a window
    partitioned by query id.

    Norms are precomputed ONCE per side before the pair join —
    ``dot/(nq*nc)`` evaluates the identical float ops as the naive
    per-pair ``dot/(norm(q)*norm(c))`` (same fold, same sqrt, same
    multiply), so values stay bit-identical to the oracle while the
    join stops re-folding both norms for every candidate pair (~3x
    less array work in the hot loop).
    Output: ``(q_id, vec_id, cosine, rank)``.
    """
    from pyspark.sql import Window

    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), _as_double(F.col("embedding")).alias("qv")
    ).withColumn("nq", _norm(F.col("qv")))
    c = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("cv")
    ).withColumn("nc", _norm(F.col("cv")))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        F.broadcast(q)
        .join(c, F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc"))).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_sql(n_queries: int = 20, k: int = 5) -> str:
    cos = _cos_sql("q.qv", "c.cv")
    return f"""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings
               WHERE vec_id < {n_queries}),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings)
    SELECT q_id, vec_id, cosine, rank FROM (
      SELECT q.q_id, c.vec_id, {cos} AS cosine,
             ROW_NUMBER() OVER (PARTITION BY q.q_id
                                ORDER BY {cos} DESC, c.vec_id) AS rank
      FROM q JOIN c ON q.q_id <> c.vec_id
    ) WHERE rank <= {k}
    """


def cosine_neardup(embeddings: DataFrame, threshold: float = 0.4) -> DataFrame:
    """All-pairs cosine near-duplicates above a threshold (exact).

    The v1<v2 self-join is quadratic — correct as a small-corpus oracle
    baseline; the LSH variant below is the scale path.
    Output: ``(v1, v2, cosine)``.
    """
    a = embeddings.select(
        F.col("vec_id").alias("v1"), _as_double(F.col("embedding")).alias("e1")
    ).withColumn("n1", _norm(F.col("e1")))
    b = embeddings.select(
        F.col("vec_id").alias("v2"), _as_double(F.col("embedding")).alias("e2")
    ).withColumn("n2", _norm(F.col("e2")))
    return (
        a.join(b, F.col("v1") < F.col("v2"))
        .select(
            "v1",
            "v2",
            (_dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_neardup_sql(threshold: float = 0.4) -> str:
    cos = _cos_sql("a.e1", "b.e2")
    return f"""
    WITH a AS (SELECT vec_id AS v1, embedding::DOUBLE[] AS e1 FROM embeddings),
         b AS (SELECT vec_id AS v2, embedding::DOUBLE[] AS e2 FROM embeddings)
    SELECT v1, v2, {cos} AS cosine
    FROM a JOIN b ON v1 < v2
    WHERE {cos} >= {threshold}
    """


NEARDUP_BANDS = 16
NEARDUP_ROWS = 4  # hyperplanes per band -> 64 planes total
# Per-(band, bucket) candidate cap: 4-bit band keys give only 16
# buckets per band, so bucket population grows linearly with the corpus
# and candidate pairs grow QUADRATICALLY — the r6 sf1~ gate had to skip
# this query for exactly that reason. The cap bounds each bucket's
# contribution to C(cap, 2) pairs deterministically (first `cap`
# members by vec_id — both engines replay the same ROW_NUMBER), so the
# worst case is bands x 2^rows x C(cap, 2) candidates regardless of
# corpus size. 256 exceeds every bucket at the test SFs (max 205 at
# sf0.1), so results there are identical to the uncapped pipeline;
# truncation engages at sf1~ and beyond. NOT silent: truncated buckets
# are reported by neardup_truncation_stats (SCALE.md "no silent caps").
NEARDUP_BUCKET_CAP = 256


def cosine_neardup_lsh(
    embeddings: DataFrame, threshold: float = 0.4
) -> DataFrame:
    """Near-duplicate pairs via banded random-hyperplane LSH — the scale
    path, and the registered plan shape (VERDICT r4: the all-pairs theta
    join above must not be the registry entry).

    Pipeline (same candidate-then-verify shape as dedup_minhash_lsh):
    1. sign-hash every vector against 64 deterministic ±1 hyperplanes,
       grouped into 16 bands x 4 bits;
    2. candidates = pairs agreeing on at least one full band — an
       EQUI-join on (band, band_key), the shuffle key at scale; no
       v1<v2 cross product ever forms;
    3. exact cosine verification >= threshold on candidates only.

    Probabilistic recall vs the exact all-pairs baseline: a pair at
    cosine c agrees with one plane w.p. 1 - arccos(c)/pi, so at the
    isotropic fixture corpus's c~0.42 expected recall is ~0.94 (pinned
    in tests); at realistic near-dup thresholds (c >= 0.9) recall is
    ~1.0. Every step is deterministic, so the DuckDB oracle replays the
    identical pipeline and the gate check stays exact.

    Scale bound: candidates per bucket are capped at
    ``NEARDUP_BUCKET_CAP`` members (deterministic vec_id order, same
    ROW_NUMBER in the oracle), so total candidates are bounded by
    ``bands x 2^rows x C(cap, 2)`` at ANY corpus size — the price is
    recall loss on corpora dense enough to truncate (report with
    ``neardup_truncation_stats``; envelope in SCALE.md). The designed
    100 TB path at real near-dup thresholds is ``cosine_neardup_wide``
    (wider band keys shard the corpus instead of capping it).
    Output: ``(v1, v2, cosine)`` — subset of ``cosine_neardup``.
    """
    from pyspark.sql import Window

    def build_bands(emb: DataFrame) -> DataFrame:
        b = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        return b.select(
            "vec_id",
            F.explode(_band_structs("v", NEARDUP_BANDS, NEARDUP_ROWS)).alias("bk"),
        ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))

    # band signatures + norms are the corpus INDEX (ingest-time; see
    # _lsh_band_index) — cached per (session, corpus)
    bands = _INDEX_CACHE.get_or_persist(embeddings, "neardup_bands", build_bands)
    cap_w = Window.partitionBy("band", "bkey").orderBy("vec_id")
    bands = (
        bands.withColumn("rn", F.row_number().over(cap_w))
        .filter(F.col("rn") <= NEARDUP_BUCKET_CAP)
        .drop("rn")
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), on=["band", "bkey"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("v1"), F.col("b.vec_id").alias("v2"))
        .dropDuplicates(["v1", "v2"])
    )
    norms = _norms_index(embeddings)
    e1 = norms.select(
        F.col("vec_id").alias("v1"), F.col("v").alias("e1"), F.col("nv").alias("n1")
    )
    e2 = norms.select(
        F.col("vec_id").alias("v2"), F.col("v").alias("e2"), F.col("nv").alias("n2")
    )
    return (
        cand.join(e1, "v1")
        .join(e2, "v2")
        .select(
            "v1",
            "v2",
            (_dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_neardup_lsh_sql(threshold: float = 0.4) -> str:
    """Oracle: the identical deterministic banding (and per-bucket cap)
    replayed in DuckDB."""
    bands_sql = _band_sql_rows(NEARDUP_BANDS, NEARDUP_ROWS)
    cos = _cos_sql("e1.v", "e2.v")
    return f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bands AS ({bands_sql}),
    capped AS (
      SELECT vec_id, band, bkey FROM (
        SELECT vec_id, band, bkey,
               ROW_NUMBER() OVER (PARTITION BY band, bkey ORDER BY vec_id) AS rn
        FROM bands
      ) WHERE rn <= {NEARDUP_BUCKET_CAP}
    ),
    cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
             FROM capped a JOIN capped b
             ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id)
    SELECT v1, v2, {cos} AS cosine
    FROM cand JOIN base e1 ON cand.v1 = e1.vec_id
              JOIN base e2 ON cand.v2 = e2.vec_id
    WHERE {cos} >= {threshold}
    """


def neardup_truncation_stats(embeddings: DataFrame) -> DataFrame:
    """The cap's visibility hook (the "no silent caps" rule): one row
    per band bucket whose population exceeds ``NEARDUP_BUCKET_CAP``,
    with the members the cap discarded. Empty means
    ``cosine_neardup_lsh`` ran with NO truncation — identical to the
    uncapped pipeline. Callers gating at a new corpus size should check
    this once at ingest and either accept the recall envelope (SCALE.md)
    or move to ``cosine_neardup_wide``."""
    bands = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    ).select(
        "vec_id",
        F.explode(_band_structs("v", NEARDUP_BANDS, NEARDUP_ROWS)).alias("bk"),
    ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    return (
        bands.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("population"))
        .filter(F.col("population") > NEARDUP_BUCKET_CAP)
        .withColumn("kept", F.lit(NEARDUP_BUCKET_CAP))
        .withColumn("discarded", F.col("population") - NEARDUP_BUCKET_CAP)
    )


# Wide-band variant: the 100 TB near-dup path. 16-bit band keys give
# 65,536 buckets per band, so bucket population stays ~n/65k and the
# candidate set stays near-linear without any cap — the corpus is
# SHARDED by signature instead of truncated. The cost is recall at low
# cosine: P(band match) = (1 - arccos(c)/pi)^16, so this variant is for
# REAL near-duplicates (c >= 0.95 -> ~96% recall with 16 bands;
# c >= 0.98 -> ~99.6%; at c = 0.9 recall falls to ~75% — use more bands
# or the capped variant if the boundary matters). Plane pool is shared
# with the 4-bit variant (same deterministic md5 coefficients).
NEARDUP_WIDE_BANDS = 16
NEARDUP_WIDE_ROWS = 16  # 16-bit keys -> 65,536 buckets/band


def cosine_neardup_wide(
    embeddings: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Near-duplicate pairs via WIDE banded random-hyperplane LSH — the
    scale path for true near-dup thresholds (see band-width note above).

    Identical candidate-then-verify shape as ``cosine_neardup_lsh`` but
    with 16-bit band keys: at 10^9 vectors each of the 65k buckets per
    band holds ~15k vectors — still quadratic per bucket at that
    extreme, at which point add rows per band (20-24 bits); the
    structure is the standard SimHash regime and every step stays
    deterministic, so the DuckDB twin replays it exactly.
    Output: ``(v1, v2, cosine)``.
    """
    def build_bands(emb: DataFrame) -> DataFrame:
        b = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        return b.select(
            "vec_id",
            F.explode(
                _band_structs("v", NEARDUP_WIDE_BANDS, NEARDUP_WIDE_ROWS)
            ).alias("bk"),
        ).select(
            "vec_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
        )

    bands = _INDEX_CACHE.get_or_persist(embeddings, "neardup_wide_bands", build_bands)
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), on=["band", "bkey"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("v1"), F.col("b.vec_id").alias("v2"))
        .dropDuplicates(["v1", "v2"])
    )
    norms = _norms_index(embeddings)
    e1 = norms.select(
        F.col("vec_id").alias("v1"), F.col("v").alias("e1"), F.col("nv").alias("n1")
    )
    e2 = norms.select(
        F.col("vec_id").alias("v2"), F.col("v").alias("e2"), F.col("nv").alias("n2")
    )
    return (
        cand.join(e1, "v1")
        .join(e2, "v2")
        .select(
            "v1",
            "v2",
            (_dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_neardup_wide_sql(threshold: float = 0.9) -> str:
    """Oracle: the wide banding replayed in DuckDB."""
    bands_sql = _band_sql_rows(NEARDUP_WIDE_BANDS, NEARDUP_WIDE_ROWS)
    cos = _cos_sql("e1.v", "e2.v")
    return f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bands AS ({bands_sql}),
    cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
             FROM bands a JOIN bands b
             ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id)
    SELECT v1, v2, {cos} AS cosine
    FROM cand JOIN base e1 ON cand.v1 = e1.vec_id
              JOIN base e2 ON cand.v2 = e2.vec_id
    WHERE {cos} >= {threshold}
    """


def _neardup_planes() -> list[list[float]]:
    return [
        [_plane_coeff(j, d) for d in range(DIM)]
        for j in range(NEARDUP_BANDS * NEARDUP_ROWS)
    ]


def _plane_coeff(j: int, d: int) -> float:
    """Deterministic ±1 hyperplane coefficients, md5-mixed.

    History: round <=4 used the low bit of a Knuth multiplicative hash,
    which reduces to the PARITY of ``j*DIM+d+1`` — every plane was the
    SAME plane (+1 even dims, -1 odd), collapsing every LSH bucket
    structure built on it to 2 effective buckets. md5 gives independent,
    balanced signs (and the oracle replays coefficients as literals, so
    nothing engine-side depends on the derivation being SQL-expressible).
    """
    return 1.0 if _md5_byte(f"plane:{j}:{d}") & 1 else -1.0


def _md5_byte(s: str) -> int:
    import hashlib

    return hashlib.md5(s.encode()).digest()[0]


LSH_TOPK_BANDS = 16
LSH_TOPK_ROWS = 4  # same 16x4 banding over the 64-plane pool as neardup


def _dot_plane_sql(vec_col: str, plane: list[float]) -> str:
    """SQL text of the same sequential-fold dot product ``_dot`` builds
    (ArrayAggregate over zip_with — identical expression tree after
    parsing, so the sign decisions are bit-identical)."""
    arr = "array(" + ", ".join(f"{c}D" for c in plane) + ")"
    return (
        f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _band_structs(vec_col: str, n_bands: int, rows_per_band: int) -> Column:
    """Array of (band, band_key) structs from the shared md5 plane pool:
    band b's key packs the sign bits of planes [b*r, (b+1)*r). Built as
    ONE parsed expression: constructing 64 plane arrays element-by-
    element over py4j cost ~0.5 s of plan construction per fresh query."""
    structs = []
    for b in range(n_bands):
        bits = " + ".join(
            f"(CASE WHEN {_dot_plane_sql(vec_col, [_plane_coeff(b * rows_per_band + i, d) for d in range(DIM)])} > 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i in range(rows_per_band)
        )
        structs.append(f"named_struct('band', {b}, 'bkey', {bits})")
    return F.expr("array(" + ", ".join(structs) + ")")


def _band_sql_rows(n_bands: int, rows_per_band: int, src: str = "base") -> str:
    """UNION ALL of per-band bucket selects replaying ``_band_structs``."""
    rows = []
    for b in range(n_bands):
        terms = []
        for i in range(rows_per_band):
            plane = [_plane_coeff(b * rows_per_band + i, d) for d in range(DIM)]
            arr = "[" + ", ".join(str(c) for c in plane) + "]::DOUBLE[]"
            terms.append(
                f"(CASE WHEN {DOT_SQL.format(a='v', b=arr)} > 0 THEN {1 << i} ELSE 0 END)"
            )
        rows.append(f"SELECT vec_id, {b} AS band, {' + '.join(terms)} AS bkey FROM {src}")
    return " UNION ALL ".join(rows)


def _lsh_band_index(embeddings: DataFrame) -> DataFrame:
    """The banded-signature INDEX ``(vec_id, band, bkey)`` — the
    corpus-wide structure a deployment materializes at ingest (each row
    costs ``bands x rows_per_band`` 64-dim plane dots; recomputing it
    per request dwarfs the actual search). Built once per (session,
    corpus) through the shared PlanCache; search stays per-request."""
    def build(emb: DataFrame) -> DataFrame:
        base = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        return base.select(
            "vec_id",
            F.explode(_band_structs("v", LSH_TOPK_BANDS, LSH_TOPK_ROWS)).alias("bk"),
        ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))

    return _INDEX_CACHE.get_or_persist(embeddings, "lsh_bands", build)


def _norms_index(embeddings: DataFrame) -> DataFrame:
    """Corpus table with precomputed L2 norms ``(vec_id, v, nv)`` —
    ingest-time work shared by every similarity search."""
    def build(emb: DataFrame) -> DataFrame:
        base = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        return base.withColumn("nv", _norm(F.col("v")))

    return _INDEX_CACHE.get_or_persist(embeddings, "norms", build)


def ann_lsh_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5) -> DataFrame:
    """Approximate top-k via BANDED random-hyperplane LSH: a query's
    candidates are vectors agreeing with it on at least one of 16
    4-bit bands (multi-probe by banding); exact cosine ranks the
    candidate set. The band equi-join is the shuffle key — candidate
    cost per query is ~bands*N/2^bits, tuned by the two knobs.

    Measured on the isotropic fixture corpus at sf0.01 (band sweep):
    8x8 -> recall 0.11 @ 3.7% of corpus probed; 8x6 -> 0.34 @ 13%;
    16x4 -> 0.93 @ 65% (chosen: meets the same >=0.9 contract as IVF
    nprobe=8, which also probes ~half this corpus — isotropic data is
    the worst case for ANY partition-based ANN, see ann_ivf_topk).
    Clustered real corpora reach the contract at far smaller fractions.

    (Round <=4 hashed to ONE 16-bit bucket, which only worked because
    the degenerate parity planes collapsed it to 2 giant buckets; with
    real planes a single fine bucket isolates every vector.)
    Output: ``(q_id, vec_id, cosine, rank)`` (subset of brute force).
    """
    from pyspark.sql import Window

    base = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    bands = _lsh_band_index(embeddings)
    qb = bands.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), "band", "bkey"
    )
    cand = (
        F.broadcast(qb)
        .join(bands, on=["band", "bkey"])
        .where(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id")
        .dropDuplicates(["q_id", "vec_id"])
    )
    qv = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    ).withColumn("nq", _norm(F.col("qv")))
    cv = _norms_index(embeddings)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        cand.join(F.broadcast(qv), "q_id")
        .join(cv, "vec_id")
        .select(
            "q_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cosine", "rank")
    )


def ann_lsh_topk_sql(n_queries: int = 20, k: int = 5) -> str:
    bands_sql = _band_sql_rows(LSH_TOPK_BANDS, LSH_TOPK_ROWS)
    cos = _cos_sql("qv.v", "cv.v")
    return f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bands AS ({bands_sql}),
    cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id
             FROM bands q JOIN bands c ON q.band = c.band AND q.bkey = c.bkey
             WHERE q.vec_id < {n_queries} AND q.vec_id <> c.vec_id)
    SELECT q_id, vec_id, cosine, rank FROM (
      SELECT cand.q_id, cand.vec_id, {cos} AS cosine,
             ROW_NUMBER() OVER (PARTITION BY cand.q_id
                                ORDER BY {cos} DESC, cand.vec_id) AS rank
      FROM cand JOIN base qv ON cand.q_id = qv.vec_id
                JOIN base cv ON cand.vec_id = cv.vec_id
    ) WHERE rank <= {k}
    """


def cosine_topk_pandas(embeddings: DataFrame, n_queries: int = 20, k: int = 5) -> DataFrame:
    """Arrow-vectorized brute force: numpy matmul per partition via
    mapInPandas (the raw-throughput variant; summation order differs
    from the fold, so no value oracle — row-count check only)."""
    import pandas as pd  # noqa: F401

    spark = embeddings.sparkSession
    q_rows = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    import numpy as np

    q_ids = np.array([r["vec_id"] for r in q_rows])
    Q = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((q_ids, Qn))

    def compute(batches):
        import numpy as np
        import pandas as pd

        q_ids_b, Qn_b = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf["embedding"].values).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            S = Qn_b @ Mn.T  # (q, batch)
            n_q, n_m = S.shape
            out = pd.DataFrame(
                {
                    "q_id": np.repeat(q_ids_b, n_m),
                    "vec_id": np.tile(pdf["vec_id"].values, n_q),
                    "cosine": S.ravel(),
                }
            )
            yield out[out.q_id != out.vec_id]

    from pyspark.sql import Window

    scores = embeddings.select("vec_id", "embedding").mapInPandas(
        compute, "q_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scores.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk_pandas_ranks(
    embeddings: DataFrame, n_queries: int = 20, k: int = 5
) -> DataFrame:
    """The REGISTERED face of the Arrow kernel (r9 verdict #8): project
    the rank list only. numpy's matmul accumulates in a different order
    than the SQL fold, so the raw cosine DOUBLEs are not value-hashable
    — but the induced RANKING is (ties break on vec_id; the fixture
    corpus has no cosine ties within 1e-12, pinned in
    tests/test_llm_ops.py), which gives the kernel a full DuckDB oracle
    instead of a rows-only check."""
    return cosine_topk_pandas(embeddings, n_queries, k).select(
        "q_id", "vec_id", F.col("rank").cast("bigint").alias("rank")
    )


def cosine_topk_pandas_ranks_sql(n_queries: int = 20, k: int = 5) -> str:
    """Rank-only oracle: the exact fold cosine's ranking (matmul and
    fold agree on order wherever no near-tie exists)."""
    cos = _cos_sql("q.qv", "c.cv")
    return f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv FROM base WHERE vec_id < {n_queries}),
    c AS (SELECT vec_id, v AS cv FROM base)
    SELECT q_id, vec_id, rank FROM (
      SELECT q.q_id, c.vec_id,
             CAST(ROW_NUMBER() OVER (
                 PARTITION BY q.q_id ORDER BY {cos} DESC, c.vec_id
             ) AS BIGINT) AS rank
      FROM q CROSS JOIN c WHERE q.q_id <> c.vec_id
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> per-cell inverted lists.
# ---------------------------------------------------------------------------

N_CELLS = 16


# (applicationId, semanticHash) -> centroid list. The 16-row collect
# that reads the quantizer is a full Spark job (~0.1 s of scheduling +
# scan at any SF); per-request rebuilds of the SAME corpus quantizer
# were pure overhead on the ann_ivf serving path. Plain values (no
# persist to release), bounded like the PlanCache. applicationId is
# stable per SparkContext and never GC-reused (id(session) could be);
# like every index cache here, replacing the corpus IN PLACE (same
# plan, new files) requires clear_similarity_index_cache() — the
# semantic hash keys the query, not the data (plan_cache.py module doc).
import threading as _threading
from collections import OrderedDict as _OrderedDict

_CENTROID_CACHE: _OrderedDict[tuple, list] = _OrderedDict()
_CENTROID_CACHE_MAX = 8
_CENTROID_CACHE_LOCK = _threading.Lock()


def _centroids(
    embeddings: DataFrame, n_cells: int = N_CELLS
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: the first ``n_cells`` vectors by
    vec_id act as centroids (k-means would converge better but needs
    iteration; a fixed quantizer keeps the pipeline one-pass and lets
    the oracle replay it exactly). Collected once per (session, corpus,
    n_cells). ``n_cells`` defaults to the fixture N_CELLS; at-scale
    gates pass k ~ N/1e3 to honor the SemDeDup cell-population
    envelope (SCALE.md)."""
    try:
        key = (
            _session_token(embeddings),
            embeddings._jdf.queryExecution().analyzed().semanticHash(),
            n_cells,
        )
    except Exception:
        key = None
    if key is not None:
        with _CENTROID_CACHE_LOCK:
            cached = _CENTROID_CACHE.get(key)
            if cached is not None:
                _CENTROID_CACHE.move_to_end(key)
                return cached
    rows = (
        embeddings.filter(F.col("vec_id") < n_cells)
        .select("vec_id", "embedding")
        .collect()
    )
    cents = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in sorted(rows)]
    if key is not None:
        with _CENTROID_CACHE_LOCK:
            while len(_CENTROID_CACHE) >= _CENTROID_CACHE_MAX:
                _CENTROID_CACHE.popitem(last=False)
            _CENTROID_CACHE[key] = cents
    return cents


def _cell_scores(vec_sql: str, cents: list[tuple[int, list[float]]]) -> Column:
    """Array of (cosine, -cid) structs, one per centroid. array_max /
    sort over these implements argmax with ties toward the smaller id —
    a chained when/otherwise argmax would duplicate the running-best
    expression per centroid and blow the expression tree up
    exponentially. Built as ONE parsed expression (the _band_structs
    lesson): element-by-element py4j construction of N_CELLS x DIM
    literals cost ~0.3 s of plan-build per request; the parsed tree is
    identical (same fold shape, literals round-trip via repr+D), so
    results are bit-equal."""
    import math

    vnorm = (
        f"sqrt(aggregate(zip_with({vec_sql}, {vec_sql}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
    )
    entries = []
    for cid, vec in cents:
        # centroid norm precomputed driver-side with a plain left-to-right
        # sum — the same sequential fold the SQL oracle evaluates
        acc = 0.0
        for x in vec:
            acc += x * x
        cnorm = math.sqrt(acc)
        dot = _dot_plane_sql(vec_sql, vec)
        entries.append(
            f"named_struct('c', ({dot}) / (({vnorm}) * {cnorm!r}D), 'nid', {-cid})"
        )
    return F.expr("array(" + ", ".join(entries) + ")")


def _cell_assign(vec_sql: str, cents: list[tuple[int, list[float]]]) -> Column:
    """argmax-cosine centroid id, ties broken toward the smaller id."""
    best = F.array_max(_cell_scores(vec_sql, cents))
    return (-best["nid"]).cast("int")


def _cell_topn(vec_sql: str, cents: list[tuple[int, list[float]]], n: int) -> Column:
    """Top-n nearest centroid ids (multi-probe list for the query side)."""
    ranked = F.reverse(F.array_sort(_cell_scores(vec_sql, cents)))
    return F.transform(F.slice(ranked, 1, n), lambda s: (-s["nid"]).cast("int"))


NPROBE = 8


def _ivf_index(embeddings: DataFrame) -> DataFrame:
    """The inverted file ``(vec_id, v, nv, cell)`` — every corpus vector
    assigned to its nearest coarse centroid, with its norm. This is the
    INDEX a deployment builds at ingest (the assignment costs
    ``N_CELLS`` 64-dim dots per vector — more total work than serving a
    20-query request, so rebuilding it per request inverts the ANN
    economics; measured at sf1~: fresh build 5.7 s vs 2.3 s brute
    force). Built once per (session, corpus) via the shared PlanCache,
    exactly like the minhash shingle index (operators/dedup.py)."""
    def build(emb: DataFrame) -> DataFrame:
        cents = _centroids(emb)
        base = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        return base.withColumn("cell", _cell_assign("v", cents)).withColumn(
            "nv", _norm(F.col("v"))
        )

    return _INDEX_CACHE.get_or_persist(embeddings, "ivf", build)


def ann_ivf_topk(
    embeddings: DataFrame, n_queries: int = 20, k: int = 5, nprobe: int = NPROBE
) -> DataFrame:
    """IVF ANN: assign every vector to its nearest coarse centroid
    (the inverted file); search a query within its ``nprobe`` nearest
    cells (multi-probe — the standard recall/cost knob). One equi-join
    on cell id — the shuffle key at scale; probed cells are disjoint so
    no dedup is needed.

    Recall calibration on the synthetic corpus (measured, and asserted
    >= 0.9 in tests/test_llm_ops.py): nprobe 1 -> 0.78, 2 -> 0.81,
    4 -> 0.85, 8 -> 0.93. The curve is flat because the synthetic
    embeddings are ISOTROPIC (near-uniform on the sphere): true
    neighbors correlate only weakly with any partition, so every ANN
    index degrades toward scanning — deterministic Lloyd refinement was
    prototyped and made recall WORSE (balanced cells split neighbor
    pairs). Real embedding corpora are strongly clustered; there the
    same index reaches 0.9+ at nprobe 1-2. Default nprobe=8 buys the
    0.9 contract at ~half the corpus scanned — still the bucketed join
    shape that scales, with the knob exposed to the caller.
    Output: ``(q_id, vec_id, cosine, rank)``.
    """
    from pyspark.sql import Window

    cents = _centroids(embeddings)
    base = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    with_cell = _ivf_index(embeddings)
    q = (
        base.filter(F.col("vec_id") < n_queries)
        .withColumn("nq", _norm(F.col("v")))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            "nq",
            F.explode(_cell_topn("v", cents, nprobe)).alias("cell"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        F.broadcast(q)
        .join(with_cell, "cell")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_ivf_topk_sql(n_queries: int = 20, k: int = 5, nprobe: int = NPROBE) -> str:
    """Oracle: same fixed quantizer (first N_CELLS vectors), argmax cell
    assignment via ranked cross join with the centroid set; queries probe
    their ``nprobe`` best cells."""
    cos = _cos_sql("b.v", "c.cv")
    qcos = _cos_sql("q.qv", "w2.v")
    return f"""
    WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                   FROM embeddings WHERE vec_id < {N_CELLS}),
    base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT b.vec_id, b.v, c.cid, {cos} AS ccos,
             ROW_NUMBER() OVER (PARTITION BY b.vec_id
                                ORDER BY {cos} DESC, c.cid) AS rn
      FROM base b CROSS JOIN cents c
    ),
    with_cell AS (SELECT vec_id, v, cid AS cell FROM scored WHERE rn = 1),
    q AS (SELECT vec_id AS q_id, v AS qv, cid AS cell FROM scored
          WHERE vec_id < {n_queries} AND rn <= {nprobe})
    SELECT q_id, vec_id, cosine, rank FROM (
      SELECT q.q_id, w2.vec_id, {qcos} AS cosine,
             ROW_NUMBER() OVER (PARTITION BY q.q_id
                                ORDER BY {qcos} DESC, w2.vec_id) AS rank
      FROM q JOIN with_cell w2 USING (cell) WHERE q.q_id <> w2.vec_id
    ) WHERE rank <= {k}
    """


def probe_ivf_index(
    spark, sf_dir: str, idx: DataFrame, n_queries: int, k: int, nprobe: int
) -> DataFrame:
    """The ONE inverted-file probe every durable-IVF face shares
    (disk / batch-append / stream-append serve): broadcast the query
    vectors exploded over their nprobe nearest cells, Dynamic-
    Partition-Prune the ``cell=…`` directories to exactly those
    cells, score with an exact cosine, window to top-k. ``idx`` is the
    attached cell-partitioned index ``(vec_id, v, nv, cell)``."""
    from pyspark.sql import Window

    from mmw_geoprocessing_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(emb)
    q = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", _as_double(F.col("embedding")).alias("v"))
        .withColumn("nq", _norm(F.col("v")))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            "nq",
            F.explode(_cell_topn("v", cents, nprobe)).alias("cell"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        F.broadcast(q)
        .join(idx, "cell")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))).alias(
                "cosine"
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_ivf_disk_topk(
    spark, sf_dir: str, n_queries: int = 20, k: int = 5, nprobe: int = NPROBE
) -> DataFrame:
    """``ann_ivf_topk`` served from the DURABLE on-disk inverted file
    (r10 verdict #2). At ingest the index ``(vec_id, v, nv, cell)`` is
    written ONCE as parquet PARTITIONED BY cell — the IVF list layout:
    one directory per coarse cell — beside a tiny centroids sibling;
    a fresh session re-reads it with no rebuild (the 5.7 s sf1~ index
    build moves to ingest permanently, not per process).

    Probing is Spark-native Dynamic Partition Pruning: the broadcast
    query side carries the ``nprobe`` probed cells, and the scan of
    the partitioned index plans a ``dynamicpruning`` partition filter
    — only the probed cells' directories are READ (the IVF contract:
    probe cost ∝ nprobe/n_cells of the corpus, now enforced by the
    storage layout instead of a join that still scanned everything).
    Results identical to ``ann_ivf_topk`` -> same DuckDB oracle."""
    from pyspark.sql import Window

    from mmw_geoprocessing_spark.sources.index_store import (
        corpus_fingerprint,
        get_or_build_index,
    )
    from mmw_geoprocessing_spark.sources.tables import load_table

    fp = corpus_fingerprint(sf_dir, "embeddings")

    def _build_ivf() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        cents = _centroids(emb)
        base = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        return base.withColumn("cell", _cell_assign("v", cents)).withColumn(
            "nv", _norm(F.col("v"))
        )

    idx = get_or_build_index(
        spark, "ivf_lists", fp, _build_ivf, partition_col="cell"
    ).select("vec_id", "v", "nv", "cell")

    return probe_ivf_index(spark, sf_dir, idx, n_queries, k, nprobe)


def ann_ivf_disk_topk_sql(
    n_queries: int = 20, k: int = 5, nprobe: int = NPROBE
) -> str:
    """Identical results -> the same oracle as the session-cached plan."""
    return ann_ivf_topk_sql(n_queries=n_queries, k=k, nprobe=nprobe)


#: deterministic "new embedding drop" slice for the incremental-ingest
#: row (the bm25 append row's convention, operators/search.py)
IVF_APPEND_MOD, IVF_APPEND_REM = 10, 3


def ann_ivf_append_topk(
    spark, sf_dir: str, n_queries: int = 20, k: int = 5, nprobe: int = NPROBE
) -> DataFrame:
    """The INCREMENTAL-INGEST face of the durable IVF index (r11
    verdict #2: the inverted file was build-once while a crawl pipeline
    appends embeddings per drop exactly like postings). The standing
    corpus (``vec_id % 10 != 3``) was assigned to its cells at its own
    ingest; today's drop (``vec_id % 10 = 3``) is assigned against the
    SAME frozen coarse quantizer (the first ``N_CELLS`` corpus vectors
    — a deployment freezes its quantizer when the index is created;
    re-clustering would move every stored vector) and APPENDED into the
    cell-partitioned inverted file via the index store's journaled
    exactly-once commit: one extra parquet file under each touched
    ``cell=…`` directory, unseen cells becoming new directories.
    Ingest cost ∝ the DROP (its ``N_CELLS`` assignment dots), zero
    corpus rework.

    Serving is byte-for-byte ``ann_ivf_disk_topk`` over the combined
    lists — the probe still Dynamic-Partition-Prunes to the nprobe
    cells' directories across base + appended files — and the frozen
    quantizer makes base ∪ drop IDENTICAL to the full-corpus build, so
    the same DuckDB oracle hash-gates the whole lifecycle."""
    from pyspark.sql import Window

    from mmw_geoprocessing_spark.sources.index_store import (
        append_once,
        corpus_fingerprint,
        get_or_build_index,
    )
    from mmw_geoprocessing_spark.sources.tables import load_table

    fp = corpus_fingerprint(sf_dir, "embeddings")
    is_drop = (F.col("vec_id") % IVF_APPEND_MOD) == IVF_APPEND_REM

    def _assigned(drop_side: bool) -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        cents = _centroids(emb)  # full-corpus quantizer, frozen at ingest
        base = emb.filter(is_drop if drop_side else ~is_drop).select(
            "vec_id", _as_double(F.col("embedding")).alias("v")
        )
        return base.withColumn("cell", _cell_assign("v", cents)).withColumn(
            "nv", _norm(F.col("v"))
        )

    # base-corpus ingest (its own, earlier, drop)
    get_or_build_index(
        spark, "ivf_lists_inc", fp, lambda: _assigned(False), partition_col="cell"
    )
    # today's drop: exactly-once journaled append into the cell layout
    append_once(
        spark, "ivf_lists_inc", fp, "drop1", lambda: _assigned(True),
        partition_col="cell",
    )
    idx = get_or_build_index(
        spark, "ivf_lists_inc", fp,
        lambda: (_ for _ in ()).throw(AssertionError("built above")),
        partition_col="cell",
    ).select("vec_id", "v", "nv", "cell")

    return probe_ivf_index(spark, sf_dir, idx, n_queries, k, nprobe)


def ann_ivf_append_topk_sql(
    n_queries: int = 20, k: int = 5, nprobe: int = NPROBE
) -> str:
    """base ∪ appended drop == the full inverted file (frozen quantizer)
    -> the same oracle."""
    return ann_ivf_topk_sql(n_queries=n_queries, k=k, nprobe=nprobe)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication: coarse-cluster the embedding
# space, then near-dup only WITHIN a cell (Abbas et al. 2023,
# "SemDeDup" — cluster-then-pair is what makes embedding dedup
# tractable at corpus scale).
# ---------------------------------------------------------------------------


def _sem_index(embeddings: DataFrame, n_cells: int | None) -> DataFrame:
    """The ONE cell assignment the whole semantic-dedup family shares:
    default-``N_CELLS`` IVF index, or a scale-appropriate quantizer
    (k ~ N/1e3) cached under its own tag. pairs / keep / components
    must all derive from the same call so survivors come from the same
    cell structure that built the pairs (round-8 ADVICE)."""
    if n_cells is None:
        return _ivf_index(embeddings)

    def build(emb: DataFrame, _n: int = n_cells) -> DataFrame:
        cents = _centroids(emb, n_cells=_n)
        base = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        return base.withColumn("cell", _cell_assign("v", cents)).withColumn(
            "nv", _norm(F.col("v"))
        )

    return _INDEX_CACHE.get_or_persist(embeddings, f"ivf_{n_cells}", build)


def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    cell_cap: int | None = None,
    n_cells: int | None = None,
) -> DataFrame:
    """Semantic near-duplicate pairs: cosine >= ``threshold`` between
    vectors assigned to the SAME coarse cell. Output: ``(v1, v2, cell,
    cosine)`` with ``v1 < v2``.

    The cell structure is the shared IVF index (``_ivf_index``: the
    deterministic first-``N_CELLS``-vectors quantizer, cached per
    (session, corpus)) — the oracle replays the assignment exactly. In
    production the quantizer is k-means-refined (``clustering.kmeans_fit``)
    and k scales with corpus size to bound cell populations; the
    algorithm is unchanged.

    100 TB shape: pairing is ONE equi-join of the persisted index with
    itself on the cell id — never all-pairs across cells; within-cell
    pairs are quadratic in CELL population (the SemDeDup contract: pick
    k so cells hold ~1e3-1e5 vectors; AQE skew-join splits hot cells).
    ``cell_cap`` bounds the worst case like NEARDUP_BUCKET_CAP does for
    the banded path: only the first ``cell_cap`` members of a cell by
    vec_id participate (deterministic ROW_NUMBER, replayed in the
    oracle) — a documented subset, not a silent one (cap stats via
    ``neardup_truncation_stats``-style inspection of the index).
    """
    from pyspark.sql import Window

    idx = _sem_index(embeddings, n_cells)
    if cell_cap is not None:
        w = Window.partitionBy("cell").orderBy("vec_id")
        idx = (
            idx.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cell_cap)
            .drop("_rn")
        )
    a = idx.select(
        F.col("vec_id").alias("v1"),
        F.col("v").alias("e1"),
        F.col("nv").alias("n1"),
        "cell",
    )
    b = idx.select(
        F.col("vec_id").alias("v2"),
        F.col("v").alias("e2"),
        F.col("nv").alias("n2"),
        "cell",
    )
    cos = _dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))
    return (
        a.join(b, "cell")
        .filter(F.col("v1") < F.col("v2"))
        .select("v1", "v2", "cell", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup_pairs_sql(
    threshold: float = 0.4, cell_cap: int | None = None, n_cells: int | None = None
) -> str:
    """DuckDB twin: same first-``n_cells`` quantizer (default N_CELLS),
    same argmax-cosine assignment (ties toward the smaller cell id),
    same sequential-fold cosine between co-cell pairs."""
    ccos = _cos_sql("b.v", "c.cv")
    pcos = f"({DOT_SQL.format(a='x.v', b='y.v')}) / (x.nv * y.nv)"
    cap_filter = "" if cell_cap is None else f"WHERE pos <= {cell_cap}"
    k = N_CELLS if n_cells is None else n_cells
    return f"""
    WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                   FROM embeddings WHERE vec_id < {k}),
    base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT b.vec_id, b.v, c.cid,
             ROW_NUMBER() OVER (PARTITION BY b.vec_id
                                ORDER BY {ccos} DESC, c.cid) AS rn
      FROM base b CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, v, cid AS cell,
             sqrt({DOT_SQL.format(a="v", b="v")}) AS nv,
             ROW_NUMBER() OVER (PARTITION BY cid ORDER BY vec_id) AS pos
      FROM scored WHERE rn = 1
    ),
    capped AS (SELECT vec_id, v, cell, nv FROM assigned {cap_filter})
    SELECT x.vec_id AS v1, y.vec_id AS v2, x.cell AS cell, {pcos} AS cosine
    FROM capped x JOIN capped y
      ON x.cell = y.cell AND x.vec_id < y.vec_id
    WHERE {pcos} >= {threshold!r}
    """


def semantic_dedup_keep(
    embeddings: DataFrame,
    threshold: float = 0.4,
    cell_cap: int | None = None,
    n_cells: int | None = None,
) -> DataFrame:
    """Survivor set under the repo's one-level drop rule (the
    ``neardup_drop_ids`` convention): drop the HIGHER id of every
    semantic pair, keep everything else. Output: ``(vec_id, cell)``.
    One anti-join against the (small) drop set — fully declarative, no
    iteration. ``n_cells`` selects the scale-appropriate quantizer and
    is threaded to BOTH the pair generation and the survivor base via
    ``_sem_index``, so survivors always come from the exact cell
    assignment that produced the pairs."""
    drops = semantic_dedup_pairs(embeddings, threshold, cell_cap, n_cells).select(
        F.col("v2").alias("vec_id")
    )
    return (
        _sem_index(embeddings, n_cells)
        .join(drops, "vec_id", "left_anti")
        .select("vec_id", "cell")
    )


# ---------------------------------------------------------------------------
# int8 embedding quantization (symmetric, per-vector scale) + quantized
# IVF search — the bandwidth/memory scale path: a 100 TB float32
# embedding corpus becomes ~25 TB as int8 with one scale per vector,
# and candidate scoring inside cells runs on EXACT integer arithmetic
# (dot and squared norms are BIGINT sums of int products), so ranking
# is bit-reproducible across engines with no float-summation caveats.
# ---------------------------------------------------------------------------


def _qdot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two int arrays (BIGINT fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


QDOT_SQL = (
    "list_reduce(list_apply(list_zip({a}, {b}), "
    "t -> CAST(t[1] AS BIGINT) * t[2]), (x, y) -> x + y)"
)


def _quantized_index(embeddings: DataFrame) -> DataFrame:
    """int8-quantized inverted file ``(vec_id, cell, scale, qv, qn2)``:
    per-vector symmetric quantization ``q_i = round(v_i * 127/amax)``
    (amax = largest |component|; zero vectors get scale 0 and an
    all-zero code), carried on the SAME cells as the float IVF index so
    the two indexes serve the same probe plan. ``qn2`` is the exact
    integer squared norm. Built once per (session, corpus) like every
    index here. Determinism note: v_i (float32->double, exact), the
    scale division, the product, and round-half-away-from-zero are all
    IEEE-exact and identically defined in Spark (HALF_UP) and DuckDB —
    the quantized codes hash cross-engine."""

    def build(emb: DataFrame) -> DataFrame:
        idx = _ivf_index(emb)
        amax = F.array_max(F.transform(F.col("v"), F.abs))
        scaled = idx.withColumn(
            "scale",
            F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0)),
        )
        qv = F.transform(
            F.col("v"), lambda x: F.round(x * F.col("scale")).cast("int")
        )
        return (
            scaled.withColumn("qv", qv)
            .withColumn("qn2", _qdot(F.col("qv"), F.col("qv")))
            .select("vec_id", "cell", "scale", "qv", "qn2")
        )

    return _INDEX_CACHE.get_or_persist(embeddings, "ivf_q8", build)


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Registered projection of the quantized index: exact-integer
    diagnostics per vector — ``(vec_id, cell, scale, q_min, q_max,
    q_l1, q_norm2)``. The array code itself stays distributed (array
    columns don't value-hash portably across engines); these scalars
    pin the full quantization — any per-component divergence moves at
    least one of min/max/L1/norm2."""
    idx = _quantized_index(embeddings)
    return idx.select(
        "vec_id",
        "cell",
        "scale",
        F.array_min(F.col("qv")).alias("q_min"),
        F.array_max(F.col("qv")).alias("q_max"),
        F.aggregate(
            F.transform(F.col("qv"), lambda x: F.abs(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("q_l1"),
        F.col("qn2").alias("q_norm2"),
    )


def quantize_embeddings_sql() -> str:
    """DuckDB twin: same quantization over the same argmax-cosine cell
    assignment as the float IVF oracle."""
    cos = _cos_sql("b.v", "c.cv")
    return f"""
    WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                   FROM embeddings WHERE vec_id < {N_CELLS}),
    base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT b.vec_id, b.v, c.cid,
             ROW_NUMBER() OVER (PARTITION BY b.vec_id
                                ORDER BY {cos} DESC, c.cid) AS rn
      FROM base b CROSS JOIN cents c
    ),
    with_cell AS (SELECT vec_id, v, cid AS cell FROM scored WHERE rn = 1),
    scaled AS (
      SELECT vec_id, cell, v,
             CASE WHEN list_max(list_apply(v, x -> abs(x))) > 0
                  THEN 127.0 / list_max(list_apply(v, x -> abs(x)))
                  ELSE 0.0 END AS scale
      FROM with_cell
    ),
    quant AS (
      SELECT vec_id, cell, scale,
             list_apply(v, x -> CAST(round(x * scale) AS INT)) AS qv
      FROM scaled
    )
    SELECT vec_id, CAST(cell AS INT) AS cell, scale,
           CAST(list_min(qv) AS INT) AS q_min,
           CAST(list_max(qv) AS INT) AS q_max,
           CAST(list_reduce(list_apply(qv, x -> CAST(abs(x) AS BIGINT)),
                            (a, b) -> a + b) AS BIGINT) AS q_l1,
           CAST({QDOT_SQL.format(a="qv", b="qv")} AS BIGINT) AS q_norm2
    FROM quant
    """


def ann_ivf_q8_topk(
    embeddings: DataFrame, n_queries: int = 20, k: int = 5, nprobe: int = NPROBE
) -> DataFrame:
    """IVF top-k over the int8 index: the float index's probe plan
    (query -> nprobe nearest cells by true cosine against the
    centroids) with candidate scoring on quantized codes —
    ``qcosine = qdot / (sqrt(qn2_a) * sqrt(qn2_b))``, exact integers
    through the fold and IEEE sqrt/divide after, so ranking is
    bit-reproducible. Output: ``(q_id, vec_id, qcosine, rank)``.

    100 TB shape: identical join/shuffle plan to ``ann_ivf_topk`` (the
    knob doc there applies) but the shuffled per-vector payload drops
    ~4x (int8 codes vs float64 arrays) — at cluster scale the candidate
    join is bandwidth-bound, which is the point of quantization."""
    from pyspark.sql import Window

    cents = _centroids(embeddings)
    base = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    qidx = _quantized_index(embeddings)
    q = (
        base.filter(F.col("vec_id") < n_queries)
        .select(
            "vec_id",
            F.explode(_cell_topn("v", cents, nprobe)).alias("cell"),
        )
        .join(
            qidx.select(
                F.col("vec_id"),
                F.col("qv").alias("q_qv"),
                F.col("qn2").alias("q_qn2"),
            ),
            "vec_id",
        )
        .select(F.col("vec_id").alias("q_id"), "cell", "q_qv", "q_qn2")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("qcosine").desc(), F.col("vec_id"))
    qcos = _qdot(F.col("q_qv"), F.col("qv")) / (
        F.sqrt(F.col("q_qn2").cast("double")) * F.sqrt(F.col("qn2").cast("double"))
    )
    return (
        F.broadcast(q)
        .join(qidx, "cell")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", qcos.alias("qcosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_ivf_q8_topk_sql(n_queries: int = 20, k: int = 5, nprobe: int = NPROBE) -> str:
    cos = _cos_sql("b.v", "c.cv")
    qdot = QDOT_SQL.format(a="q.qv", b="w2.qv")
    qcos = f"({qdot}) / (sqrt(CAST(q.qn2 AS DOUBLE)) * sqrt(CAST(w2.qn2 AS DOUBLE)))"
    return f"""
    WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                   FROM embeddings WHERE vec_id < {N_CELLS}),
    base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT b.vec_id, b.v, c.cid,
             ROW_NUMBER() OVER (PARTITION BY b.vec_id
                                ORDER BY {cos} DESC, c.cid) AS rn
      FROM base b CROSS JOIN cents c
    ),
    with_cell AS (SELECT vec_id, v, cid AS cell FROM scored WHERE rn = 1),
    quant AS (
      SELECT vec_id, cell,
             list_apply(v, x -> CAST(round(x * CASE
                 WHEN list_max(list_apply(v, y -> abs(y))) > 0
                 THEN 127.0 / list_max(list_apply(v, y -> abs(y)))
                 ELSE 0.0 END) AS INT)) AS qv
      FROM with_cell
    ),
    qn AS (SELECT vec_id, cell, qv,
                  {QDOT_SQL.format(a="qv", b="qv")} AS qn2 FROM quant),
    probes AS (SELECT vec_id AS q_id, cid AS cell FROM scored
               WHERE vec_id < {n_queries} AND rn <= {nprobe}),
    q AS (SELECT p.q_id, p.cell, n.qv, n.qn2
          FROM probes p JOIN qn n ON n.vec_id = p.q_id)
    SELECT q_id, vec_id, qcosine, rank FROM (
      SELECT q.q_id, w2.vec_id, {qcos} AS qcosine,
             ROW_NUMBER() OVER (PARTITION BY q.q_id
                                ORDER BY {qcos} DESC, w2.vec_id) AS rank
      FROM q JOIN qn w2 USING (cell) WHERE q.q_id <> w2.vec_id
    ) WHERE rank <= {k}
    """


def semantic_dedup_components(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_cells: int | None = None,
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over the semantic near-dup pair graph —
    keep-one-per-CLUSTER semantics where the pairwise one-level rule
    (``semantic_dedup_keep``) under-prunes transitive chains (a~b, b~c
    but a!~c still all collapse to one representative). Same pointer-
    jumping machinery as the MinHash family (``dedup.connected_
    components``); semantic components are near-cliques within a cell,
    so convergence is ~2-3 rounds. Output: ``(vec_id, component)`` for
    every vector that appears in at least one pair."""
    from mmw_geoprocessing_spark.operators.dedup import connected_components

    pairs = semantic_dedup_pairs(embeddings, threshold=threshold, n_cells=n_cells)
    edges = pairs.select(F.col("v1").alias("d1"), F.col("v2").alias("d2"))
    return connected_components(edges, max_iters=max_iters).select(
        F.col("doc_id").alias("vec_id"), "component"
    )


def semantic_dedup_components_sql(
    threshold: float = 0.4, n_cells: int | None = None
) -> str:
    """DuckDB twin of :func:`semantic_dedup_components`: UNION
    (distinct) recursive-CTE transitive closure over the SAME pair set
    the pairs oracle produces, component id = minimum reachable vec_id.
    Two roads, one result — the iterative pointer-jumping plan is the
    engine shape (Spark's recursive CTE is UNION ALL-only and diverges
    on cycles); the set-semantics closure is the oracle shape.

    ``AS MATERIALIZED`` is load-bearing: DuckDB inlines plain CTEs into
    the recursive term and re-evaluates them per closure iteration —
    the full pair pipeline per round (measured >30 min inlined vs ~10 s
    materialized at the 10x replica, round 9)."""
    return f"""
    WITH RECURSIVE pairs AS MATERIALIZED (
      SELECT v1, v2 FROM ({semantic_dedup_pairs_sql(threshold, n_cells=n_cells)})
    ),
    edges AS MATERIALIZED (
      SELECT v1 AS a, v2 AS b FROM pairs
      UNION ALL
      SELECT v2, v1 FROM pairs
    ),
    reach(x, y) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.x, e.b FROM reach r JOIN edges e ON e.a = r.y
    )
    SELECT x AS vec_id, LEAST(x, MIN(y)) AS component FROM reach GROUP BY x
    """
