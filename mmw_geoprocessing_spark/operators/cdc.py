"""CDC / changelog compaction: latest-wins merge of a base snapshot
with an upsert-delete changelog (the MERGE INTO / SCD-type-1 shape).

Every large-scale ingest pipeline compacts a mutable feed this way:
``merged = base ⊕ changelog`` where per key the highest-sequence
change wins, a delete removes the key, and unseen keys insert. The
scalable plan is the classic one: union the base (as sequence 0) with
the changelog and keep the max-sequence row per key — ONE shuffle on
the key, no join at all (a join-based MERGE shuffles both sides the
same way and then still needs the dedup; the union form is strictly
cheaper and is what Delta/Iceberg compaction does under the hood).

Determinism: sequence numbers are unique per key by construction
(ROW_NUMBER tie-break on seq desc, op — a total order either way), all
payload arithmetic is exact IEEE (+100.0 on doubles), so the merged
snapshot value-hashes cross-engine.

The registered changelog is SYNTHESIZED deterministically from the
orders table itself (the same device as the PII-injection entries —
the fixture world has no mutable feed, so both engines derive the
identical changelog before merging):

- seq 1 'U' for ``o_orderkey % 7 = 3``: totalprice + 100.0
- seq 2 'U' for ``o_orderkey % 21 = 3`` (a subset — exercises
  latest-wins over seq 1): totalprice + 200.0
- seq 3 'D' for ``o_orderkey % 13 = 4`` (some keys get U then D)
- seq 1 'I' for ``o_orderkey % 17 = 5`` under a fresh key
  (``-o_orderkey``): a new order at 2x the price. Negation keeps the
  insert keyspace disjoint from real orderkeys (always >= 1) at ANY
  scale factor — a fixed additive offset collides once SF ≳ 83
  (TPC-H max o_orderkey ≈ 6M·SF) and silently turns inserts into
  latest-wins overrides of unrelated base orders.

100 TB shape: union is free, the single hash-shuffle on o_orderkey
carries base + changelog together, AQE handles key skew (unique keys →
none), and the window's per-key state is the handful of versions of
that key. Bucketed base tables make the shuffle one-sided in a real
deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAYLOAD = [
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def synth_changelog(orders: DataFrame) -> DataFrame:
    """Deterministic changelog derived from the orders table (see module
    docstring). Output: ``(o_orderkey, seq, op, <payload cols>)``.

    One corpus pass (optimization r14, guide §2.4): each order row
    emits its 0-3 applicable changelog entries via
    ``inline(array_compact(...))`` instead of four filtered re-scans of
    the table unioned together (the union form re-read the orders
    parquet four times per consumer — and the rollup's delta branches
    made that eight). Row multiset is identical to the union form, so
    every downstream oracle is unchanged."""
    k = F.col("o_orderkey")

    def _entry(cond, key, seq: int, op: str, price):
        return F.when(
            cond,
            F.struct(
                key.cast("bigint").alias("o_orderkey"),
                F.lit(seq).cast("bigint").alias("seq"),
                F.lit(op).alias("op"),
                F.col("o_custkey").alias("o_custkey"),
                F.col("o_orderstatus").alias("o_orderstatus"),
                price.alias("o_totalprice"),
                F.col("o_orderdate").alias("o_orderdate"),
                F.col("o_orderpriority").alias("o_orderpriority"),
            ),
        )

    entries = F.array(
        _entry(k % 7 == 3, k, 1, "U", F.col("o_totalprice") + F.lit(100.0)),
        _entry(k % 21 == 3, k, 2, "U", F.col("o_totalprice") + F.lit(200.0)),
        _entry(k % 13 == 4, k, 3, "D", F.col("o_totalprice")),
        _entry(k % 17 == 5, -k, 1, "I", F.col("o_totalprice") * F.lit(2.0)),
    )
    return orders.select(F.inline(F.array_compact(entries)))


def changelog_merge(base: DataFrame, changelog: DataFrame) -> DataFrame:
    """Latest-wins merge: per key, the max-``seq`` row survives unless
    it is a delete. Output: merged snapshot with ``version`` (the
    winning seq) and ``src_op``."""
    cols = ["o_orderkey", "seq", "op", *PAYLOAD]
    base_v = base.withColumn("seq", F.lit(0).cast("bigint")).withColumn(
        "op", F.lit("I")
    )
    all_rows = base_v.select(cols).unionByName(changelog.select(cols))
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("seq").desc(), F.col("op").asc()
    )
    return (
        all_rows.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "o_orderkey",
            *PAYLOAD,
            F.col("seq").alias("version"),
            F.col("op").alias("src_op"),
        )
    )


def changelog_merge_orders(orders: DataFrame) -> DataFrame:
    """The registered entry: merge orders with its synthesized
    changelog."""
    return changelog_merge(orders, synth_changelog(orders))


def changelog_merge_orders_sql(table: str = "orders") -> str:
    """DuckDB twin: identical changelog synthesis + latest-wins merge."""
    pay = ", ".join(PAYLOAD)
    return f"""
    WITH changelog AS (
        SELECT o_orderkey, CAST(1 AS BIGINT) AS seq, 'U' AS op,
               o_custkey, o_orderstatus, o_totalprice + 100.0 AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM {table} WHERE o_orderkey % 7 = 3
        UNION ALL
        SELECT o_orderkey, 2, 'U', o_custkey, o_orderstatus,
               o_totalprice + 200.0, o_orderdate, o_orderpriority
        FROM {table} WHERE o_orderkey % 21 = 3
        UNION ALL
        SELECT o_orderkey, 3, 'D', o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM {table} WHERE o_orderkey % 13 = 4
        UNION ALL
        SELECT -o_orderkey, 1, 'I', o_custkey, o_orderstatus,
               o_totalprice * 2.0, o_orderdate, o_orderpriority
        FROM {table} WHERE o_orderkey % 17 = 5
    ),
    all_rows AS (
        SELECT o_orderkey, CAST(0 AS BIGINT) AS seq, 'I' AS op, {pay}
        FROM {table}
        UNION ALL
        SELECT o_orderkey, seq, op, {pay} FROM changelog
    )
    SELECT o_orderkey, {pay}, seq AS version, op AS src_op
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_orderkey ORDER BY seq DESC, op ASC
        ) AS rn
        FROM all_rows
    )
    WHERE rn = 1 AND op <> 'D'
    """


def scd2_history(base: DataFrame, changelog: DataFrame) -> DataFrame:
    """SCD type-2: every non-delete version of a key becomes a history
    row with an effective-sequence range. ``valid_to`` is the NEXT
    change's seq (a delete closes the range too); NULL valid_to +
    ``is_current`` marks the live version.

    The plan is the same single key-shuffle as the type-1 merge — one
    window (lead over seq) instead of row_number, no join. At 100 TB
    the per-key state is the handful of versions of that key, and a
    bucketed base table makes the exchange one-sided (SCALE.md CDC
    section).
    Output: ``(o_orderkey, version, valid_to, is_current, src_op,
    o_totalprice)``.
    """
    cols = ["o_orderkey", "seq", "op", *PAYLOAD]
    base_v = base.withColumn("seq", F.lit(0).cast("bigint")).withColumn(
        "op", F.lit("I")
    )
    all_rows = base_v.select(cols).unionByName(changelog.select(cols))
    w = Window.partitionBy("o_orderkey").orderBy(F.col("seq").asc(), F.col("op").asc())
    return (
        all_rows.withColumn("valid_to", F.lead("seq").over(w))
        .filter(F.col("op") != "D")
        .select(
            "o_orderkey",
            F.col("seq").alias("version"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
            F.col("op").alias("src_op"),
            "o_totalprice",
        )
    )


def scd2_history_orders(orders: DataFrame) -> DataFrame:
    """The registered entry: SCD2 history of orders ⊕ its synthesized
    changelog."""
    return scd2_history(orders, synth_changelog(orders))


def scd2_history_orders_sql(table: str = "orders") -> str:
    """DuckDB twin: identical changelog synthesis + lead() ranges."""
    pay = ", ".join(PAYLOAD)
    return f"""
    WITH changelog AS (
        SELECT o_orderkey, CAST(1 AS BIGINT) AS seq, 'U' AS op,
               o_custkey, o_orderstatus, o_totalprice + 100.0 AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM {table} WHERE o_orderkey % 7 = 3
        UNION ALL
        SELECT o_orderkey, 2, 'U', o_custkey, o_orderstatus,
               o_totalprice + 200.0, o_orderdate, o_orderpriority
        FROM {table} WHERE o_orderkey % 21 = 3
        UNION ALL
        SELECT o_orderkey, 3, 'D', o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM {table} WHERE o_orderkey % 13 = 4
        UNION ALL
        SELECT -o_orderkey, 1, 'I', o_custkey, o_orderstatus,
               o_totalprice * 2.0, o_orderdate, o_orderpriority
        FROM {table} WHERE o_orderkey % 17 = 5
    ),
    all_rows AS (
        SELECT o_orderkey, CAST(0 AS BIGINT) AS seq, 'I' AS op, {pay}
        FROM {table}
        UNION ALL
        SELECT o_orderkey, seq, op, {pay} FROM changelog
    ),
    ranged AS (
        SELECT *, lead(seq) OVER (
            PARTITION BY o_orderkey ORDER BY seq ASC, op ASC
        ) AS valid_to
        FROM all_rows
    )
    SELECT o_orderkey, seq AS version, valid_to,
           valid_to IS NULL AS is_current, op AS src_op, o_totalprice
    FROM ranged WHERE op <> 'D'
    """


def incremental_rollup(base: DataFrame, changelog: DataFrame) -> DataFrame:
    """Incremental view maintenance (IVM): keep a per-orderdate revenue
    rollup current under the changelog WITHOUT rescanning the base.

    The classic delta algebra: each changelog key contributes its OLD
    row negated and its NEW row added; the maintained view is
    ``base_rollup ⊕ delta_agg`` re-aggregated on the group key. Cost is
    O(|changelog|) — one bounded join (changelog ⋈ base, to fetch old
    values) plus a delta aggregate unioned into the rollup — vs a full
    recompute's O(|base|) rescan. At 100 TB a daily changelog is ~0.1%
    of the table: IVM turns the nightly rollup refresh from a full
    scan into a delta-sized job (this is exactly what materialized-
    view maintenance in Delta/Snowflake/Materialize does).

    Semantics per key (latest-wins, same rules as ``changelog_merge``):
    the winning change is the max-seq row; 'D' negates the old row and
    adds nothing; 'U' negates old and adds new; 'I' (fresh key) adds
    new. Money in exact BIGINT cents so the maintained view value-
    hashes against the full recompute. Output: ``(o_orderdate,
    n_orders, revenue_cents)`` — identical to recomputing over the
    merged snapshot (the oracle).
    """
    cents = lambda c: F.round(F.col(c) * 100).cast("bigint")  # noqa: E731
    base_rollup = base.groupBy("o_orderdate").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("o_totalprice")).alias("cents"),
    )
    # winning change per key (the changelog is tiny next to base)
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("seq").desc(), F.col("op").asc()
    )
    winner = (
        changelog.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "op", "o_orderdate", "o_totalprice")
    )
    old = base.select(
        "o_orderkey",
        F.col("o_orderdate").alias("old_date"),
        F.col("o_totalprice").alias("old_price"),
    )
    d = winner.join(old, "o_orderkey", "left")
    # Both delta legs (negate-old, add-new) ride ONE evaluation of the
    # joined changelog via inline(array_compact(...)) — the two-branch
    # union form re-executed the whole winner-window + join lineage
    # twice (optimization r14, guide §2.4; the before plan carried 22
    # parquet scans, two windows and two broadcast joins for one
    # delta).
    negate_leg = F.when(
        F.col("old_date").isNotNull(),
        F.struct(
            F.col("old_date").alias("o_orderdate"),
            F.lit(-1).cast("bigint").alias("n"),
            (-F.round(F.col("old_price") * 100).cast("bigint")).alias("cents"),
        ),
    )
    add_leg = F.when(
        F.col("op") != "D",
        F.struct(
            F.col("o_orderdate").alias("o_orderdate"),
            F.lit(1).cast("bigint").alias("n"),
            cents("o_totalprice").alias("cents"),
        ),
    )
    delta = d.select(F.inline(F.array_compact(F.array(negate_leg, add_leg))))
    return (
        base_rollup.unionByName(delta)
        .groupBy("o_orderdate")
        .agg(F.sum("n").alias("n_orders"), F.sum("cents").alias("revenue_cents"))
        .filter(F.col("n_orders") > 0)
    )


def incremental_rollup_orders(orders: DataFrame) -> DataFrame:
    """Registered entry: the IVM rollup over orders ⊕ its synthesized
    changelog."""
    return incremental_rollup(orders, synth_changelog(orders))


def incremental_rollup_orders_sql(table: str = "orders") -> str:
    """Oracle: the FULL RECOMPUTE over the merged snapshot — the view
    IVM must be indistinguishable from."""
    merged = changelog_merge_orders_sql(table)
    return f"""
    SELECT o_orderdate,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM ({merged})
    GROUP BY o_orderdate
    """


# ---------------------------------------------------------------------------
# MERGE INTO (SQL:2003 / Delta MERGE): join-based three-clause merge
# ---------------------------------------------------------------------------

def merge_into(target: DataFrame, source: DataFrame, key: str = "o_orderkey") -> DataFrame:
    """The SQL-standard MERGE in one full-outer join:

    - WHEN MATCHED AND s.op = 'D'      THEN DELETE
    - WHEN MATCHED (op 'U' or 'I')     THEN UPDATE SET * = source
    - WHEN NOT MATCHED AND s.op = 'I'  THEN INSERT *
    - unmatched target rows pass through; unmatched 'U'/'D' are no-ops

    This is the JOIN-shaped counterpart to ``changelog_merge`` (which
    is strictly cheaper — one union + one key shuffle — when the
    source carries its own sequence numbers). MERGE INTO is what you
    run when the source is a clean one-row-per-key batch and you need
    the standard three-clause semantics: the physical plan is one
    full-outer sort-merge join (both sides shuffle on the key once),
    which is exactly how Delta/Iceberg execute MERGE. Reference for
    semantics: Spark's own DeltaMergeInto / SQL:2003 14.9.
    """
    t = target.withColumn("_t", F.lit(1))
    s = source.withColumn("_s", F.lit(1))
    # disambiguate payload columns before the join
    s = s.select(
        key, "_s", "op", *[F.col(c).alias(f"_s_{c}") for c in PAYLOAD]
    )
    j = t.join(s, key, "full_outer")
    matched = F.col("_t").isNotNull() & F.col("_s").isNotNull()
    use_source = (matched & (F.col("op") != "D")) | (
        F.col("_t").isNull() & (F.col("op") == "I")
    )
    keep = F.col("_s").isNull() | use_source
    return j.filter(keep).select(
        key,
        *[
            F.when(use_source, F.col(f"_s_{c}")).otherwise(F.col(c)).alias(c)
            for c in PAYLOAD
        ],
    )


def _merge_source(orders: DataFrame) -> DataFrame:
    """Deterministic one-row-per-key MERGE batch from the orders table
    (disjoint rules from ``synth_changelog`` so the two registered
    merge shapes are independent): updates re-price ``k % 11 = 5``
    (+50.0, priority 'MERGED'), deletes drop ``k % 17 = 2`` (minus the
    update keys — one row per key), inserts add fresh negated keys
    ``-(k + 1_000_000_001)`` for ``k % 23 = 1`` (disjoint at any SF,
    and from the changelog family's ``-k`` inserts)."""
    k = F.col("o_orderkey")
    upd = (
        orders.filter(k % 11 == 5)
        .withColumn("op", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(50.0))
        .withColumn("o_orderpriority", F.lit("MERGED"))
    )
    dele = orders.filter((k % 17 == 2) & ~(k % 11 == 5)).withColumn(
        "op", F.lit("D")
    )
    ins = (
        orders.filter(k % 23 == 1)
        .withColumn("o_orderkey", -(k + F.lit(1_000_000_001)))
        .withColumn("op", F.lit("I"))
        .withColumn("o_totalprice", F.col("o_totalprice") * F.lit(3.0))
    )
    cols = ["o_orderkey", "op", *PAYLOAD]
    return upd.select(cols).unionByName(dele.select(cols)).unionByName(
        ins.select(cols)
    )


def merge_into_orders(orders: DataFrame) -> DataFrame:
    """Registered entry ``cdc_merge_into``."""
    return merge_into(orders, _merge_source(orders))


def merge_into_orders_sql(table: str = "orders") -> str:
    pay_s = ", ".join(f"s.{c} AS _s_{c}" for c in PAYLOAD)
    pick = ",\n           ".join(
        f"CASE WHEN use_source THEN _s_{c} ELSE {c} END AS {c}"
        for c in PAYLOAD
    )
    return f"""
    WITH src AS (
        SELECT o_orderkey, 'U' AS op, o_custkey, o_orderstatus,
               o_totalprice + 50.0 AS o_totalprice, o_orderdate,
               'MERGED' AS o_orderpriority
        FROM {table} WHERE o_orderkey % 11 = 5
        UNION ALL
        SELECT o_orderkey, 'D', o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM {table} WHERE o_orderkey % 17 = 2 AND NOT o_orderkey % 11 = 5
        UNION ALL
        SELECT -(o_orderkey + 1000000001), 'I', o_custkey, o_orderstatus,
               o_totalprice * 3.0, o_orderdate, o_orderpriority
        FROM {table} WHERE o_orderkey % 23 = 1
    ),
    j AS (
        SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
               t.o_orderkey IS NOT NULL AS t_exists,
               s.o_orderkey IS NOT NULL AS s_exists,
               s.op, {pay_s},
               t.o_custkey, t.o_orderstatus, t.o_totalprice,
               t.o_orderdate, t.o_orderpriority
        FROM {table} t FULL JOIN src s ON t.o_orderkey = s.o_orderkey
    ),
    flagged AS (
        SELECT *,
               (t_exists AND s_exists AND op <> 'D')
               OR (NOT t_exists AND op = 'I') AS use_source
        FROM j
    )
    SELECT o_orderkey,
           {pick}
    FROM flagged
    WHERE NOT s_exists OR use_source
    """
