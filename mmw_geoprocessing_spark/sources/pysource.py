"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic ledger source, read in parallel partitions.

Why it exists: the reference's ingest surface is a catalog of parquet
layers (covered by sources/catalog.py); a real deployment ALSO pulls
from systems Spark has no built-in connector for (internal services,
bespoke formats). Spark 4's Python DataSource API is the sanctioned
way to add one without a JVM build: the source declares its schema and
partition plan on the driver, and each ``read(partition)`` runs in an
executor Python worker — so a 1000-partition plan fans out across the
cluster like any scan.

Determinism: every generated cell is a pure function of the row index
(md5-derived, the repo's h28 recipe), so the SAME ledger is derivable
in DuckDB SQL — the registered query over this source has a full
value-hash oracle twin, like every other registry entry.

100 TB shape: partition count is an option (``n_parts``); generation
is embarrassingly parallel with zero driver state beyond the partition
list. A production connector swaps the arithmetic for I/O against the
external system; the planning/read contract — and this test harness —
stay identical.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SOURCE_NAME = "synth_ledger"
DEFAULT_ROWS = 100_000
DEFAULT_PARTS = 8
H28_MOD = 1 << 28


def _h28_int(s: str) -> int:
    """Python twin of functions/text.py h28 (and H28_SQL): the first 7
    hex chars of md5 as an int — identical on every engine."""
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthLedgerReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", DEFAULT_ROWS))
        self.n_parts = int(options.get("n_parts", DEFAULT_PARTS))

    def partitions(self):
        chunk = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _RangePartition(i * chunk, min((i + 1) * chunk, self.n_rows))
            for i in range(self.n_parts)
            if i * chunk < self.n_rows
        ]

    def read(self, partition):
        for idx in range(partition.start, partition.end):
            h = _h28_int(str(idx))
            yield (
                idx,
                idx % 97,
                h % 1_000_000,  # amount_cents
                "credit" if h % 3 == 0 else "debit",
            )


class SynthLedgerSource(DataSource):
    @classmethod
    def name(cls):
        return SOURCE_NAME

    def schema(self):
        return "txn_id BIGINT, account BIGINT, amount_cents BIGINT, kind STRING"

    def reader(self, schema):
        return SynthLedgerReader(self.options)


def register(spark) -> None:
    """Idempotent registration (a second register raises in Spark 4)."""
    try:
        spark.dataSource.register(SynthLedgerSource)
    except Exception:
        pass  # already registered in this session


def ledger_account_rollup(spark, n_rows: int = DEFAULT_ROWS) -> "DataFrame":
    """Registered query: read the custom source in parallel and roll up
    per (account, kind). Output: ``(account, kind, n_txns,
    sum_cents)``."""
    from pyspark.sql import functions as F

    register(spark)
    df = (
        spark.read.format(SOURCE_NAME)
        .option("n_rows", str(n_rows))
        .option("n_parts", str(DEFAULT_PARTS))
        .load()
    )
    return df.groupBy("account", "kind").agg(
        F.count(F.lit(1)).alias("n_txns"),
        F.sum("amount_cents").alias("sum_cents"),
    )


def ledger_account_rollup_sql(n_rows: int = DEFAULT_ROWS) -> str:
    """DuckDB twin: the same md5 arithmetic over range(n_rows)."""
    h = "CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 7)) AS BIGINT)"
    return f"""
    WITH ledger AS (
        SELECT i AS txn_id,
               i % 97 AS account,
               {h} % 1000000 AS amount_cents,
               CASE WHEN {h} % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind
        FROM (SELECT unnest(range({n_rows})) AS i)
    )
    SELECT account, kind,
           COUNT(*) AS n_txns,
           CAST(SUM(amount_cents) AS BIGINT) AS sum_cents
    FROM ledger GROUP BY account, kind
    """


# ---------------------------------------------------------------------------
# Streaming side of the connector: DataSourceStreamReader. Offsets are
# row indexes; the whole ledger is available at once, so an
# availableNow drain reads it as one offset-bounded batch split over
# n_parts parallel tasks, and the drained rollup equals the batch
# oracle. A production connector replaces latestOffset() with the
# external system's advancing high-water mark (that is where pacing
# lives); the offset/partition/read/commit contract is the deliverable.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402

STREAM_SOURCE_NAME = "synth_ledger_stream"


class SynthLedgerStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", DEFAULT_ROWS))
        self.n_parts = int(options.get("n_parts", DEFAULT_PARTS))

    def initialOffset(self):
        return {"idx": 0}

    def latestOffset(self):
        return {"idx": self.n_rows}

    def partitions(self, start, end):
        # The batch MUST cover [start, end) exactly: under availableNow
        # Spark snapshots latestOffset once and expects the range
        # consumed — a first cut clamped hi to start+batch_rows here
        # and silently lost 75% of the ledger (measured). Pacing
        # belongs in latestOffset (a production connector advances its
        # high-water mark per poll); here the whole ledger is available
        # at once, so the drain is one batch split over n_parts tasks.
        lo, hi = start["idx"], min(end["idx"], self.n_rows)
        chunk = max(1, -(-(hi - lo) // self.n_parts))
        return [
            _RangePartition(lo + i * chunk, min(lo + (i + 1) * chunk, hi))
            for i in range(self.n_parts)
            if lo + i * chunk < hi
        ]

    def read(self, partition):
        for idx in range(partition.start, partition.end):
            h = _h28_int(str(idx))
            yield (
                idx,
                idx % 97,
                h % 1_000_000,
                "credit" if h % 3 == 0 else "debit",
            )

    def commit(self, end):
        pass  # nothing to ack in the synthetic system


class SynthLedgerStreamSource(DataSource):
    @classmethod
    def name(cls):
        return STREAM_SOURCE_NAME

    def schema(self):
        return "txn_id BIGINT, account BIGINT, amount_cents BIGINT, kind STRING"

    def streamReader(self, schema):
        return SynthLedgerStreamReader(self.options)


def register_stream(spark) -> None:
    try:
        spark.dataSource.register(SynthLedgerStreamSource)
    except Exception:
        pass


def ledger_stream_rollup(spark, n_rows: int = DEFAULT_ROWS) -> "DataFrame":
    """Registered query: drain the custom STREAMING source with
    availableNow (one offset-bounded batch split over parallel read
    tasks; checkpointed offsets + exactly-once parquet sink) into a
    keyed sink, then roll up — same output and oracle as the batch
    connector."""
    import os as _os
    import tempfile

    from pyspark.sql import functions as F

    register_stream(spark)
    base = _os.path.join(
        tempfile.gettempdir(), f"pysource_stream_{n_rows}"
    )
    ckpt, sink = base + "_ckpt", base + "_sink/out"
    stream = (
        spark.readStream.format(STREAM_SOURCE_NAME)
        .option("n_rows", str(n_rows))
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    return (
        spark.read.parquet(sink)
        .groupBy("account", "kind")
        .agg(
            F.count(F.lit(1)).alias("n_txns"),
            F.sum("amount_cents").alias("sum_cents"),
        )
    )


def ledger_stream_rollup_sql(n_rows: int = DEFAULT_ROWS) -> str:
    return ledger_account_rollup_sql(n_rows)
