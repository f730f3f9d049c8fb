"""Arbitrary stateful streaming via Spark 4's ``transformWithStateInPandas``
(StatefulProcessor API): a per-user running profile carrying typed
ValueState + MapState across micro-batches.

This is the Spark-4-native successor to ``applyInPandasWithState``
(streaming/windows.py:stream_running_user_counts): instead of one
opaque state tuple per key, the processor declares NAMED, TYPED state
variables (value / list / map), gets per-state TTL, timers, and state
schema evolution — the API a long-running 100 TB ingest profile job
wants, because a schema change no longer invalidates the checkpoint.

ENVIRONMENT BOUNDARY (probed in this sandbox, round 10): the
PySpark side of transformWithState talks to the JVM state server over
a protobuf protocol (`pyspark/sql/streaming/proto/StateMessage_pb2`),
which imports ``google.protobuf`` — not installed here and the
environment is pip-frozen. The plan BUILDS (API present in PySpark
4.1.2); the drain dies in `TransformWithStateInPySparkPythonPreInitRunner`
with ``ImportError: cannot import name 'descriptor' from
'google.protobuf'``. So, same policy as the s3a catalog
(SCALE.md): the code path is real and tested where its dependency
exists; here the entry raises a typed error up-front naming the
missing dependency, and the applyInPandasWithState operator remains
the exercised custom-stateful path. tests/test_stateful_tws.py skips
the drain on missing protobuf but pins the closed-form twin.

Determinism discipline: all state is integer (BIGINT cents via the
streaming/windows.py money rule, epoch seconds, counts) so the final
per-user profile is a commutative fold — identical for any batch
split of the input, which is what gives the drained sink a closed-form
batch/SQL twin even though emissions per key depend on micro-batch
boundaries (the batch face keeps each user's LAST emission: the one
with the maximal n_events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, sum_value DOUBLE, "
    "last_ts_s BIGINT, type_counts STRING"
)
_TOTALS_SCHEMA = "n_events BIGINT, sum_cents BIGINT, last_ts_s BIGINT"


def _require_protobuf() -> None:
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise EnvironmentError(
            "transformWithStateInPandas needs the google.protobuf python "
            "package (PySpark's state-server protocol); not installed in "
            "this environment — see streaming/stateful.py docstring. The "
            "exercised custom-stateful operator here is "
            "streaming/windows.py:stream_running_user_counts "
            "(applyInPandasWithState)."
        ) from e


def _profile_processor():
    """Build the StatefulProcessor (deferred import: the class exists
    in PySpark 4.1.2 regardless, but constructing it is only useful
    where the protobuf runtime is available)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserProfile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _TOTALS_SCHEMA)
            self._by_type = handle.getMapState(
                "by_type", "event_type STRING", "cnt BIGINT"
            )

        def handleInputRows(self, key, rows, timer_values):
            if self._totals.exists():
                n, cents, last = self._totals.get()
            else:
                n, cents, last = 0, 0, 0
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
                last = max(last, int(pdf["ts_s"].max()))
                for t, c in pdf.groupby("event_type").size().to_dict().items():
                    prev = self._by_type.getValue((t,))
                    self._by_type.updateValue(
                        (t,), ((0 if prev is None else prev[0]) + int(c),)
                    )
            self._totals.update((n, cents, last))
            counts = sorted((k[0], v[0]) for k, v in self._by_type.iterator())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [cents / 100.0],
                    "last_ts_s": [last],
                    "type_counts": ["|".join(f"{t}:{c}" for t, c in counts)],
                }
            )

        def close(self) -> None:
            pass

    return UserProfile()


def stream_user_profiles_tws(stream: DataFrame) -> DataFrame:
    """The TWS streaming plan over an events stream (ts, user_id,
    event_type, value). Emits the running profile per key per
    micro-batch; requires the RocksDB state store provider and the
    protobuf runtime (see module docstring)."""
    _require_protobuf()
    projected = stream.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.unix_timestamp("ts").cast("bigint").alias("ts_s"),
    )
    return projected.groupBy("user_id").transformWithStateInPandas(
        _profile_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


def user_profiles_batch_twin(events: DataFrame) -> DataFrame:
    """Closed-form batch twin of the final TWS emissions: because every
    state update is a commutative integer fold, the last emission per
    user equals this plain two-level aggregate over the whole input."""
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        F.max(F.unix_timestamp("ts").cast("bigint")).alias("mx"),
    )
    return per_type.groupBy("user_id").agg(
        F.sum("cnt").cast("bigint").alias("n_events"),
        (F.sum("cents").cast("double") / 100.0).alias("sum_value"),
        F.max("mx").cast("bigint").alias("last_ts_s"),
        F.concat_ws(
            "|",
            F.sort_array(
                F.collect_list(
                    F.concat_ws(":", "event_type", F.col("cnt").cast("string"))
                )
            ),
        ).alias("type_counts"),
    )


def user_profiles_batch_twin_sql() -> str:
    return """
    WITH per_type AS (
      SELECT user_id, event_type, COUNT(*) AS cnt,
             SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS cents,
             MAX(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) AS mx
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(cnt) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS sum_value,
           CAST(MAX(mx) AS BIGINT) AS last_ts_s,
           string_agg(event_type || ':' || cnt, '|' ORDER BY event_type || ':' || cnt) AS type_counts
    FROM per_type GROUP BY user_id
    """
