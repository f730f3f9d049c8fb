"""NODATA handling and output-key formatting.

Reference semantics (SURVEY.md §2.4):
- integer NODATA is ``Int.MinValue`` and *participates in group keys*
  (reference Utils.scala:225, CHANGELOG.md:61-63);
- result keys are rendered exactly like Scala's ``List.toString``:
  ``"List(v1, v2)"`` with a ``", "`` separator
  (reference Geoprocessing.scala:366).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NODATA_INT = -2147483648


def nodata_filled(col: Column) -> Column:
    """NULL cell -> integer NODATA (reference Utils.scala:225 constant tile)."""
    return F.coalesce(col, F.lit(NODATA_INT))


def list_key(*cols: Column) -> Column:
    """Render value columns as the reference's ``List(v1, v2)`` key string
    (reference Geoprocessing.scala:366). Stays JVM-side: concat of casts."""
    return F.concat(
        F.lit("List("),
        F.concat_ws(", ", *[c.cast("string") for c in cols]),
        F.lit(")"),
    )


def list_key_sql(*names: str) -> str:
    """``list_key`` as Spark-SQL text (for selectExpr hot paths — one
    parsed string instead of per-Column py4j round-trips)."""
    casts = ", ".join(f"cast({n} as string)" for n in names)
    return f"concat('List(', concat_ws(', ', {casts}), ')')"
