"""Python UDTF surface (Spark 3.5+): user-defined *table* functions —
one input row expands to many output rows inside the executor.

``word_positions`` is the canonical text-pipeline UDTF (positional
tokenization); its output is plain positional explode so a DuckDB
oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def word_positions(spark: SparkSession, documents: DataFrame, max_doc: int = 50) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, word string")
    class WordPositions:
        def eval(self, doc_id, text):  # noqa: ANN001
            for i, w in enumerate(text.split(" "), start=1):
                yield doc_id, i, w

    spark.udtf.register("word_positions", WordPositions)
    documents.filter(f"doc_id < {max_doc}").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.word "
        "FROM _udtf_docs, LATERAL word_positions(doc_id, text) t"
    )


def word_positions_sql(max_doc: int = 50) -> str:
    return f"""
    SELECT doc_id, CAST(i AS INT) AS pos, l[i] AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents
          WHERE doc_id < {max_doc}),
         UNNEST(generate_series(1, len(l))) AS t(i)
    """
