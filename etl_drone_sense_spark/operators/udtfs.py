"""Python UDTF surface (SURVEY §2 Part B, UDF/UDAF/UDTF row).

PySpark 4 user-defined TABLE functions: one input row → many output rows,
usable in SQL via ``LATERAL``. This is the row-at-a-time Python SLOW path
— the engine's hot operators stay pure Catalyst expressions, and anything
a UDTF does that built-ins can express (this one included: it equals
``explode(split(...))``) should use the built-ins at scale. The UDTF is
the declared extension point for logic that genuinely cannot be expressed
as expressions (recursive parsers, per-row external model calls), shown
here with a full DuckDB oracle so the mechanism itself is hash-verified.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="doc_id: bigint, sentence: string, n_words: int")
class SentenceSplit:
    """Split a document into '. '-delimited sentence rows with a word
    count — deterministic, so the DuckDB twin
    (``unnest(string_split(...))``) is an exact oracle."""

    def eval(self, doc_id, text):  # noqa: ANN001 - signature fixed by Spark
        if text is None:
            return
        for sentence in text.split(". "):
            yield doc_id, sentence, len(sentence.split(" "))


def register_udtfs(spark) -> None:
    spark.udtf.register("sentence_split", SentenceSplit)
