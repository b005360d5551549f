"""etl_drone_sense_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL task
(``/root/reference/task.ts``) as an idiomatic Spark DataFrame engine, and
extends it with the relational + LLM-data-pipeline operator surface declared
in ``SURVEY.md`` §2.

Layout:
    session     SparkSession factory with scale-oriented defaults
    schemas     declared StructTypes (drone telemetry, GeoJSON feature, TPC-H-ish)
    config      typed environment config (reference task.ts:74-82 semantics)
    functions/  column-expression libraries (geodesy, text, vectors)
    operators/  composite operators (feature transform, dedup, similarity, ...)
    sources/    readers and sinks
    plans/      the query registry driving __spark_entry__ and bench.py
    streaming/  Structured Streaming pipelines
"""

__version__ = "0.1.0"
