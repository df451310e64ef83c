"""tile-etl-spark: a PySpark-native analytics engine.

A brand-new engine with the data-processing capabilities of the reference
ArcGIS tile-cache ETL pipeline (``agrc/tile-etl``, see /root/reference —
``src/Program.cs``, ``reference/EtlToS3.cs``), re-expressed Spark-first:

- the reference's extent→grid→codec→filter→scan→sink pipeline as pure
  DataFrame builders (:mod:`tile_etl_spark.tiles`),
- a full relational operator inventory (joins, aggregations, windows,
  set ops, scalar function families) on the Spark SQL engine,
- Structured Streaming twins of the batch window operators,
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal binary columns) designed for 100 TB scale.

Everything is declarative DataFrame construction — Catalyst owns
optimization and physical planning; no custom parser/IR/scheduler.
"""

__version__ = "0.1.0"
