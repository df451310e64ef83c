"""Import every query module for registration side effects.

``tile_etl_spark.registry.load_all`` imports this module; each imported
module registers its qids into ``registry.QUERIES`` / ``ORACLES``.
"""

# Tile-ETL core (reference parity, SURVEY §2A)
import tile_etl_spark.tiles.etl  # noqa: F401
import tile_etl_spark.tiles.grid  # noqa: F401
import tile_etl_spark.tiles.sink  # noqa: F401

# Sources / sinks
import tile_etl_spark.sources.files  # noqa: F401

# Relational operators (SURVEY §2B)
import tile_etl_spark.operators.aggregates  # noqa: F401
import tile_etl_spark.operators.analytics  # noqa: F401
import tile_etl_spark.operators.bucketed  # noqa: F401
import tile_etl_spark.operators.filters  # noqa: F401
import tile_etl_spark.operators.joins  # noqa: F401
import tile_etl_spark.operators.reshape  # noqa: F401
import tile_etl_spark.operators.sessionize  # noqa: F401
import tile_etl_spark.operators.setops  # noqa: F401
import tile_etl_spark.operators.sqlsurface  # noqa: F401
import tile_etl_spark.operators.windows  # noqa: F401
import tile_etl_spark.operators.workloads  # noqa: F401

# Scalar function families + Python UDF surface
import tile_etl_spark.functions.scalar  # noqa: F401
import tile_etl_spark.functions.udfs  # noqa: F401

# Structured Streaming (B-checked against batch twins)
import tile_etl_spark.streaming.queries  # noqa: F401

# LLM-data-pipeline extensions
import tile_etl_spark.llm.curation  # noqa: F401
import tile_etl_spark.llm.dedup  # noqa: F401
import tile_etl_spark.llm.multimodal  # noqa: F401
import tile_etl_spark.llm.similarity  # noqa: F401
import tile_etl_spark.llm.text  # noqa: F401
