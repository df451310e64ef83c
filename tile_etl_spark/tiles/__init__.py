"""Tile-ETL core: the reference pipeline as DataFrame builders.

Reference semantics: /root/reference/src/Program.cs (cited as P:…) and
/root/reference/reference/EtlToS3.cs (S:…). SURVEY.md §2A maps every
reference operator A1–A14 onto these builders.
"""

from tile_etl_spark.tiles.grid import (  # noqa: F401
    EXTENT,
    LEVELS,
    PADDING,
    WEB_MERCATOR_DELTA,
    level_bounds,
    tile_grid,
)
