"""Cell-clustered table layout — the data-layout half of the tiling
engine (BASELINE.json::north_star "Iceberg tables of image+caption pairs
… raster↔vector tile assignment").

At 10¹² rows the scan layer decides whether an AOI-bounded query reads
the whole corpus or a sliver of it. Space-filling-curve clustering is the
standard Iceberg/Delta recipe: range-partition rows by their Morton cell
id and sort within partitions, so every parquet file covers a tight,
pairwise-disjoint cell range and carries column min/max statistics. An
AOI-bounded scan (cell_id BETWEEN lo AND hi — Morton ranges of the AOI's
covering cells) then skips whole files/row groups from footer stats
alone, before any row is decoded. The Morton curve (kernels/grid.py)
makes 2-D locality 1-D-range-friendly: spatially close cells share id
prefixes, so AOI probes touch few ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_clustered(df: DataFrame, cell_col: str = "cell_id",
                   n_files: int | None = None) -> DataFrame:
    """Return ``df`` re-arranged for a cell-clustered write:
    ``repartitionByRange`` on the Morton cell id (disjoint id ranges per
    output file, sampled range boundaries) + ``sortWithinPartitions`` so
    row groups inside each file are tight too. Write the result with any
    sink; parquet min/max stats per file/row-group then prune
    AOI-bounded scans (tested at the footer level).

    One shuffle, same cost class as any repartition of the write — paid
    once at ingest, saved on every subsequent spatially-bounded read."""
    parted = (df.repartitionByRange(n_files, F.col(cell_col))
              if n_files else df.repartitionByRange(F.col(cell_col)))
    return parted.sortWithinPartitions(cell_col)
