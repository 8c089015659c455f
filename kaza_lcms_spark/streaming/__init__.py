"""Structured Streaming surface (SURVEY.md §2.10).

The reference is strictly batch (annual composites; async export *tasks*,
/root/reference/src/utils/exports.py:17,29,44) and resumability is handled
by the checkpoint/lineage layer (sources/catalog.py). This module provides
the noted-but-optional streaming mappings: A1/A3 → event-time tumbling
windows + watermark, J4/J5 → stream-static spatial join — the same fused
kernels run unchanged on streaming DataFrames because they are narrow
mapInPandas transforms — plus a custom stateful operator
(applyInPandasWithState session windows) matching the gated batch
`sessionize` query across micro-batch boundaries.
"""

from .windows import (sessionize_stateful, stream_exact_dedup,  # noqa: F401
                      stream_ingest_catalog, stream_tile_counts,
                      windowed_event_stats)
