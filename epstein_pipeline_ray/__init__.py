"""epstein_pipeline_ray — a Ray-Data-native data-processing engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo (stonesalltheway1/Epstein-Pipeline)
on top of ``ray.data.Dataset`` pipelines: zero-copy Arrow batches,
actor pools for stateful stages, groupby/aggregate shuffles for the
wide steps, streaming execution throughout.

Flagship subsystem: near-duplicate detection + clustering over Parquet
tables of multi-turn conversation/agent transcripts
(MinHash → LSH banding → verification → union-find), mirroring the
semantics of the reference's dedup processor
(reference: src/epstein_pipeline/processors/dedup.py) while replacing
its single-process in-memory engine with distributed dataflow.

Nothing in this package calls ``ray.init()`` — the caller owns the Ray
session (driver, bench.py, or the pytest fixture).
"""

from epstein_pipeline_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
