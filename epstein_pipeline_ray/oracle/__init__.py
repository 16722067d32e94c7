"""Reference-semantics oracle used by the conformance tests."""

from epstein_pipeline_ray.oracle.refsem import (
    OraclePair,
    oracle_clusters,
    oracle_pairs,
    rollup_turns_pandas,
)

__all__ = ["OraclePair", "oracle_pairs", "oracle_clusters", "rollup_turns_pandas"]
