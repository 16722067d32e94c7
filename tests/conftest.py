"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_turns():
    """~50 convs / a few hundred turns, shuffled row order (FIXTURES.md 'tiny')."""
    from epstein_pipeline_ray.sources.synth import turns_table

    return turns_table(50, seed=42)


@pytest.fixture(scope="session")
def small_turns():
    """~2k convs (FIXTURES.md 'small') for the recall harness."""
    from epstein_pipeline_ray.sources.synth import turns_table

    return turns_table(2000, seed=42)


@pytest.fixture(scope="session")
def small_docs(small_turns):
    """Rolled-up (conv_id, text) docs of the small corpus, via pandas twin."""
    from epstein_pipeline_ray.oracle.refsem import rollup_turns_pandas

    df = rollup_turns_pandas(small_turns.to_pandas())
    return list(zip(df.conv_id, df.text))
