"""The three keyed-exchange backends (disk / hash / sort, EPR_SHUFFLE)
must produce identical flagship output — guards the non-default physical
plans the engine can fall back to on clusters without local shuffle disk."""

import pandas as pd
import pytest
import ray.data as rd

from epstein_pipeline_ray.pipelines.dedup import dedup_turns
from epstein_pipeline_ray.sources.synth import turns_table


def _run(monkeypatch, backend):
    monkeypatch.setenv("EPR_SHUFFLE", backend)
    res = dedup_turns(rd.from_arrow(turns_table(200, seed=9)))
    pairs = (res.pairs.to_pandas()
             .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    clusters = (res.clusters.to_pandas()
                .sort_values("conv_id").reset_index(drop=True))
    return pairs, clusters


@pytest.mark.parametrize("backend", ["hash", "sort"])
def test_backend_equals_disk(ray_session, monkeypatch, backend):
    base_pairs, base_clusters = _run(monkeypatch, "disk")
    pairs, clusters = _run(monkeypatch, backend)
    pd.testing.assert_frame_equal(base_pairs, pairs)
    pd.testing.assert_frame_equal(base_clusters, clusters)
    assert len(base_pairs) > 0
