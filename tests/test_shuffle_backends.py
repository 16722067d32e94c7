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


@pytest.mark.parametrize("backend", ["hash", "sort"])
def test_corpus_dedup_ops_backend_equivalence(ray_session, monkeypatch,
                                              backend):
    """line_dedup / containment / prefix_dedup ride map_key_blocks with
    sort_blocks=False — their block fns must be exchange-backend
    agnostic (each sorts internally)."""
    import numpy as np
    import pyarrow as pa

    from epstein_pipeline_ray.stages.corpus_dedup import (containment_pairs,
                                                          line_dedup_corpus)
    from epstein_pipeline_ray.stages.transcript_ops import conv_prefix_dedup

    rng = np.random.default_rng(5)
    words = "a b c d e f g h".split()
    rows = [(i, " ".join(words[int(rng.integers(0, 8))] for _ in
                         range(int(rng.integers(4, 25))))) for i in range(50)]
    rows += [(100, rows[0][1]), (101, rows[1][1])]
    docs_tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    turns_rows = [(f"c{i%7}", i // 7, f"t {i % 11} {i % 5}")
                  for i in range(70)]
    turns_tbl = pa.table({
        "conv_id": pa.array([r[0] for r in turns_rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in turns_rows], pa.int32()),
        "text": pa.array([r[2] for r in turns_rows], pa.large_string()),
    })

    def run(be):
        monkeypatch.setenv("EPR_SHUFFLE", be)
        ld = (line_dedup_corpus(rd.from_arrow(docs_tbl), width=3)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
        cp = (containment_pairs(rd.from_arrow(docs_tbl), threshold=0.5,
                                ngram=2)
              .to_pandas().sort_values(["id_a", "id_b"])
              .reset_index(drop=True))
        pf = (conv_prefix_dedup(rd.from_arrow(turns_tbl))
              .to_pandas().sort_values("conv_id").reset_index(drop=True))
        return ld, cp, pf

    base = run("disk")
    got = run(backend)
    for b, g in zip(base, got):
        pd.testing.assert_frame_equal(b, g)
    assert len(base[1]) > 0
