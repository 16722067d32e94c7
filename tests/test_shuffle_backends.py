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


@pytest.mark.parametrize("backend", ["hash", "sort"])
def test_session4_ops_backend_equivalence(ray_session, monkeypatch,
                                          backend):
    """kcore / funnel / rank_stats / SNM must be exchange-backend
    agnostic (block fns sort internally; edge streams are bounded)."""
    import numpy as np
    import pyarrow as pa

    from epstein_pipeline_ray.stages.entity_resolution import (
        sorted_neighborhood_pairs)
    from epstein_pipeline_ray.stages.graph_algo import kcore
    from epstein_pipeline_ray.stages.relational import (
        funnel_steps, with_group_rank_stats)

    rng = np.random.RandomState(7)
    E = sorted({(int(rng.randint(0, 40)), int(rng.randint(0, 40)))
                for _ in range(160)})
    edges_tbl = pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64())})
    ev_tbl = pa.table({
        "user_id": pa.array([int(x) for x in rng.randint(0, 9, 120)],
                            pa.int64()),
        "event_type": pa.array([["view", "click", "purchase", "x"][i]
                                for i in rng.randint(0, 4, 120)],
                               pa.string()),
        "ts": pa.array([int(x) * 1_000_000 for x in
                        rng.randint(0, 500, 120)], pa.timestamp("us")),
        "event_id": pa.array(list(range(120)), pa.int64()),
        "v": pa.array([int(x) for x in rng.randint(0, 6, 120)],
                      pa.int64()),
    })
    snm_tbl = pa.table({
        "id": pa.array(list(range(40)), pa.int64()),
        "k": pa.array(["abcdefgh"[int(x)] + "abcdefgh"[int(y)]
                       for x, y in zip(rng.randint(0, 8, 40),
                                       rng.randint(0, 8, 40))],
                      pa.string()),
    })

    def run_all():
        kc = (kcore(rd.from_arrow(edges_tbl), k=3, rounds=4).to_pandas()
              .sort_values("node").reset_index(drop=True))
        fn = (funnel_steps(rd.from_arrow(ev_tbl),
                           ["view", "click", "purchase"]).to_pandas()
              .sort_values("user_id").reset_index(drop=True))
        rs = (with_group_rank_stats(
                  rd.from_arrow(ev_tbl).select_columns(
                      ["event_id", "user_id", "v"]), "user_id", "v")
              .to_pandas().sort_values("event_id")
              .reset_index(drop=True))
        sn = (sorted_neighborhood_pairs(rd.from_arrow(snm_tbl), "id", "k",
                                        window=3).to_pandas()
              .drop_duplicates().sort_values(["id_a", "id_b"])
              .reset_index(drop=True))
        return kc, fn, rs, sn

    monkeypatch.setenv("EPR_SHUFFLE", "disk")
    base = run_all()
    monkeypatch.setenv("EPR_SHUFFLE", backend)
    got = run_all()
    for b, g in zip(base, got):
        pd.testing.assert_frame_equal(b, g)
    assert len(base[0]) > 0 and len(base[3]) > 0


@pytest.mark.parametrize("backend", ["hash", "sort"])
def test_session6_keyed_ops_backend_equivalence(ray_session, monkeypatch,
                                                backend):
    """grouped_auc / scd2_intervals / event_throttle / grouped_string_agg
    / rrf_fusion block fns sort internally — identical output on every
    exchange backend."""
    import datetime as dt

    import numpy as np
    import pyarrow as pa

    from epstein_pipeline_ray.stages.cdc import scd2_intervals
    from epstein_pipeline_ray.stages.evalmetrics import grouped_auc
    from epstein_pipeline_ray.stages.ranking import rrf_fusion
    from epstein_pipeline_ray.stages.relational import (
        event_throttle,
        grouped_string_agg,
    )

    rng = np.random.default_rng(11)
    n = 400
    t0 = dt.datetime(2024, 1, 1)
    tbl = pa.table({
        "k": pa.array((rng.integers(0, 9, n)).astype("U"), pa.string()),
        "id": pa.array(np.arange(n), pa.int64()),
        "score": pa.array(rng.integers(0, 40, n).astype(np.float64)),
        "sb": pa.array(rng.integers(0, 40, n), pa.int64()),
        "y": pa.array(rng.integers(0, 2, n), pa.int64()),
        "ver": pa.array(rng.integers(0, 50, n), pa.int64()),
        "ts": pa.array([t0 + dt.timedelta(seconds=int(s))
                        for s in rng.integers(0, 5000, n)],
                       pa.timestamp("us")),
    })

    def run(be):
        monkeypatch.setenv("EPR_SHUFFLE", be)
        ds = rd.from_arrow(tbl).repartition(7)
        outs = []
        outs.append(grouped_auc(ds, "k", "score", "y").to_pandas()
                    .sort_values("k").reset_index(drop=True))
        outs.append(scd2_intervals(ds, "k", "ver", "score").to_pandas()
                    .sort_values(["k", "valid_from"])
                    .reset_index(drop=True))
        outs.append(event_throttle(
            ds.select_columns(["k", "ts", "id"]), ["k"], "ts", "id",
            min_gap_s=30).to_pandas().sort_values("id")
            .reset_index(drop=True))
        outs.append(grouped_string_agg(ds, "k", "id", "ts").to_pandas()
                    .sort_values("k").reset_index(drop=True))
        outs.append(rrf_fusion(ds, "k", "score", "sb", "id").to_pandas()
                    .sort_values(["k", "id"]).reset_index(drop=True))
        return outs

    base = run("disk")
    other = run(backend)
    for a, b in zip(base, other):
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0


def test_multinode_unsafe_disk_fails_over_to_sort(ray_session, monkeypatch,
                                                  caplog):
    """Faked multi-node + non-shared exchange dir: the disk backend must
    NOT be used (its shards would be unreadable across nodes) — the
    dispatcher fails over to the sort backend with a logged warning and
    produces the same result."""
    import logging

    import pyarrow as pa

    from epstein_pipeline_ray.stages import exchange, groupblock
    from epstein_pipeline_ray.stages.relational import grouped_string_agg

    tbl = pa.table({
        "k": pa.array(["a", "b", "a", "c", "b", "a"], pa.string()),
        "id": pa.array([5, 1, 3, 9, 2, 4], pa.int64()),
        "ts": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    })

    monkeypatch.setenv("EPR_SHUFFLE", "sort")
    want = (grouped_string_agg(rd.from_arrow(tbl), "k", "id", "ts")
            .to_pandas().sort_values("k").reset_index(drop=True))

    # fresh memo + warning flag; monkeypatch restores both afterwards so
    # the (single-node-safe) verdict is re-probed by later tests
    monkeypatch.setattr(exchange, "_SAFETY_CHECKED", {})
    monkeypatch.setattr(groupblock, "_DISK_UNSAFE_WARNED", False)
    monkeypatch.setenv("EPR_FAKE_MULTINODE", "2")
    monkeypatch.setenv("EPR_SHUFFLE", "disk")
    monkeypatch.delenv("EPR_EXCHANGE_SHARED", raising=False)

    def boom(*a, **kw):
        raise AssertionError("disk exchange must not run on an unsafe "
                             "multi-node layout")

    monkeypatch.setattr(exchange, "exchange_key_blocks", boom)
    with caplog.at_level(logging.WARNING,
                         logger="epstein_pipeline_ray.stages.groupblock"):
        got = (grouped_string_agg(rd.from_arrow(tbl), "k", "id", "ts")
               .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(want, got)
    assert any("failing over to the sort backend" in r.message
               for r in caplog.records)

    # asserting shared storage re-enables the disk exchange
    monkeypatch.setattr(exchange, "_SAFETY_CHECKED", {})
    monkeypatch.setenv("EPR_EXCHANGE_SHARED", "1")
    assert exchange.disk_exchange_is_safe("/tmp/epr_does_not_matter")


def test_exchange_resume_rereads_shards(ray_session, tmp_path):
    """A completed exchange (explicit dir, _SUCCESS + manifest) is
    re-read on the next invocation WITHOUT executing the input: the
    second call's input dataset raises if any of its rows are pulled."""
    import pyarrow as pa

    from epstein_pipeline_ray.stages.exchange import exchange_key_blocks

    tbl = pa.table({
        "k": pa.array([1, 2, 1, 3, 2, 1], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
    })

    def per_block(t: pa.Table) -> pa.Table:
        import numpy as np
        k = np.asarray(t["k"].to_numpy(zero_copy_only=False), np.int64)
        v = np.asarray(t["v"].to_numpy(zero_copy_only=False), np.int64)
        if not len(k):
            return pa.table({"k": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        starts = np.concatenate([[0], np.nonzero(k[1:] != k[:-1])[0] + 1])
        sums = np.add.reduceat(v, starts) if len(v) else v
        return pa.table({"k": pa.array(k[starts], pa.int64()),
                         "s": pa.array(sums, pa.int64())})

    exch = str(tmp_path / "exch")
    first = (exchange_key_blocks(rd.from_arrow(tbl), ["k"], per_block, 4,
                                 exchange_dir=exch)
             .to_pandas().sort_values("k").reset_index(drop=True))

    def poison(batch: pa.Table) -> pa.Table:
        raise RuntimeError("input must not be recomputed on resume")

    poisoned = rd.from_arrow(tbl).map_batches(poison,
                                              batch_format="pyarrow")
    second = (exchange_key_blocks(poisoned, ["k"], per_block, 4,
                                  exchange_dir=exch)
              .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(first, second)
    assert first["s"].tolist() == [100, 70, 40]


def test_auto_partitions_grows_with_input(ray_session):
    """Width must GROW beyond the default for big exchange inputs (the
    round-5 straggler fix): ~32 MB per partition above the default,
    ~8 MB below, floor 4, cap 4096 — so one partition always fits a
    worker heap."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.exchange import auto_partitions_from

    tiny = rd.from_arrow(pa.table({"x": np.zeros(100)})).materialize()
    assert auto_partitions_from(tiny, 32) == 4
    # ~512 MB dataset -> well above the 32-wide default: expect ~16
    big = rd.from_arrow(pa.table(
        {"x": np.zeros(64 << 20, np.int64)})).materialize()  # 512 MB
    w = auto_partitions_from(big, 8)
    assert w == 16, w          # 512 MB / 32 MB, grown past default=8
    assert auto_partitions_from(big, 32) == 32  # shrink rule still caps
