"""Transcript hygiene operators (stages/transcript_ops.py): hand-computed
truths on a tiny fixture, planted-noise liveness on the derived sf0.001
corpus, and prefix/idempotency invariants."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.sources.derive import noisy_turns_from_documents
from epstein_pipeline_ray.stages.transcript_ops import (
    collapse_repeat_turns,
    conv_health,
    tool_transitions,
    truncate_to_token_budget,
    with_token_counts,
)

SF = "/root/testdata/sf0.001"


def _fixture() -> pa.Table:
    # conv A: role repeat at t2, ts regression at t3, idx gap 3->5,
    #         stutter (role+text repeat) at t5, tools on t0/t2/t5
    # conv B: clean two-turn exchange, one tool
    rows = [
        ("A", 0, "user", "hello there", "search", 100),
        ("A", 1, "assistant", "hi", "", 200),
        ("A", 2, "assistant", "extra", "code", 300),   # role repeat
        ("A", 3, "user", "go on", "", 250),            # ts regression
        ("A", 5, "assistant", "sure thing", "", 400),  # idx gap
        ("A", 6, "assistant", "sure thing", "code", 500),  # stutter
        ("B", 0, "user", "one two three", "browse", 100),
        ("B", 1, "assistant", "four", "", 200),
    ]
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.large_string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
        }
    )


def test_conv_health_hand_truth(ray_session):
    out = conv_health(rd.from_arrow(_fixture())).to_pandas()
    out = out.set_index("conv_id").sort_index()
    a = out.loc["A"]
    assert a.n_turns == 6
    assert a.n_role_repeats == 2      # t2 after t1, t6 after t5
    assert a.n_ts_regressions == 1    # t3
    assert a.n_idx_gaps == 1          # 3->5; 5->6 is +1
    assert a.n_tool_turns == 3
    b = out.loc["B"]
    assert (b.n_turns, b.n_role_repeats, b.n_ts_regressions,
            b.n_idx_gaps, b.n_tool_turns) == (2, 0, 0, 0, 1)


def test_collapse_hand_truth_and_idempotent(ray_session):
    ds = rd.from_arrow(_fixture())
    once = collapse_repeat_turns(ds).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    # only the stutter (A, t6) goes; the non-adjacent 'sure thing' stays
    assert len(once) == 7
    assert (once.conv_id + ":" + once.turn_idx.astype(str)).tolist() == [
        "A:0", "A:1", "A:2", "A:3", "A:5", "B:0", "B:1"]
    twice = collapse_repeat_turns(rd.from_arrow(pa.Table.from_pandas(
        once, preserve_index=False))).to_pandas()
    assert len(twice) == len(once)


def test_token_budget_prefix_rule(ray_session):
    ds = rd.from_arrow(_fixture())
    kept = truncate_to_token_budget(ds, budget=4, key="conv_id").to_pandas()
    kept = kept.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # A: 2 + 1 + 1 = 4 <= 4, next (t3: 2) would exceed -> 3 turns kept
    # B: 3 + 1 = 4 -> both kept
    assert kept.groupby("conv_id").size().to_dict() == {"A": 3, "B": 2}
    # kept set is a PREFIX: max kept turn_idx has no dropped turn below it
    assert kept[kept.conv_id == "A"].turn_idx.tolist() == [0, 1, 2]
    assert kept[kept.conv_id == "A"].cum_tokens.tolist() == [2.0, 3.0, 4.0]


def test_with_token_counts_empty_text(ray_session):
    t = pa.table({"text": pa.array(["", "a", "a b"], pa.large_string())})
    out = with_token_counts(rd.from_arrow(t)).to_pandas()
    assert out.n_tokens.tolist() == [0, 1, 2]


def test_tool_transitions_hand_truth(ray_session):
    out = tool_transitions(rd.from_arrow(_fixture())).to_pandas()
    got = {(r.tool_from, r.tool_to): r.n for r in out.itertuples()}
    # A tools in order: search(t0) -> code(t2) -> code(t6); B: browse only
    assert got == {("search", "code"): 1, ("code", "code"): 1}


def test_planted_noise_is_live_at_sf(ray_session):
    """The derived corpus actually exercises every rule: each health
    counter is positive somewhere, the collapse drops rows, and the
    budget truncates rows."""
    turns = noisy_turns_from_documents(SF).materialize()
    n_raw = turns.count()
    health = conv_health(turns).to_pandas()
    for c in ["n_role_repeats", "n_ts_regressions", "n_idx_gaps",
              "n_tool_turns"]:
        assert health[c].sum() > 0, c
    n_collapsed = collapse_repeat_turns(turns).count()
    assert 0 < n_collapsed < n_raw
    n_kept = truncate_to_token_budget(turns, budget=40).count()
    assert 0 < n_kept < n_raw
    trans = tool_transitions(turns).to_pandas()
    assert trans.n.sum() > 0
    assert set(trans.tool_from) <= {"search", "code", "browse"}


def test_global_turn_dedup_keep_first(ray_session):
    # 'dup text' appears in A(t1), B(t0), B(t3) -> keeper is A:1 (lexico-
    # graphically first conv), n_dups=2; everything unique keeps n_dups=0
    rows = [
        ("A", 0, "u0"), ("A", 1, "dup text"), ("B", 0, "dup text"),
        ("B", 1, "u1"), ("B", 3, "dup text"), ("C", 0, "u2"),
    ]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.large_string()),
    })
    from epstein_pipeline_ray.stages.transcript_ops import global_turn_dedup
    out = global_turn_dedup(rd.from_arrow(t)).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(out) == 4
    keep = {(r.conv_id, r.turn_idx): r.n_dups for r in out.itertuples()}
    assert keep == {("A", 0): 0, ("A", 1): 2, ("B", 1): 0, ("C", 0): 0}


def test_soft_dedup_weights(ray_session):
    import pyarrow as pa
    from epstein_pipeline_ray.stages.exact import soft_dedup_weights
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        # 1 and 3 normalize equal; 5 and 6 blank -> never group
        "text": pa.array(["Hello  World", "unique one", "hello world",
                          "unique two", "", "   "], pa.string()),
    })
    out = soft_dedup_weights(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_copies"] == 2 and out.loc[3, "n_copies"] == 2
    assert out.loc[1, "weight"] == 0.5
    for d in (2, 4, 5, 6):
        assert out.loc[d, "n_copies"] == 1 and out.loc[d, "weight"] == 1.0


def test_context_windows_hand_trace(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.transcript_ops import context_windows

    # conv c1 token counts: 4, 3, 5, 2 with budget 6:
    # prefixes 0,4,7,12 -> windows 0,0,1,2
    rows = [
        ("c1", 0, "a b c d"), ("c1", 1, "e f g"),
        ("c1", 2, "h i j k l"), ("c1", 3, "m n"),
        ("c2", 0, ""),           # empty turn: 0 tokens, window 0
        ("c2", 1, "x"),
    ]
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.large_string()),
    }))
    got = (context_windows(ds, budget=6).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert got.window_id.tolist() == [0, 0, 1, 2, 0, 0]
    assert got.n_tokens.tolist() == [4, 3, 5, 2, 0, 1]


def test_head_tail_truncate_rules(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.textops import head_tail_truncate

    long = " ".join(f"w{i}" for i in range(10))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([long, "a b c", ""], pa.string()),
    }))
    got = (head_tail_truncate(ds, head_words=3, tail_words=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.text.tolist() == ["w0 w1 w2 [...] w8 w9", "a b c", ""]
    assert got.was_truncated.tolist() == [True, False, False]
    assert got.n_words.tolist() == [10, 3, 0]
    # boundary: exactly head+tail words is NOT truncated
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a b c d e"], pa.string()),
    }))
    got2 = head_tail_truncate(ds2, head_words=3, tail_words=2).to_pandas()
    assert got2.was_truncated.tolist() == [False]


def test_frequent_item_pairs_hand_truth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.transcript_ops import frequent_item_pairs

    rows = [
        ("c1", "grep"), ("c1", "read"), ("c1", "grep"),  # dup within basket
        ("c2", "grep"), ("c2", "read"), ("c2", "edit"),
        ("c3", "grep"), ("c3", "read"),
        ("c4", "edit"), ("c4", ""),                       # empty item drops
    ]
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array(list(range(len(rows))), pa.int32()),
        "tool": pa.array([r[1] for r in rows], pa.string()),
    }))
    got = (frequent_item_pairs(ds, min_support=2).to_pandas()
           .sort_values(["item_a", "item_b"]).reset_index(drop=True))
    # (grep, read) in c1+c2+c3 = 3; all other pairs support 1 -> dropped
    assert got.values.tolist() == [["grep", "read", 3]]


def test_turn_latency_hand_truth(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.transcript_ops import turn_latency

    US = 1_000_000
    rows = [
        # conv a: ts 0, 5s, 3s (regression -> negative gap), 13s
        ("a", 0, 0), ("a", 1, 5 * US), ("a", 2, 3 * US), ("a", 3, 13 * US),
        # conv b: single turn -> no output row
        ("b", 0, 0),
        # conv c: rows arrive out of idx order; gaps follow turn_idx
        ("c", 1, 10 * US), ("c", 0, 0),
    ]
    tbl = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "role": pa.array(["user"] * len(rows), pa.string()),
        "text": pa.array(["t"] * len(rows), pa.string()),
    })
    got = (turn_latency(rd.from_arrow(tbl)).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    want = pd.DataFrame({
        "conv_id": ["a", "c"],
        "n_turns": [4, 2],
        "mean_gap_s": [round((5 - 2 + 10) / 3, 9), 10.0],
        "max_gap_s": [10.0, 10.0],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_compression_ratio_signal(ray_session):
    import zlib

    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.textops import with_compression_ratio

    rep = "spam ham " * 200
    import random
    rng = random.Random(7)
    varied = " ".join("".join(rng.choice("abcdefghijklmnop")
                              for _ in range(8)) for _ in range(200))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([rep, varied, ""], pa.string()),
    }))
    got = (with_compression_ratio(docs).to_pandas()
           .set_index("doc_id"))
    # exact zlib pin for the repetitive doc
    raw = rep.encode()
    assert got.loc[1, "compression_ratio"] == round(
        len(zlib.compress(raw, 6)) / len(raw), 6)
    # repetitive text compresses far better than random text
    assert got.loc[1, "compression_ratio"] < 0.1
    assert got.loc[2, "compression_ratio"] > 0.5
    assert got.loc[3, "compression_ratio"] == 0.0
    assert got.loc[3, "n_bytes"] == 0


def test_tokenizer_fertility_cjk_vs_latin(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.textops import tokenizer_fertility

    docs = rd.from_arrow(pa.table({
        "lang": pa.array(["en", "en", "zh", "empty"], pa.string()),
        "text": pa.array([
            "two words",            # 9 bytes, 2 tokens
            "one",                  # 3 bytes, 1 token
            "你好世界",               # 12 bytes, ONE ws token
            "   ",                  # 0 tokens
        ], pa.string()),
    }))
    got = (tokenizer_fertility(docs, "lang").to_pandas()
           .set_index("lang"))
    assert got.loc["en", "n_tokens"] == 3
    assert got.loc["en", "bytes_per_token"] == 4.0  # 12/3
    assert got.loc["zh", "bytes_per_token"] == 12.0  # CJK flagged
    import pandas as pd
    assert pd.isna(got.loc["empty", "bytes_per_token"])


def test_readability_hand_truths(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.functions.rounding import sql_round
    from epstein_pipeline_ray.stages.textops import with_readability

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "The cat sat. The dog ran!",   # 6 words, 2 sentences
            "xyz xyz",                     # y-vowel runs, no .!? -> s=1
            "   ",                         # 0 words -> dropped
            "Hmm... ok?! sure",            # '...' one run, '?!' one run
        ], pa.string()),
    }))
    got = with_readability(docs).to_pandas().set_index("doc_id")
    assert 3 not in got.index
    r1 = got.loc[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (6, 2, 6)
    assert r1.fk_grade == float(sql_round(
        0.39 * (6 / 2) + 11.8 * (6 / 6) - 15.59, 9))
    r2 = got.loc[2]
    assert (r2.n_words, r2.n_sentences, r2.n_syllables) == (2, 1, 2)
    r4 = got.loc[4]
    assert (r4.n_words, r4.n_sentences) == (3, 2)


def test_zipf_slope_hand_truth(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.textops import zipf_slope

    # geometric counts 8,4,2,1 at ranks 1..4: slope = -ln2-exact OLS fit?
    # counts 2^(3-i) vs rank r: y=ln c not linear in ln r; compute ref.
    text = " ".join(["aa"] * 8 + ["bb"] * 4 + ["cc"] * 2 + ["dd"])
    docs = rd.from_arrow(pa.table({
        "source": pa.array(["s1", "s2"], pa.string()),
        "text": pa.array([text, "x x x y"], pa.string()),
    }))
    got = zipf_slope(docs, "source").to_pandas().set_index("source")
    assert got.loc["s1", "vocab"] == 4
    x = np.log(np.arange(1, 5, dtype=np.float64))
    y = np.log(np.array([8.0, 4.0, 2.0, 1.0]))
    n = 4.0
    ref = (n * (x * y).sum() - x.sum() * y.sum()) \
        / (n * (x * x).sum() - x.sum() ** 2)
    assert abs(got.loc["s1", "zipf_slope"] - ref) < 1e-6
    assert got.loc["s1", "zipf_slope"] < -1.0
    # s2: x(3) rank 1, y(1) rank 2 — slope = (ln1-ln3)/(ln2-ln1) < 0
    assert got.loc["s2", "vocab"] == 2
    ref2 = (np.log(1.0) - np.log(3.0)) / (np.log(2.0) - np.log(1.0))
    assert abs(got.loc["s2", "zipf_slope"] - ref2) < 1e-6


def test_distinctive_terms_hand_truth(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.textops import distinctive_terms

    # 'rare' appears only in s1 (5x >= min_count); 'common' everywhere
    docs = rd.from_arrow(pa.table({
        "source": pa.array(["s1", "s2"], pa.string()),
        "text": pa.array([
            "rare rare rare rare rare common common common common common",
            "common common common common common common common common "
            "common common",
        ], pa.string()),
    }))
    got = (distinctive_terms(docs, "source", min_count=5, k=2)
           .to_pandas())
    s1 = got[got.source == "s1"].set_index("term")
    # rare: (5/10)/(5/20) = 2 -> ln 2 ; common: (5/10)/(15/20) < 1
    assert abs(s1.loc["rare", "score"] - np.log(2.0)) < 1e-9
    assert s1.loc["rare", "n"] == 5
    assert s1.loc["common", "score"] < 0
    # ranking: rare first for s1
    assert got[got.source == "s1"].iloc[0].term == "rare"
