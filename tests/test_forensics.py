"""Embedded-plist forensics: kernel exactness + the Ray stage."""

import plistlib

import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.stages.forensics import (
    extract_plist_metadata,
    extract_plists_from_bytes,
    synth_plist_corpus,
)


def test_kernel_extracts_xml_and_binary_exactly():
    t = synth_plist_corpus(12)
    for i in range(12):
        metas = extract_plists_from_bytes(t["payload"][i].as_py())
        if i % 3 == 0:
            assert len(metas) == 1
            m = metas[0]
            assert m["sender"] == f"user{i}@example.com"
            assert m["recipients"] == [f"a{i}@example.com", f"b{i}@example.com"]
            assert m["subject"] == f"Re: matter {i}"
            assert m["plist_type"] == ("xml" if i % 2 == 0 else "binary")
        else:
            assert metas == []


def test_kernel_ignores_noise_and_useless_plists():
    # truncated magic, empty payload, and a plist with no mail keys
    assert extract_plists_from_bytes(b"junk bplist00" + b"\x00" * 64) == []
    assert extract_plists_from_bytes(b"") == []
    useless = plistlib.dumps({"Version": "1.0"}, fmt=plistlib.FMT_XML)
    assert extract_plists_from_bytes(b"pre" + useless + b"post") == []


def test_kernel_multiple_plists_one_payload():
    a = plistlib.dumps({"sender": "x@y.z", "subject": "one"}, fmt=plistlib.FMT_XML)
    b = plistlib.dumps({"X-Sender": "q@r.s", "Subject": "two"}, fmt=plistlib.FMT_XML)
    metas = extract_plists_from_bytes(b"junk" + a + b"mid" + b + b"tail")
    assert [m["subject"] for m in metas] == ["one", "two"]
    assert [m["sender"] for m in metas] == ["x@y.z", "q@r.s"]


def test_stage_preserves_custom_id_column(ray_session):
    # a non-default id column name AND a non-string id type must survive
    t = synth_plist_corpus(9)
    t2 = pa.table(
        {
            "file_no": pa.array(range(9), pa.int64()),
            "payload": t["payload"],
        }
    )
    out_ds = extract_plist_metadata(rd.from_arrow(t2), id_col="file_no")
    sch = out_ds.schema()
    assert sch.names[0] == "file_no"
    assert sch.types[0] == pa.int64()
    out = out_ds.to_pandas()
    assert sorted(out.file_no) == [0, 3, 6]


def test_stage_parallel_scan(ray_session):
    docs = rd.from_arrow(synth_plist_corpus(90))
    out = extract_plist_metadata(docs).to_pandas()
    assert len(out) == 30  # every third payload embeds exactly one plist
    assert set(out.plist_type) == {"xml", "binary"}
    assert (out.sender.str.endswith("@example.com")).all()
    # typed nested column survives the stage
    sch = extract_plist_metadata(rd.from_arrow(synth_plist_corpus(6))).schema()
    assert sch.types[sch.names.index("recipients")] == pa.list_(pa.string())


def test_benford_deviation_signal(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from epstein_pipeline_ray.stages.forensics import benford_deviation

    rng = np.random.RandomState(7)
    # benford-ish: log-uniform magnitudes; fabricated: all lead with 5
    benfordish = np.exp(rng.uniform(np.log(0.01), np.log(900), 800))
    fabricated = rng.uniform(5.0, 5.99, 800)
    tbl = pa.table({
        "k": pa.array(["real"] * 800 + ["fake"] * 800, pa.string()),
        "v": pa.array(np.concatenate([benfordish, fabricated]),
                      pa.float64()),
    })
    got = (benford_deviation(rd.from_arrow(tbl), "k", "v").to_pandas()
           .set_index("k"))
    # a single-digit distribution is maximally non-benford
    assert got.loc["fake", "chi2"] > 10 * got.loc["real", "chi2"]
    assert got.loc["fake", "max_digit_gap"] > 0.5
    assert got.loc["real", "n"] == 800
