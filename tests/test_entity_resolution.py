"""Blocked entity resolution (reference J5/J6) — exact + fuzzy tiers and
merge-map application."""

import pyarrow as pa
import pytest


@pytest.fixture()
def people(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "pid": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "name": [
                "Martha Jones",
                "martha jones",    # exact after normalize → 1
                "Martha Jhones",   # fuzzy (JW high, same block 'martha') → 1
                "Bob Smith",
                "Bob Smyth",       # fuzzy → 4
                "Carol White",     # singleton
            ],
        }
    )
    return rd.from_arrow(t)


def test_exact_tier(people):
    from epstein_pipeline_ray.stages.entity_resolution import resolve_entities

    out = resolve_entities(people, "pid", "name").to_pandas().set_index("entity_id")
    assert out.loc[2, "canonical_id"] == 1
    assert out.loc[3, "canonical_id"] == 3  # fuzzy off: stays itself
    assert out.loc[6, "canonical_id"] == 6


def test_fuzzy_tier_and_apply(people, ray_session):
    import ray.data as rd

    from epstein_pipeline_ray.stages.entity_resolution import (
        apply_merge_map,
        resolve_entities,
    )

    merge = resolve_entities(people, "pid", "name", fuzzy_threshold=0.93)
    out = merge.to_pandas().set_index("entity_id")
    assert out.loc[2, "canonical_id"] == 1
    assert out.loc[3, "canonical_id"] == 1
    assert out.loc[5, "canonical_id"] == 4
    assert out.loc[6, "canonical_id"] == 6

    refs = rd.from_arrow(
        pa.table({"doc": ["d1", "d2", "d3"], "pid": pa.array([2, 5, 6], pa.int64())})
    )
    applied = apply_merge_map(refs, merge, "pid").to_pandas().sort_values("doc")
    assert applied["pid"].tolist() == [1, 4, 6]
