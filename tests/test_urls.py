"""URL operator family: extraction/normalization conventions and the two
aggregates (stages/urls.py)."""

import pyarrow as pa
import ray.data as rd

from epstein_pipeline_ray.stages.urls import (
    extract_urls,
    url_domain_stats,
    url_keep_first,
)


def _corpus():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "see https://WWW.Example.COM/a. and http://example.com:8080/b,",
            "no urls here",
            "dup https://www.example.com/a plus https://other.org/x?q=1)",
            "again https://www.example.com/a",
        ], pa.string()),
    }))


def test_extract_urls_conventions(ray_session):
    got = (extract_urls(_corpus()).to_pandas()
           .sort_values(["doc_id", "url"]).reset_index(drop=True))
    # doc 2 has no URLs; docs 1/3 have two each, doc 4 one
    assert got.doc_id.tolist() == [1, 1, 3, 3, 4]
    # trailing '.' and ',' stripped; scheme/case preserved in url
    assert got.url.tolist() == [
        "http://example.com:8080/b",
        "https://WWW.Example.COM/a",
        "https://other.org/x?q=1",
        "https://www.example.com/a",
        "https://www.example.com/a",
    ]
    # domain: lowercased, www. and :port stripped, query ignored
    assert got.domain.tolist() == [
        "example.com", "example.com", "other.org",
        "example.com", "example.com",
    ]


def test_url_domain_stats_and_keep_first(ray_session):
    urls = extract_urls(_corpus())
    stats = (url_domain_stats(urls).to_pandas()
             .set_index("domain").sort_index())
    assert stats.loc["example.com", "n_urls"] == 4
    # WWW.Example.COM/a and www.example.com/a are DISTINCT raw urls
    assert stats.loc["example.com", "n_distinct"] == 3
    assert stats.loc["other.org", "n_urls"] == 1

    first = url_keep_first(urls).to_pandas().set_index("url")
    assert first.loc["https://www.example.com/a", "doc_id"] == 3
    assert first.loc["https://WWW.Example.COM/a", "doc_id"] == 1
    assert len(first) == 4
