"""URL operators — the C4 / RefinedWeb front-door dedup family.

Web-scale corpora dedup by *URL* before any content pass (C4 keeps one
page per URL; RefinedWeb normalizes host + path first). These stages give
the engine that front door over any text column:

  extract_urls      text -> one row per URL occurrence, with the
                    normalized registrable host attached
  url_domain_stats  per-domain occurrence + distinct-URL counts
                    (the crawl-mix histogram a curation run starts from)
  url_keep_first    one row per normalized URL keeping the smallest id —
                    the C4 URL-dedup keep-first rule

Normalization convention (shared verbatim with the SQL twin):
  url    = regex match of ``https?://[^\\s<>"')\\]]+`` with trailing
           ``.,;:!?`` stripped
  domain = authority before the first ``/?#``, lowercased, leading
           ``www.`` and trailing ``:port`` stripped

All three are map-side bounded: extraction is per-doc work, the two
aggregates collapse each batch to per-key partials before their single
keyed exchange — at 100 TB the shuffle moves (domain|url)-sized rows,
never text.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from epstein_pipeline_ray.stages.groupblock import map_key_blocks

_URL_RE = re.compile(r"https?://[^\s<>\"')\]]+")
_TRAIL = ".,;:!?"


def _domains(urls: pa.Array) -> pa.Array:
    """Vectorized normalized host per URL (see module convention)."""
    host = pc.struct_field(
        pc.extract_regex(urls, r"^https?://(?P<h>[^/?#]+)"), "h")
    host = pc.utf8_lower(host)
    host = pc.replace_substring_regex(host, r"^www\.", "", max_replacements=1)
    return pc.replace_substring_regex(host, r":[0-9]+$", "",
                                      max_replacements=1)


def extract_urls(docs: Dataset, id_col: str = "doc_id",
                 text_col: str = "text") -> Dataset:
    """One row per URL occurrence: (id, url, domain). The findall loop is
    per-doc bounded; domain normalization is three Arrow regex kernels
    over the matched URLs only."""
    def per_batch(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        idx: list[int] = []
        urls: list[str] = []
        for i, t in enumerate(texts):
            for m in _URL_RE.findall(t or ""):
                u = m.rstrip(_TRAIL)
                if u:
                    idx.append(i)
                    urls.append(u)
        uarr = pa.array(urls, pa.string())
        return pa.table({
            id_col: batch[id_col].take(pa.array(idx, pa.int64())),
            "url": uarr,
            "domain": _domains(uarr),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True)


def url_domain_stats(urls: Dataset,
                     num_partitions: int | None = None) -> Dataset:
    """Per-domain (n_urls = occurrences, n_distinct = distinct URLs) in
    ONE keyed exchange: each batch collapses to (domain, url) -> count
    partials, the exchange moves those partials, the reduce sums counts
    and nuniques urls per domain block."""
    pruned = urls.select_columns(["domain", "url"])

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, ["domain", "url"]).aggregate(
            [([], "count_all")])
        return pa.table({"domain": g["domain"], "url": g["url"],
                         "c": g["count_all"].cast(pa.int64())})

    def per_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"domain": pa.array([], pa.string()),
                             "n_urls": pa.array([], pa.int64()),
                             "n_distinct": pa.array([], pa.int64())})
        df = block.to_pandas()
        out = (df.groupby("domain", sort=True)
               .agg(n_urls=("c", "sum"), n_distinct=("url", "nunique"))
               .reset_index())
        return pa.table({
            "domain": pa.array(out["domain"], pa.string()),
            "n_urls": pa.array(out["n_urls"].to_numpy(np.int64), pa.int64()),
            "n_distinct": pa.array(out["n_distinct"].to_numpy(np.int64),
                                   pa.int64()),
        })

    partials = pruned.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return map_key_blocks(partials, ["domain"], per_block, num_partitions,
                          sort_blocks=False)


def url_keep_first(urls: Dataset, id_col: str = "doc_id",
                   num_partitions: int | None = None) -> Dataset:
    """C4 URL dedup: one row per normalized URL keeping the smallest id.
    min() is decomposable — map-side (url -> min id) partials, one
    url-keyed exchange, min-of-mins per block."""
    pruned = urls.select_columns(["url", id_col])
    id_type = pruned.schema(fetch_if_missing=True).base_schema.field(
        id_col).type

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, ["url"]).aggregate([(id_col, "min")])
        return pa.table({"url": g["url"], id_col: g[f"{id_col}_min"]})

    def per_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"url": pa.array([], pa.string()),
                             id_col: pa.array([], id_type)})
        g = pa.TableGroupBy(block, ["url"]).aggregate([(id_col, "min")])
        g = pa.table({"url": g["url"], id_col: g[f"{id_col}_min"]})
        return g.sort_by("url")

    partials = pruned.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return map_key_blocks(partials, ["url"], per_block, num_partitions,
                          sort_blocks=False)
