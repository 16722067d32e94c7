"""Tiered confidence matching of text mentions against a person/entity
registry (reference: src/epstein_pipeline/processors/confidence.py:30-119
``ConfidenceScorer.score_entity_match`` + models/registry.py A9).

The ladder, in order (first hit wins):

    exact canonical name   → 1.00  'exact'
    exact alias            → 0.95  'alias'
    token_sort_ratio ≥ .95 → 0.85  'fuzzy'
    token_sort_ratio ≥ .90 → 0.75  'fuzzy'
    registry name ⊂ mention→ 0.60  'substring'   (docstring tier; the
                                    reference scores it in its substring
                                    scan path — optional here)

Reference tie semantics preserved: duplicate normalized names in the
registry overwrite (LAST registry row wins) for exact/alias dicts; the
fuzzy scan keeps the FIRST maximum in registry[+alias] order.

Ray shape: the registry is the classic broadcast small side (``ray.put``
once, read per task — one plasma copy per node); the fuzzy tier runs the
batched-LCS panel from dedup_extra vectorized ACROSS (mention, name)
pairs with a conservative length prefilter, not a Python DP per pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

TIER_EXACT = 1.0
TIER_ALIAS = 0.95
TIER_FUZZY_95 = 0.85
TIER_FUZZY_90 = 0.75
TIER_SUBSTRING = 0.60


def _norm(s: str) -> str:
    return " ".join(s.lower().split())


def _token_sort(s: str) -> str:
    return " ".join(sorted(s.split()))


def build_registry_state(registry: pd.DataFrame) -> dict:
    """Precompute lookup state from (person_id, name[, aliases]) rows —
    done ONCE on the driver, shipped via ray.put."""
    exact: dict[str, object] = {}
    alias: dict[str, object] = {}
    all_names: list[tuple[str, object]] = []
    has_alias = "aliases" in registry.columns
    for row in registry.itertuples(index=False):
        pid = row.person_id
        n = _norm(str(row.name))
        exact[n] = pid
        all_names.append((n, pid))
        if has_alias and row.aliases is not None:
            aliases = row.aliases if isinstance(row.aliases, (list, tuple, np.ndarray)) else [row.aliases]
            for a in aliases:
                if a is None:
                    continue
                na = _norm(str(a))
                alias[na] = pid
                all_names.append((na, pid))
    # token-sorted forms for the fuzzy panel, in registry order
    ts_names = [_token_sort(n) for n, _ in all_names]
    return {
        "exact": exact,
        "alias": alias,
        "names": [n for n, _ in all_names],
        "pids": [p for _, p in all_names],
        "ts_names": ts_names,
    }


def _fuzzy_best(ts_mentions: list[str], ts_names: list[str],
                chunk: int = 256) -> tuple[np.ndarray, np.ndarray]:
    """Best token_sort_ratio of each mention against every name →
    (best_score, best_index first-max in name order). Vectorized via the
    batched LCS panel; pairs that cannot reach 0.90 are length-pruned."""
    from epstein_pipeline_ray.stages.dedup_extra import _batched_lcs

    n_m, n_n = len(ts_mentions), len(ts_names)
    best = np.zeros(n_m, dtype=np.float64)
    best_idx = np.zeros(n_m, dtype=np.int64)
    if n_m == 0 or n_n == 0:
        return best, best_idx
    all_strs = ts_mentions + ts_names
    lens = np.fromiter((len(s) for s in all_strs), dtype=np.int64)
    W = int(lens.max()) if len(all_strs) else 1
    codes = np.full((len(all_strs), max(W, 1)), 0xFFFFFFFF, dtype=np.uint32)
    for r, s in enumerate(all_strs):
        v = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
        codes[r, : v.size] = v
    name_idx = np.arange(n_n, dtype=np.int64) + n_m
    for lo in range(0, n_m, chunk):
        m_idx = np.arange(lo, min(lo + chunk, n_m), dtype=np.int64)
        I = np.repeat(m_idx, n_n)
        J = np.tile(name_idx, m_idx.size)
        la, lb = lens[I], lens[J]
        feasible = np.abs(la - lb) <= 0.10 * (la + lb)
        ratios = np.full(I.size, -1.0)
        if feasible.any():
            lcs = _batched_lcs(codes, lens, I[feasible], J[feasible])
            tot = la[feasible] + lb[feasible]
            with np.errstate(invalid="ignore"):
                ratios[feasible] = np.where(
                    tot > 0, 1.0 - (tot - 2 * lcs) / np.maximum(tot, 1), 1.0)
        panel = ratios.reshape(m_idx.size, n_n)
        best[m_idx] = panel.max(axis=1)
        best_idx[m_idx] = panel.argmax(axis=1)  # first max = registry order
    return best, best_idx


def match_mentions(
    mentions: Dataset,
    registry: pd.DataFrame,
    mention_col: str = "mention",
    enable_fuzzy: bool = True,
    enable_substring: bool = False,
) -> Dataset:
    """One output row per mention row with nullable match columns
    (person_id, confidence, match_type, matched_name)."""
    state_ref = ray.put(build_registry_state(registry))
    pid_type = pa.array(registry["person_id"].head(1)).type if len(registry) else pa.string()
    return _match_with_state(mentions, state_ref, pid_type, mention_col,
                             enable_fuzzy, enable_substring)


def match_mentions_ds(
    mentions: Dataset,
    registry: Dataset,
    mention_col: str = "mention",
    enable_fuzzy: bool = True,
    enable_substring: bool = False,
    order_col: str = "person_id",
    broadcast_rows_limit: int = 5_000_000,
    num_partitions: int | None = None,
) -> Dataset:
    """Dataset-registry variant of :func:`match_mentions` — the registry
    never lands on the driver (VERDICT r2 item 4):

    - at or below ``broadcast_rows_limit``: the lookup state is built
      INSIDE one Ray task from the registry's block refs and shipped by
      object ref (plasma-shared per node) — the driver only moves refs.
      Registry rows are ordered by ``order_col`` to pin the reference's
      row-order tie semantics ("last registry row wins" for exact/alias,
      first-max for fuzzy) deterministically.
    - above the limit: the exact and alias tiers run through the keyed
      exchange on the normalized name (no process holds the registry).
      The fuzzy and substring tiers need the full name panel per batch and
      are broadcast-inherent — they must be disabled at that scale (raises
      otherwise; this is the documented partitioning assumption).
    """
    rsch = registry.schema()
    pid_type = dict(zip(rsch.names, rsch.types))["person_id"]
    n = registry.count()
    if n <= broadcast_rows_limit:

        @ray.remote
        def _build(*tables):
            live = [t for t in tables if t.num_rows]
            if not live:
                return build_registry_state(pd.DataFrame(columns=["person_id", "name"]))
            df = pa.concat_tables(live).to_pandas()
            df = df.sort_values(order_col, kind="mergesort")
            return build_registry_state(df)

        state_ref = _build.remote(*registry.to_arrow_refs())
        return _match_with_state(mentions, state_ref, pid_type, mention_col,
                                 enable_fuzzy, enable_substring)
    if enable_fuzzy or enable_substring:
        raise ValueError(
            "fuzzy/substring tiers need the full name panel per batch "
            "(broadcast-inherent); registry exceeds broadcast_rows_limit — "
            "disable them or raise the limit"
        )
    return _match_exchange(mentions, registry, mention_col, order_col,
                           pid_type, num_partitions)


def _match_exchange(
    mentions: Dataset,
    registry: Dataset,
    mention_col: str,
    order_col: str,
    pid_type: pa.DataType,
    num_partitions: int | None,
) -> Dataset:
    """Exact + alias tiers as one keyed exchange on the normalized name.

    Registry rows expand to one row per (canonical name, kind=exact) plus
    one per alias (kind=alias); per key run the winner is the exact row if
    any, else the alias row, ties within a kind by max ``order_col`` (the
    reference's dict-overwrite = last registry row wins)."""
    import pyarrow.compute as pc

    from epstein_pipeline_ray.stages.groupblock import group_starts, map_key_blocks

    msch = mentions.schema()
    m_cols = list(msch.names)
    m_types = dict(zip(msch.names, msch.types))
    unified = m_cols + ["__key", "__side", "__kind", "__pid", "__ord"]
    out_schema = pa.schema(
        [(c, m_types[c]) for c in m_cols]
        + [("person_id", pid_type), ("confidence", pa.float64()),
           ("match_type", pa.string()), ("matched_name", pa.string())]
    )

    def tag_mentions(batch: pa.Table) -> pa.Table:
        raw = batch[mention_col].to_pylist()
        keys = [None] * len(raw)
        for i, m in enumerate(raw):
            if m is None:
                continue
            nm = _norm(str(m))
            if nm and len(nm) >= 3:
                keys[i] = nm
        cols = {c: batch[c] for c in m_cols}
        cols["__key"] = pa.array(keys, pa.string())
        cols["__side"] = pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        cols["__kind"] = pa.nulls(batch.num_rows, pa.int8())
        cols["__pid"] = pa.nulls(batch.num_rows, pid_type)
        cols["__ord"] = pa.nulls(batch.num_rows, pa.int64())
        return pa.table({c: cols[c] for c in unified})

    has_alias = "aliases" in registry.schema().names

    def tag_registry(batch: pa.Table) -> pa.Table:
        pids = batch["person_id"].to_pylist()
        names = batch["name"].to_pylist()
        orders = batch[order_col].to_pylist()
        aliases = batch["aliases"].to_pylist() if has_alias else [None] * len(pids)
        keys: list[str] = []
        kinds: list[int] = []
        opids: list = []
        oords: list = []
        for pid, nm, od, al in zip(pids, names, orders, aliases):
            n = _norm(str(nm)) if nm is not None else ""
            if n:
                keys.append(n); kinds.append(0); opids.append(pid); oords.append(od)
            for a in (al or []):
                if a is None:
                    continue
                na = _norm(str(a))
                if na:
                    keys.append(na); kinds.append(1); opids.append(pid); oords.append(od)
        k = len(keys)
        cols = {c: pa.nulls(k, m_types[c]) for c in m_cols}
        cols["__key"] = pa.array(keys, pa.string())
        cols["__side"] = pa.array(np.ones(k, dtype=np.int8))
        cols["__kind"] = pa.array(kinds, pa.int8())
        cols["__pid"] = pa.array(opids, pid_type)
        cols["__ord"] = pa.array(oords, pa.int64())
        return pa.table({c: cols[c] for c in unified})

    lt = mentions.map_batches(tag_mentions, batch_format="pyarrow", zero_copy_batch=True)
    rt = registry.map_batches(tag_registry, batch_format="pyarrow", zero_copy_batch=True)
    unioned = lt.union(rt)

    def per_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        # winner first within each key: exact before alias, then max __ord
        block = block.combine_chunks().sort_by([
            ("__key", "ascending"), ("__side", "descending"),
            ("__kind", "ascending"), ("__ord", "descending"),
        ])
        keys = block["__key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        side = np.asarray(block["__side"].to_numpy(zero_copy_only=False))
        valid = np.asarray(keys.is_valid())
        codes = np.asarray(keys.dictionary_encode().indices.fill_null(-1))
        n = len(codes)
        starts = group_starts(codes)
        run_id = np.cumsum(
            np.concatenate([[0], (codes[1:] != codes[:-1]).astype(np.int64)]))
        # per run: the first row is the winning registry row iff side==1
        lead_is_reg = (side[starts] == 1) & valid[starts]
        win_src = np.where(lead_is_reg, starts, 0)[run_id]
        have = lead_is_reg[run_id] & (side == 0) & valid
        pid_col = block["__pid"]
        if isinstance(pid_col, pa.ChunkedArray):
            pid_col = pid_col.combine_chunks()
        kind_col = np.asarray(
            block["__kind"].to_numpy(zero_copy_only=False), dtype=np.float64)
        pid_vals = pid_col.take(pa.array(win_src, pa.int64()))
        pid_vals = pc.if_else(pa.array(have), pid_vals, pa.nulls(n, pid_type))
        conf = np.where(kind_col[win_src] == 0, TIER_EXACT, TIER_ALIAS)
        conf_vals = pc.if_else(pa.array(have), pa.array(conf, pa.float64()),
                               pa.nulls(n, pa.float64()))
        mtype = np.where(kind_col[win_src] == 0, "exact", "alias").astype(object)
        type_vals = pc.if_else(pa.array(have), pa.array(mtype, pa.string()),
                               pa.nulls(n, pa.string()))
        name_vals = pc.if_else(pa.array(have), keys, pa.nulls(n, pa.string()))
        mention_rows = side == 0
        out = block.select(m_cols)
        out = out.append_column("person_id", pid_vals)
        out = out.append_column("confidence", conf_vals)
        out = out.append_column("match_type", type_vals)
        out = out.append_column("matched_name", name_vals)
        return out.filter(pa.array(mention_rows)).cast(out_schema)

    return map_key_blocks(unioned, ["__key"], per_block, num_partitions,
                          sort_blocks=False)


def _match_with_state(
    mentions: Dataset,
    state_ref,
    pid_type: pa.DataType,
    mention_col: str,
    enable_fuzzy: bool,
    enable_substring: bool,
) -> Dataset:

    def score(batch: pa.Table) -> pa.Table:
        st = ray.get(state_ref)
        raw = batch[mention_col].to_pylist()
        n = len(raw)
        pid_out: list = [None] * n
        conf_out: list = [None] * n
        type_out: list = [None] * n
        name_out: list = [None] * n
        fuzzy_rows: list[int] = []
        fuzzy_norms: list[str] = []
        for i, m in enumerate(raw):
            norm = _norm(str(m)) if m is not None else ""
            if not norm or len(norm) < 3:
                continue
            pid = st["exact"].get(norm)
            if pid is not None:
                pid_out[i], conf_out[i], type_out[i], name_out[i] = (
                    pid, TIER_EXACT, "exact", norm)
                continue
            pid = st["alias"].get(norm)
            if pid is not None:
                pid_out[i], conf_out[i], type_out[i], name_out[i] = (
                    pid, TIER_ALIAS, "alias", norm)
                continue
            if enable_fuzzy:
                fuzzy_rows.append(i)
                fuzzy_norms.append(norm)
        if fuzzy_rows:
            best, best_idx = _fuzzy_best(
                [_token_sort(s) for s in fuzzy_norms], st["ts_names"])
            for k, i in enumerate(fuzzy_rows):
                if best[k] >= 0.95:
                    conf = TIER_FUZZY_95
                elif best[k] >= 0.90:
                    conf = TIER_FUZZY_90
                else:
                    continue
                j = int(best_idx[k])
                pid_out[i], conf_out[i], type_out[i], name_out[i] = (
                    st["pids"][j], conf, "fuzzy", st["names"][j])
        if enable_substring:
            for i, m in enumerate(raw):
                if pid_out[i] is not None or m is None:
                    continue
                norm = _norm(str(m))
                if not norm or len(norm) < 3:
                    continue
                for nm, pid in zip(st["names"], st["pids"]):
                    if nm and nm in norm:
                        pid_out[i], conf_out[i], type_out[i], name_out[i] = (
                            pid, TIER_SUBSTRING, "substring", nm)
                        break
        return batch.append_column(
            "person_id", pa.array(pid_out, pid_type)
        ).append_column(
            "confidence", pa.array(conf_out, pa.float64())
        ).append_column(
            "match_type", pa.array(type_out, pa.string())
        ).append_column(
            "matched_name", pa.array(name_out, pa.string())
        )

    return mentions.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
