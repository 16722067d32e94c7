"""Model-evaluation operators over scored corpora.

A curation pipeline ships classifiers (quality gates, language ID,
dedup tiers — reference processors/classifier.py, dedup.py confidence
scores) and needs to EVALUATE them at corpus scale: ranking quality
(AUC), probability calibration (reliability bins), and inter-labeler
agreement (Cohen's kappa). All three decompose into bounded exchanges:
AUC is one key-partitioned rank pass, calibration is a bin-keyed count
exchange, kappa is a label-pair-keyed count exchange with a
scalars-only closed form.

Determinism notes (oracle hash-exactness): average ranks are halves
(exact doubles), count sums are integers, so every intermediate is
exact and the single final division + sql_round matches DuckDB bit-
for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

from epstein_pipeline_ray.functions.rounding import sql_round
from epstein_pipeline_ray.stages.groupblock import map_key_blocks


def grouped_auc(
    ds: Dataset,
    key: str,
    score_col: str,
    label_col: str,
    round_digits: int = 6,
    num_partitions: int | None = None,
) -> Dataset:
    """ROC AUC per group via the tie-aware Mann-Whitney rank-sum
    identity: AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) where
    R_pos is the sum of fractional (average) ranks of the positives
    under the score ordering. One keyed exchange; a group with zero
    positives or zero negatives emits NULL (undefined AUC). Output:
    (key, n, n_pos, auc).

    Scale note: one group's rows co-locate in a block (same assumption
    as grouped_spearman); ranks never leave the block — only the
    (key, 3-scalar) result row does.
    """
    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    OUT = pa.schema([(key, ktype), ("n", pa.int64()),
                     ("n_pos", pa.int64()), ("auc", pa.float64())])

    def block(block_: pa.Table) -> pa.Table:
        if block_.num_rows == 0:
            return OUT.empty_table()
        df = block_.to_pandas()
        df["__r"] = (df.groupby(key, sort=False)[score_col]
                     .rank(method="average").to_numpy(np.float64))
        y = df[label_col].to_numpy(np.int64)
        df["__rp"] = np.where(y == 1, df["__r"].to_numpy(), 0.0)
        df["__y"] = y
        g = df.groupby(key, sort=True).agg(
            n=("__y", "size"), n_pos=("__y", "sum"),
            r_pos=("__rp", "sum")).reset_index()
        n = g["n"].to_numpy(np.float64)
        npos = g["n_pos"].to_numpy(np.float64)
        nneg = n - npos
        with np.errstate(divide="ignore", invalid="ignore"):
            auc = np.where(
                (npos > 0) & (nneg > 0),
                (g["r_pos"].to_numpy(np.float64)
                 - npos * (npos + 1) / 2.0) / (npos * nneg),
                np.nan,
            )
        return pa.table({
            key: pa.array(g[key], ktype, from_pandas=True),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "n_pos": pa.array(g["n_pos"].to_numpy(np.int64), pa.int64()),
            "auc": pa.array(sql_round(auc, round_digits), pa.float64(),
                            from_pandas=True),
        }, schema=OUT)

    return map_key_blocks(ds.select_columns([key, score_col, label_col]),
                          [key], block, num_partitions, sort_blocks=False)


def calibration_bins(
    ds: Dataset,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_digits: int = 6,
) -> Dataset:
    """Reliability-diagram bins: scores in [0, 1] bucket into
    ``n_bins`` fixed-width bins (the top edge folds into the last bin),
    each bin reporting row count, mean score and empirical positive
    rate. Map-side (bin, count, sum_score, sum_label) partials collapse
    each batch to ≤ n_bins rows before the exchange. Output:
    (bin, n, mean_score, frac_pos)."""

    def partial(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[score_col].to_numpy(zero_copy_only=False),
                       np.float64)
        y = np.asarray(batch[label_col].to_numpy(zero_copy_only=False),
                       np.int64)
        b = np.minimum((s * n_bins).astype(np.int64), n_bins - 1)
        df = pd.DataFrame({"bin": b, "__s": s, "__y": y})
        g = df.groupby("bin", sort=False).agg(
            __cnt=("__s", "size"), __ss=("__s", "sum"),
            __sy=("__y", "sum")).reset_index()
        return pa.table({
            "bin": pa.array(g["bin"].to_numpy(np.int64), pa.int64()),
            "__cnt": pa.array(g["__cnt"].to_numpy(np.int64), pa.int64()),
            "__ss": pa.array(g["__ss"].to_numpy(np.float64), pa.float64()),
            "__sy": pa.array(g["__sy"].to_numpy(np.int64), pa.int64()),
        })

    partials = ds.select_columns([score_col, label_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("bin").aggregate(
        Sum("__cnt", alias_name="n"),
        Sum("__ss", alias_name="__ts"),
        Sum("__sy", alias_name="__ty"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"].to_numpy(zero_copy_only=False), np.float64)
        ts = np.asarray(batch["__ts"].to_numpy(zero_copy_only=False),
                        np.float64)
        ty = np.asarray(batch["__ty"].to_numpy(zero_copy_only=False),
                        np.float64)
        return pa.table({
            "bin": batch["bin"],
            "n": batch["n"],
            "mean_score": pa.array(sql_round(ts / n, round_digits),
                                   pa.float64()),
            "frac_pos": pa.array(sql_round(ty / n, round_digits),
                                 pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def cohen_kappa(
    ds: Dataset,
    col_a: str,
    col_b: str,
    round_digits: int = 6,
) -> Dataset:
    """Cohen's kappa between two label columns: one (a, b)-keyed count
    exchange produces the confusion cells (bounded by |labels_a| ×
    |labels_b|), then the closed form po = Σ diag / n,
    pe = Σ_k row_k·col_k / n², kappa = (po − pe)/(1 − pe) assembles
    from those cells alone — integers in, one division out. Output:
    one row (n, po, pe, kappa); kappa is NULL when pe = 1 (single
    cell on both sides)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([col_a, col_b])
        g = pa.TableGroupBy(t, [col_a, col_b]).aggregate([([], "count_all")])
        return pa.table({col_a: g[col_a], col_b: g[col_b],
                         "__cnt": g["count_all"]})

    cells_ds = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).groupby(
        [col_a, col_b]).aggregate(Sum("__cnt", alias_name="cnt"))
    # the cell table is label-alphabet-sized (bounded), a legitimate
    # scalars-only driver assembly (blocking_quality precedent)
    cells = cells_ds.to_pandas()
    n = int(cells["cnt"].sum())
    diag = int(cells.loc[cells[col_a] == cells[col_b], "cnt"].sum())
    row = cells.groupby(col_a)["cnt"].sum()
    col = cells.groupby(col_b)["cnt"].sum()
    labels = sorted(set(row.index) | set(col.index))
    pe_num = sum(int(row.get(lb, 0)) * int(col.get(lb, 0)) for lb in labels)
    po = diag / n if n else float("nan")
    pe = pe_num / (n * n) if n else float("nan")
    kappa = (po - pe) / (1.0 - pe) if n and pe != 1.0 else float("nan")
    arr = sql_round(np.array([po, pe, kappa]), round_digits)
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "po": pa.array([arr[0]], pa.float64()),
        "pe": pa.array([arr[1]], pa.float64()),
        "kappa": pa.array([arr[2]] if not np.isnan(arr[2]) else [None],
                          pa.float64()),
    })


def pr_curve(
    ds: Dataset,
    score_col: str,
    label_col: str,
    thresholds: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5,
                                     0.6, 0.7, 0.8, 0.9),
    round_digits: int = 6,
) -> Dataset:
    """Precision/recall/F1 at fixed score thresholds (predict positive
    when score >= t). Map-side partials emit one (threshold, tp, fp,
    pos) row per threshold per batch — len(thresholds) rows — so the
    exchange is constant-size regardless of corpus size. All counts are
    integers; the ratios are single divisions, bit-equal to the twin.
    Empty-prediction thresholds emit NULL precision/F1; recall is NULL
    only when there are no positives at all."""
    thr = np.asarray(thresholds, np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[score_col].to_numpy(zero_copy_only=False),
                       np.float64)
        y = np.asarray(batch[label_col].to_numpy(zero_copy_only=False),
                       np.int64)
        pred = s[None, :] >= thr[:, None]            # (T, n)
        tp = (pred & (y == 1)[None, :]).sum(axis=1)
        fp = (pred & (y == 0)[None, :]).sum(axis=1)
        pos = np.full(len(thr), int((y == 1).sum()), np.int64)
        return pa.table({
            "threshold": pa.array(thr, pa.float64()),
            "__tp": pa.array(tp.astype(np.int64), pa.int64()),
            "__fp": pa.array(fp.astype(np.int64), pa.int64()),
            "__pos": pa.array(pos, pa.int64()),
        })

    partials = ds.select_columns([score_col, label_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("threshold").aggregate(
        Sum("__tp", alias_name="tp"),
        Sum("__fp", alias_name="fp"),
        Sum("__pos", alias_name="n_pos"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        tp = np.asarray(batch["tp"].to_numpy(zero_copy_only=False),
                        np.float64)
        fp = np.asarray(batch["fp"].to_numpy(zero_copy_only=False),
                        np.float64)
        pos = np.asarray(batch["n_pos"].to_numpy(zero_copy_only=False),
                         np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            prec = np.where(tp + fp > 0, tp / (tp + fp), np.nan)
            rec = np.where(pos > 0, tp / pos, np.nan)
            f1 = np.where((prec + rec) > 0,
                          2.0 * prec * rec / (prec + rec), np.nan)
        return pa.table({
            "threshold": batch["threshold"],
            "tp": batch["tp"], "fp": batch["fp"], "n_pos": batch["n_pos"],
            "precision": pa.array(sql_round(prec, round_digits),
                                  pa.float64(), from_pandas=True),
            "recall": pa.array(sql_round(rec, round_digits),
                               pa.float64(), from_pandas=True),
            "f1": pa.array(sql_round(f1, round_digits),
                           pa.float64(), from_pandas=True),
        })

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def per_class_prf(
    ds: Dataset,
    truth_col: str,
    pred_col: str,
    round_digits: int = 6,
) -> Dataset:
    """Per-class precision/recall/F1 of a predicted label column
    against a truth column: the same bounded confusion-cell exchange
    as :func:`cohen_kappa`, then a label-alphabet-sized closed form —
    tp = cell(L, L), fp = predicted-L minus tp, fn = truth-L minus tp.
    Classes missing on one side report NULL for the undefined ratio.
    Output: (label, tp, fp, fn, precision, recall, f1)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([truth_col, pred_col])
        g = pa.TableGroupBy(t, [truth_col, pred_col]).aggregate(
            [([], "count_all")])
        return pa.table({truth_col: g[truth_col], pred_col: g[pred_col],
                         "__cnt": g["count_all"]})

    cells = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).groupby(
        [truth_col, pred_col]).aggregate(
        Sum("__cnt", alias_name="cnt")).to_pandas()
    truth_tot = cells.groupby(truth_col)["cnt"].sum()
    pred_tot = cells.groupby(pred_col)["cnt"].sum()
    d = cells[cells[truth_col] == cells[pred_col]]
    diag = dict(zip(d[truth_col], d["cnt"].astype(int)))
    labels = sorted(set(truth_tot.index) | set(pred_tot.index))
    rows = {"label": [], "tp": [], "fp": [], "fn": [],
            "precision": [], "recall": [], "f1": []}
    for lb in labels:
        tp = diag.get(lb, 0)
        fp = int(pred_tot.get(lb, 0)) - tp
        fn = int(truth_tot.get(lb, 0)) - tp
        p = tp / (tp + fp) if tp + fp > 0 else float("nan")
        r = tp / (tp + fn) if tp + fn > 0 else float("nan")
        f1 = (2.0 * p * r / (p + r)
              if not (np.isnan(p) or np.isnan(r)) and p + r > 0
              else float("nan"))
        rows["label"].append(lb)
        rows["tp"].append(tp)
        rows["fp"].append(fp)
        rows["fn"].append(fn)
        rows["precision"].append(p)
        rows["recall"].append(r)
        rows["f1"].append(f1)
    rd_ = sql_round
    return pa.table({
        "label": pa.array(rows["label"], pa.string()),
        "tp": pa.array(rows["tp"], pa.int64()),
        "fp": pa.array(rows["fp"], pa.int64()),
        "fn": pa.array(rows["fn"], pa.int64()),
        "precision": pa.array(rd_(np.array(rows["precision"]), round_digits),
                              pa.float64(), from_pandas=True),
        "recall": pa.array(rd_(np.array(rows["recall"]), round_digits),
                           pa.float64(), from_pandas=True),
        "f1": pa.array(rd_(np.array(rows["f1"]), round_digits),
                       pa.float64(), from_pandas=True),
    })


def ks_two_sample(
    ds: Dataset,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_digits: int = 6,
) -> pa.Table:
    """Two-sample Kolmogorov–Smirnov statistic D = max |F_a − F_b|
    between the value distributions of two groups — the
    distribution-shift test behind data-drift gates. Plan: one
    value-keyed count exchange collapses the corpus to the DISTINCT
    value table (bounded by the value domain — the documented
    assumption; 2-decimal metrics have ≤ ~10^6 distinct points), then
    one pass over the sorted distinct table computes both ECDFs and
    the max gap. Tie-correct: the ECDF evaluates after all rows of an
    equal value (the jump lands once per distinct point). Integer
    cumulative counts → per-point divisions are bit-equal to the
    twin. Output: one row (n_a, n_b, ks_d)."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = batch[group_col]
        mask = pc.or_(pc.equal(g, group_a), pc.equal(g, group_b))
        t = batch.filter(pc.fill_null(mask, False))
        v = np.asarray(t[value_col].to_numpy(zero_copy_only=False),
                       np.float64)
        is_a = np.asarray(
            pc.equal(t[group_col], group_a).to_numpy(zero_copy_only=False),
            bool)
        import pandas as pd

        df = pd.DataFrame({"v": v,
                           "__a": is_a.astype(np.int64),
                           "__b": (~is_a).astype(np.int64)})
        gb = df.groupby("v", sort=False).agg(
            __a=("__a", "sum"), __b=("__b", "sum")).reset_index()
        return pa.table({
            "v": pa.array(gb["v"].to_numpy(np.float64), pa.float64()),
            "__a": pa.array(gb["__a"].to_numpy(np.int64), pa.int64()),
            "__b": pa.array(gb["__b"].to_numpy(np.int64), pa.int64()),
        })

    distinct = ds.select_columns([group_col, value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("v").aggregate(
        Sum("__a", alias_name="ca"), Sum("__b", alias_name="cb"))
    tbl = distinct.to_pandas().sort_values("v")
    ca = tbl["ca"].to_numpy(np.int64)
    cb = tbl["cb"].to_numpy(np.int64)
    na, nb = int(ca.sum()), int(cb.sum())
    if na == 0 or nb == 0:
        d = None
    else:
        gap = np.abs(np.cumsum(ca) / na - np.cumsum(cb) / nb)
        d = float(sql_round(np.array([gap.max()]), round_digits)[0])
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "ks_d": pa.array([d], pa.float64()),
    })


def ab_proportion_test(
    ds: Dataset,
    unit_col: str,
    flag_col: str,
    arm_col: str,
    round_digits: int = 6,
) -> pa.Table:
    """Two-proportion z-test between arms 0/1 (the experiment
    readout): per-unit conversion (max of flag per unit), pooled
    standard error, z = (p1 − p0) / sqrt(p(1−p)(1/n0 + 1/n1)). One
    unit-keyed max exchange + scalar partials — integers in, one
    closed form out, bit-equal to the twin. Output: one row
    (n_0, n_1, p_0, p_1, z)."""

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.select([unit_col, flag_col, arm_col]).to_pandas()
        g = df.groupby([unit_col, arm_col], sort=False)[flag_col] \
            .max().reset_index()
        return pa.table({
            unit_col: pa.array(g[unit_col].to_numpy(np.int64), pa.int64()),
            "__arm": pa.array(g[arm_col].to_numpy(np.int64), pa.int64()),
            "__f": pa.array(g[flag_col].to_numpy(np.int64), pa.int64()),
        })

    from ray.data.aggregate import Max as AggMax

    units = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).groupby(
        [unit_col, "__arm"]).aggregate(AggMax("__f", alias_name="conv"))

    def count_partial(batch: pa.Table) -> pa.Table:
        arm = np.asarray(batch["__arm"].to_numpy(zero_copy_only=False),
                         np.int64)
        c = np.asarray(batch["conv"].to_numpy(zero_copy_only=False),
                       np.int64)
        return pa.table({
            "__k": pa.array([0], pa.int64()),
            "__n0": pa.array([int((arm == 0).sum())], pa.int64()),
            "__n1": pa.array([int((arm == 1).sum())], pa.int64()),
            "__c0": pa.array([int(c[arm == 0].sum())], pa.int64()),
            "__c1": pa.array([int(c[arm == 1].sum())], pa.int64()),
        })

    agg = units.map_batches(count_partial, batch_format="pyarrow",
                            zero_copy_batch=True).groupby("__k").aggregate(
        Sum("__n0", alias_name="n_0"), Sum("__n1", alias_name="n_1"),
        Sum("__c0", alias_name="c0"), Sum("__c1", alias_name="c1"),
    ).to_pandas()
    n0, n1 = int(agg["n_0"][0]), int(agg["n_1"][0])
    c0, c1 = int(agg["c0"][0]), int(agg["c1"][0])
    p0 = c0 / n0 if n0 else float("nan")
    p1 = c1 / n1 if n1 else float("nan")
    if n0 and n1:
        pp = (c0 + c1) / (n0 + n1)
        se2 = pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1)
        z = (p1 - p0) / np.sqrt(se2) if se2 > 0 else float("nan")
    else:
        z = float("nan")
    arr = sql_round(np.array([p0, p1, z]), round_digits)
    return pa.table({
        "n_0": pa.array([n0], pa.int64()),
        "n_1": pa.array([n1], pa.int64()),
        "p_0": pa.array([arr[0]], pa.float64(), from_pandas=True),
        "p_1": pa.array([arr[1]], pa.float64(), from_pandas=True),
        "z": pa.array([arr[2]] if not np.isnan(arr[2]) else [None],
                      pa.float64()),
    })
