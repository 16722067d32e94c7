"""CLI — the engine's equivalent of the reference's Click command surface
(reference: src/epstein_pipeline/cli.py — ``dedup``, ``stats``, ``chunk``,
export commands, cli.py:37-63, 2252-2254).

    python -m epstein_pipeline_ray.cli dedup  --input turns/ --output out/
    python -m epstein_pipeline_ray.cli stats  --input turns/
    python -m epstein_pipeline_ray.cli chunk  --input docs.parquet --output chunks/
    python -m epstein_pipeline_ray.cli export --input t.parquet --format csv --output out/
    python -m epstein_pipeline_ray.cli validate --input docs.parquet
    python -m epstein_pipeline_ray.cli extract-entities --input docs.parquet --output ents/
    python -m epstein_pipeline_ray.cli build-graph --input docs.parquet \
        --terms alice,bob --format gexf --output graph.gexf

The CLI owns the Ray session (guarded init); the library never calls
``ray.init``. ``dedup --checkpoint-dir`` enables per-stage Parquet
checkpoints + lineage manifests so a killed run resumes with
``--resume`` (reference's ProcessingState, state.py:34-128).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_up() -> None:
    """Guarded init. Honors ``RAY_ADDRESS`` so the same commands run
    unchanged as cluster jobs (``ray job submit -- python -m
    epstein_pipeline_ray.cli dedup ...`` sets RAY_ADDRESS to the cluster;
    ``smoke_cluster.py`` drives the identical path against a real
    two-node localhost cluster — this sandbox's minimal Ray build lacks
    the jobs HTTP server, so the smoke submits the driver directly)."""
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")


def cmd_dedup(args) -> int:
    _ray_up()
    import ray.data as rd

    from epstein_pipeline_ray.config import DedupConfig, RunConfig
    from epstein_pipeline_ray.pipelines.dedup import dedup_turns

    cfg = DedupConfig(
        enable_exact="exact" in args.modes,
        enable_minhash="minhash" in args.modes,
        jaccard_threshold=args.threshold,
        verify_mode="extended" if args.extended_verify else "parity",
    )
    run = (
        RunConfig(write_checkpoints=True, run_dir=args.checkpoint_dir, resume=args.resume)
        if args.checkpoint_dir
        else RunConfig(write_checkpoints=False)
    )
    turns = rd.read_parquet(args.input)
    res = dedup_turns(turns, cfg, run, minhash_on_reps=args.on_reps)
    res.pairs.write_parquet(f"{args.output}/pairs")
    res.clusters.write_parquet(f"{args.output}/clusters")
    print(json.dumps({"pairs": res.pairs.count(), "clustered": res.clusters.count()}))
    return 0


def cmd_stats(args) -> int:
    _ray_up()
    import ray.data as rd

    from epstein_pipeline_ray.stages.relational import grouped_stats

    ds = rd.read_parquet(args.input)
    key = args.by or ds.schema().names[0]
    out = grouped_stats(ds, [key]).to_pandas().sort_values(key)
    print(out.to_string(index=False))
    return 0


def cmd_chunk(args) -> int:
    _ray_up()
    import ray.data as rd

    from epstein_pipeline_ray.stages.chunker import chunk_docs

    docs = rd.read_parquet(args.input)
    chunks = chunk_docs(docs, chunk_size=args.chunk_size, overlap=args.overlap)
    chunks.write_parquet(args.output)
    print(json.dumps({"chunks": chunks.count()}))
    return 0


def cmd_export(args) -> int:
    _ray_up()
    import ray.data as rd

    from epstein_pipeline_ray.stages import exporters

    ds = rd.read_parquet(args.input)
    if args.format == "json":
        exporters.write_ndjson(ds, args.output)
    elif args.format == "csv":
        exporters.write_csv_projection(ds, args.output, ds.schema().names)
    elif args.format == "sqlite":
        exporters.write_sqlite(ds, args.output, args.table)
    elif args.format == "parquet":
        if args.partition_by:
            exporters.write_partitioned_parquet(ds, args.output, [args.partition_by])
        else:
            ds.write_parquet(args.output)
    print(json.dumps({"rows": ds.count(), "format": args.format}))
    return 0


def cmd_entities(args) -> int:
    """Reference ``extract-entities`` (cli.py:462-531) with the regex
    backend: the full typed-pattern pass; model backends (spaCy/GLiNER)
    are out-of-container (SURVEY §2.3 A3/A4)."""
    _ray_up()
    import ray.data as rd

    from epstein_pipeline_ray.stages.textops import extract_entities_typed

    docs = rd.read_parquet(args.input)
    ents = extract_entities_typed(docs, id_col=args.id_col, text_col=args.text_col)
    ents.write_parquet(args.output)
    print(json.dumps({"entities": ents.count()}))
    return 0


def cmd_build_graph(args) -> int:
    """Reference ``build-graph`` (cli.py:1287+): term co-occurrence edge
    weighting → GEXF / node-link JSON export of the (small) aggregated
    graph."""
    _ray_up()
    import ray.data as rd

    from epstein_pipeline_ray.stages.graph_export import write_gexf, write_graph_json
    from epstein_pipeline_ray.stages.textops import term_cooccur

    docs = rd.read_parquet(args.input)
    terms = [t for t in args.terms.split(",") if t]
    edges = term_cooccur(docs, terms, id_col=args.id_col, text_col=args.text_col)
    edf = edges.to_pandas()  # aggregated graph: |terms|^2/2 rows max
    if args.format == "gexf":
        write_gexf(edf, args.output)
    else:
        write_graph_json(edf, args.output)
    print(json.dumps({"edges": len(edf), "format": args.format}))
    return 0


def cmd_audit_persons(args) -> int:
    """Reference auditor dedup phase (person_auditor.py:257-303): fuzzy
    name >= threshold OR alias cross-match over a person registry."""
    _ray_up()
    import ray.data as rd

    from epstein_pipeline_ray.stages.auditor import person_audit_pairs

    persons = rd.read_parquet(args.input)
    pairs = person_audit_pairs(
        persons, threshold=args.threshold, metric=args.metric,
        id_col=args.id_col, name_col=args.name_col)
    pairs.write_parquet(args.output)
    print(json.dumps({"pairs": pairs.count()}))
    return 0


def cmd_prep(args) -> int:
    """Training-data prep composition: [C4 clean] → quality → langid →
    [decontaminate] → dedup reps → chunk → token counts → partitioned
    Parquet (pipelines/prep.py)."""
    _ray_up()
    import ray.data as rd

    from epstein_pipeline_ray.pipelines.prep import prep_corpus

    docs = rd.read_parquet(args.input)
    bench = rd.read_parquet(args.bench) if args.bench else None
    chunks = prep_corpus(
        docs, min_quality=args.min_quality,
        keep_langs=tuple(args.langs.split(",")),
        chunk_size=args.chunk_size, overlap=args.overlap,
        out_dir=args.output, c4_clean=args.c4_clean,
        decontam_bench=bench)
    print(json.dumps({"chunks": chunks.count()}))
    return 0


def cmd_hygiene(args) -> int:
    """Transcript hygiene sweep over a turn Parquet: well-formedness
    report, optional stutter collapse + token-budget truncation
    (stages/transcript_ops.py)."""
    _ray_up()
    import ray.data as rd

    from epstein_pipeline_ray.stages.transcript_ops import (
        collapse_repeat_turns,
        conv_health,
        truncate_to_token_budget,
    )

    turns = rd.read_parquet(args.input)
    health = conv_health(turns)
    health.write_parquet(os.path.join(args.output, "health"))
    summary = {"convs": health.count()}
    if args.collapse:
        turns = collapse_repeat_turns(turns)
        summary["turns_after_collapse"] = turns.count()
        turns.write_parquet(os.path.join(args.output, "turns"))
    if args.token_budget:
        kept = truncate_to_token_budget(turns, budget=args.token_budget)
        summary["turns_within_budget"] = kept.count()
        kept.write_parquet(os.path.join(args.output, "budgeted"))
    print(json.dumps(summary))
    return 0


def cmd_pack(args) -> int:
    """Training-sequence packing coordinates (stages/packing.py)."""
    _ray_up()
    import ray.data as rd

    from epstein_pipeline_ray.stages.packing import pack_sequences

    docs = rd.read_parquet(args.input)
    out = pack_sequences(docs, seq_len=args.seq_len, id_col=args.id_col,
                         text_col=args.text_col)
    out.write_parquet(args.output)
    total_tokens = int(out.sum("n_tokens") or 0)
    n_samples = (total_tokens + args.seq_len - 1) // args.seq_len
    print(json.dumps({"docs": out.count(), "samples": n_samples}))
    return 0


def cmd_validate(args) -> int:
    _ray_up()
    import ray.data as rd

    from epstein_pipeline_ray.stages.validate import integrity_report

    report = integrity_report(
        rd.read_parquet(args.input), id_col=args.id_col, text_col=args.text_col,
        len_col=args.len_col,
    )
    print(json.dumps(report.to_pylist()[0]))
    return 0


def cmd_profile(args) -> int:
    _ray_up()
    import ray.data as rd

    from epstein_pipeline_ray.stages.validate import profile_columns

    ds = rd.read_parquet(args.input)
    cols = args.columns.split(",") if args.columns else ds.schema().names
    out = profile_columns(ds, cols).to_pandas()
    print(json.dumps(out.to_dict("records")))
    return 0


def cmd_health(args) -> int:
    """Corpus health report: column profile + exchange-key skew + exact
    duplicate exposure per source — the pre-flight a dedup run starts
    from."""
    _ray_up()
    import ray.data as rd

    from epstein_pipeline_ray.stages.exact import dup_rate_by_group
    from epstein_pipeline_ray.stages.relational import key_skew_report
    from epstein_pipeline_ray.stages.validate import profile_columns

    ds = rd.read_parquet(args.input)
    report = {
        "profile": profile_columns(
            ds, [args.id_col, args.group_col, args.text_col]
        ).to_pandas().to_dict("records"),
        "key_skew": key_skew_report(ds, args.group_col)
        .to_pandas().to_dict("records")[0],
        "dup_rate": dup_rate_by_group(
            ds, group_col=args.group_col, id_col=args.id_col,
            text_col=args.text_col,
        ).to_pandas().to_dict("records"),
    }
    print(json.dumps(report))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="epstein-pipeline-ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", help="transcript near-dup detection + clustering")
    d.add_argument("--input", required=True, help="turn-table Parquet path/dir")
    d.add_argument("--output", required=True)
    def _modes(s: str) -> list[str]:
        vals = [v for v in s.split(",") if v]
        bad = set(vals) - {"exact", "minhash"}
        if bad or not vals:
            raise argparse.ArgumentTypeError(
                f"--modes takes a comma list of exact,minhash (got {s!r})"
            )
        return vals

    d.add_argument("--modes", default=["exact", "minhash"], type=_modes,
                   help="comma list: exact,minhash")
    d.add_argument("--threshold", type=float, default=0.80)
    d.add_argument("--extended-verify", action="store_true")
    d.add_argument("--on-reps", action="store_true",
                   help="run MinHash on one representative per hash group (scale path)")
    d.add_argument("--checkpoint-dir", default=None)
    d.add_argument("--resume", action="store_true")
    d.set_defaults(fn=cmd_dedup)

    s = sub.add_parser("stats", help="grouped row counts")
    s.add_argument("--input", required=True)
    s.add_argument("--by", default=None)
    s.set_defaults(fn=cmd_stats)

    c = sub.add_parser("chunk", help="sliding-window document chunking")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--chunk-size", type=int, default=3200)
    c.add_argument("--overlap", type=int, default=800)
    c.set_defaults(fn=cmd_chunk)

    e = sub.add_parser("export", help="export a Parquet table")
    e.add_argument("--input", required=True)
    e.add_argument("--output", required=True)
    e.add_argument("--format", choices=["json", "csv", "sqlite", "parquet"], required=True)
    e.add_argument("--table", default="export", help="sqlite table name")
    e.add_argument("--partition-by", default=None)
    e.set_defaults(fn=cmd_export)

    x = sub.add_parser("extract-entities",
                       help="typed regex entity extraction (8 patterns)")
    x.add_argument("--input", required=True)
    x.add_argument("--output", required=True)
    x.add_argument("--id-col", default="doc_id")
    x.add_argument("--text-col", default="text")
    x.set_defaults(fn=cmd_entities)

    g = sub.add_parser("build-graph",
                       help="term co-occurrence graph → GEXF / node-link JSON")
    g.add_argument("--input", required=True)
    g.add_argument("--output", required=True)
    g.add_argument("--terms", required=True, help="comma list of node terms")
    g.add_argument("--format", choices=["gexf", "json"], default="gexf")
    g.add_argument("--id-col", default="doc_id")
    g.add_argument("--text-col", default="text")
    g.set_defaults(fn=cmd_build_graph)

    a = sub.add_parser("audit-persons",
                       help="duplicate-person scan: fuzzy name + alias cross-match")
    a.add_argument("--input", required=True, help="persons Parquet (person_id, name[, aliases])")
    a.add_argument("--output", required=True)
    a.add_argument("--threshold", type=float, default=0.85)
    a.add_argument("--metric", choices=["indel", "levenshtein"], default="indel")
    a.add_argument("--id-col", default="person_id")
    a.add_argument("--name-col", default="name")
    a.set_defaults(fn=cmd_audit_persons)

    pp = sub.add_parser("prep",
                        help="training-data prep: clean → filter → dedup → chunk")
    pp.add_argument("--input", required=True, help="docs Parquet (doc_id, text, lang, source, n_chars)")
    pp.add_argument("--output", required=True, help="partitioned Parquet dir")
    pp.add_argument("--min-quality", type=float, default=0.3)
    pp.add_argument("--langs", default="en")
    pp.add_argument("--chunk-size", type=int, default=512)
    pp.add_argument("--overlap", type=int, default=64)
    pp.add_argument("--c4-clean", action="store_true")
    pp.add_argument("--bench", default=None,
                    help="benchmark Parquet (text) for decontamination")
    pp.set_defaults(fn=cmd_prep)

    h = sub.add_parser("hygiene",
                       help="transcript hygiene: health report, stutter "
                            "collapse, token-budget truncation")
    h.add_argument("--input", required=True)
    h.add_argument("--output", required=True)
    h.add_argument("--collapse", action="store_true")
    h.add_argument("--token-budget", type=int, default=0)
    h.set_defaults(fn=cmd_hygiene)

    pk = sub.add_parser("pack", help="training-sequence packing coordinates")
    pk.add_argument("--input", required=True)
    pk.add_argument("--output", required=True)
    pk.add_argument("--seq-len", type=int, default=2048)
    pk.add_argument("--id-col", default="doc_id")
    pk.add_argument("--text-col", default="text")
    pk.set_defaults(fn=cmd_pack)

    v = sub.add_parser("validate", help="corpus integrity report")
    v.add_argument("--input", required=True)
    v.add_argument("--id-col", default="doc_id")
    v.add_argument("--text-col", default="text")
    v.add_argument("--len-col", default="n_chars")
    v.set_defaults(fn=cmd_validate)

    pf = sub.add_parser("profile",
                        help="column profile (rows/nulls/exact distinct)")
    pf.add_argument("--input", required=True)
    pf.add_argument("--columns", default=None,
                    help="comma list; default = every column")
    pf.set_defaults(fn=cmd_profile)

    he = sub.add_parser("health",
                        help="corpus health: profile + key skew + dup rate")
    he.add_argument("--input", required=True)
    he.add_argument("--id-col", default="doc_id")
    he.add_argument("--group-col", default="source")
    he.add_argument("--text-col", default="text")
    he.set_defaults(fn=cmd_health)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
