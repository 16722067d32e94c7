"""Pipeline configuration.

Mirrors the reference's dedup knobs (reference: src/epstein_pipeline/config.py:82-92
— dedup_threshold=0.90, dedup_jaccard_threshold=0.80, dedup_shingle_size=5,
dedup_num_perm=128, dedup_semantic_threshold=0.95) plus the Ray-side execution
knobs that have no equivalent in the reference's single-process engine.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    """Config for the transcript near-dup pipeline.

    Parity knobs (must match the reference defaults for the recall>=0.99
    oracle harness to be meaningful):

    - ``shingle_size``: char k-shingles of normalized text (reference dedup.py:98-103)
    - ``num_perm``: MinHash permutations (reference config.py:87)
    - ``jaccard_threshold``: LSH threshold AND the signature-estimate confirm
      threshold (reference dedup.py:367,386-387 uses the same value for both)
    - ``min_text_len``: minhash pass eligibility — text strictly longer than
      this (reference dedup.py:346-350 uses ``len(text) > 100``)
    - ``title_threshold``: fuzzy-title pass threshold (reference config.py:83)

    Extension knobs (axis A+B additions; ``verify_mode='parity'`` disables them
    so output matches reference semantics exactly):

    - ``verify_mode``: 'parity' = signature-Jaccard only; 'extended' adds
      SimHash hamming pre-filter + suffix-automaton substring confirmation.
    - ``simhash_max_hamming``: max 64-bit SimHash hamming distance for the
      extended verifier to accept without the substring check.
    - ``substring_min_overlap``: min (longest common substring / shorter text)
      ratio for the extended verifier's containment confirmation.

    Scale knobs:

    - ``max_bucket_size``: LSH buckets larger than this switch from all-pairs
      to star+chain pair emission (connectivity-preserving skew cap).
    - ``band_salt_buckets``: number of sub-buckets oversized band groups are
      salted into during pair emission accounting.
    """

    # parity knobs (reference defaults)
    shingle_size: int = 5
    num_perm: int = 128
    jaccard_threshold: float = 0.80
    min_text_len: int = 100
    title_threshold: float = 0.90
    semantic_threshold: float = 0.95
    # passes. The reference's exact pass is three sub-passes in first-wins
    # order — content hash, Bates overlap, title fuzzy (dedup.py:242-326);
    # bates/title only fire on corpora that carry those columns, so they
    # default off for the transcript flagship.
    enable_exact: bool = True
    enable_bates: bool = False
    enable_title: bool = False
    enable_minhash: bool = True
    # semantic pass (reference dedup.py:404-464, first-wins rank AFTER
    # minhash per dedup.py:143-168): cosine >= semantic_threshold over a
    # precomputed `embedding` vector column (the sandbox carries no
    # sentence-transformer; A2's model load is the actor-pool pattern in
    # stages/embed.py). Off by default — it only fires on corpora that
    # carry embeddings.
    enable_semantic: bool = False
    # semantic eligibility: raw text strictly longer than this (dedup.py:421)
    semantic_min_text_len: int = 50
    # semantic physical plan: exact all-pairs cosine at or below this many
    # eligible rows (reference-parity all-pairs matrix), LSH-bucketed above
    semantic_broadcast_limit: int = 100_000
    # reference output ordering: pairs sorted by score desc (dedup.py:170)
    sort_pairs_by_score: bool = True
    # extension knobs
    verify_mode: str = "parity"  # 'parity' | 'extended'
    # extended-tier LCS backend: 'automaton' (per-pair suffix automaton,
    # default) or 'suffix_array' (prefix-doubling SA + Kasai LCP — the
    # backend the north rule names; answers are identical, pytest-pinned)
    substring_backend: str = "automaton"
    simhash_max_hamming: int = 8
    substring_min_overlap: float = 0.5
    # scale knobs
    max_bucket_size: int = 4096
    band_salt_buckets: int = 16
    minhash_batch_size: int = 1024
    # confirm-stage physical plan: signature corpora at or below this many
    # rows broadcast via one ray.put (plasma-shared per node); above it the
    # confirm runs as two hash-partitioned exchange joins (the 10^12 path)
    broadcast_sig_rows_limit: int = 2_000_000
    signature_concurrency: int | None = None  # None → let Ray size the pool
    # deterministic seed for the MinHash permutation family
    seed: int = 1

    def fingerprint(self) -> str:
        """Stable hash of the config — part of every lineage manifest so a
        changed threshold invalidates downstream checkpoints (SURVEY.md §7.3)."""
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


@dataclass(frozen=True)
class RunConfig:
    """Where a pipeline run writes its checkpoints and manifests."""

    run_dir: str = field(default_factory=lambda: os.environ.get("EPR_RUN_DIR", "/tmp/epr_run"))
    resume: bool = True
    write_checkpoints: bool = True
