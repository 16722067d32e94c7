"""Checkpoint lineage manifests and pipeline metrics counters."""
