"""Pipeline counters (north rule: "checkpoints per-partition lineage and
counters").

A single named Ray actor accumulates counters from any task/actor in the
job (`inc` is fire-and-forget). The reference has no equivalent — its
stages log to Python logging and drop errors
(reference: src/epstein_pipeline/utils/parallel.py:98-100).

Replaces the reference's `ProcessingState` SQLite marker table
(reference: src/epstein_pipeline/state.py:34-128) together with
``state.lineage``.
"""

from __future__ import annotations

from collections import Counter

import ray

_ACTOR_NAME = "epr_metrics"


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self) -> None:
        self._c: Counter[str] = Counter()

    def inc(self, name: str, n: int = 1) -> None:
        self._c[name] += n

    def snapshot(self) -> dict[str, int]:
        return dict(self._c)

    def reset(self) -> None:
        self._c.clear()


def get_metrics_actor():
    """Get-or-create the session-scoped metrics actor."""
    try:
        return ray.get_actor(_ACTOR_NAME)
    except ValueError:
        try:
            return MetricsActor.options(name=_ACTOR_NAME, lifetime=None).remote()
        except ValueError:  # lost the creation race
            return ray.get_actor(_ACTOR_NAME)


def inc(name: str, n: int = 1) -> None:
    """Best-effort counter increment, callable from any worker."""
    try:
        get_metrics_actor().inc.remote(name, n)
    except Exception:  # metrics must never fail the data path
        pass


def snapshot() -> dict[str, int]:
    try:
        return ray.get(get_metrics_actor().snapshot.remote())
    except Exception:
        return {}


def reset() -> None:
    try:
        ray.get(get_metrics_actor().reset.remote())
    except Exception:
        pass
