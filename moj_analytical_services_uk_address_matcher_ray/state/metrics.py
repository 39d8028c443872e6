"""Cluster-wide pipeline metrics (counters) + per-partition lineage records.

A single named, detached-from-stage actor accumulates counters emitted from
inside ``map_batches``/``map_groups`` tasks (fire-and-forget ``.remote``
calls, so the hot path never blocks).  The north rule requires per-partition
lineage + metrics alongside every checkpoint; stage wrappers in
``state.checkpoint`` read the counters back and persist them as JSON
sidecars.
"""

from __future__ import annotations

from collections import defaultdict

import ray

_ACTOR_NAME = "uam_metrics"


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self._counters: dict[str, float] = defaultdict(float)

    def inc(self, key: str, value: float = 1.0) -> None:
        self._counters[key] += value

    def set_max(self, key: str, value: float) -> None:
        if value > self._counters[key]:
            self._counters[key] = value

    def get_all(self) -> dict[str, float]:
        return dict(self._counters)

    def reset(self) -> None:
        self._counters.clear()


def get_metrics_actor():
    """Get or create the named metrics actor (idempotent across workers)."""
    try:
        return ray.get_actor(_ACTOR_NAME)
    except ValueError:
        try:
            return MetricsActor.options(name=_ACTOR_NAME, lifetime="detached").remote()
        except ValueError:
            return ray.get_actor(_ACTOR_NAME)


def inc_metric(key: str, value: float = 1.0) -> None:
    """Fire-and-forget counter increment from any task/actor."""
    try:
        get_metrics_actor().inc.remote(key, value)
    except Exception:
        pass  # metrics must never fail the pipeline


def gauge_max_metric(key: str, value: float) -> None:
    """Fire-and-forget high-watermark gauge from any task/actor."""
    try:
        get_metrics_actor().set_max.remote(key, value)
    except Exception:
        pass


def read_metrics() -> dict[str, float]:
    try:
        return ray.get(get_metrics_actor().get_all.remote())
    except Exception:
        return {}


def reset_metrics() -> None:
    try:
        ray.get(get_metrics_actor().reset.remote())
    except Exception:
        pass
