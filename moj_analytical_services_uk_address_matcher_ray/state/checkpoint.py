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

from ..sources.io import _fs_exists, fs_for
from .metrics import read_metrics

SUCCESS = "_SUCCESS"
METRICS = "_METRICS.json"


def is_complete(path: str) -> bool:
    fs, root = fs_for(path)
    return _fs_exists(fs, f"{root.rstrip('/')}/{SUCCESS}")


def checkpoint_stage(
    fn: Callable[["ray.data.Dataset"], "ray.data.Dataset"],
    ds: "ray.data.Dataset",
    path: str,
    *,
    stage_name: str | None = None,
) -> "ray.data.Dataset":
    """Apply ``fn`` and persist its output at ``path`` — or, if a complete
    checkpoint already exists there, skip the work and read it back.

    ``path`` may be a local directory or any pyarrow-filesystem URI
    (``s3://…``) — metadata operations go through ``fs_for`` so a job
    pre-empted on one node resumes from the object store on another."""
    from pyarrow import fs as pafs

    fs, root = fs_for(path)
    root = root.rstrip("/")
    if is_complete(path):
        return ray.data.read_parquet(path)
    if _fs_exists(fs, root):
        # incomplete checkpoint from a crashed run: wipe and redo
        fs.delete_dir(root)
    fs.create_dir(root, recursive=True)
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
    files = sorted(
        i.base_name
        for i in fs.get_file_info(pafs.FileSelector(root))
        if i.base_name.endswith(".parquet")
    )
    with fs.open_output_stream(f"{root}/{METRICS}") as f:
        f.write(
            json.dumps(
                {
                    "stage": stage_name or os.path.basename(root),
                    "rows": n_rows,
                    "wall_sec": round(wall, 4),
                    "partitions": files,
                    "metrics": delta,
                    "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                },
                indent=1,
            ).encode()
        )
    # marker written LAST -> a crash mid-write leaves an incomplete (retried) dir
    with fs.open_output_stream(f"{root}/{SUCCESS}") as f:
        f.write(b"ok\n")
    return result


def read_stage_metrics(path: str) -> dict:
    fs, root = fs_for(path)
    with fs.open_input_stream(f"{root.rstrip('/')}/{METRICS}") as f:
        return json.loads(f.read().decode())
