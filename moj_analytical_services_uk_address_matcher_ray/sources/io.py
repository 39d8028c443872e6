"""Sources & sinks (S1-S6 of SURVEY.md §2.1).

Readers prune at the read (columns + optional pyarrow row filters pushed to
the parquet scan), mirroring the reference's per-source projection configs
(benchmarking/datasets/sources.py:32-92) without its S3 specifics.  The
writer lays output out as one directory of part files plus a manifest so a
rerun can skip finished partitions (north rule: resumable output).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa
import ray


def read_parquet(
    path: str,
    *,
    columns: list[str] | None = None,
    row_filter=None,
    rename: dict[str, str] | None = None,
) -> "ray.data.Dataset":
    """S1: column-pruned parquet read with optional row-group filter
    (a ``pyarrow.dataset`` expression) and column renames."""
    ds = ray.data.read_parquet(path, columns=columns, filter=row_filter)
    if rename:
        ds = ds.map_batches(
            lambda t: t.rename_columns([rename.get(c, c) for c in t.column_names]),
            batch_format="pyarrow",
        )
    return ds


def read_csv(path: str, **kwargs) -> "ray.data.Dataset":
    """S2: CSV read (big files).  For tiny lookup files prefer
    :func:`read_small_csv` (driver-side, no task overhead)."""
    return ray.data.read_csv(path, **kwargs)


def read_small_csv(path: str) -> pa.Table:
    """S2 (lookup variant): driver-side pyarrow CSV for small lookups like
    the reference's common_end_tokens.csv."""
    import pyarrow.csv as pacsv

    return pacsv.read_csv(path)


@dataclass
class SourceConfig:
    """S3: per-source projection config (reference SourceConfig analogue).

    ``select``: mapping output-col -> input col name OR a batch callable for
    computed columns (e.g. concat of several address lines).
    """

    path: str
    dataset_name: str
    columns: list[str] | None = None
    select: dict[str, "str | Callable[[pa.Table], pa.Array]"] = field(
        default_factory=dict
    )

    def load(self) -> "ray.data.Dataset":
        ds = read_parquet(self.path, columns=self.columns)

        def project(t: pa.Table) -> pa.Table:
            data = {}
            for out, spec in self.select.items():
                data[out] = t[spec] if isinstance(spec, str) else spec(t)
            if not data:
                data = {c: t[c] for c in t.column_names}
            data["dataset_name"] = pa.array(
                [self.dataset_name] * t.num_rows, pa.string()
            )
            return pa.table(data)

        return ds.map_batches(project, batch_format="pyarrow")


def union_sources(configs: list[SourceConfig]) -> "ray.data.Dataset":
    """S3/K5: load + project each source, union them."""
    out = configs[0].load()
    for cfg in configs[1:]:
        out = out.union(cfg.load())
    return out


#: S6 — dataset registry: name -> () -> Dataset factory
DATASET_REGISTRY: dict[str, Callable[[], "ray.data.Dataset"]] = {}


def register_dataset(name: str, factory: Callable[[], "ray.data.Dataset"]) -> None:
    DATASET_REGISTRY[name] = factory


def load_registered(name: str) -> "ray.data.Dataset":
    return DATASET_REGISTRY[name]()


def write_parquet_with_manifest(
    ds: "ray.data.Dataset", out_dir: str, *, min_rows_per_file: int | None = None
) -> dict:
    """S4: partitioned parquet sink + manifest (rows, files, timestamp).
    Pre-existing complete manifest -> skip (resumable output)."""
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    kwargs = {}
    if min_rows_per_file:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(out_dir, **kwargs)
    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    rows = ray.data.read_parquet(out_dir).count()
    manifest = {
        "rows": rows,
        "files": files,
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
