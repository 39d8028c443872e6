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


def fs_for(path: str):
    """(pyarrow filesystem, filesystem-local path) for a plain local path or
    any pyarrow-supported URI (``s3://``, ``gcs://``, ``file://``, …).

    The sink/checkpoint layers use this for their metadata operations
    (manifest read/write, footer scans, completion markers) so the
    resumable-output contract holds on object stores, not just the local
    disk; the bulk data moves through Ray's own ``write_parquet`` /
    ``read_parquet`` which resolve the same URIs internally."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _fs_exists(fs, path: str) -> bool:
    from pyarrow import fs as pafs

    return fs.get_file_info(path).type != pafs.FileType.NotFound


def read_parquet(
    path: str,
    *,
    columns: list[str] | None = None,
    row_filter=None,
    rename: dict[str, str] | None = None,
) -> "ray.data.Dataset":
    """S1: column-pruned parquet read with optional row-group filter
    (a ``pyarrow.dataset`` expression) and column renames.

    Schema-level metadata (e.g. the ``b'pandas'`` blob pandas-written
    parquet carries) is stripped: a ``pa.Schema`` with schema metadata is
    UNHASHABLE, which defeats Ray Data's schema-dedup early exit on every
    block concat/unify and spams 'Failed to hash the schemas' warnings
    from every downstream task.  The strip happens at the READ itself
    (one driver-side footer peek -> metadata-free ``schema=`` override,
    so even the blocks the read operator emits hash cleanly); the fused
    map remains as a belt-and-braces fallback for sources the peek can't
    resolve (exotic URIs, filters)."""
    schema_override = None
    if row_filter is None:  # a filter may reference non-selected columns
        try:
            import pyarrow as pa
            import pyarrow.dataset as pads

            full = pads.dataset(path).schema
            if full.metadata:  # only override when there IS metadata
                full = full.remove_metadata()
                schema_override = (
                    pa.schema([full.field(c) for c in columns])
                    if columns
                    else full
                )
        except Exception:
            schema_override = None
    ds = ray.data.read_parquet(
        path, columns=columns, filter=row_filter, schema=schema_override
    )
    if rename:
        ds = ds.map_batches(
            lambda t: t.rename_columns(
                [rename.get(c, c) for c in t.column_names]
            ).replace_schema_metadata(None),
            batch_format="pyarrow",
        )
    else:
        ds = ds.map_batches(
            lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
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


def read_jsonl(
    path: str,
    *,
    columns: list[str] | None = None,
    rename: dict[str, str] | None = None,
    **kwargs,
) -> "ray.data.Dataset":
    """S2 (JSONL variant): newline-delimited JSON read.

    JSON has no columnar pushdown, so ``columns`` projects immediately
    after parse — blocks shed unused fields before anything downstream
    touches them (the closest JSONL gets to a pruned read).

    Underscore-prefixed basenames (``_MANIFEST.json``, ``_SUCCESS`` — the
    standard sidecar convention, which this repo's own manifest sinks
    follow) are excluded when ``path`` is a local directory; Ray's JSON
    reader would otherwise parse the manifest as data."""
    import os as _os

    src: "str | list[str]" = path
    if isinstance(path, str) and _os.path.isdir(path):
        files = sorted(
            _os.path.join(path, f)
            for f in _os.listdir(path)
            if not f.startswith("_") and f.endswith((".json", ".jsonl"))
        )
        if files:
            src = files
    ds = ray.data.read_json(src, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    if rename:
        ds = ds.map_batches(
            lambda t: t.rename_columns([rename.get(c, c) for c in t.column_names]),
            batch_format="pyarrow",
        )
    return ds


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
    format: str = "parquet"  # "parquet" | "jsonl" | "csv"

    def load(self) -> "ray.data.Dataset":
        if self.format == "jsonl":
            ds = read_jsonl(self.path, columns=self.columns)
        elif self.format == "csv":
            ds = read_csv(self.path)
            if self.columns:
                ds = ds.select_columns(self.columns)
        else:
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
@dataclass(frozen=True)
class DatasetInfo:
    """Metadata for a registered benchmark dataset (the reference's
    DatasetInfo, benchmarking/datasets/registry.py:41-47)."""

    name: str
    description: str = ""
    kind: str = "table"  # "table" | "linkage_corpus"


@dataclass(frozen=True)
class RegisteredDataset:
    name: str
    info: DatasetInfo
    loader: Callable[[], "ray.data.Dataset"]


DATASET_REGISTRY: dict[str, RegisteredDataset] = {}


def register_dataset(
    name: str,
    factory: Callable[[], "ray.data.Dataset"],
    *,
    description: str = "",
    kind: str = "table",
) -> None:
    if name in DATASET_REGISTRY:
        raise ValueError(f"dataset {name!r} is already registered")
    DATASET_REGISTRY[name] = RegisteredDataset(
        name=name,
        info=DatasetInfo(name=name, description=description, kind=kind),
        loader=factory,
    )


def load_registered(name: str) -> "ray.data.Dataset":
    if name not in DATASET_REGISTRY:
        register_default_datasets()
    if name not in DATASET_REGISTRY:
        available = ", ".join(sorted(DATASET_REGISTRY)) or "none"
        raise ValueError(f"unknown dataset {name!r}; available: {available}")
    return DATASET_REGISTRY[name].loader()


def list_datasets() -> list[str]:
    if not DATASET_REGISTRY:
        register_default_datasets()
    return sorted(DATASET_REGISTRY)


def get_dataset_info(name: str) -> DatasetInfo:
    if name not in DATASET_REGISTRY:
        register_default_datasets()
    return DATASET_REGISTRY[name].info


def register_default_datasets(
    testdata_root: str = "/root/testdata",
) -> None:
    """Wire the registry to the corpora this environment actually has: the
    driver-generated sf parquet tables, the deterministic datagen linkage
    corpus, and the examples' synthetic address tables (reference pattern:
    benchmarking/datasets/registry.py wiring named loaders)."""
    import ray.data as rd

    for sf in ("0.001", "0.01", "0.1"):
        d = os.path.join(testdata_root, f"sf{sf}")
        if not os.path.isdir(d):
            continue
        for table in ("documents", "embeddings", "events"):
            p = os.path.join(d, f"{table}.parquet")
            if not os.path.exists(p):
                continue
            name = f"{table}_sf{sf}"
            if name in DATASET_REGISTRY:
                continue
            register_dataset(
                name,
                lambda p=p: rd.read_parquet(p),
                description=f"driver testdata {table} at sf{sf}",
            )

    if "code_corpus_small" not in DATASET_REGISTRY:

        def _code_corpus() -> "ray.data.Dataset":
            from ..datagen import GenConfig, generate_corpus

            files, _ = generate_corpus(GenConfig(seed=42, n_clusters=300))
            return rd.from_arrow(files)

        register_dataset(
            "code_corpus_small",
            _code_corpus,
            description="deterministic datagen linkage corpus (300 clusters)",
            kind="linkage_corpus",
        )


def write_parquet_with_manifest(
    ds: "ray.data.Dataset", out_dir: str, *, min_rows_per_file: int | None = None
) -> dict:
    """S4: partitioned parquet sink + per-partition lineage manifest
    (per-file rows/bytes from parquet footers, pipeline metrics snapshot,
    timestamp).  Pre-existing complete manifest -> skip (resumable output).

    Lineage is read from the parquet FOOTERS (O(files) metadata reads) —
    not by re-scanning the written data, which would double the sink's IO
    at corpus scale.  All metadata operations go through ``fs_for``, so the
    sink works identically on a local directory or an object-store URI
    (the advertised cluster contract)."""
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    from ..state.metrics import read_metrics

    fs, root = fs_for(out_dir)
    root = root.rstrip("/")
    manifest_path = f"{root}/_MANIFEST.json"
    if _fs_exists(fs, manifest_path):
        with fs.open_input_stream(manifest_path) as f:
            return json.loads(f.read().decode())
    fs.create_dir(root, recursive=True)
    kwargs = {}
    if min_rows_per_file:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(out_dir, **kwargs)
    infos = {
        i.base_name: i
        for i in fs.get_file_info(pafs.FileSelector(root))
        if i.base_name.endswith(".parquet")
    }
    files = sorted(infos)
    partitions = []
    rows = 0
    for f in files:
        n = pq.read_metadata(f"{root}/{f}", filesystem=fs).num_rows
        rows += n
        partitions.append({"file": f, "rows": n, "bytes": infos[f].size})
    manifest = {
        "rows": rows,
        "files": files,
        "partitions": partitions,
        "metrics": {k: v for k, v in sorted(read_metrics().items())},
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with fs.open_output_stream(manifest_path) as f:
        f.write(json.dumps(manifest, indent=1).encode())
    return manifest


def write_jsonl_with_manifest(ds: "ray.data.Dataset", out_dir: str) -> dict:
    """S4 parity for line-delimited JSON: partitioned ``.jsonl`` sink +
    the same resumable lineage manifest the parquet sink writes.

    JSONL has no footer metadata, so per-file row counts come from a
    newline count streamed per file (O(bytes) once, at write time only —
    a resumed run returns the existing manifest without touching data).
    Exists for pipelines whose downstream tooling consumes JSONL (common
    for training-data mixtures); parquet remains the default sink."""
    from pyarrow import fs as pafs

    from ..state.metrics import read_metrics

    fs, root = fs_for(out_dir)
    root = root.rstrip("/")
    manifest_path = f"{root}/_MANIFEST.json"
    if _fs_exists(fs, manifest_path):
        with fs.open_input_stream(manifest_path) as f:
            return json.loads(f.read().decode())
    fs.create_dir(root, recursive=True)
    ds.write_json(out_dir)
    infos = {
        i.base_name: i
        for i in fs.get_file_info(pafs.FileSelector(root))
        if i.base_name.endswith((".json", ".jsonl"))
    }
    files = sorted(infos)
    partitions = []
    rows = 0
    for f in files:
        n = 0
        with fs.open_input_stream(f"{root}/{f}") as stream:
            while True:
                chunk = stream.read(1 << 20)
                if not chunk:
                    break
                n += chunk.count(b"\n")
        rows += n
        partitions.append({"file": f, "rows": n, "bytes": infos[f].size})
    manifest = {
        "rows": rows,
        "files": files,
        "partitions": partitions,
        "metrics": {k: v for k, v in sorted(read_metrics().items())},
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with fs.open_output_stream(manifest_path) as f:
        f.write(json.dumps(manifest, indent=1).encode())
    return manifest
