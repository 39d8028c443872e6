"""``ray job submit`` entrypoint for the flagship pipelines.

The north-star contract runs the linkage "via ray job submit on fixed
N-node and 4N-node clusters".  This module is that job script: a thin,
argument-driven wrapper over the library pipelines that

* connects to whatever cluster the job runner provides (``RAY_ADDRESS`` is
  respected; falls back to a local session when run standalone),
* reads the input with column pruning (only the five contract columns
  ``repo, path, commit, lang, content`` leave storage),
* runs the requested pipeline with per-stage parquet checkpoints so a
  pre-empted job resumes after the last complete phase,
* writes partitioned parquet through the manifest sink (per-partition
  lineage + a pipeline-metrics snapshot, pre-existing manifest = skip),
* prints ONE machine-readable JSON line with row counts, wall time and the
  metrics snapshot.

Usage (cluster)::

    ray job submit --working-dir . -- \
        python -m moj_analytical_services_uk_address_matcher_ray.job dedup \
        --input s3://bucket/files/ --output s3://bucket/clusters/ \
        --checkpoint-dir s3://bucket/ckpt/

Usage (local smoke)::

    python -m moj_analytical_services_uk_address_matcher_ray.job dedup \
        --input /root/testdata/sf0.001/documents.parquet ...

Reference parity: the reference exposes its end-to-end flow as importable
functions driven by example scripts (examples/example_matching.py); at
cluster scale the equivalent operational surface is a job entrypoint, which
the reference (single-process DuckDB) does not need and this engine does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

CONTRACT_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs: dict = {"include_dashboard": False, "logging_level": "ERROR"}
        # ray job submit / an existing cluster sets RAY_ADDRESS; standalone
        # runs get a local session sized by --num-cpus (None = all cores)
        if num_cpus is not None and os.environ.get("RAY_ADDRESS", "local") in (
            "local",
            "",
        ):
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    return ray


def _quiet_data_context():
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _read_input(path: str, columns: list[str]):
    from .sources.io import read_parquet

    return read_parquet(path, columns=columns)


def _write_output(ds, args) -> dict:
    """Manifest sink in the requested format (parquet default, jsonl for
    downstream tooling that consumes line-delimited records)."""
    if getattr(args, "output_format", "parquet") == "jsonl":
        from .sources.io import write_jsonl_with_manifest

        return write_jsonl_with_manifest(ds, args.output)
    from .sources.io import write_parquet_with_manifest

    return write_parquet_with_manifest(ds, args.output)


def cmd_dedup(args: argparse.Namespace) -> dict:
    """Self-dedup: corpus parquet -> (unique_id, content_sha256, cluster_id)."""
    from .pipelines.code_linkage import dedup_code_corpus
    from .state.metrics import read_metrics, reset_metrics

    reset_metrics()
    t0 = time.perf_counter()
    files = _read_input(args.input, CONTRACT_COLUMNS)
    clusters = dedup_code_corpus(
        files,
        score_threshold=args.score_threshold,
        edge_threshold=args.edge_threshold,
        max_pairs_per_block=args.max_pairs_per_block,
        use_rescore=args.use_rescore,
        checkpoint_dir=args.checkpoint_dir,
    )
    manifest = _write_output(clusters, args)
    return {
        "job": "dedup",
        "input": args.input,
        "output": args.output,
        "rows": manifest["rows"],
        "files": len(manifest["files"]),
        "wall_sec": round(time.perf_counter() - t0, 3),
        "metrics": {k: round(v, 4) for k, v in sorted(read_metrics().items())},
    }


def cmd_match(args: argparse.Namespace) -> dict:
    """Two-table match: messy corpus vs canonical corpus -> best match per
    messy record (the reference's clean -> predict -> improve flow)."""
    from .pipelines.code_linkage import match_code_corpora
    from .state.metrics import read_metrics, reset_metrics

    reset_metrics()
    t0 = time.perf_counter()
    messy = _read_input(args.input, CONTRACT_COLUMNS)
    canon = _read_input(args.canonical, CONTRACT_COLUMNS)
    best = match_code_corpora(
        messy,
        canon,
        predict_threshold=args.score_threshold,
        checkpoint_dir=args.checkpoint_dir,
    )
    manifest = _write_output(best, args)
    return {
        "job": "match",
        "input": args.input,
        "canonical": args.canonical,
        "output": args.output,
        "rows": manifest["rows"],
        "files": len(manifest["files"]),
        "wall_sec": round(time.perf_counter() - t0, 3),
        "metrics": {k: round(v, 4) for k, v in sorted(read_metrics().items())},
    }


def cmd_clean(args: argparse.Namespace) -> dict:
    """Clean/tokenise only: corpus parquet -> comparison-ready table (the
    reference's clean_data_using_precomputed_rel_tok_freq surface)."""
    from .pipelines.code_linkage import prepare_code_dataset
    from .state.metrics import read_metrics, reset_metrics

    reset_metrics()
    t0 = time.perf_counter()
    files = _read_input(args.input, CONTRACT_COLUMNS)
    cleaned = prepare_code_dataset(files)
    manifest = _write_output(cleaned, args)
    return {
        "job": "clean",
        "input": args.input,
        "output": args.output,
        "rows": manifest["rows"],
        "files": len(manifest["files"]),
        "wall_sec": round(time.perf_counter() - t0, 3),
        "metrics": {k: round(v, 4) for k, v in sorted(read_metrics().items())},
    }


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m moj_analytical_services_uk_address_matcher_ray.job",
        description=__doc__.split("\n\n")[0],
    )
    sub = p.add_subparsers(dest="command", required=True)

    common = argparse.ArgumentParser(add_help=False)
    # on the COMMON parser (not the root) so the natural flag position —
    # after the subcommand, like every other flag — parses
    common.add_argument(
        "--num-cpus",
        type=int,
        default=None,
        help="local-session CPU cap (ignored when RAY_ADDRESS points at a cluster)",
    )
    common.add_argument("--input", required=True, help="input parquet path/dir")
    common.add_argument("--output", required=True, help="output parquet dir")
    common.add_argument(
        "--checkpoint-dir",
        default=None,
        help="phase-checkpoint dir (resume after last complete phase)",
    )
    common.add_argument(
        "--output-format",
        choices=["parquet", "jsonl"],
        default="parquet",
        help="sink format; both write the same resumable lineage manifest",
    )

    d = sub.add_parser("dedup", parents=[common], help="self-dedup into clusters")
    d.add_argument("--score-threshold", type=float, default=-20.0)
    d.add_argument("--edge-threshold", type=float, default=10.0)
    d.add_argument("--max-pairs-per-block", type=int, default=50_000)
    d.add_argument("--use-rescore", action="store_true")
    d.set_defaults(fn=cmd_dedup)

    m = sub.add_parser(
        "match", parents=[common], help="match messy records to a canonical table"
    )
    m.add_argument("--canonical", required=True, help="canonical parquet path/dir")
    m.add_argument("--score-threshold", type=float, default=-50.0)
    m.set_defaults(fn=cmd_match)

    c = sub.add_parser("clean", parents=[common], help="clean/tokenise only")
    c.set_defaults(fn=cmd_clean)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    ray = _ensure_ray(args.num_cpus)
    _quiet_data_context()
    try:
        result = args.fn(args)
    finally:
        # leave cluster sessions (ray job submit) alone; tear down only the
        # local session this process created
        if os.environ.get("RAY_ADDRESS", "local") in ("local", ""):
            ray.shutdown()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
