"""The ``ray job submit`` entrypoint (job.py): argument parsing, the dedup /
match / clean subcommands end-to-end on a tiny corpus, manifest-based resume.

Run in-process against the session Ray fixture (the CLI's guarded
``ray.init`` is a no-op when a session exists), the way a cluster job runs
against the cluster's session."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moj_analytical_services_uk_address_matcher_ray.datagen import GenConfig, write_corpus
from moj_analytical_services_uk_address_matcher_ray.job import build_parser


def _tiny_corpus(tmp_path, n_clusters=40, seed=7, sub="corpus"):
    fpath, lpath = write_corpus(
        str(tmp_path / sub), GenConfig(seed=seed, n_clusters=n_clusters), n_parts=4
    )
    return fpath, lpath


def test_parser_rejects_missing_subcommand():
    import pytest

    with pytest.raises(SystemExit):
        build_parser().parse_args([])


def test_job_dedup_end_to_end_and_resume(ray_session, tmp_path):
    fpath, _ = _tiny_corpus(tmp_path)
    out = str(tmp_path / "clusters")
    args = build_parser().parse_args(
        ["dedup", "--input", fpath, "--output", out,
         "--checkpoint-dir", str(tmp_path / "ckpt")]
    )
    result = args.fn(args)
    assert result["job"] == "dedup"
    assert result["rows"] > 0
    assert result["files"] >= 1
    # lineage manifest exists with per-partition rows and a metrics snapshot
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["rows"] == result["rows"]
    assert all(p["rows"] >= 0 and p["bytes"] > 0 for p in manifest["partitions"])
    assert "metrics" in manifest
    # second invocation resumes: manifest short-circuits the sink — the
    # output files must NOT be rewritten (deterministic check; a wall-clock
    # comparison would flake on a fast box)
    mtimes = {
        f: os.path.getmtime(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".parquet")
    }
    again = args.fn(args)
    assert again["rows"] == result["rows"]
    assert {
        f: os.path.getmtime(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".parquet")
    } == mtimes


def test_job_clean_prunes_and_writes(ray_session, tmp_path):
    fpath, _ = _tiny_corpus(tmp_path, n_clusters=20, seed=11)
    out = str(tmp_path / "cleaned")
    args = build_parser().parse_args(["clean", "--input", fpath, "--output", out])
    result = args.fn(args)
    assert result["rows"] > 0
    import pyarrow.parquet as pq

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    schema = pq.read_schema(os.path.join(out, files[0]))
    # comparison-ready columns present; raw content dropped after cleaning
    assert "ukam_address_id" in schema.names
    assert "content_sha256" in schema.names


def test_job_match_two_table(ray_session, tmp_path):
    # canonical = one file per cluster; messy = the rest of each cluster
    import pyarrow.parquet as pq
    import pyarrow as pa

    fpath, lpath = _tiny_corpus(tmp_path, n_clusters=60, seed=13)
    import pyarrow.dataset as pads

    tbl = pads.dataset(fpath).to_table()
    labels = pq.read_table(lpath)
    uid = [
        f"{r}::{p}@{c}"
        for r, p, c in zip(
            tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()
        )
    ]
    cl = dict(zip(labels["unique_id"].to_pylist(), labels["cluster_id"].to_pylist()))
    cluster = [cl[u] for u in uid]
    seen: set = set()
    is_canon = []
    for c in cluster:
        is_canon.append(c not in seen)
        seen.add(c)
    mask = pa.array(is_canon)
    canon_dir, messy_dir = str(tmp_path / "canon"), str(tmp_path / "messy")
    os.makedirs(canon_dir), os.makedirs(messy_dir)
    pq.write_table(tbl.filter(mask), os.path.join(canon_dir, "part-0.parquet"))
    import pyarrow.compute as pc

    messy_tbl = tbl.filter(pc.invert(mask))
    pq.write_table(messy_tbl, os.path.join(messy_dir, "part-0.parquet"))

    out = str(tmp_path / "matched")
    args = build_parser().parse_args(
        ["match", "--input", messy_dir, "--canonical", canon_dir, "--output", out]
    )
    result = args.fn(args)
    assert result["rows"] > 0
    # every matched messy record got exactly one canonical id
    import pandas as pd

    got = pd.read_parquet(out)
    assert got["ukam_address_id"].is_unique
    assert {"canonical_ukam_address_id", "match_weight", "match_reason"} <= set(
        got.columns
    )
    # accuracy on the planted clusters: a matched pair is correct when the
    # canonical record's cluster equals the messy record's cluster (the
    # output's unique_id columns are the repo::path@commit keys the labels
    # table uses — ukam_address_id is an opaque surrogate hash)
    assert result["rows"] >= int(messy_tbl.num_rows * 0.9)
    assert got["unique_id"].map(cl).notna().all()
    correct = int(
        (got["unique_id"].map(cl) == got["canonical_unique_id"].map(cl)).sum()
    )
    assert correct >= int(result["rows"] * 0.95)


def test_match_payload_modes_identical(ray_session, tmp_path):
    """The broadcast store path and the forced non-broadcast (hash-join +
    bucketed attach+score) path must produce the SAME matches: same messy
    records matched, same winning canonical per record, same weights."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        match_code_corpora,
    )

    fpath, lpath = _tiny_corpus(tmp_path, n_clusters=50, seed=23, sub="pm")
    tbl = pads.dataset(fpath).to_table()
    labels = pq.read_table(lpath)
    uid = [
        f"{r}::{p}@{c}"
        for r, p, c in zip(
            tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()
        )
    ]
    cl = dict(zip(labels["unique_id"].to_pylist(), labels["cluster_id"].to_pylist()))
    seen: set = set()
    is_canon = []
    for u in uid:
        c = cl[u]
        is_canon.append(c not in seen)
        seen.add(c)
    mask = pa.array(is_canon)
    canon_tbl, messy_tbl = tbl.filter(mask), tbl.filter(pc.invert(mask))

    def run(mode):
        out = match_code_corpora(
            rd.from_arrow(messy_tbl),
            rd.from_arrow(canon_tbl),
            payload_mode=mode,
        ).to_pandas()
        return out.sort_values("unique_id").reset_index(drop=True)

    bc, sh = run("broadcast"), run("shuffle")
    assert len(bc) == len(sh)
    assert (bc["unique_id"] == sh["unique_id"]).all()
    assert (bc["canonical_unique_id"] == sh["canonical_unique_id"]).all()
    assert (bc["match_reason"] == sh["match_reason"]).all()
    wb, ws = bc["match_weight"], sh["match_weight"]
    # the two paths run different-but-equivalent kernels (packed reduceat
    # vs score_batch's band loop): same factors, different association
    # order -> ULP-level float drift (measured max 3.6e-15)
    import numpy as np

    same_null = wb.isna() & ws.isna()
    close = np.isclose(wb, ws, rtol=1e-9, atol=1e-9)
    assert (same_null | close).all()
