"""Checkpoint / resume semantics (north rule: resumable mid-run with
per-partition lineage + metrics)."""

import os

import pyarrow as pa
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.pipelines.framework import (
    Pipeline,
    batch_stage,
)
from moj_analytical_services_uk_address_matcher_ray.state.checkpoint import (
    checkpoint_stage,
    is_complete,
    read_stage_metrics,
)


def _make_double(sentinel: str):
    """Batch fn defined as a closure (pickled by value for workers); appends
    to a sentinel file so the driver can observe whether it actually ran."""

    def _double(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        with open(sentinel, "a") as f:
            f.write(f"{t.num_rows}\n")
        return t.set_column(0, "x", pc.multiply(t["x"], pa.scalar(2)))

    return _double


def _sentinel_count(path: str) -> int:
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        return len(f.readlines())


def test_checkpoint_skip_on_resume(ray_session, tmp_path):
    path = str(tmp_path / "ckpt" / "stage_double")
    sentinel = str(tmp_path / "ran.log")
    ds = rd.from_items([{"x": i} for i in range(10)])
    double = _make_double(sentinel)

    out1 = checkpoint_stage(
        lambda d: d.map_batches(double, batch_format="pyarrow"), ds, path
    )
    assert sorted(r["x"] for r in out1.take_all()) == [i * 2 for i in range(10)]
    assert is_complete(path)
    assert _sentinel_count(sentinel) > 0
    metrics = read_stage_metrics(path)
    assert metrics["rows"] == 10
    assert metrics["wall_sec"] > 0
    assert len(metrics["partitions"]) >= 1

    # a "restarted run": the transform must NOT execute again
    before = _sentinel_count(sentinel)
    out2 = checkpoint_stage(
        lambda d: d.map_batches(double, batch_format="pyarrow"), ds, path
    )
    assert sorted(r["x"] for r in out2.take_all()) == [i * 2 for i in range(10)]
    assert _sentinel_count(sentinel) == before  # skipped — read from parquet


def test_incomplete_checkpoint_is_retried(ray_session, tmp_path):
    path = str(tmp_path / "ckpt" / "crashy")
    sentinel = str(tmp_path / "ran2.log")
    os.makedirs(path, exist_ok=True)
    # simulate a crash mid-write: stray temp file but NO _SUCCESS marker
    with open(os.path.join(path, "garbage.tmp"), "w") as f:
        f.write("partial")
    ds = rd.from_items([{"x": i} for i in range(4)])
    out = checkpoint_stage(
        lambda d: d.map_batches(_make_double(sentinel), batch_format="pyarrow"),
        ds,
        path,
    )
    assert sorted(r["x"] for r in out.take_all()) == [0, 2, 4, 6]
    assert is_complete(path)
    assert _sentinel_count(sentinel) > 0  # it really re-ran


def test_pipeline_with_checkpoint_stage(ray_session, tmp_path):
    def add_y(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("y", pc.add(t["x"], pa.scalar(1)))

    def mul_z(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("z", pc.multiply(t["y"], pa.scalar(3)))

    stages = [batch_stage(add_y, name="add_y"), batch_stage(mul_z, name="mul_z")]
    stages[0].checkpoint = True
    pipe = Pipeline(stages, name="demo", checkpoint_dir=str(tmp_path / "pipe"))
    ds = rd.from_items([{"x": i} for i in range(5)])
    out = pipe.run(ds)
    rows = sorted(out.take_all(), key=lambda r: r["x"])
    assert rows[2] == {"x": 2, "y": 3, "z": 9}
    assert is_complete(str(tmp_path / "pipe" / "00_add_y"))
    assert "demo" in pipe.describe()
    assert [name for name, _ in pipe.timings] == ["add_y", "mul_z"]


def test_manifest_sink_resume(ray_session, tmp_path):
    from moj_analytical_services_uk_address_matcher_ray.sources.io import (
        write_parquet_with_manifest,
    )

    out_dir = str(tmp_path / "sink")
    ds = rd.from_items([{"x": i} for i in range(7)])
    m1 = write_parquet_with_manifest(ds, out_dir)
    assert m1["rows"] == 7
    # second call must skip the write and return the stored manifest
    m2 = write_parquet_with_manifest(rd.from_items([{"x": 99}]), out_dir)
    assert m2 == m1


def test_dedup_code_corpus_checkpointed_resume(ray_session, tmp_path):
    """Flagship resumability: a second run with the same checkpoint_dir
    skips the clean and block+score phases (their _SUCCESS markers exist)
    and returns identical clusters."""
    import os

    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.datagen import (
        GenConfig,
        generate_corpus,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        dedup_code_corpus,
    )

    files, _ = generate_corpus(GenConfig(seed=42, n_clusters=40))
    ckpt = str(tmp_path / "ckpt")
    out1 = dedup_code_corpus(
        rd.from_arrow(files), checkpoint_dir=ckpt
    ).materialize()
    assert os.path.exists(os.path.join(ckpt, "01_cleaned", "_SUCCESS"))
    assert os.path.exists(os.path.join(ckpt, "02_scored_pairs", "_SUCCESS"))
    marker = os.path.getmtime(os.path.join(ckpt, "02_scored_pairs", "_SUCCESS"))
    out2 = dedup_code_corpus(
        rd.from_arrow(files), checkpoint_dir=ckpt
    ).materialize()
    # markers untouched -> phases were skipped, not recomputed
    assert os.path.getmtime(
        os.path.join(ckpt, "02_scored_pairs", "_SUCCESS")
    ) == marker
    c1 = {r["unique_id"]: r["cluster_id"] for r in out1.take_all()}
    c2 = {r["unique_id"]: r["cluster_id"] for r in out2.take_all()}
    assert c1 == c2


def test_sink_and_checkpoint_accept_filesystem_uris(ray_session, tmp_path):
    """The cluster contract: output/checkpoint paths may be pyarrow-fs URIs
    (s3://, gcs://, file://...).  Exercised here with file:// — the same
    FileSystem.from_uri dispatch an object-store URI takes."""
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.sources.io import (
        write_parquet_with_manifest,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.checkpoint import (
        checkpoint_stage,
        is_complete,
        read_stage_metrics,
    )

    ds = rd.range(64).map_batches(lambda b: b)
    out_uri = f"file://{tmp_path}/sink_out"
    m = write_parquet_with_manifest(ds, out_uri)
    assert m["rows"] == 64 and len(m["files"]) >= 1
    assert all(p["bytes"] > 0 for p in m["partitions"])
    # pre-existing manifest short-circuits: parquet files not rewritten
    local = str(tmp_path / "sink_out")
    mtimes = {
        f: os.path.getmtime(os.path.join(local, f)) for f in m["files"]
    }
    m2 = write_parquet_with_manifest(ds, out_uri)
    assert m2["rows"] == 64
    assert {
        f: os.path.getmtime(os.path.join(local, f)) for f in m["files"]
    } == mtimes

    ck_uri = f"file://{tmp_path}/ckpt_uri"
    calls = {"n": 0}

    def stage(d):
        calls["n"] += 1
        return d.map_batches(lambda b: b)

    r1 = checkpoint_stage(stage, ds, ck_uri, stage_name="uri_stage")
    assert r1.count() == 64 and is_complete(ck_uri)
    assert read_stage_metrics(ck_uri)["rows"] == 64
    r2 = checkpoint_stage(stage, ds, ck_uri, stage_name="uri_stage")
    assert r2.count() == 64
    assert calls["n"] == 1  # second call resumed from the checkpoint
