"""Smoke tests for the runnable examples (the reference's
tests/test_full_examples.py:7-94 pattern: run each example small, assert it
completes and its headline numbers are sane)."""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_example_matching(ray_session):
    from examples.example_matching import main

    got, total = main(n_canonical=80, n_messy=30, verbose=False)
    assert total == 30
    assert got >= 24  # >=80% of planted matches recovered on the small corpus


def test_match_one(ray_session):
    from examples._example_data import make_canonical
    from examples.match_one import main

    # query = a messy variant of a real canonical row (abbreviated street)
    canon = make_canonical()
    addr = canon["address_concat"][0].as_py().replace("STREET", "ST").replace(
        "ROAD", "RD"
    )
    pc = canon["postcode"][0].as_py()
    rows = main(addr, pc, verbose=False)
    assert len(rows) >= 1
    assert rows[0]["unique_id_l"] == "c0"
    assert rows[0]["match_weight"] > -20


def test_preclean_corpus(ray_session, tmp_path):
    from examples.preclean_corpus import main

    out = str(tmp_path / "precleaned")
    manifest = main(out, n=60, verbose=False)
    assert manifest["rows"] == 60
    # resumable: a second call returns the manifest without rewriting
    again = main(out, n=60, verbose=False)
    assert again["rows"] == 60
    shutil.rmtree(out, ignore_errors=True)


def test_dedup_corpus_example(ray_session):
    from examples.dedup_corpus import main

    m = main(n_clusters=60, verbose=False)
    assert m["f1"] >= 0.98


def test_match_forks_to_canonical_example(ray_session):
    from examples.match_forks_to_canonical import main

    m = main(n_clusters=150, verbose=False)
    assert m["n_canonical"] == 150
    assert m["n_messy"] > m["n_canonical"]
    # >=95% of messy rows resolve to their true canonical on the small corpus
    assert m["correct"] / m["n_messy"] >= 0.95


def test_stage_stats_profile_example(ray_session):
    from examples.stage_stats_profile import main

    reports = main(n=200, verbose=False)
    assert len(reports) == 12  # every pre-TF stage reported separately
    assert all(r.stats for r in reports)  # capture_stats populated
    assert all(r.rows == 200 for r in reports)


def test_incremental_matching_example(ray_session, tmp_path):
    from examples.incremental_matching import main

    m = main(
        n_canonical=100,
        delta_sizes=(25,),
        state_dir=str(tmp_path / "state"),
        verbose=False,
    )
    assert m["deltas"][0]["correct"] >= 20  # >=80% of the planted matches


def test_training_data_prep_example(ray_session, tmp_path):
    from examples.training_data_prep import main

    out = main(
        "/root/testdata/sf0.001", str(tmp_path / "prep"), verbose=False
    )
    assert out["input_docs"] == 500
    splits = out["rows_per_split"]
    # val/test are raw docs: together they cannot exceed the gated corpus
    assert 0 < splits["val"] + splits["test"] <= out["after_gate_dedup_quota"]
    # train is chunk-expanded: at least one chunk per train doc
    assert splits["train"] > 0
    # resumable sinks: per-partition lineage manifests on disk
    import json
    import os

    for name in ("train", "val", "test"):
        with open(tmp_path / "prep" / name / "_MANIFEST.json") as fh:
            m = json.load(fh)
        assert m["rows"] == splits[name]
        assert sum(p["rows"] for p in m["partitions"]) == m["rows"]


def test_media_pipeline_example(ray_session):
    """decode->feature->near-dup finds every re-encoded image duplicate by
    decoded CONTENT (the container bytes differ)."""
    from examples.media_pipeline import run

    out = run(verbose=False)
    assert out["decoded_rows"] == out["media_rows"]
    assert out["near_dup_pairs"] >= 40  # one per planted group, at least
    assert out["same_group_pairs"] == out["near_dup_pairs"]  # no false pairs


def test_training_mix_example(ray_session, tmp_path):
    from examples.training_mix import main

    out = main("/root/testdata/sf0.001", str(tmp_path / "mix"), verbose=False)
    assert out["pool_docs"] <= out["input_docs"]
    assert 0 < out["budgeted_docs"] <= out["pool_docs"]
    # curriculum and packing plans cover exactly the budgeted docs
    assert out["curriculum_rows"] == out["budgeted_docs"]
    assert out["packed_rows"] == out["budgeted_docs"]
    assert out["n_sequences"] > 0
    # every source got a dominant-language diagnostic
    assert len(out["dominant_lang_per_source"]) == len(out["weights"])
