"""Inverted text index (stages/search.py): AND/OR semantics, token-rule
parity, and the partition-pruning contract (a probe touches ONLY its
terms' bucket directories)."""

import os
import shutil

import pytest
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.search import (
    _token_bucket,
    build_text_index,
    search_text_index,
)

DOCS = [
    {"doc_id": 0, "text": "alpha beta gamma"},
    {"doc_id": 1, "text": "alpha beta"},
    {"doc_id": 2, "text": "beta gamma delta"},
    {"doc_id": 3, "text": "ALPHA Gamma"},  # lower-cased by the token rule
    {"doc_id": 4, "text": "unrelated words only"},
    {"doc_id": 5, "text": None},  # null text -> single empty token
]


@pytest.fixture()
def index_dir(tmp_path, ray_session):
    d = str(tmp_path / "idx")
    build_text_index(rd.from_items(DOCS).repartition(3), d, n_buckets=16)
    return d


def test_and_search(index_dir, ray_session):
    got = sorted(
        r["doc_id"]
        for r in search_text_index(index_dir, ["alpha", "gamma"]).take_all()
    )
    assert got == [0, 3]


def test_or_search(index_dir, ray_session):
    got = sorted(
        r["doc_id"]
        for r in search_text_index(index_dir, ["alpha", "delta"], mode="or").take_all()
    )
    assert got == [0, 1, 2, 3]


def test_single_term_and_missing_term(index_dir, ray_session):
    got = sorted(
        r["doc_id"] for r in search_text_index(index_dir, ["beta"]).take_all()
    )
    assert got == [0, 1, 2]
    assert search_text_index(index_dir, ["nosuchtoken"]).count() == 0


def test_probe_reads_only_term_buckets(index_dir, ray_session):
    """Partition pruning is real: delete every bucket directory the query
    terms do NOT hash to — the search must still answer correctly, because
    a probe never opens non-term buckets."""
    terms = ["alpha", "gamma"]
    keep = {_token_bucket(t, 16) for t in terms}
    for name in os.listdir(index_dir):
        if name.startswith("bucket="):
            b = int(name.split("=")[1])
            if b not in keep:
                shutil.rmtree(os.path.join(index_dir, name))
    got = sorted(
        r["doc_id"] for r in search_text_index(index_dir, terms).take_all()
    )
    assert got == [0, 3]


def test_invalid_mode(index_dir, ray_session):
    with pytest.raises(ValueError, match="mode"):
        search_text_index(index_dir, ["alpha"], mode="xor")
