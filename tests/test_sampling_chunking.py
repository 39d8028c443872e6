"""Deterministic split/sample (stages/sampling.py) and the redact /
chunk_tokens text operators (stages/text_analysis.py)."""

import pyarrow as pa
import pytest
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.sampling import (
    sample_by_hash,
    split_by_hash,
)
from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
    chunk_tokens,
    redact,
)


def _ids_ds(n=2000):
    return rd.from_items([{"doc_id": i} for i in range(n)])


def test_split_by_hash_proportions_and_determinism(ray_session):
    out = split_by_hash(
        _ids_ds(), splits={"train": 0.8, "val": 0.1, "test": 0.1}
    ).materialize()
    counts = {}
    for r in out.take_all():
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert sum(counts.values()) == 2000
    assert 0.75 <= counts["train"] / 2000 <= 0.85
    assert counts["val"] > 0 and counts["test"] > 0
    # identical rerun -> identical assignment (pure function of id)
    again = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(
            _ids_ds(), splits={"train": 0.8, "val": 0.1, "test": 0.1}
        ).take_all()
    }
    for r in out.take_all():
        assert again[r["doc_id"]] == r["split"]


def test_split_salt_gives_independent_split(ray_session):
    a = {r["doc_id"]: r["split"] for r in split_by_hash(_ids_ds(500)).take_all()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(_ids_ds(500), salt="other").take_all()
    }
    assert any(a[k] != b[k] for k in a)  # different draw


def test_sample_by_hash_stable_subset(ray_session):
    kept = sorted(
        r["doc_id"] for r in sample_by_hash(_ids_ds(), 0.2).take_all()
    )
    assert 0.15 * 2000 <= len(kept) <= 0.25 * 2000
    again = sorted(r["doc_id"] for r in sample_by_hash(_ids_ds(), 0.2).take_all())
    assert kept == again
    # rate monotonicity: a 0.1 sample is a subset of the 0.2 sample
    small = set(r["doc_id"] for r in sample_by_hash(_ids_ds(), 0.1).take_all())
    assert small <= set(kept)


def test_redact_patterns():
    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "contact bob.smith+x@example.co.uk today",
                "call +44 (0)20 7946-0958 now",
                "order 123456 shipped",  # 6 digits: too short for the
                # phone rule (needs >=9 phone-ish chars), caught by <NUM>
                "nothing to hide",
            ],
        }
    )
    out = redact(t)
    got = out["redacted_text"].to_pylist()
    assert got[0] == "contact <EMAIL> today"
    assert "<PHONE>" in got[1] and "7946" not in got[1]
    assert got[2] == "order <NUM> shipped"
    assert got[3] == "nothing to hide"
    assert out["n_redacted"].to_pylist() == [1, 1, 1, 0]


def test_redact_email_beats_num_order():
    # digits inside an email must be swallowed by <EMAIL>, not <NUM>
    t = pa.table({"doc_id": [1], "text": ["mail 1234567@host.com please"]})
    assert redact(t)["redacted_text"].to_pylist() == ["mail <EMAIL> please"]


def test_chunk_tokens_rule():
    words = " ".join(f"w{i}" for i in range(10))
    t = pa.table({"doc_id": [7, 8], "text": [words, ""]})
    out = chunk_tokens(t, chunk_size=8, overlap=4)
    rows = [
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in out.to_pylist()
    ]
    # n=10, step=4 -> ceil(6/4)=2 chunks: [0..7], [4..9]; no fully-contained
    # tail chunk
    assert rows[0] == (7, 0, " ".join(f"w{i}" for i in range(8)), 8)
    assert rows[1] == (7, 1, " ".join(f"w{i}" for i in range(4, 10)), 6)
    # empty doc -> exactly one empty chunk (stable cardinality contract)
    assert rows[2] == (8, 0, "", 0)
    assert len(rows) == 3


def test_chunk_tokens_overlap_validation():
    t = pa.table({"doc_id": [1], "text": ["a b"]})
    with pytest.raises(ValueError):
        chunk_tokens(t, chunk_size=4, overlap=4)


def test_cap_per_group(ray_session):
    from moj_analytical_services_uk_address_matcher_ray.stages.sampling import (
        cap_per_group,
    )

    rows = [
        {"doc_id": i, "grp": "hot" if i < 900 else f"g{i % 7}"}
        for i in range(1000)
    ]
    out = cap_per_group(
        rd.from_items(rows), group_col="grp", k=5, id_col="doc_id"
    ).materialize()
    counts = {}
    for r in out.take_all():
        counts[r["grp"]] = counts.get(r["grp"], 0) + 1
    assert counts["hot"] == 5  # skewed group capped
    assert all(v <= 5 for v in counts.values())
    # stable lottery: identical rerun keeps identical ids
    a = sorted(r["doc_id"] for r in out.take_all())
    b = sorted(
        r["doc_id"]
        for r in cap_per_group(
            rd.from_items(rows), group_col="grp", k=5, id_col="doc_id"
        ).take_all()
    )
    assert a == b


def test_sample_per_group_stratified(ray_session):
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.stages.sampling import (
        sample_by_hash,
        sample_per_group,
    )

    t = pa.table(
        {
            "doc_id": pa.array(range(2000), pa.int64()),
            "source": pa.array(
                ["a", "b", "c", "d"] * 500, pa.string()
            ),
        }
    )
    out = (
        sample_per_group(
            rd.from_arrow(t),
            {"a": 0.5, "b": 0.0},
            group_col="source",
            id_col="doc_id",
        )
        .to_pandas()
    )
    counts = out["source"].value_counts().to_dict()
    assert counts.get("b", 0) == 0  # zero-rate group fully dropped
    assert counts["c"] == 500 and counts["d"] == 500  # default rate 1.0
    assert 180 < counts["a"] < 320  # ~half of 500, md5-lottery spread
    # per-row fate depends on the id alone: group 'a' survivors are exactly
    # the rows sample_by_hash(rate=0.5) would keep
    import pyarrow.compute as pc

    solo = sample_by_hash(
        rd.from_arrow(t.filter(pc.equal(t["source"], "a"))), 0.5,
        id_col="doc_id",
    ).to_pandas()
    assert sorted(out[out["source"] == "a"]["doc_id"]) == sorted(solo["doc_id"])
    # determinism across runs
    again = (
        sample_per_group(
            rd.from_arrow(t), {"a": 0.5, "b": 0.0},
            group_col="source", id_col="doc_id",
        )
        .to_pandas()
    )
    assert sorted(again["doc_id"]) == sorted(out["doc_id"])


def test_select_to_token_budget_greedy_fill(ray_session):
    """Greedy per-source fill: docs in md5 order, a doc is included iff the
    tokens BEFORE it are under budget (boundary doc may overshoot);
    sources not in the budget dict are excluded."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.stages.sampling import (
        select_to_token_budget,
    )

    rows = []
    for i in range(30):
        src = "a" if i % 2 == 0 else "b"
        rows.append(
            {"doc_id": i, "source": src, "text": " ".join(["w"] * (3 + i % 5))}
        )
    ds = rd.from_items(rows)
    out = (
        select_to_token_budget(ds, {"a": 20})
        .to_pandas()
        .sort_values("tok_start")
        .reset_index(drop=True)
    )
    assert set(out["source"]) == {"a"}
    # independently re-derive the expected greedy selection
    a_rows = [(hashlib.md5(f"{r['doc_id']}:".encode()).hexdigest(), r) for r in rows
              if r["source"] == "a"]
    a_rows.sort(key=lambda kv: (kv[0], kv[1]["doc_id"]))
    run, expect = 0, []
    for _, r in a_rows:
        n = len(r["text"].split())
        if run < 20:
            expect.append((r["doc_id"], n, run))
        run += n
    assert list(map(tuple, out[["doc_id", "n_tokens", "tok_start"]].to_numpy())) == expect
    # total selected tokens reach the budget (greedy overshoot allowed)
    assert out["n_tokens"].sum() >= 20


def test_select_to_token_budget_int_budget_all_sources(ray_session):
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.stages.sampling import (
        select_to_token_budget,
    )

    rows = [
        {"doc_id": i, "source": f"s{i % 3}", "text": "x y z"} for i in range(12)
    ]
    out = select_to_token_budget(rd.from_items(rows), 6).to_pandas()
    # every source fills to >= 6 tokens (2 docs of 3 tokens each)
    got = out.groupby("source")["n_tokens"].sum()
    assert set(got.index) == {"s0", "s1", "s2"}
    assert (got >= 6).all()


def test_weighted_sample_topk_proportional_and_exact(ray_session):
    """Heavy-weight rows must be sampled far more often, and the selection
    must equal the brute-force E-S top-k computed driver-side."""
    import hashlib
    import math

    import pyarrow as pa
    import ray

    from moj_analytical_services_uk_address_matcher_ray.stages.sampling import (
        weighted_sample_topk,
    )

    n = 2000
    ids = list(range(n))
    # first 100 ids are 50x heavier
    weights = [50.0 if i < 100 else 1.0 for i in ids]
    t = pa.table({"id": ids, "w": weights})
    out = weighted_sample_topk(
        ray.data.from_arrow(t), id_col="id", weight_col="w", k=200
    ).to_pandas()
    assert len(out) == 200

    def key(i, w):
        u = (
            int(hashlib.md5(f"{i}:es".encode()).hexdigest()[:8], 16) + 1
        ) / 2**32
        return math.log(u) / w

    brute = sorted(
        zip(ids, weights), key=lambda p: (key(*p), p[0]), reverse=True
    )[:200]
    assert sorted(out["id"].tolist()) == sorted(i for i, _ in brute)
    # proportionality: the 100 heavy rows (5% of rows, ~72% of weight)
    # must dominate the sample
    heavy = (out["id"] < 100).sum()
    assert heavy > 60, heavy


def test_weighted_sample_excludes_nonpositive_and_null_weights(ray_session):
    import pyarrow as pa
    import ray

    from moj_analytical_services_uk_address_matcher_ray.stages.sampling import (
        weighted_sample_topk,
    )

    t = pa.table(
        {"id": [1, 2, 3, 4], "w": [1.0, 0.0, None, -2.0]}
    )
    out = weighted_sample_topk(
        ray.data.from_arrow(t), id_col="id", weight_col="w", k=10
    ).to_pandas()
    assert out["id"].tolist() == [1]
