"""Sequence packing (stages/packing.py), substring duplicate spans
(stages/dedup.py:duplicate_spans) and the two-level distinct aggregate
(stages/aggregates.py:distinct_per_group)."""

import hashlib

import pytest
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.aggregates import (
    distinct_per_group,
)
from moj_analytical_services_uk_address_matcher_ray.stages.dedup import (
    duplicate_spans,
)
from moj_analytical_services_uk_address_matcher_ray.stages.packing import (
    pack_sequences,
)


def _packed(rows, seq_len, **kw):
    out = (
        pack_sequences(rd.from_items(rows), seq_len=seq_len, **kw)
        .to_pandas()
        .sort_values("pack_pos")
        .reset_index(drop=True)
    )
    return out


def test_pack_sequences_order_offsets_and_spans(ray_session):
    rows = [
        {"doc_id": i, "text": " ".join(["tok"] * n)}
        for i, n in enumerate([3, 5, 2, 7, 4])
    ]
    out = _packed(rows, seq_len=4)
    # global order is the md5 lottery, independently recomputed here
    expect = sorted(
        range(5), key=lambda i: (hashlib.md5(f"{i}:".encode()).hexdigest(), i)
    )
    assert out["doc_id"].tolist() == expect
    # offsets: exclusive prefix sum of token counts in that order
    lens = {i: n for i, n in enumerate([3, 5, 2, 7, 4])}
    acc = 0
    for _, r in out.iterrows():
        assert r["tok_start"] == acc
        assert r["n_tokens"] == lens[r["doc_id"]]
        assert r["seq_first"] == acc // 4
        assert r["seq_last"] == (acc + r["n_tokens"] - 1) // 4
        acc += r["n_tokens"]
    assert acc == 21
    # a doc that spans a boundary covers >1 sequence
    assert (out["seq_last"] > out["seq_first"]).any()


def test_pack_sequences_drops_empty_docs_and_respects_salt(ray_session):
    rows = [
        {"doc_id": 0, "text": "a b c"},
        {"doc_id": 1, "text": "   "},  # zero tokens -> dropped
        {"doc_id": 2, "text": ""},  # zero tokens -> dropped
        {"doc_id": 3, "text": "x y"},
    ]
    out = _packed(rows, seq_len=10)
    assert set(out["doc_id"]) == {0, 3}
    assert out["pack_pos"].tolist() == [0, 1]
    # a different salt draws a different (here: reversed) order
    out_a = _packed(rows, seq_len=10)["doc_id"].tolist()
    for salt in ("1", "2", "3", "4", "5"):
        if _packed(rows, seq_len=10, salt=salt)["doc_id"].tolist() != out_a:
            break
    else:
        raise AssertionError("salt never changed the pack order")


def test_duplicate_spans_counts(ray_session):
    # k=3: "a b c" window shared by docs 0 and 1; doc 2 has an internal
    # repeat of "p q r"; doc 3 is all-unique; doc 4 too short for any window
    rows = [
        {"doc_id": 0, "text": "a b c x y"},
        {"doc_id": 1, "text": "z a b c"},
        {"doc_id": 2, "text": "p q r s p q r"},
        {"doc_id": 3, "text": "u v w m n"},
        {"doc_id": 4, "text": "one two"},
    ]
    out = (
        duplicate_spans(rd.from_items(rows), k=3)
        .to_pandas()
        .set_index("id")
        .sort_index()
    )
    assert out.loc[0, "n_shingles"] == 3 and out.loc[0, "n_dup_shingles"] == 1
    assert out.loc[1, "n_shingles"] == 2 and out.loc[1, "n_dup_shingles"] == 1
    # doc 2: 5 windows; "p q r" occurs at positions 0 and 4 -> both dup
    assert out.loc[2, "n_shingles"] == 5 and out.loc[2, "n_dup_shingles"] == 2
    assert out.loc[3, "n_shingles"] == 3 and out.loc[3, "n_dup_shingles"] == 0
    assert out.loc[4, "n_shingles"] == 0 and out.loc[4, "n_dup_shingles"] == 0


def test_duplicate_spans_case_and_whitespace_rule(ray_session):
    # tokens are lowered and \s+-split, so "A  B\tC" == "a b c"
    rows = [
        {"doc_id": 0, "text": "A  B\tC"},
        {"doc_id": 1, "text": "a b c"},
    ]
    out = (
        duplicate_spans(rd.from_items(rows), k=3).to_pandas().set_index("id")
    )
    assert out["n_dup_shingles"].tolist() == [1, 1]


def test_distinct_per_group_exact(ray_session):
    rows = (
        [{"g": "a", "v": 1}] * 3  # duplicates collapse
        + [{"g": "a", "v": 2}]
        + [{"g": "b", "v": 1}]
        + [{"g": "b", "v": 9}, {"g": "b", "v": 9}]
        + [{"g": "c", "v": 5}]
    )
    out = (
        distinct_per_group(
            rd.from_items(rows), group_col="g", value_col="v", n_buckets=8
        )
        .to_pandas()
        .set_index("g")["n_distinct"]
        .sort_index()
    )
    assert out.tolist() == [2, 2, 1]


def test_upsample_by_weight_reps_and_epochs(ray_session):
    import math

    from moj_analytical_services_uk_address_matcher_ray.stages.sampling import (
        _hash_fraction,
        upsample_by_weight,
    )

    rows = [{"doc_id": i, "source": "a" if i % 2 else "b"} for i in range(40)]
    out = upsample_by_weight(
        rd.from_items(rows), {"a": 2.5, "b": 0.25}, group_col="source"
    ).to_pandas()
    for i in range(40):
        f = _hash_fraction([i], "")[0]
        w = 2.5 if i % 2 else 0.25
        want = math.floor(w) + (1 if f < w - math.floor(w) else 0)
        got = out[out["doc_id"] == i]
        assert len(got) == want, (i, w, f)
        assert sorted(got["epoch"].tolist()) == list(range(want))


def test_doc_entropy_values(ray_session):
    import math

    import pyarrow as pa

    from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
        doc_entropy,
    )

    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b c d", "a a a a", "a a b b", ""],
        }
    )
    out = doc_entropy(t)["entropy_bits"].to_pylist()
    assert abs(out[0] - 2.0) < 1e-12  # uniform over 4
    assert out[1] == 0.0  # single symbol
    assert abs(out[2] - 1.0) < 1e-12  # fair coin
    assert out[3] == 0.0  # empty doc -> single empty token
    assert math.isfinite(sum(out))


def test_group_topk_tokens_ranking_and_ties(ray_session):
    from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
        group_topk_tokens,
    )

    rows = [
        {"g": "x", "text": "b b b a a c"},
        {"g": "x", "text": "a"},  # a ties b at 3 -> 'a' wins rank 1 (asc)
        {"g": "y", "text": "z z q"},
    ]
    out = (
        group_topk_tokens(
            rd.from_items(rows), group_col="g", text_col="text", k=2, n_buckets=4
        )
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    x = out[out["g"] == "x"]
    assert x["token"].tolist() == ["a", "b"]
    assert x["cnt"].tolist() == [3, 3]
    assert x["rank"].tolist() == [1, 2]
    y = out[out["g"] == "y"]
    assert y["token"].tolist() == ["z", "q"]


def test_heavy_hitters_exact_with_tiny_sketch(ray_session):
    """Force the Misra-Gries reduction (sketch_k << local vocab) across many
    blocks and assert EXACT counts for every token >= min_count, none below."""
    import collections

    from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
        heavy_hitters,
    )

    rng = __import__("random").Random(7)
    vocab = [f"t{i}" for i in range(200)]
    rows = []
    truth = collections.Counter()
    for _ in range(300):
        # skewed: a few hot tokens ride every doc, the tail is uniform noise
        toks = ["hot1", "hot2"] + rng.choices(vocab, k=30)
        if rng.random() < 0.5:
            toks.append("hot3")
        truth.update(toks)
        rows.append({"text": " ".join(toks)})
    ds = rd.from_items(rows).repartition(16)
    min_count = 120
    # N = 300*32.5 ~ 9750 tokens; need sketch_k+1 > N/min_count = ~82
    out = heavy_hitters(ds, min_count=min_count, sketch_k=96)
    got = dict(zip(out["token"].to_pylist(), out["cnt"].to_pylist()))
    want = {t: c for t, c in truth.items() if c >= min_count}
    assert got == want and "hot1" in got
    # descending count order with token tiebreak
    cnts = out["cnt"].to_pylist()
    assert cnts == sorted(cnts, reverse=True)


def test_heavy_hitters_guarantee_violation_raises(ray_session):
    from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
        heavy_hitters,
    )

    rows = [{"text": " ".join(f"w{i}" for i in range(500))} for _ in range(20)]
    ds = rd.from_items(rows)
    with pytest.raises(ValueError, match="guarantee"):
        # N=10000 tokens, k=9 -> N/(k+1)=1000 >= min_count=5
        heavy_hitters(ds, min_count=5, sketch_k=9)


def test_dsir_weights_formula_and_ranking(ray_session):
    """Exact-formula parity with a driver-side reference implementation,
    and the semantic sanity check: docs written in the target domain's
    vocabulary score higher than off-domain docs."""
    import collections
    import hashlib
    import math

    from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
        dsir_weights,
    )

    B = 256
    rows = [
        {"doc_id": 0, "lang": "en", "text": "alpha beta alpha beta gamma"},
        {"doc_id": 1, "lang": "en", "text": "alpha beta gamma delta"},
        {"doc_id": 2, "lang": "fr", "text": "zeta eta theta iota"},
        {"doc_id": 3, "lang": "fr", "text": "alpha beta gamma"},  # en-like
        {"doc_id": 4, "lang": "fr", "text": "zeta eta zeta eta"},
        {"doc_id": 5, "lang": "en", "text": "solo"},  # no bigrams -> 0
    ]
    out = (
        dsir_weights(
            rd.from_items(rows).repartition(3),
            target_col="lang",
            target_value="en",
            n_buckets=B,
        )
        .to_pandas()
        .set_index("doc_id")["dsir_weight"]
    )

    def bucket(g):
        return int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big") % B

    cr, ct = collections.Counter(), collections.Counter()
    doc_bs = {}
    for r in rows:
        toks = r["text"].lower().split()
        bs = [bucket(" ".join(toks[i : i + 2])) for i in range(len(toks) - 1)]
        doc_bs[r["doc_id"]] = bs
        for b in bs:
            cr[b] += 1
            if r["lang"] == "en":
                ct[b] += 1
    R, T = sum(cr.values()), sum(ct.values())
    for did, bs in doc_bs.items():
        want = sum(
            math.log((ct[b] + 1) / (T + B)) - math.log((cr[b] + 1) / (R + B))
            for b in bs
        )
        assert abs(out[did] - want) < 1e-12, did
    assert out[5] == 0.0
    # the en-vocabulary fr doc outranks the genuinely-fr docs
    assert out[3] > out[2] and out[3] > out[4]


def test_curriculum_interleave_mixture_and_determinism(ray_session):
    import numpy as np
    import pytest
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.stages.packing import (
        curriculum_interleave,
    )

    rows = []
    for s, n in (("a", 300), ("b", 300), ("c", 300)):
        rows += [{"doc_id": f"{s}{i}", "source": s} for i in range(n)]
    out = (
        curriculum_interleave(
            rd.from_items(rows),
            id_col="doc_id",
            weights={"a": 3, "b": 2, "c": 1},
            shard_docs=90,
        )
        .to_pandas()
        .sort_values("interleave_pos")
    )
    assert len(out) == 900
    # positions are a permutation of 0..899
    assert sorted(out["interleave_pos"]) == list(range(900))
    # stride scheduling: an early prefix respects the 3:2:1 mixture while
    # every source still has docs left
    prefix = out.head(180)["source"].value_counts()
    assert prefix["a"] == 90 and prefix["b"] == 60 and prefix["c"] == 30
    # shards follow positions
    assert (out["shard"] == out["interleave_pos"] // 90).all()
    # per-source ranks are each a permutation of 0..n-1
    for s, n in (("a", 300), ("b", 300), ("c", 300)):
        assert sorted(out[out["source"] == s]["source_rank"]) == list(range(n))
    # determinism: a second run is byte-identical
    again = (
        curriculum_interleave(
            rd.from_items(rows),
            id_col="doc_id",
            weights={"a": 3, "b": 2, "c": 1},
            shard_docs=90,
        )
        .to_pandas()
        .sort_values("interleave_pos")
    )
    assert (again.values == out.values).all()
    # unknown source -> loud error, not a silently skewed mixture
    with pytest.raises(Exception, match="sources without weights"):
        curriculum_interleave(
            rd.from_items([{"doc_id": "z", "source": "zz"}]),
            id_col="doc_id",
            weights={"a": 1},
        ).materialize()
