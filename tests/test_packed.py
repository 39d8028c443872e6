"""Packed flat-array kernels (stages/packed.py) vs the scalar reference
implementations they replace — randomized equivalence on adversarial shapes
(nulls, empty lists, duplicate set entries, zero-overlap, full-overlap)."""

import numpy as np
import pyarrow as pa

from moj_analytical_services_uk_address_matcher_ray.stages.packed import (
    hist_products,
    overlap_counts,
    pack_hists,
    pack_sets,
    split_parts,
)
from moj_analytical_services_uk_address_matcher_ray.stages.scoring import (
    hist_product,
    split_part,
)


def _rand_sets(rng, n, vocab):
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.1:
            out.append(None)
        elif r < 0.2:
            out.append([])
        else:
            k = rng.integers(1, 8)
            toks = [vocab[rng.integers(0, len(vocab))] for _ in range(k)]
            if rng.random() < 0.3:
                toks = toks + toks[:1]  # duplicate entry — set semantics
            out.append(toks)
    return out


def test_overlap_counts_matches_set_intersection():
    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(40)]
    left = _rand_sets(rng, 200, vocab)
    right = _rand_sets(rng, 150, vocab)
    pl = pack_sets(pa.array(left, pa.list_(pa.string())))
    pr = pack_sets(pa.array(right, pa.list_(pa.string())))
    take_l = rng.integers(0, 200, size=500)
    take_r = rng.integers(0, 150, size=500)
    got = overlap_counts(pl, pr, take_l, take_r)
    for i in range(500):
        a, b = left[take_l[i]], right[take_r[i]]
        want = 0 if a is None or b is None else len(set(a) & set(b))
        assert got[i] == want, (i, a, b, got[i], want)


def _rand_hists(rng, n, vocab, rel_freqs):
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.1:
            out.append(None)
        elif r < 0.2:
            out.append([])
        else:
            k = int(rng.integers(1, 10))
            idx = rng.choice(len(vocab), size=k, replace=False)
            out.append(
                [
                    {
                        "tok": vocab[j],
                        "rel_freq": rel_freqs[j],
                        "count": int(rng.integers(1, 4)),
                    }
                    for j in idx
                ]
            )
    return out


def test_hist_products_float_identical_to_scalar_loop():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    rel_freqs = rng.random(30) * 0.2 + 1e-6
    typ = pa.list_(
        pa.struct(
            [("tok", pa.string()), ("rel_freq", pa.float64()), ("count", pa.int64())]
        )
    )
    left = _rand_hists(rng, 120, vocab, rel_freqs)
    right = _rand_hists(rng, 90, vocab, rel_freqs)
    pl = pack_hists(pa.array(left, typ))
    pr = pack_hists(pa.array(right, typ))
    take_l = rng.integers(0, 120, size=400)
    take_r = rng.integers(0, 90, size=400)
    got = hist_products(pl, pr, take_l, take_r)
    for i in range(400):
        want = hist_product(left[take_l[i]], right[take_r[i]])
        assert got[i] == want, (i, got[i], want)  # bit-identical, not approx


def test_hist_products_same_tok_different_rel_freq_no_match():
    typ = pa.list_(
        pa.struct(
            [("tok", pa.string()), ("rel_freq", pa.float64()), ("count", pa.int64())]
        )
    )
    left = [[{"tok": "a", "rel_freq": 0.5, "count": 2}]]
    right = [[{"tok": "a", "rel_freq": 0.25, "count": 2}]]
    pl, pr = pack_hists(pa.array(left, typ)), pack_hists(pa.array(right, typ))
    got = hist_products(pl, pr, np.array([0]), np.array([0]))
    assert got[0] == 1.0  # (tok, rel_freq) struct equality — no shared key


def test_split_parts_matches_scalar_split_part():
    vals = ["A B", "A", "", None, "X Y Z", " lead", "trail "]
    arr = pa.array(vals, pa.string())
    for part in (1, 2, 3):
        got = split_parts(arr, part)
        for i, v in enumerate(vals):
            assert got[i] == split_part(v, part), (v, part, got[i])


def test_pack_sets_null_and_empty_flags():
    p = pack_sets(pa.array([None, [], ["a"], ["a", "a"]], pa.list_(pa.string())))
    assert p.isnull.tolist() == [True, False, False, False]
    assert p.lens.tolist() == [0, 0, 1, 1]  # duplicates collapsed
