"""Broadcast scorer (packed + dictionary-interned code paths) vs the pandas
``score_batch`` kernel — randomized pair-level equivalence over the FULL
default address model, which exercises every level kind: exact, pair_equal,
cross_equal, digits_equal, flat_presence_mismatch, lev_leq,
split_part_equal, overlap/hist kinds, null variants, and TF adjustment
(including absent and 0.0 tf entries)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
    _BroadcastScorer,
)
from moj_analytical_services_uk_address_matcher_ray.stages.scoring import (
    _ComparisonEvaluator,
    score_batch,
)
from moj_analytical_services_uk_address_matcher_ray.state.model import (
    default_address_model,
)

HIST_T = pa.list_(
    pa.struct(
        [("tok", pa.string()), ("rel_freq", pa.float64()), ("count", pa.int64())]
    )
)


def _rand_hist(rng):
    # (tok, rel_freq) keys are UNIQUE per histogram — the data contract
    # (hists come from a groupby); packed and dict forms both assume it
    r = rng.random()
    if r < 0.15:
        return None
    if r < 0.25:
        return []
    k = int(rng.integers(1, 5))
    toks = rng.choice(6, size=k, replace=False)
    return [
        {
            "tok": f"t{int(t)}",
            "rel_freq": float(rng.choice([0.001, 0.01, 0.1, 0.5])),
            "count": int(rng.integers(1, 4)),
        }
        for t in toks
    ]


def _pick(rng, pool):
    v = pool[int(rng.integers(0, len(pool)))]
    return v


def _rand_store(rng, n) -> pa.Table:
    # shared pools across numeric columns so pair_equal / cross_equal fire;
    # values with letter prefixes make digits_equal differ from exact
    num_pool = ["1", "2", "10", "10A", "A10", "22", "B22", None]
    pcs = ["AB1 2CD", "AB1 2CE", "AB1", "XY9 9ZZ", "AB12CD", "", None]
    addr = ["1 HIGH ST", "2 LOW RD", "1 HIGH ST X", None]
    cols = {
        "ukam_address_id": pa.array([f"id{i}" for i in range(n)]),
        "original_address_concat": pa.array(
            [_pick(rng, addr) for _ in range(n)]
        ),
        "flat_positional": pa.array(
            [_pick(rng, ["1", "2", None, None]) for _ in range(n)]
        ),
        "flat_letter": pa.array(
            [_pick(rng, ["A", "B", "1", None, None]) for _ in range(n)]
        ),
        "numeric_token_1": pa.array([_pick(rng, num_pool) for _ in range(n)]),
        "numeric_token_2": pa.array([_pick(rng, num_pool) for _ in range(n)]),
        "numeric_token_3": pa.array([_pick(rng, num_pool) for _ in range(n)]),
        "token_rel_freq_arr_hist": pa.array(
            [_rand_hist(rng) for _ in range(n)], HIST_T
        ),
        "common_end_tokens_hist": pa.array(
            [_rand_hist(rng) for _ in range(n)], HIST_T
        ),
        "postcode": pa.array([_pick(rng, pcs) for _ in range(n)]),
    }
    return pa.table(cols)


TF_TABLES = {
    # absent keys, a 0.0 entry (truthiness edge: `0.0 or None` is falsy),
    # and ordinary entries
    "numeric_token_1": {"1": 0.2, "10": 0.01, "10A": 0.0},
    "numeric_token_2": {"2": 0.5, "22": 0.002},
    "numeric_token_3": {"1": 0.3, "B22": 0.004},
}


def _wide_pairs(store: pa.Table, il: np.ndarray, ir: np.ndarray) -> pa.Table:
    left = store.take(pa.array(il)).rename_columns(
        [f"{c}_l" for c in store.column_names]
    )
    right = store.take(pa.array(ir)).rename_columns(
        [f"{c}_r" for c in store.column_names]
    )
    cols = {c: left[c] for c in left.column_names}
    cols.update({c: right[c] for c in right.column_names})
    cols["rule_idx"] = pa.array(np.zeros(len(il), dtype=np.int32))
    return pa.table(cols)


@pytest.mark.parametrize("threshold", [None, 2.0])
def test_broadcast_scorer_matches_pandas_kernel(ray_session, threshold):
    rng = np.random.default_rng(1234)
    n = 120
    store = _rand_store(rng, n)
    model = default_address_model()
    payload = [c for c in store.column_names if c != "ukam_address_id"]

    n_pairs = 600
    il = rng.integers(0, n, size=n_pairs)
    ir = rng.integers(0, n, size=n_pairs)

    # reference: the pandas kernel over the fully-joined wide pair table
    evaluators = [_ComparisonEvaluator(c, TF_TABLES) for c in model.comparisons]
    ref = score_batch(
        _wide_pairs(store, il, ir),
        evaluators,
        model.prior_log2_odds,
        threshold=threshold,
    )
    ref_w = {
        (l, r): w
        for l, r, w in zip(
            ref["ukam_address_id_l"].to_pylist(),
            ref["ukam_address_id_r"].to_pylist(),
            ref["match_weight"].to_pylist(),
        )
    }

    scorer = _BroadcastScorer(
        ray.put(store),
        ray.put(store),
        ray.put(model),
        ray.put(TF_TABLES),
        payload_cols=payload,
        id_col="ukam_address_id",
        threshold=threshold,
        emit_cols=["ukam_address_id_l", "ukam_address_id_r", "match_weight"],
    )
    # the interned plan must actually be in play for this model
    assert scorer._eq_groups and scorer._tf_cols and scorer._dig_cols
    ids = store["ukam_address_id"].to_pylist()
    pairs = pa.table(
        {
            "ukam_address_id_l": pa.array([ids[i] for i in il]),
            "ukam_address_id_r": pa.array([ids[i] for i in ir]),
            "rule_idx": pa.array(np.zeros(n_pairs, dtype=np.int32)),
        }
    )
    got = scorer(pairs)
    got_w = {
        (l, r): w
        for l, r, w in zip(
            got["ukam_address_id_l"].to_pylist(),
            got["ukam_address_id_r"].to_pylist(),
            got["match_weight"].to_pylist(),
        )
    }

    # identical survivor sets (threshold path = branch-and-bound pruning)
    assert set(got_w) == set(ref_w)
    for k in ref_w:
        np.testing.assert_allclose(got_w[k], ref_w[k], rtol=1e-12, atol=0)


def test_broadcast_scorer_null_tf_and_empty_batch(ray_session):
    """Null-heavy store + empty pair batch through the interned path."""
    store = pa.table(
        {
            "ukam_address_id": pa.array(["a", "b"]),
            "original_address_concat": pa.array([None, None], pa.string()),
            "flat_positional": pa.array([None, None], pa.string()),
            "flat_letter": pa.array([None, None], pa.string()),
            "numeric_token_1": pa.array([None, "9"], pa.string()),
            "numeric_token_2": pa.array([None, None], pa.string()),
            "numeric_token_3": pa.array([None, None], pa.string()),
            "token_rel_freq_arr_hist": pa.array([None, None], HIST_T),
            "common_end_tokens_hist": pa.array([None, None], HIST_T),
            "postcode": pa.array([None, "AB1 2CD"], pa.string()),
        }
    )
    model = default_address_model()
    payload = [c for c in store.column_names if c != "ukam_address_id"]
    scorer = _BroadcastScorer(
        ray.put(store),
        ray.put(store),
        ray.put(model),
        ray.put(TF_TABLES),
        payload_cols=payload,
        id_col="ukam_address_id",
        threshold=None,
        emit_cols=["ukam_address_id_l", "ukam_address_id_r", "match_weight"],
    )
    pairs = pa.table(
        {
            "ukam_address_id_l": pa.array(["a", "b"]),
            "ukam_address_id_r": pa.array(["b", "b"]),
            "rule_idx": pa.array([0, 0], pa.int32()),
        }
    )
    out = scorer(pairs)
    assert out.num_rows == 2
    ref = score_batch(
        _wide_pairs(store, np.array([0, 1]), np.array([1, 1])),
        [_ComparisonEvaluator(c, TF_TABLES) for c in model.comparisons],
        model.prior_log2_odds,
    )
    np.testing.assert_allclose(
        out["match_weight"].to_numpy(),
        ref["match_weight"].to_numpy(),
        rtol=1e-12,
    )
    empty = scorer(pairs.slice(0, 0))
    assert empty.num_rows == 0


def test_broadcast_scorer_empty_tf_table(ray_session):
    """A TF-tables entry that is PRESENT but EMPTY ({}) must not crash the
    broadcast scorer (regression: the col was neither dictionary-coded nor
    demoted to the pandas view, so the evaluator's per-row TF fallback read
    a missing df column -> KeyError) and must score identically to the
    pandas kernel given the same (empty) table."""
    rng = np.random.default_rng(77)
    n = 40
    store = _rand_store(rng, n)
    model = default_address_model()
    payload = [c for c in store.column_names if c != "ukam_address_id"]
    tf_empty = {"numeric_token_1": {}, "numeric_token_2": {"2": 0.5}}

    n_pairs = 120
    il = rng.integers(0, n, size=n_pairs)
    ir = rng.integers(0, n, size=n_pairs)
    ref = score_batch(
        _wide_pairs(store, il, ir),
        [_ComparisonEvaluator(c, tf_empty) for c in model.comparisons],
        model.prior_log2_odds,
    )
    scorer = _BroadcastScorer(
        ray.put(store),
        ray.put(store),
        ray.put(model),
        ray.put(tf_empty),
        payload_cols=payload,
        id_col="ukam_address_id",
        threshold=None,
        emit_cols=["ukam_address_id_l", "ukam_address_id_r", "match_weight"],
    )
    ids = store["ukam_address_id"].to_pylist()
    pairs = pa.table(
        {
            "ukam_address_id_l": pa.array([ids[i] for i in il]),
            "ukam_address_id_r": pa.array([ids[i] for i in ir]),
            "rule_idx": pa.array(np.zeros(n_pairs, dtype=np.int32)),
        }
    )
    got = scorer(pairs)  # must not raise
    assert got.num_rows == n_pairs
    got_w = {
        (l, r): w
        for l, r, w in zip(
            got["ukam_address_id_l"].to_pylist(),
            got["ukam_address_id_r"].to_pylist(),
            got["match_weight"].to_pylist(),
        )
    }
    for l, r, w in zip(
        ref["ukam_address_id_l"].to_pylist(),
        ref["ukam_address_id_r"].to_pylist(),
        ref["match_weight"].to_pylist(),
    ):
        np.testing.assert_allclose(got_w[(l, r)], w, rtol=1e-12, atol=0)
