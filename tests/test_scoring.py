"""Fellegi-Sunter scorer: level predicates, histogram banding, hand-computed
match weights, and the reference-model JSON loader."""

import math
import os

import pandas as pd
import pytest

from moj_analytical_services_uk_address_matcher_ray.stages.scoring import (
    PairScorer,
    hist_product,
    levenshtein_leq,
    split_part,
)
from moj_analytical_services_uk_address_matcher_ray.state.model import (
    default_address_model,
    load_model_json,
)

REF_MODEL = "/root/reference/uk_address_matcher/data/splink_model.json"


def test_levenshtein_leq():
    assert levenshtein_leq("AB1 2CD", "AB1 2CD", 0)
    assert levenshtein_leq("AB1 2CD", "AB1 2CE", 1)
    assert not levenshtein_leq("AB1 2CD", "XY9 9ZZ", 2)
    assert levenshtein_leq("ABC", "AC", 1)  # deletion
    assert not levenshtein_leq("ABCDE", "A", 2)


def test_split_part_duckdb_semantics():
    assert split_part("W1G 9SU", 1) == "W1G"
    assert split_part("W1G 9SU", 2) == "9SU"
    assert split_part("W1G", 2) == ""  # out of range -> ''
    assert split_part(None, 1) is None  # NULL propagates (DuckDB)


def test_hist_product():
    hl = [
        {"tok": "A", "rel_freq": 0.01, "count": 2},
        {"tok": "B", "rel_freq": 0.1, "count": 1},
        {"tok": "C", "rel_freq": 0.5, "count": 1},
    ]
    hr = [
        {"tok": "A", "rel_freq": 0.01, "count": 1},
        {"tok": "B", "rel_freq": 0.1, "count": 3},
    ]
    # A: 0.01^min(2,1) * B: 0.1^min(1,3); C absent from r
    assert hist_product(hl, hr) == pytest.approx(0.01 * 0.1)
    assert hist_product([], hr) == 1.0
    assert hist_product(None, hr) == 1.0
    # key equality is (tok, rel_freq) — different rel_freq -> no overlap
    assert hist_product(
        [{"tok": "A", "rel_freq": 0.01, "count": 1}],
        [{"tok": "A", "rel_freq": 0.02, "count": 1}],
    ) == 1.0


def _pair_df(**cols):
    base = {
        "original_address_concat_l": ["1 HIGH ST"],
        "original_address_concat_r": ["1 HIGH ST"],
        "flat_positional_l": [None],
        "flat_positional_r": [None],
        "flat_letter_l": [None],
        "flat_letter_r": [None],
        "numeric_token_1_l": ["1"],
        "numeric_token_1_r": ["1"],
        "numeric_token_2_l": [None],
        "numeric_token_2_r": [None],
        "numeric_token_3_l": [None],
        "numeric_token_3_r": [None],
        "token_rel_freq_arr_hist_l": [None],
        "token_rel_freq_arr_hist_r": [None],
        "common_end_tokens_hist_l": [None],
        "common_end_tokens_hist_r": [None],
        "postcode_l": ["W1G 9SU"],
        "postcode_r": ["W1G 9SU"],
    }
    base.update(cols)
    return pd.DataFrame(base)


def _score(df, model=None):
    import pyarrow as pa

    scorer = PairScorer(model or default_address_model(), emit_gammas=True)
    return scorer(pa.Table.from_pandas(df))


def test_match_weight_hand_computed():
    out = _score(_pair_df()).to_pandas()
    m = default_address_model()
    # exact addr (BF 15/1... wait m=15,u=1 -> 15), flat null (1), n1 exact (95.0095),
    # n2 both-null (null level ->1), n3 both-null (1), hists null (1),
    # postcode exact (3e6)
    expected = (
        math.log2(m.prior / (1 - m.prior))
        + math.log2(15)
        + math.log2(95.00950852025916)
        + math.log2(3000000.0)
    )
    assert out["match_weight"][0] == pytest.approx(expected)
    p = out["match_probability"][0]
    assert p == pytest.approx(2**expected / (1 + 2**expected))


def test_level_order_first_match_wins():
    # postcode differs by 1 char -> lev<=1 level (BF 1e4), not exact
    out = _score(_pair_df(postcode_r=["W1G 9SV"])).to_pandas()
    out2 = _score(_pair_df()).to_pandas()
    diff = out2["match_weight"][0] - out["match_weight"][0]
    assert diff == pytest.approx(math.log2(3000000.0) - math.log2(10000))


def test_digits_equal_level():
    out = _score(_pair_df(numeric_token_1_l=["12A"], numeric_token_1_r=["12"])).to_pandas()
    # digits-only equality -> same BF as exact.  Splink gamma parity: the 5
    # non-null levels (exact, digits, inverted, one-null, else) are numbered
    # in REVERSE (exact=4, digits=3, ..., else=0); null levels are -1
    assert out["gamma_numeric_token_1"][0] == 3


def test_tf_adjustment():
    model = default_address_model()
    tf = {"numeric_token_1": {"1": 0.25}}
    import pyarrow as pa

    scorer = PairScorer(model, tf, emit_gammas=False)
    out = scorer(pa.Table.from_pandas(_pair_df())).to_pandas()
    base = _score(_pair_df()).to_pandas()
    # u=1, tf=0.25, weight=0.1 -> *(1/0.25)^0.1 = 4^0.1
    assert out["match_weight"][0] - base["match_weight"][0] == pytest.approx(
        math.log2(4**0.1)
    )


def test_hist_band_level():
    hist_l = [{"tok": "RARE", "rel_freq": 1e-6, "count": 1}]
    hist_r = [{"tok": "RARE", "rel_freq": 1e-6, "count": 1}]
    out = _score(
        _pair_df(
            token_rel_freq_arr_hist_l=[hist_l], token_rel_freq_arr_hist_r=[hist_r]
        )
    ).to_pandas()
    base = _score(_pair_df()).to_pandas()
    # P = 1e-6 -> first true band is "< 1e-5" with BF 32
    assert out["match_weight"][0] - base["match_weight"][0] == pytest.approx(
        math.log2(32)
    )


def test_threshold_filter_fused():
    import pyarrow as pa

    scorer = PairScorer(default_address_model(), threshold_match_weight=1e9)
    out = scorer(pa.Table.from_pandas(_pair_df()))
    assert out.num_rows == 0


@pytest.mark.skipif(not os.path.exists(REF_MODEL), reason="reference model absent")
def test_reference_model_json_loads():
    m = load_model_json(REF_MODEL)
    assert m.prior == 3e-8
    assert len(m.comparisons) == 8
    assert len(m.blocking_rules) == 18
    names = [c.name for c in m.comparisons]
    assert names[0] == "original_address_concat"
    hist = next(c for c in m.comparisons if c.name == "token_rel_freq_arr_hist")
    # 34 banded levels + null + else
    assert len(hist.levels) == 36
    pc_comp = next(c for c in m.comparisons if c.name == "postcode")
    assert pc_comp.levels[2].kind == "lev_leq"
    assert pc_comp.levels[2].params == {"col": "postcode", "k": 1}


@pytest.mark.skipif(not os.path.exists(REF_MODEL), reason="reference model absent")
def test_reference_model_scores_exact_pair():
    m = load_model_json(REF_MODEL)
    out = _score(_pair_df(), model=m).to_pandas()
    built = _score(_pair_df()).to_pandas()
    # the loaded reference model and our programmatic re-derivation agree
    assert out["match_weight"][0] == pytest.approx(built["match_weight"][0])


@pytest.mark.skipif(not os.path.exists(REF_MODEL), reason="reference model absent")
def test_reference_model_gamma_numbering():
    """Splink gamma-numbering parity against the REFERENCE model JSON
    (splink_model.json level ordering): gamma -1 for a fired null level,
    highest gamma for the first-declared non-null level, 0 for 'else' —
    asserted per comparison on pairs engineered to fire specific levels."""
    m = load_model_json(REF_MODEL)

    def gammas(df):
        return _score(df, model=m).to_pandas().iloc[0]

    # exact postcode -> first of the 6 non-null postcode levels
    # (exact, lev<=1, lev<=2, outward, inward, else) -> gamma 5
    g = gammas(_pair_df())
    assert g["gamma_postcode"] == 5
    # lev<=1 postcode -> second non-null level -> gamma 4
    assert gammas(_pair_df(postcode_r=["W1G 9SV"]))["gamma_postcode"] == 4
    # same outward district only -> gamma 2; else -> gamma 0
    assert gammas(_pair_df(postcode_r=["W1G 111"]))["gamma_postcode"] == 2
    assert gammas(_pair_df(postcode_r=["ZZ9 9ZZ"]))["gamma_postcode"] == 0
    # both-null numeric_token_2 fires its null level -> gamma -1
    assert g["gamma_numeric_token_2"] == -1
    # exact original_address_concat: levels (null, exact, else) -> gamma 1
    assert g["gamma_original_address_concat"] == 1
    assert (
        gammas(_pair_df(original_address_concat_r=["2 LOW RD"]))[
            "gamma_original_address_concat"
        ]
        == 0
    )
    # numeric_token_1 exact -> first of its 5 non-null levels -> gamma 4
    assert g["gamma_numeric_token_1"] == 4
