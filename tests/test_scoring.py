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


def test_first_n_tokens_level_duckdb_parity():
    """The optional first-N-tokens comparison (reference training.py:19-91)
    fires exactly like the reference's DuckDB sql_condition on a fuzzed
    pair table, for every N."""
    import duckdb
    import numpy as np
    import pandas as pd

    from moj_analytical_services_uk_address_matcher_ray.state.model import (
        first_n_tokens_comparison,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.scoring import (
        _ComparisonEvaluator,
    )

    rng = np.random.RandomState(31)
    words = ["FLAT", "1", "HIGH", "ST", "LONDON", "A", "12B", "THE", "X"]

    def addr():
        if rng.rand() < 0.05:
            return None
        return " ".join(rng.choice(words, rng.randint(1, 6)))

    n = 400
    df = pd.DataFrame(
        {
            "original_address_concat_l": [addr() for _ in range(n)],
            "original_address_concat_r": [addr() for _ in range(n)],
            "postcode_l": [
                None if rng.rand() < 0.1 else rng.choice(["AB1 2CD", "EF3 4GH"])
                for _ in range(n)
            ],
            "postcode_r": [
                None if rng.rand() < 0.1 else rng.choice(["AB1 2CD", "EF3 4GH"])
                for _ in range(n)
            ],
        }
    )
    # force prefix-equal cases so upper levels actually fire
    same = rng.rand(n) < 0.4
    df.loc[same, "original_address_concat_r"] = df.loc[
        same, "original_address_concat_l"
    ]
    df.loc[same, "postcode_r"] = df.loc[same, "postcode_l"]

    comp = first_n_tokens_comparison()
    ev = _ComparisonEvaluator(comp, {})
    con = duckdb.connect()
    con.register("t", df)
    for lv in comp.levels:
        if lv.kind == "else":
            continue
        nn = lv.params["n"]
        pat = rf"^(?:\S+\s+){{{nn - 1}}}\S+" if nn > 1 else r"^\S+"
        ref = (
            con.sql(
                f"""
            SELECT coalesce(
                regexp_extract(original_address_concat_l, '{pat}') =
                regexp_extract(original_address_concat_r, '{pat}')
                AND length(regexp_extract(original_address_concat_l, '{pat}')) > 1
                AND postcode_l = postcode_r, FALSE) AS fire
            FROM t
            """
            )
            .fetchdf()["fire"]
            .to_numpy(dtype=bool)
        )
        got = ev._level_mask(lv, df, None)
        assert (got == ref).all(), f"n={nn}: {int((got != ref).sum())} mismatches"


def test_first_n_tokens_model_json_round_trip(tmp_path):
    """A model json carrying the reference's first_n_tokens sql_conditions
    loads into the same level kinds/params the builder produces."""
    import json

    from moj_analytical_services_uk_address_matcher_ray.state.model import (
        first_n_tokens_comparison,
        load_model_json,
    )

    def sql(nn):
        pat = rf"^(?:\S+\s+){{{nn - 1}}}\S+" if nn > 1 else r"^\S+"
        return (
            f"regexp_extract(original_address_concat_l, '{pat}') = "
            f"regexp_extract(original_address_concat_r, '{pat}') "
            f"and length(regexp_extract(original_address_concat_l, '{pat}')) > 1 "
            f"and postcode_l = postcode_r"
        ).replace("\\", "\\")

    doc = {
        "probability_two_random_records_match": 0.01,
        "comparisons": [
            {
                "output_column_name": "first_n_tokens",
                "comparison_levels": [
                    {
                        "sql_condition": sql(nn),
                        "label_for_charts": f"First {nn} tokens match",
                        "m_probability": 2.0,
                        "u_probability": 1.0,
                    }
                    for nn in (4, 3, 2, 1)
                ]
                + [
                    {
                        "sql_condition": "ELSE",
                        "label_for_charts": "else",
                        "m_probability": 0.87,
                        "u_probability": 1.0,
                    }
                ],
            }
        ],
        "blocking_rules_to_generate_predictions": [],
    }
    model = load_model_json(doc)
    built = first_n_tokens_comparison()
    got = model.comparisons[0]
    assert [lv.kind for lv in got.levels] == [lv.kind for lv in built.levels]
    assert [lv.params.get("n") for lv in got.levels[:-1]] == [4, 3, 2, 1]
    assert all(lv.params["col"] == "original_address_concat" for lv in got.levels[:-1])
