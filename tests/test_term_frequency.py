"""TF operators (A1-A8) against hand-computed expectations."""

import pyarrow as pa
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages import term_frequency as TF


def _tok_table(lists):
    return pa.table(
        {"address_without_numbers_tokenised": pa.array(lists, pa.list_(pa.string()))}
    )


def test_compute_token_rel_freq(ray_session):
    ds = rd.from_arrow(_tok_table([["A", "B"], ["A", "C"], ["A"]]))
    tf = TF.compute_token_rel_freq(ds)
    d = {t: (c, r) for t, c, r in zip(tf["token"].to_pylist(), tf["count"].to_pylist(), tf["rel_freq"].to_pylist())}
    assert d["A"] == (3, 3 / 5)
    assert d["B"] == (1, 1 / 5)
    assert d["C"] == (1, 1 / 5)


def test_annotator_and_default():
    ann = TF.TermFrequencyAnnotator({"A": 0.5}, default=5e-5)
    out = ann(_tok_table([["A", "ZZZ"]]))
    arr = out["token_rel_freq_arr"].to_pylist()[0]
    assert arr == [
        {"tok": "A", "rel_freq": 0.5},
        {"tok": "ZZZ", "rel_freq": 5e-5},
    ]


def _arr_table(entries):
    return pa.table({"token_rel_freq_arr": pa.array(entries, pa.list_(TF.TOKEN_STRUCT))})


def test_move_common_end_tokens():
    # LONDON is a common end token; appears last -> moved out and removed
    t = _arr_table(
        [
            [
                {"tok": "1", "rel_freq": 0.1},
                {"tok": "HIGH", "rel_freq": 0.01},
                {"tok": "LONDON", "rel_freq": 0.2},
            ]
        ]
    )
    out = TF.move_common_end_tokens_to_field(t, end_tokens=frozenset({"LONDON"}))
    assert [e["tok"] for e in out["common_end_tokens"].to_pylist()[0]] == ["LONDON"]
    assert [e["tok"] for e in out["token_rel_freq_arr"].to_pylist()[0]] == ["1", "HIGH"]


def test_common_end_token_only_removed_from_last_two_positions():
    # common token NOT near the end stays in the array
    t = _arr_table(
        [
            [
                {"tok": "LONDON", "rel_freq": 0.2},
                {"tok": "HIGH", "rel_freq": 0.01},
                {"tok": "STREET", "rel_freq": 0.05},
                {"tok": "LONDON", "rel_freq": 0.2},
            ]
        ]
    )
    out = TF.move_common_end_tokens_to_field(t, end_tokens=frozenset({"LONDON"}))
    kept = [e["tok"] for e in out["token_rel_freq_arr"].to_pylist()[0]]
    assert kept == ["LONDON", "HIGH", "STREET"]  # only the final one removed


def test_first_unusual_and_fallback():
    t = _arr_table(
        [
            [
                {"tok": "COMMON", "rel_freq": 0.1},
                {"tok": "RARE", "rel_freq": 1e-5},
                {"tok": "RARER", "rel_freq": 1e-8},
            ]
        ]
    )
    t = t.append_column("numeric_token_1", pa.array([None], pa.string()))
    t = TF.first_unusual_token(t)
    assert t["first_unusual_token"].to_pylist()[0]["tok"] == "RARE"
    out = TF.use_first_unusual_token_if_no_numeric_token(t)
    assert out["numeric_token_1"].to_pylist()[0] == "RARE"
    assert [e["tok"] for e in out["token_rel_freq_arr"].to_pylist()[0]] == [
        "COMMON",
        "RARER",
    ]


def test_separate_unusual_tokens_bands_and_order():
    t = _arr_table(
        [
            [
                {"tok": "U2", "rel_freq": 9e-5},
                {"tok": "COMMON", "rel_freq": 0.1},
                {"tok": "U1", "rel_freq": 6e-5},
                {"tok": "V1", "rel_freq": 1e-6},
                {"tok": "X1", "rel_freq": 1e-8},
            ]
        ]
    )
    out = TF.separate_unusual_tokens(t)
    assert out["unusual_tokens_arr"].to_pylist()[0] == ["U1", "U2"]  # ascending rel_freq
    assert out["very_unusual_tokens_arr"].to_pylist()[0] == ["V1"]
    assert out["extremely_unusual_tokens_arr"].to_pylist()[0] == ["X1"]


def test_final_column_order_histogram():
    t = _arr_table(
        [
            [
                {"tok": "A", "rel_freq": 0.1},
                {"tok": "A", "rel_freq": 0.1},
                {"tok": "B", "rel_freq": 0.2},
            ]
        ]
    )
    t = t.append_column(
        "common_end_tokens", pa.array([[]], pa.list_(TF.TOKEN_STRUCT))
    )
    out = TF.final_column_order(t)
    hist = out["token_rel_freq_arr_hist"].to_pylist()[0]
    assert hist == [
        {"tok": "A", "rel_freq": 0.1, "count": 2},
        {"tok": "B", "rel_freq": 0.2, "count": 1},
    ]
