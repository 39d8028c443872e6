"""Cleaning-stage golden tests, ported from the reference's own cases
(/root/reference/tests/cleaning/test_cleaning_steps.py:16-127) plus regex
chain behaviours verified against DuckDB semantics."""

import pyarrow as pa

from moj_analytical_services_uk_address_matcher_ray.stages import cleaning as C


def _table(addresses, postcodes=None):
    data = {"address_concat": pa.array(addresses, pa.string())}
    if postcodes is not None:
        data["postcode"] = pa.array(postcodes, pa.string())
    return pa.table(data)


def test_parse_out_flat_positional():
    # (address, expected flat_positional, expected flat_letter) — reference
    # test_cleaning_steps.py:16-88 verbatim
    cases = [
        ("11A SPITFIRE COURT 243 BIRMINGHAM", None, "A"),
        ("FLAT A 11 SPITFIRE COURT 243 BIRMINGHAM", None, "A"),
        ("BASEMENT FLAT A 11 SPITFIRE COURT 243 BIRMINGHAM", "BASEMENT", "A"),
        ("BASEMENT FLAT 11 SPITFIRE COURT 243 BIRMINGHAM", "BASEMENT", None),
        ("GARDEN FLAT 11 SPITFIRE COURT 243 BIRMINGHAM", "GARDEN", None),
        ("TOP FLOOR FLAT 12A HIGH STREET", "TOP FLOOR", "A"),
        ("GROUND FLOOR FLAT B 25 MAIN ROAD", "GROUND FLOOR", "B"),
        ("FIRST FLOOR 15B LONDON ROAD", "FIRST FLOOR", "B"),
        ("UNIT C MY HOUSE 120 MY ROAD", None, "C"),
    ]
    out = C.parse_out_flat_position_and_letter(_table([c[0] for c in cases]))
    for (addr, exp_pos, exp_letter), pos, letter in zip(
        cases, out["flat_positional"].to_pylist(), out["flat_letter"].to_pylist()
    ):
        assert pos == exp_pos, addr
        assert letter == exp_letter, addr


def test_remove_duplicate_end_tokens():
    cases = [
        ("9A SOUTHVIEW ROAD SOUTHWICK LONDON LONDON", "9A SOUTHVIEW ROAD SOUTHWICK LONDON"),
        ("1 HIGH STREET ST ALBANS ST ALBANS", "1 HIGH STREET ST ALBANS"),
        (
            "2 CORINATION ROAD KINGS LANGLEY HERTFORDSHIRE HERTFORDSHIRE",
            "2 CORINATION ROAD KINGS LANGLEY HERTFORDSHIRE",
        ),
        (
            "FLAT 2 8 ORCHARD WAY MILTON KEYNES MILTON KEYNES",
            "FLAT 2 8 ORCHARD WAY MILTON KEYNES",
        ),
        ("9 SOUTHVIEW ROAD SOUTHWICK LONDON", "9 SOUTHVIEW ROAD SOUTHWICK LONDON"),
        ("1 LONDON ROAD LONDON", "1 LONDON ROAD LONDON"),
    ]
    out = C.remove_duplicate_end_tokens(_table([c[0] for c in cases]))
    assert out["address_concat"].to_pylist() == [c[1] for c in cases]


def test_first_pass_regex_chain():
    cases = [
        ("C230 HIGH STREET", "C 230 HIGH STREET"),  # separate_letter_num
        ("123-A MAIN ROAD", "123A MAIN ROAD"),  # standarise_num_letter
        ("FOO, BAR. BAZ", "FOO BAR BAZ"),  # commas/periods + collapse
        ("O'NEILL HOUSE", "ONEILL HOUSE"),  # apostrophes
        ("UNIT 5/6 DEPOT", "UNIT 5-6 DEPOT"),  # slash -> dash
        ("FLAT 2B   TOWER HOUSE", "FLAT 2B TOWER HOUSE"),  # move_flat whitespace
    ]
    out = C.clean_address_string_first_pass(_table([c[0] for c in cases]))
    assert out["address_concat"].to_pylist() == [c[1] for c in cases]


def test_canonicalise_postcode():
    cases = [("AL11AA", "AL1 1AA"), ("W1G 9SU", "W1G 9SU"), ("GIR0AA", "GIR 0AA"), ("NOTAPC", "NOTAPC")]
    out = C.canonicalise_postcode(_table(["X"] * len(cases), [c[0] for c in cases]))
    assert out["postcode"].to_pylist() == [c[1] for c in cases]


def test_parse_out_numbers_and_split():
    t = _table(["FLAT 2A 15 WIMPOLE STREET 10-12 ANNEX"])
    t = C.parse_out_flat_position_and_letter(t)
    t = C.parse_out_numbers(t)
    nums = t["numeric_tokens"].to_pylist()[0]
    assert nums == ["2A", "15", "10-12"]
    t = C.split_numeric_tokens_to_cols(t)
    assert t["numeric_token_1"].to_pylist() == ["2"]
    assert t["numeric_token_2"].to_pylist() == ["15"]
    assert t["numeric_token_3"].to_pylist() == ["10"]


def test_numeric_first_token_skipped_when_flat_letter_numeric():
    # flat_letter '3' (numeric) -> first numeric token dropped
    t = pa.table(
        {
            "address_concat": pa.array(["3 7 HIGH STREET"], pa.string()),
            "flat_letter": pa.array(["3"], pa.string()),
        }
    )
    t = C.parse_out_numbers(t)
    assert t["numeric_tokens"].to_pylist()[0] == ["7"]


def test_ukam_id_unique_for_duplicate_rows():
    t = pa.table(
        {
            "unique_id": pa.array(["a", "a", "b"], pa.string()),
            "address_concat": pa.array(["X", "X", "Y"], pa.string()),
            "postcode": pa.array(["P", "P", "Q"], pa.string()),
        }
    )
    out = C.assign_ukam_address_id(t)
    ids = out["ukam_address_id"].to_pylist()
    assert len(set(ids)) == 3  # duplicates disambiguated
    # deterministic: same batch -> same ids
    again = C.assign_ukam_address_id(t)["ukam_address_id"].to_pylist()
    assert ids == again


def test_sha256_invariant():
    t = pa.table({"content": pa.array(["hello\nworld", None], pa.string())})
    out = C.add_sha256(t)
    import hashlib

    assert out["content_sha256"].to_pylist()[0] == hashlib.sha256(
        b"hello\nworld"
    ).hexdigest()
    assert out["content_sha256"].to_pylist()[1] is None


def test_generalised_token_aliases():
    t = pa.table(
        {
            "distinguishing_adj_start_tokens": pa.array(
                [["FIRST", "GARDEN", "BASEMENT", "OTHER"]], pa.list_(pa.string())
            )
        }
    )
    out = C.generalised_token_aliases(t)
    assert out["distinguishing_adj_token_aliases"].to_pylist()[0] == [
        "UPPERFLOOR",
        "LEVEL",
        "GROUNDFLOOR",
        "LEVEL",
        "LEVEL",
        "OTHER",
    ]
