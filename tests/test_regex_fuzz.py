"""Hypothesis fuzz: the Arrow-side first-pass regex chain must stay
bit-identical with its DuckDB SQL form on ARBITRARY strings, not just the
sf-data distribution the driver oracle samples (functions/regexes.py
reproduces the reference's cleaning regexes; uk_address_matcher
cleaning_functions semantics)."""

import duckdb
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from moj_analytical_services_uk_address_matcher_ray.functions import regexes as rx
from moj_analytical_services_uk_address_matcher_ray.stages.cleaning import (
    clean_address_string_first_pass,
)

# address-flavored alphabet + adversarial punctuation/unicode
_ALPHABET = st.sampled_from(
    list("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789")
    + list(" ,.-&/()'\"#;:@")
    + ["FLAT ", "APARTMENT ", " AND ", "--", "  ", "1-3", "A1 2BC", "É", "ß"]
)
_strings = st.lists(_ALPHABET, min_size=0, max_size=24).map("".join)


def _sql_first_pass(col: str) -> str:
    expr = col
    for pattern, repl in rx.FIRST_PASS_CHAIN:
        p = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return f"trim({expr})"


@settings(max_examples=150, deadline=None)
@given(st.lists(_strings, min_size=1, max_size=8))
def test_first_pass_chain_matches_duckdb_on_fuzzed_strings(strings):
    t = pa.table({"address_concat": pa.array(strings, pa.string())})
    got = clean_address_string_first_pass(t)["address_concat"].to_pylist()

    con = duckdb.connect()
    con.register("t", pa.table({"s": pa.array(strings, pa.string())}))
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {_sql_first_pass('s')} FROM t"
        ).fetchall()
    ]
    assert got == want


@settings(max_examples=120, deadline=None)
@given(st.lists(_strings, min_size=1, max_size=8))
def test_numeric_token_extraction_matches_duckdb_on_fuzzed_strings(strings):
    """The NUMERIC_TOKEN extraction (token_parsing.py:177-217 semantics)
    must agree with its DuckDB regexp_extract_all form on arbitrary
    strings — digit runs, ranges like 1-3, letter-digit-letter forms."""
    import re

    from moj_analytical_services_uk_address_matcher_ray.stages.cleaning import (
        parse_out_numbers,
    )

    up = [s.upper() for s in strings]
    t = pa.table({"address_concat": pa.array(up, pa.string())})
    out = parse_out_numbers(t)
    got = out["numeric_tokens"].to_pylist()

    con = duckdb.connect()
    con.register("t", pa.table({"s": pa.array(up, pa.string())}))
    pat = rx.NUMERIC_TOKEN.replace("'", "''")
    want = [
        r[0]
        for r in con.execute(
            f"SELECT regexp_extract_all(s, '{pat}') FROM t"
        ).fetchall()
    ]
    assert got == want


@settings(max_examples=80, deadline=None)
@given(st.lists(_strings, min_size=1, max_size=6))
def test_word_tokenizer_matches_duckdb_on_fuzzed_strings(strings):
    """dedup/text-analysis \\w+ tokenization must agree with the oracles'
    RE2 ASCII \\w on non-ASCII text (unicode word chars are NOT words)."""
    from moj_analytical_services_uk_address_matcher_ray.stages.dedup import _WORD

    con = duckdb.connect()
    con.register("t", pa.table({"s": pa.array(strings, pa.string())}))
    want = [
        r[0]
        for r in con.execute(
            "SELECT regexp_extract_all(lower(coalesce(s,'')), '\\w+') FROM t"
        ).fetchall()
    ]
    got = [_WORD.findall((s or "").lower()) for s in strings]
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ABC 12", min_size=0, max_size=12), min_size=1, max_size=8
    )
)
def test_levenshtein_band_matches_duckdb(strings):
    """Banded levenshtein (scoring comparison levels) vs DuckDB's builtin
    on fuzzed short strings, all thresholds 0..3."""
    from moj_analytical_services_uk_address_matcher_ray.stages.scoring import (
        levenshtein_leq,
    )

    pairs = [(a, b) for a in strings for b in strings][:40]
    con = duckdb.connect()
    for a, b in pairs:
        d = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        for k in range(4):
            assert levenshtein_leq(a, b, k) == (d <= k), (a, b, k, d)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.sampled_from(["HOUSE", "A", "B2", "LANE", "END"]),
        min_size=0,
        max_size=7,
    )
)
def test_remove_duplicate_end_tokens_matches_duckdb(tokens):
    """The dup-end-token rule vs its SQL array form on fuzzed token lists
    (1-token tail dup and 2-token tail dup, reference cleaning rule)."""
    import pandas as pd

    from moj_analytical_services_uk_address_matcher_ray.stages.cleaning import (
        remove_duplicate_end_tokens,
    )

    s = " ".join(tokens)
    t = pa.table({"address_concat": pa.array([s], pa.string())})
    got = remove_duplicate_end_tokens(t)["address_concat"].to_pylist()[0]

    con = duckdb.connect()
    want = con.execute(
        """
        WITH t AS (SELECT string_split(?, ' ') AS tk)
        SELECT CASE
            WHEN array_length(tk) >= 2 AND tk[-1] = tk[-2]
                THEN array_to_string(tk[:-2], ' ')
            WHEN array_length(tk) >= 4 AND tk[-4] = tk[-2] AND tk[-3] = tk[-1]
                THEN array_to_string(tk[:-3], ' ')
            ELSE array_to_string(tk, ' ')
        END FROM t
        """,
        [s],
    ).fetchone()[0]
    assert got == want, (s, got, want)


@settings(max_examples=150, deadline=None)
@given(
    st.text(alphabet="ABCDEF", min_size=0, max_size=10),
    st.text(alphabet="ABCDEF", min_size=0, max_size=10),
)
def test_jaro_winkler_matches_duckdb(a, b):
    from moj_analytical_services_uk_address_matcher_ray.stages.accuracy import (
        jaro_winkler_similarity,
    )

    con = duckdb.connect()
    want = con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    got = jaro_winkler_similarity(a, b)
    assert abs(got - want) < 1e-9, (a, b, got, want)
