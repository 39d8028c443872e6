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
