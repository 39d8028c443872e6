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
