"""Vectorised blocking-key expressions vs DuckDB's own list_extract /
split_part semantics on randomized data (the reference's blocking-rule
dialect is DuckDB SQL, so DuckDB IS the oracle here)."""

import duckdb
import numpy as np
import pyarrow as pa

from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
    KeyExpr,
    _list_element,
    derive_block_keys,
    parse_blocking_rule,
)


def _rand_table(rng, n):
    toks = []
    pcs = []
    for _ in range(n):
        r = rng.random()
        if r < 0.15:
            toks.append(None)
        else:
            k = int(rng.integers(0, 4))
            toks.append([f"T{int(rng.integers(0, 9))}" for _ in range(k)])
        r = rng.random()
        if r < 0.15:
            pcs.append(None)
        elif r < 0.25:
            pcs.append("")
        else:
            pcs.append(
                " ".join(
                    f"P{int(rng.integers(0, 9))}"
                    for _ in range(int(rng.integers(1, 4)))
                )
            )
    return pa.table(
        {
            "unusual_tokens_arr": pa.array(toks, pa.list_(pa.string())),
            "postcode": pa.array(pcs, pa.string()),
        }
    )


def test_list_extract_and_split_part_match_duckdb():
    rng = np.random.default_rng(99)
    t = _rand_table(rng, 300)
    con = duckdb.connect()
    con.register("t", t)
    for idx in (1, 2, 3, 5):
        got = KeyExpr("unusual_tokens_arr", "list_extract", idx).evaluate(t)
        want = con.sql(
            f"SELECT list_extract(unusual_tokens_arr, {idx}) FROM t"
        ).fetchall()
        assert got.to_pylist() == [w[0] for w in want], f"list_extract {idx}"
        got = KeyExpr("postcode", "split_part", idx).evaluate(t).to_pylist()
        want = [
            w[0]
            for w in con.sql(
                f"SELECT split_part(postcode, ' ', {idx}) FROM t"
            ).fetchall()
        ]
        pcs = t["postcode"].to_pylist()
        for g, w, v in zip(got, want, pcs):
            if v is None:
                # deliberate deviation from DuckDB 1.0.0 (which folds NULL
                # to ''): blocking keys NULL-propagate so null inputs never
                # join the '' block — a '' key over every null row would be
                # a skew hazard at scale, and newer DuckDB NULL-propagates
                # here too
                assert g is None
            else:
                assert g == w, f"split_part {idx}: {v!r} -> {g!r} != {w!r}"


def test_list_element_sliced_and_nested_nulls():
    a = pa.array([["a", "b"], ["c"], None, ["d", "e", "f"], []])
    s = a.slice(1, 3)
    assert _list_element(s, 0).to_pylist() == ["c", None, "d"]
    assert _list_element(s, 1).to_pylist() == [None, None, "e"]
    b = pa.array([["x", None], ["y"]])
    assert _list_element(b, 1).to_pylist() == [None, None]


def test_derive_block_keys_empty_and_all_null_batch():
    rule = parse_blocking_rule(
        "l.numeric_token_1 = r.numeric_token_1 and "
        "split_part(l.postcode, ' ', 1) = split_part(r.postcode, ' ', 1)"
    )
    t = pa.table(
        {
            "ukam_address_id": pa.array(["a", "b"]),
            "numeric_token_1": pa.array([None, None], pa.string()),
            "postcode": pa.array(["AB1 2CD", None], pa.string()),
        }
    )
    out = derive_block_keys(t, [rule], side="l", carry_cols=["ukam_address_id"])
    assert out.num_rows == 0  # any-null conjunct -> no key emitted
    empty = t.slice(0, 0)
    out = derive_block_keys(
        empty, [rule], side="l", carry_cols=["ukam_address_id"]
    )
    assert out.num_rows == 0
    assert set(out.column_names) == {
        "ukam_address_id",
        "rule_idx",
        "block_key",
        "side",
    }
