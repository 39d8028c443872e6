"""Join-operator tests (SURVEY.md §2.4/§2.7, K5 family).

The inner/left paths are exercised throughout the suite and by the driver
oracles (`join_agg`, `left_join`, `semi_join`, `anti_join`); this file pins
the FULL OUTER path against live DuckDB on randomized inputs, including the
SQL null-key semantics (null keys never match but every row survives).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from moj_analytical_services_uk_address_matcher_ray.stages.joins import (
    full_outer_join,
    hash_join,
)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        df[c] = df[c].map(lambda x: None if pd.isna(x) else str(x))
    return (
        df.sort_values(list(df.columns), na_position="last")
        .reset_index(drop=True)
    )


def test_full_outer_matches_duckdb_randomized(ray_session):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    lk = rng.integers(0, 80, n_l).astype("float64")
    rk = rng.integers(40, 120, n_r).astype("float64")
    lk[rng.choice(n_l, 13, replace=False)] = np.nan  # null left keys
    rk[rng.choice(n_r, 11, replace=False)] = np.nan  # null right keys
    ldf = pd.DataFrame(
        {"k": pd.array(lk).astype("Int64"), "lv": rng.integers(0, 10_000, n_l)}
    )
    rdf = pd.DataFrame(
        {"k": pd.array(rk).astype("Int64"), "rv": rng.integers(0, 10_000, n_r)}
    )
    out = full_outer_join(
        ray.data.from_pandas(ldf), ray.data.from_pandas(rdf), "k"
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    ref = con.sql(
        "SELECT COALESCE(l.k, r.k) AS k, l.lv, r.rv "
        "FROM l FULL OUTER JOIN r ON l.k = r.k"
    ).df()
    pd.testing.assert_frame_equal(_canon(out), _canon(ref))


def test_full_outer_multicol_key_and_suffix(ray_session):
    lt = pa.table(
        {"a": [1, 1, 2], "b": ["x", "y", "x"], "v": [10, 11, 12]}
    )
    rt = pa.table(
        {"a": [1, 2, 3], "b": ["y", "x", "z"], "v": [100, 200, 300]}
    )
    out = full_outer_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt), ("a", "b")
    ).to_pandas()
    ref = duckdb.sql(
        "SELECT COALESCE(l.a, r.a) AS a, COALESCE(l.b, r.b) AS b, "
        "l.v, r.v AS v_r "
        "FROM (VALUES (1,'x',10),(1,'y',11),(2,'x',12)) l(a,b,v) "
        "FULL OUTER JOIN (VALUES (1,'y',100),(2,'x',200),(3,'z',300)) "
        "r(a,b,v) ON l.a = r.a AND l.b = r.b"
    ).df()
    pd.testing.assert_frame_equal(_canon(out), _canon(ref))


def test_full_outer_empty_right(ray_session):
    lt = ray.data.from_arrow(pa.table({"k": [1, 2], "lv": ["a", "b"]}))
    rt = ray.data.from_arrow(pa.table({"k": [9], "rv": [1]})).filter(
        lambda row: False
    )
    out = full_outer_join(lt, rt, "k").to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2]


def test_full_outer_rejects_broadcast(ray_session):
    lt = ray.data.from_arrow(pa.table({"k": [1]}))
    rt = ray.data.from_arrow(pa.table({"k": [1]}))
    with pytest.raises(ValueError):
        hash_join(lt, rt, "k", how="full", broadcast=True)
