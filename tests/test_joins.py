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


def test_shuffle_join_schema_degenerate_empty_side(ray_session):
    """Ray Data skips map UDFs on 0-row blocks, so a side whose rows are
    all filtered upstream reaches the exchange as schema-degenerate empty
    blocks WITHOUT the prep columns — the sources-mode `fix` swap must
    return the full joined schema, not crash the split task."""
    lt = ray.data.from_arrow(pa.table({"k": [1, 2], "lv": ["a", "b"]}))
    # two blocks; the filter keeps only block 1's row, so block 2 reaches
    # the exchange as a 0-row block with the PRE-map schema (no prep cols)
    rt = ray.data.from_arrow_refs(
        [
            ray.put(pa.table({"k": [1], "rv": [1.5]})),
            ray.put(pa.table({"k": [9], "rv": [2.5]})),
        ]
    ).map_batches(
        lambda t: t.filter(pa.compute.less(t["k"], 5)),
        batch_format="pyarrow",
    )
    out = hash_join(lt, rt, "k", how="left", broadcast=False).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2]
    assert out.loc[out["k"] == 1, "rv"].iloc[0] == 1.5
    assert pd.isna(out.loc[out["k"] == 2, "rv"]).all()


def test_shuffle_join_one_cpu_no_deadlock(tmp_path):
    """Regression: executing `aggregate_side.union(map_side)` in ONE Ray
    Data streaming run deadlocks on a 1-CPU cluster (Ray 2.49: a read
    generator holds the only CPU slot under backpressure while the other
    branch's tasks pend).  The shuffle join therefore exchanges each side
    as its own source; this pins that a full-outer join with an
    aggregate-derived left side completes at num_cpus=1."""
    import os
    import subprocess
    import sys

    code = """
import ray
ray.init(address="local", num_cpus=1, include_dashboard=False)
import ray.data as rd
from ray.data.aggregate import Count
from moj_analytical_services_uk_address_matcher_ray.stages.joins import full_outer_join
left = (rd.from_items([{"k": i % 7, "v": i} for i in range(500)])
          .groupby("k").aggregate(Count(alias_name="n")))
right = rd.from_items([{"rk": i, "name": str(i)} for i in range(3, 12)])
out = full_outer_join(left, right, on="k", right_on="rk").to_pandas()
assert len(out) == 12, len(out)  # 7 left keys (0..6) + 5 right-only (7..11)
print("OK", len(out))
ray.shutdown()
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd()
    env.pop("RAY_ADDRESS", None)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120, env=env, cwd=os.getcwd(),
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "OK" in r.stdout


def test_inner_left_join_randomized_null_keys_match_duckdb(ray_session):
    """Randomized inner/left parity vs DuckDB incl. NULL keys on both
    sides (SQL three-valued equality: NULL keys never match; left rows
    with NULL keys still survive a left join), both routes."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(53)
    n_l, n_r = 300, 200
    lk = rng.integers(0, 40, n_l).astype(float)
    lk[rng.random(n_l) < 0.1] = np.nan
    rk = rng.integers(0, 40, n_r).astype(float)
    rk[rng.random(n_r) < 0.1] = np.nan
    ldf = pd.DataFrame({"lid": np.arange(n_l), "k": pd.array(lk).astype("Int64")})
    rdf = pd.DataFrame(
        {"k": pd.array(rk).astype("Int64"), "rv": np.arange(n_r) * 10}
    )
    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    for how in ("inner", "left"):
        for bcast in (True, False):
            got = (
                hash_join(
                    ray.data.from_arrow(
                        pa.Table.from_pandas(ldf, preserve_index=False)
                    ),
                    ray.data.from_arrow(
                        pa.Table.from_pandas(rdf, preserve_index=False)
                    ),
                    "k",
                    how=how,
                    broadcast=bcast,
                )
                .to_pandas()[["lid", "rv"]]
                .sort_values(["lid", "rv"])
                .reset_index(drop=True)
            )
            kw = "JOIN" if how == "inner" else "LEFT JOIN"
            want = con.sql(
                f"SELECT l.lid, r.rv FROM l {kw} r ON l.k = r.k "
                "ORDER BY lid, rv"
            ).df()
            assert len(got) == len(want), (how, bcast)
            assert (
                got["rv"].fillna(-1).astype(int).tolist()
                == want["rv"].fillna(-1).astype(int).tolist()
            ), (how, bcast)
