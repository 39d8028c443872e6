"""As-of join (stages/joins.py:asof_join): backward/forward, inner/left,
tolerance, exact-tie determinism, hot-key skew."""

import pandas as pd
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.joins import asof_join


def _sides():
    left = rd.from_items(
        [
            {"lid": 1, "k": "a", "t": 10},
            {"lid": 2, "k": "a", "t": 25},
            {"lid": 3, "k": "b", "t": 7},
            {"lid": 4, "k": "c", "t": 5},  # no right rows for c
        ]
    )
    right = rd.from_items(
        [
            {"rid": 100, "k": "a", "t": 8, "v": 1.0},
            {"rid": 101, "k": "a", "t": 20, "v": 2.0},
            {"rid": 102, "k": "a", "t": 30, "v": 3.0},
            {"rid": 103, "k": "b", "t": 7, "v": 4.0},  # exact tie with lid 3
        ]
    )
    return left, right


def test_asof_backward_inner(ray_session):
    left, right = _sides()
    out = asof_join(
        left, right, on="t", by="k", right_cols=["rid", "v"], how="inner"
    ).to_pandas().sort_values("lid")
    got = {int(r.lid): (int(r.rid_r), r.v_r) for r in out.itertuples()}
    assert got == {1: (100, 1.0), 2: (101, 2.0), 3: (103, 4.0)}  # tie inclusive
    assert out["rid_r"].dtype == "int64"  # exact right dtype preserved


def test_asof_backward_left(ray_session):
    left, right = _sides()
    out = asof_join(
        left, right, on="t", by="k", right_cols=["rid"], how="left"
    ).to_pandas()
    assert len(out) == 4
    unmatched = out[out["lid"] == 4]
    assert unmatched["rid_r"].isna().all()


def test_asof_forward(ray_session):
    left, right = _sides()
    out = asof_join(
        left, right, on="t", by="k", right_cols=["rid"],
        direction="forward", how="inner",
    ).to_pandas()
    got = {int(r.lid): int(r.rid_r) for r in out.itertuples()}
    assert got == {1: (101), 2: (102), 3: (103)}


def test_asof_tolerance(ray_session):
    left, right = _sides()
    out = asof_join(
        left, right, on="t", by="k", right_cols=["rid"],
        how="inner", tolerance=3,
    ).to_pandas()
    # lid1 t=10 vs rid100 t=8 (gap 2, ok); lid2 t=25 vs t=20 (gap 5, out)
    got = {int(r.lid): int(r.rid_r) for r in out.itertuples()}
    assert got == {1: 100, 3: 103}


def test_asof_hot_key_and_determinism(ray_session):
    # one hot key with many rows both sides; rerun-identical output
    left = rd.from_items([{"lid": i, "k": "h", "t": i * 10} for i in range(200)])
    right = rd.from_items(
        [{"rid": i, "k": "h", "t": i * 10 + 5, "v": float(i)} for i in range(200)]
    )
    a = (
        asof_join(left, right, on="t", by="k", right_cols=["rid"], how="inner")
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # left t=i*10 matches right t=(i-1)*10+5 -> rid i-1; lid 0 unmatched
    assert len(a) == 199
    assert (a["rid_r"] == a["lid"] - 1).all()
    b = (
        asof_join(left, right, on="t", by="k", right_cols=["rid"], how="inner")
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_range_join_basic(ray_session):
    from moj_analytical_services_uk_address_matcher_ray.stages.joins import range_join

    left = rd.from_items(
        [
            {"lid": 1, "k": "a", "lo": 5, "hi": 15},
            {"lid": 2, "k": "a", "lo": 100, "hi": 110},  # no matches
            {"lid": 3, "k": "b", "lo": 0, "hi": 50},
        ]
    )
    right = rd.from_items(
        [
            {"rid": 10, "k": "a", "t": 5, "v": 1.0},   # inclusive lower bound
            {"rid": 11, "k": "a", "t": 15, "v": 2.0},  # inclusive upper bound
            {"rid": 12, "k": "a", "t": 16, "v": 3.0},  # out
            {"rid": 13, "k": "b", "t": 25, "v": 4.0},
            {"rid": 14, "k": "c", "t": 25, "v": 5.0},  # wrong key
        ]
    )
    out = range_join(
        left, right, by="k", left_lo="lo", left_hi="hi",
        right_val="t", right_cols=["rid", "v"],
    ).to_pandas()
    pairs = sorted(zip(out["lid"], out["rid_r"]))
    assert pairs == [(1, 10), (1, 11), (3, 13)]
    assert out["rid_r"].dtype == "int64"


def test_range_join_one_to_many_fanout(ray_session):
    from moj_analytical_services_uk_address_matcher_ray.stages.joins import range_join

    left = rd.from_items([{"lid": 1, "k": "h", "lo": 0, "hi": 99}])
    right = rd.from_items(
        [{"rid": i, "k": "h", "t": i} for i in range(200)]
    )
    out = range_join(
        left, right, by="k", left_lo="lo", left_hi="hi",
        right_val="t", right_cols=["rid"],
    ).to_pandas()
    assert sorted(out["rid_r"]) == list(range(100))


def test_asof_randomized_matches_duckdb(ray_session):
    """Randomized DuckDB ASOF-JOIN parity: backward/forward x inner/left on
    data with duplicate timestamps, missing keys and one hot key."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(11)
    n_l, n_r = 400, 300
    keys = np.array(["a", "b", "c", "d", "hot"])
    lk = keys[rng.integers(0, 5, n_l)]
    # hot key: half the right rows
    rk = np.concatenate(
        [keys[rng.integers(0, 4, n_r // 2)], np.array(["hot"] * (n_r - n_r // 2))]
    )
    ldf = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "k": lk,
            "t": rng.integers(0, 100, n_l),
        }
    )
    rdf = pd.DataFrame(
        {
            "k": rk,
            "t": rng.integers(0, 100, n_r),
            "v": rng.integers(0, 1000, n_r).astype(float),
        }
    )
    # drop duplicate (k, t) on the right: at equal timestamps DuckDB ASOF
    # picks an arbitrary row while ours picks the deterministic value-tuple
    # winner — dedupe to make the expected winner unique
    rdf = rdf.drop_duplicates(["k", "t"]).reset_index(drop=True)

    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    for direction, op in (("backward", ">="), ("forward", "<=")):
        for how in ("inner", "left"):
            got = (
                asof_join(
                    rd.from_arrow(pa.Table.from_pandas(ldf, preserve_index=False)),
                    rd.from_arrow(pa.Table.from_pandas(rdf, preserve_index=False)),
                    on="t",
                    by="k",
                    right_cols=["v"],
                    direction=direction,
                    how=how,
                )
                .to_pandas()[["lid", "v_r"]]
                .sort_values("lid")
                .reset_index(drop=True)
            )
            join_kw = "ASOF JOIN" if how == "inner" else "ASOF LEFT JOIN"
            want = con.sql(
                f"SELECT l.lid, r.v AS v_r FROM l {join_kw} r "
                f"ON l.k = r.k AND l.t {op} r.t ORDER BY lid"
            ).df()
            got["v_r"] = got["v_r"].astype(float)
            want["v_r"] = want["v_r"].astype(float)
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False,
            ), (direction, how)
