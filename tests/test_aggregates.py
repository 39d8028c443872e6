"""Per-group exact quantiles and pivoted category counts
(stages/aggregates.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.aggregates import (
    _quantile_cont,
    group_quantiles,
    pivot_counts,
)


def test_quantile_cont_formula():
    v = np.array([1.0, 2.0, 3.0, 4.0])
    assert _quantile_cont(v, 0.5) == 2.5  # interpolated midpoint
    assert _quantile_cont(v, 0.0) == 1.0
    assert _quantile_cont(v, 1.0) == 4.0
    assert _quantile_cont(np.array([7.0]), 0.9) == 7.0


def test_group_quantiles(ray_session):
    rows = [{"g": "a", "v": float(i)} for i in range(101)] + [
        {"g": "b", "v": 10.0},
        {"g": "b", "v": 20.0},
    ]
    out = group_quantiles(
        rd.from_items(rows), group_col="g", value_col="v"
    ).to_pandas().set_index("g")
    assert out.loc["a", "p50"] == 50.0
    assert out.loc["a", "p90"] == 90.0
    assert out.loc["a", "p99"] == 99.0
    assert out.loc["b", "p50"] == 15.0  # interpolated between the two values


def test_pivot_counts(ray_session):
    rows = (
        [{"u": 1, "c": "x"}] * 3
        + [{"u": 1, "c": "y"}] * 2
        + [{"u": 2, "c": "y"}]
        + [{"u": 2, "c": "z"}]  # unlisted category: ignored
        + [{"u": 3, "c": None}]  # null category: counts nowhere
    )
    out = pivot_counts(
        rd.from_items(rows), group_col="u", category_col="c",
        categories=["x", "y"],
    ).to_pandas().set_index("u").sort_index()
    assert out.loc[1].tolist() == [3, 2]
    assert out.loc[2].tolist() == [0, 1]
    assert out.loc[3].tolist() == [0, 0]
    assert str(out["n_x"].dtype) == "int64"


def test_global_quantile_cont_exact_and_multi_round(ray_session):
    import pandas as pd

    from moj_analytical_services_uk_address_matcher_ray.stages.aggregates import (
        global_quantile_cont,
    )

    rng = np.random.default_rng(3)
    vals = rng.normal(0, 100, 20_001).astype(np.float64)
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    for q in (0.0, 0.25, 0.5, 0.9, 0.99, 1.0):
        want = _quantile_cont(np.sort(vals), q)
        # collect_limit=64 forces several histogram-refinement rounds
        got = global_quantile_cont(ds, "v", q, bins=16, collect_limit=64)
        assert got == want, (q, got, want)


def test_global_quantile_cont_ignores_nan(ray_session):
    import pandas as pd

    from moj_analytical_services_uk_address_matcher_ray.stages.aggregates import (
        global_quantile_cont,
    )

    ds = rd.from_pandas(
        pd.DataFrame({"v": [1.0, np.nan, 2.0, 3.0, np.nan, 4.0]})
    )
    assert global_quantile_cont(ds, "v", 0.5) == 2.5


def test_filter_by_quantile_both_sides(ray_session):
    import pandas as pd

    from moj_analytical_services_uk_address_matcher_ray.stages.aggregates import (
        filter_by_quantile,
    )

    vals = np.arange(101, dtype=np.float64)
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    top = filter_by_quantile(ds, "v", 0.9, keep="ge").to_pandas()["v"]
    assert sorted(top) == list(np.arange(90, 101, dtype=np.float64))
    bot = filter_by_quantile(ds, "v", 0.1, keep="le").to_pandas()["v"]
    assert sorted(bot) == list(np.arange(0, 11, dtype=np.float64))


def test_approx_distinct_kmv_estimate_and_exact_branch(ray_session):
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.stages.aggregates import (
        approx_distinct_kmv,
    )

    rng = np.random.default_rng(42)
    # group "big": 5000 distinct values (estimator branch, k=64);
    # group "small": 17 distinct values repeated (exact branch, m < k)
    big_vals = [f"v{i}" for i in range(5000)]
    small_vals = [f"s{i % 17}" for i in range(400)]
    df = pd.DataFrame(
        {
            "g": ["big"] * 5000 + ["small"] * 400,
            "v": big_vals + small_vals,
        }
    ).sample(frac=1.0, random_state=7)  # shuffle so blocks mix groups
    ds = rd.from_pandas(df).repartition(8)  # force multi-block merge
    out = (
        approx_distinct_kmv(ds, group_col="g", value_col="v", k=64)
        .to_pandas()
        .set_index("g")["n_distinct_est"]
    )
    assert out["small"] == 17  # sketch smaller than k -> exact
    # KMV relative error ~ 1/sqrt(k-2) ~ 12.7%; allow 3 sigma
    assert abs(out["big"] - 5000) / 5000 < 0.38
    # merge correctness: single-block run gives the identical sketch result
    single = (
        approx_distinct_kmv(
            rd.from_pandas(df).repartition(1), group_col="g", value_col="v", k=64
        )
        .to_pandas()
        .set_index("g")["n_distinct_est"]
    )
    assert dict(out) == dict(single)


def test_approx_distinct_kmv_ignores_nulls(ray_session):
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.stages.aggregates import (
        approx_distinct_kmv,
    )

    df = pd.DataFrame({"g": ["a"] * 4, "v": ["x", None, "y", None]})
    out = approx_distinct_kmv(
        rd.from_pandas(df), group_col="g", value_col="v", k=8
    ).to_pandas()
    assert out["n_distinct_est"].tolist() == [2]


def test_approx_quantiles_sample_rank_error_bound(ray_session):
    import numpy as np
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.stages.aggregates import (
        approx_quantiles_sample,
    )

    rng = np.random.default_rng(5)
    n = 4000
    vals = rng.exponential(100, n)
    rows = [
        {"g": "a" if i % 2 == 0 else "b", "id": i, "v": float(vals[i])}
        for i in range(n)
    ]
    out = (
        approx_quantiles_sample(
            rd.from_items(rows),
            group_col="g",
            id_col="id",
            value_col="v",
            qs=(0.25, 0.5, 0.75),
            k=256,
        )
        .to_pandas()
        .set_index(["g", "q"])["quantile_value"]
    )
    assert len(out) == 6
    for g in ("a", "b"):
        gv = np.sort(vals[::2] if g == "a" else vals[1::2])
        for q in (0.25, 0.5, 0.75):
            est = out[(g, q)]
            # rank of the estimate in the TRUE distribution must be within
            # ~4/sqrt(k) of q (bottom-k sampling rank error; generous CI)
            true_rank = np.searchsorted(gv, est) / len(gv)
            assert abs(true_rank - q) < 4 / (256 ** 0.5), (g, q, true_rank)


def test_approx_quantiles_sample_exact_when_group_fits(ray_session):
    import numpy as np
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.stages.aggregates import (
        approx_quantiles_sample,
    )

    # m <= k: the sample IS the group, so the estimate is the exact
    # nearest-rank quantile regardless of hash order
    vals = list(range(100))
    rows = [{"g": "x", "id": i, "v": float(v)} for i, v in enumerate(vals)]
    out = (
        approx_quantiles_sample(
            rd.from_items(rows),
            group_col="g",
            id_col="id",
            value_col="v",
            qs=(0.0, 0.5, 1.0),
            k=256,
        )
        .to_pandas()
        .set_index("q")["quantile_value"]
    )
    assert out[0.0] == 0.0 and out[1.0] == 99.0
    assert out[0.5] == float(int(np.floor(0.5 * 99)))


def test_mode_per_group_ties_and_nulls(ray_session):
    import pyarrow as pa
    import ray

    from moj_analytical_services_uk_address_matcher_ray.stages.aggregates import (
        mode_per_group,
    )

    t = pa.table(
        {
            "g": ["a"] * 5 + ["b"] * 4 + ["c"] * 2,
            # a: x=2, y=2 (tie -> x), z=1;  b: nulls ignored -> q=1, p=2
            # c: single value
            "v": ["y", "x", "y", "x", "z", None, "p", "q", "p", "solo", "solo"],
        }
    )
    out = (
        mode_per_group(
            ray.data.from_arrow(t), group_col="g", value_col="v"
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["g"].tolist() == ["a", "b", "c"]
    assert out["mode_value"].tolist() == ["x", "p", "solo"]
    assert out["mode_count"].tolist() == [2, 2, 2]


def test_group_quantiles_randomized_matches_duckdb(ray_session):
    """Randomized quantile_cont parity incl. single-row groups and skew."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from moj_analytical_services_uk_address_matcher_ray.stages.aggregates import (
        group_quantiles,
    )

    rng = np.random.default_rng(23)
    sizes = {"g0": 1, "g1": 2, "g2": 37, "g3": 400, "g4": 5}
    rows = []
    for g, n in sizes.items():
        vals = rng.normal(0, 100, n)
        rows += [{"g": g, "v": float(v)} for v in vals]
    df = pd.DataFrame(rows)
    got = (
        group_quantiles(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            group_col="g",
            value_col="v",
            quantiles=[0.0, 0.25, 0.5, 0.9, 1.0],
            round_to=None,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        "SELECT g, quantile_cont(v, 0.0) AS q0, quantile_cont(v, 0.25) AS q25, "
        "quantile_cont(v, 0.5) AS q50, quantile_cont(v, 0.9) AS q90, "
        "quantile_cont(v, 1.0) AS q100 FROM t GROUP BY g ORDER BY g"
    ).df()
    qcols = [c for c in got.columns if c != "g"]
    assert len(got) == len(want)
    for rg, rw in zip(
        got[qcols].to_numpy(), want[[c for c in want.columns if c != "g"]].to_numpy()
    ):
        np.testing.assert_allclose(sorted(rg), sorted(rw), rtol=1e-12)


def test_pivot_counts_randomized_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from moj_analytical_services_uk_address_matcher_ray.stages.aggregates import (
        pivot_counts,
    )

    rng = np.random.default_rng(41)
    n = 800
    df = pd.DataFrame(
        {
            "g": [f"g{i}" for i in rng.integers(0, 9, n)],
            "cat": np.array(["red", "green", "blue", "other"])[
                rng.integers(0, 4, n)
            ],
        }
    )
    got = (
        pivot_counts(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            group_col="g",
            category_col="cat",
            categories=["red", "green", "blue"],
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        "SELECT g, CAST(sum(CASE WHEN cat='red' THEN 1 ELSE 0 END) AS BIGINT) AS n_red, "
        "CAST(sum(CASE WHEN cat='green' THEN 1 ELSE 0 END) AS BIGINT) AS n_green, "
        "CAST(sum(CASE WHEN cat='blue' THEN 1 ELSE 0 END) AS BIGINT) AS n_blue "
        "FROM t GROUP BY g ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(
        got[["g", "n_red", "n_green", "n_blue"]].astype({c: "int64" for c in ("n_red", "n_green", "n_blue")}),
        want,
        check_dtype=False,
    )
