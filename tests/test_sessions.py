"""Gap-based sessionization (stages/sessions.py)."""

import pandas as pd
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.sessions import (
    session_summary,
    sessionize,
)


def _events():
    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: two sessions (gap of 45m between event 2 and 3)
    for i, mins in enumerate([0, 10, 20, 65, 70]):
        rows.append({"event_id": i, "user_id": 1, "ts": base + pd.Timedelta(minutes=mins)})
    # user 2: one session, includes a gap of EXACTLY 30m (stays in-session)
    for i, mins in enumerate([0, 30, 59]):
        rows.append({"event_id": 100 + i, "user_id": 2, "ts": base + pd.Timedelta(minutes=mins)})
    return rd.from_items(rows)


def test_sessionize_gap_rule(ray_session):
    out = sessionize(
        _events(), key_col="user_id", ts_col="ts",
        gap=pd.Timedelta(minutes=30), id_col="event_id",
    ).to_pandas().sort_values("event_id")
    sess = dict(zip(out["event_id"], out["session_id"]))
    assert [sess[i] for i in range(5)] == [0, 0, 0, 1, 1]
    # exact-gap boundary is inclusive: all of user 2 in one session
    assert [sess[100 + i] for i in range(3)] == [0, 0, 0]


def test_session_summary(ray_session):
    labelled = sessionize(
        _events(), key_col="user_id", ts_col="ts",
        gap=pd.Timedelta(minutes=30), id_col="event_id",
    )
    out = session_summary(labelled).to_pandas()
    rows = {
        (int(r.user_id), int(r.session_id)): int(r.n_events)
        for r in out.itertuples()
    }
    assert rows == {(1, 0): 3, (1, 1): 2, (2, 0): 3}
    u1s1 = out[(out["user_id"] == 1) & (out["session_id"] == 1)].iloc[0]
    assert (u1s1["session_end"] - u1s1["session_start"]) == pd.Timedelta(minutes=5)


def test_sessionize_randomized_matches_duckdb(ray_session):
    """Randomized parity vs the SQL sessionization idiom: session_id =
    SUM(CASE WHEN ts - lag(ts) > gap THEN 1 ELSE 0 END) OVER (PARTITION BY
    user ORDER BY ts, id).  Duplicate timestamps included (id tie-break)."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(31)
    n = 600
    base = pd.Timestamp("2024-03-01")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.integers(0, 12, n),
            # coarse grid -> plenty of exact duplicate timestamps per user
            "ts": [base + pd.Timedelta(minutes=int(m)) for m in rng.integers(0, 300, n)],
        }
    )
    got = (
        sessionize(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            key_col="user_id",
            ts_col="ts",
            gap=pd.Timedelta(minutes=20),
            id_col="event_id",
        )
        .to_pandas()[["event_id", "session_id"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.sql(
        "SELECT event_id, CAST(SUM(CASE WHEN diff > INTERVAL 20 MINUTE "
        "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS BIGINT) AS session_id FROM ("
        "  SELECT event_id, user_id, ts, "
        "         ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS diff"
        "  FROM e) ORDER BY event_id"
    ).df()
    assert got["session_id"].astype(int).tolist() == want["session_id"].astype(int).tolist()


def test_lag_over_lead_and_nulls(ray_session):
    import numpy as np

    from moj_analytical_services_uk_address_matcher_ray.stages.sessions import lag_over

    rows = [
        {"id": 1, "k": "a", "t": 10, "v": 1.0},
        {"id": 2, "k": "a", "t": 20, "v": 2.0},
        {"id": 3, "k": "a", "t": 20, "v": 3.0},  # tie on t -> id breaks it
        {"id": 4, "k": "b", "t": 5, "v": 9.0},
    ]
    lag = (
        lag_over(
            rd.from_items(rows), key_col="k", order_col="t",
            value_col="v", id_col="id",
        )
        .to_pandas()
        .set_index("id")["lag_value"]
    )
    assert np.isnan(lag[1]) and lag[2] == 1.0 and lag[3] == 2.0
    assert np.isnan(lag[4])  # first row of its key
    lead = (
        lag_over(
            rd.from_items(rows), key_col="k", order_col="t",
            value_col="v", id_col="id", offset=-1, out_col="lead_value",
        )
        .to_pandas()
        .set_index("id")["lead_value"]
    )
    assert lead[1] == 2.0 and lead[2] == 3.0 and np.isnan(lead[3])
    assert np.isnan(lead[4])


def test_row_number_over_per_key(ray_session):
    from moj_analytical_services_uk_address_matcher_ray.stages.sessions import (
        row_number_over,
    )

    rows = [
        {"id": 1, "k": "a", "t": 10},
        {"id": 2, "k": "a", "t": 5},
        {"id": 3, "k": "a", "t": 5},  # tie -> id order
        {"id": 4, "k": "b", "t": 99},
    ]
    rn = (
        row_number_over(
            rd.from_items(rows), key_col="k", order_col="t", id_col="id",
            out_col="rn",
        )
        .to_pandas()
        .set_index("id")["rn"]
    )
    assert rn.to_dict() == {2: 1, 3: 2, 1: 3, 4: 1}


def test_window_operators_randomized_match_duckdb(ray_session):
    """lag_over + row_number_over vs DuckDB window functions on randomized
    data with HEAVY order-value ties (id tie-break is load-bearing)."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from moj_analytical_services_uk_address_matcher_ray.stages.sessions import (
        lag_over,
        row_number_over,
    )

    rng = np.random.default_rng(61)
    n = 700
    df = pd.DataFrame(
        {
            "id": np.arange(n),
            "k": rng.integers(0, 9, n),
            "t": rng.integers(0, 15, n),  # coarse -> many ties per key
            "v": rng.normal(0, 10, n),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    con = duckdb.connect()
    con.register("e", df)

    rn = (
        row_number_over(ds, key_col="k", order_col="t", id_col="id", out_col="rn")
        .to_pandas()
        .sort_values("id")["rn"]
        .astype(int)
        .tolist()
    )
    want_rn = con.sql(
        "SELECT row_number() OVER (PARTITION BY k ORDER BY t, id) AS rn "
        "FROM e ORDER BY id"
    ).df()["rn"].astype(int).tolist()
    assert rn == want_rn

    lag = (
        lag_over(ds, key_col="k", order_col="t", value_col="v", id_col="id")
        .to_pandas()
        .sort_values("id")["lag_value"]
        .tolist()
    )
    want_lag = con.sql(
        "SELECT lag(v) OVER (PARTITION BY k ORDER BY t, id) AS lv "
        "FROM e ORDER BY id"
    ).df()["lv"].tolist()
    assert len(lag) == len(want_lag)
    for a, b in zip(lag, want_lag):
        assert (pd.isna(a) and pd.isna(b)) or a == b
