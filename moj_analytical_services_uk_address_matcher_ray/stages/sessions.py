"""Gap-based sessionization — the canonical streaming-window operator:
events of one key belong to the same session while consecutive gaps stay
under a timeout.

Composition (Ray-Data-first): ONE hash-bucketed shuffle on the key, then
each bucket labels ALL of its keys at once with a vectorised sort + diff +
cumulative-sum — no per-group tasks, no Python per row.  Session ids are a
pure function of the data (0-based per key in time order), so reruns and
engines agree — the rule is re-derived in the driver's DuckDB oracle with
lag()/sum() window functions.

Scale note: a key's whole event history must co-locate in one bucket (the
same requirement any per-key window has).  For a key too hot for one
worker, pre-split by coarse time range and stitch the boundary sessions —
not implemented here; hot keys in the test corpora are ~10^3 events.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sessionize(
    ds: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap,
    id_col: str | None = None,
    out_col: str = "session_id",
) -> "ray.data.Dataset":
    """Label every row with a per-key session id: a new session starts at
    the first event of a key and whenever ``ts - previous ts > gap``
    (strictly greater; a gap of exactly ``gap`` stays in-session).

    ``gap`` is a ``pandas.Timedelta``-compatible value for timestamp
    columns or a number for numeric ts columns.  ``id_col`` (optional)
    breaks exact-timestamp ties deterministically.
    """
    from .bucketing import bucketed_group_apply

    sort_cols = [key_col, ts_col] + ([id_col] if id_col else [])

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return df.assign(**{out_col: np.array([], dtype=np.int64)})
        out = df.sort_values(sort_cols, kind="mergesort")
        ts = out[ts_col]
        new_key = out[key_col].ne(out[key_col].shift())
        new_sess = (ts.diff() > gap) | new_key
        # cumulative sessions within each key: global cumsum minus the
        # key's first session number (vectorised, no per-key loop)
        g = new_sess.cumsum()
        first_of_key = g.where(new_key).ffill()
        out[out_col] = (g - first_of_key).astype(np.int64)
        return out

    return bucketed_group_apply(ds, [key_col], per_bucket, batch_format="pandas")


def _ts_int64(s: "pd.Series") -> np.ndarray:
    """Timestamp or numeric series -> int64 (ns for timestamps)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return s.values.astype("datetime64[ns]").astype(np.int64)
    return s.to_numpy().astype(np.int64)


def rolling_window(
    ds: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window,
    sum_col: str = "rolling_sum",
    count_col: str = "rolling_n",
) -> "ray.data.Dataset":
    """Per-row trailing time-range aggregate: for every row, the sum/count
    of the same key's rows with ``ts`` in ``[ts - window, ts]`` — SQL
    ``RANGE BETWEEN <window> PRECEDING AND CURRENT ROW`` semantics, so
    equal-timestamp peers are all included regardless of tie order (the
    result is a pure row function: rerun/engine independent, value-hash
    oracle-able without a tiebreaker column).

    One hash-bucketed shuffle on the key; inside each bucket the window
    bounds for ALL rows of ALL groups come from two global ``searchsorted``
    calls on a composite (group, ts) int64 key, and the sums from one
    prefix-sum diff — no per-group tasks, no per-group Python loop.
    ``value_col`` must be non-null (SQL SUM NULL-skipping is not emulated).

    ``window``: ``pandas.Timedelta``-compatible for timestamp ``ts_col``,
    a number for numeric ``ts_col``.
    """
    from .bucketing import bucketed_group_apply

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            empty_sum_dtype = (
                np.int64
                if pd.api.types.is_integer_dtype(df[value_col].dtype)
                else np.float64
            )
            return df.assign(
                **{
                    sum_col: np.array([], dtype=empty_sum_dtype),
                    count_col: np.array([], dtype=np.int64),
                }
            )
        if df[ts_col].isna().any():
            # A NaT maps to int64-min in _ts_int64 while sort_values places
            # it last, so t0 = ts.min() would wrap every offset — there is
            # no defined trailing window for a null timestamp.  Fail loudly
            # rather than corrupt the whole bucket.
            raise ValueError(
                f"rolling_window: null values in ts column {ts_col!r}; "
                "filter or impute timestamps before windowing"
            )
        out = df.sort_values([key_col, ts_col], kind="mergesort").reset_index(
            drop=True
        )
        ts = _ts_int64(out[ts_col])
        w = (
            pd.Timedelta(window).value
            if pd.api.types.is_datetime64_any_dtype(out[ts_col])
            else int(window)
        )
        gid = pd.factorize(out[key_col], use_na_sentinel=False)[0].astype(
            np.int64
        )
        t0 = ts.min()
        off = ts - t0  # >= 0
        stride = int(off.max()) + w + 2
        if stride > 0 and gid.max() < (2**62) // stride:
            comp = gid * stride + off
            lo = np.searchsorted(comp, gid * stride + np.maximum(off - w, 0))
            hi = np.searchsorted(comp, gid * stride + off, side="right")
        else:  # composite would overflow int64: per-group searchsorted
            lo = np.empty(len(out), dtype=np.int64)
            hi = np.empty(len(out), dtype=np.int64)
            starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
            ends = np.r_[starts[1:], len(out)]
            for s, e in zip(starts, ends):
                seg = off[s:e]
                lo[s:e] = s + np.searchsorted(seg, np.maximum(seg - w, 0))
                hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        vals = out[value_col].to_numpy()
        csum = np.concatenate(([0], np.cumsum(vals)))
        out[sum_col] = csum[hi] - csum[lo]
        if np.issubdtype(vals.dtype, np.integer):
            out[sum_col] = out[sum_col].astype(np.int64)
        out[count_col] = (hi - lo).astype(np.int64)
        return out

    return bucketed_group_apply(ds, [key_col], per_bucket, batch_format="pandas")


def cumulative_aggregate(
    ds: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str | None = None,
    sum_col: str = "cum_sum",
    count_col: str = "cum_n",
) -> "ray.data.Dataset":
    """Running per-key totals in time order (``ROWS UNBOUNDED PRECEDING``):
    cumulative sum of ``value_col`` and 1-based running row number.
    ``id_col`` breaks equal-timestamp ties deterministically — pass one
    whenever (key, ts) can repeat, or the tie order (and thus the running
    values) is engine-defined.  Same single-shuffle bucketed pattern as
    :func:`sessionize`; inside a bucket the running values come from one
    global cumsum minus each key's first-row offset (no per-group loop)."""
    from .bucketing import bucketed_group_apply

    sort_cols = [key_col, ts_col] + ([id_col] if id_col else [])

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            empty_sum_dtype = (
                np.int64
                if pd.api.types.is_integer_dtype(df[value_col].dtype)
                else np.float64
            )
            return df.assign(
                **{
                    sum_col: np.array([], dtype=empty_sum_dtype),
                    count_col: np.array([], dtype=np.int64),
                }
            )
        out = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        vals = out[value_col].to_numpy()
        csum = np.cumsum(vals)
        pos = np.arange(len(out), dtype=np.int64)
        # factorize (not raw adjacent !=) so null keys form ONE partition:
        # NaN != NaN would split every null-key row into its own group, and
        # pandas nullable dtypes raise on elementwise != in flatnonzero.
        codes = pd.factorize(out[key_col], use_na_sentinel=False)[0].astype(
            np.int64
        )
        new_key = np.r_[True, codes[1:] != codes[:-1]]
        # value of csum just BEFORE each key's first row, broadcast forward
        base_idx = np.maximum(np.flatnonzero(new_key) - 1, -1)
        key_no = np.cumsum(new_key) - 1  # 0-based key ordinal per row
        base = np.where(base_idx[key_no] >= 0, csum[base_idx[key_no]], 0)
        first_pos = np.flatnonzero(new_key)[key_no]
        out[sum_col] = csum - base
        if np.issubdtype(vals.dtype, np.integer):
            out[sum_col] = out[sum_col].astype(np.int64)
        out[count_col] = pos - first_pos + 1
        return out

    return bucketed_group_apply(ds, [key_col], per_bucket, batch_format="pandas")


def session_summary(
    ds: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    session_col: str = "session_id",
) -> "ray.data.Dataset":
    """Collapse sessionized events to one row per (key, session): start,
    end, event count.  Same single-shuffle bucketed pattern."""
    from .bucketing import bucketed_group_apply

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return pd.DataFrame(
                {
                    key_col: df[key_col],
                    session_col: df[session_col],
                    "session_start": df[ts_col],
                    "session_end": df[ts_col],
                    "n_events": pd.Series([], dtype=np.int64),
                }
            )
        grp = df.groupby([key_col, session_col], sort=False)[ts_col]
        out = grp.agg(session_start="min", session_end="max", n_events="size")
        return out.reset_index()

    return bucketed_group_apply(ds, [key_col], per_bucket, batch_format="pandas")


def lag_over(
    ds: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    order_col: str = "ts",
    value_col: str = "value",
    id_col: str | None = None,
    offset: int = 1,
    out_col: str = "lag_value",
) -> "ray.data.Dataset":
    """SQL ``LAG(value, offset) OVER (PARTITION BY key ORDER BY order
    [, id])`` — per-key previous value; negative ``offset`` gives LEAD.
    Rows without a predecessor (the first ``offset`` rows of a key) carry
    NULL, exactly the SQL default.

    ONE hash-bucketed shuffle on the key; inside each bucket one global
    mergesort over (key, order, id) and one vectorised shift — rows of a
    shifted-in DIFFERENT key are nulled by comparing the shifted key
    column, so there is no per-group loop.  ``id_col`` breaks equal
    ``order_col`` ties deterministically (required for a value-hash
    oracle when order values repeat)."""
    if offset == 0:
        raise ValueError("lag_over: offset must be non-zero")
    from .bucketing import bucketed_group_apply

    sort_cols = [key_col, order_col] + ([id_col] if id_col else [])

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return df.assign(**{out_col: np.array([], dtype=object)})
        out = df.sort_values(sort_cols, kind="mergesort")
        shifted = out[value_col].shift(offset)
        same_key = out[key_col].eq(out[key_col].shift(offset))
        out[out_col] = shifted.where(same_key)
        return out

    return bucketed_group_apply(ds, [key_col], per_bucket, batch_format="pandas")


def row_number_over(
    ds: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    order_col: str = "ts",
    id_col: str | None = None,
    out_col: str = "row_number",
) -> "ray.data.Dataset":
    """SQL ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY order [, id])``
    (1-based).  Same bucketed shape as :func:`lag_over`: one shuffle on
    the key, one in-bucket mergesort, and the per-key counter from a
    global cumcount minus each key's first position — no per-group loop."""
    from .bucketing import bucketed_group_apply

    sort_cols = [key_col, order_col] + ([id_col] if id_col else [])

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return df.assign(**{out_col: np.array([], dtype=np.int64)})
        out = df.sort_values(sort_cols, kind="mergesort")
        pos = np.arange(len(out), dtype=np.int64)
        new_key = out[key_col].ne(out[key_col].shift()).to_numpy()
        first = pd.Series(np.where(new_key, pos, np.nan)).ffill().to_numpy()
        out[out_col] = pos - first.astype(np.int64) + 1
        return out

    return bucketed_group_apply(ds, [key_col], per_bucket, batch_format="pandas")
