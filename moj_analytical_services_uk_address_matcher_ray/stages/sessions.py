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
