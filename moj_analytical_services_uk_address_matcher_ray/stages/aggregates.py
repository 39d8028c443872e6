"""Aggregate breadth operators: exact per-group quantiles and pivoted
category counts.

Both follow the pre-aggregate-then-small-shuffle discipline: per-batch
partials shrink the exchange to O(groups) rows before any wide operation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _quantile_cont(sorted_vals: np.ndarray, q: float) -> float:
    """SQL ``quantile_cont``: linear interpolation at position q*(n-1) of
    the sorted values — the exact formula DuckDB/Postgres use, so results
    hash-match an ANSI oracle."""
    n = len(sorted_vals)
    if n == 0:
        return float("nan")
    pos = q * (n - 1)
    lo = int(np.floor(pos))
    hi = int(np.ceil(pos))
    frac = pos - lo
    a, b = float(sorted_vals[lo]), float(sorted_vals[hi])
    return a + (b - a) * frac


def group_quantiles(
    ds: "ray.data.Dataset",
    *,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    round_to: int | None = 6,
) -> "ray.data.Dataset":
    """EXACT continuous quantiles per group (one row per group, one column
    ``p<q>`` per requested quantile).

    Exact quantiles need every group value in one place, so this is ONE
    bucketed shuffle of the narrow (group, value) projection; per bucket,
    one vectorised sort labels every group at once and each group's
    quantiles are O(#quantiles) index reads.  For corpora where even the
    narrow column exceeds a worker, switch to a sketch (t-digest) — exact
    is the right default at the scale a per-GROUP quantile table implies
    (output rows = groups, so groups are few).
    ``round_to`` rounds outputs so the value-hash is stable across
    summation orders (set None for raw floats).
    """
    from .bucketing import bucketed_group_apply

    narrow = ds.select_columns([group_col, value_col])
    cols = [f"p{int(round(q * 100))}" for q in quantiles]

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return pd.DataFrame(
                {group_col: df[group_col], **{c: pd.Series([], dtype=float) for c in cols}}
            )
        out_rows = []
        df = df.sort_values([group_col, value_col], kind="mergesort")
        for k, g in df.groupby(group_col, sort=False):
            vals = g[value_col].to_numpy()
            row = {group_col: k}
            for q, c in zip(quantiles, cols):
                v = _quantile_cont(vals, q)
                row[c] = round(v, round_to) if round_to is not None else v
            out_rows.append(row)
        return pd.DataFrame(out_rows)

    return bucketed_group_apply(narrow, [group_col], per_bucket, batch_format="pandas")


def pivot_counts(
    ds: "ray.data.Dataset",
    *,
    group_col: str,
    category_col: str,
    categories: list[str],
    prefix: str = "n_",
) -> "ray.data.Dataset":
    """Pivot a category column into per-group count columns (one row per
    group, ``<prefix><category>`` columns).

    Scale shape: each batch collapses to at most |groups-in-batch| partial
    rows via vectorised indicator sums BEFORE the exchange, then one small
    ``groupby().sum`` over the partials — the combiner pattern, so the
    shuffle carries O(groups × batches) narrow rows, never the input.
    Unlisted categories are ignored (pass every expected value explicitly —
    the output schema must be static for a streaming pipeline).
    """
    out_cols = [f"{prefix}{c}" for c in categories]

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: t[group_col].to_pandas()})
        cat = t[category_col]
        for c, oc in zip(categories, out_cols):
            eq = pc.coalesce(pc.equal(cat, c), pa.scalar(False))
            df[oc] = (
                eq.combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        agg = df.groupby(group_col, sort=False, as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    agg = partials.groupby(group_col).aggregate(
        *[Sum(oc, alias_name=oc) for oc in out_cols]
    )
    return agg


def distinct_per_group(
    ds: "ray.data.Dataset",
    *,
    group_col: str,
    value_col: str,
    out_col: str = "n_distinct",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """EXACT ``COUNT(DISTINCT value)`` per group without ever shuffling raw
    rows — the classic two-level distinct-aggregate:

    1. per-BATCH dedup of ``(group, value)`` pairs (one Arrow hash-groupby;
       on web-scale event streams this is the big combiner — a batch with
       1M rows over 10k live pairs emits 10k);
    2. ONE shuffle bucketed on ``hash(group, value)`` — equal pairs
       co-locate, so a per-bucket dedup is globally exact, and each bucket
       collapses to per-group partial counts (rows out = groups x buckets
       at most);
    3. a tiny ``groupby(group).sum`` over the partials.

    For cardinalities where even the distinct pair set is too wide, switch
    to a sketch (HLL); exact is the right default whenever the answer
    itself (distinct values) fits a shuffle — the usual case for
    per-entity distinct counts.
    """
    from ray.data.aggregate import Sum

    from .bucketing import bucketed_group_apply

    def local_dedup(t: pa.Table) -> pa.Table:
        return t.select([group_col, value_col]).group_by(
            [group_col, value_col]
        ).aggregate([])

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], g.schema.field(group_col).type),
                    "__part": pa.array([], pa.int64()),
                }
            )
        dedup = g.group_by([group_col, value_col]).aggregate([])
        cnt = dedup.group_by([group_col]).aggregate([(value_col, "count")])
        return pa.table(
            {
                group_col: cnt[group_col],
                "__part": cnt[f"{value_col}_count"].cast(pa.int64()),
            }
        )

    partials = bucketed_group_apply(
        ds.map_batches(local_dedup, batch_format="pyarrow"),
        [group_col, value_col],
        per_bucket,
        n_buckets=n_buckets,
    )
    agg = partials.groupby(group_col).aggregate(Sum("__part", alias_name=out_col))
    return agg.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index(out_col),
            out_col,
            t[out_col].cast(pa.int64()),
        ),
        batch_format="pyarrow",
    )
