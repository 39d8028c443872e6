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
        return pa.Table.from_pandas(
            agg, preserve_index=False
        ).replace_schema_metadata(None)

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


def approx_distinct_kmv(
    ds: "ray.data.Dataset",
    *,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "",
    out_col: str = "n_distinct_est",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Approximate ``COUNT(DISTINCT value)`` per group with a KMV
    (k-minimum-values) sketch — the scale path where even the distinct
    ``(group, value)`` pair set of :func:`distinct_per_group` is too wide
    to shuffle.  Relative error ~ 1/sqrt(k-2) (Bar-Yossef et al. 2002).

    The sketch is mergeable, so the plan is the textbook combiner shape:

    1. per-batch partial — dedupe the batch's ``(group, value)`` pairs,
       hash each distinct value to a 32-bit md5 prefix (the engine-wide
       ``md5(v || ':' || salt)`` convention of ``stages/sampling.py``, so
       the driver oracle reproduces it bit-for-bit in DuckDB), and keep
       only each group's ``k`` SMALLEST distinct hashes.  The exchange is
       thus <= k rows per group per block regardless of input width;
    2. ONE shuffle bucketed on the group co-locates each group's partials;
       the per-bucket merge re-sorts, dedupes, and reads the estimate off
       the k-th smallest hash.

    Estimator (integer-exact, engine-independent): with ``m`` distinct
    hashes in the merged sketch, ``est = m`` when ``m < k`` (the sketch IS
    the distinct hash set — exact up to 32-bit collisions), else
    ``floor((k-1) * 2^32 / h_k)`` where ``h_k`` is the k-th smallest hash
    (the classic (k-1)/U(k) with the division kept integral so the value
    hash-matches an ANSI oracle).  NULL values are ignored, like SQL
    ``COUNT(DISTINCT)``.
    """
    import hashlib

    from .bucketing import bucketed_group_apply

    if k < 2:
        raise ValueError("approx_distinct_kmv: k must be >= 2")

    def _sketch(g: pa.Table, *, estimate: bool) -> pa.Table:
        """Keep the k smallest distinct hashes per group; optionally read
        the estimate off the sketch (merge step only)."""
        gtype = g.schema.field(group_col).type

        def _empty() -> pa.Table:
            cols = {group_col: pa.array([], gtype)}
            if estimate:
                cols[out_col] = pa.array([], pa.int64())
            else:
                cols["__kmv_hash"] = pa.array([], pa.int64())
            return pa.table(cols)

        if g.num_rows == 0:
            return _empty()
        if "__kmv_hash" in g.schema.names:  # merge step: already hashed
            keys = np.asarray(g[group_col].to_pylist(), dtype=object)
            hashes = np.asarray(g["__kmv_hash"].to_pylist(), dtype=np.int64)
        else:  # partial step: dedupe pairs, hash distinct values
            sub = (
                g.select([group_col, value_col])
                .filter(pc.is_valid(g[value_col]))
                .group_by([group_col, value_col])
                .aggregate([])
            )
            keys = np.asarray(sub[group_col].to_pylist(), dtype=object)
            hashes = np.fromiter(
                (
                    int(hashlib.md5(f"{v}:{salt}".encode()).hexdigest()[:8], 16)
                    for v in sub[value_col].to_pylist()
                ),
                dtype=np.int64,
                count=sub.num_rows,
            )
        if len(keys) == 0:  # e.g. an all-null value batch
            return _empty()
        order = np.lexsort((hashes, keys))
        keys, hashes = keys[order], hashes[order]
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        new_hash = np.r_[True, (hashes[1:] != hashes[:-1])]
        keep = new_key | new_hash  # distinct (group, hash)
        keys, hashes, new_key = keys[keep], hashes[keep], new_key[keep]
        # rank within group (0-based) via global position minus group start
        pos = np.arange(len(keys))
        first_pos = pos[new_key][np.cumsum(new_key) - 1]
        rank = pos - first_pos
        take = rank < k
        keys, hashes, rank = keys[take], hashes[take], rank[take]
        if not estimate:
            return pa.table(
                {
                    group_col: pa.array(keys.tolist(), gtype),
                    "__kmv_hash": pa.array(hashes, pa.int64()),
                }
            )
        last = np.r_[(rank[1:] == 0), True]  # last kept row of each group
        m = rank[last] + 1  # sketch sizes
        h_k = np.maximum(hashes[last], 1)
        est = np.where(m < k, m.astype(np.int64), (k - 1) * (1 << 32) // h_k)
        return pa.table(
            {
                group_col: pa.array(keys[last].tolist(), gtype),
                out_col: pa.array(est, pa.int64()),
            }
        )

    partials = ds.map_batches(
        lambda t: _sketch(t, estimate=False), batch_format="pyarrow"
    )
    return bucketed_group_apply(
        partials,
        [group_col],
        lambda g: _sketch(g, estimate=True),
        n_buckets=n_buckets,
    )


def global_quantile_cont(
    ds: "ray.data.Dataset",
    col: str,
    q: float,
    *,
    bins: int = 1024,
    collect_limit: int = 65536,
    max_rounds: int = 12,
) -> float:
    """EXACT global ``quantile_cont`` of one column by distributed selection
    — no global sort, no driver materialisation.

    The driver never sees data, only O(bins) counters: each round is one
    streaming pass over the narrow column computing, for the current
    candidate interval [a, b], ``count(x < a)`` and a ``bins``-bucket
    histogram of [a, b]; the interval then shrinks to the bucket span
    containing the two order statistics the quantile interpolates between
    (ranks floor(q*(n-1)) and ceil(q*(n-1))).  When the in-interval count
    drops under ``collect_limit`` the remaining values are collected and
    the exact order statistics read off; the interpolation is the
    ``quantile_cont`` formula (`_quantile_cont`), bit-matching the SQL
    engines.  Worst case ~log_bins(n) + 1 passes (3 passes for 10^12 rows
    at bins=1024); each pass is a zero-shuffle ``map_batches`` partial +
    tiny driver reduce.

    NaNs and nulls are ignored (SQL aggregate semantics).
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    narrow = ds.select_columns([col]).materialize()

    def stats(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        if len(x) == 0:
            return pa.table({"n": [0], "lo": [np.inf], "hi": [-np.inf]})
        return pa.table(
            {"n": [len(x)], "lo": [float(x.min())], "hi": [float(x.max())]}
        )

    n, lo, hi = 0, np.inf, -np.inf
    for r in narrow.map_batches(stats, batch_format="pyarrow").take_all():
        n += r["n"]
        lo = min(lo, r["lo"])
        hi = max(hi, r["hi"])
    if n == 0:
        return float("nan")
    pos = q * (n - 1)
    k1, k2 = int(np.floor(pos)), int(np.ceil(pos))
    frac = pos - k1

    a, b = lo, hi
    for _ in range(max_rounds):
        # one pass: count(x < a) exactly + histogram of [a, b]
        def hist(t: pa.Table, a=a, b=b) -> pa.Table:
            x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            x = x[~np.isnan(x)]
            below = int((x < a).sum())
            inr = x[(x >= a) & (x <= b)]
            if b > a:
                idx = np.clip(
                    ((inr - a) * (bins / (b - a))).astype(np.int64), 0, bins - 1
                )
                h = np.bincount(idx, minlength=bins)
            else:
                h = np.zeros(bins, np.int64)
                h[0] = len(inr)
            return pa.table({"below": [below], "h": [h.tolist()]})

        below_tot = 0
        h_tot = np.zeros(bins, np.int64)
        for r in narrow.map_batches(hist, batch_format="pyarrow").take_all():
            below_tot += r["below"]
            h_tot += np.asarray(r["h"], np.int64)
        cum = below_tot + np.cumsum(h_tot)
        i1 = int(np.searchsorted(cum, k1 + 1))
        i2 = int(np.searchsorted(cum, k2 + 1))
        in_range = int(h_tot[i1 : i2 + 1].sum())
        w = (b - a) / bins if b > a else 0.0
        new_a = np.nextafter(a + i1 * w, -np.inf)
        new_b = np.nextafter(a + (i2 + 1) * w, np.inf)
        if in_range <= collect_limit or w == 0.0 or (new_a <= a and new_b >= b):
            a, b = max(a, new_a), min(b, new_b)
            break
        a, b = new_a, new_b

    # exact rank-below count for the final interval + collect its values
    def final(t: pa.Table, a=a, b=b) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        below = int((x < a).sum())
        inr = x[(x >= a) & (x <= b)]
        return pa.table({"below": [below], "v": [inr.tolist()]})

    below_tot = 0
    vals: list = []
    for r in narrow.map_batches(final, batch_format="pyarrow").take_all():
        below_tot += r["below"]
        vals.extend(r["v"])
    vals = np.sort(np.asarray(vals, np.float64))
    v1 = float(vals[k1 - below_tot])
    v2 = float(vals[k2 - below_tot])
    return v1 + (v2 - v1) * frac


def filter_by_quantile(
    ds: "ray.data.Dataset",
    col: str,
    q: float,
    *,
    keep: str = "ge",
    **quantile_kwargs,
) -> "ray.data.Dataset":
    """Keep rows whose ``col`` is >= (``keep='ge'``) or <= (``keep='le'``)
    the exact global ``quantile_cont(col, q)`` — the "top-5% by quality
    score" / "drop the slowest percentile" filter, with the threshold found
    by :func:`global_quantile_cont` (a few streaming passes) and then ONE
    zero-shuffle filter pass with the scalar threshold in the closure."""
    if keep not in ("ge", "le"):
        raise ValueError("keep must be 'ge' or 'le'")
    thr = global_quantile_cont(ds, col, q, **quantile_kwargs)

    def flt(t: pa.Table) -> pa.Table:
        cmp = pc.greater_equal if keep == "ge" else pc.less_equal
        mask = pc.coalesce(cmp(t[col], pa.scalar(thr)), pa.scalar(False))
        return t.filter(mask)

    return ds.map_batches(flt, batch_format="pyarrow")


def approx_quantiles_sample(
    ds: "ray.data.Dataset",
    *,
    group_col: str,
    id_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    k: int = 256,
    salt: str = "",
    out_col: str = "quantile_value",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Mergeable approximate per-group quantiles from a DETERMINISTIC
    bottom-k-by-hash sample — the sketch alternative to
    ``global_quantile_cont``'s histogram refinement when one pass and a
    tiny mergeable state matter more than tight error.

    Each row's sampling key is the engine-wide ``md5(id || ':' || salt)``
    convention (stages/sampling.py), so the k kept rows per group are a
    uniform random sample WITHOUT any engine-side RNG, and a SQL oracle
    reproduces the sketch bit-for-bit at ANY scale — unlike coin-flip
    compactor sketches (KLL, Karnin-Lang-Liberty 2016) whose state depends
    on private randomness.  Rank error is O(1/sqrt(k)) (vs KLL's
    O(1/k) at equal state — the price of engine-independent determinism;
    swap in KLL with a value-derived coin if tighter error is ever worth
    losing SQL parity).

    Combiner shape: per-batch partial keeps each group's k smallest
    (hash, id) rows; ONE bucketed shuffle merges partials and re-keeps;
    the estimate for quantile q is the sample's value at rank
    ``floor(q * (m - 1))`` under ``(value, hash, id)`` ordering (nearest-
    rank on the sample; dyadic q values keep the floor exact in float).
    NULL values are ignored.  Output: one row per (group, q):
    ``(group_col, q, out_col)`` with the value cast to float64."""
    import hashlib

    from .bucketing import bucketed_group_apply

    if k < 2:
        raise ValueError("approx_quantiles_sample: k must be >= 2")
    qs = tuple(float(q) for q in qs)

    def _keep_bottom_k(keys, hashes, ids, vals):
        order = np.lexsort((ids, hashes, keys))
        keys, hashes, ids, vals = (
            keys[order],
            hashes[order],
            ids[order],
            vals[order],
        )
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        pos = np.arange(len(keys))
        first_pos = pos[new_key][np.cumsum(new_key) - 1]
        rank = pos - first_pos
        take = rank < k
        return keys[take], hashes[take], ids[take], vals[take]

    def _partial(t: pa.Table) -> pa.Table:
        gtype = t.schema.field(group_col).type
        sub = t.select([group_col, id_col, value_col]).filter(
            pc.and_(pc.is_valid(t[value_col]), pc.is_valid(t[id_col]))
        )
        if sub.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], gtype),
                    "__h": pa.array([], pa.int64()),
                    "__sid": pa.array([], pa.string()),
                    "__v": pa.array([], pa.float64()),
                }
            )
        ids = np.asarray(
            [str(v) for v in sub[id_col].to_pylist()], dtype=object
        )
        hashes = np.fromiter(
            (
                int(hashlib.md5(f"{i}:{salt}".encode()).hexdigest()[:8], 16)
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        keys = np.asarray(sub[group_col].to_pylist(), dtype=object)
        vals = np.asarray(sub[value_col].to_pylist(), dtype=np.float64)
        keys, hashes, ids, vals = _keep_bottom_k(keys, hashes, ids, vals)
        return pa.table(
            {
                group_col: pa.array(keys.tolist(), gtype),
                "__h": pa.array(hashes, pa.int64()),
                "__sid": pa.array(ids.tolist(), pa.string()),
                "__v": pa.array(vals, pa.float64()),
            }
        )

    def _merge(g: pa.Table) -> pa.Table:
        gtype = g.schema.field(group_col).type
        empty = pa.table(
            {
                group_col: pa.array([], gtype),
                "q": pa.array([], pa.float64()),
                out_col: pa.array([], pa.float64()),
            }
        )
        if g.num_rows == 0:
            return empty
        keys = np.asarray(g[group_col].to_pylist(), dtype=object)
        hashes = np.asarray(g["__h"].to_pylist(), dtype=np.int64)
        ids = np.asarray(g["__sid"].to_pylist(), dtype=object)
        vals = np.asarray(g["__v"].to_pylist(), dtype=np.float64)
        keys, hashes, ids, vals = _keep_bottom_k(keys, hashes, ids, vals)
        # estimate: per group, order the sample by (value, hash, id)
        order = np.lexsort((ids, hashes, vals, keys))
        keys, vals = keys[order], vals[order]
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(new_key)
        sizes = np.diff(np.r_[starts, len(keys)])
        out_k: list = []
        out_q: list[float] = []
        out_v: list[float] = []
        for q in qs:
            idx = starts + np.floor(q * (sizes - 1)).astype(np.int64)
            out_k.extend(keys[starts].tolist())
            out_q.extend([q] * len(starts))
            out_v.extend(vals[idx].tolist())
        return pa.table(
            {
                group_col: pa.array(out_k, gtype),
                "q": pa.array(out_q, pa.float64()),
                out_col: pa.array(out_v, pa.float64()),
            }
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return bucketed_group_apply(
        partials, group_col, _merge, n_buckets=n_buckets, exchange="direct"
    )


def mode_per_group(
    ds: "ray.data.Dataset",
    *,
    group_col: str,
    value_col: str,
    out_value_col: str = "mode_value",
    out_count_col: str = "mode_count",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """EXACT per-group mode: the most frequent ``value_col`` (ties broken
    by the smallest value — SQL ``ROW_NUMBER() OVER (PARTITION BY g ORDER
    BY COUNT(*) DESC, v ASC) = 1``).  NULL values are ignored (callers
    wanting SQL parity should also filter, or accept COUNT(v) semantics).

    Combiner shape: each batch collapses to its distinct ``(group,
    value)`` pair counts (one Arrow hash-groupby); ONE shuffle bucketed on
    ``hash(group)`` co-locates every pair count of a group (the argmax
    needs them together); the per-bucket merge sums partials and keeps the
    first row of each group after an Arrow sort on (group ASC, count
    DESC, value ASC).  Bytes shuffled ∝ distinct pairs, never rows."""
    from .bucketing import bucketed_group_apply

    def local_counts(t: pa.Table) -> pa.Table:
        t = t.select([group_col, value_col]).filter(pc.is_valid(t[value_col]))
        c = t.group_by([group_col, value_col]).aggregate([(value_col, "count")])
        return pa.table(
            {
                group_col: c[group_col],
                value_col: c[value_col],
                "__part": c[f"{value_col}_count"].cast(pa.int64()),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        gt = g.schema.field(group_col).type if group_col in g.column_names else pa.string()
        vt = g.schema.field(value_col).type if value_col in g.column_names else pa.string()
        empty = pa.table(
            {
                group_col: pa.array([], gt),
                out_value_col: pa.array([], vt),
                out_count_col: pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        merged = g.group_by([group_col, value_col]).aggregate([("__part", "sum")])
        srt = merged.sort_by(
            [
                (group_col, "ascending"),
                ("__part_sum", "descending"),
                (value_col, "ascending"),
            ]
        )
        keys = srt[group_col].combine_chunks()
        n = len(keys)
        if n == 1:
            first = pa.array([True])
        else:
            neq = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
            if isinstance(neq, pa.ChunkedArray):
                neq = neq.combine_chunks()
            first = pa.concat_arrays([pa.array([True]), neq])
        top = srt.filter(first)
        return pa.table(
            {
                group_col: top[group_col],
                out_value_col: top[value_col],
                out_count_col: top["__part_sum"].cast(pa.int64()),
            }
        )

    return bucketed_group_apply(
        ds.map_batches(local_counts, batch_format="pyarrow"),
        group_col,
        per_bucket,
        n_buckets=n_buckets,
        exchange="direct",
    )
