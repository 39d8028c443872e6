"""Bucketed group processing — the high-cardinality groupby pattern.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per GROUP; with
hundreds of thousands of tiny groups (candidate pairs, per-record blocks)
the per-group Python/Ray overhead dominates wall time by orders of
magnitude.  The fix: shuffle on ``hash(key) % n_buckets`` instead, so ONE
task receives a whole bucket of groups, and the per-bucket function handles
the grouping internally with vectorised pandas/Arrow ops.

Used by the joins, pair generation/dedup, exact matching, rescoring,
clustering and dedup-verify stages.  Bucket count is the shuffle-width knob:
it bounds task size (memory) and sets the parallelism of the reduce side.
"""

from __future__ import annotations

import pyarrow as pa
import ray

BUCKET_COL = "__bucket"


def default_buckets() -> int:
    """One bucket per CPU: each bucket is exactly one reduce task, so cpus
    buckets saturate the machine; 2x cpus only doubled the sort-shuffle
    fragment count (map_blocks x buckets) for no extra parallelism."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, cpus)


def coalesce_blocks(
    ds: "ray.data.Dataset", *, target_block_bytes: int = 64 << 20
) -> "ray.data.Dataset":
    """Coalesce a many-tiny-blocks dataset to ~one block per CPU (or per
    ``target_block_bytes``, whichever is more) and materialize.

    Every sort-based groupby downstream spawns one reduce task per input
    block, and per-task fixed cost dominates at sub-MB blocks (measured in
    pipelines/code_linkage.py).  No-op — returned unchanged, not
    materialized — when the block count is already within 2x of the
    target, so it is safe to call unconditionally between phases."""
    tgt = max(default_buckets(), int((ds.size_bytes() or 0) // target_block_bytes))
    if ds.num_blocks() > 2 * tgt:
        ds = ds.repartition(tgt).materialize()
    return ds


def _combine_keys(t: pa.Table, keys: list[str]) -> pa.Array:
    """Vectorised key concat (arrow cast + element-wise join); NULLs fold to
    '' so every row gets a bucket."""
    import pyarrow.compute as pc

    parts = []
    for k in keys:
        arr = t[k]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_null(arr.type):  # all-null batch arrives as null type
            arr = arr.cast(pa.string())
        elif not pa.types.is_string(arr.type):
            arr = arr.cast(pa.string())
        parts.append(pc.coalesce(arr, ""))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "\x1f")


def hash_bucket_ids(combined: pa.Array, n_buckets: int) -> "pa.Int32Array":
    """Vectorised value-deterministic bucket assignment: pandas' C siphash
    over the (dictionary-encoded) key strings.  Every batch of the same key
    value lands in the same bucket — the only property a bucketed shuffle
    needs.  Replaces a per-row ``zlib.crc32`` Python loop that ran on every
    bucketed shuffle in the engine."""
    import numpy as np
    import pandas as pd

    if len(combined) == 0:
        return pa.array([], pa.int32())
    h = pd.util.hash_array(
        combined.to_numpy(zero_copy_only=False), categorize=True
    )
    return pa.array((h % np.uint64(n_buckets)).astype(np.int32), pa.int32())


def add_bucket_column(
    t: pa.Table, keys: list[str], n_buckets: int, *, out: str = BUCKET_COL
) -> pa.Table:
    return t.append_column(out, hash_bucket_ids(_combine_keys(t, keys), n_buckets))


def _wrap_bucket_fn(bucket_fn, batch_format: str):
    """Shared bucket wrapper: drop the routing column, normalise pandas
    output to metadata-stripped Arrow (see bucketed_group_apply notes)."""
    if batch_format == "pyarrow":

        def wrapper(g: pa.Table):
            return bucket_fn(g.drop_columns([BUCKET_COL]))

    else:

        def wrapper(g):
            import pandas as pd

            if isinstance(g, pa.Table):
                g = g.to_pandas()
            res = bucket_fn(g.drop(columns=[BUCKET_COL]))
            # convert pandas results to Arrow HERE: Ray's own pandas->Arrow
            # block conversion infers an all-NaN float64 column as Arrow
            # `null` type, which poisons downstream schema unification when
            # one bucket's output happens to be all-NaN (pyarrow's
            # from_pandas keeps float64 -> double)
            if isinstance(res, pd.DataFrame):
                # strip the b'pandas' schema metadata from_pandas attaches:
                # a pa.Schema with schema metadata is unhashable, which
                # defeats Ray Data's schema-dedup fast path on every
                # downstream concat/unify (and logs a warning per task)
                return pa.Table.from_pandas(
                    res, preserve_index=False
                ).replace_schema_metadata(None)
            return res

    return wrapper


def bucketed_group_apply(
    ds: "ray.data.Dataset",
    keys: list[str] | str,
    bucket_fn,
    *,
    n_buckets: int | None = None,
    batch_format: str = "pyarrow",
    exchange: str = "sort",
) -> "ray.data.Dataset":
    """One hash shuffle on ``hash(keys) % n_buckets``; ``bucket_fn`` receives
    a whole bucket (all rows of every group that hashed there, ``__bucket``
    column already dropped) and must do its own per-group logic vectorised.

    ``exchange="direct"`` routes through :func:`direct_bucket_apply` (raw-
    task hash exchange, no Dataset sort) — ONLY valid when ``bucket_fn`` is
    insensitive to row order within its bucket AND tolerates being invoked
    on empty buckets; call sites opt in after auditing both.
    """
    if exchange == "direct":
        return direct_bucket_apply(
            ds, keys, bucket_fn, n_buckets=n_buckets, batch_format=batch_format
        )
    keys = [keys] if isinstance(keys, str) else list(keys)
    nb = n_buckets or default_buckets()
    keyed = ds.map_batches(
        lambda t: add_bucket_column(t, keys, nb), batch_format="pyarrow"
    )
    wrapper = _wrap_bucket_fn(bucket_fn, batch_format)
    return keyed.groupby(BUCKET_COL).map_groups(wrapper, batch_format=batch_format)


@ray.remote
def _split_by_bucket(nb: int, empty: pa.Table, *blocks: pa.Table):
    """Map-side partition of one group of keyed blocks: ONE stable argsort
    on the int32 bucket column, then ``nb`` zero-copy slices — returned as
    ``nb`` separate objects so each reduce task pulls ONLY its bucket's
    slice (a true hash exchange; on a multi-node cluster no node ever
    fetches another bucket's rows).

    ``empty``: schema-carrying 0-row table.  Ray Data skips map UDFs on
    0-row blocks, so an empty upstream block can arrive WITHOUT the bucket
    column the keyed map appends everywhere else — such blocks carry no
    rows and are replaced by ``empty``."""
    import numpy as np

    blocks = tuple(b for b in blocks if BUCKET_COL in b.column_names) or (empty,)
    t = (
        blocks[0]
        if len(blocks) == 1
        else pa.concat_tables(blocks, promote_options="default")
    )
    b = t[BUCKET_COL].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    st = t.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(b[order], np.arange(nb + 1))
    out = tuple(
        st.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        for i in range(nb)
    )
    return out if nb > 1 else out[0]


@ray.remote
def _split_with_pre(nb: int, keys: list, pre_fn, *blocks: pa.Table):
    """Like ``_split_by_bucket``, but the keyed rows are DERIVED in-task:
    ``pre_fn`` (e.g. blocking-key flat-map) runs over the raw feature
    blocks, then bucket-assign + argsort + slice.  The keyed stream never
    exists as a dataset — no map stage, no materialize, no re-read (the
    keyed round trip through the object store was ~2s of the two-table
    score phase)."""
    import numpy as np

    live = [b for b in blocks if b.num_rows] or [blocks[0]]
    t = (
        live[0]
        if len(live) == 1
        else pa.concat_tables(live, promote_options="default")
    )
    if pre_fn is not None:
        t = pre_fn(t)
    t = add_bucket_column(t, keys, nb)
    b = t[BUCKET_COL].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    st = t.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(b[order], np.arange(nb + 1))
    out = tuple(
        st.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        for i in range(nb)
    )
    return out if nb > 1 else out[0]


def direct_bucket_apply_sources(
    sources: list,
    keys: list[str] | str,
    bucket_fn,
    *,
    n_buckets: int | None = None,
    batch_format: str = "pyarrow",
) -> "ray.data.Dataset":
    """``direct_bucket_apply`` over MULTIPLE materialized inputs, each with
    its own in-task derivation: ``sources`` is a list of ``(dataset,
    pre_fn | None)``; each split task concatenates a group of that
    dataset's blocks, applies ``pre_fn``, assigns buckets and emits
    ``n_buckets`` slices.  Every source's slices for bucket ``b`` meet in
    bucket ``b``'s reduce task."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    nb = n_buckets or default_buckets()
    cpus = default_buckets()
    split_out: list = []
    for ds, pre in sources:
        refs = ds.materialize().to_arrow_refs()
        if not refs:
            continue
        n_split = max(1, min(len(refs), cpus))
        per = -(-len(refs) // n_split)
        for i in range(0, len(refs), per):
            split_out.append(
                _split_with_pre.options(num_returns=nb).remote(
                    nb, keys, pre, *refs[i : i + per]
                )
            )
    if nb == 1:
        split_out = [[r] for r in split_out]
    wrapper = _wrap_bucket_fn(bucket_fn, batch_format)
    out_refs = [
        _reduce_bucket.remote(wrapper, *(s[b] for s in split_out))
        for b in range(nb)
    ]
    return ray.data.from_arrow_refs(out_refs)


@ray.remote
def _reduce_bucket(wrapper, *parts: pa.Table):
    live = [p for p in parts if p.num_rows]
    t = (
        pa.concat_tables(live, promote_options="default")
        if live
        else parts[0]
    )
    res = wrapper(t)
    if isinstance(res, pa.Table):
        res = res.replace_schema_metadata(None)
    return res


def direct_bucket_apply(
    ds: "ray.data.Dataset",
    keys: list[str] | str,
    bucket_fn,
    *,
    n_buckets: int | None = None,
    batch_format: str = "pyarrow",
) -> "ray.data.Dataset":
    """``bucketed_group_apply`` semantics via a RAW-TASK hash exchange
    instead of ``groupby().map_groups``'s sort shuffle.

    Ray Data's groupby is a general SORT: sample, range-partition, sort
    every block, merge — machinery a hash-bucketed shuffle doesn't need
    (measured on the reference-shape two-table run: the Sort operator alone
    cost more wall than all 48 fused bucket tasks combined).  Here each
    map-side split task does one ``argsort`` on the int32 bucket id and
    emits ``n_buckets`` zero-copy slices (``num_returns`` objects); each
    bucket's reduce task concatenates exactly its own slices and runs
    ``bucket_fn``.  One round trip, no sampling, no range boundaries, no
    per-block sort-merge.  This is one of the documented spots where raw
    Ray tasks are justified: the Dataset API cannot express a hash
    exchange without a sort (its hash-shuffle strategy benchmarked no
    faster here).

    Requires ``bucket_fn`` to be insensitive to row order WITHIN a bucket
    (true of every bucketed consumer in this repo: they lexsort or hash
    their group keys internally and break ties by rank/id, not position).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    nb = n_buckets or default_buckets()
    keyed = ds.map_batches(
        lambda t: add_bucket_column(t, keys, nb), batch_format="pyarrow"
    ).materialize()
    refs = keyed.to_arrow_refs()
    if not refs:
        return keyed
    # schema-carrying 0-row fallback for degenerate empty blocks (Ray Data
    # bypasses map UDFs on 0-row blocks, so they may lack the bucket column)
    sch = keyed.schema().base_schema
    if BUCKET_COL not in sch.names:
        sch = sch.append(pa.field(BUCKET_COL, pa.int32()))
    empty_ref = ray.put(sch.empty_table())
    # ~one split task per CPU: fewer tasks = fewer (tiny) shuffle objects
    # (S x nb), but each split must still fit comfortably in a worker heap
    n_split = max(1, min(len(refs), default_buckets()))
    per = -(-len(refs) // n_split)
    groups = [refs[i : i + per] for i in range(0, len(refs), per)]
    split_out = [
        _split_by_bucket.options(num_returns=nb).remote(nb, empty_ref, *g)
        for g in groups
    ]
    if nb == 1:
        split_out = [[r] for r in split_out]
    wrapper = _wrap_bucket_fn(bucket_fn, batch_format)
    out_refs = [
        _reduce_bucket.remote(wrapper, *(split_out[s][b] for s in range(len(groups))))
        for b in range(nb)
    ]
    return ray.data.from_arrow_refs(out_refs)


def bucketed_pandas_groupby(
    ds: "ray.data.Dataset",
    keys: list[str] | str,
    group_fn,
    *,
    n_buckets: int | None = None,
):
    """Bucketed shuffle + per-bucket pandas groupby: ``group_fn`` keeps its
    one-group-in / frame-out signature, but is driven by pandas' fast group
    iteration inside one task instead of one Ray UDF call per group."""
    import pandas as pd

    keys = [keys] if isinstance(keys, str) else list(keys)

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        if len(g) == 0:
            return group_fn(g)
        outs = []
        for _, sub in g.groupby(keys if len(keys) > 1 else keys[0], sort=False):
            res = group_fn(sub)
            if len(res):
                outs.append(res)
        if not outs:
            return group_fn(g.head(0))
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(
        ds, keys, per_bucket, n_buckets=n_buckets, batch_format="pandas"
    )
