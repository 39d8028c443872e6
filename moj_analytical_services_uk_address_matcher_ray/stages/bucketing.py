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


def bucketed_group_apply(
    ds: "ray.data.Dataset",
    keys: list[str] | str,
    bucket_fn,
    *,
    n_buckets: int | None = None,
    batch_format: str = "pyarrow",
) -> "ray.data.Dataset":
    """One hash shuffle on ``hash(keys) % n_buckets``; ``bucket_fn`` receives
    a whole bucket (all rows of every group that hashed there, ``__bucket``
    column already dropped) and must do its own per-group logic vectorised.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    nb = n_buckets or default_buckets()
    keyed = ds.map_batches(
        lambda t: add_bucket_column(t, keys, nb), batch_format="pyarrow"
    )

    if batch_format == "pyarrow":

        def wrapper(g: pa.Table):
            return bucket_fn(g.drop_columns([BUCKET_COL]))

    else:

        def wrapper(g):
            res = bucket_fn(g.drop(columns=[BUCKET_COL]))
            # convert pandas results to Arrow HERE: Ray's own pandas->Arrow
            # block conversion infers an all-NaN float64 column as Arrow
            # `null` type, which poisons downstream schema unification when
            # one bucket's output happens to be all-NaN (pyarrow's
            # from_pandas keeps float64 -> double)
            import pandas as pd

            if isinstance(res, pd.DataFrame):
                # strip the b'pandas' schema metadata from_pandas attaches:
                # a pa.Schema with schema metadata is unhashable, which
                # defeats Ray Data's schema-dedup fast path on every
                # downstream concat/unify (and logs a warning per task)
                return pa.Table.from_pandas(
                    res, preserve_index=False
                ).replace_schema_metadata(None)
            return res

    return keyed.groupby(BUCKET_COL).map_groups(wrapper, batch_format=batch_format)


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
