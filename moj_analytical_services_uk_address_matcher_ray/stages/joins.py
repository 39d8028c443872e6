"""Distributed join helpers (operators J1/J2/J5/K5 of SURVEY.md §2.4/§2.7).

Ray Data 2.49 ships a hash-partitioned ``Dataset.join``, but in local
testing it raises ``ArrowInvalid: No match ... for key field reference`` when
a join side derives from an aggregate (empty hash partitions lose their
schema).  The engine therefore uses its own co-partitioned hash join built
on the ``union -> groupby(key).map_groups`` machinery that the rest of the
engine already exercises heavily: both sides are tagged and unioned with
aligned schemas, one hash shuffle co-locates equal keys, and a per-group
Arrow cross-merge emits the joined rows.  Semantics follow SQL equi-joins:
NULL keys never match (left rows with NULL keys still survive a left join).

Semi / anti joins reuse the same machinery against the deduplicated key set
of the right side (matching_stages.py:173-182's anti-join loop).  For
*small* right sides prefer ``broadcast_semi_filter`` — zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

DEFAULT_PARTITIONS = 32  # kept for API compat; the groupby decides its own

_JK = "__join_key"
_SIDE = "__join_side"
# shuffle key for null-keyed right rows in a FULL OUTER join (they must
# survive but match nothing; left null-key rows bypass the shuffle, so this
# value can never meet a left row).  \x00-prefixed to keep it out of the
# space of realistic cast-to-string key values.
_NULL_KEY_SENTINEL = "\x00__uam_full_join_null_key__"


def _key_strings(t: pa.Table, cols: tuple[str, ...]) -> pa.Array:
    """Serialise key tuples to strings (equality-preserving, vectorised);
    NULL if any component is NULL (SQL semantics).  ``binary_join_element_wise``
    with null_handling='emit_null' gives exactly that."""
    parts = []
    for c in cols:
        arr = t[c]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if not pa.types.is_string(arr.type):
            arr = arr.cast(pa.string())
        parts.append(arr)
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(
        *parts, "\x1f", null_handling="emit_null"
    )


def _typed_nulls(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, typ)


def _arrowize(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Force Arrow blocks (pandas-block datasets report Python/numpy types
    from ``schema()``, which breaks typed null-filling)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def _schema_of(ds: "ray.data.Dataset") -> pa.Schema:
    sch = ds.schema()
    names, types = sch.names, sch.types
    return pa.schema([pa.field(n, t) for n, t in zip(names, types)])


BROADCAST_JOIN_ROW_LIMIT = 200_000  # auto-broadcast a right side up to this
BROADCAST_JOIN_BYTE_LIMIT = 256 << 20  # ... unless it is wider than this

# worker-process-local cache of prepared broadcast right sides (keyed by the
# object ref hex) — the ray.get is zero-copy from the local object store, but
# the key-frame build is not free, so reuse it across batches on a worker
_BCAST_CACHE: dict = {}


def _broadcast_merge_join(
    left: "ray.data.Dataset",
    rt: pa.Table,
    on: tuple[str, ...],
    right_on: tuple[str, ...],
    how: str,
    lcols: list[str],
    rcols_payload: list[str],
    rout: dict[str, str],
) -> "ray.data.Dataset":
    """Zero-shuffle equi-join against a *small* right table: the right side
    is ``ray.put`` once (read zero-copy in every task), each left batch is
    merged locally via a vectorised pandas hash-merge on dictionary codes.
    Semantics identical to the co-partitioned path (NULL keys never match;
    left rows with NULL keys survive a left join)."""
    import pandas as pd

    rt = rt.combine_chunks()
    rkeys = _key_strings(rt, right_on)
    valid = pc.is_valid(rkeys)
    payload = rt.select(rcols_payload).rename_columns(
        [rout[c] for c in rcols_payload]
    )
    ref = ray.put((rkeys.filter(valid), payload.filter(valid)))

    def _prepared():
        key = ref.hex()
        hit = _BCAST_CACHE.get(key)
        if hit is None:
            rkeys_v, payload_v = ray.get(ref)
            rdf = pd.DataFrame(
                {
                    "k": rkeys_v.to_pandas(),
                    "j": np.arange(len(rkeys_v), dtype=np.int64),
                }
            )
            hit = (rdf, payload_v)
            if len(_BCAST_CACHE) > 8:
                _BCAST_CACHE.clear()
            _BCAST_CACHE[key] = hit
        return hit

    def merge_batch(t: pa.Table) -> pa.Table:
        rdf, payload_v = _prepared()
        lk = _key_strings(t, on)
        if isinstance(lk, pa.ChunkedArray):
            lk = lk.combine_chunks()
        ldf = pd.DataFrame(
            {"k": lk.to_pandas(), "i": np.arange(t.num_rows, dtype=np.int64)}
        )
        # right NULL keys were dropped above, so left NULL keys match
        # nothing: inner-merge drops them, left-merge null-pads them — SQL
        # three-valued equality for free.
        m = ldf.merge(rdf, on="k", how=("left" if how == "left" else "inner"))
        sel = t.select(lcols)
        if len(m) == 0:
            out = {c: sel[c].slice(0, 0) for c in lcols}
            for c in rcols_payload:
                out[rout[c]] = payload_v[rout[c]].slice(0, 0)
            return pa.table(out)
        li = pa.array(m["i"].to_numpy(), pa.int64())
        rj = pa.Array.from_pandas(m["j"].astype("Int64"))  # NaN -> null row
        lpart = sel.take(li)
        rpart = payload_v.take(rj)
        data = {c: lpart[c] for c in lcols}
        for c in rcols_payload:
            data[rout[c]] = rpart[rout[c]]
        return pa.table(data)

    return left.map_batches(merge_batch, batch_format="pyarrow")


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: tuple[str, ...] | str,
    *,
    right_on=None,
    how: str = "inner",  # "inner" | "left" | "full"
    right_suffix: str = "_r",
    num_partitions: int = DEFAULT_PARTITIONS,  # accepted, unused (groupby decides)
    broadcast: bool | None = None,  # None = auto (probe the right side)
) -> "ray.data.Dataset":
    """Co-partitioned equi-join.  Output = all left columns + right columns
    (right key columns dropped; clashing right names get ``right_suffix``).

    ``broadcast``: small right sides (dimension tables, lookup maps) skip the
    all-to-all exchange entirely — the right table is materialised once,
    ``ray.put`` into the object store, and each left batch hash-merges
    against it locally.  ``None`` probes the right side with a bounded
    ``limit(N+1).count()`` (streaming early-stop; cheap for scans/maps, one
    extra barrier for aggregate-derived sides — pass an explicit bool there).
    ``False`` forces the shuffle route — the 10^12-row big×big path.

    ``how="full"`` (FULL OUTER) always takes the shuffle route (a broadcast
    right side cannot track globally-unmatched right rows across streaming
    left batches).  Output keys follow SQL ``USING`` semantics: the left key
    columns carry ``COALESCE(left key, right key)`` — right-only rows keep
    their key values (right key values are cast to the left key types)."""
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (
        (right_on,) if isinstance(right_on, str) else tuple(right_on or on)
    )
    if how not in ("inner", "left", "full"):
        raise ValueError(f"hash_join: unsupported how={how!r}")
    left = _arrowize(left)
    right = _arrowize(right)
    if left.schema() is None:  # fully empty left -> empty result
        if how == "full":
            raise ValueError(
                "hash_join(how='full'): left side has no schema (fully "
                "empty dataset) — the joined schema cannot be constructed"
            )
        return left
    if right.schema() is None:  # fully empty right
        # inner: nothing joins; left/full: every left row survives with no
        # right payload columns (schema unknown for an empty right side)
        return left.limit(0) if how == "inner" else left
    lschema = _schema_of(left)
    rschema = _schema_of(right)
    lcols = list(lschema.names)
    rcols_payload = [c for c in rschema.names if c not in right_on]
    # output names for right payload columns
    rout = {
        c: (c + right_suffix if c in lcols else c) for c in rcols_payload
    }
    rtypes = {c: rschema.field(c).type for c in rcols_payload}

    if how == "full":
        if broadcast:
            raise ValueError("hash_join(how='full') cannot broadcast")
        broadcast = False
    if broadcast is None:
        # decide from metadata of ONE materialisation — a separate
        # limit(N+1).count() probe would execute the right-side plan twice
        # (and a nondeterministic side could pass the probe yet differ on
        # the second execution).  The materialised blocks feed either route
        # without re-execution; the shuffle route would have executed the
        # full plan anyway.
        right = right.materialize()
        broadcast = (
            right.count() <= BROADCAST_JOIN_ROW_LIMIT
            and right.size_bytes() <= BROADCAST_JOIN_BYTE_LIMIT
        )
    if broadcast:
        import pandas as pd

        refs = right.to_arrow_refs()
        # to_arrow_refs takes a zero-copy shortcut when the dataset-level
        # schema is Arrow, which can hand back raw *pandas* blocks from
        # mixed-block unions — convert stragglers against the known schema
        tables = []
        for t in ray.get(refs):
            if isinstance(t, pd.DataFrame):
                if len(t) == 0:  # empty pandas stragglers may lack columns
                    continue
                t = pa.Table.from_pandas(
                    t[list(rschema.names)], schema=rschema, preserve_index=False
                )
            if t.num_rows > 0:
                tables.append(t)
        rt = (
            # "default" promotion folds stray null-typed columns (e.g. an
            # all-null block) into the other blocks' concrete types
            pa.concat_tables(tables, promote_options="default")
            if tables
            else pa.table(
                {n: pa.nulls(0, rschema.field(n).type) for n in rschema.names}
            )
        )
        # an EXPLICIT broadcast=True is honored unconditionally (the caller
        # vouches for the size — e.g. code_linkage's cluster relabel gates
        # on its own threshold); only the auto decision above is size-capped
        return _broadcast_merge_join(
            left, rt, on, right_on, how, lcols, rcols_payload, rout
        )

    def prep_left(t: pa.Table) -> pa.Table:
        data = {c: t[c] for c in lcols}
        data[_JK] = _key_strings(t, on)
        data[_SIDE] = pa.array(["l"] * t.num_rows, pa.string())
        for c in rcols_payload:
            data[rout[c]] = _typed_nulls(t.num_rows, rtypes[c])
        return pa.table(data)

    def prep_right(t: pa.Table) -> pa.Table:
        data = {c: _typed_nulls(t.num_rows, lschema.field(c).type) for c in lcols}
        data[_JK] = _key_strings(t, right_on)
        data[_SIDE] = pa.array(["r"] * t.num_rows, pa.string())
        for c in rcols_payload:
            data[rout[c]] = t[c]
        if how == "full":
            # FULL OUTER: every right row must survive.  Key columns carry
            # the right key values (USING/COALESCE semantics); null right
            # keys still match nothing, so give them a shared sentinel
            # shuffle key — in merge_bucket they come out as right-only
            # rows (left null keys are carried AROUND the shuffle, so the
            # sentinel can never meet a left row).
            for lc, rc in zip(on, right_on):
                arr = t[rc]
                arr = (
                    arr.combine_chunks()
                    if isinstance(arr, pa.ChunkedArray)
                    else arr
                )
                data[lc] = arr.cast(lschema.field(lc).type)
            jk = data[_JK]
            data[_JK] = pc.if_else(
                pc.is_valid(jk), jk, pa.scalar(_NULL_KEY_SENTINEL)
            )
            return pa.table(data)
        keep = pc.is_valid(data[_JK])
        return pa.table(data).filter(keep)  # null right keys never match

    out_cols = lcols + [rout[c] for c in rcols_payload]

    lt = left.map_batches(prep_left, batch_format="pyarrow")
    rt = right.map_batches(prep_right, batch_format="pyarrow")

    null_keys = None
    if how in ("left", "full"):
        # left rows with NULL keys can't be shuffled on the key; carry them
        # around the join directly (they join to nothing).
        null_keys = lt.map_batches(
            lambda t: t.filter(pc.is_null(t[_JK])).select(out_cols),
            batch_format="pyarrow",
        )
        lt = lt.map_batches(
            lambda t: t.filter(pc.is_valid(t[_JK])), batch_format="pyarrow"
        )
    else:
        lt = lt.map_batches(
            lambda t: t.filter(pc.is_valid(t[_JK])), batch_format="pyarrow"
        )

    def merge_bucket(g: pa.Table) -> pa.Table:
        """Vectorised within-bucket hash join: pandas' C hash-merge produces
        the (left index, right index) pairs, then one Arrow ``take`` per
        side.  A bucket holds MANY keys (bucketed shuffle — per-group Ray
        overhead amortised away).  Ordering matches SQL-stable semantics:
        left order preserved, right matches in right-row order."""
        import pandas as pd

        sides = g[_SIDE]
        lmask = pc.equal(sides, "l")
        lrows = g.filter(lmask)
        rrows = g.filter(pc.equal(sides, "r"))
        nl, nr = lrows.num_rows, rrows.num_rows
        if nl == 0:
            if how == "full":
                # right-only bucket: key columns already carry the right
                # key values (prep_right), other left columns are null
                return rrows.select(out_cols)
            return g.select(out_cols).slice(0, 0)
        if nr == 0:
            if how in ("left", "full"):
                return lrows.select(out_cols)
            return g.select(out_cols).slice(0, 0)
        # integer-encode the key ONCE over the whole bucket so both sides
        # share dictionary codes; pandas then hash-merges int32 codes
        # instead of Python string objects (no to_pylist materialisation)
        codes = pc.dictionary_encode(g[_JK].combine_chunks()).indices
        lk = pc.filter(codes, lmask.combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        rk = pc.filter(codes, pc.invert(lmask).combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        ldf = pd.DataFrame({"k": lk, "i": np.arange(nl, dtype=np.int64)})
        rdf = pd.DataFrame({"k": rk, "j": np.arange(nr, dtype=np.int64)})
        pd_how = {"inner": "inner", "left": "left", "full": "outer"}[how]
        m = ldf.merge(rdf, on="k", how=pd_how)
        if len(m) == 0:
            return g.select(out_cols).slice(0, 0)
        ri = pa.Array.from_pandas(m["j"].astype("Int64"))  # NaN -> null row
        rpart = rrows.select([rout[c] for c in rcols_payload]).take(ri)
        if how == "full":
            li = pa.Array.from_pandas(m["i"].astype("Int64"))  # right-only
            lpart = lrows.select(lcols).take(li)
            # key columns: COALESCE(left, right) so right-only rows keep
            # their key (right key values travel in rrows' key columns)
            rkeys = rrows.select(list(on)).take(ri)
            data = {}
            for c in lcols:
                if c in on:
                    data[c] = pc.coalesce(
                        lpart[c].combine_chunks(), rkeys[c].combine_chunks()
                    )
                else:
                    data[c] = lpart[c]
        else:
            li = pa.array(m["i"].to_numpy(), pa.int64())
            lpart = lrows.select(lcols).take(li)
            data = {c: lpart[c] for c in lcols}
        for c in rcols_payload:
            data[rout[c]] = rpart[rout[c]]
        return pa.table(data)

    from .bucketing import direct_bucket_apply_sources

    # audited for exchange="direct": each output row is a (left, right)
    # match pair fully determined by the data (within-bucket emission
    # order is not part of the join contract), and every empty/degenerate
    # branch returns the full output schema.
    #
    # The two sides enter the exchange as SEPARATE sources (each side is
    # materialised in its own streaming execution) rather than via
    # ``lt.union(rt)``: executing a union whose branches both need CPU —
    # one of them an AllToAll aggregate — deadlocks Ray Data 2.49 on a
    # 1-CPU cluster (the read generator of one branch holds the only CPU
    # slot under streaming backpressure while the other branch's tasks
    # pend forever).  Separate executions also skip the union operator's
    # extra full-table block copies.  Ray Data skips map UDFs on 0-row
    # blocks, so a fully-filtered side can arrive as one schema-degenerate
    # empty block WITHOUT the prep columns — ``fix`` swaps those for a
    # schema-carrying empty keyed table.
    keyed_schema = pa.schema(
        [pa.field(c, lschema.field(c).type) for c in lcols]
        + [pa.field(_JK, pa.string()), pa.field(_SIDE, pa.string())]
        + [pa.field(rout[c], rtypes[c]) for c in rcols_payload]
    )
    empty_keyed = keyed_schema.empty_table()

    def fix(t: pa.Table) -> pa.Table:
        return t if _JK in t.column_names else empty_keyed

    joined = direct_bucket_apply_sources(
        [(lt, fix), (rt, fix)], _JK, merge_bucket
    )
    if null_keys is not None:
        joined = joined.union(null_keys)
    return joined


def inner_join(
    left, right, on, *, right_on=None, num_partitions: int = DEFAULT_PARTITIONS,
    left_suffix=None, right_suffix=None, broadcast: bool | None = None,
):
    return hash_join(
        left, right, on, right_on=right_on, how="inner",
        right_suffix=right_suffix or "_r", num_partitions=num_partitions,
        broadcast=broadcast,
    )


def left_join(
    left, right, on, *, right_on=None, num_partitions: int = DEFAULT_PARTITIONS,
    left_suffix=None, right_suffix=None, broadcast: bool | None = None,
):
    return hash_join(
        left, right, on, right_on=right_on, how="left",
        right_suffix=right_suffix or "_r", num_partitions=num_partitions,
        broadcast=broadcast,
    )


def full_outer_join(
    left, right, on, *, right_on=None, num_partitions: int = DEFAULT_PARTITIONS,
    left_suffix=None, right_suffix=None,
):
    """FULL OUTER equi-join (K5 family, SURVEY.md §2.7).  Key columns carry
    ``COALESCE(left key, right key)`` — SQL ``USING`` semantics.  Always the
    shuffle route (unmatched-right tracking is global)."""
    return hash_join(
        left, right, on, right_on=right_on, how="full",
        right_suffix=right_suffix or "_r", num_partitions=num_partitions,
        broadcast=False,
    )


_MARKER = "__semi_marker"


def _key_set(right: "ray.data.Dataset", on: tuple[str, ...]) -> "ray.data.Dataset":
    """Distinct key rows of the right side, with a marker column."""
    dedup = right.select_columns(list(on)).groupby(list(on)).count()
    return dedup.map_batches(
        lambda t: t.drop_columns(["count()"]).append_column(
            _MARKER, pa.array([1] * t.num_rows, pa.int8())
        ),
        batch_format="pyarrow",
    )


def semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: tuple[str, ...] | str,
    *,
    num_partitions: int = DEFAULT_PARTITIONS,
) -> "ray.data.Dataset":
    """Rows of ``left`` whose key appears in ``right`` (J1)."""
    on = (on,) if isinstance(on, str) else tuple(on)
    # broadcast=False: the key set is aggregate-derived (a groupby barrier) —
    # the auto-probe would run that barrier twice for small sides
    joined = left_join(
        left, _key_set(right, on), on,
        num_partitions=num_partitions, broadcast=False,
    )
    return joined.map_batches(
        lambda t: t.filter(pc.is_valid(t[_MARKER])).drop_columns([_MARKER]),
        batch_format="pyarrow",
    )


def anti_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: tuple[str, ...] | str,
    *,
    num_partitions: int = DEFAULT_PARTITIONS,
) -> "ray.data.Dataset":
    """Rows of ``left`` whose key does NOT appear in ``right``
    (matching_stages.py:173-182 `_get_unmatched_subset`)."""
    on = (on,) if isinstance(on, str) else tuple(on)
    joined = left_join(
        left, _key_set(right, on), on,
        num_partitions=num_partitions, broadcast=False,
    )
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t[_MARKER])).drop_columns([_MARKER]),
        batch_format="pyarrow",
    )


def broadcast_semi_filter(
    left: "ray.data.Dataset",
    keys,
    on: str,
    *,
    keep: bool = True,
) -> "ray.data.Dataset":
    """Zero-shuffle semi (keep=True) / anti (keep=False) filter against a
    *small* key collection: the key set is ``ray.put`` once and read
    zero-copy in every task."""
    keys_ref = keys if isinstance(keys, ray.ObjectRef) else ray.put(frozenset(keys))

    def _filter(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = pa.array([v in ks for v in t[on].to_pylist()], pa.bool_())
        return t.filter(mask if keep else pc.invert(mask))

    return left.map_batches(_filter, batch_format="pyarrow")


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: str,
    by: str | list[str],
    right_cols: list[str],
    direction: str = "backward",
    how: str = "inner",
    suffix: str = "_r",
    tolerance=None,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """As-of join: for each left row, the single right row with the nearest
    ``on`` value (<= for ``backward``, >= for ``forward``) within the same
    ``by`` key — the event-attribution / time-series-alignment operator the
    Dataset API lacks.

    Composition (no raw actors): both sides ride ONE tagged-union hash
    shuffle on the ``by`` key, then each bucket runs a vectorised
    ``pandas.merge_asof`` over all of its keys at once.  Right rows carry
    only ``by + on + right_cols`` — the narrow side of the exchange.  A hot
    ``by`` key concentrates in one bucket (same property as any keyed
    join); per-bucket cost is O(bucket log bucket).

    ``how="inner"`` drops unmatched left rows and preserves right column
    dtypes exactly; ``how="left"`` keeps them (integer right columns
    promote to float64 with NaN, the pandas left-merge convention).
    Exact-tie right rows are ordered deterministically by their value
    tuple, so reruns pick the same winner.
    """
    import numpy as np
    import pandas as pd

    from .bucketing import bucketed_group_apply

    by = [by] if isinstance(by, str) else list(by)
    left, right = _arrowize(left), _arrowize(right)  # pandas-block inputs
    l_schema, r_schema = left.schema(), right.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))
    renamed = [c + suffix for c in right_cols]
    clash = set(renamed) & set(l_schema.names)
    if clash:
        raise ValueError(f"suffixed right columns collide with left: {clash}")

    fields = list(zip(l_schema.names, l_schema.types)) + [
        (rc, r_types[c]) for c, rc in zip(right_cols, renamed)
    ]
    fields.append(("__side", pa.string()))

    def _pad(side: str, keep: list[str], rename: dict[str, str]):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            present = {rename.get(c, c): c for c in keep if c in t.column_names}
            for name, typ in fields:
                if name == "__side":
                    arr = pa.nulls(t.num_rows, pa.string()).fill_null(side)
                elif name in present:
                    arr = t[present[name]].combine_chunks()
                    if arr.type != typ:
                        arr = arr.cast(typ)
                else:
                    arr = pa.nulls(t.num_rows, typ)
                cols[name] = arr
            return pa.table(cols)

        return fn

    l_tagged = left.map_batches(
        _pad("l", list(l_schema.names), {}), batch_format="pyarrow"
    )
    r_tagged = right.map_batches(
        _pad("r", by + [on] + right_cols, dict(zip(right_cols, renamed))),
        batch_format="pyarrow",
    )
    both = l_tagged.union(r_tagged)
    left_cols = [n for n in l_schema.names]
    out_cols = left_cols + renamed

    l_pd_types = {
        n: t.to_pandas_dtype() for n, t in zip(l_schema.names, l_schema.types)
        if not pa.types.is_nested(t)
    }

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        l = df[df["__side"] == "l"][left_cols].copy()
        # the right rows' null padding promoted non-null left int columns
        # to float64 in the bucket frame — restore the exact left dtypes
        for n, t in l_pd_types.items():
            if l[n].dtype != t and not l[n].isna().any():
                try:
                    l[n] = l[n].astype(t, copy=False)
                except (TypeError, ValueError):
                    pass
        r = df[df["__side"] == "r"][by + [on] + renamed]
        if not len(l):
            return df.head(0)[out_cols]
        if not len(r):
            if how == "inner":
                return df.head(0)[out_cols]
            out = l.copy()
            for c in renamed:
                out[c] = np.nan
            return out
        l = l.sort_values(on, kind="mergesort")
        r = r.sort_values([on] + renamed, kind="mergesort")
        # match marker: a right row whose value columns are ALL null must
        # still count as matched under how="inner"
        r = r.assign(__m=1.0)
        merged = pd.merge_asof(
            l, r, on=on, by=by if len(by) > 1 else by[0],
            direction=direction, tolerance=tolerance,
        )
        if how == "inner":
            merged = merged.dropna(subset=["__m"])
            # restore exact right dtypes (left-merge promoted ints)
            for c, rc in zip(right_cols, renamed):
                merged[rc] = merged[rc].astype(
                    r_types[c].to_pandas_dtype(), copy=False
                )
        return merged[out_cols]

    return bucketed_group_apply(
        both, by, per_bucket, n_buckets=n_buckets, batch_format="pandas"
    )


def range_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    by: str,
    left_lo: str,
    left_hi: str,
    right_val: str,
    right_cols: list[str],
    suffix: str = "_r",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Range (interval) join: pair each left row with EVERY right row whose
    ``right_val`` falls in the left row's inclusive ``[left_lo, left_hi]``
    window, within the same ``by`` key — the windowed-attribution /
    interval-overlap operator (inner semantics; a left row with no match
    emits nothing).

    Same single tagged-union shuffle as ``asof_join``; inside each bucket
    the right side is sorted once per key and every key's matches come from
    two vectorised ``searchsorted`` calls + a repeat/arange pair expansion
    — per-bucket cost O((l + r) log r + output).  One-to-many output: rows
    multiply, so cap the window width at the caller when fan-out matters.
    """
    import numpy as np
    import pandas as pd

    from .bucketing import bucketed_group_apply

    left, right = _arrowize(left), _arrowize(right)  # pandas-block inputs
    l_schema, r_schema = left.schema(), right.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))
    renamed = [c + suffix for c in right_cols]
    clash = set(renamed) & set(l_schema.names)
    if clash:
        raise ValueError(f"suffixed right columns collide with left: {clash}")
    fields = list(zip(l_schema.names, l_schema.types)) + [
        ("__rv", r_types[right_val])
    ] + [(rc, r_types[c]) for c, rc in zip(right_cols, renamed)]
    fields.append(("__side", pa.string()))
    left_cols = list(l_schema.names)
    out_cols = left_cols + renamed

    def _pad(side: str, rename: dict[str, str]):
        def fn(t: pa.Table) -> pa.Table:
            present = {rename.get(c, c): c for c in t.column_names}
            cols = {}
            for name, typ in fields:
                if name == "__side":
                    cols[name] = pa.nulls(t.num_rows, pa.string()).fill_null(side)
                elif name in present:
                    arr = t[present[name]].combine_chunks()
                    cols[name] = arr if arr.type == typ else arr.cast(typ)
                else:
                    cols[name] = pa.nulls(t.num_rows, typ)
            return pa.table(cols)

        return fn

    r_rename = {right_val: "__rv", **dict(zip(right_cols, renamed))}
    l_tagged = left.map_batches(_pad("l", {}), batch_format="pyarrow")
    r_tagged = right.map_batches(
        _pad("r", r_rename), batch_format="pyarrow"
    )
    both = l_tagged.union(r_tagged)

    # the union's null padding promotes the other side's int columns to
    # float64 in the bucket frame — restore exact dtypes on output
    pd_types = {
        n: t.to_pandas_dtype() for n, t in zip(l_schema.names, l_schema.types)
        if not pa.types.is_nested(t)
    }
    pd_types.update(
        {
            rc: r_types[c].to_pandas_dtype()
            for c, rc in zip(right_cols, renamed)
            if not pa.types.is_nested(r_types[c])
        }
    )

    def _restore(out: "pd.DataFrame") -> "pd.DataFrame":
        for n, t in pd_types.items():
            if out[n].dtype != t and not out[n].isna().any():
                try:
                    out[n] = out[n].astype(t, copy=False)
                except (TypeError, ValueError):
                    pass
        return out

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        l = df[df["__side"] == "l"]
        r = df[df["__side"] == "r"][[by, "__rv"] + renamed]
        if not len(l) or not len(r):
            return df.head(0)[out_cols]
        r = r.sort_values([by, "__rv"] + renamed, kind="mergesort")
        r_groups = {k: g for k, g in r.groupby(by, sort=False)}
        pieces = []
        for k, lg in l.groupby(by, sort=False):
            rg = r_groups.get(k)
            if rg is None:
                continue
            vals = rg["__rv"].to_numpy()
            lo = np.searchsorted(vals, lg[left_lo].to_numpy(), side="left")
            hi = np.searchsorted(vals, lg[left_hi].to_numpy(), side="right")
            counts = hi - lo
            keep = counts > 0
            if not keep.any():
                continue
            lo, counts = lo[keep], counts[keep]
            l_idx = np.repeat(np.arange(len(lg))[keep], counts)
            offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
            r_idx = lo.repeat(counts) + (
                np.arange(counts.sum()) - offs.repeat(counts)
            )
            lhs = lg.iloc[l_idx][left_cols].reset_index(drop=True)
            rhs = rg.iloc[r_idx][renamed].reset_index(drop=True)
            pieces.append(pd.concat([lhs, rhs], axis=1))
        if not pieces:
            return df.head(0)[out_cols]
        return _restore(pd.concat(pieces, ignore_index=True))

    return bucketed_group_apply(both, [by], per_bucket, n_buckets=n_buckets,
                                batch_format="pandas")
