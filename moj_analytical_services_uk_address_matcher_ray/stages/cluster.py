"""Distributed connected components over an edge Dataset.

The north rule extends the reference's best-match-per-record selection with
transitive clustering: scored pairs above threshold are edges, and entity
clusters are the connected components.  Two paths:

* below ``driver_threshold`` mirrored edges, an exact vectorised driver
  solve (factorize + scatter-min + pointer jumping) — seconds, no shuffles;
* above it, alternating LARGE-STAR / SMALL-STAR rounds (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14 — same MapReduce
  lineage as Hash-to-Min (Rastogi et al., ICDE'13, see PAPERS.md) but with
  BOUNDED fan-in): per node v with m = min(N(v) ∪ {v}), large-star links
  every larger neighbour to m, small-star links every smaller neighbour
  (and v) to m.  Converges in O(log² n) rounds; at the fixpoint every edge
  is (member, component-min).

The round's group min is NEVER computed by co-locating a neighbourhood:
per-batch partial aggregates combine into a tiny (key, min, degree) table,
and the min is attached back to edge rows with a salted bucketed merge
whose per-key salt width scales with degree (``STAR_TARGET_GROUP_ROWS``) —
so a 10⁹-edge component's min node costs ~degree/4096 rows per task, not
one task holding the whole component (Hash-to-Min's mega-star failure).
Convergence is detected with an order-independent 64-bit checksum of the
canonicalised edge rows (one cheap aggregate pass per round).

Node ids are strings; the component label is the lexicographic MIN node id —
deterministic, retry-safe.
"""

from __future__ import annotations


import pyarrow as pa
import ray


def _checksum(ds: "ray.data.Dataset", cols: tuple[str, str]) -> int:
    """Order-independent checksum: sum of 64-bit hashes of row tuples,
    vectorised (pandas C siphash over the joined key strings — the per-row
    blake2b loop this replaces cost O(rows) interpreter work per CC round)."""

    def part(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd
        import pyarrow.compute as pc

        joined = pc.binary_join_element_wise(t[cols[0]], t[cols[1]], "\x00")
        h = pd.util.hash_array(
            joined.combine_chunks().to_numpy(zero_copy_only=False),
            categorize=False,
        )
        # exact (non-wrapping) batch sum via 32-bit halves, so the checksum
        # is independent of how rows are split into batches
        lo = int((h & np.uint64(0xFFFFFFFF)).sum(dtype=np.uint64))
        hi = int((h >> np.uint64(32)).sum(dtype=np.uint64))
        total = (lo + (hi << 32)) % (1 << 63)
        return pa.table({"c": pa.array([total], pa.int64())})

    partials = ds.map_batches(part, batch_format="pyarrow")
    return sum(
        v
        for b in partials.iter_batches(batch_format="pyarrow")
        for v in b["c"].to_pylist()
    ) % (1 << 63)


#: a star-merge group (one (key, salt) sub-bucket) is kept near this many
#: rows: keys whose degree exceeds it are salted over ceil(degree / TARGET)
#: sub-keys (the group min is attached via a pre-combined aggregate + a
#: salted merge, never by co-locating the whole neighbourhood — the
#: Hash-to-Min mega-star fix).  Cold keys (the overwhelming majority) pay
#: nothing: one min row, salt 0.
STAR_TARGET_GROUP_ROWS = 8_192
#: cap on per-key salt width so the driver-side hot-key map stays bounded;
#: a degree beyond TARGET * MAX (~33M rows) still lands ≤ degree/MAX
#: (~degree/4096) rows per task.
STAR_MAX_SALT = 4_096


def _sever(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Re-root a materialized Dataset from its block refs.  ``materialize()``
    keeps the full logical plan; in an iterative loop the retained plans
    compound per-execution driver overhead ~3× PER ROUND (measured: constant
    39-row rounds grew 3.5s → 100s by round 5; severed, they hold at 0.9s).
    ``from_arrow_refs`` starts a fresh plan while the blocks themselves stay
    in plasma — no driver collect, scale-safe."""
    return ray.data.from_arrow_refs(ds.to_arrow_refs())


def _coalesce_blocks(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Bound the block count of a materialized Dataset (every sort-based
    groupby spawns one reduce task per input block AND emits roughly one
    block per input block, so the star rounds' shuffle-heavy loop compounds
    block counts ×4 per round unless re-coalesced), then sever its plan
    (see ``_sever``)."""
    from .bucketing import default_buckets

    tgt = max(default_buckets(), int((ds.size_bytes() or 0) // (64 << 20)))
    if ds.num_blocks() > 2 * tgt:
        ds = ds.repartition(tgt).materialize()
    return _sever(ds)


def _group_min_table(
    adj: "ray.data.Dataset", key: str, val: str, n_buckets: int | None = None
) -> "ray.data.Dataset":
    """(key, m, cnt) with m = min(val ∪ {key}) and cnt = group row count per
    key — per-batch partial aggregates (bounded fan-in for any degree), then
    a BUCKETED combine: Ray's own string-keyed sort-groupby measured 146s on
    a 20M-row view where the equivalent int32-bucket shuffle + in-task
    pandas groupby runs in seconds."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .bucketing import bucketed_group_apply

    def _agg(t: pa.Table) -> pa.Table:
        """(k, m, cnt) → per-key (k, min m, sum cnt), Arrow-vectorised for
        the unique-in-batch majority (no groupby at all), pandas groupby
        only over the duplicated minority."""
        k_arr = t[key].combine_chunks()
        m_arr = t["m"].combine_chunks()
        c_arr = t["cnt"].combine_chunks()
        dup = (
            pd.Series(k_arr.to_numpy(zero_copy_only=False))
            .duplicated(keep=False)
            .to_numpy()
        )
        if not dup.any():
            return pa.table({key: k_arr, "m": m_arr, "cnt": c_arr})
        mask = pa.array(dup)
        uniq = pa.table({key: k_arr, "m": m_arr, "cnt": c_arr}).filter(
            pc.invert(mask)
        )
        d = (
            pa.table({key: k_arr, "m": m_arr, "cnt": c_arr})
            .filter(mask)
            .to_pandas()
            .groupby(key, sort=False)
            .agg(m=("m", "min"), cnt=("cnt", "sum"))
        )
        dt = pa.table(
            {
                key: pa.array(d.index.to_numpy(dtype=object), pa.string()),
                "m": pa.array(d["m"].to_numpy(dtype=object), pa.string()),
                "cnt": pa.array(d["cnt"].to_numpy(), pa.int64()),
            }
        )
        return pa.concat_tables([uniq, dt])

    def partial(t: pa.Table) -> pa.Table:
        k_arr = t[key].combine_chunks()
        return _agg(
            pa.table(
                {
                    key: k_arr,
                    # min(val, key itself) element-wise — Arrow C kernel
                    "m": pc.min_element_wise(t[val].combine_chunks(), k_arr),
                    "cnt": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
        )

    return bucketed_group_apply(
        adj.map_batches(partial, batch_format="pyarrow"),
        [key],
        _agg,
        n_buckets=n_buckets,
    )


def _star_round(
    adj: "ray.data.Dataset", *, large: bool, n_buckets: int | None = None
) -> "ray.data.Dataset":
    """One large-star (large=True) or small-star round (Kiveris et al.,
    "Connected Components in MapReduce and Beyond" — the bounded-fan-in fix
    for Hash-to-Min's mega-star): per node v with m = min(N(v) ∪ {v}),
    large-star links every LARGER neighbour to m, small-star links every
    smaller-or-equal neighbour (and v itself) to m.

    The group min is attached to each edge row with a bucketed merge against
    the pre-combined min table; keys whose degree exceeds
    STAR_TARGET_GROUP_ROWS are salted over ceil(degree / TARGET) sub-keys
    (min row replicated per salt), so no task ever co-locates a whole
    neighbourhood: max task rows ≈ TARGET (capped by STAR_MAX_SALT) + the
    uniform bucket share.  The hot-key width map is a driver collect bounded
    by total_rows / TARGET entries — the same hot-key pattern as
    stages/blocking.py's salted blocks."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .bucketing import BUCKET_COL, add_bucket_column, default_buckets
    from ..state.metrics import gauge_max_metric

    if large:
        # both directions so every node sees its full neighbourhood
        view = adj.map_batches(
            lambda t: pa.table(
                {
                    "k": pa.concat_arrays(
                        [t["node"].combine_chunks(), t["nbr"].combine_chunks()]
                    ),
                    "w": pa.concat_arrays(
                        [t["nbr"].combine_chunks(), t["node"].combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    else:
        # small-star keys every edge on its LARGER endpoint
        def rekey(t: pa.Table) -> pa.Table:
            a = t["node"].combine_chunks().to_numpy(zero_copy_only=False)
            b = t["nbr"].combine_chunks().to_numpy(zero_copy_only=False)
            hi = np.where(a > b, a, b)
            lo = np.where(a > b, b, a)
            return pa.table(
                {"k": pa.array(hi, pa.string()), "w": pa.array(lo, pa.string())}
            )

        view = adj.map_batches(rekey, batch_format="pyarrow")
    import os
    import time as _time

    _dbg = bool(os.environ.get("UAM_CC_DEBUG"))
    _t0 = _time.perf_counter()
    # materialize: the view feeds BOTH the min aggregate and the tagged
    # merge — lazy Datasets re-execute their whole upstream DAG per
    # consumer, which compounds across rounds (measured: the round loop
    # re-ran every prior round's shuffles once per consumer)
    view = _coalesce_blocks(view.materialize())
    _t1 = _time.perf_counter()
    mins = _coalesce_blocks(
        _group_min_table(view, "k", "w", n_buckets=n_buckets).materialize()
    )
    _t2 = _time.perf_counter()
    # hot-key salt widths: a tiny driver collect (≤ total_rows / TARGET
    # entries; empty on all but skewed graphs)
    hot = mins.map_batches(
        lambda t: t.filter(
            pc.greater(t["cnt"], STAR_TARGET_GROUP_ROWS)
        ).select(["k", "cnt"]),
        batch_format="pyarrow",
    ).take_all()
    if _dbg:
        print(
            f"    star(large={large}): view {_t1 - _t0:.1f}s "
            f"(blocks={view.num_blocks()}) mins {_t2 - _t1:.1f}s "
            f"(blocks={mins.num_blocks()}) hot {_time.perf_counter() - _t2:.1f}s",
            flush=True,
        )
    width_map = {
        r["k"]: int(min(STAR_MAX_SALT, -(-r["cnt"] // STAR_TARGET_GROUP_ROWS)))
        for r in hot
    }
    width_ref = ray.put(width_map)
    nb = n_buckets or default_buckets()

    def _widths(k_np: "np.ndarray", wmap: dict) -> "np.ndarray":
        if not wmap:
            return np.ones(len(k_np), dtype=np.uint64)
        return (
            pd.Series(k_np).map(wmap).fillna(1).astype(np.uint64).to_numpy()
        )

    def _with_salt(
        k_arr: pa.Array, w_arr: pa.Array, salt: "np.ndarray", is_min: bool
    ) -> pa.Table:
        out = pa.table(
            {
                "k": k_arr,
                "w": w_arr,
                "__salt": pa.array(salt.astype(np.int32), pa.int32()),
            }
        ).append_column(
            "__sk",
            pc.binary_join_element_wise(
                k_arr, pa.array(salt.astype("U"), pa.string()), "\x1f"
            ),
        )
        out = add_bucket_column(out, ["__sk"], nb)
        return out.drop_columns(["__sk"]).append_column(
            "__is_min",
            pa.array(np.full(out.num_rows, is_min, dtype=bool)),
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        wmap = ray.get(width_ref)
        k_np = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        widths = _widths(k_np, wmap)
        salt = (
            pd.util.hash_array(
                t["w"].combine_chunks().to_numpy(zero_copy_only=False),
                categorize=False,
            )
            % widths
        )
        return _with_salt(
            t["k"].combine_chunks(), t["w"].combine_chunks(), salt, False
        )

    def tag_mins(t: pa.Table) -> pa.Table:
        wmap = ray.get(width_ref)
        k_np = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        m_np = t["m"].combine_chunks().to_numpy(zero_copy_only=False)
        widths = _widths(k_np, wmap).astype(np.int64)
        rep_k = np.repeat(k_np, widths)
        rep_m = np.repeat(m_np, widths)
        ends = np.cumsum(widths)
        salts = np.arange(int(ends[-1]) if len(ends) else 0) - np.repeat(
            ends - widths, widths
        )
        return _with_salt(
            pa.array(rep_k, pa.string()), pa.array(rep_m, pa.string()), salts, True
        )

    tagged = view.map_batches(tag_edges, batch_format="pyarrow").union(
        mins.map_batches(
            lambda t: tag_mins(t.drop_columns(["cnt"])),
            batch_format="pyarrow",
        )
    )

    def merge_emit(g: pa.Table) -> pa.Table:
        gauge_max_metric("cc.max_star_bucket_rows", g.num_rows)
        df = g.drop_columns([BUCKET_COL]).to_pandas()
        is_min = df["__is_min"].to_numpy()
        # exact dedup of this round's (k, w) view rows: every copy of a
        # given (k, w) carries the same salt, so co-location is guaranteed
        edges = df[~is_min].drop_duplicates(["k", "w"])
        if len(edges):
            # the fan-in bound the star/salt design guarantees: rows per
            # (key, salt) sub-group ≈ STAR_TARGET_GROUP_ROWS regardless of
            # degree (Hash-to-Min put the whole component here)
            gauge_max_metric(
                "cc.max_star_group_rows",
                int(edges.groupby(["k", "__salt"], sort=False).size().max()),
            )
        mrows = df[is_min].drop_duplicates("k").rename(columns={"w": "m"})
        if len(edges) == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "nbr": pa.array([], pa.string()),
                }
            )
        j = edges.merge(mrows[["k", "m"]], on="k", how="left")
        if j["m"].isna().any():
            raise ValueError(
                "star merge: missing group-min row for a (key, salt) sub-bucket"
            )
        # min(group-min-of-w, k itself)
        m = np.minimum(j["m"].to_numpy(dtype=object), j["k"].to_numpy(dtype=object))
        k = j["k"].to_numpy(dtype=object)
        w = j["w"].to_numpy(dtype=object)
        if large:
            keep = w > k
            out = pd.DataFrame({"node": w[keep], "nbr": m[keep]})
        else:
            out = pd.concat(
                [
                    pd.DataFrame({"node": w, "nbr": m}),
                    pd.DataFrame({"node": k, "nbr": m}).drop_duplicates(),
                ],
                ignore_index=True,
            )
        out = out[out["node"] != out["nbr"]].drop_duplicates()
        return pa.table(
            {
                "node": pa.array(out["node"].tolist(), pa.string()),
                "nbr": pa.array(out["nbr"].tolist(), pa.string()),
            }
        )

    return tagged.groupby(BUCKET_COL).map_groups(merge_emit, batch_format="pyarrow")


def _canonicalise_edges(
    adj: "ray.data.Dataset", n_buckets: int | None = None
) -> "ray.data.Dataset":
    """Exact global dedup of undirected edges: canonical (hi, lo) rows,
    bucketed on both columns (same-key rows co-locate, so the per-bucket
    drop_duplicates is exact)."""
    import numpy as np

    from .bucketing import bucketed_group_apply

    def canon(t: pa.Table) -> pa.Table:
        a = t["node"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["nbr"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = np.where(a > b, a, b)
        lo = np.where(a > b, b, a)
        return pa.table(
            {"node": pa.array(hi, pa.string()), "nbr": pa.array(lo, pa.string())}
        )

    def dedupe(g: pa.Table) -> pa.Table:
        import pandas as pd

        return pa.Table.from_pandas(
            g.to_pandas().drop_duplicates(), preserve_index=False
        ).replace_schema_metadata(None)

    return bucketed_group_apply(
        adj.map_batches(canon, batch_format="pyarrow"),
        ["node", "nbr"],
        dedupe,
        n_buckets=n_buckets,
    )


def connected_components(
    edges: "ray.data.Dataset",
    *,
    nodes: "ray.data.Dataset | None" = None,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    num_partitions: int = 32,  # kept for API compat; groupby sizes itself
    driver_threshold: int = 30_000_000,
    driver_threshold_bytes: int = 4_000_000_000,
    star_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Compute components of the undirected graph given by ``edges``.

    Returns a Dataset ``(node, cluster_id)`` where ``cluster_id`` is the min
    node id of the component.  ``nodes`` optionally supplies isolated nodes
    (a single-column Dataset named ``node``) so singletons appear too.

    When the (mirrored) edge set is provably small (< ``driver_threshold``
    rows — two string columns; 30M rows is ~2GB of ids, comfortably
    driver-sized, and the vectorised solver labels it in seconds where the
    distributed loop pays several shuffle rounds) the components are solved
    exactly on the driver: identical output, none of the per-round shuffle
    overhead.  Above the threshold the distributed Hash-to-Min loop runs —
    that is the 10^12-scale path.
    """

    def mirror(t: pa.Table) -> pa.Table:
        a = pa.concat_arrays(
            [t[src].combine_chunks().cast(pa.string()), t[dst].combine_chunks().cast(pa.string())]
        )
        b = pa.concat_arrays(
            [t[dst].combine_chunks().cast(pa.string()), t[src].combine_chunks().cast(pa.string())]
        )
        return pa.table({"node": a, "nbr": b})

    adj = edges.map_batches(mirror, batch_format="pyarrow")
    if nodes is not None:
        adj = adj.union(
            nodes.map_batches(
                lambda t: pa.table(
                    {
                        "node": t["node"].combine_chunks().cast(pa.string()),
                        "nbr": t["node"].combine_chunks().cast(pa.string()),
                    }
                ),
                batch_format="pyarrow",
            )
        )
    import time as _time

    from ..state.metrics import inc_metric as _inc

    _t0 = _time.perf_counter()
    adj = adj.materialize()
    n_adj = adj.count()
    _inc("cc.adj_materialize_sec", _time.perf_counter() - _t0)
    if n_adj == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "cluster_id": pa.array([], pa.string()),
                }
            )
        )

    # Gate on BYTES as well as rows: the thing the driver must hold is the
    # id byte volume, and row count is a poor proxy (the same lesson as the
    # payload-route cliff — a 4.32M-file corpus produced 30.3M adjacency
    # rows, a hair over the row threshold, and paid 91 s of star rounds for
    # a ~2 GB table the vectorised driver solver labels in seconds).  4 GB
    # of ids is comfortably driver-sized on any node this engine targets;
    # the distributed star loop remains the 10^9+-edge path.
    # (``driver_threshold=0`` stays the explicit force-distributed hatch)
    adj_bytes = adj.size_bytes() or 0
    if n_adj < driver_threshold or (
        driver_threshold > 0 and 0 < adj_bytes <= driver_threshold_bytes
    ):
        # exact driver-side components, fully vectorised: factorize the node
        # ids to int codes (pandas C hashing), rank them lexicographically so
        # "min label" keeps the string-min cluster-id semantics, then iterate
        # scatter-min over the edge arrays with pointer-jumping compression —
        # O(E) C-speed work per round, O(log n) rounds.  (The previous
        # per-edge Python union-find was ~10s of driver-serial time at 1.7M
        # edges — a constant Amdahl term at every parallelism level.)
        _t0 = _time.perf_counter()
        res = _vectorised_cc(adj)
        _inc("cc.driver_solve_sec", _time.perf_counter() - _t0)
        return ray.data.from_arrow(res)

    # distributed path: alternating LARGE-STAR / SMALL-STAR rounds
    # (Kiveris et al. — same MapReduce-CC lineage as Hash-to-Min, minus its
    # mega-star: the min node of a 10^9-edge component never receives the
    # whole component in one task, because group mins are pre-combined
    # aggregates and the merge is salted; see _star_round).  Each round:
    # large-star, small-star, canonical exact dedup, checksum fixpoint.
    # Self-loop (node, node) rows from the `nodes` union are filtered here
    # and singletons re-added at labelling time via the label min itself.
    prev = None
    for _ in range(max_rounds):
        adj = _star_round(adj, large=True, n_buckets=star_buckets)
        adj = _star_round(adj, large=False, n_buckets=star_buckets)
        adj = _coalesce_blocks(
            _canonicalise_edges(adj, n_buckets=star_buckets).materialize()
        )
        cur = _checksum(adj, ("node", "nbr"))
        if cur == prev:
            break
        prev = cur

    # at the fixpoint every edge is (member, component-min); label both
    # endpoints (the min labels itself), then union isolated nodes back in
    both = adj.map_batches(
        lambda t: pa.table(
            {
                "node": pa.concat_arrays(
                    [t["node"].combine_chunks(), t["nbr"].combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [t["nbr"].combine_chunks(), t["nbr"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    if nodes is not None:
        both = both.union(
            nodes.map_batches(
                lambda t: pa.table(
                    {
                        "node": t["node"].combine_chunks().cast(pa.string()),
                        "nbr": t["node"].combine_chunks().cast(pa.string()),
                    }
                ),
                batch_format="pyarrow",
            )
        )
    from .bucketing import bucketed_group_apply

    def _min_per_node(t: pa.Table, out_col: str) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        k_arr = t["node"].combine_chunks()
        m_arr = pc.min_element_wise(t["nbr"].combine_chunks(), k_arr)
        dup = (
            pd.Series(k_arr.to_numpy(zero_copy_only=False))
            .duplicated(keep=False)
            .to_numpy()
        )
        base = pa.table({"node": k_arr, out_col: m_arr})
        if not dup.any():
            return base
        mask = pa.array(dup)
        uniq = base.filter(pc.invert(mask))
        d = (
            base.filter(mask)
            .to_pandas()
            .groupby("node", sort=False)[out_col]
            .min()
        )
        dt = pa.table(
            {
                "node": pa.array(d.index.to_numpy(dtype=object), pa.string()),
                out_col: pa.array(d.to_numpy(dtype=object), pa.string()),
            }
        )
        return pa.concat_tables([uniq, dt])

    # bucketed, not ray groupby: string-keyed sort-groupby measured 20x the
    # int32-bucket shuffle at 20M rows (see _group_min_table); per-batch
    # partial mins shrink the shuffle to ~one row per (batch, node)
    both = both.map_batches(
        lambda t: _min_per_node(t, "nbr"), batch_format="pyarrow"
    )
    return bucketed_group_apply(
        both,
        ["node"],
        lambda g: _min_per_node(g, "cluster_id"),
        n_buckets=star_buckets,
    )


#: switch the driver CC's contiguous id concat to large_string above this
#: (Arrow's 2^31 string-offset ceiling, minus headroom); module-level so
#: tests can lower it to exercise the branch without 2 GiB of ids
_LARGE_STRING_BYTES = (1 << 31) - (1 << 20)


def _vectorised_cc(adj: "ray.data.Dataset") -> pa.Table:
    """Exact components of a mirrored adjacency Dataset, driver-side but
    vectorised end to end.  Returns (node, cluster_id) with cluster_id = the
    component's lexicographically smallest node id (identical semantics to
    ``connected_components_local`` and the distributed Hash-to-Min path)."""
    import numpy as np
    import pyarrow.compute as pc

    blocks = [b for b in ray.get(adj.to_arrow_refs()) if b.num_rows]
    tbl = pa.concat_tables(blocks)
    # factorize WITHOUT Python objects: dictionary-encode one CONTIGUOUS
    # Arrow array (contiguous is the fast path — 0.75 s vs 6.8 s chunked
    # vs 3.0 s via object-array pandas factorize at 9.5M values)
    n_edges = len(tbl["node"])
    chunks = list(tbl["node"].chunks) + list(tbl["nbr"].chunks)
    total_bytes = sum(
        c.nbytes for c in chunks
    )
    if total_bytes >= _LARGE_STRING_BYTES:
        # 2^31 string-offset ceiling: one contiguous pa.string() array
        # cannot hold > 2 GiB of character data (hit at ~30M mirrored
        # edges of ~35-byte ids) — concat as large_string instead; the
        # dictionary_encode fast path works on either offset width
        chunks = [c.cast(pa.large_string()) for c in chunks]
    enc = pa.concat_arrays(chunks).dictionary_encode()
    uniques = enc.dictionary
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    n = len(uniques)
    # rank nodes lexicographically: min RANK == min STRING id
    order = pc.sort_indices(uniques).to_numpy().astype(np.int64, copy=False)
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    e1 = rank[codes[:n_edges]]
    e2 = rank[codes[n_edges:]]
    labels = np.arange(n, dtype=np.int64)
    while True:
        before = labels.copy()
        m = np.minimum(labels[e1], labels[e2])
        np.minimum.at(labels, e1, m)
        np.minimum.at(labels, e2, m)
        while True:  # pointer jumping: compress label chains
            jumped = labels[labels]
            if np.array_equal(jumped, labels):
                break
            labels = jumped
        if np.array_equal(labels, before):
            break
    sorted_ids = pc.take(uniques, pa.array(order))  # string id of each rank
    return pa.table(
        {
            "node": sorted_ids,
            "cluster_id": pc.take(sorted_ids, pa.array(labels)),
        }
    )


def connected_components_local(edge_list: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side union-find for provably-small edge sets (tests/oracles)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in list(parent)}
