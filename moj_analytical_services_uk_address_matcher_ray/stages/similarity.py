"""Similarity search over an embedding column (list<float>).

Two paths:
  * ``brute_force_topk`` — the baseline: the (small) query matrix is
    broadcast once with ``ray.put`` and every batch does one numpy matmul
    against it; per-batch partial top-k results are then reduced to the
    global top-k with a single tiny groupby.  Never materialises the corpus.
  * ``ivf_topk`` — the scale path: a k-means-ish coarse quantiser (trained
    on a sample) assigns every vector to a centroid cell; queries probe only
    the ``n_probe`` nearest cells, so the matmul touches a fraction of the
    corpus.  Same output schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _normalize(V: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0] = 1.0
    return V / norms[:, None]


def _vectors(t: pa.Table, col: str, dtype=np.float32) -> np.ndarray:
    """Zero-copy-ish (n, d) matrix from a list<float> / fixed_size_list
    column: flatten the values buffer and reshape — ~30x faster than
    ``to_pylist`` on wide embedding columns.  Falls back to to_pylist for
    ragged lists (invalid as embeddings anyway)."""
    arr = t[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # zero chunks edge
        return np.asarray(t[col].to_pylist(), dtype=dtype).reshape(t.num_rows, -1)
    try:
        if pa.types.is_fixed_size_list(arr.type):
            flat = arr.values.to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(
                flat.reshape(len(arr), arr.type.list_size), dtype=dtype
            )
        offs = arr.offsets.to_numpy()
        widths = np.diff(offs)
        if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
            flat = arr.values.to_numpy(zero_copy_only=False)
            # respect a non-zero start offset from slicing
            flat = flat[offs[0] : offs[-1]]
            return np.ascontiguousarray(
                flat.reshape(len(arr), int(widths[0])), dtype=dtype
            )
    except (AttributeError, ValueError):
        pass
    return np.asarray(t[col].to_pylist(), dtype=dtype)


#: symmetric int8 scalar quantisation scale for unit-norm components
_SQ8_SCALE = 127.0


def _sq8_encode(V: np.ndarray) -> np.ndarray:
    """Unit-norm float components in [-1, 1] -> int8 codes (1 byte/dim —
    8x smaller than the float64 parquet lists the corpus ships with)."""
    return np.clip(np.rint(V * _SQ8_SCALE), -127, 127).astype(np.int8)


def _sq8_decode(codes: np.ndarray) -> np.ndarray:
    return codes.astype(np.float32) / _SQ8_SCALE


def brute_force_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    query_ids: list | None = None,
) -> pa.Table:
    """Exact cosine top-k: returns (query_id, vec_id, cosine, rank).

    Partial top-k per batch (map_batches) -> global reduce on the driver
    over ~num_batches*k rows — no shuffle, no corpus materialisation.
    """
    Q = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(Q)
    qids = query_ids if query_ids is not None else list(range(len(Q)))

    def partial(t: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        V = _normalize(_vectors(t, vec_col, dtype=np.float32))
        ids = t[id_col].to_pylist()
        sims = Qm @ V.T  # (nq, nb)
        nq, nb = sims.shape
        kk = min(k, nb)
        out_q, out_v, out_s = [], [], []
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        for qi in range(nq):
            for vi in top[qi]:
                out_q.append(qi)
                out_v.append(ids[vi])
                out_s.append(float(sims[qi, vi]))
        return pa.table(
            {
                "qi": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_v),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    parts = []
    for b in ds.map_batches(partial, batch_format="pyarrow", batch_size=4096).iter_batches(
        batch_format="pyarrow"
    ):
        parts.append(b)
    all_parts = pa.concat_tables(parts, promote_options="default")
    # global reduce (tiny: n_queries * k * n_batches rows)
    out_q, out_v, out_s, out_r = [], [], [], []
    qi_arr = all_parts["qi"].to_pylist()
    v_arr = all_parts["vec_id"].to_pylist()
    s_arr = all_parts["cosine"].to_pylist()
    by_q: dict[int, list] = {}
    for qi, v, s in zip(qi_arr, v_arr, s_arr):
        by_q.setdefault(qi, []).append((s, v))
    for qi in sorted(by_q):
        rows = sorted(by_q[qi], key=lambda x: (-x[0], str(x[1])))[:k]
        for rank, (s, v) in enumerate(rows, start=1):
            out_q.append(qids[qi])
            out_v.append(v)
            out_s.append(s)
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q),
            "vec_id": pa.array(out_v),
            "cosine": pa.array(out_s, pa.float64()),
            "rank": pa.array(out_r, pa.int32()),
        }
    )


def train_centroids(
    ds: "ray.data.Dataset",
    *,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 8,
    seed: int = 29,
) -> np.ndarray:
    """Lloyd iterations on a driver-side sample — the coarse quantiser."""
    sample = ds.limit(sample_size).take_all()
    X = _normalize(np.asarray([r[vec_col] for r in sample], dtype=np.float32))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


def first_k_centroids(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
) -> np.ndarray:
    """Deterministic SQL-expressible quantiser: the centroids are the
    normalised embeddings of the ``n_centroids`` smallest ids, float64.
    Quantiser CHOICE only affects recall, never correctness, so this mode
    lets the whole IVF path (assignment, partition pruning, probe, rank)
    be value-hash-checked against a DuckDB oracle; the k-means quantiser
    remains the recall-tuned production default."""
    rows = ds.sort(id_col).limit(n_centroids).take_all()
    return _normalize(np.asarray([r[vec_col] for r in rows], dtype=np.float64))


def build_ivf_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    quantizer: str = "kmeans",  # "kmeans" | "first_k" (oracle-exact, fp64)
    quantization: str | None = None,  # None (full floats) | "sq8" (int8 codes)
) -> np.ndarray:
    """Materialise the corpus PARTITIONED BY CENTROID CELL (hive layout,
    one directory per cell) — the IO half of an IVF index: a probe then
    reads only its ``n_probe`` cell directories, so scan bytes scale with
    n_probe/n_centroids instead of corpus size.  Returns the centroids
    (also persisted to ``<index_dir>/centroids.npy``).

    ``quantization="sq8"`` stores symmetric int8 codes of the unit-norm
    vectors instead of the float lists (1 byte/dim vs 8): probe bytes drop
    ~8x again on top of cell pruning, at an approximate-score cost bounded
    by the quantisation step (recall-tested).  Cell assignment always uses
    full-precision floats."""
    import json
    import os

    if quantizer == "first_k":
        C = first_k_centroids(
            ds, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids
        )
    else:
        C = train_centroids(ds, vec_col=vec_col, n_centroids=n_centroids)
    c_ref = ray.put(C)
    dt = np.float64 if quantizer == "first_k" else np.float32

    def assign(t: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        V = _normalize(_vectors(t, vec_col, dtype=dt))
        # argmax takes the LOWEST cell index on ties — the oracle orders
        # by (similarity DESC, cell ASC)
        cells = np.argmax(V @ Cm.T, axis=1).astype(np.int32)
        if quantization == "sq8":
            codes = _sq8_encode(V)
            d = codes.shape[1]
            sq8 = pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.int8()), d
            )
            return pa.table(
                {
                    id_col: t[id_col],
                    "embedding_sq8": sq8,
                    "cell": pa.array(cells, pa.int32()),
                }
            )
        return t.append_column("cell", pa.array(cells, pa.int32()))

    # cluster rows by cell BEFORE the hive write: the writer emits one file
    # per (block x cell), so unclustered input produces num_blocks x
    # n_centroids tiny files whose parquet footers dominate both index
    # bytes and probe IO (measured: 3000 rows -> 1382 files, 1.9 MB of
    # which ~1.7 MB was footer).  Repartition to a size-derived block
    # count, then range-sort by cell: ~num_cells + num_blocks files total.
    in_bytes = ds.size_bytes() or 0
    target = int(max(n_centroids, min(512, max(1, in_bytes // (64 << 20)))))
    assigned = (
        ds.map_batches(assign, batch_format="pyarrow")
        .repartition(target)
        .sort("cell")
    )
    assigned.write_parquet(index_dir, partition_cols=["cell"])
    np.save(os.path.join(index_dir, "centroids.npy"), C)
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump({"quantization": quantization, "id_col": id_col}, fh)
    with open(os.path.join(index_dir, "_INDEX_DONE"), "w") as fh:
        fh.write("ok")
    return C


def _dir_bytes(path: str) -> int:
    import os

    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def ivf_topk_indexed(
    index_dir: str,
    queries: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
    query_ids: list | None = None,
    precise: bool = False,  # fp64 math, matches the DuckDB double oracle
) -> tuple[pa.Table, dict]:
    """Probe a persisted IVF index: reads ONLY the probed cell partitions.
    Returns (top-k table, io_stats) where io_stats reports the probed vs
    total index bytes — the partition-pruning evidence.  A ``sq8``-quantised
    index (see ``build_ivf_index``) is detected from ``meta.json``: codes
    are decoded per batch and scores are approximate within the
    quantisation step."""
    import json
    import os

    import ray.data as rd

    C = np.load(os.path.join(index_dir, "centroids.npy"))
    quantization = None
    meta_path = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            quantization = json.load(fh).get("quantization")
    read_col = "embedding_sq8" if quantization == "sq8" else vec_col
    _dt = np.float64 if precise else np.float32
    Q = _normalize(np.asarray(queries, dtype=_dt))
    # stable: ties pick the LOWEST cell index (oracle: similarity DESC, cell ASC)
    probe_cells = np.argsort(-(Q @ C.T), axis=1, kind="stable")[:, :n_probe]
    qids = query_ids if query_ids is not None else list(range(len(Q)))
    needed = sorted({int(c) for row in probe_cells for c in row})
    cell_dirs = [
        os.path.join(index_dir, f"cell={c}")
        for c in needed
        if os.path.isdir(os.path.join(index_dir, f"cell={c}"))
    ]
    io_stats = {
        "probed_cells": len(cell_dirs),
        "total_cells": len(
            [d for d in os.listdir(index_dir) if d.startswith("cell=")]
        ),
        "probed_bytes": sum(_dir_bytes(d) for d in cell_dirs),
        "total_bytes": sum(
            _dir_bytes(os.path.join(index_dir, d))
            for d in os.listdir(index_dir)
            if d.startswith("cell=")
        ),
    }
    if not cell_dirs:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int32()),
            }
        )
        return empty, io_stats
    # one dataset per probed cell dir, tagged with its cell id (reading a
    # partition SUBDIR does not restore the hive column on all paths)
    per_cell = []
    for c, d in zip(needed, cell_dirs):
        sub = rd.read_parquet(d, columns=[id_col, read_col])
        per_cell.append(
            sub.map_batches(
                lambda t, cc=c: t.append_column(
                    "cell", pa.array([cc] * t.num_rows, pa.int32())
                ),
                batch_format="pyarrow",
            )
        )
    ds = per_cell[0]
    for other in per_cell[1:]:
        ds = ds.union(other)
    probe_ref = ray.put((Q, probe_cells))

    def partial(t: pa.Table) -> pa.Table:
        Qm, probes = ray.get(probe_ref)
        if quantization == "sq8":
            V = _normalize(_sq8_decode(_vectors(t, read_col, dtype=np.int8)))
        else:
            V = _normalize(_vectors(t, read_col, dtype=_dt))
        ids = t[id_col].to_pylist()
        cells = np.asarray(t["cell"].to_pylist(), dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(Qm)):
            mask = np.isin(cells, probes[qi])
            if not mask.any():
                continue
            sims = Qm[qi] @ V[mask].T
            sub_ids = [ids[i] for i in np.where(mask)[0]]
            kk = min(k, len(sub_ids))
            top = (
                np.argpartition(-sims, kk - 1)[:kk]
                if kk < len(sub_ids)
                else np.arange(len(sub_ids))
            )
            for vi in top:
                out_q.append(qi)
                out_v.append(sub_ids[vi])
                out_s.append(float(sims[vi]))
        return pa.table(
            {
                "qi": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_v),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    parts = [
        b
        for b in ds.map_batches(
            partial, batch_format="pyarrow", batch_size=4096
        ).iter_batches(batch_format="pyarrow")
    ]
    allp = pa.concat_tables(parts, promote_options="default")
    by_q: dict[int, list] = {}
    for qi, v, s in zip(
        allp["qi"].to_pylist(), allp["vec_id"].to_pylist(), allp["cosine"].to_pylist()
    ):
        by_q.setdefault(qi, []).append((s, v))
    out_q, out_v, out_s, out_r = [], [], [], []
    for qi in sorted(by_q):
        rows = sorted(by_q[qi], key=lambda x: (-x[0], str(x[1])))[:k]
        for rank, (s, v) in enumerate(rows, start=1):
            out_q.append(qids[qi])
            out_v.append(v)
            out_s.append(s)
            out_r.append(rank)
    return (
        pa.table(
            {
                "query_id": pa.array(out_q),
                "vec_id": pa.array(out_v),
                "cosine": pa.array(out_s, pa.float64()),
                "rank": pa.array(out_r, pa.int32()),
            }
        ),
        io_stats,
    )


def ivf_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    query_ids: list | None = None,
) -> pa.Table:
    """IVF approximate top-k: only batch rows assigned to one of the query's
    ``n_probe`` nearest cells enter the matmul.  Output schema matches
    ``brute_force_topk`` (plus approximate recall semantics)."""
    C = train_centroids(ds, vec_col=vec_col, n_centroids=n_centroids)
    Q = _normalize(np.asarray(queries, dtype=np.float32))
    # stable: ties pick the LOWEST cell index (oracle: similarity DESC, cell ASC)
    probe_cells = np.argsort(-(Q @ C.T), axis=1, kind="stable")[:, :n_probe]  # (nq, n_probe)
    c_ref = ray.put((C, Q, probe_cells))
    qids = query_ids if query_ids is not None else list(range(len(Q)))

    def partial(t: pa.Table) -> pa.Table:
        Cm, Qm, probes = ray.get(c_ref)
        V = _normalize(_vectors(t, vec_col, dtype=np.float32))
        ids = t[id_col].to_pylist()
        cells = np.argmax(V @ Cm.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(Qm)):
            mask = np.isin(cells, probes[qi])
            if not mask.any():
                continue
            sims = Qm[qi] @ V[mask].T
            sub_ids = [ids[i] for i in np.where(mask)[0]]
            kk = min(k, len(sub_ids))
            top = np.argpartition(-sims, kk - 1)[:kk] if kk < len(sub_ids) else np.arange(len(sub_ids))
            for vi in top:
                out_q.append(qi)
                out_v.append(sub_ids[vi])
                out_s.append(float(sims[vi]))
        return pa.table(
            {
                "qi": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_v),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    parts = [
        b
        for b in ds.map_batches(partial, batch_format="pyarrow", batch_size=4096).iter_batches(
            batch_format="pyarrow"
        )
    ]
    allp = pa.concat_tables(parts, promote_options="default")
    by_q: dict[int, list] = {}
    for qi, v, s in zip(
        allp["qi"].to_pylist(), allp["vec_id"].to_pylist(), allp["cosine"].to_pylist()
    ):
        by_q.setdefault(qi, []).append((s, v))
    out_q, out_v, out_s, out_r = [], [], [], []
    for qi in sorted(by_q):
        rows = sorted(by_q[qi], key=lambda x: (-x[0], str(x[1])))[:k]
        for rank, (s, v) in enumerate(rows, start=1):
            out_q.append(qids[qi])
            out_v.append(v)
            out_s.append(s)
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q),
            "vec_id": pa.array(out_v),
            "cosine": pa.array(out_s, pa.float64()),
            "rank": pa.array(out_r, pa.int32()),
        }
    )


def group_centroids(
    ds: "ray.data.Dataset",
    *,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> pa.Table:
    """Per-group embedding centroids (the class-prototype / cluster-summary
    aggregate): mean vector per ``group_col`` value.

    One partial-aggregate pass — each batch reduces to (group, count,
    per-dimension float64 sums) via a single ``np.add.at`` scatter; the
    driver combine is O(groups x dim), never O(rows).  Assumes the GROUP
    cardinality is broadcast-small (class labels, sources, clusters-of-
    interest), which is what a centroid table is for; the corpus itself
    streams.  Returns an exploded Arrow table ``(group, dim, centroid, n)``
    with 1-based dims (the SQL ``generate_subscripts`` convention)."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        V = _vectors(t, vec_col, dtype=np.float64)
        g = t[group_col]
        g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        codes = g.dictionary_encode()
        idx = np.asarray(codes.indices, dtype=np.int64)
        ngroups = len(codes.dictionary)
        sums = np.zeros((ngroups, V.shape[1]), dtype=np.float64)
        np.add.at(sums, idx, V)
        counts = np.bincount(idx, minlength=ngroups).astype(np.int64)
        return pa.table(
            {
                "g": codes.dictionary.cast(pa.string()),
                "n": pa.array(counts, pa.int64()),
                "s": pa.array(list(sums), pa.list_(pa.float64())),
            }
        )

    parts = ray.get(
        ds.map_batches(partial, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    tbls = [p for p in parts if p.num_rows > 0]
    if not tbls:
        return pa.table(
            {
                "group": pa.array([], pa.string()),
                "dim": pa.array([], pa.int64()),
                "centroid": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            }
        )
    allp = pa.concat_tables(tbls, promote_options="default")
    groups = allp["g"].to_pylist()
    ns = np.asarray(allp["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
    sums_l = allp["s"].to_pylist()
    agg: dict = {}
    for g_, n_, s_ in zip(groups, ns, sums_l):
        cur = agg.get(g_)
        if cur is None:
            agg[g_] = [int(n_), np.asarray(s_, dtype=np.float64)]
        else:
            cur[0] += int(n_)
            cur[1] = cur[1] + np.asarray(s_, dtype=np.float64)
    out_g, out_d, out_c, out_n = [], [], [], []
    for g_ in sorted(agg):
        n_, s_ = agg[g_]
        c = s_ / n_
        dim = len(s_)
        out_g.extend([g_] * dim)
        out_d.extend(range(1, dim + 1))
        out_c.extend(c.tolist())
        out_n.extend([n_] * dim)
    return pa.table(
        {
            "group": pa.array(out_g, pa.string()),
            "dim": pa.array(out_d, pa.int64()),
            "centroid": pa.array(out_c, pa.float64()),
            "n": pa.array(out_n, pa.int64()),
        }
    )
