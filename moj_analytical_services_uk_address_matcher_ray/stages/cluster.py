"""Iterative hash-to-min connected components over an edge Dataset.

The north rule extends the reference's best-match-per-record selection with
transitive clustering: scored pairs above threshold are edges, and entity
clusters are the connected components.  Implemented as the Hash-to-Min
map-reduce CC algorithm (Rastogi et al., ICDE'13 — see PAPERS.md): the
graph's adjacency is a Dataset of (node, nbr) rows, and each round is ONE
``groupby(node).map_groups``:

    m = min(nbrs ∪ {node})
    emit (m, v)  for every v in nbrs ∪ {node}     # send cluster to the min
    emit (v, m)  for every v in nbrs ∪ {node}     # send the min everywhere

which converges in O(log diameter) rounds; at the fixpoint every node's
neighbourhood is exactly {its component min}.  No joins, no driver state —
one hash shuffle per round, streaming throughout.  Convergence is detected
with an order-independent 64-bit checksum of the adjacency rows (one cheap
aggregate pass per round).

Node ids are strings; the component label is the lexicographic MIN node id —
deterministic, retry-safe.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray


def _checksum(ds: "ray.data.Dataset", cols: tuple[str, str]) -> int:
    """Order-independent checksum: sum of 64-bit hashes of row tuples."""

    def part(t: pa.Table) -> pa.Table:
        total = 0
        for a, b in zip(t[cols[0]].to_pylist(), t[cols[1]].to_pylist()):
            h = hashlib.blake2b(f"{a}\x00{b}".encode(), digest_size=8)
            total = (total + int.from_bytes(h.digest(), "big")) % (1 << 63)
        return pa.table({"c": pa.array([total], pa.int64())})

    partials = ds.map_batches(part, batch_format="pyarrow")
    return sum(
        v
        for b in partials.iter_batches(batch_format="pyarrow")
        for v in b["c"].to_pylist()
    ) % (1 << 63)


def _hash_to_min_round(g: pa.Table) -> pa.Table:
    node = g["node"][0].as_py()
    vals = set(g["nbr"].to_pylist())
    vals.add(node)
    m = min(vals)
    out_n, out_v = [], []
    for v in vals:
        if v != m:
            out_n.append(m)
            out_v.append(v)
        out_n.append(v)
        out_v.append(m)
    return pa.table(
        {"node": pa.array(out_n, pa.string()), "nbr": pa.array(out_v, pa.string())}
    )


def connected_components(
    edges: "ray.data.Dataset",
    *,
    nodes: "ray.data.Dataset | None" = None,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    num_partitions: int = 32,  # kept for API compat; groupby sizes itself
) -> "ray.data.Dataset":
    """Compute components of the undirected graph given by ``edges``.

    Returns a Dataset ``(node, cluster_id)`` where ``cluster_id`` is the min
    node id of the component.  ``nodes`` optionally supplies isolated nodes
    (a single-column Dataset named ``node``) so singletons appear too.
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
    adj = adj.materialize()
    if adj.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "cluster_id": pa.array([], pa.string()),
                }
            )
        )

    prev = None
    for _ in range(max_rounds):
        adj = (
            adj.groupby("node")
            .map_groups(_hash_to_min_round, batch_format="pyarrow")
            .materialize()
        )
        cur = _checksum(adj, ("node", "nbr"))
        if cur == prev:
            break
        prev = cur

    labels = adj.groupby("node").min("nbr")
    return labels.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "cluster_id": pa.compute.min_element_wise(t["min(nbr)"], t["node"]),
            }
        ),
        batch_format="pyarrow",
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
