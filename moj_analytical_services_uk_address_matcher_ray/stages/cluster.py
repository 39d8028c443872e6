"""Iterative hash-min connected components over an edge Dataset.

The north rule extends the reference's best-match-per-record selection with
transitive clustering: scored pairs above threshold are edges, and entity
clusters are the connected components.  Implemented as the classic
log-rounds map-reduce CC (hash-to-min label propagation):

  labels(node) = node                                  # init
  repeat:
      cand  = edges joined with labels on src          # hash join
      prop  = (dst, label) from cand                   # propagate
      labels = union(labels, prop).groupby(node).min   # hash-min

Each round is one hash join + one groupby — all streaming, no driver-side
state.  Convergence is detected with an order-independent 64-bit checksum of
(node, label) pairs (one cheap aggregate pass per round); identical checksum
on consecutive rounds == fixpoint.  Edges are mirrored once up front so
propagation is symmetric; expected rounds = O(log diameter).

Node ids are strings; the component label is the lexicographic MIN node id —
deterministic, retry-safe.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray

from .joins import inner_join


def _mirror_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    def mirror(t: pa.Table) -> pa.Table:
        fwd = pa.table({"src": t["src"], "dst": t["dst"]})
        rev = pa.table({"src": t["dst"], "dst": t["src"]})
        return pa.concat_tables([fwd, rev])

    return edges.map_batches(mirror, batch_format="pyarrow")


def _checksum(labels: "ray.data.Dataset") -> int:
    """Order-independent checksum: sum of 64-bit hashes of (node, label)."""

    def part(t: pa.Table) -> pa.Table:
        total = 0
        for n, lb in zip(t["node"].to_pylist(), t["label"].to_pylist()):
            h = hashlib.blake2b(f"{n}\x00{lb}".encode(), digest_size=8)
            total = (total + int.from_bytes(h.digest(), "big")) % (1 << 63)
        return pa.table({"c": pa.array([total], pa.int64())})

    partials = labels.map_batches(part, batch_format="pyarrow")
    return sum(
        v for b in partials.iter_batches(batch_format="pyarrow") for v in b["c"].to_pylist()
    ) % (1 << 63)


def connected_components(
    edges: "ray.data.Dataset",
    *,
    nodes: "ray.data.Dataset | None" = None,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Compute components of the undirected graph given by ``edges``.

    Returns a Dataset ``(node, cluster_id)`` where ``cluster_id`` is the min
    node id of the component.  ``nodes`` optionally supplies isolated nodes
    (a single-column Dataset named ``node``) so singletons appear too.
    """
    edges = edges.map_batches(
        lambda t: pa.table({"src": t[src], "dst": t[dst]}), batch_format="pyarrow"
    )
    edges = _mirror_edges(edges).materialize()

    if edges.count() == 0:
        # no edges at all: every node is its own singleton cluster
        if nodes is None:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], pa.string()),
                        "cluster_id": pa.array([], pa.string()),
                    }
                )
            )
        return nodes.map_batches(
            lambda t: pa.table({"node": t["node"], "cluster_id": t["node"]}),
            batch_format="pyarrow",
        )

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"], "label": t["src"]})

    labels = edges.map_batches(init_labels, batch_format="pyarrow")
    if nodes is not None:
        labels = labels.union(
            nodes.map_batches(
                lambda t: pa.table({"node": t["node"], "label": t["node"]}),
                batch_format="pyarrow",
            )
        )
    labels = labels.groupby("node").min("label")
    labels = labels.map_batches(
        lambda t: pa.table({"node": t["node"], "label": t["min(label)"]}),
        batch_format="pyarrow",
    ).materialize()

    prev_sum = _checksum(labels)
    for _ in range(max_rounds):
        cand = inner_join(
            edges,
            labels,
            on="src",
            right_on="node",
            num_partitions=num_partitions,
        )
        prop = cand.map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        merged = labels.union(prop).groupby("node").min("label")
        labels = merged.map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["min(label)"]}),
            batch_format="pyarrow",
        ).materialize()
        cur = _checksum(labels)
        if cur == prev_sum:
            break
        prev_sum = cur
    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "cluster_id": t["label"]}),
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
    # path-compress to min label
    out = {}
    for n in list(parent):
        r = find(n)
        out[n] = r
    # ensure label is the min of the component
    comp_min: dict[str, str] = {}
    for n, r in out.items():
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = min(n, comp_min.get(r, n))
    return {n: comp_min[r] for n, r in out.items()}
