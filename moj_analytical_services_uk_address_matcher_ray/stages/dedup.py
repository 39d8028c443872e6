"""Document deduplication operators for large-scale training-data pipelines.

Five flavours, all streaming Ray Data (K4/K6 of SURVEY.md §2.7 generalised
to the web-scale dedup toolbox):

  * exact          — hash-partition on a content hash, keep min id per group;
  * minhash_lsh    — shingle -> minhash signature -> banded LSH buckets ->
                     candidate pairs -> Jaccard verify -> connected comps;
  * simhash        — 64-bit simhash over token hashes; bucket on rotated
                     prefixes; verify Hamming distance;
  * ngram_jaccard  — exact n-gram-set Jaccard over candidate pairs from a
                     shared-rare-ngram block;
  * embedding near-dup — cosine similarity over an embedding column, bucketed
                     by random-hyperplane LSH (scale path) with brute-force
                     verify inside buckets.

All hashing is deterministic (blake2b / fixed seeds) so retries are stable.
Each flavour returns (id, dup_group_id): rows sharing a group id are
duplicates; singletons map to themselves.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .cluster import connected_components

_WORD = re.compile(r"\w+")


def _h64(s: str, seed: int = 0) -> int:
    h = hashlib.blake2b(s.encode(), digest_size=8, salt=seed.to_bytes(8, "big"))
    return int.from_bytes(h.digest(), "big")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: "ray.data.Dataset", *, id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """(id, dup_group_id): min id per identical-text group.  One partial-map
    (hash) + one groupby shuffle."""

    def add_hash(t: pa.Table) -> pa.Table:
        hashes = [
            hashlib.sha256(v.encode()).hexdigest() if v is not None else None
            for v in t[text_col].to_pylist()
        ]
        return pa.table(
            {"id": t[id_col], "__h": pa.array(hashes, pa.string())}
        )

    def pick(g: pa.Table) -> pa.Table:
        ids = g["id"]
        m = pa.compute.min(ids).as_py()
        return pa.table(
            {
                "id": ids,
                "dup_group_id": pa.array([m] * g.num_rows, ids.type),
            }
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__h")
        .map_groups(pick, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingles(text: str, k: int) -> set[str]:
    toks = _WORD.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _minhash_sig(sh: set[str], n_hashes: int) -> list[int]:
    if not sh:
        return [0] * n_hashes
    return [min(_h64(s, seed) for s in sh) for seed in range(n_hashes)]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b) if (a or b) else 1.0


def minhash_lsh_dedup(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
) -> "ray.data.Dataset":
    """Shingle -> minhash -> band buckets (groupby) -> candidate pairs ->
    exact-Jaccard verify -> connected components."""
    rows_per_band = n_hashes // bands

    def to_bands(t: pa.Table) -> pa.Table:
        out_id, out_bucket, out_sh = [], [], []
        for i, text in enumerate(t[text_col].to_pylist()):
            doc = str(t[id_col][i].as_py())
            sh = _shingles(text or "", shingle_k)
            sig = _minhash_sig(sh, n_hashes)
            sh_ser = "\x1f".join(sorted(sh))
            for b in range(bands):
                band = sig[b * rows_per_band : (b + 1) * rows_per_band]
                bucket = f"{b}:" + hashlib.blake2b(
                    repr(band).encode(), digest_size=8
                ).hexdigest()
                out_id.append(doc)
                out_bucket.append(bucket)
                out_sh.append(sh_ser)
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "bucket": pa.array(out_bucket, pa.string()),
                "shingles": pa.array(out_sh, pa.string()),
            }
        )

    def verify(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return pa.table(
                {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
            )
        ids = g["id"].to_pylist()
        shs = [set(s.split("\x1f")) if s else set() for s in g["shingles"].to_pylist()]
        src, dst = [], []
        seen = set()
        for i in range(n):
            for j in range(i + 1, n):
                if ids[i] == ids[j] or (ids[i], ids[j]) in seen:
                    continue
                seen.add((ids[i], ids[j]))
                if jaccard(shs[i], shs[j]) >= jaccard_threshold:
                    src.append(ids[i])
                    dst.append(ids[j])
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

    banded = ds.map_batches(to_bands, batch_format="pyarrow")
    edges = banded.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    nodes = ds.map_batches(
        lambda t: pa.table(
            {"node": pa.array([str(v) for v in t[id_col].to_pylist()], pa.string())}
        ),
        batch_format="pyarrow",
    )
    comps = connected_components(edges, nodes=nodes)
    return comps.map_batches(
        lambda t: pa.table({"id": t["node"], "dup_group_id": t["cluster_id"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    v = np.zeros(64, dtype=np.int64)
    for tok in _WORD.findall((text or "").lower()):
        h = _h64(tok)
        for bit in range(64):
            v[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if v[bit] > 0:
            out |= 1 << bit
    return out


def simhash_dedup(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> "ray.data.Dataset":
    """Charikar simhash near-dup: 64-bit fingerprints bucketed on each of
    ``n_blocks`` 16-bit blocks (a pair within Hamming distance ``max_hamming``
    < ``n_blocks`` shares at least one identical block — pigeonhole), verify
    Hamming distance inside buckets, connect components."""

    def to_blocks(t: pa.Table) -> pa.Table:
        out_id, out_bucket, out_sig = [], [], []
        for i, text in enumerate(t[text_col].to_pylist()):
            doc = str(t[id_col][i].as_py())
            sig = simhash64(text or "")
            for b in range(n_blocks):
                block = (sig >> (b * 64 // n_blocks)) & ((1 << (64 // n_blocks)) - 1)
                out_id.append(doc)
                out_bucket.append(f"{b}:{block:x}")
                out_sig.append(sig)
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "bucket": pa.array(out_bucket, pa.string()),
                "sig": pa.array(out_sig, pa.uint64()),
            }
        )

    def verify(g: pa.Table) -> pa.Table:
        n = g.num_rows
        src, dst = [], []
        if n >= 2:
            ids = g["id"].to_pylist()
            sigs = g["sig"].to_pylist()
            for i in range(n):
                for j in range(i + 1, n):
                    if ids[i] == ids[j]:
                        continue
                    if bin(sigs[i] ^ sigs[j]).count("1") <= max_hamming:
                        src.append(ids[i])
                        dst.append(ids[j])
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

    blocks = ds.map_batches(to_blocks, batch_format="pyarrow")
    edges = blocks.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    nodes = ds.map_batches(
        lambda t: pa.table(
            {"node": pa.array([str(v) for v in t[id_col].to_pylist()], pa.string())}
        ),
        batch_format="pyarrow",
    )
    comps = connected_components(edges, nodes=nodes)
    return comps.map_batches(
        lambda t: pa.table({"id": t["node"], "dup_group_id": t["cluster_id"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, block on rarest shared shingle)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_k: int = 3,
    threshold: float = 0.5,
    max_block: int = 2000,
) -> "ray.data.Dataset":
    """Emit (id_a, id_b, jaccard) for pairs over the exact n-gram-set Jaccard
    threshold; candidates blocked on each shared shingle hash (capped)."""

    def explode(t: pa.Table) -> pa.Table:
        out_id, out_b, out_sh = [], [], []
        for i, text in enumerate(t[text_col].to_pylist()):
            doc = str(t[id_col][i].as_py())
            sh = _shingles(text or "", ngram_k)
            ser = "\x1f".join(sorted(sh))
            for s in sh:
                out_id.append(doc)
                out_b.append(f"{_h64(s):x}")
                out_sh.append(ser)
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "bucket": pa.array(out_b, pa.string()),
                "shingles": pa.array(out_sh, pa.string()),
            }
        )

    def verify(g: pa.Table) -> pa.Table:
        n = min(g.num_rows, max_block)
        ids = g["id"].to_pylist()[:n]
        shs = [set(s.split("\x1f")) if s else set() for s in g["shingles"].to_pylist()[:n]]
        a_out, b_out, j_out = [], [], []
        for i in range(n):
            for j in range(i + 1, n):
                if ids[i] == ids[j]:
                    continue
                a, b = sorted((ids[i], ids[j]))
                jac = jaccard(shs[i], shs[j])
                if jac >= threshold:
                    a_out.append(a)
                    b_out.append(b)
                    j_out.append(jac)
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.string()),
                "id_b": pa.array(b_out, pa.string()),
                "jaccard": pa.array(j_out, pa.float64()),
            }
        )

    pairs = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pyarrow")
    )

    def dedupe(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dedupe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    n_planes: int = 8,
    seed: int = 13,
    dim: int | None = None,
) -> "ray.data.Dataset":
    """(id_a, id_b, cosine) for pairs with cosine >= threshold.

    Scale path: random-hyperplane LSH buckets (vectors within a tiny angle
    almost surely share the full sign pattern) then exact cosine verify per
    bucket — numpy matmul inside ``map_groups``."""
    if dim is None:
        first = ds.take(1)[0]
        dim = len(first[vec_col])
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, n_planes).astype(np.float32)
    planes_ref = ray.put(planes)

    def bucketize(t: pa.Table) -> pa.Table:
        P = ray.get(planes_ref)
        vecs = np.asarray(t[vec_col].to_pylist(), dtype=np.float32)
        ids = [str(v) for v in t[id_col].to_pylist()]
        signs = (vecs @ P) > 0
        buckets = ["".join("1" if s else "0" for s in row) for row in signs]
        return pa.table(
            {
                "id": pa.array(ids, pa.string()),
                "bucket": pa.array(buckets, pa.string()),
                "vec": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
            }
        )

    def verify(g: pa.Table) -> pa.Table:
        n = g.num_rows
        a_out, b_out, c_out = [], [], []
        if n >= 2:
            ids = g["id"].to_pylist()
            V = np.asarray(g["vec"].to_pylist(), dtype=np.float32)
            norms = np.linalg.norm(V, axis=1)
            norms[norms == 0] = 1.0
            Vn = V / norms[:, None]
            sims = Vn @ Vn.T
            ii, jj = np.where(np.triu(sims >= threshold, k=1))
            for i, j in zip(ii, jj):
                a, b = sorted((ids[i], ids[j]))
                a_out.append(a)
                b_out.append(b)
                c_out.append(float(sims[i, j]))
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.string()),
                "id_b": pa.array(b_out, pa.string()),
                "cosine": pa.array(c_out, pa.float64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pyarrow")
    )
