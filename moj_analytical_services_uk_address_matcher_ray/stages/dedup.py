"""Document deduplication operators for large-scale training-data pipelines.

Five flavours, all streaming Ray Data (K4/K6 of SURVEY.md §2.7 generalised
to the web-scale dedup toolbox):

  * exact          — hash-partition on a content hash, keep min id per group;
  * minhash_lsh    — shingle -> minhash signature -> banded LSH buckets ->
                     signature-estimated-Jaccard verify -> connected comps;
  * simhash        — 64-bit simhash over token hashes; bucket on 16-bit
                     blocks; vectorised Hamming verify (capped + counted);
  * ngram_jaccard  — exact n-gram-set Jaccard: DF-capped shingle blocking
                     emits NARROW id pairs, hash-sets join back per pair;
  * embedding near-dup — cosine similarity over an embedding column, bucketed
                     by random-hyperplane LSH with brute-force verify inside
                     buckets.

Scale discipline (round-2 rework of the round-1 versions):

  * Shuffle payloads are O(signature), never O(document).  MinHash band rows
    carry the fixed 32x8-byte signature (not the shingle set); ngram
    blocking rows carry only (id, bucket) and the per-doc hash set is
    attached to the ~sparse candidate-pair stream by a hash join afterwards.
  * Every cap is counted in the metrics actor (``dedup.*_dropped``) — never
    silent.  Hot buckets (e.g. empty/boilerplate docs hashing alike) are
    truncated deterministically, with the drop observable.
  * All hashing is md5-derived and deterministic so (a) retries are stable
    and (b) a DuckDB oracle can re-derive signatures bit-for-bit
    (``__ray_entry__.oracle_sql``: minhash_pairs / simhash_pairs): a doc's
    base hashes are the two 64-bit halves of ``md5(shingle)`` and the
    minhash family is Kirsch-Mitzenmacher ``(h1 + j*h2) mod 2^64`` — plain
    integer arithmetic both in numpy (uint64 wraparound) and in DuckDB
    (HUGEINT + explicit mod).

Reference parity: the reference's near-dup surface is the trigram/trie
matchers (unique_tokens_in_block_matcher.py, trie_matcher.py); these
operators generalise the same block->verify shape to web-corpus dedup.

Each dedup flavour returns (id, dup_group_id): rows sharing a group id are
duplicates; singletons map to themselves.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..state.metrics import inc_metric
from .cluster import connected_components

# re.ASCII: the DuckDB oracles tokenize with RE2's ASCII \w — Python's
# default unicode \w would include accented letters and diverge on
# non-ASCII text (the ASCII rule is also what the oracles' SQL states)
_WORD = re.compile(r"\w+", re.ASCII)

_U64 = np.uint64
_MOD64 = 1 << 64


def _md5_halves(s: str) -> tuple[int, int]:
    """(h1, h2): the two big-endian 64-bit halves of md5(s).  DuckDB parity:
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT`` / ``substr(..., 17, 16)``."""
    d = hashlib.md5(s.encode()).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big")


def _h64(s: str) -> int:
    return _md5_halves(s)[0]


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorised SWAR popcount over a uint64 array (no Python loop)."""
    x = x.astype(np.uint64, copy=True)
    x = x - ((x >> _U64(1)) & _U64(0x5555555555555555))
    x = (x & _U64(0x3333333333333333)) + ((x >> _U64(2)) & _U64(0x3333333333333333))
    x = (x + (x >> _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
    return (x * _U64(0x0101010101010101)) >> _U64(56)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: "ray.data.Dataset", *, id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """(id, dup_group_id): min id per identical-text group.

    One narrow partial map (sha256) + ONE bucketed hash shuffle; the
    per-group min is computed by a vectorised pandas groupby inside each
    bucket task (never one Ray UDF call per hash group)."""
    from .bucketing import bucketed_group_apply

    def add_hash(t: pa.Table) -> pa.Table:
        hashes = [
            hashlib.sha256(v.encode()).hexdigest() if v is not None else None
            for v in t[text_col].to_pylist()
        ]
        return pa.table({"id": t[id_col], "__h": pa.array(hashes, pa.string())})

    def pick_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"id": g["id"], "dup_group_id": g["id"]})
        df = g.to_pandas()
        dup = df.groupby("__h", sort=False)["id"].transform("min")
        return pa.table(
            {
                "id": pa.array(df["id"].to_numpy(), g["id"].type),
                "dup_group_id": pa.array(dup.to_numpy(), g["id"].type),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    # audited for exchange="direct": per-group MIN is order-insensitive and
    # the empty branch returns a schema-correct table
    return bucketed_group_apply(hashed, "__h", pick_bucket, exchange="direct")


# ---------------------------------------------------------------------------
# shingling + MinHash signatures (md5 / Kirsch-Mitzenmacher — oracle-parity)
# ---------------------------------------------------------------------------


def _shingles(text: str, k: int) -> set[str]:
    toks = _WORD.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _shingle_halves(sh: set[str]) -> tuple[np.ndarray, np.ndarray]:
    """Sorted-by-h1 (h1, h2) uint64 arrays over the distinct shingles."""
    if not sh:
        e = np.empty(0, dtype=np.uint64)
        return e, e
    pairs = [_md5_halves(s) for s in sh]
    h1 = np.fromiter((p[0] for p in pairs), dtype=np.uint64, count=len(pairs))
    h2 = np.fromiter((p[1] for p in pairs), dtype=np.uint64, count=len(pairs))
    order = np.argsort(h1, kind="stable")
    return h1[order], h2[order]


def _minhash_sig(sh: set[str], n_hashes: int) -> list[int]:
    """sig_j = min over shingles of ((h1 + j*h2) mod 2^64).  Empty shingle
    sets return the all-max sentinel (never collides with real buckets)."""
    h1, h2 = _shingle_halves(sh)
    if len(h1) == 0:
        return [_MOD64 - 1] * n_hashes
    j = np.arange(n_hashes, dtype=np.uint64)
    sig = (h1[:, None] + j[None, :] * h2[:, None]).min(axis=0)  # uint64 wrap
    return [int(v) for v in sig]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b) if (a or b) else 1.0


def minhash_band_rows(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
) -> "ray.data.Dataset":
    """NARROW LSH rows: (id, bucket, sig list<uint64>) — one row per band.

    The shuffle payload is O(n_hashes) per row regardless of document size;
    the shingle set never leaves the hashing task.  Token-less documents emit
    no rows (nothing to match on) — counted as ``dedup.minhash_empty_docs``."""
    rows_per_band = n_hashes // bands

    def to_bands(t: pa.Table) -> pa.Table:
        out_id: list[str] = []
        out_bucket: list[str] = []
        out_sig: list[list[int]] = []
        empty = 0
        for i, text in enumerate(t[text_col].to_pylist()):
            doc = str(t[id_col][i].as_py())
            sh = _shingles(text or "", shingle_k)
            if not sh:
                empty += 1
                continue
            sig = _minhash_sig(sh, n_hashes)
            for b in range(bands):
                band = sig[b * rows_per_band : (b + 1) * rows_per_band]
                bucket = f"{b}:" + "-".join(str(v) for v in band)
                out_id.append(doc)
                out_bucket.append(bucket)
                out_sig.append(sig)
        if empty:
            inc_metric("dedup.minhash_empty_docs", empty)
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "bucket": pa.array(out_bucket, pa.string()),
                "sig": pa.array(out_sig, pa.list_(pa.uint64())),
            }
        )

    return ds.map_batches(to_bands, batch_format="pyarrow")


def _sig_matrix(col: pa.ChunkedArray | pa.Array, n_rows: int, n_hashes: int):
    flat = (
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    )
    return np.asarray(flat.flatten(), dtype=np.uint64).reshape(n_rows, n_hashes)


def minhash_candidate_pairs(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
    max_bucket: int = 5_000,
) -> "ray.data.Dataset":
    """(id_a, id_b, n_eq): distinct pairs sharing >=1 band bucket whose
    signature-estimated Jaccard (``n_eq / n_hashes``) clears the threshold.

    Verification is vectorised per bucket group (signature columns compared
    with numpy, no shingle material); buckets over ``max_bucket`` docs are
    deterministically truncated (smallest ids kept) and the dropped-doc count
    lands in ``dedup.minhash_bucket_dropped`` — never silent."""
    from .bucketing import bucketed_group_apply

    n_eq_min = int(np.ceil(jaccard_threshold * n_hashes))

    def verify_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        n = g.num_rows
        a_out: list[str] = []
        b_out: list[str] = []
        e_out: list[int] = []
        if n >= 2:
            buckets = g["bucket"].to_pylist()
            ids = g["id"].to_pylist()
            sigs = _sig_matrix(g["sig"], n, n_hashes)
            df = pd.DataFrame({"bucket": buckets, "row": np.arange(n)})
            dropped = 0
            for _, sub in df.groupby("bucket", sort=False):
                rows = sub["row"].to_numpy()
                if len(rows) < 2:
                    continue
                if len(rows) > max_bucket:
                    order = np.argsort(
                        np.asarray([ids[r] for r in rows], dtype=object),
                        kind="stable",
                    )
                    dropped += len(rows) - max_bucket
                    rows = rows[order][:max_bucket]
                sub_ids = [ids[r] for r in rows]
                S = sigs[rows]  # (m, H)
                m = len(rows)
                eq = (S[:, None, :] == S[None, :, :]).sum(axis=2)
                ii, jj = np.nonzero(np.triu(eq >= n_eq_min, k=1))
                for i, j in zip(ii, jj):
                    if sub_ids[i] == sub_ids[j]:
                        continue
                    a, b = sorted((sub_ids[i], sub_ids[j]))
                    a_out.append(a)
                    b_out.append(b)
                    e_out.append(int(eq[i, j]))
            if dropped:
                inc_metric("dedup.minhash_bucket_dropped", dropped)
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.string()),
                "id_b": pa.array(b_out, pa.string()),
                "n_eq": pa.array(e_out, pa.int32()),
            }
        )

    banded = minhash_band_rows(
        ds,
        id_col=id_col,
        text_col=text_col,
        shingle_k=shingle_k,
        n_hashes=n_hashes,
        bands=bands,
    )
    # audited for exchange="direct": the cap keeps the lexicographically
    # smallest ids, pair emission sorts ids, duplicate collisions carry
    # identical n_eq — all order-insensitive; empties return fixed schemas
    pairs = bucketed_group_apply(
        banded, "bucket", verify_bucket, exchange="direct"
    )

    # cross-band dedup (a pair may collide in several bands): keep first
    def first_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g
        df = g.to_pandas().drop_duplicates(["id_a", "id_b"])
        return pa.Table.from_pandas(df, preserve_index=False).cast(g.schema)

    return bucketed_group_apply(
        pairs, ["id_a", "id_b"], first_bucket, exchange="direct"
    )


def minhash_lsh_dedup(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
    max_bucket: int = 5_000,
) -> "ray.data.Dataset":
    """Shingle -> minhash -> band buckets -> signature-estimated-Jaccard
    verify -> connected components.  Returns (id, dup_group_id)."""
    pairs = minhash_candidate_pairs(
        ds,
        id_col=id_col,
        text_col=text_col,
        shingle_k=shingle_k,
        n_hashes=n_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
        max_bucket=max_bucket,
    )
    edges = pairs.map_batches(
        lambda t: pa.table({"src": t["id_a"], "dst": t["id_b"]}),
        batch_format="pyarrow",
    )
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
    """Charikar 64-bit simhash over per-occurrence md5 token hashes,
    vectorised (numpy bit unpack, no per-bit Python loop)."""
    toks = _WORD.findall((text or "").lower())
    if not toks:
        return 0
    hs = np.fromiter((_h64(t) for t in toks), dtype=np.uint64, count=len(toks))
    # bit b (LSB-first) of each hash -> (n_toks, 64) matrix of 0/1
    bits = np.unpackbits(
        hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    v = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out_bits = (v > 0).astype(np.uint8)
    return int(np.packbits(out_bits, bitorder="little").view(np.uint64)[0])


def simhash_candidate_pairs(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 4,
    max_bucket: int = 5_000,
) -> "ray.data.Dataset":
    """(id_a, id_b, hamming): distinct pairs sharing >=1 16-bit block with
    Hamming distance <= ``max_hamming`` (pigeonhole: any pair within distance
    < n_blocks shares at least one identical block).

    Verify is vectorised (XOR + SWAR popcount over the bucket's signature
    vector); hot buckets (e.g. boilerplate docs collapsing to one block
    value) are truncated at ``max_bucket`` docs with the drop counted in
    ``dedup.simhash_bucket_dropped``.  Token-less docs emit no rows."""
    from .bucketing import bucketed_group_apply

    block_bits = 64 // n_blocks
    mask = (1 << block_bits) - 1

    def to_blocks(t: pa.Table) -> pa.Table:
        out_id: list[str] = []
        out_bucket: list[str] = []
        out_sig: list[int] = []
        empty = 0
        for i, text in enumerate(t[text_col].to_pylist()):
            doc = str(t[id_col][i].as_py())
            toks = _WORD.findall((text or "").lower())
            if not toks:
                empty += 1
                continue
            sig = simhash64(text or "")
            for b in range(n_blocks):
                block = (sig >> (b * block_bits)) & mask
                out_id.append(doc)
                out_bucket.append(f"{b}:{block:x}")
                out_sig.append(sig)
        if empty:
            inc_metric("dedup.simhash_empty_docs", empty)
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "bucket": pa.array(out_bucket, pa.string()),
                "sig": pa.array(out_sig, pa.uint64()),
            }
        )

    def verify_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        n = g.num_rows
        a_out: list[str] = []
        b_out: list[str] = []
        h_out: list[int] = []
        if n >= 2:
            ids = g["id"].to_pylist()
            sigs = np.asarray(g["sig"].to_pylist(), dtype=np.uint64)
            df = pd.DataFrame({"bucket": g["bucket"].to_pylist(), "row": np.arange(n)})
            dropped = 0
            for _, sub in df.groupby("bucket", sort=False):
                rows = sub["row"].to_numpy()
                if len(rows) < 2:
                    continue
                if len(rows) > max_bucket:
                    order = np.argsort(
                        np.asarray([ids[r] for r in rows], dtype=object),
                        kind="stable",
                    )
                    dropped += len(rows) - max_bucket
                    rows = rows[order][:max_bucket]
                sub_ids = [ids[r] for r in rows]
                S = sigs[rows]
                ham = _popcount64(S[:, None] ^ S[None, :])
                ii, jj = np.nonzero(np.triu(ham <= max_hamming, k=1))
                for i, j in zip(ii, jj):
                    if sub_ids[i] == sub_ids[j]:
                        continue
                    a, b = sorted((sub_ids[i], sub_ids[j]))
                    a_out.append(a)
                    b_out.append(b)
                    h_out.append(int(ham[i, j]))
            if dropped:
                inc_metric("dedup.simhash_bucket_dropped", dropped)
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.string()),
                "id_b": pa.array(b_out, pa.string()),
                "hamming": pa.array(h_out, pa.int32()),
            }
        )

    blocks = ds.map_batches(to_blocks, batch_format="pyarrow")
    # audited for exchange="direct": see minhash_candidate_pairs
    pairs = bucketed_group_apply(
        blocks, "bucket", verify_bucket, exchange="direct"
    )

    def first_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g
        df = g.to_pandas().drop_duplicates(["id_a", "id_b"])
        return pa.Table.from_pandas(df, preserve_index=False).cast(g.schema)

    return bucketed_group_apply(
        pairs, ["id_a", "id_b"], first_bucket, exchange="direct"
    )


def simhash_dedup(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 4,
    max_bucket: int = 5_000,
) -> "ray.data.Dataset":
    """SimHash near-dup groups (id, dup_group_id) via block buckets +
    Hamming verify + connected components."""
    pairs = simhash_candidate_pairs(
        ds,
        id_col=id_col,
        text_col=text_col,
        max_hamming=max_hamming,
        n_blocks=n_blocks,
        max_bucket=max_bucket,
    )
    edges = pairs.map_batches(
        lambda t: pa.table({"src": t["id_a"], "dst": t["id_b"]}),
        batch_format="pyarrow",
    )
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
# n-gram Jaccard (exact, DF-capped shingle blocking + narrow pairs)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_k: int = 3,
    threshold: float = 0.5,
    df_cap: int = 100_000,
    max_pairs_per_bucket: int = 10_000_000,
) -> "ray.data.Dataset":
    """(id_a, id_b, n_inter, n_union, jaccard) for pairs over the exact
    n-gram-set Jaccard threshold.

    Scale shape (round-2 rework):
      1. one pass hashes each doc's distinct shingles to a sorted uint64
         array -> narrow ``sigs`` table (id, hashes), materialised once;
      2. blocking rows are (id, bucket=shingle-hash) ONLY — no document
         payload rides the candidate shuffle.  Shingles whose document
         frequency exceeds ``df_cap`` are skipped entirely (boilerplate
         n-grams are non-discriminative); skipped postings are counted in
         ``dedup.ngram_df_capped``;
      3. per-bucket pair emission (capped at ``max_pairs_per_bucket``,
         dropped pairs counted in ``dedup.ngram_pairs_dropped``) + first-wins
         pair dedup — both narrow;
      4. the per-doc hash arrays are hash-joined back onto the pair stream
         and exact Jaccard is computed from the sorted arrays (64-bit
         collisions are negligible).

    Shuffle volume: O(total postings) + O(candidate pairs x doc shingles) —
    the round-1 version shipped the full shingle set on EVERY posting row
    (O(postings x doc size)) and silently truncated verify blocks."""
    from .bucketing import bucketed_group_apply
    from .joins import inner_join

    def to_hashes(t: pa.Table) -> pa.Table:
        ids: list[str] = []
        hs: list[list[int]] = []
        for i, text in enumerate(t[text_col].to_pylist()):
            doc = str(t[id_col][i].as_py())
            sh = _shingles(text or "", ngram_k)
            h1, _ = _shingle_halves(sh)
            ids.append(doc)
            hs.append([int(v) for v in h1])
        return pa.table(
            {
                "id": pa.array(ids, pa.string()),
                "hashes": pa.array(hs, pa.list_(pa.uint64())),
            }
        )

    sigs = ds.map_batches(to_hashes, batch_format="pyarrow").materialize()

    def postings(t: pa.Table) -> pa.Table:
        out_id: list[str] = []
        out_b: list[int] = []
        ids = t["id"].to_pylist()
        for i, hl in enumerate(t["hashes"].to_pylist()):
            for h in hl:
                out_id.append(ids[i])
                out_b.append(h)
        return pa.table(
            {
                "id": pa.array(out_id, pa.string()),
                "bucket": pa.array(out_b, pa.uint64()),
            }
        )

    def emit_pairs(g: pa.Table) -> pa.Table:
        import pandas as pd

        a_out: list[str] = []
        b_out: list[str] = []
        n = g.num_rows
        if n >= 2:
            ids = g["id"].to_pylist()
            df = pd.DataFrame(
                {"bucket": np.asarray(g["bucket"].to_pylist(), dtype=np.uint64),
                 "row": np.arange(n)}
            )
            df_capped = 0
            pairs_dropped = 0
            for _, sub in df.groupby("bucket", sort=False):
                rows = sub["row"].to_numpy()
                m = len(rows)
                if m < 2:
                    continue
                if m > df_cap:
                    df_capped += m
                    continue
                if m * (m - 1) // 2 > max_pairs_per_bucket:
                    pairs_dropped += m * (m - 1) // 2 - max_pairs_per_bucket
                    keep = int((2 * max_pairs_per_bucket) ** 0.5) + 1
                    order = np.argsort(
                        np.asarray([ids[r] for r in rows], dtype=object),
                        kind="stable",
                    )
                    rows = rows[order][:keep]
                    m = len(rows)
                sub_ids = sorted(ids[r] for r in rows)
                for i in range(m):
                    for j in range(i + 1, m):
                        if sub_ids[i] != sub_ids[j]:
                            a_out.append(sub_ids[i])
                            b_out.append(sub_ids[j])
            if df_capped:
                inc_metric("dedup.ngram_df_capped", df_capped)
            if pairs_dropped:
                inc_metric("dedup.ngram_pairs_dropped", pairs_dropped)
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.string()),
                "id_b": pa.array(b_out, pa.string()),
            }
        )

    def first_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g
        df = g.to_pandas().drop_duplicates(["id_a", "id_b"])
        return pa.Table.from_pandas(df, preserve_index=False).cast(g.schema)

    posting_rows = sigs.map_batches(postings, batch_format="pyarrow")
    # audited for exchange="direct": see minhash_candidate_pairs
    cand = bucketed_group_apply(
        posting_rows, "bucket", emit_pairs, exchange="direct"
    )
    cand = bucketed_group_apply(
        cand, ["id_a", "id_b"], first_bucket, exchange="direct"
    )

    # attach both hash arrays (narrow join payloads) and verify exactly
    def side(s: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({f"id_{s}": t["id"], f"hashes_{s}": t["hashes"]})

        return fn

    withl = inner_join(cand, sigs.map_batches(side("a"), batch_format="pyarrow"), on="id_a")
    both = inner_join(withl, sigs.map_batches(side("b"), batch_format="pyarrow"), on="id_b")

    def verify(t: pa.Table) -> pa.Table:
        n = t.num_rows
        a_out: list[str] = []
        b_out: list[str] = []
        ni_out: list[int] = []
        nu_out: list[int] = []
        j_out: list[float] = []
        if n:
            ids_a = t["id_a"].to_pylist()
            ids_b = t["id_b"].to_pylist()
            ha = t["hashes_a"].to_pylist()
            hb = t["hashes_b"].to_pylist()
            for i in range(n):
                A = np.asarray(ha[i], dtype=np.uint64)
                B = np.asarray(hb[i], dtype=np.uint64)
                n_inter = int(np.intersect1d(A, B, assume_unique=True).size)
                n_union = int(A.size + B.size - n_inter)
                jac = 1.0 if n_union == 0 else n_inter / n_union
                if jac >= threshold:
                    a_out.append(ids_a[i])
                    b_out.append(ids_b[i])
                    ni_out.append(n_inter)
                    nu_out.append(n_union)
                    j_out.append(jac)
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.string()),
                "id_b": pa.array(b_out, pa.string()),
                "n_inter": pa.array(ni_out, pa.int64()),
                "n_union": pa.array(nu_out, pa.int64()),
                "jaccard": pa.array(j_out, pa.float64()),
            }
        )

    return both.map_batches(verify, batch_format="pyarrow")


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
    bucket — numpy matmul inside the bucketed group apply."""
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
        import pandas as pd

        a_out: list[str] = []
        b_out: list[str] = []
        c_out: list[float] = []
        n = g.num_rows
        if n >= 2:
            ids = g["id"].to_pylist()
            V = np.asarray(g["vec"].to_pylist(), dtype=np.float32)
            norms = np.linalg.norm(V, axis=1)
            norms[norms == 0] = 1.0
            Vn = V / norms[:, None]
            df = pd.DataFrame({"bucket": g["bucket"].to_pylist(), "row": np.arange(n)})
            for _, sub in df.groupby("bucket", sort=False):
                rows = sub["row"].to_numpy()
                if len(rows) < 2:
                    continue
                sub_ids = [ids[r] for r in rows]
                sims = Vn[rows] @ Vn[rows].T
                ii, jj = np.where(np.triu(sims >= threshold, k=1))
                for i, j in zip(ii, jj):
                    a, b = sorted((sub_ids[i], sub_ids[j]))
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

    from .bucketing import bucketed_group_apply

    bucketized = ds.map_batches(bucketize, batch_format="pyarrow")
    return bucketed_group_apply(bucketized, "bucket", verify)


# ---------------------------------------------------------------------------
# substring-level duplicate spans (Lee et al. 2021, bounded shingle form)
# ---------------------------------------------------------------------------


def duplicate_spans(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Per-doc substring-duplication stats at ``k``-token granularity:
    ``(id, n_shingles, n_dup_shingles)`` where a shingle POSITION counts as
    duplicated when its ``k``-token window text occurs at >=2 (doc, pos)
    sites anywhere in the corpus (within-doc repeats included) — the
    bounded-granularity form of exact substring dedup ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2021; the full
    suffix-array variant detects arbitrary-length spans, this k-token form
    is the shuffle-friendly approximation used at corpus scale).

    Token/shingle rule is the pinned oracle rule (`_token_stream` +
    `_flat_ngrams` from text_analysis: DuckDB-trim, lower, ``\\s+`` split,
    windows joined with single spaces).

    Scale shape:
      1. one tokenize pass; per batch the shingle stream collapses to
         ``(digest16, id, cnt)`` partials — repeated windows within a batch
         pre-combine, and only a 16-byte md5 digest (never shingle text)
         enters the exchange;
      2. ONE digest-bucketed shuffle; per bucket: totals per digest ->
         per-doc (n_pos, n_dup) partials (each doc contributes rows to at
         most #buckets partial rows);
      3. a tiny groupby(id).sum + a broadcast-capable left join back onto
         the id spine so shingle-less docs report zeros.
    """
    import pandas as pd

    from .bucketing import default_buckets
    from .joins import left_join
    from .text_analysis import _flat_ngrams, _token_stream

    nb = n_buckets or default_buckets()

    def postings(t: pa.Table) -> pa.Table:
        values, offsets = _token_stream(t[text_col])
        ngrams, doc_of_pos, valid = _flat_ngrams(values, offsets, k)
        id_arr = t[id_col]
        id_arr = (
            id_arr.combine_chunks() if isinstance(id_arr, pa.ChunkedArray) else id_arr
        )
        if len(ngrams) == 0 or not valid.any():
            return pa.table(
                {
                    "h": pa.array([], pa.binary(16)),
                    "id": pa.array([], id_arr.type),
                    "cnt": pa.array([], pa.int64()),
                    "__bucket": pa.array([], pa.int32()),
                }
            )
        ngrams = ngrams.filter(pa.array(valid))
        doc_of_pos = doc_of_pos[valid]
        # hash only DISTINCT window texts (md5 full 128 bits: collision-free
        # in practice even at 10^12 windows), then gather codes
        dict_arr = ngrams.dictionary_encode()
        uniq = dict_arr.dictionary.to_pylist()
        digests = [hashlib.md5(u.encode()).digest() for u in uniq]
        # bucket id straight from the digest bytes (binary keys can't ride
        # the string-keyed bucketing helper): deterministic, balanced
        buckets = np.fromiter(
            (int.from_bytes(d[:4], "big") % nb for d in digests),
            np.int32,
            count=len(digests),
        )
        codes = np.asarray(dict_arr.indices, dtype=np.int64)
        df = pd.DataFrame({"c": codes, "d": doc_of_pos})
        agg = df.groupby(["c", "d"], sort=False).size().reset_index(name="cnt")
        cvec = agg["c"].to_numpy()
        return pa.table(
            {
                "h": pa.array([digests[c] for c in cvec], pa.binary(16)),
                "id": id_arr.take(pa.array(agg["d"].to_numpy(), pa.int64())),
                "cnt": pa.array(agg["cnt"].to_numpy(), pa.int64()),
                "__bucket": pa.array(buckets[cvec], pa.int32()),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "id": pa.array([], g.schema.field("id").type),
                    "__pos": pa.array([], pa.int64()),
                    "__dup": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame(
            {
                "h": g["h"].to_pandas(),
                "id": g["id"].to_pandas(),
                "cnt": g["cnt"].to_pandas(),
            }
        )
        tot = df.groupby("h", sort=False)["cnt"].transform("sum")
        df["__dup"] = np.where(tot.to_numpy() >= 2, df["cnt"].to_numpy(), 0)
        out = (
            df.groupby("id", sort=False)
            .agg(__pos=("cnt", "sum"), __dup=("__dup", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    parts = (
        ds.map_batches(postings, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
    )
    from ray.data.aggregate import Sum

    per_doc = parts.groupby("id").aggregate(
        Sum("__pos", alias_name="n_shingles"),
        Sum("__dup", alias_name="n_dup_shingles"),
    )

    spine = ds.map_batches(
        lambda t: pa.table({"id": t[id_col]}),
        batch_format="pyarrow",
    )
    joined = left_join(spine, per_doc, on=("id",))

    def finalize(t: pa.Table) -> pa.Table:
        n_sh = pc.coalesce(t["n_shingles"], pa.scalar(0, pa.int64())).cast(pa.int64())
        n_dup = pc.coalesce(t["n_dup_shingles"], pa.scalar(0, pa.int64())).cast(
            pa.int64()
        )
        return pa.table({"id": t["id"], "n_shingles": n_sh, "n_dup_shingles": n_dup})

    return joined.map_batches(finalize, batch_format="pyarrow")


def semantic_dedup(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray,
    eps: float = 0.9,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    embeddings with a coarse quantiser, then inside each cluster drop every
    item that has a LOWER-id neighbour with cosine >= ``eps``.  The sixth
    dedup flavour — near-duplicates that share meaning but not tokens
    (paraphrases, re-encodes), invisible to MinHash/SimHash/n-gram.

    Returns ``(id_col, cell, keep)`` for every input row.

    Scale shape — identical to the paper's recipe and to this module's
    discipline:
      * centroid assignment is a zero-shuffle ``map_batches`` against a
        broadcast (k x d) matrix (``ray.put`` once, read per actor);
      * ONE bucketed shuffle on the cell id; within-cell cosine is one
        numpy gram matrix per cell (O(m^2) where m = cell size — the
        quantiser's k bounds m; at 100 TB pick k so cells fit a worker,
        exactly the SemDeDup paper's operating point).
      * the drop rule is non-transitive and deterministic ("exists a
        lower-id neighbour"), so it is order-free, retry-stable, and
        DuckDB-expressible (value-hash oracle in ``__ray_entry__``).

    ``centroids`` come from :func:`~.similarity.train_centroids` (k-means,
    production default) or :func:`~.similarity.first_k_centroids`
    (deterministic, SQL-expressible — the oracle mode); float64 matmuls
    throughout so assignment matches DuckDB's ``list_cosine_similarity``
    argmax bit-for-bit on non-degenerate inputs.
    """
    from .bucketing import bucketed_group_apply

    C = np.asarray(centroids, dtype=np.float64)
    cents_ref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        Cm = ray.get(cents_ref)
        V = np.asarray(t[vec_col].to_pylist(), dtype=np.float64)
        if len(V) == 0:
            return pa.table(
                {
                    id_col: t[id_col],
                    "cell": pa.array([], pa.int32()),
                    "vec": pa.array([], pa.list_(pa.float64())),
                }
            )
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        Vn = V / norms[:, None]
        # np.argmax picks the FIRST max -> lowest cell index, matching the
        # oracle's ORDER BY cos DESC, cell ASC tie-break.
        cell = np.argmax(Vn @ Cm.T, axis=1).astype(np.int32)
        return pa.table(
            {
                id_col: t[id_col],
                "cell": pa.array(cell, pa.int32()),
                "vec": pa.array(list(Vn), pa.list_(pa.float64())),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def dedup_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int32()),
                    "keep": pa.array([], pa.bool_()),
                }
            )
        ids = np.asarray(g[id_col].to_pylist())
        cells = np.asarray(g["cell"].to_pylist(), dtype=np.int32)
        V = np.asarray(g["vec"].to_pylist(), dtype=np.float64)
        keep = np.ones(n, dtype=bool)
        df = pd.DataFrame({"cell": cells, "row": np.arange(n)})
        for _, sub in df.groupby("cell", sort=False):
            rows = sub["row"].to_numpy()
            if len(rows) < 2:
                continue
            order = rows[np.argsort(ids[rows], kind="mergesort")]
            S = V[order] @ V[order].T
            # drop i when any earlier (lower-id) j in the cell has
            # cosine >= eps: strict lower triangle of the gram matrix
            hit = np.tril(S >= eps, k=-1).any(axis=1)
            keep[order[hit]] = False
        return pa.table(
            {
                id_col: g[id_col],
                "cell": pa.array(cells, pa.int32()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return bucketed_group_apply(assigned, "cell", dedup_bucket, n_buckets=n_buckets)
