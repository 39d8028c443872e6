"""Partition-pruned inverted text index: build once, then answer keyword
queries reading only the index partitions that can contain the query terms.

The text analogue of the IVF vector index in ``similarity.py`` — same scale
contract: at 100 TB the win is not the matmul/intersection, it is that a
probe's IO scales with ``len(terms)/n_buckets`` of the index, not with
corpus size.

  * **Build** (:func:`build_text_index`): one streaming scan emits the
    DISTINCT ``(token, doc_id)`` postings per block (per-batch composite
    ``np.unique`` — a block contributes its local vocabulary x docs, never
    its token stream), buckets each posting by ``md5(token) % n_buckets``,
    clusters by bucket, and hive-writes one directory per bucket with
    token-sorted row groups (parquet min/max stats then prune WITHIN a
    bucket too).  Token rule is the pinned oracle rule
    (``text_analysis._token_stream``).
  * **Search** (:func:`search_text_index`): reads ONLY the
    ``{md5(term) % n_buckets}`` partitions with a ``token IN terms``
    row-group filter pushed into the parquet scan, then resolves AND/OR
    with ONE doc-bucketed shuffle of narrow ``(doc_id, term)`` pairs
    (distinct-count == n_terms per doc, vectorised composite
    ``np.unique`` per bucket).

Reference parity note: the reference has no search surface; this is one of
the beyond-reference training-data operators (corpus triage — "every
document mentioning X and Y" — at index-probe cost).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .text_analysis import _token_stream

_META = "meta.json"
_DONE = "_INDEX_DONE"


def _token_bucket(tok: str, n_buckets: int) -> int:
    return int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big") % n_buckets


def _bucket_of_dictionary(dictionary: pa.Array, n_buckets: int) -> np.ndarray:
    """md5 bucket per UNIQUE token (O(batch vocabulary), never O(tokens))."""
    return np.fromiter(
        (_token_bucket(s, n_buckets) for s in dictionary.to_pylist()),
        dtype=np.int32,
        count=len(dictionary),
    )


def build_text_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> None:
    """Materialise the inverted index under ``index_dir`` (hive layout,
    one directory per token-hash bucket; postings sorted by token)."""

    def postings(t: pa.Table) -> pa.Table:
        values, offsets = _token_stream(t[text_col])
        ndocs = t.num_rows
        if len(values) == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    id_col: pa.array([], t.schema.field(id_col).type),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        doc_of_tok = np.repeat(np.arange(ndocs, dtype=np.int64), np.diff(offsets))
        enc = pc.dictionary_encode(values)
        codes = np.asarray(enc.indices, dtype=np.int64)
        K = max(len(enc.dictionary), 1)
        uniq = np.unique(doc_of_tok * K + codes)  # distinct (doc, token)
        tok_u = (uniq % K).astype(np.int64)
        doc_u = (uniq // K).astype(np.int64)
        buckets = _bucket_of_dictionary(enc.dictionary, n_buckets)
        ids = t[id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        return pa.table(
            {
                "token": enc.dictionary.take(pa.array(tok_u)),
                id_col: ids.take(pa.array(doc_u)),
                "bucket": pa.array(buckets[tok_u], pa.int32()),
            }
        )

    # cluster by bucket before the hive write (one file per block x bucket
    # otherwise — the footer-dominated-index failure mode measured on the
    # IVF index build, similarity.py:build_ivf_index); sorting by
    # (bucket, token) also gives token-ordered row groups, so parquet
    # min/max statistics prune inside a bucket.
    in_bytes = ds.size_bytes() or 0
    target = int(max(n_buckets, min(512, max(1, in_bytes // (64 << 20)))))
    (
        ds.map_batches(postings, batch_format="pyarrow")
        .repartition(target)
        .sort(["bucket", "token"])
        .write_parquet(index_dir, partition_cols=["bucket"])
    )
    with open(os.path.join(index_dir, _META), "w") as fh:
        json.dump({"n_buckets": n_buckets, "id_col": id_col}, fh)
    with open(os.path.join(index_dir, _DONE), "w") as fh:
        fh.write("ok")


def search_text_index(
    index_dir: str,
    terms: list[str],
    *,
    mode: str = "and",
    n_buckets_hint: int | None = None,
) -> "ray.data.Dataset":
    """Documents matching ``terms`` (``mode="and"``: all terms;
    ``"or"``: any).  Returns a one-column dataset of matching ids.

    Reads only the term buckets' partitions; the ``token IN terms``
    predicate is pushed into the parquet scan (row-group pruning against
    the token-sorted statistics)."""
    import ray.data as rd

    from .bucketing import bucketed_group_apply

    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    with open(os.path.join(index_dir, _META)) as fh:
        meta = json.load(fh)
    nb = n_buckets_hint or meta["n_buckets"]
    id_col = meta["id_col"]
    terms = sorted(set(terms))
    probe = sorted({_token_bucket(t, nb) for t in terms})
    # ray.data.read_parquet expands a SINGLE root directory but treats a
    # list as file paths — list the probe buckets' files explicitly
    paths = []
    for b in probe:
        d = os.path.join(index_dir, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not paths:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.string())}))
    posts = rd.read_parquet(
        paths,
        columns=["token", id_col],
        filter=pc.field("token").isin(terms),
    )
    if mode == "or":
        # distinct ids: per-batch distinct combiner then one bucketed pick
        def distinct_batch(t: pa.Table) -> pa.Table:
            ids = t[id_col]
            ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
            return pa.table({id_col: pc.unique(ids)})

        def pick(g: pa.Table) -> pa.Table:
            ids = g[id_col]
            ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
            return pa.table({id_col: pc.unique(ids)})

        return bucketed_group_apply(
            posts.map_batches(distinct_batch, batch_format="pyarrow"),
            id_col,
            pick,
        )

    n_terms = len(terms)

    def count_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], g.schema.field(id_col).type)})
        ids = g[id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        denc = ids.dictionary_encode()
        dcodes = np.asarray(denc.indices, dtype=np.int64)
        tenc = pc.dictionary_encode(
            g["token"].combine_chunks()
            if isinstance(g["token"], pa.ChunkedArray)
            else g["token"]
        )
        tcodes = np.asarray(tenc.indices, dtype=np.int64)
        K = max(len(tenc.dictionary), 1)
        uniq = np.unique(dcodes * K + tcodes)  # distinct (doc, term)
        doc_u = uniq // K
        hits = np.bincount(doc_u, minlength=len(denc.dictionary))
        keep = np.flatnonzero(hits == n_terms)
        return pa.table({id_col: denc.dictionary.take(pa.array(keep, pa.int64()))})

    return bucketed_group_apply(posts, id_col, count_bucket)
