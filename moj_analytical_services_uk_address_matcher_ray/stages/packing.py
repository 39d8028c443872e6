"""Deterministic sequence packing — the "concatenate-and-chunk" operator a
training-data pipeline runs last: documents are laid end to end in a
deterministic pseudo-random global order and carved into fixed-length token
sequences (GPT-style packing, where documents may span sequence
boundaries).

Every per-doc output is a pure function of (corpus, id, salt):

* global order  = ``(md5(f"{id}:{salt}"), id)`` — a stable lottery, the
  same rule family as ``stages/sampling.py`` (and re-derivable in ANSI SQL
  as ``ORDER BY md5(CAST(id AS VARCHAR) || ':' || salt), id`` — fixed-width
  lowercase hex compares identically as a string in both engines);
* ``n_tokens``  = non-empty whitespace-token count (the ``chunk_tokens``
  rule: ``list_filter(regexp_split_to_array(coalesce(text,''), '\\s+'),
  x -> x <> '')``); zero-token docs are dropped (nothing to pack);
* ``tok_start`` = exclusive prefix sum of ``n_tokens`` in global order;
* a doc spans training sequences ``floor(tok_start/seq_len)`` ..
  ``floor((tok_start + n_tokens - 1)/seq_len)``.

Scale shape (the whole point): a global ordered prefix-sum normally means
a global sort.  Instead the md5 key's FIRST BYTE pre-partitions the order
into 256 contiguous ranges, so the plan is

1. one tokenize pass -> a narrow ``(id, key, n_tokens, range)`` table,
   materialized (the text column is read once and never shuffled);
2. per-block partial (range -> sum, count) combiners -> a driver reduce
   over <= 256 x blocks tiny rows gives every range's global token/row
   offset — NO shuffle, no driver-side row data;
3. ONE 256-way shuffle of the narrow table; each range task sorts locally
   and adds its broadcast offset.  Work per task is O(corpus/256) narrow
   rows regardless of document sizes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = r"\s+"
_RANGES = 256  # md5 first byte: 256 equal, ORDER-CONTIGUOUS key ranges


def _nonempty_token_counts(arr) -> np.ndarray:
    """Per-row count of non-empty ``\\s+`` splits of ``coalesce(text, '')``
    (the exact ``chunk_tokens`` / DuckDB-oracle token rule), fully
    vectorised: one regex-split kernel + one flat-level compare +
    prefix-sum segment reduction."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    toks = pc.split_pattern_regex(pc.coalesce(arr, ""), pattern=_WS)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, dtype=np.int64)
    offs = offs - offs[0]  # sliced arrays carry a non-zero first offset
    flat = toks.flatten()
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    csum = np.concatenate([[0], np.cumsum(nonempty, dtype=np.int64)])
    return csum[offs[1:]] - csum[offs[:-1]]


def _narrow_batch(
    t: pa.Table,
    id_col: str,
    text_col: str,
    salt: str,
    carry_cols: tuple[str, ...] = (),
) -> pa.Table:
    n = _nonempty_token_counts(t[text_col])
    ids = t[id_col].to_pylist()
    keys = [hashlib.md5(f"{v}:{salt}".encode()).hexdigest() for v in ids]
    rng = np.fromiter((int(k[:2], 16) for k in keys), np.int32, count=len(keys))
    cols = {
        id_col: t[id_col],
        "__k": pa.array(keys, pa.string()),
        "__n": pa.array(n, pa.int64()),
        "__r": pa.array(rng, pa.int32()),
    }
    for c in carry_cols:  # carried through the same zero-token filter
        cols[c] = t[c]
    out = pa.table(cols)
    return out.filter(pc.greater(out["__n"], 0))


def pack_sequences(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    salt: str = "",
) -> "ray.data.Dataset":
    """Per-doc packing plan: ``(id, pack_pos, tok_start, n_tokens,
    seq_first, seq_last)`` under deterministic hash-order packing into
    ``seq_len``-token sequences.  ``pack_pos`` is the doc's rank in the
    global order; a downstream writer that groups by ``seq_first`` (or
    iterates ranges of it) materialises the actual training sequences.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    narrow = ds.map_batches(
        lambda t: _narrow_batch(t, id_col, text_col, salt),
        batch_format="pyarrow",
    ).materialize()

    # per-block combiners -> driver reduce: each block yields <=256 rows
    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("__r").aggregate([("__n", "sum"), ("__n", "count")])

    tok_tot = np.zeros(_RANGES, np.int64)
    cnt_tot = np.zeros(_RANGES, np.int64)
    for row in narrow.map_batches(partial, batch_format="pyarrow").take_all():
        tok_tot[row["__r"]] += row["__n_sum"]
        cnt_tot[row["__r"]] += row["__n_count"]
    tok_off = np.concatenate([[0], np.cumsum(tok_tot)[:-1]])
    pos_off = np.concatenate([[0], np.cumsum(cnt_tot)[:-1]])

    def per_range(df):
        import pandas as pd

        r = int(df["__r"].iloc[0])
        df = df.sort_values(["__k", id_col], kind="mergesort")
        n = df["__n"].to_numpy(dtype=np.int64)
        end = np.cumsum(n) + tok_off[r]
        start = end - n
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "pack_pos": pos_off[r] + np.arange(len(df), dtype=np.int64),
                "tok_start": start,
                "n_tokens": n,
                "seq_first": start // seq_len,
                "seq_last": (end - 1) // seq_len,
            }
        )

    # ONE 256-way exchange of the narrow table; ranges are hash-balanced by
    # construction (md5 first byte), so no salt/skew handling is needed
    return narrow.groupby("__r").map_groups(per_range, batch_format="pandas")


def curriculum_interleave(
    ds: "ray.data.Dataset",
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    weights: dict[str, int],
    salt: str = "",
    shard_docs: int | None = None,
) -> "ray.data.Dataset":
    """Deterministic weighted interleave of sources into ONE training
    curriculum order — the "mixture stream" operator that sits between
    per-source preparation and sequence packing: any prefix of the output
    order contains the sources in ~their weight ratios (stride
    scheduling / weighted round-robin).

    Entirely integer-exact and engine-independent:

    * within each source, docs are shuffled by the engine-wide
      ``(md5(id || ':' || salt), id)`` lottery -> ``source_rank``;
    * each doc's ``priority = (source_rank + 1) * (W / w_source)`` where
      ``W = lcm(weights)`` — the classic stride key, kept INTEGRAL so no
      float comparison can disagree across engines;
    * ``interleave_pos`` = rank under ``(priority, source, source_rank)``,
      computed in CLOSED FORM from the per-source totals (for source s'
      with stride d' = W/w_s', the count of its docs strictly ahead of
      priority P is ``min(n_s', max(0, ceil(P / d') - 1))``, plus the tie
      term) — so the global rank costs NO second shuffle.

    Scale shape mirrors :func:`pack_sequences`: one narrow pass, <=256 x
    sources tiny combiner rows to the driver, ONE 256-way exchange.
    ``shard_docs`` additionally emits ``shard = interleave_pos //
    shard_docs`` for a partitioned writer.  Rows whose source is missing
    from ``weights`` raise (silent drops would skew the mixture)."""
    import math

    if not weights or any(
        (not isinstance(w, int)) or w <= 0 for w in weights.values()
    ):
        raise ValueError("weights must be a non-empty {source: positive int}")
    sources = sorted(weights)
    W = math.lcm(*weights.values())
    strides = {s: W // weights[s] for s in sources}

    def _narrow(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        srcs = t[source_col].to_pylist()
        bad = {s for s in srcs if s not in weights}
        if bad:
            raise ValueError(
                f"curriculum_interleave: sources without weights: {sorted(bad)!r}"
            )
        keys = [hashlib.md5(f"{v}:{salt}".encode()).hexdigest() for v in ids]
        rng = np.fromiter(
            (int(k[:2], 16) for k in keys), np.int32, count=len(keys)
        )
        return pa.table(
            {
                id_col: t[id_col],
                source_col: t[source_col],
                "__k": pa.array(keys, pa.string()),
                "__r": pa.array(rng, pa.int32()),
            }
        )

    narrow = ds.map_batches(_narrow, batch_format="pyarrow").materialize()

    # per-(range, source) counts -> driver reduce -> per-source range offsets
    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["__r", source_col]).aggregate([("__k", "count")])

    cnt = np.zeros((_RANGES, len(sources)), np.int64)
    s_index = {s: i for i, s in enumerate(sources)}
    for row in narrow.map_batches(partial, batch_format="pyarrow").take_all():
        cnt[row["__r"], s_index[row[source_col]]] += row["__k_count"]
    # offset of each (range, source) within that source's md5 order
    src_off = np.zeros_like(cnt)
    src_off[1:] = np.cumsum(cnt, axis=0)[:-1]
    n_total = cnt.sum(axis=0)  # docs per source
    stride_vec = np.array([strides[s] for s in sources], np.int64)

    def per_range(df):
        import pandas as pd

        r = int(df["__r"].iloc[0])
        df = df.sort_values(["__k", id_col], kind="mergesort")
        si = df[source_col].map(s_index).to_numpy(np.int64)
        # rank within source = source's offset into this range + occurrence
        occ = pd.Series(si).groupby(si).cumcount().to_numpy(np.int64)
        rank = src_off[r, si] + occ
        prio = (rank + 1) * stride_vec[si]
        # closed-form global rank over all sources
        pos = np.zeros(len(df), np.int64)
        for j, s in enumerate(sources):
            d = stride_vec[j]
            ahead = np.minimum(
                n_total[j], np.maximum(0, -(-prio // d) - 1)
            )  # ceil(P/d) - 1, clamped
            tie = (prio % d == 0) & (prio // d <= n_total[j]) & (j < si)
            same = si == j
            # for the doc's own source, docs ahead are exactly `rank`
            pos += np.where(same, rank, ahead + tie)
        out = {
            id_col: df[id_col].to_numpy(),
            source_col: df[source_col].to_numpy(),
            "source_rank": rank,
            "priority": prio,
            "interleave_pos": pos,
        }
        if shard_docs:
            out["shard"] = pos // shard_docs
        return pd.DataFrame(out)

    return narrow.groupby("__r").map_groups(per_range, batch_format="pandas")
