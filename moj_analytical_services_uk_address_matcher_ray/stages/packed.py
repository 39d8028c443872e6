"""Packed (flat numpy) representations of the comparison-ready feature store.

The round-2 broadcast scorer kept list-typed comparison columns as Python
objects per record — a dict per histogram, a frozenset per token set — and
evaluated ``hist_product`` / ``overlap_geq`` with a Python loop per pair.
Profiling (bench.py --actor-curve) showed those two kernels are ~65% of
scorer CPU and, worse, the pointer-chasing object graphs are the shared
DRAM-bandwidth ceiling that capped actor scaling past 8-16 actors.

This module packs each list column ONCE PER ACTOR into contiguous flat
arrays (uint64 key hashes + int64 offsets, plus rel_freq/count for
histograms) and evaluates whole batches of pairs with numpy:

- ``overlap_counts``: |set_l & set_r| per pair via one sort + searchsorted
  over the pair-salted key space (no dicts, no per-pair Python).
- ``hist_products``: P = prod(rel_freq ^ min(cnt_l, cnt_r)) per pair via the
  same matching trick + ``np.multiply.reduceat`` over left-order segments —
  bit-identical to the sequential per-entry loop it replaces (same factors,
  same multiply order, same float64 rounding).

Key hashing uses ``pandas.util.hash_array`` (SipHash, fixed key) — stable
across processes, so results are deterministic cluster-wide.  Histogram keys
hash the (tok, rel_freq) struct pair, mirroring the DuckDB map-entry
equality the reference relies on (splink_model.json list_reduce bands).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "PackedSets",
    "PackedHists",
    "pack_sets",
    "pack_hists",
    "split_parts",
    "overlap_counts",
    "hist_products",
]

#: odd 64-bit multiplier (golden-ratio); (pair_idx+1)*SALT is a bijection on
#: uint64, so salting keys by pair keeps cross-pair keys distinct.
_SALT = np.uint64(0x9E3779B97F4A7C15)


def _hash_str_array(vals: list) -> np.ndarray:
    """Deterministic uint64 hash of a list of strings/None."""
    arr = np.empty(len(vals), dtype=object)
    arr[:] = vals
    return pd.util.hash_array(arr, categorize=False)


@dataclass
class PackedSets:
    """A list<str> column as per-record UNIQUE key segments."""

    keys: np.ndarray  # uint64 flat, unique within each record's segment
    offsets: np.ndarray  # int64, len n+1
    isnull: np.ndarray  # bool per record (arrow null)
    lens: np.ndarray  # int64 per record (0 for null)


@dataclass
class PackedHists:
    """A list<struct<tok, rel_freq, count>> column as flat parallel arrays.

    Entry order within each record's segment is the arrow list order — the
    multiply order of the scalar ``hist_product`` loop this replaces.
    ``keys_sorted``/``cnt_sorted`` hold a per-segment key-sorted COPY built
    once at pack time: lookups binary-search it (so the probe side needs no
    per-chunk sort), while factors still come from the original-order
    arrays (so the multiply order — and the float rounding — is unchanged).
    """

    keys: np.ndarray  # uint64 hash of (tok, rel_freq)
    rf: np.ndarray  # float64
    cnt: np.ndarray  # float64 (counts; float so min() stays vectorised)
    offsets: np.ndarray  # int64, len n+1
    isnull: np.ndarray  # bool per record
    lens: np.ndarray  # int64 per record
    keys_sorted: np.ndarray | None = None  # per-segment sorted keys
    cnt_sorted: np.ndarray | None = None  # cnt aligned to keys_sorted


def _flatten_list_col(col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """ChunkedArray/Array of list type -> (flat child, offsets, isnull)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    isnull = np.asarray(col.is_null())
    offsets = col.offsets.to_numpy().astype(np.int64, copy=False)
    offsets = offsets - offsets[0]  # sliced arrays have a non-zero base
    flat = col.values
    # Arrow permits null slots with non-empty offset ranges; our producers
    # never emit them, but normalise defensively (cheap round-trip only in
    # that rare case).
    if isnull.any():
        lens = np.diff(offsets)
        if lens[isnull].sum() > 0:
            cleaned = pa.array(
                [None if null else v for v, null in zip(col.to_pylist(), isnull)],
                type=col.type,
            )
            return _flatten_list_col(cleaned)
    return flat, offsets, isnull


def pack_sets(col) -> PackedSets:
    """Pack a list<str> column, deduplicating keys within each record
    (overlap semantics are set intersection)."""
    flat, offsets, isnull = _flatten_list_col(col)
    keys = _hash_str_array(flat.to_pylist())
    n = len(offsets) - 1
    lens = np.diff(offsets)
    if len(keys):
        rec = np.repeat(np.arange(n, dtype=np.int64), lens)
        # sort within records, then drop duplicate (rec, key) entries
        order = np.lexsort((keys, rec))
        rs, ks = rec[order], keys[order]
        keep = np.ones(len(ks), dtype=bool)
        keep[1:] = (rs[1:] != rs[:-1]) | (ks[1:] != ks[:-1])
        rs, ks = rs[keep], ks[keep]
        new_lens = np.bincount(rs, minlength=n).astype(np.int64)
        new_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(new_lens, out=new_off[1:])
        return PackedSets(ks, new_off, isnull, new_lens)
    return PackedSets(keys.astype(np.uint64), offsets, isnull, lens.astype(np.int64))


def pack_hists(col) -> PackedHists:
    """Pack a list<struct<tok, rel_freq, count>> column."""
    flat, offsets, isnull = _flatten_list_col(col)
    toks = flat.field("tok").to_pylist()
    rf = flat.field("rel_freq").to_numpy(zero_copy_only=False).astype(np.float64)
    cnt = flat.field("count").to_numpy(zero_copy_only=False).astype(np.float64)
    kh = _hash_str_array(toks)
    # (tok, rel_freq) struct equality: mix the rel_freq bit pattern in
    keys = (kh * _SALT) ^ rf.view(np.uint64)
    lens = np.diff(offsets)
    n = len(offsets) - 1
    if len(keys):
        rec = np.repeat(np.arange(n, dtype=np.int64), lens)
        order = np.lexsort((keys, rec))
        keys_sorted = keys[order]
        cnt_sorted = cnt[order]
    else:
        keys_sorted = keys
        cnt_sorted = cnt
    return PackedHists(
        keys,
        rf,
        cnt,
        offsets,
        isnull,
        lens.astype(np.int64),
        keys_sorted=keys_sorted,
        cnt_sorted=cnt_sorted,
    )


def split_parts(col, part: int) -> np.ndarray:
    """DuckDB split_part(col, ' ', part) per record -> object array.
    NULL propagates (None), out-of-range -> ''."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pd.Series(col.to_pylist(), dtype=object)
    got = s.str.split(" ").str.get(part - 1)
    out = got.where(got.notna(), other=None)  # NaN -> None
    out = out.where(s.isna() | got.notna(), other="")  # out-of-range -> ''
    arr = np.empty(len(s), dtype=object)
    arr[:] = out.tolist()
    return arr


def _gather_segments(
    offsets: np.ndarray, lens: np.ndarray, take: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """For record indices ``take``, return (pair_idx, flat_idx) covering each
    record's segment — the vectorised 'explode' of variable-length slices."""
    seg_lens = lens[take]
    total = int(seg_lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    pair_idx = np.repeat(np.arange(len(take), dtype=np.int64), seg_lens)
    starts = offsets[take]
    seg_pos = np.zeros(len(take), dtype=np.int64)
    np.cumsum(seg_lens[:-1], out=seg_pos[1:])
    flat_idx = np.arange(total, dtype=np.int64) - np.repeat(seg_pos, seg_lens) + np.repeat(
        starts, seg_lens
    )
    return pair_idx, flat_idx


def _segment_lower_bound(
    probe: np.ndarray,
    keys_sorted: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorised per-segment lower bound: for probe[j], the first position
    in ``keys_sorted[lo[j]:hi[j]]`` (a SORTED segment) that is >= probe[j].
    Returns ``(pos, hit)``.  ~log2(max segment length) gather/compare
    passes — replaces the per-chunk global sort + searchsorted the old
    kernels used, whose two ~N-element argsorts were 69% of kernel time
    AND the dominant DRAM traffic (measured in /tmp-gone kprof; see
    BASELINE.md round 4)."""
    n = len(keys_sorted)
    lo = lo.copy()
    hi_b = hi.copy()
    end = hi
    while True:
        active = lo < hi_b
        if not active.any():
            break
        mid = (lo + hi_b) >> 1
        keymid = keys_sorted[np.minimum(mid, n - 1)]
        go = active & (keymid < probe)
        lo = np.where(go, mid + 1, lo)
        hi_b = np.where(active & ~go, mid, hi_b)
    pos = np.minimum(lo, max(n - 1, 0))
    if n == 0:
        return pos, np.zeros(len(probe), dtype=bool)
    hit = (lo < end) & (keys_sorted[pos] == probe)
    return pos, hit


def overlap_counts(
    pl: PackedSets, pr: PackedSets, take_l: np.ndarray, take_r: np.ndarray
) -> np.ndarray:
    """|keys(take_l[i]) & keys(take_r[i])| for each pair i, vectorised.

    ``pack_sets`` stores each record's keys sorted (and unique), so each
    left entry binary-searches its pair's RIGHT segment directly — no
    right-side gather, no per-chunk sorts."""
    n = len(take_l)
    pi_l, fi_l = _gather_segments(pl.offsets, pl.lens, take_l)
    if len(pi_l) == 0:
        return np.zeros(n, dtype=np.int64)
    probe = pl.keys[fi_l]
    lo = pr.offsets[take_r][pi_l]
    hi = lo + pr.lens[take_r][pi_l]
    _, hit = _segment_lower_bound(probe, pr.keys, lo, hi)
    return np.bincount(pi_l[hit], minlength=n).astype(np.int64)


def _pow_small_int_vec(rf: np.ndarray, c: np.ndarray) -> np.ndarray:
    """rf**c by repeated multiplication for small integer exponents — exactly
    rounded multiplies, so bit-identical to the scalar ``_pow_small_int``
    (scoring.py) regardless of numpy's SIMD pow kernel.  Entries with
    non-integer or large exponents fall back to ``**`` (same rule as the
    scalar side)."""
    ci = c.astype(np.int64)
    exact = (ci.astype(np.float64) == c) & (ci >= 0) & (ci <= 64)
    out = np.ones(len(rf), dtype=np.float64)
    rem = np.where(exact, ci, 0)
    while True:
        m = rem > 0
        if not m.any():
            break
        out[m] *= rf[m]
        rem[m] -= 1
    if not exact.all():
        nx = ~exact
        out[nx] = rf[nx] ** c[nx]
    return out


def _hist_sorted_view(p: PackedHists) -> tuple[np.ndarray, np.ndarray]:
    """(keys_sorted, cnt_sorted), building them on the fly for instances
    packed before the fields existed (adopted warm shards)."""
    if p.keys_sorted is not None:
        return p.keys_sorted, p.cnt_sorted
    if len(p.keys) == 0:
        return p.keys, p.cnt
    rec = np.repeat(np.arange(len(p.lens), dtype=np.int64), p.lens)
    order = np.lexsort((p.keys, rec))
    return p.keys[order], p.cnt[order]


def hist_products(
    pl: PackedHists, pr: PackedHists, take_l: np.ndarray, take_r: np.ndarray
) -> np.ndarray:
    """P = prod over shared (tok, rel_freq) keys of rel_freq^min(cnt_l,
    cnt_r) per pair — float-identical to the sequential scalar loop (factors
    in left-entry order, multiplied left to right).

    Each left entry binary-searches its pair's RIGHT segment in the
    pack-time key-sorted copy; left entries are never reordered, so the
    factor (multiply) order — and thus the float64 rounding — is exactly
    the scalar loop's."""
    n = len(take_l)
    out = np.ones(n, dtype=np.float64)
    pi_l, fi_l = _gather_segments(pl.offsets, pl.lens, take_l)
    if len(pi_l) == 0:
        return out
    keys_rs, cnt_rs = _hist_sorted_view(pr)
    probe = pl.keys[fi_l]
    lo = pr.offsets[take_r][pi_l]
    hi = lo + pr.lens[take_r][pi_l]
    pos, hit = _segment_lower_bound(probe, keys_rs, lo, hi)
    if not hit.any():
        return out
    # matched left entries, still in pair-major / left-entry order
    p_hit = pi_l[hit]
    rf_hit = pl.rf[fi_l[hit]]
    c_min = np.minimum(pl.cnt[fi_l[hit]], cnt_rs[pos[hit]])
    factors = _pow_small_int_vec(rf_hit, c_min)
    seg_starts = np.flatnonzero(np.r_[True, p_hit[1:] != p_hit[:-1]])
    prods = np.multiply.reduceat(factors, seg_starts)
    out[p_hit[seg_starts]] = prods
    return out
