"""Blocked candidate-pair generation (operator J6 of SURVEY.md §2.4).

The reference delegates this to Splink: a union of 18 blocking-rule
equi-joins, deduplicated across rules (splink_model.json:16-89).  Ray-Data
first, the same computation is ONE shuffle:

  1. parse each rule into per-side key expressions (``l.col = r.col``,
     ``list_extract``, ``split_part`` conjuncts — the reference's full rule
     grammar);
  2. both sides emit ``(rule_idx, block_key, side, <payload cols>)`` rows for
     every rule whose key is non-null (a vectorised ``map_batches`` flat-map);
  3. a single ``groupby(["rule_idx", "block_key"]).map_groups`` emits the
     l x r cross product per block, capped at ``max_pairs_per_block`` (the
     reference never needed a cap because postcode blocks are naturally
     small; at web scale a hot key would otherwise go quadratic — dropped
     pairs are counted in the metrics actor, never silently);
  4. cross-rule dedup: ``groupby(pair id).map_groups`` keeping the min
     ``rule_idx`` (deterministic first-rule-wins).

Skew handling: ``detect_hot_keys`` pre-counts per-(rule, key) rows with a
partial-aggregate pass; keys above ``hot_key_threshold`` are salted — the
larger side's key gets a ``#<hash(id) % n>`` suffix and the smaller side is
replicated into every salt bucket, so no single task sees the whole block.
"""

from __future__ import annotations

import hashlib
import os
import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..state.metrics import gauge_max_metric, inc_metric

KEY_SEP = "\x1f"
SALT_SEP = "\x1e"

# ---------------------------------------------------------------------------
# rule parsing (reference dialect: splink_model.json:16-89)
# ---------------------------------------------------------------------------

_RE_COL = re.compile(r'^(l|r)\."?(\w+)"?$')
_RE_LIST_EXTRACT = re.compile(r'^list_extract\((l|r)\."?(\w+)"?,\s*(\d+)\)$')
_RE_SPLIT_PART = re.compile(r"^split_part\((l|r)\.\"?(\w+)\"?,\s*' ',\s*(\d+)\)$")


@dataclass(frozen=True)
class KeyExpr:
    col: str
    op: str  # "col" | "list_extract" | "split_part"
    idx: int = 0

    def evaluate(self, t: pa.Table) -> pa.Array:
        """Vectorised evaluation -> string Array (nulls where undefined)."""
        import pyarrow.compute as pc

        arr = t[self.col]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if self.op == "col":
            if not pa.types.is_string(arr.type):
                arr = arr.cast(pa.string())
            return arr
        if self.op == "list_extract":
            # DuckDB list_extract: 1-based, NULL when out of range
            return _list_element(arr, self.idx - 1)
        if self.op == "split_part":
            # DuckDB split_part: 1-based, '' when out of range, NULL in ->
            # NULL out (three-valued logic, mirrored in scoring.split_part)
            parts = pc.split_pattern(arr, " ")
            got = _list_element(parts, self.idx - 1)
            # out-of-range on a non-null input folds to '' (not NULL)
            return pc.if_else(pc.is_valid(arr), pc.coalesce(got, ""), None)
        raise ValueError(self.op)


def _list_element(arr: pa.Array, i: int, /) -> pa.Array:
    """``arr[row][i]`` for a ListArray, NULL when the row is null or too
    short — a vectorised take through the list offsets (pyarrow's own
    ``pc.list_element`` raises on out-of-range instead of yielding NULL)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = np.asarray(arr.offsets)
    starts, ends = offsets[:-1], offsets[1:]
    valid = (ends - starts) > i
    if arr.null_count:
        valid &= ~np.asarray(arr.is_null())
    take = pa.array(starts + i, mask=~valid)
    vals = arr.values
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    out = vals.take(take)
    if not pa.types.is_string(out.type):
        out = out.cast(pa.string())
    return out


def _parse_expr(expr: str) -> tuple[str, KeyExpr]:
    expr = expr.strip()
    m = _RE_COL.match(expr)
    if m:
        return m.group(1), KeyExpr(m.group(2), "col")
    m = _RE_LIST_EXTRACT.match(expr)
    if m:
        return m.group(1), KeyExpr(m.group(2), "list_extract", int(m.group(3)))
    m = _RE_SPLIT_PART.match(expr)
    if m:
        return m.group(1), KeyExpr(m.group(2), "split_part", int(m.group(3)))
    raise ValueError(f"unsupported blocking expression: {expr!r}")


@dataclass
class BlockingRule:
    l_exprs: list[KeyExpr]
    r_exprs: list[KeyExpr]
    raw: str

    def columns(self, side: str) -> set[str]:
        exprs = self.l_exprs if side == "l" else self.r_exprs
        return {e.col for e in exprs}


def parse_blocking_rule(rule: str) -> BlockingRule:
    l_exprs: list[KeyExpr] = []
    r_exprs: list[KeyExpr] = []
    for conjunct in re.split(r"\s+and\s+", rule.strip(), flags=re.I):
        lhs, rhs = conjunct.split("=", 1)
        side_a, expr_a = _parse_expr(lhs)
        side_b, expr_b = _parse_expr(rhs)
        if side_a == side_b:
            raise ValueError(f"conjunct references one side twice: {conjunct!r}")
        if side_a == "l":
            l_exprs.append(expr_a)
            r_exprs.append(expr_b)
        else:
            l_exprs.append(expr_b)
            r_exprs.append(expr_a)
    return BlockingRule(l_exprs, r_exprs, rule)


def parse_blocking_rules(rules: list[str]) -> list[BlockingRule]:
    return [parse_blocking_rule(r) for r in rules]


# ---------------------------------------------------------------------------
# key derivation (step 2)
# ---------------------------------------------------------------------------


def derive_block_keys(
    t: pa.Table,
    rules: list[BlockingRule],
    *,
    side: str,  # "l" (canonical) | "r" (messy)
    carry_cols: list[str],
    hot_keys: dict[tuple[int, str], int] | None = None,
    salt_side: str = "l",
) -> pa.Table:
    """Flat-map one side's batch into (rule_idx, block_key, side, payload).

    Fully vectorised: per rule, key parts come from ``KeyExpr.evaluate``
    (Arrow kernels), the composite key from ``binary_join_element_wise``
    (null if any part is null — exactly the reference's equi-join
    semantics), and non-null rows are selected with one ``take``.  Only
    rows whose key is hot (salted — rare by construction) drop to Python.
    """
    import pyarrow.compute as pc

    hot = hot_keys or {}
    out_rule: list[int] = []
    out_key_arrays: list[pa.Array] = []
    out_take: list[int] = []
    chunks: list[tuple[np.ndarray, pa.Array, int]] = []  # (take, keys, rule)
    for rule_idx, rule in enumerate(rules):
        exprs = rule.l_exprs if side == "l" else rule.r_exprs
        cols = [e.evaluate(t) for e in exprs]
        keys = (
            cols[0]
            if len(cols) == 1
            else pc.binary_join_element_wise(*cols, KEY_SEP)
        )
        valid = np.asarray(pc.is_valid(keys))
        idx = np.nonzero(valid)[0]
        if len(idx) == 0:
            continue
        keys_nn = keys.take(pa.array(idx))
        hot_for_rule = {k: v for (ri, k), v in hot.items() if ri == rule_idx}
        if not hot_for_rule:
            chunks.append((idx, keys_nn, rule_idx))
            continue
        is_hot = np.asarray(
            pc.is_in(keys_nn, value_set=pa.array(list(hot_for_rule)))
        )
        cold = np.nonzero(~is_hot)[0]
        if len(cold):
            chunks.append((idx[cold], keys_nn.take(pa.array(cold)), rule_idx))
        # hot rows: salt (larger side) or replicate (smaller side), row-wise
        hot_pos = np.nonzero(is_hot)[0]
        hot_keys_py = keys_nn.take(pa.array(hot_pos)).to_pylist()
        for p, key in zip(idx[hot_pos].tolist(), hot_keys_py):
            n_salts = hot_for_rule[key]
            if side == salt_side:
                h = int(
                    hashlib.blake2b(
                        f"{rule_idx}|{p}|{key}".encode(), digest_size=4
                    ).hexdigest(),
                    16,
                )
                out_rule.append(rule_idx)
                out_key_arrays.append(f"{key}{SALT_SEP}{h % n_salts}")
                out_take.append(p)
            else:
                for s in range(n_salts):
                    out_rule.append(rule_idx)
                    out_key_arrays.append(f"{key}{SALT_SEP}{s}")
                    out_take.append(p)

    take_parts = [c[0] for c in chunks]
    key_parts = [c[1] for c in chunks]
    rule_parts = [np.full(len(c[0]), c[2], dtype=np.int32) for c in chunks]
    if out_take:  # salted residue
        take_parts.append(np.asarray(out_take, dtype=np.int64))
        key_parts.append(pa.array(out_key_arrays, pa.string()))
        rule_parts.append(np.asarray(out_rule, dtype=np.int32))
    if take_parts:
        take_all = np.concatenate(take_parts)
        key_all = pa.concat_arrays([pa.array(k) if not isinstance(k, pa.Array) else k for k in key_parts])
        rule_all = np.concatenate(rule_parts)
    else:
        take_all = np.empty(0, dtype=np.int64)
        key_all = pa.array([], pa.string())
        rule_all = np.empty(0, dtype=np.int32)
    payload = t.select(carry_cols).take(pa.array(take_all, pa.int64()))
    payload = payload.append_column("rule_idx", pa.array(rule_all))
    payload = payload.append_column("block_key", key_all)
    payload = payload.append_column(
        "side", pa.array([side] * len(take_all), pa.string())
    )
    return payload


# ---------------------------------------------------------------------------
# hot-key detection (optional skew pre-pass)
# ---------------------------------------------------------------------------


def detect_hot_keys(
    canon: "ray.data.Dataset",
    messy: "ray.data.Dataset",
    rules: list[BlockingRule],
    *,
    hot_key_threshold: int = 10_000,
    salt_rows: int = 5_000,
    id_col: str = "ukam_address_id",
) -> dict[tuple[int, str], int]:
    """Count per-(rule, key) rows on the larger (canonical) side with a
    partial-aggregate pass; return salt factors for keys above threshold.

    When the threshold is large enough (>= ~3200 rows) the count runs over a
    deterministic 1/16 row sample (hash of the row id) and scales up — a key
    at the threshold has an expected sample count of >= 200, so the relative
    sampling error is a few percent, far inside the 2x headroom a salt
    factor tolerates.  This cuts the pre-pass cost ~16x; small thresholds
    fall back to the exact count."""
    sample_mod = 16 if hot_key_threshold >= 3200 else 1

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if sample_mod > 1:
            import pandas as pd

            ids = t[id_col]
            ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
            if not pa.types.is_string(ids.type):
                ids = ids.cast(pa.string())
            h = pd.util.hash_array(
                ids.to_numpy(zero_copy_only=False), categorize=True
            )
            t = t.filter(pa.array(h % sample_mod == 0))
        rule_parts, key_parts, cnt_parts = [], [], []
        for rule_idx, rule in enumerate(rules):
            cols = [e.evaluate(t) for e in rule.l_exprs]
            keys = (
                cols[0]
                if len(cols) == 1
                else pc.binary_join_element_wise(*cols, KEY_SEP)
            )
            vc = pc.value_counts(pc.drop_null(keys))
            if len(vc) == 0:
                continue
            rule_parts.append(
                np.full(len(vc), rule_idx, dtype=np.int32)
            )
            key_parts.append(vc.field("values"))
            cnt_parts.append(vc.field("counts").cast(pa.int64()))
        if not rule_parts:
            return pa.table(
                {
                    "rule_idx": pa.array([], pa.int32()),
                    "block_key": pa.array([], pa.string()),
                    "count": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "rule_idx": pa.array(np.concatenate(rule_parts)),
                "block_key": pa.concat_arrays(key_parts),
                "count": pa.concat_arrays(cnt_parts),
            }
        )

    import pyarrow.compute as pc

    agg = (
        canon.map_batches(_partial, batch_format="pyarrow")
        .groupby(["rule_idx", "block_key"])
        .sum("count")
    )
    # filter to actual hot keys BEFORE the driver collect: the aggregated
    # (rule, key) table grows with the corpus (every distinct key), but hot
    # keys are rare by construction — iterating the full table on the
    # driver was O(corpus) serial time
    hot_only = agg.map_batches(
        lambda t: t.filter(
            pc.greater(pc.multiply(t["sum(count)"], sample_mod), hot_key_threshold)
        ),
        batch_format="pyarrow",
    )
    hot: dict[tuple[int, str], int] = {}
    for batch in hot_only.iter_batches(batch_format="pyarrow"):
        keys = zip(batch["rule_idx"].to_pylist(), batch["block_key"].to_pylist())
        for key, cnt in zip(keys, batch["sum(count)"].to_pylist()):
            hot[key] = max(2, (cnt * sample_mod + salt_rows - 1) // salt_rows)
    if hot:
        inc_metric("blocking.hot_keys", len(hot))
    return hot


# ---------------------------------------------------------------------------
# pair emission (steps 3-4)
# ---------------------------------------------------------------------------


def make_pair_emitter(
    carry_cols: list[str],
    *,
    max_pairs_per_block: int = 250_000,
    id_col: str = "ukam_address_id",
):
    """Per-BUCKET emitter (see stages/bucketing.py): each bucket holds many
    (rule_idx, block_key) groups; pairs for all of them are emitted with ONE
    Arrow ``take`` per side.  Pure-Arrow in and out so nested payload columns
    (list<struct> histograms) never round-trip through pandas object dtype.
    Blocks over the cap are deterministically truncated (smallest ids kept)
    and the dropped-pair count lands in the metrics actor — never silent."""

    def emit(g: pa.Table) -> pa.Table:
        n = g.num_rows
        empty = None
        if n == 0:
            empty = True
        if not empty:
            rules = np.asarray(g["rule_idx"].to_pylist(), dtype=np.int64)
            bkeys = g["block_key"].to_pylist()
            sides = np.asarray(g["side"].to_pylist(), dtype=object)
            ids = np.asarray(g[id_col].to_pylist(), dtype=object)
            comb = np.fromiter(
                (f"{r}\x1f{k}" for r, k in zip(rules, bkeys)), dtype=object, count=n
            )
            order = np.argsort(comb, kind="stable")
            comb_sorted = comb[order]
            boundaries = np.flatnonzero(
                np.concatenate(([True], comb_sorted[1:] != comb_sorted[:-1]))
            )
            li_all: list[int] = []
            ri_all: list[int] = []
            rule_all: list[int] = []
            dropped = 0
            for b_i, start in enumerate(boundaries):
                end = boundaries[b_i + 1] if b_i + 1 < len(boundaries) else n
                idxs = order[start:end]
                l_idx = idxs[sides[idxs] == "l"]
                r_idx = idxs[sides[idxs] == "r"]
                nl, nr = len(l_idx), len(r_idx)
                if nl == 0 or nr == 0:
                    continue
                if nl * nr > max_pairs_per_block:
                    dropped += nl * nr - max_pairs_per_block
                    keep_l = max(1, int(max_pairs_per_block**0.5))
                    keep_r = max(1, max_pairs_per_block // keep_l)
                    l_idx = l_idx[np.argsort(ids[l_idx], kind="stable")][:keep_l]
                    r_idx = r_idx[np.argsort(ids[r_idx], kind="stable")][:keep_r]
                    nl, nr = len(l_idx), len(r_idx)
                li_all.extend(np.repeat(l_idx, nr))
                ri_all.extend(np.tile(r_idx, nl))
                rule_all.extend([int(rules[idxs[0]])] * (nl * nr))
            if dropped:
                inc_metric("blocking.dropped_pairs", dropped)
            empty = not li_all
        if empty:
            payload = g.select(carry_cols).slice(0, 0)
            data = {f"{c}_l": payload[c] for c in carry_cols}
            data.update({f"{c}_r": payload[c] for c in carry_cols})
            data["rule_idx"] = pa.array([], pa.int32())
            return pa.table(data)
        lt = g.select(carry_cols).take(pa.array(li_all, pa.int64()))
        rt = g.select(carry_cols).take(pa.array(ri_all, pa.int64()))
        data = {f"{c}_l": lt[c] for c in carry_cols}
        data.update({f"{c}_r": rt[c] for c in carry_cols})
        data["rule_idx"] = pa.array(rule_all, pa.int32())
        return pa.table(data)

    return emit


def dedupe_pairs_first_rule_wins(pairs: "ray.data.Dataset", *, id_col: str = "ukam_address_id"):
    """Cross-rule dedup: one row per (id_l, id_r), min rule_idx wins.
    Bucketed shuffle + vectorised within-bucket first-of-key selection."""
    from .bucketing import bucketed_group_apply

    kl, kr = f"{id_col}_l", f"{id_col}_r"

    def pick_bucket(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g
        # Arrow-native pair keys: one C join + dictionary-encode (codes
        # group equal pairs; min-rule keep needs only adjacency, not
        # lexicographic order).  The per-row f-string loop this replaces
        # was the dedup barrier's CPU at 10^7-pair rescore streams.
        key = pc.binary_join_element_wise(
            g[kl].combine_chunks().cast(pa.string()),
            g[kr].combine_chunks().cast(pa.string()),
            "\x1f",
        )
        codes = np.asarray(key.dictionary_encode().indices, dtype=np.int64)
        rules = (
            g["rule_idx"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.lexsort((rules, codes))
        cs = codes[order]
        first = np.concatenate(([True], cs[1:] != cs[:-1]))
        return g.take(pa.array(order[first], pa.int64()))

    # audited for exchange="direct": min-rule-per-pair is order-insensitive
    # and the empty branch passes the input schema through
    return bucketed_group_apply(pairs, [kl, kr], pick_bucket, exchange="direct")


def generate_candidate_pairs(
    canon: "ray.data.Dataset",
    messy: "ray.data.Dataset",
    rules: list[str] | list[BlockingRule],
    *,
    carry_cols: list[str],
    max_pairs_per_block: int = 250_000,
    hot_key_threshold: int | None = None,
    id_col: str = "ukam_address_id",
    ordered_self_pairs: bool = False,
    dedupe: bool = True,
) -> "ray.data.Dataset":
    """J6 end-to-end: key derivation -> one groupby shuffle -> pair emission
    -> cross-rule dedup.  ``canon`` rows become ``*_l``, ``messy`` ``*_r``.

    ``ordered_self_pairs=True`` is the self-dedup mode (canon is messy): only
    pairs with ``id_l < id_r`` survive, so each unordered pair appears once
    and self-pairs never do — applied *before* the dedup shuffle to halve it.

    ``dedupe=False`` skips the cross-rule dedup shuffle — callers that score
    the pair stream with a fused threshold dedupe AFTER scoring instead (a
    pair scores identically under every rule, so deduping the few surviving
    rows is far cheaper than shuffling every raw candidate).
    """
    parsed = (
        parse_blocking_rules(rules) if rules and isinstance(rules[0], str) else rules
    )
    hot = None
    if hot_key_threshold:
        # a corpus smaller than the threshold cannot contain a hot key —
        # skip the pre-pass entirely (count() is free on the materialized
        # cleaned table every caller passes in)
        if canon.count() > hot_key_threshold:
            hot = detect_hot_keys(
                canon, messy, parsed, hot_key_threshold=hot_key_threshold
            )
    keyed_l = canon.map_batches(
        derive_block_keys,
        batch_format="pyarrow",
        fn_kwargs={
            "rules": parsed,
            "side": "l",
            "carry_cols": carry_cols,
            "hot_keys": hot,
        },
    )
    keyed_r = messy.map_batches(
        derive_block_keys,
        batch_format="pyarrow",
        fn_kwargs={
            "rules": parsed,
            "side": "r",
            "carry_cols": carry_cols,
            "hot_keys": hot,
        },
    )
    from .bucketing import bucketed_group_apply

    both = keyed_l.union(keyed_r)
    pairs = bucketed_group_apply(
        both,
        ["rule_idx", "block_key"],
        make_pair_emitter(
            [id_col], max_pairs_per_block=max_pairs_per_block, id_col=id_col
        ),
    )
    if ordered_self_pairs:
        pairs = pairs.map_batches(
            lambda t: t.filter(
                pa.compute.less(t[f"{id_col}_l"], t[f"{id_col}_r"])
            ),
            batch_format="pyarrow",
        )
    if dedupe:
        pairs = dedupe_pairs_first_rule_wins(pairs, id_col=id_col)

    # pairs are generated and deduped NARROW (ids + rule only) so the heavy
    # payload columns (token histograms) never ride the emission + dedup
    # shuffles; the payload is hash-joined back once per side afterwards.
    payload_cols = [c for c in carry_cols if c != id_col]
    if not payload_cols:
        return pairs
    from .joins import inner_join

    def _suffixed(side: str):
        def fn(t: pa.Table) -> pa.Table:
            data = {f"{id_col}_{side}": t[id_col]}
            for c in payload_cols:
                data[f"{c}_{side}"] = t[c]
            return pa.table(data)

        return fn

    pay_l = canon.map_batches(_suffixed("l"), batch_format="pyarrow")
    pay_r = messy.map_batches(_suffixed("r"), batch_format="pyarrow")
    out = inner_join(pairs, pay_l, on=f"{id_col}_l")
    out = inner_join(out, pay_r, on=f"{id_col}_r")
    return out


# ---------------------------------------------------------------------------
# broadcast-payload scoring (small-side path)
# ---------------------------------------------------------------------------


def _build_arrow_store(
    ds: "ray.data.Dataset", carry_cols: list[str]
) -> "ray.ObjectRef":
    """Broadcast feature store as ONE combined-chunk Arrow table.

    An Arrow table in plasma is read ZERO-COPY by every consumer —
    ``ray.get`` costs ~nothing per actor regardless of table size.  (The
    round-1 store was a Python dict of row tuples: each scorer actor paid a
    full 38 MB unpickle, ~7-8 s under 16-way contention on the 55k-row
    scaling corpus — the dominant anti-scaling term of the whole pipeline.)
    The id -> row-index map is rebuilt per actor from the id column (~50 ms
    for 10^5 rows); per-pair payload conversion happens per batch on the
    gathered Arrow rows instead of up front.  The concat/combine runs in a
    REMOTE task (block refs in, combined table out) so the driver never
    touches the bytes — the old driver-side combine was ~3s of serial time
    on the 180k-row store."""
    refs = ds.select_columns(carry_cols).to_arrow_refs()
    return _combine_store_blocks.remote(refs)


@ray.remote
def _combine_store_blocks(refs: list) -> pa.Table:
    import time as _time

    from ..state.metrics import inc_metric as _inc

    _t0 = _time.perf_counter()
    blocks = [b for b in ray.get(refs) if b.num_rows] or [ray.get(refs[0])]
    out = pa.concat_tables(blocks).combine_chunks()
    _inc("fused.store_combine_sec", _time.perf_counter() - _t0)
    return out


def _max_log2_contribution(comp, tf_tables: dict) -> float:
    """Upper bound on one comparison's log2 Bayes-factor contribution over
    ANY pair: the max across levels of log2(bf x largest-possible TF boost).
    Null levels contribute exactly 0."""
    import math

    best = None
    for lv in comp.levels:
        if lv.is_null:
            c = 0.0
        else:
            bf = float(lv.bf)
            if lv.tf_col and lv.tf_col in tf_tables and tf_tables[lv.tf_col]:
                min_tf = min(tf_tables[lv.tf_col].values())
                if min_tf > 0:
                    bf *= (lv.u / min_tf) ** lv.tf_weight
            c = math.log2(bf) if bf > 0 else float("-inf")
        best = c if best is None else max(best, c)
    return best if best is not None else 0.0


def _hist_dicts_from_arrow(col) -> list:
    """list<struct<tok, rel_freq, count>> column -> list of
    {(tok, rel_freq): count} dicts.

    ``to_pylist`` on list<struct> builds a Python dict PER STRUCT ENTRY
    (~4s for a 54k-row store); reading the flattened child fields instead
    and slicing by offsets is ~4x faster for the same output."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = col.values  # struct child region, offsets index into it
    toks = flat.field("tok").to_pylist()
    rfs = flat.field("rel_freq").to_pylist()
    cnts = flat.field("count").to_pylist()
    off = col.offsets.to_numpy()
    valid = col.is_valid().to_numpy(zero_copy_only=False)
    out = []
    for i in range(len(col)):
        if not valid[i]:
            out.append(None)
            continue
        s, e = off[i], off[i + 1]
        out.append({(toks[j], rfs[j]): cnts[j] for j in range(s, e)})
    return out


#: level kinds whose predicates the packed-store kernels replace entirely —
#: a column referenced ONLY by these kinds never enters the pandas view
_PACKED_KINDS = {
    "hist_product_lt",
    "overlap_geq",
    "null_or_empty_list",
    "split_part_equal",
    "null_any",
    "null_all",
    "null_any_level",
    "else",
}


@dataclass
class _ModelPlan:
    """Column plan for the packed/interned broadcast store: which columns
    are packed (hists/sets), dictionary-encoded to integer codes (scalar
    equality + TF keys — the pointer-chasing remover), and which still
    need object values in the pandas view (per-row string kinds)."""

    hist_cols: set
    set_cols: set
    split_cols: set  # {(col, part)}
    df_cols: set  # cols needing real values in the pandas view
    eq_groups: set  # {frozenset(cols)} sharing one code dictionary
    dig_cols: set  # digits_equal cols (codes over extracted digit runs)
    tf_cols: set  # TF-adjustment key cols (per-record tf value arrays)
    coded_cols: set  # all cols with raw codes (null checks ride the codes)


def _model_col_plan(model) -> _ModelPlan:
    hist_cols: set[str] = set()
    set_cols: set[str] = set()
    split_cols: set[tuple[str, int]] = set()
    df_cols: set[str] = set()
    null_cols: set[str] = set()
    eq_groups: set[frozenset] = set()
    dig_cols: set[str] = set()
    tf_cols: set[str] = set()
    for comp in model.comparisons:
        for lv in comp.levels:
            k, p = lv.kind, lv.params
            if k == "hist_product_lt":
                hist_cols.add(p["col"])
            elif k == "overlap_geq":
                set_cols.add(p["col"])
            elif k == "null_or_empty_list":
                set_cols.update(p["cols"])
            elif k == "split_part_equal":
                split_cols.add((p["col"], p["part"]))
            elif k in ("null_any", "null_all", "null_any_level"):
                null_cols.update(p["cols"])
            elif k == "else":
                pass
            elif k == "exact":
                eq_groups.add(frozenset((p["col"],)))
            elif k == "digits_equal":
                dig_cols.add(p["col"])
            elif k == "lev_leq":
                df_cols.add(p["col"])
            elif k == "pair_equal":
                eq_groups.add(frozenset((p["col_l"], p["col_r"])))
            elif k == "cross_equal":
                eq_groups.add(frozenset((p["col_a"], p["col_b"])))
            elif k == "flat_presence_mismatch":
                null_cols.update(("flat_positional", "flat_letter"))
            else:
                raise ValueError(f"unknown level kind {k!r}")
            if lv.tf_col:
                tf_cols.add(lv.tf_col)
    coded = set().union(*eq_groups) if eq_groups else set()
    coded |= tf_cols | dig_cols
    # a col referenced ONLY by null checks and not packed/coded must come
    # from the pandas view (isnull for packed/coded cols rides the store)
    df_cols |= null_cols - hist_cols - set_cols - coded
    return _ModelPlan(
        hist_cols=hist_cols,
        set_cols=set_cols,
        split_cols=split_cols,
        df_cols=df_cols,
        eq_groups=eq_groups,
        dig_cols=dig_cols,
        tf_cols=tf_cols,
        coded_cols=coded,
    )


class _BroadcastScorer:
    """Actor-pool stage over NARROW pairs: gather both sides' features from
    the broadcast Arrow store (zero-copy ray.get once per actor), score,
    filter, project.

    Heavy list-typed comparison columns (token histograms, fingerprint
    sets) are packed ONCE PER ACTOR into flat numpy arrays
    (stages/packed.py) and whole batches are evaluated with vectorised
    kernels — no per-record Python dicts/frozensets exist at all, which
    both removes the per-pair Python loops (~65% of round-2 scorer CPU)
    and cuts the pointer-chasing memory traffic that capped actor scaling
    on one box."""

    def __init__(
        self,
        store_l_ref,
        store_r_ref,
        model_ref,
        tf_ref,
        *,
        payload_cols: list[str],
        id_col: str,
        threshold: float | None,
        emit_cols: list[str] | None,
        warm_ref=None,
    ):
        import time as _time

        from .scoring import _ComparisonEvaluator, hist_to_dict

        _t0 = _time.perf_counter()
        self._warm_ref = warm_ref
        self.tab_l: pa.Table = ray.get(store_l_ref)
        self.tab_r: pa.Table = (
            self.tab_l if store_r_ref == store_l_ref else ray.get(store_r_ref)
        )
        # id -> store row resolution is Arrow ``pc.index_in`` against these
        # (zero-copy from plasma); the per-worker ``pd.Index`` builds they
        # replace cost 7+ cpu-s per job at the reference two-table shape
        # (object-dtype conversion + hash build per worker PROCESS).  The
        # pandas indexes remain as lazy properties for the unfused path.
        self.ids_l: pa.Array = self.tab_l[id_col].combine_chunks()
        self.ids_r: pa.Array = (
            self.ids_l
            if self.tab_r is self.tab_l
            else self.tab_r[id_col].combine_chunks()
        )
        self._idx_l = None
        self._idx_r = None
        inc_metric("fused.init_store_sec", _time.perf_counter() - _t0)
        _t0 = _time.perf_counter()
        model = ray.get(model_ref)
        tf = ray.get(tf_ref)
        self.tf_tables = tf or {}
        self.evaluators = [
            _ComparisonEvaluator(c, tf or {}) for c in model.comparisons
        ]
        self.prior = model.prior_log2_odds
        self.payload_cols = payload_cols
        self.id_col = id_col
        self.threshold = threshold
        self.emit_cols = emit_cols
        # packed-store plan: which cols are vectorised vs pandas-view
        plan = _model_col_plan(model)
        avail = set(payload_cols)
        self._hist_cols = plan.hist_cols & avail
        self._set_cols = plan.set_cols & avail
        self._split_cols = {(c, p) for c, p in plan.split_cols if c in avail}
        self._df_cols = [c for c in payload_cols if c in plan.df_cols]
        self._eq_groups = {g for g in plan.eq_groups if g <= avail}
        self._dig_cols = plan.dig_cols & avail
        # only string-typed columns are safe to dictionary-encode (float
        # NaN compares unequal to itself under `==` but would share a code)
        def _is_str(c: str) -> bool:
            try:
                ty = self.tab_l.schema.field(c).type
            except KeyError:
                return False
            return pa.types.is_string(ty) or pa.types.is_large_string(ty)

        self._eq_groups = {g for g in self._eq_groups if all(map(_is_str, g))}
        self._dig_cols = {c for c in self._dig_cols if _is_str(c)}
        self._tf_cols = {
            c for c in plan.tf_cols & avail if (tf or {}).get(c) and _is_str(c)
        }
        # null checks are served from per-store isnull arrays for EVERY col
        # the plan moved out of the pandas view, tf table present or not
        self._coded_cols = (
            (set().union(*self._eq_groups) if self._eq_groups else set())
            | self._dig_cols
            | {c for c in plan.tf_cols & avail if _is_str(c)}
        )
        # anything the plan kept out of the pandas view but we could not
        # code after all falls back to it: cols of dropped eq groups, dropped
        # digits cols, and TF keys with a table but no code path
        plan_eq_cols = set().union(*plan.eq_groups) if plan.eq_groups else set()
        kept_eq_cols = (
            set().union(*self._eq_groups) if self._eq_groups else set()
        )
        demoted = (
            (plan_eq_cols - kept_eq_cols)
            | (plan.dig_cols - self._dig_cols)
            # membership, not truthiness: a PRESENT-but-EMPTY tf table means
            # the col is not coded (`_tf_cols` requires a non-empty table)
            # yet the evaluator still takes its TF branch, so the col must
            # be available in the pandas view for the per-row fallback
            | ({c for c in plan.tf_cols if c in (tf or {})} - self._tf_cols)
        ) & avail
        for c in payload_cols:
            if c in demoted and c not in self._df_cols:
                self._df_cols.append(c)
        self._packed_cache: dict = {}  # (side, col) -> PackedSets/PackedHists
        self._split_cache: dict = {}  # (side, col, part) -> object ndarray
        self._code_cache: dict = {}  # group key -> {(col, side): int64 codes}
        self._tf_cache: dict = {}  # col -> (tf_l float64, tf_r float64)
        self._isnull_cache: dict = {}  # col -> (bool ndarray l, bool ndarray r)
        # branch-and-bound pruning state: per-comparison upper bound on the
        # log2 Bayes-factor contribution (incl. the largest possible TF
        # boost), evaluation ordered by descending bound so pairs that
        # provably cannot reach the threshold stop being evaluated early.
        self._ev_max_log2 = [
            _max_log2_contribution(ev.comp, tf or {}) for ev in self.evaluators
        ]
        self._eval_order = sorted(
            range(len(self.evaluators)),
            key=lambda i: -self._ev_max_log2[i],
        )
        rest = 0.0
        self._suffix_max = [0.0] * len(self._eval_order)
        for pos in range(len(self._eval_order) - 1, -1, -1):
            self._suffix_max[pos] = rest
            rest += self._ev_max_log2[self._eval_order[pos]]
        # per-record comparison-ready columns for the pandas view (strings /
        # scalars only — list columns live in the packed store), converted
        # ONCE PER ACTOR lazily on first use.
        self._hist_to_dict = hist_to_dict
        self._ready_l: dict[str, np.ndarray] = {}
        self._ready_r: dict[str, np.ndarray] = {}
        inc_metric("fused.init_plan_sec", _time.perf_counter() - _t0)
        _t0 = _time.perf_counter()
        self._warm_refs: dict | None = None
        self._warm_adopted: set = set()
        self._warm_waited: set = set()
        if warm_ref is not None:
            if isinstance(warm_ref, dict):
                # per-cache ObjectRefs: adopt LAZILY on first use
                # (_adopt_warm), so a worker deserialises only the caches
                # its buckets actually touch.  The numpy-payload caches
                # (packed/codes/tf/isnull) come out of plasma zero-copy;
                # the ready/split caches hold OBJECT arrays (strings, hist
                # dicts, frozensets) that unpickle at Python speed —
                # eagerly adopting those cost ~9 s per worker process at a
                # 540k-row store (measured: 459 of 547 cpu-seconds of init).
                self._warm_refs = warm_ref
            else:
                # legacy single-ref form: adopt everything eagerly
                state = ray.get(warm_ref)
                self._packed_cache = dict(state["packed"])
                self._split_cache = dict(state["split"])
                self._code_cache = dict(state["codes"])
                self._tf_cache = dict(state["tf"])
                self._isnull_cache = dict(state["isnull"])
                self._ready_l = dict(state["ready_l"])
                self._ready_r = (
                    self._ready_l
                    if self.tab_r is self.tab_l
                    else dict(state["ready_r"])
                )
            inc_metric("fused.init_warm_adopt_sec", _time.perf_counter() - _t0)

    # caches that are EXPENSIVE to rebuild locally (pack_hists/pack_sets /
    # dictionary-encodes over the whole store — tens of seconds at 540k
    # rows) block until their shards land; the object-array ready/split
    # caches are cheap to rebuild (scalar to_pylist / split_parts), so a
    # late shard is skipped rather than stalling the bucket task.
    _WARM_BLOCKING = frozenset({"packed", "codes", "tf", "isnull"})

    @property
    def idx_l(self) -> "pd.Index":
        if self._idx_l is None:
            self._idx_l = pd.Index(self.ids_l.to_pandas())
        return self._idx_l

    @property
    def idx_r(self) -> "pd.Index":
        if self.tab_r is self.tab_l:
            return self.idx_l
        if self._idx_r is None:
            self._idx_r = pd.Index(self.ids_r.to_pandas())
        return self._idx_r

    def resolve_rows(self, ids: pa.Array, side: str) -> np.ndarray:
        """id -> store row (int64, -1 for missing) via one C hash probe."""
        import pyarrow.compute as pc

        vs = self.ids_l if (side == "l" or self.tab_r is self.tab_l) else self.ids_r
        pos = pc.index_in(ids, value_set=vs)
        return (
            pc.fill_null(pos, -1)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )

    def _adopt_warm(self, name: str) -> None:
        """First-use adoption of one warm-cache's shards from plasma.

        Per-cache shard lists (no combine barrier): adopting ``packed``
        waits only on the packed shards.  Measured failure modes this
        replaces: one monolithic warm object made every worker's first
        bucket block 14-17 s on the WHOLE build; a 2 s-timeout skip made
        all 32 workers rebuild pack_hists locally (~5000 cpu-seconds)."""
        index = self._warm_refs
        if index is None or name in self._warm_adopted:
            return
        refs = index.get(name)
        if not refs:
            self._warm_adopted.add(name)
            return
        import time as _time

        _t0 = _time.perf_counter()
        if name in self._WARM_BLOCKING:
            done, pending = refs, []
        else:
            timeout = 2.0 if name not in self._warm_waited else 0.0
            self._warm_waited.add(name)
            done, pending = ray.wait(
                list(refs), num_returns=len(refs), timeout=timeout
            )
            if pending:
                inc_metric(f"fused.warm_notready_{name}", 1)
                index[name] = pending  # retry the stragglers next call
            if not done:
                return
        target = {
            "packed": self._packed_cache,
            "split": self._split_cache,
            "codes": self._code_cache,
            "tf": self._tf_cache,
            "isnull": self._isnull_cache,
            "ready_l": self._ready_l,
            "ready_r": self._ready_r,
        }[name]
        for part in ray.get(list(done)):
            target.update(part.get(name, {}))
        if name == "ready_l" and self.tab_r is self.tab_l:
            self._ready_r.update(self._ready_l)
        if not pending:
            self._warm_adopted.add(name)
        inc_metric(f"fused.warm_adopt_{name}_sec", _time.perf_counter() - _t0)

    def warm_and_export(self) -> dict:
        """Build every lazy cache (by scoring a tiny threshold-free batch)
        and export the state for plasma sharing."""
        n = min(64, self.tab_l.num_rows, self.tab_r.num_rows)
        if n:
            take = np.arange(n, dtype=np.int64)
            saved = self.threshold
            self.threshold = None  # B&B pruning would skip later evaluators
            self._warming = True
            try:
                self.score_taken(take, take[::-1].copy(), pa.array([0] * n, pa.int32()))
            finally:
                self.threshold = saved
                self._warming = False
        return {
            "packed": self._packed_cache,
            "split": self._split_cache,
            "codes": self._code_cache,
            "tf": self._tf_cache,
            "isnull": self._isnull_cache,
            "ready_l": self._ready_l,
            "ready_r": {} if self.tab_r is self.tab_l else self._ready_r,
        }

    def _ready_col(self, side: str, c: str) -> np.ndarray:
        self._adopt_warm(
            "ready_l" if side == "l" or self.tab_r is self.tab_l else "ready_r"
        )
        cache = self._ready_l if side == "l" else self._ready_r
        got = cache.get(c)
        if got is not None:
            return got
        tab = self.tab_l if side == "l" else self.tab_r
        if side == "r" and self.tab_r is self.tab_l:
            cache = self._ready_l  # share conversions in self-dedup mode
            got = cache.get(c)
            if got is not None:
                self._ready_r[c] = got
                return got
        if c.endswith("_hist"):
            vals = _hist_dicts_from_arrow(tab[c])
        elif pa.types.is_list(tab[c].type) or pa.types.is_large_list(tab[c].type):
            vals = [frozenset(v) if v is not None else None for v in tab[c].to_pylist()]
        else:
            vals = tab[c].to_pylist()
        arr = np.empty(len(vals), dtype=object)
        arr[:] = vals
        cache[c] = arr
        if side == "r" and self.tab_r is self.tab_l:
            self._ready_r[c] = arr
        return arr

    def _packed(self, side: str, c: str):
        """Packed flat-array form of a list column, built once per actor and
        shared between sides in self-dedup mode."""
        from .packed import pack_hists, pack_sets

        self._adopt_warm("packed")
        tab = self.tab_l if side == "l" else self.tab_r
        if side == "r" and self.tab_r is self.tab_l:
            side = "l"
        key = (side, c)
        got = self._packed_cache.get(key)
        if got is None:
            got = pack_hists(tab[c]) if c in self._hist_cols else pack_sets(tab[c])
            self._packed_cache[key] = got
        return got

    def _split_arr(self, side: str, c: str, part: int) -> np.ndarray:
        from .packed import split_parts

        self._adopt_warm("split")

        tab = self.tab_l if side == "l" else self.tab_r
        if side == "r" and self.tab_r is self.tab_l:
            side = "l"
        key = (side, c, part)
        got = self._split_cache.get(key)
        if got is None:
            got = split_parts(tab[c], part)
            self._split_cache[key] = got
        return got

    @staticmethod
    def _store_col(tab: pa.Table, c: str) -> pa.Array:
        arr = tab[c]
        return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr

    def _group_codes(self, cols: frozenset, *, digits: bool = False) -> dict:
        """Dictionary-encode a group of scalar columns (both stores) into
        ONE shared vocabulary, once per actor: scalar equality levels then
        compare int64 codes instead of chasing Python-object pointers —
        the memory-traffic term that capped same-box actor scaling.
        Returns {(col, side): int64 codes} with -1 for null."""
        import pyarrow.compute as pc

        self._adopt_warm("codes")
        key = ("dig" if digits else "raw", cols)
        got = self._code_cache.get(key)
        if got is not None:
            return got
        self_dedup = self.tab_r is self.tab_l
        parts: list[pa.Array] = []
        spans: list[tuple[str, str, int, int]] = []
        off = 0
        ordered = sorted(cols)
        for side, tab in (("l", self.tab_l), ("r", self.tab_r)):
            if side == "r" and self_dedup:
                break
            for c in ordered:
                arr = self._store_col(tab, c)
                if digits:
                    arr = pc.struct_field(
                        pc.extract_regex(arr, pattern=r"(?P<d>\d+)"), "d"
                    )
                parts.append(arr)
                spans.append((c, side, off, len(arr)))
                off += len(arr)
        enc = pa.concat_arrays(parts).dictionary_encode()
        codes_all = np.asarray(pc.fill_null(enc.indices, -1), dtype=np.int64)
        out: dict = {}
        for c, side, start, ln in spans:
            out[(c, side)] = codes_all[start : start + ln]
        if self_dedup:
            for c in ordered:
                out[(c, "r")] = out[(c, "l")]
        self._code_cache[key] = out
        return out

    def _tf_arrays(self, c: str) -> tuple[np.ndarray, np.ndarray]:
        """Per-record TF values for a TF-adjustment key col, resolved once
        per actor through the shared code dictionary (NaN = no tf entry or
        null value); per-pair lookup is then a float gather."""
        self._adopt_warm("tf")
        got = self._tf_cache.get(c)
        if got is not None:
            return got
        import pyarrow.compute as pc

        tf = self.tf_tables.get(c) or {}
        self_dedup = self.tab_r is self.tab_l
        al = self._store_col(self.tab_l, c)
        if self_dedup:
            enc = al.dictionary_encode()
            codes = [np.asarray(pc.fill_null(enc.indices, -1), dtype=np.int64)]
        else:
            ar = self._store_col(self.tab_r, c)
            enc = pa.concat_arrays([al, ar]).dictionary_encode()
            codes_all = np.asarray(pc.fill_null(enc.indices, -1), dtype=np.int64)
            codes = [codes_all[: len(al)], codes_all[len(al) :]]
        vocab = enc.dictionary.to_pylist()
        tf_by_code = np.full(len(vocab) + 1, np.nan)  # slot -1 = null
        for ci, v in enumerate(vocab):
            t = tf.get(v)
            if t is not None:
                tf_by_code[ci] = t
        res_l = tf_by_code[codes[0]]
        res_r = res_l if self_dedup else tf_by_code[codes[1]]
        self._tf_cache[c] = (res_l, res_r)
        return self._tf_cache[c]

    def _isnull_arrays(self, c: str) -> tuple[np.ndarray, np.ndarray]:
        self._adopt_warm("isnull")
        got = self._isnull_cache.get(c)
        if got is not None:
            return got
        nl = np.asarray(self._store_col(self.tab_l, c).is_null())
        nr = (
            nl
            if self.tab_r is self.tab_l
            else np.asarray(self._store_col(self.tab_r, c).is_null())
        )
        self._isnull_cache[c] = (nl, nr)
        return self._isnull_cache[c]

    def _pre_for(self, ev, take_l: np.ndarray, take_r: np.ndarray) -> dict:
        """Batch-aligned vectorised arrays for one comparison's levels,
        computed from the packed store over exactly the given pair rows."""
        from .packed import hist_products, overlap_counts

        pre: dict = {}

        def _isnull_pre(c: str):
            if ("isnull", c, "l") not in pre:
                nl, nr = self._isnull_arrays(c)
                pre[("isnull", c, "l")] = nl[take_l]
                pre[("isnull", c, "r")] = nr[take_r]

        for lv in ev.comp.levels:
            k, p = lv.kind, lv.params
            if lv.tf_col and lv.tf_col in self._tf_cols:
                if ("tf", lv.tf_col) not in pre:
                    tfl, tfr = self._tf_arrays(lv.tf_col)
                    pre[("tf", lv.tf_col)] = (tfl[take_l], tfr[take_r])
            if k == "exact":
                g = frozenset((p["col"],))
                if g in self._eq_groups and ("eq", p["col"]) not in pre:
                    codes = self._group_codes(g)
                    pre[("eq", p["col"])] = (
                        codes[(p["col"], "l")][take_l],
                        codes[(p["col"], "r")][take_r],
                    )
            elif k == "pair_equal":
                g = frozenset((p["col_l"], p["col_r"]))
                key = ("eqpair", p["col_l"], p["col_r"])
                if g in self._eq_groups and key not in pre:
                    codes = self._group_codes(g)
                    pre[key] = (
                        codes[(p["col_l"], "l")][take_l],
                        codes[(p["col_r"], "r")][take_r],
                    )
            elif k == "cross_equal":
                a, b = p["col_a"], p["col_b"]
                g = frozenset((a, b))
                key = ("eqcross", a, b)
                if g in self._eq_groups and key not in pre:
                    codes = self._group_codes(g)
                    pre[key] = (
                        codes[(a, "l")][take_l],
                        codes[(b, "r")][take_r],
                        codes[(b, "l")][take_l],
                        codes[(a, "r")][take_r],
                    )
            elif k == "digits_equal":
                c = p["col"]
                if c in self._dig_cols and ("eqdig", c) not in pre:
                    codes = self._group_codes(frozenset((c,)), digits=True)
                    pre[("eqdig", c)] = (
                        codes[(c, "l")][take_l],
                        codes[(c, "r")][take_r],
                    )
            elif k == "flat_presence_mismatch":
                for c in ("flat_positional", "flat_letter"):
                    if c not in self._df_cols and c in self._coded_cols:
                        _isnull_pre(c)
            if k == "hist_product_lt":
                c = p["col"]
                if ("hist", c) not in pre and c in self._hist_cols:
                    pre[("hist", c)] = hist_products(
                        self._packed("l", c), self._packed("r", c), take_l, take_r
                    )
            elif k == "overlap_geq":
                c = p["col"]
                if ("ov", c) not in pre and c in self._set_cols:
                    pre[("ov", c)] = overlap_counts(
                        self._packed("l", c), self._packed("r", c), take_l, take_r
                    )
            elif k == "null_or_empty_list":
                for c in p["cols"]:
                    if c not in (self._set_cols | self._hist_cols):
                        continue
                    pl, pr = self._packed("l", c), self._packed("r", c)
                    if ("nullempty", c, "l") not in pre:
                        pre[("nullempty", c, "l")] = (pl.isnull | (pl.lens == 0))[take_l]
                        pre[("nullempty", c, "r")] = (pr.isnull | (pr.lens == 0))[take_r]
            elif k in ("null_any", "null_all", "null_any_level"):
                for c in p["cols"]:
                    # needed when the col is packed- or code-only (not in
                    # the pandas view)
                    if c in self._df_cols:
                        continue
                    if c in (self._set_cols | self._hist_cols):
                        pl, pr = self._packed("l", c), self._packed("r", c)
                        if ("isnull", c, "l") not in pre:
                            pre[("isnull", c, "l")] = pl.isnull[take_l]
                            pre[("isnull", c, "r")] = pr.isnull[take_r]
                    elif c in self._coded_cols:
                        _isnull_pre(c)
            elif k == "split_part_equal":
                c, part = p["col"], p["part"]
                if (c, part) in self._split_cols:
                    pre[("split", c, part, "l")] = self._split_arr("l", c, part)[take_l]
                    pre[("split", c, part, "r")] = self._split_arr("r", c, part)[take_r]
        return pre

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        kl, kr = f"{self.id_col}_l", f"{self.id_col}_r"
        if n == 0:
            empty = t
            empty = empty.append_column("match_weight", pa.array([], pa.float64()))
            empty = empty.append_column(
                "match_probability", pa.array([], pa.float64())
            )
            return empty.select(self.emit_cols) if self.emit_cols else empty
        take_l = self.idx_l.get_indexer(t[kl].to_pandas())
        take_r = self.idx_r.get_indexer(t[kr].to_pandas())
        if (take_l < 0).any() or (take_r < 0).any():
            raise KeyError(
                f"pair ids missing from the broadcast feature store "
                f"({int((take_l < 0).sum()) + int((take_r < 0).sum())} rows)"
            )
        rule_idx = t["rule_idx"]
        rule_idx = (
            rule_idx.combine_chunks()
            if isinstance(rule_idx, pa.ChunkedArray)
            else rule_idx
        )
        return self.score_taken(take_l, take_r, rule_idx)

    def empty_scored(self) -> pa.Table:
        """Zero-row output table with the exact emit schema."""
        return self.score_taken(
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            pa.array([], pa.int32()),
        )

    def score_taken(
        self,
        take_l: np.ndarray,
        take_r: np.ndarray,
        rule_idx: pa.Array,
        r_best: np.ndarray | None = None,
    ) -> pa.Table:
        """Score pairs given as STORE ROW INDICES (skips the id lookup —
        the fused emit+score bucket path resolves ids to store rows once
        per bucket member, not once per pair).

        ``r_best`` (optional, per-pair float64): the running best
        match_weight already seen for each pair's r record — a top-1
        consumer's per-record branch-and-bound threshold.  A pair is
        pruned only when its weight bound cannot STRICTLY beat its
        record's best (``nextafter`` keeps exact ties, whose min-id_l
        tie-break a later pair could still win), so the downstream top-1
        is exact."""
        import pandas as pd

        n = len(take_l)
        kl, kr = f"{self.id_col}_l", f"{self.id_col}_r"
        # evaluation view: only the columns per-row kinds actually read —
        # list columns are evaluated from the packed store instead
        df_data: dict = {}
        for c in self._df_cols:
            df_data[f"{c}_l"] = self._ready_col("l", c)[take_l]
        for c in self._df_cols:
            df_data[f"{c}_r"] = self._ready_col("r", c)[take_r]
        df = pd.DataFrame(df_data, copy=False)
        if not df_data:
            df = pd.DataFrame(index=np.arange(n))

        from ..state.metrics import inc_metric

        if n and not getattr(self, "_warming", False):
            inc_metric("scoring.pairs_scored", n)
        mw = np.full(n, self.prior, dtype=np.float64)
        if n == 0:
            keep = np.zeros(0, dtype=bool)
        elif self.threshold is None:
            for ev in self.evaluators:
                _, log2_bf = ev.evaluate(df, self._pre_for(ev, take_l, take_r))
                mw += log2_bf
            keep = np.ones(n, dtype=bool)
        else:
            # branch-and-bound: evaluate comparisons in descending
            # max-contribution order; a pair whose weight plus the sum of
            # the remaining comparisons' maxima cannot clear the threshold
            # is dropped before the expensive per-row comparisons run.
            # Output-identical to full evaluation (pruned rows are exactly
            # the rows the final threshold filter would discard).
            if r_best is not None:
                # per-pair threshold: the record's running best (strictly-
                # beat semantics — nextafter keeps exact ties alive)
                thr = np.maximum(
                    self.threshold, np.nextafter(r_best, -np.inf)
                )
            else:
                thr = None
            active = np.arange(n, dtype=np.int64)
            for pos, ei in enumerate(self._eval_order):
                if active.size == 0:
                    break
                sub = df if active.size == n else df.take(active)
                pre = self._pre_for(
                    self.evaluators[ei], take_l[active], take_r[active]
                )
                _, log2_bf = self.evaluators[ei].evaluate(sub, pre)
                mw[active] += log2_bf
                bound_ok = mw[active] + self._suffix_max[pos] > (
                    self.threshold if thr is None else thr[active]
                )
                if not bound_ok.all():
                    active = active[bound_ok]
            keep = np.zeros(n, dtype=bool)
            keep[active] = True
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        id_l_arr = self._store_col(self.tab_l, self.id_col)
        id_r_arr = self._store_col(self.tab_r, self.id_col)
        out: dict = {
            kl: id_l_arr.take(pa.array(take_l[keep], pa.int64())),
            kr: id_r_arr.take(pa.array(take_r[keep], pa.int64())),
            "rule_idx": rule_idx.take(idx),
            "match_weight": pa.array(mw[keep], pa.float64()),
            "match_probability": pa.array(
                (2.0 ** mw[keep]) / (1.0 + 2.0 ** mw[keep]), pa.float64()
            ),
        }
        # nested payload columns are only materialised when the caller asked
        # for them (e.g. the rescore flow) — the dedup flow emits ids + mw
        wanted = self.emit_cols or (
            [kl, kr, "rule_idx"]
            + [f"{c}_{s}" for c in self.payload_cols for s in ("l", "r")]
            + ["match_weight", "match_probability"]
        )
        if any(name not in out for name in wanted):
            kept_l = pa.array(take_l[keep], pa.int64())
            kept_r = pa.array(take_r[keep], pa.int64())
            for name in wanted:
                if name in out:
                    continue
                for s, tab, kept in (("_l", self.tab_l, kept_l), ("_r", self.tab_r, kept_r)):
                    if name.endswith(s) and name[: -len(s)] in self.payload_cols:
                        out[name] = tab[name[: -len(s)]].take(kept)
                        break
        return pa.table({k: out[k] for k in wanted if k in out})


def _broadcast_score(
    pairs: "ray.data.Dataset",
    canon: "ray.data.Dataset",
    messy: "ray.data.Dataset",
    model,
    *,
    tf_tables,
    carry_cols: list[str],
    threshold: float | None,
    emit_cols: list[str] | None,
    id_col: str,
) -> "ray.data.Dataset":
    payload_cols = [c for c in carry_cols if c != id_col]
    store_l_ref = _build_arrow_store(canon, carry_cols)
    store_r_ref = (
        store_l_ref if messy is canon else _build_arrow_store(messy, carry_cols)
    )
    model_ref = ray.put(model)
    tf_ref = ray.put(tf_tables or {})
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # autoscaling pool: grows toward cpus-2 when upstream keeps it fed, but
    # never reserves every slot (which would starve pair emission/dedup);
    # actor init is ~zero-cost (zero-copy Arrow store), so ramping is cheap.
    # On tiny clusters the MINIMUM matters: a floor of 2 actors on 2 CPUs
    # reserves the whole machine and deadlocks the upstream tasks.
    pool = (max(1, min(2, cpus // 4)), max(2, cpus - 2))
    # <=2-CPU clusters: a 1-CPU actor would reserve the machine and
    # deadlock the upstream map tasks (Ray schedules by resource, and the
    # pool's floor actor never releases its slot).  Zero-CPU actors
    # oversubscribe slightly but keep the pipeline live.
    actor_cpus = 1 if cpus > 2 else 0
    return pairs.map_batches(
        _BroadcastScorer,
        fn_constructor_args=(store_l_ref, store_r_ref, model_ref, tf_ref),
        fn_constructor_kwargs={
            "payload_cols": payload_cols,
            "id_col": id_col,
            "threshold": threshold,
            "emit_cols": emit_cols,
        },
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=pool,
        num_cpus=actor_cpus,
    )


# ---------------------------------------------------------------------------
# fused pair EMISSION + scoring: the candidate-pair stream never exists
# ---------------------------------------------------------------------------

_FUSED_SCORER_CACHE: dict = {}


@ray.remote
def _build_warm_scorer_state(refs: tuple, ctor_kwargs: dict) -> dict:
    """One-off remote build of the scorer's lazy caches (packed stores,
    code dictionaries, TF gathers) so every bucket task / actor adopts them
    zero-copy from plasma instead of rebuilding (~3.4s per process at a
    180k-row store)."""
    store_l_ref, store_r_ref, model_ref, tf_ref = refs
    sc = _BroadcastScorer(store_l_ref, store_r_ref, model_ref, tf_ref, **ctor_kwargs)
    return sc.warm_and_export()


_WARM_EXPORT_KEYS = ("packed", "split", "codes", "tf", "isnull", "ready_l", "ready_r")


@ray.remote(num_cpus=0)
def _warm_part(refs: tuple, ctor_kwargs: dict, jobs: list) -> dict:
    """Build a SUBSET of the scorer's lazy caches (one parallel shard of
    the warm build).

    ``num_cpus=0``: these seconds-long builds must not queue behind the
    saturating emission map tasks — a late warm build stalls every bucket
    task's first adoption (or, with non-blocking adopt, wastes the build).
    The brief oversubscription is bounded by the shard count."""
    store_l_ref, store_r_ref, model_ref, tf_ref = refs
    sc = _BroadcastScorer(store_l_ref, store_r_ref, model_ref, tf_ref, **ctor_kwargs)
    for kind, args in jobs:
        if kind == "packed":
            sc._packed(*args)
        elif kind == "codes":
            sc._group_codes(frozenset(args))
        elif kind == "codes_dig":
            sc._group_codes(frozenset(args), digits=True)
        elif kind == "split":
            sc._split_arr(*args)
        elif kind == "tf":
            sc._tf_arrays(args)
        elif kind == "isnull":
            sc._isnull_arrays(args)
        elif kind == "ready":
            sc._ready_col(*args)
    return {
        "packed": sc._packed_cache,
        "split": sc._split_cache,
        "codes": sc._code_cache,
        "tf": sc._tf_cache,
        "isnull": sc._isnull_cache,
        "ready_l": sc._ready_l,
        "ready_r": {} if sc.tab_r is sc.tab_l else sc._ready_r,
    }


def launch_warm_scorer_build(
    refs: tuple,
    ctor_kwargs: dict,
    *,
    only_l: bool = False,
    base_index: dict | None = None,
):
    """PARALLEL warm build: the single-task form serialises ~all the packed
    conversions (8s+ at a 335k-row store) on one core while the rest of the
    cluster idles; here each heavy cache entry (a packed column, a code
    dictionary, a pandas-view conversion) is its own remote task and a tiny
    combine task merges the shards.  Cache entries are adopt-or-rebuild, so
    an enumeration miss only costs a lazy per-process rebuild later.

    ``only_l=True``: launch ONLY the l-side single-store caches (packed
    columns + ready object arrays) — the head-start form callers use via
    ``prepare_scoring_warmup`` while the r side is still being cleaned
    (pass ``store_r_ref = store_l_ref``; those caches never touch the r
    store).  ``base_index``: an ``only_l`` result to merge — its l-side
    jobs are skipped here and its shard refs folded into the returned
    index, so adoption sees one combined shard list per cache."""
    store_l_ref, store_r_ref, model_ref, tf_ref = refs
    sc = _BroadcastScorer(
        store_l_ref, store_r_ref, model_ref, tf_ref, **ctor_kwargs
    )  # enumeration only — ctor is cheap, caches stay lazy
    self_dedup = sc.tab_r is sc.tab_l
    sides = ("l",) if self_dedup else ("l", "r")
    skip_l = base_index is not None
    heavy: list[list] = []
    light: list = []
    for c in sc._hist_cols | sc._set_cols:
        for s in sides:
            if (only_l and s != "l") or (skip_l and s == "l"):
                continue
            heavy.append([("packed", (s, c))])
    for c in sc._df_cols:
        for s in sides:
            if (only_l and s != "l") or (skip_l and s == "l"):
                continue
            heavy.append([("ready", (s, c))])
    if not only_l:
        for g in sc._eq_groups:
            heavy.append([("codes", tuple(g))])
        for c in sc._dig_cols:
            heavy.append([("codes_dig", (c,))])
        for c, p in sc._split_cols:
            for s in sides:
                light.append(("split", (s, c, p)))
        for c in sc._tf_cols:
            light.append(("tf", c))
        for c in sc._coded_cols:
            light.append(("isnull", c))
    if light:
        # a few parallel shards, not one serial task: tf/isnull are
        # BLOCKING adopts, and a single light task serialising every
        # entry stalled early bucket tasks ~4 cpu-s each on split/isnull
        per = max(1, -(-len(light) // 4))
        for i in range(0, len(light), per):
            heavy.append(light[i : i + per])
    part_refs = [_warm_part.remote(refs, ctor_kwargs, jobs) for jobs in heavy]
    if not part_refs:
        if only_l:
            return {}
        if base_index:
            return dict(base_index)
        return _build_warm_scorer_state.remote(refs, ctor_kwargs)
    # per-cache index of part refs — NO combine barrier: a scorer adopting
    # the packed cache waits only on the packed shards, never on the
    # object-array ready/split shards (and vice versa)
    index: dict[str, list] = {}
    for jobs, ref in zip(heavy, part_refs):
        names = set()
        for kind, args in jobs:
            if kind == "packed":
                names.add("packed")
            elif kind in ("codes", "codes_dig"):
                names.add("codes")
            elif kind == "split":
                names.add("split")
            elif kind == "tf":
                names.add("tf")
            elif kind == "isnull":
                names.add("isnull")
            elif kind == "ready":
                names.add("ready_l" if args[0] == "l" else "ready_r")
        for n in names:
            index.setdefault(n, []).append(ref)
    if base_index:
        for n, rs in base_index.items():
            index.setdefault(n, []).extend(rs)
    return index


def prepare_scoring_warmup(
    canon: "ray.data.Dataset",
    model,
    *,
    carry_cols: list[str],
    tf_tables: dict | None = None,
    threshold_match_weight: float | None = -50.0,
    emit_cols: list[str] | None = None,
    id_col: str = "ukam_address_id",
) -> dict:
    """Optional HEAD START for ``generate_and_score_pairs``: drain the
    cleaned canonical side into the broadcast feature store and launch the
    l-side warm shards (packed histogram/set columns, ready object arrays)
    NOW — typically while the messy side is still being cleaned.  Without
    it the warm build races the exchange's split tasks and early bucket
    tasks block on the packed shards (measured 17.5 cpu-s of adoption wait
    at the reference two-table shape vs ~3 with the head start).

    Pass the returned dict as ``generate_and_score_pairs(...,
    warmup=...)`` with the SAME ``model`` / ``carry_cols`` /
    ``threshold_match_weight`` / ``emit_cols`` the scoring call uses."""
    store_l_ref = _build_arrow_store(canon, carry_cols)
    model_ref = ray.put(model)
    tf_ref = ray.put(tf_tables or {})
    warm_base = launch_warm_scorer_build(
        (store_l_ref, store_l_ref, model_ref, tf_ref),
        dict(
            payload_cols=[c for c in carry_cols if c != id_col],
            id_col=id_col,
            threshold=threshold_match_weight,
            emit_cols=emit_cols,
        ),
        only_l=True,
    )
    return {
        "store_l_ref": store_l_ref,
        "model_ref": model_ref,
        "tf_ref": tf_ref,
        "warm_base": warm_base,
    }


def _fused_scorer(
    store_l_ref, store_r_ref, model_ref, tf_ref, cache_key, ctor_kwargs
) -> "_BroadcastScorer":
    """Per-WORKER-PROCESS scorer cache: bucket tasks run on Ray's persistent
    worker pool, so the packed stores / code dictionaries are built once per
    process — the same amortisation an actor pool gives, without reserving
    CPU slots that would starve the upstream sort."""
    key = (store_l_ref.hex(), store_r_ref.hex(), model_ref.hex(), cache_key)
    got = _FUSED_SCORER_CACHE.get(key)
    if got is None:
        _FUSED_SCORER_CACHE.clear()  # one live store per worker is the norm
        got = _BroadcastScorer(
            store_l_ref, store_r_ref, model_ref, tf_ref, **ctor_kwargs
        )
        _FUSED_SCORER_CACHE[key] = got
    return got


def make_fused_emit_score(
    store_l_ref,
    store_r_ref,
    model_ref,
    tf_ref,
    *,
    payload_cols: list[str],
    id_col: str,
    threshold: float | None,
    emit_cols: list[str] | None,
    max_pairs_per_block: int,
    ordered_self_pairs: bool,
    symmetric_rules: frozenset[int] = frozenset(),
    chunk_pairs: int | None = None,
    warm_ref=None,
    partial_top1_per_r: bool = False,
):
    """Per-bucket candidate-pair emission FUSED with broadcast scoring.

    ``partial_top1_per_r=True`` reduces each bucket's survivors to the
    best row per ``{id_col}_r`` (max match_weight, ties broken by min
    ``{id_col}_l`` — the best-match selection order) before returning, so a
    top-1-per-messy consumer shuffles ~one row per (messy record, touched
    bucket) instead of every threshold survivor.  The global winner of each
    messy record wins its own bucket, so a downstream top-1 over the
    reduced stream is exact.

    The unfused broadcast path shuffles the keyed rows, materialises the
    full candidate-pair stream to the object store (a sort barrier: the
    scorer pool idles during the sort, the sort idles during scoring), then
    scores it.  At 180k corpus rows that stream is ~25M narrow rows of
    which scoring discards ~97% — writing it out is the single largest
    non-scaling cost of the flagship.  Fused, each bucket task emits its
    blocks' pair-index arrays in memory, gathers features straight from the
    zero-copy broadcast store, scores in ``chunk_pairs`` slices (bounds the
    transient gather) and returns only threshold survivors.

    ``ordered_self_pairs=True`` emits the id-ordered upper triangle of each
    block directly — exactly the previous emit-all + ``id_l < id_r`` filter,
    minus half the work.  The triangle shortcut requires the block's l-set
    to equal its r-set, which holds only for SYMMETRIC rules
    (``symmetric_rules``, precomputed by the caller) on UNSALTED keys; a
    salted hot block puts each record in one l salt-bucket but replicates it
    to every r bucket, so cross-salt pairs exist only in l x r — those
    blocks (and asymmetric rules) take the general cross-product path with
    the id-order filter applied after.  Cap semantics and the dropped-pairs
    metric match the unfused emitter.
    """
    if chunk_pairs is None:
        # default slice: large enough to amortise the per-slice fixed costs
        # (pandas view build, evaluator dispatch), overridable for cache-
        # residency experiments via UAM_CHUNK_PAIRS (see BASELINE.md round-3
        # DRAM analysis — slice size bounds the kernel-temporary working set)
        chunk_pairs = int(os.environ.get("UAM_CHUNK_PAIRS", "262144"))
    ctor_kwargs = dict(
        payload_cols=payload_cols,
        id_col=id_col,
        threshold=threshold,
        emit_cols=emit_cols,
        warm_ref=warm_ref,
    )
    cache_key = (
        threshold,
        tuple(emit_cols or ()),
        id_col,
        tuple(payload_cols),
    )

    def bucket_fn(g: pa.Table) -> pa.Table:
        import time as _time

        # diagnostics for the re-execution failure mode: draining a LAZY
        # fused-score dataset with to_arrow_refs() re-executed ~2/3 of the
        # bucket tasks (calls > n_buckets, rows > input rows) — consumers
        # must materialize() first.  These two counters make that visible.
        inc_metric("blocking.bucket_calls", 1)
        inc_metric("blocking.bucket_rows", g.num_rows)
        _t0 = _time.perf_counter()
        scorer = _fused_scorer(
            store_l_ref, store_r_ref, model_ref, tf_ref, cache_key, ctor_kwargs
        )
        inc_metric("fused.scorer_init_sec", _time.perf_counter() - _t0)
        if g.num_rows == 0:
            return scorer.empty_scored()
        n = g.num_rows
        # Arrow-native decode of the bucket: int codes for block keys and
        # LEXICOGRAPHIC integer ranks for member ids (dictionary-encode +
        # one C sort over the uniques) — the object-array to_pylist /
        # np.unique / lexsort-on-strings preamble this replaces was a
        # visible slice of bucket CPU at gazetteer shapes (many small
        # blocks, little scoring per member)
        rules = (
            g["rule_idx"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        bk_codes = np.asarray(
            g["block_key"].combine_chunks().dictionary_encode().indices,
            dtype=np.int64,
        )
        ids_arr = g[id_col].combine_chunks()
        l_side = np.asarray(pc.equal(g["side"].combine_chunks(), "l"))
        # bucket member -> broadcast-store row, resolved once per member
        row_l = scorer.resolve_rows(ids_arr, "l")
        row_r = (
            row_l
            if scorer.ids_r is scorer.ids_l
            else scorer.resolve_rows(ids_arr, "r")
        )
        # guard like the unfused __call__: a -1 would silently numpy-wrap
        # to the LAST store row in score_taken's gathers, producing wrong
        # pairs.  l-side members must resolve in the l store, r-side in
        # the r store (self-dedup shares one store).
        bad = int((row_l[l_side] < 0).sum()) + int((row_r[~l_side] < 0).sum())
        if bad:
            raise KeyError(
                f"pair ids missing from the broadcast feature store "
                f"({bad} bucket members)"
            )
        idd = ids_arr.dictionary_encode()
        id_vals = idd.dictionary
        id_codes = np.asarray(idd.indices, dtype=np.int64)
        rank_of_code = np.empty(len(id_vals), dtype=np.int64)
        rank_of_code[
            np.asarray(pc.sort_indices(id_vals), dtype=np.int64)
        ] = np.arange(len(id_vals))
        id_rank = rank_of_code[id_codes]

        def _ranks_for(col) -> np.ndarray:
            """Lexicographic ranks for a result id column (every emitted id
            is a bucket member, so the probe always resolves)."""
            pos = pc.index_in(col.combine_chunks(), value_set=id_vals)
            return rank_of_code[
                pos.cast(pa.int64()).to_numpy(zero_copy_only=False)
            ]
        # ---- vectorised per-block pair emission ----
        # One lexsort groups every (rule, key) block contiguously with its
        # l members first; cross products for ALL uncapped blocks are then
        # emitted in a handful of numpy repeat/tile expressions (the
        # per-block Python loop this replaces was the largest CPU term of
        # the fused stage once scoring itself was vectorised).  The
        # id-ordered self-pair filter and the cap keep-rule run on integer
        # id RANKS (np.unique + searchsorted once per bucket), so no
        # per-pair Python string compares remain.  Semantics (cap keeps,
        # dropped-pair counts, ordered filter) are exactly the loop's: the
        # old unsalted-symmetric triangle shortcut emitted the id-ordered
        # upper triangle, which is precisely what cross-product + rank
        # filter yields — one code path now serves every block kind.
        order = np.lexsort(((~l_side).view(np.int8), bk_codes, rules))
        rules_s = rules[order]
        keys_s = bk_codes[order]
        lmask_s = l_side[order]
        row_l_s = row_l[order]
        row_r_s = row_r[order]
        rank_s = id_rank[order]
        starts = np.flatnonzero(
            np.concatenate(
                ([True], (rules_s[1:] != rules_s[:-1]) | (keys_s[1:] != keys_s[:-1]))
            )
        )
        ends = np.concatenate((starts[1:], [n]))
        csum = np.concatenate(([0], np.cumsum(lmask_s)))
        nl = csum[ends] - csum[starts]
        nr = (ends - starts) - nl
        m_raw = nl * nr
        capped = m_raw > max_pairs_per_block
        easy = np.flatnonzero((m_raw > 0) & ~capped)
        dropped = int((m_raw[capped] - max_pairs_per_block).sum())
        out_tables: list[pa.Table] = []

        # top-1 consumers get per-record running-best pruning: each r
        # record's best weight so far (bucket-local) becomes that record's
        # branch-and-bound threshold for later slices, so redundant
        # candidates (the blocking rules re-pair near-dups many times)
        # stop after one or two comparisons instead of all of them.
        # Exact: only pairs that provably cannot STRICTLY beat their
        # record's best are pruned (ties survive for the min-id_l break).
        best_by_rank = (
            np.full(len(id_vals), -np.inf) if partial_top1_per_r else None
        )

        def score_block_of_pairs(li: np.ndarray, ri: np.ndarray, rl: np.ndarray):
            if ordered_self_pairs:
                keep = rank_s[li] < rank_s[ri]
                if not keep.all():
                    li, ri, rl = li[keep], ri[keep], rl[keep]
            if os.environ.get("UAM_LOCALITY_SORT"):
                # experiment (BASELINE.md DRAM analysis): reorder the window
                # so store gathers walk (row_r, row_l) near-sequentially —
                # output set identical, order irrelevant downstream
                o = np.lexsort((row_l_s[li], row_r_s[ri]))
                li, ri, rl = li[o], ri[o], rl[o]
            inc_metric("blocking.emitted_pairs", len(li))
            for off in range(0, len(li), chunk_pairs):
                ri_slice = ri[off : off + chunk_pairs]
                r_best = None
                if best_by_rank is not None and scorer.threshold is not None:
                    r_best = best_by_rank[rank_s[ri_slice]]
                res = scorer.score_taken(
                    row_l_s[li[off : off + chunk_pairs]],
                    row_r_s[ri_slice],
                    pa.array(rl[off : off + chunk_pairs], pa.int32()),
                    r_best=r_best,
                )
                if res.num_rows:
                    if best_by_rank is not None:
                        mw_res = (
                            res["match_weight"]
                            .combine_chunks()
                            .to_numpy(zero_copy_only=False)
                        )
                        np.maximum.at(
                            best_by_rank,
                            _ranks_for(res[f"{id_col}_r"]),
                            mw_res,
                        )
                    out_tables.append(res)

        # uncapped blocks: emit in windows of ~8 chunks to bound the
        # transient index arrays (a bucket can hold millions of pairs)
        if len(easy):
            m = m_raw[easy]
            cm = np.cumsum(m)
            window = 8 * chunk_pairs
            edges = np.searchsorted(cm, np.arange(window, int(cm[-1]) + window, window))
            lo = 0
            for hi in np.minimum(edges + 1, len(easy)):
                if hi <= lo:
                    continue
                sel = easy[lo:hi]
                bs, bnl, bnr, bm = starts[sel], nl[sel], nr[sel], m_raw[sel]
                total = int(bm.sum())
                rep = np.repeat(np.arange(len(sel)), bm)
                offs = np.concatenate(([0], np.cumsum(bm)))[:-1]
                p = np.arange(total, dtype=np.int64) - offs[rep]
                li = bs[rep] + p // bnr[rep]
                ri = bs[rep] + bnl[rep] + p % bnr[rep]
                rl = np.repeat(rules_s[bs], bm).astype(np.int32)
                score_block_of_pairs(li, ri, rl)
                lo = hi
        # capped blocks (rare): per-block keep of the keep_l/keep_r
        # smallest-ranked members — identical keeps and drop accounting to
        # the unfused emitter
        for b in np.flatnonzero(capped):
            s, e, l_n = int(starts[b]), int(ends[b]), int(nl[b])
            keep_l = max(1, int(max_pairs_per_block**0.5))
            keep_r = max(1, max_pairs_per_block // keep_l)
            l_idx = np.arange(s, s + l_n)
            r_idx = np.arange(s + l_n, e)
            l_idx = l_idx[np.argsort(rank_s[l_idx], kind="stable")][:keep_l]
            r_idx = r_idx[np.argsort(rank_s[r_idx], kind="stable")][:keep_r]
            score_block_of_pairs(
                np.repeat(l_idx, len(r_idx)),
                np.tile(r_idx, len(l_idx)),
                np.full(len(l_idx) * len(r_idx), rules_s[s], dtype=np.int32),
            )
        if dropped:
            inc_metric("blocking.dropped_pairs", dropped)
        _dt = _time.perf_counter() - _t0
        inc_metric("fused.bucket_task_sec", _dt)
        gauge_max_metric("fused.bucket_max_sec", _dt)
        if not out_tables:
            return scorer.empty_scored()
        res = pa.concat_tables(out_tables, promote_options="default")
        if partial_top1_per_r and res.num_rows > 1:
            mw = (
                res["match_weight"].combine_chunks().to_numpy(zero_copy_only=False)
            )
            rid = _ranks_for(res[f"{id_col}_r"])
            lid = _ranks_for(res[f"{id_col}_l"])
            order = np.lexsort((lid, -mw, rid))
            rid_sorted = rid[order]
            first = np.concatenate(
                ([True], rid_sorted[1:] != rid_sorted[:-1])
            )
            res = res.take(pa.array(order[first], pa.int64()))
        return res

    return bucket_fn


# ---------------------------------------------------------------------------
# fused pair generation + scoring (the 10^12-scale hot path)
# ---------------------------------------------------------------------------

_EVAL_CACHE: dict = {}


def _evaluators_for(model, tf_tables):
    """Per-process evaluator cache (model arrives zero-copy via ray.get, so
    object identity is stable per worker)."""
    from .scoring import _ComparisonEvaluator

    key = (id(model), id(tf_tables))
    if key not in _EVAL_CACHE:
        _EVAL_CACHE.clear()  # one model at a time per worker is the norm
        _EVAL_CACHE[key] = [
            _ComparisonEvaluator(c, tf_tables or {}) for c in model.comparisons
        ]
    return _EVAL_CACHE[key]


def generate_and_score_pairs(
    canon: "ray.data.Dataset",
    messy: "ray.data.Dataset",
    model,
    *,
    carry_cols: list[str],
    tf_tables: dict | None = None,
    threshold_match_weight: float | None = -50.0,
    emit_cols: list[str] | None = None,
    max_pairs_per_block: int = 250_000,
    hot_key_threshold: int | None = None,
    id_col: str = "ukam_address_id",
    ordered_self_pairs: bool = False,
    payload_mode: str = "auto",  # "auto" | "broadcast" | "shuffle"
    broadcast_threshold: int = 2_000_000,
    dedupe_output: bool = True,
    partial_top1_per_r: bool = False,
    n_buckets: int | None = None,
    warmup: dict | None = None,
) -> "ray.data.Dataset":
    """J6 + §2.5 fused: narrow pair generation/dedup, then payload + scoring.

    Two payload strategies (guide: "broadcast small sides"):
      * ``broadcast`` — the feature table is ``ray.put`` ONCE as an id->row
        store; a scorer actor pool maps over the NARROW pair stream, gathers
        both sides from the store and scores in-task.  Zero payload
        shuffles — the single-node-bandwidth-friendly path, correct whenever
        the feature table fits in plasma (millions of rows).
      * ``shuffle`` — one hash join attaches the canonical payload, a
        bucketed stage attaches the messy payload and scores in the same
        task.  The 10^12-row path: nothing is ever broadcast, the wide pair
        table exists only transiently inside bucket tasks.
    ``auto`` picks broadcast when both sides fit ``broadcast_threshold``
    rows, and above that still prefers broadcast while the combined
    payload bytes (``size_bytes``) fit a bounded slice of the object
    store — the shuffle route's cost is O(pairs x payload), so it is the
    right choice only when the CORPUS itself cannot be plasma-resident.

    ``emit_cols``: optional projection of the scored output (defaults to ids
    + rule + match weight/probability + all payload columns).

    ``dedupe_output=False`` skips the cross-rule first-rule-wins dedup
    barrier on the broadcast path.  Safe ONLY when the consumer tolerates
    the same (l, r) pair appearing once per matching blocking rule — e.g.
    the connected-components edge pass, which dedups edges itself; a pair
    scores identically under every rule, so values never conflict.

    ``partial_top1_per_r=True`` (broadcast path only): each bucket task
    pre-reduces its survivors to the best row per messy id, for
    best-match-selection consumers — see ``make_fused_emit_score``.
    """
    import pyarrow.compute as pc

    from .bucketing import bucketed_group_apply
    from .joins import inner_join
    from .scoring import score_batch

    parsed = (
        parse_blocking_rules(rules_list)
        if (rules_list := model.blocking_rules) and isinstance(rules_list[0], str)
        else model.blocking_rules
    )
    payload_cols = [c for c in carry_cols if c != id_col]

    if payload_mode == "auto":
        same = canon is messy
        n = canon.count() + (0 if same else messy.count())
        if n < broadcast_threshold:
            payload_mode = "broadcast"
        else:
            # Row count alone is the WRONG yardstick above the threshold:
            # what must fit in plasma for the broadcast route is the
            # carry-column STORE, O(corpus bytes) — while the shuffle
            # route attaches payload per candidate PAIR, O(pairs x
            # payload), which for a self-join dedup (pairs >> rows) is
            # catastrophically larger (measured: a 2.16M-row flagship
            # corpus chose shuffle at the old rule and spilled ~60 GB of
            # half-joined pair payload to disk before dying OutOfDisk;
            # its broadcast store was ~5 GB and fits plasma outright).
            # Prefer broadcast while the store plausibly fits a bounded
            # slice of the object store; fall back to shuffle only when
            # the corpus itself is the thing that cannot be resident.
            try:
                sz = canon.size_bytes() or 0
                if not same:
                    sz += messy.size_bytes() or 0
                cap = 0.25 * ray.cluster_resources().get(
                    "object_store_memory", 8 << 30
                )
                payload_mode = "broadcast" if 0 < sz < cap else "shuffle"
            except Exception:
                payload_mode = "shuffle"

    if payload_mode == "broadcast":
        # FUSED path: key derivation -> ONE bucketed shuffle of the narrow
        # keyed rows -> per-bucket pair emission + broadcast-store scoring
        # in the same task.  The candidate-pair stream (rows x avg block
        # size — ~25M rows at a 180k corpus, ~97% discarded by the
        # threshold) never touches the object store, and there is no sort
        # barrier between emission and scoring for workers to idle on.
        import time as _time

        from ..state.metrics import inc_metric as _inc
        from .bucketing import (
            bucketed_group_apply as _bga,
            default_buckets,
            direct_bucket_apply_sources as _dbas,
        )

        hot = None
        if hot_key_threshold and canon.count() > hot_key_threshold:
            _t0 = _time.perf_counter()
            hot = detect_hot_keys(
                canon, messy, parsed, hot_key_threshold=hot_key_threshold
            )
            _inc("fused.hotkey_sec", _time.perf_counter() - _t0)
        key_kwargs = {"rules": parsed, "carry_cols": [id_col], "hot_keys": hot}
        _t0 = _time.perf_counter()
        if warmup is not None:
            store_l_ref = warmup["store_l_ref"]
            model_ref = warmup["model_ref"]
            tf_ref = warmup["tf_ref"]
        else:
            store_l_ref = _build_arrow_store(canon, carry_cols)
            model_ref = ray.put(model)
            tf_ref = ray.put(tf_tables or {})
        store_r_ref = (
            store_l_ref if messy is canon else _build_arrow_store(messy, carry_cols)
        )
        _inc("fused.store_drain_sec", _time.perf_counter() - _t0)
        internal_emit = emit_cols
        if dedupe_output and emit_cols is not None and "rule_idx" not in emit_cols:
            internal_emit = list(emit_cols) + ["rule_idx"]
        symmetric = frozenset(
            i for i, r in enumerate(parsed) if r.l_exprs == r.r_exprs
        )
        warm_ref = launch_warm_scorer_build(
            (store_l_ref, store_r_ref, model_ref, tf_ref),
            dict(
                payload_cols=payload_cols,
                id_col=id_col,
                threshold=threshold_match_weight,
                emit_cols=internal_emit,
            ),
            base_index=(warmup or {}).get("warm_base"),
        )
        bucket_fn = make_fused_emit_score(
            store_l_ref,
            store_r_ref,
            model_ref,
            tf_ref,
            payload_cols=payload_cols,
            id_col=id_col,
            threshold=threshold_match_weight,
            emit_cols=internal_emit,
            max_pairs_per_block=max_pairs_per_block,
            ordered_self_pairs=ordered_self_pairs,
            symmetric_rules=symmetric,
            warm_ref=warm_ref,
            partial_top1_per_r=partial_top1_per_r,
        )
        # many fine buckets, independent of cpu count: scoring rides
        # the bucket tasks, so the LARGEST bucket bounds the makespan
        # (measured: 32 buckets left multi-M-pair stragglers that
        # capped 8-cpu utilisation at ~60%).  Warm plasma state makes
        # per-task setup ~free, so fine granularity costs little;
        # callers with many tiny blocks (two-table gazetteer runs) can
        # lower n_buckets to shrink the per-bucket fixed costs.
        #
        # NOTE a finer nb does NOT shrink the big-corpus memory footprint:
        # per-reduce RSS is dominated by shared plasma mappings of the
        # warm store (counted per process), not by bucket row count —
        # measured at 4.32M files, nb 128 -> 519 left reduces at 5-8 GB
        # RSS and cost ~20% wall.  The footprint that matters is the
        # O(corpus) warm state, which a multi-node cluster divides.
        nb = n_buckets or max(128, 4 * default_buckets())
        if os.environ.get("UAM_FUSED_EXCHANGE") == "sort":
            # Dataset-native sort shuffle of an explicit keyed stream —
            # kept for comparison; measured slower than the direct
            # exchange (the Sort alone cost more wall than all the fused
            # bucket tasks combined on the reference-shape two-table run)
            keyed_l = canon.map_batches(
                derive_block_keys,
                batch_format="pyarrow",
                fn_kwargs=dict(key_kwargs, side="l"),
            )
            keyed_r = messy.map_batches(
                derive_block_keys,
                batch_format="pyarrow",
                fn_kwargs=dict(key_kwargs, side="r"),
            )
            scored = _bga(
                keyed_l.union(keyed_r),
                ["rule_idx", "block_key"],
                bucket_fn,
                n_buckets=nb,
            )
        else:
            # raw-task hash exchange with IN-TASK key derivation: each
            # split task reads a group of raw feature blocks (zero-copy
            # plasma), flat-maps them through derive_block_keys, assigns
            # buckets and emits per-bucket slices — the keyed stream never
            # exists as a dataset (no map stage, no materialize, no
            # re-read; measured ~2s of the two-table score phase).  For a
            # self-join both sides derive in the same pass over one ds.
            def _pre(t: pa.Table, _sides) -> pa.Table:
                parts = [
                    derive_block_keys(t, side=s, **key_kwargs) for s in _sides
                ]
                return (
                    parts[0]
                    if len(parts) == 1
                    else pa.concat_tables(parts, promote_options="default")
                )

            import functools

            if messy is canon:
                sources = [(canon, functools.partial(_pre, _sides=("l", "r")))]
            else:
                sources = [
                    (canon, functools.partial(_pre, _sides=("l",))),
                    (messy, functools.partial(_pre, _sides=("r",))),
                ]
            scored = _dbas(
                sources, ["rule_idx", "block_key"], bucket_fn, n_buckets=nb
            )
        if not dedupe_output:
            return scored
        deduped = dedupe_pairs_first_rule_wins(scored, id_col=id_col)
        if internal_emit is not emit_cols:
            deduped = deduped.map_batches(
                lambda t: t.select(emit_cols), batch_format="pyarrow"
            )
        return deduped

    pairs = generate_candidate_pairs(
        canon,
        messy,
        parsed,
        carry_cols=[id_col],  # narrow: ids only
        max_pairs_per_block=max_pairs_per_block,
        hot_key_threshold=hot_key_threshold,
        id_col=id_col,
        ordered_self_pairs=ordered_self_pairs,
        dedupe=True,
    )

    def _l_payload(t: pa.Table) -> pa.Table:
        data = {f"{id_col}_l": t[id_col]}
        for c in payload_cols:
            data[f"{c}_l"] = t[c]
        return pa.table(data)

    half = inner_join(
        pairs,
        canon.map_batches(_l_payload, batch_format="pyarrow"),
        on=f"{id_col}_l",
        broadcast=False,  # this IS the explicit shuffle (10^12-row) route
    )

    model_ref = ray.put(model)
    tf_ref = ray.put(tf_tables or {})
    kr = f"{id_col}_r"
    half_cols = [f"{id_col}_l", kr, "rule_idx"] + [f"{c}_l" for c in payload_cols]

    def _tag_half(t: pa.Table) -> pa.Table:
        data = {c: t[c] for c in half_cols}
        for c in payload_cols:
            data[f"{c}_r"] = pa.nulls(t.num_rows, t[f"{c}_l"].type)
        data["__side2"] = pa.array(["p"] * t.num_rows, pa.string())
        return pa.table(data)

    def _tag_messy(t: pa.Table) -> pa.Table:
        data = {f"{id_col}_l": pa.nulls(t.num_rows, t[id_col].type)}
        data[kr] = t[id_col]
        data["rule_idx"] = pa.nulls(t.num_rows, pa.int32())
        for c in payload_cols:
            data[f"{c}_l"] = pa.nulls(t.num_rows, t[c].type)
        for c in payload_cols:
            data[f"{c}_r"] = t[c]
        data["__side2"] = pa.array(["m"] * t.num_rows, pa.string())
        return pa.table(data)

    tagged = half.map_batches(_tag_half, batch_format="pyarrow").union(
        messy.map_batches(_tag_messy, batch_format="pyarrow")
    )

    def attach_and_score(g: pa.Table) -> pa.Table:
        sides = g["__side2"]
        prows = g.filter(pc.equal(sides, "p"))
        mrows = g.filter(pc.equal(sides, "m"))
        out_template = prows.drop_columns(["__side2"])
        if prows.num_rows == 0 or mrows.num_rows == 0:
            empty = out_template.slice(0, 0)
            empty = empty.append_column("match_weight", pa.array([], pa.float64()))
            empty = empty.append_column(
                "match_probability", pa.array([], pa.float64())
            )
            return empty.select(emit_cols) if emit_cols else empty
        ridx: dict = {}
        for j, k in enumerate(mrows[kr].to_pylist()):
            ridx[k] = j  # messy ids are unique
        take_m = pa.array(
            [ridx.get(k) for k in prows[kr].to_pylist()], pa.int64()
        )
        mpart = mrows.select([f"{c}_r" for c in payload_cols]).take(take_m)
        data = {c: prows[c] for c in half_cols}
        for c in payload_cols:
            data[f"{c}_r"] = mpart[f"{c}_r"]
        full = pa.table(data)
        mdl = ray.get(model_ref)
        tfs = ray.get(tf_ref)
        scored = score_batch(
            full,
            _evaluators_for(mdl, tfs),
            mdl.prior_log2_odds,
            threshold=threshold_match_weight,
        )
        return scored.select(emit_cols) if emit_cols else scored

    return bucketed_group_apply(tagged, kr, attach_and_score)
