"""Second pass: distinguishing-token rescoring (operator P1, SURVEY.md §2.6).

The reference implements this as 7 chained DuckDB relations over the pairwise
prediction table (post_linkage/identify_distinguishing_tokens.py:4-476).
Every step is local to one messy record's candidate group, so the whole
operator collapses to a single
``pairs.groupby("ukam_address_id_r").map_groups(rescore_group)`` — one
shuffle, then pure per-group Python over a handful of short token lists.

Semantics preserved exactly (verified against the reference's test_bigrams
fixtures):
  * top-N per messy record ordered by (match_weight DESC, unique_id_l DESC);
  * up to TWO trailing common-end tokens (from ``common_end_tokens_hist_r``)
    stripped from both address strings, stopping at the first non-common one;
  * block token/bigram histograms pool ALL candidates' token lists — bigrams
    are built over the *flattened concatenation*, crossing candidate
    boundaries (a reference quirk we keep);
  * per-pair maps: overlap counts use block-level counts (1/cnt^2 reward),
    "elsewhere in block but not this" counts punish, missing tokens penalise;
  * bigram maps are filtered for redundancy against the unigram maps;
  * mw_adjustment = 3*sum(1/cnt^2) - 1.5*#elsewhere - 0.1*#missing
                    + 3*sum(1/cnt^2 bigram) - 1.5*#bigram-elsewhere.

Diagnostic map columns are emitted as deterministic JSON strings (sorted
keys) so the output schema stays flat Arrow.
"""

from __future__ import annotations

import json
import re
from collections import Counter

import pandas as pd

REWARD_MULTIPLIER = 3.0
PUNISHMENT_MULTIPLIER = 1.5
BIGRAM_REWARD_MULTIPLIER = 3.0
BIGRAM_PUNISHMENT_MULTIPLIER = 1.5
MISSING_TOKEN_PENALTY = 0.1

# re.ASCII: the reference splits with DuckDB/RE2 whose \s is ASCII —
# Python's unicode \s would additionally split on U+00A0 etc.
_WS = re.compile(r"\s+", re.ASCII)

#: the exact pair columns the rescore group function reads — callers scoring
#: with the fused narrow-pairs path (blocking.generate_and_score_pairs)
#: should pass this as ``emit_cols`` so only these columns ever materialise
#: on the scored pair stream (the full wide payload stays in the broadcast
#: feature store).
RESCORE_EMIT_COLS = [
    "ukam_address_id_l",
    "ukam_address_id_r",
    "unique_id_l",
    "unique_id_r",
    "original_address_concat_l",
    "original_address_concat_r",
    "postcode_l",
    "postcode_r",
    "common_end_tokens_hist_r",
    "match_weight",
    "match_probability",
]


def _tokens(addr: str | None, postcode: str | None) -> list[str]:
    """concat_ws(' ', addr, postcode).trim().upper().split(r'\\s+')."""
    parts = [p for p in (addr, postcode) if isinstance(p, str)]
    s = " ".join(parts).strip().upper()
    return _WS.split(s)


def _strip_common_end(addr: str | None, common: set[str]) -> str | None:
    """Remove up to 2 trailing tokens that are in ``common``, stopping at the
    first non-common token (identify_distinguishing_tokens.py:60-113)."""
    if addr is None:
        return None
    toks = _WS.split(addr.strip().upper()) if addr.strip() else []
    for _ in range(2):
        if toks and toks[-1] in common:
            toks = toks[:-1]
        else:
            break
    return " ".join(toks)


def _bigrams(tokens: list[str]) -> list[tuple[str, str]]:
    return [(tokens[i], tokens[i + 1]) for i in range(len(tokens) - 1)]


def _map_json(d: dict, *, tuple_keys: bool = False) -> str:
    if tuple_keys:
        items = sorted(((" ".join(k), v) for k, v in d.items()))
    else:
        items = sorted(d.items())
    return json.dumps(dict(items), separators=(",", ":"))


def _rescore_span(
    v: dict[str, list],
    s: int,
    e: int,
    out: dict[str, list],
    *,
    extra: list[str],
    use_bigrams: bool,
    reward_multiplier: float,
    punishment_multiplier: float,
    bigram_reward_multiplier: float,
    bigram_punishment_multiplier: float,
    missing_token_penalty: float,
) -> None:
    """Token logic for ONE messy record's candidate span ``v[col][s:e]``
    (already thresholded, sorted mw DESC / unique_id_l DESC, top-N'd);
    appends one output row per pair to the ``out`` column lists.

    Operating on plain Python lists rather than per-group pandas frames is
    what makes the bucket fast: the block/pair semantics below are a
    line-for-line copy of the reference's chained relations
    (identify_distinguishing_tokens.py:4-476)."""
    hist_r = v["common_end_tokens_hist_r"][s]
    common = {h["tok"] for h in hist_r} if hist_r is not None else set()

    addr_l = [
        _strip_common_end(a, common)
        for a in v["original_address_concat_l"][s:e]
    ]
    addr_r = [
        _strip_common_end(a, common)
        for a in v["original_address_concat_r"][s:e]
    ]
    pc_l = v["postcode_l"][s:e]

    tokens_r = _tokens(addr_r[0], v["postcode_r"][s])
    tokens_r_set = set(tokens_r)

    tokens_l_per_pair = [_tokens(a, p) for a, p in zip(addr_l, pc_l)]
    tokens_in_block_l: list[str] = [t for toks in tokens_l_per_pair for t in toks]
    hist_all_tokens_block = Counter(tokens_in_block_l)
    hist_overlap_r_block = {
        k: c for k, c in hist_all_tokens_block.items() if k in tokens_r_set
    }

    if use_bigrams:
        bigrams_block = _bigrams(tokens_in_block_l)
        hist_all_bigrams_block = Counter(bigrams_block)
        bigrams_r = _bigrams(tokens_r)
        bigrams_r_set = set(bigrams_r)
        hist_overlap_bigrams_r_block = {
            k: c for k, c in hist_all_bigrams_block.items() if k in bigrams_r_set
        }

    for i in range(e - s):
        tokens_l = tokens_l_per_pair[i]
        tokens_l_set = set(tokens_l)
        overlapping = {
            k: c for k, c in hist_overlap_r_block.items() if k in tokens_l_set
        }
        toks_r_not_in_l = {t for t in tokens_r if t not in tokens_l_set}
        elsewhere = {
            k: c for k, c in hist_all_tokens_block.items() if k in toks_r_not_in_l
        }
        missing = [t for t in tokens_l if t not in tokens_r_set]

        adj = (
            reward_multiplier * sum(1.0 / (c * c) for c in overlapping.values())
            - punishment_multiplier * len(elsewhere)
            - missing_token_penalty * len(missing)
        )

        j = s + i
        mw = v["match_weight"][j]
        out["unique_id_l"].append(v["unique_id_l"][j])
        out["unique_id_r"].append(v["unique_id_r"][j])
        out["ukam_address_id_r"].append(v["ukam_address_id_r"][j])
        out["ukam_address_id_l"].append(v["ukam_address_id_l"][j])
        out["match_weight_original"].append(mw)
        out["overlapping_tokens_this_l_and_r"].append(_map_json(overlapping))
        out["tokens_elsewhere_in_block_but_not_this"].append(_map_json(elsewhere))
        out["missing_tokens"].append(json.dumps(missing))
        out["original_address_concat_l"].append(addr_l[i])
        out["postcode_l"].append(v["postcode_l"][j])
        out["original_address_concat_r"].append(addr_r[i])
        out["postcode_r"].append(v["postcode_r"][j])
        for c in extra:  # reference identify_distinguishing_tokens.py:33-35
            out[f"{c}_l"].append(v[f"{c}_l"][j] if f"{c}_l" in v else None)
            out[f"{c}_r"].append(v[f"{c}_r"][j] if f"{c}_r" in v else None)

        if use_bigrams:
            bigrams_l = set(_bigrams(tokens_l))
            overlap_bg = {
                k: c
                for k, c in hist_overlap_bigrams_r_block.items()
                if k in bigrams_l
            }
            bg_r_not_in_l = {b for b in bigrams_r if b not in bigrams_l}
            elsewhere_bg = {
                k: c
                for k, c in hist_all_bigrams_block.items()
                if k in bg_r_not_in_l
            }
            # redundancy filter vs unigram maps (reference :367-401)
            overlap_bg_f = {
                k: c
                for k, c in overlap_bg.items()
                if not (
                    k[0] in overlapping
                    and overlapping[k[0]] <= c
                    and k[1] in overlapping
                    and overlapping[k[1]] <= c
                )
            }
            elsewhere_bg_f = {
                k: c
                for k, c in elsewhere_bg.items()
                if not (
                    k[0] in elsewhere
                    and elsewhere[k[0]] <= c
                    and k[1] in elsewhere
                    and elsewhere[k[1]] <= c
                )
            }
            adj += bigram_reward_multiplier * sum(
                1.0 / (c * c) for c in overlap_bg_f.values()
            ) - bigram_punishment_multiplier * len(elsewhere_bg_f)
            out["overlapping_bigrams_this_l_and_r"].append(
                _map_json(overlap_bg, tuple_keys=True)
            )
            out["bigrams_elsewhere_in_block_but_not_this"].append(
                _map_json(elsewhere_bg, tuple_keys=True)
            )
            out["overlapping_bigrams_this_l_and_r_filtered"].append(
                _map_json(overlap_bg_f, tuple_keys=True)
            )
            out["bigrams_elsewhere_in_block_but_not_this_filtered"].append(
                _map_json(elsewhere_bg_f, tuple_keys=True)
            )

        out["mw_adjustment"].append(adj)
        out["match_weight"].append(mw + adj)


def _frame_rescore(
    df: pd.DataFrame,
    *,
    match_weight_threshold: float,
    top_n_matches: int,
    use_bigrams: bool,
    extra: list[str],
    reward_multiplier: float,
    punishment_multiplier: float,
    bigram_reward_multiplier: float,
    bigram_punishment_multiplier: float,
    missing_token_penalty: float,
) -> pd.DataFrame:
    """Rescore a frame holding ANY number of messy-record groups: ONE
    vectorised threshold + lexsort + per-group head over the whole frame,
    then the span core over contiguous key runs — no per-group pandas
    objects (the per-tiny-group sort_values/DataFrame/concat pattern was
    ~4.5x the span core's own cost)."""
    if len(df) == 0 or "match_weight" not in df.columns:
        # empty buckets can arrive schema-degenerate (Ray Data skips map
        # UDFs on 0-row blocks)
        return _empty_out(use_bigrams, extra)
    df = df[df["match_weight"] > match_weight_threshold]
    if len(df) == 0:
        return _empty_out(use_bigrams, extra)
    # per group: ORDER BY match_weight DESC, unique_id_l DESC (reference
    # :48-56); the leading group key makes runs contiguous
    df = df.sort_values(
        ["ukam_address_id_r", "match_weight", "unique_id_l"],
        ascending=[True, False, False],
        kind="mergesort",
    )
    df = df.groupby("ukam_address_id_r", sort=False).head(top_n_matches)
    v = {c: df[c].tolist() for c in df.columns}
    keys = v["ukam_address_id_r"]
    out: dict[str, list] = {
        c: [] for c in _empty_out(use_bigrams, extra).columns
    }
    n = len(keys)
    s = 0
    for i in range(1, n + 1):
        if i == n or keys[i] != keys[s]:
            _rescore_span(
                v,
                s,
                i,
                out,
                extra=extra,
                use_bigrams=use_bigrams,
                reward_multiplier=reward_multiplier,
                punishment_multiplier=punishment_multiplier,
                bigram_reward_multiplier=bigram_reward_multiplier,
                bigram_punishment_multiplier=bigram_punishment_multiplier,
                missing_token_penalty=missing_token_penalty,
            )
            s = i
    return pd.DataFrame(out)


def make_rescore_group_fn(
    *,
    match_weight_threshold: float = -20.0,
    top_n_matches: int = 5,
    use_bigrams: bool = True,
    additional_columns_to_retain: list[str] | None = None,
    reward_multiplier: float = REWARD_MULTIPLIER,
    punishment_multiplier: float = PUNISHMENT_MULTIPLIER,
    bigram_reward_multiplier: float = BIGRAM_REWARD_MULTIPLIER,
    bigram_punishment_multiplier: float = BIGRAM_PUNISHMENT_MULTIPLIER,
    missing_token_penalty: float = MISSING_TOKEN_PENALTY,
):
    """Build the rescoring function for ``map_groups``.  The returned
    callable accepts one messy record's candidate group OR a frame holding
    many groups (it runs per contiguous ``ukam_address_id_r`` run either
    way), so per-group and whole-bucket callers share one implementation."""

    extra = list(additional_columns_to_retain or [])

    def rescore(g: pd.DataFrame) -> pd.DataFrame:
        return _frame_rescore(
            g,
            match_weight_threshold=match_weight_threshold,
            top_n_matches=top_n_matches,
            use_bigrams=use_bigrams,
            extra=extra,
            reward_multiplier=reward_multiplier,
            punishment_multiplier=punishment_multiplier,
            bigram_reward_multiplier=bigram_reward_multiplier,
            bigram_punishment_multiplier=bigram_punishment_multiplier,
            missing_token_penalty=missing_token_penalty,
        )

    return rescore


def _empty_out(use_bigrams: bool, extra: list[str] | None = None) -> pd.DataFrame:
    cols = [
        "unique_id_l",
        "unique_id_r",
        "ukam_address_id_r",
        "ukam_address_id_l",
        "match_weight_original",
        "overlapping_tokens_this_l_and_r",
        "tokens_elsewhere_in_block_but_not_this",
        "missing_tokens",
        "original_address_concat_l",
        "postcode_l",
        "original_address_concat_r",
        "postcode_r",
    ]
    for c in extra or []:
        cols += [f"{c}_l", f"{c}_r"]
    if use_bigrams:
        cols += [
            "overlapping_bigrams_this_l_and_r",
            "bigrams_elsewhere_in_block_but_not_this",
            "overlapping_bigrams_this_l_and_r_filtered",
            "bigrams_elsewhere_in_block_but_not_this_filtered",
        ]
    cols += ["mw_adjustment", "match_weight"]
    return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})


#: the NARROW pair columns sufficient when the payload is re-gathered from
#: the broadcast feature store inside the rescore bucket (see
#: ``improve_predictions_using_distinguishing_tokens(store_l_ref=...)``).
#: ``unique_id_l`` rides along because the reference's top-N order is
#: (match_weight DESC, unique_id_l DESC) — the map-side partial top-N
#: needs the tie-break before the payload gather happens.
RESCORE_NARROW_EMIT_COLS = [
    "ukam_address_id_l",
    "ukam_address_id_r",
    "unique_id_l",
    "match_weight",
]

#: store column -> per-side pair column, as the group fn expects them
_STORE_GATHER_L = {
    "unique_id": "unique_id_l",
    "original_address_concat": "original_address_concat_l",
    "postcode": "postcode_l",
}
_STORE_GATHER_R = {
    "unique_id": "unique_id_r",
    "original_address_concat": "original_address_concat_r",
    "postcode": "postcode_r",
    "common_end_tokens_hist": "common_end_tokens_hist_r",
}


def _attach_payload_from_store(
    g, store_l, store_r, id_col: str
):
    """Per-bucket payload gather: one ``pc.index_in`` probe per side
    against the broadcast store's id column, then zero-copy takes of the
    columns the rescore group fn reads.  Lets the scored pair stream (and
    the cross-rule dedup exchange before it) stay 3 columns wide instead
    of carrying address strings + a histogram list through two shuffles."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def gather(side_tbl, pair_col, mapping):
        todo = {
            src: out for src, out in mapping.items() if out not in g.column_names
        }
        if not todo:
            return {}
        pos = pc.index_in(
            g[pair_col].combine_chunks(),
            value_set=side_tbl[id_col].combine_chunks(),
        )
        if pos.null_count:
            raise KeyError(
                f"rescore store gather: {pos.null_count} pair ids missing "
                f"from the broadcast store ({pair_col})"
            )
        return {
            out: side_tbl[src].combine_chunks().take(pos)
            for src, out in todo.items()
        }

    cols = dict(zip(g.column_names, g.columns))
    cols.update(gather(store_l, f"{id_col}_l", _STORE_GATHER_L))
    cols.update(gather(store_r, f"{id_col}_r", _STORE_GATHER_R))
    return pa.table(cols)


def improve_predictions_using_distinguishing_tokens(
    pairs: "ray.data.Dataset",
    *,
    match_weight_threshold: float = -20.0,
    top_n_matches: int = 5,
    use_bigrams: bool = True,
    additional_columns_to_retain: list[str] | None = None,
    store_l_ref=None,
    store_r_ref=None,
    id_col: str = "ukam_address_id",
    **multipliers,
) -> "ray.data.Dataset":
    """P1 as one groupby-shuffle + per-group function.

    A global pre-filter on ``match_weight`` shrinks the shuffle before the
    groupby (the threshold is re-applied inside the group fn, harmlessly).

    ``store_l_ref``/``store_r_ref`` (optional): broadcast feature-store
    refs (the same objects ``generate_and_score_pairs`` scores from — e.g.
    ``prepare_scoring_warmup()['store_l_ref']``).  When given, ``pairs``
    needs only ``RESCORE_NARROW_EMIT_COLS`` and the address/histogram
    payload is re-gathered from the store INSIDE each rescore bucket task
    (one C hash probe per side) — the wide columns never ride the pair
    shuffles.  Without them, ``pairs`` must carry ``RESCORE_EMIT_COLS``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    pairs = pairs.map_batches(
        lambda t: t.filter(pc.greater(t["match_weight"], match_weight_threshold)),
        batch_format="pyarrow",
    )
    fn = make_rescore_group_fn(
        match_weight_threshold=match_weight_threshold,
        top_n_matches=top_n_matches,
        use_bigrams=use_bigrams,
        additional_columns_to_retain=additional_columns_to_retain,
        **multipliers,
    )
    if store_l_ref is None:
        from .bucketing import bucketed_group_apply

        # fn handles a whole bucket (any number of groups) in one call —
        # one vectorised sort + per-run span core, no per-group frames
        return bucketed_group_apply(
            pairs, "ukam_address_id_r", fn, batch_format="pandas"
        )

    import ray

    from ..state.metrics import inc_metric
    from .bucketing import bucketed_group_apply

    r_ref = store_r_ref if store_r_ref is not None else store_l_ref

    # map-side partial top-N: a block's rows for messy record r are a
    # SUBSET of r's global candidates, so any global top-N row ranks <= N
    # within its block too — keeping each block's per-record top N (over
    # DISTINCT candidates, reference order mw DESC / unique_id_l DESC)
    # provably preserves the exact global top-N while shrinking the
    # exchange from every threshold survivor (~125/record measured at the
    # 180k shape) to <= N x blocks-touched.  Cross-rule duplicate rows are
    # byte-identical in the narrow emit, so drop_duplicates here + in the
    # bucket replaces the dedupe barrier entirely.
    def partial_topn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        import time as _time

        _t0 = _time.perf_counter()
        df = t.to_pandas()
        df = df.sort_values(
            ["ukam_address_id_r", "match_weight", "unique_id_l"],
            ascending=[True, False, False],
            kind="mergesort",
        ).drop_duplicates(["ukam_address_id_r", "ukam_address_id_l"])
        df = df.groupby("ukam_address_id_r", sort=False).head(top_n_matches)
        out = pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)
        inc_metric("rescore.partial_topn_cpu_sec", _time.perf_counter() - _t0)
        return out

    pairs = pairs.map_batches(partial_topn, batch_format="pyarrow")

    extra = list(additional_columns_to_retain or [])
    _FLOAT_COLS = {"match_weight_original", "mw_adjustment", "match_weight"}

    def _typed_empty() -> pa.Table:
        # explicit Arrow types (the pandas object-dtype empty frame would
        # land as `null`-typed columns and poison downstream schema unify
        # when a direct-exchange bucket happens to be empty)
        cols = _empty_out(use_bigrams, extra).columns
        return pa.table(
            {
                c: pa.array(
                    [], pa.float64() if c in _FLOAT_COLS else pa.string()
                )
                for c in cols
            }
        )

    def bucket(g: pa.Table):
        if g.num_rows == 0:
            return _typed_empty()
        import time as _time

        _t0 = _time.perf_counter()
        store_l = ray.get(store_l_ref)  # zero-copy from the local store
        store_r = store_l if r_ref == store_l_ref else ray.get(r_ref)
        g = _attach_payload_from_store(g, store_l, store_r, id_col)
        df = g.to_pandas()
        # cross-BLOCK duplicates of a pair (identical narrow rows emitted
        # under different blocking rules) collapse here — exact because
        # the duplicates are byte-identical
        df = df.drop_duplicates(["ukam_address_id_r", "ukam_address_id_l"])
        _t1 = _time.perf_counter()
        inc_metric("rescore.gather_cpu_sec", _t1 - _t0)
        res = fn(df)  # whole-bucket: one sort, span core per key run
        inc_metric("rescore.fn_cpu_sec", _time.perf_counter() - _t1)
        if not len(res):
            return _typed_empty()
        return pa.Table.from_pandas(
            res, preserve_index=False
        ).replace_schema_metadata(None)

    return bucketed_group_apply(
        pairs, "ukam_address_id_r", bucket, exchange="direct"
    )
