"""The cleaning pipeline — composition of C1-C16 + TF stages (§3.1).

Mirrors the reference's stage queues (cleaning/pipelines.py:35-63):

  QUEUE_PRE_TF   : C1..C13 (12 stages, fused by Ray's streaming executor)
  [TF pass]      : on-the-fly corpus TF (A1/A7) or precomputed table (A2)
  QUEUE_POST_TF  : A3 common-end tokens, A4/A5 first-unusual fallback,
                   A6 frequency bands, C16 histograms + final layout.

The reference runs everything on one DuckDB connection; here the pre-TF
stages are chained ``map_batches`` (zero-copy Arrow, operator-fused), the TF
table is a two-pass partial-aggregate + broadcast dict, and the post-TF
stages fuse again.  One full-pipeline run = at most ONE small shuffle (the
TF groupby over per-batch partial counts).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..stages import cleaning as C
from ..stages import term_frequency as TF

#: default common-end-token frequency floor — analogue of the reference's
#: ``token_count > 3000`` CSV threshold (term_frequencies.py:162-169), as a
#: *relative* share of rows so it scales with corpus size.
COMMON_END_TOKEN_ROW_SHARE = 0.01


def pre_tf_stages() -> list:
    """QUEUE_PRE_TF — order is semantics-bearing (pipelines.py:35-48)."""
    return [
        C.assign_ukam_address_id,
        C.trim_whitespace_address_and_postcode,
        C.upper_case_address_and_postcode,
        C.canonicalise_postcode,
        C.clean_address_string_first_pass,
        # NOTE: remove_duplicate_end_tokens is deliberately NOT in the
        # default queue — the reference defines _remove_duplicate_end_tokens
        # but never wires it into QUEUE_PRE_TF (cleaning/pipelines.py:35-48),
        # so running it here would diverge original_address_concat (the
        # exact-match join key) from reference output.  It remains available
        # as an opt-in operator (stages/cleaning.py, C6).
        C.derive_original_address_concat,
        C.parse_out_flat_position_and_letter,
        C.parse_out_numbers,
        C.clean_address_string_second_pass,
        C.split_numeric_tokens_to_cols,
        C.create_tokenised_address_concat,
        C.tokenise_address_without_numbers,
    ]


def apply_pre_tf(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    for fn in pre_tf_stages():
        ds = ds.map_batches(fn, batch_format="pyarrow")
    return ds


def compute_end_token_counts(ds: "ray.data.Dataset") -> pa.Table:
    """Count how often each token is the FINAL address token — the corpus
    analogue of the reference's checked-in common_end_tokens.csv."""

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for lst in t["address_tokens"].to_pylist():
            if lst:
                counts[lst[-1]] += 1
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "token_count": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("token").sum(
        "token_count"
    ).materialize()
    tbl = pa.concat_tables(
        [ray.get(r) for r in agg.to_arrow_refs()], promote_options="default"
    )
    return pa.table({"token": tbl["token"], "token_count": tbl["sum(token_count)"]})


def common_end_tokens_from_counts(
    counts: pa.Table, *, min_count: int
) -> frozenset[str]:
    return frozenset(
        tok
        for tok, n in zip(counts["token"].to_pylist(), counts["token_count"].to_pylist())
        if n > min_count
    )


def _auto_concurrency() -> tuple[int, int]:
    """TF-annotator pool bounds: floor 1 so tiny clusters (2 CPUs) are not
    fully reserved by the actor pool (which starves upstream tasks)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (max(1, min(2, cpus // 4)), max(2, cpus // 4))


_TF_TASK_CACHE: dict = {}


def _annotate_tf_task(t: pa.Table, tf_ref, default) -> pa.Table:
    """Task-form TF annotation: the dict rides plasma once per worker
    process (cached), the per-batch kernel is TermFrequencyAnnotator's.
    A plain task (unlike the actor pool) fuses with the surrounding map
    chain WITHOUT dragging it onto a size-capped actor pool — the fused
    derive+clean+annotate chain previously ran as <=8 actors (measured 5x
    the CPU and a parallelism ceiling)."""
    key = tf_ref.hex() if isinstance(tf_ref, ray.ObjectRef) else id(tf_ref)
    ann = _TF_TASK_CACHE.get(key)
    if ann is None:
        _TF_TASK_CACHE.clear()
        kwargs = {} if default is None else {"default": default}
        ann = TF.TermFrequencyAnnotator(tf_ref, **kwargs)
        _TF_TASK_CACHE[key] = ann
    return ann(t)


def apply_post_tf(
    ds: "ray.data.Dataset",
    tf: dict[str, float] | "ray.ObjectRef",
    end_tokens: frozenset[str],
    *,
    tf_concurrency: int | tuple[int, int] | None = None,
    tf_default: float | None = None,
) -> "ray.data.Dataset":
    if not isinstance(tf, ray.ObjectRef):
        tf = ray.put(tf)
    ds = ds.map_batches(
        _annotate_tf_task,
        batch_format="pyarrow",
        fn_kwargs={"tf_ref": tf, "default": tf_default},
    )
    ds = ds.map_batches(
        TF.move_common_end_tokens_to_field,
        batch_format="pyarrow",
        fn_kwargs={"end_tokens": end_tokens},
    )
    ds = ds.map_batches(TF.first_unusual_token, batch_format="pyarrow")
    ds = ds.map_batches(
        TF.use_first_unusual_token_if_no_numeric_token, batch_format="pyarrow"
    )
    ds = ds.map_batches(TF.separate_unusual_tokens, batch_format="pyarrow")
    ds = ds.map_batches(TF.final_column_order, batch_format="pyarrow")
    return ds


def clean_dataset(
    ds: "ray.data.Dataset",
    *,
    rel_tok_freq: dict[str, float] | None = None,
    end_tokens: frozenset[str] | None = None,
    tf_concurrency: int | tuple[int, int] | None = None,
    tf_default: float | None = None,
) -> "ray.data.Dataset":
    """Full cleaning pipeline.

    ``rel_tok_freq=None`` -> on-the-fly corpus TF (reference
    ``clean_data_on_the_fly``); a dict -> precomputed-TF variant
    (``clean_data_using_precomputed_rel_tok_freq``).  ``end_tokens=None``
    derives the common-end-token set from the corpus itself.  With BOTH
    statistics precomputed (``corpus_tf_and_end_tokens``), the whole clean
    is one fused map chain — no mid-pipeline materialisation or shuffle.
    ``tf_default`` overrides the unseen-token rel_freq (pass the singleton
    rel_freq when the dict was singleton-compressed).
    """
    ds = apply_pre_tf(ds)
    if rel_tok_freq is None or end_tokens is None:
        ds = ds.materialize()  # the TF pass reads the pre-TF output once
        # coalesce tiny blocks: every sort-based groupby downstream (the TF
        # partial-aggregate here, exact/blocking shuffles later) spawns one
        # reduce task per input block, and per-task fixed cost dominates at
        # sub-MB blocks (see pipelines/code_linkage.py).  No-op at scale.
        from ..stages.bucketing import coalesce_blocks

        ds = coalesce_blocks(ds)
    if rel_tok_freq is None and end_tokens is None:
        # fused single pass: token counts AND end-token counts from one
        # partial-aggregate shuffle (saves a full corpus scan)
        rel_tok_freq, end_tokens, tf_default = _tf_and_end_tokens_single_pass(ds)
    if rel_tok_freq is None:
        rel_tok_freq = TF.tf_table_to_dict(TF.compute_token_rel_freq(ds))
    if end_tokens is None:
        counts = compute_end_token_counts(ds)
        n_rows = ds.count()
        end_tokens = common_end_tokens_from_counts(
            counts, min_count=max(2, int(n_rows * COMMON_END_TOKEN_ROW_SHARE))
        )
    tf_ref = ray.put(rel_tok_freq)
    return apply_post_tf(
        ds, tf_ref, end_tokens, tf_concurrency=tf_concurrency, tf_default=tf_default
    )


def _last_tokens(t: pa.Table, col: str = "address_tokens") -> pa.Array:
    """Vectorised last-element-per-list (null for null/empty lists)."""
    import numpy as np
    import pyarrow.compute as pc

    arr = t[col]
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_null(arr.type):
        return pa.nulls(len(arr), pa.string())
    if not isinstance(arr, pa.ListArray):
        arr = arr.cast(pa.list_(pa.string()))
    offs = np.asarray(arr.offsets)
    lens = offs[1:] - offs[:-1]
    valid = (~np.asarray(arr.is_null())) & (lens > 0)
    idx = np.where(valid, offs[1:] - 1, 0)
    taken = arr.values.take(pa.array(idx, pa.int32()))
    return pc.if_else(pa.array(valid), taken, pa.scalar(None, pa.string()))


def _make_stats_partial(tokens_col: str, numeric_cols: tuple[str, ...] = ()):
    """Vectorised per-batch partial for the corpus TF + end-token aggregate:
    one ``list_flatten`` + Arrow ``value_counts`` per batch (the Counter
    row-loop this replaces was ~40% of the two-table clean phase)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        parts = []
        flat = pc.list_flatten(
            t[tokens_col].combine_chunks()
            if isinstance(t[tokens_col], pa.ChunkedArray)
            else t[tokens_col]
        )
        parts.append(flat.drop_null())
        for c in numeric_cols:
            arr = t[c]
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
            if pa.types.is_null(arr.type):
                continue
            parts.append(arr.drop_null())
        allv = pa.concat_arrays([p.cast(pa.string()) for p in parts])
        vc = allv.value_counts()
        tok_counts = dict(
            zip(vc.field(0).to_pylist(), vc.field(1).to_pylist())
        )
        evc = _last_tokens(t).drop_null().value_counts()
        end_counts = dict(
            zip(evc.field(0).to_pylist(), evc.field(1).to_pylist())
        )
        n_rows = t.num_rows
        tokens = list(set(tok_counts) | set(end_counts))
        if not tokens and n_rows:
            tokens = [""]  # keep the row count even if no tokens at all
        return pa.table(
            {
                "token": pa.array(tokens, pa.string()),
                "count": pa.array(
                    [tok_counts.get(x, 0) for x in tokens], pa.int64()
                ),
                "end_count": pa.array(
                    [end_counts.get(x, 0) for x in tokens], pa.int64()
                ),
                "rows": pa.array(
                    [n_rows] + [0] * (len(tokens) - 1) if tokens else [],
                    pa.int64(),
                ),
            }
        )

    return partial


def _tf_and_end_tokens_single_pass(
    ds: "ray.data.Dataset",
) -> tuple[dict[str, float], frozenset[str], float]:
    """One map + one groupby for BOTH corpus statistics: per-token occurrence
    counts (from address_without_numbers_tokenised) and final-token counts
    (from address_tokens), plus the row count for the end-token threshold.

    Singleton tokens (count == 1 — the bulk of the vocabulary when content
    fingerprints ride the address text) are NOT stored: their rel_freq is
    exactly ``1/total``, which is returned as the annotator default, so the
    broadcast dict shrinks ~6x with bit-identical annotation output."""
    partial = _make_stats_partial("address_without_numbers_tokenised")

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum(["count", "end_count", "rows"])
    )
    tbl = pa.concat_tables(
        [ray.get(r) for r in agg.materialize().to_arrow_refs()],
        promote_options="default",
    )
    tokens = tbl["token"].to_pylist()
    counts = tbl["sum(count)"].to_pylist()
    ends = tbl["sum(end_count)"].to_pylist()
    n_rows = sum(tbl["sum(rows)"].to_pylist())
    total = sum(counts) or 1
    tf = {t: c / total for t, c in zip(tokens, counts) if c > 1}
    min_count = max(2, int(n_rows * COMMON_END_TOKEN_ROW_SHARE))
    end_tokens = frozenset(t for t, e in zip(tokens, ends) if e > min_count)
    return tf, end_tokens, 1.0 / total


def clean_data_with_minimal_steps(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Reference ``clean_data_with_minimal_steps`` — pre-TF stages only."""
    return apply_pre_tf(ds)


def corpus_tf_and_end_tokens(
    ds: "ray.data.Dataset",
    *,
    numeric_cols: tuple[str, ...] = (
        "numeric_token_1",
        "numeric_token_2",
        "numeric_token_3",
    ),
    tokens_col: str = "address_without_numbers_tokenised",
) -> tuple[dict[str, float], frozenset[str], float]:
    """ONE partial-aggregate pass over a pre-TF-cleaned dataset producing
    BOTH corpus statistics a two-table run needs: the A7-style token
    frequency dict (numeric + non-numeric tokens, reference
    term_frequencies.py:371-418) and the common-end-token set — the way the
    reference derives its reference-data TF table once from the canonical
    universe and reuses it for every messy table (match_epc_to_os.py:60-75).

    Returns ``(tf_dict, end_tokens, default_rel_freq)``; singleton tokens
    are compressed out of the dict (their rel_freq is exactly the returned
    default), shrinking the broadcast payload ~6x.

    The final combine is a DRIVER-side pandas groupby over the per-block
    partials: the partial stream is O(vocab x blocks), orders of magnitude
    smaller than the corpus, and the Ray sort-groupby it replaces cost a
    flat ~3-4s barrier per run.  (At vocabularies where vocab x blocks
    itself is big, fall back to ``_tf_and_end_tokens_single_pass``'s
    distributed combine.)"""
    import pandas as pd

    partial = _make_stats_partial(tokens_col, numeric_cols)
    parts = ray.get(
        ds.map_batches(partial, batch_format="pyarrow").materialize().to_arrow_refs()
    )
    pdf = (
        pa.concat_tables(parts, promote_options="default")
        .to_pandas()
        .groupby("token", sort=False)
        .sum()
    )
    tokens = pdf.index.to_list()
    counts = pdf["count"].to_list()
    ends = pdf["end_count"].to_list()
    n_rows = int(pdf["rows"].sum())
    total = sum(counts) or 1
    tf = {t: c / total for t, c in zip(tokens, counts) if c > 1}
    min_count = max(2, int(n_rows * COMMON_END_TOKEN_ROW_SHARE))
    end_tokens = frozenset(t for t, e in zip(tokens, ends) if e > min_count)
    return tf, end_tokens, 1.0 / total


def get_token_frequency_table(
    ds: "ray.data.Dataset",
    *,
    numeric_cols: tuple[str, ...] = (
        "numeric_token_1",
        "numeric_token_2",
        "numeric_token_3",
    ),
    tokens_col: str = "address_without_numbers_tokenised",
) -> pa.Table:
    """A7/A8 (term_frequencies.py:371-418 + pipelines.py:175-214): corpus
    token-frequency table over numeric AND non-numeric tokens, rel_freq =
    count / total occurrences, ordered by count desc."""
    tf = TF.compute_token_rel_freq(ds, cols=(*numeric_cols, tokens_col))
    order = pa.compute.sort_indices(
        tf, sort_keys=[("count", "descending"), ("token", "ascending")]
    )
    return tf.take(order)


# ---------------------------------------------------------------------------
# C14 — adjacent-record distinguishing tokens (opt-in, ordering-sensitive)
# ---------------------------------------------------------------------------

_REMOVE_IN_ADJ = {"FLAT", "APARTMENT", "UNIT"}


def derive_adjacent_distinguishing_tokens(
    ds: "ray.data.Dataset",
    *,
    presorted: bool = False,
) -> "ray.data.Dataset":
    """token_parsing.py:11-115: sort by reverse(address_concat); compare each
    row's token suffix with its sorted neighbours; split tokens into
    ``distinguishing_adj_start_tokens`` (head) and ``common_adj_start_tokens``
    (shared suffix).

    EXACT global-window semantics: after the global sort, each ordered block
    is processed with a one-row sidecar from its neighbouring blocks (the
    previous block's last row and the next block's first row), so boundary
    rows see their true lag/lead neighbours — bit-identical to the
    reference's single-table window.  This is one of the rare spots where
    raw Ray tasks are used (the Dataset API has no ordered cross-block
    window): a tiny edge-row fetch per block, then one task per block, and
    the results re-enter ``ray.data`` via ``from_arrow_refs``.

    ``presorted=True`` skips the sort (caller guarantees global order by
    reverse(address_concat)) — used by tests to control block layout.
    """

    def add_sort_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # codepoint-wise reverse, identical to Python s[::-1] on valid
        # UTF-8; vectorised (the prior list comprehension was a per-row
        # Python loop in a sort-prep stage)
        return t.append_column(
            "__rev", pc.utf8_reverse(t["address_concat"].combine_chunks())
        )

    if not presorted:
        ds = ds.map_batches(add_sort_key, batch_format="pyarrow").sort("__rev")
    ds = ds.materialize()  # pin the ordered block layout

    def windows(t: pa.Table) -> pa.Table:
        toks_all = [
            [x for x in (lst or []) if x not in _REMOVE_IN_ADJ]
            for lst in (
                s.split(" ") if s is not None else []
                for s in t["address_concat"].to_pylist()
            )
        ]

        def common_suffix(a: list[str] | None, b: list[str] | None) -> int:
            if a is None or b is None:
                return 0
            n = 0
            for x, y in zip(reversed(a), reversed(b)):
                if x == y:
                    n += 1
                else:
                    break
            return n

        dis, com = [], []
        for i, toks in enumerate(toks_all):
            prev = toks_all[i - 1] if i > 0 else None
            nxt = toks_all[i + 1] if i + 1 < len(toks_all) else None
            k = max(common_suffix(toks, prev), common_suffix(toks, nxt))
            split = len(toks) - k
            dis.append(toks[:split])
            com.append(toks[split:])
        if "__rev" in t.column_names:
            t = t.drop_columns(["__rev"])
        t = t.append_column(
            "distinguishing_adj_start_tokens", pa.array(dis, pa.list_(pa.string()))
        )
        t = t.append_column(
            "common_adj_start_tokens", pa.array(com, pa.list_(pa.string()))
        )
        return t

    refs = [r for r in ds.to_arrow_refs()]

    @ray.remote
    def _edges(t: pa.Table):
        if t.num_rows == 0:
            return None, None
        return t.slice(0, 1), t.slice(t.num_rows - 1, 1)

    edges = ray.get([_edges.remote(r) for r in refs])
    live = [i for i, (f, _) in enumerate(edges) if f is not None]

    @ray.remote
    def _process(t: pa.Table, prev_last, next_first) -> pa.Table:
        parts = [p for p in (prev_last, t, next_first) if p is not None]
        ext = pa.concat_tables(parts, promote_options="default")
        out = windows(ext)
        start = prev_last.num_rows if prev_last is not None else 0
        return out.slice(start, t.num_rows)

    out_refs = []
    for pos, i in enumerate(live):
        prev_last = edges[live[pos - 1]][1] if pos > 0 else None
        next_first = edges[live[pos + 1]][0] if pos + 1 < len(live) else None
        out_refs.append(_process.remote(refs[i], prev_last, next_first))
    if not out_refs:
        return ds.map_batches(windows, batch_format="pyarrow")
    return ray.data.from_arrow_refs(out_refs)
