"""Term-frequency operators (A1-A8 of SURVEY.md §2.3).

The reference computes token TFs with an explode -> window -> join ->
re-aggregate SQL chain (term_frequencies.py:8-144).  Ray-Data-first, the same
result is a two-pass pipeline with *no* row-explosion shuffle:

  pass 1: ``map_batches`` emits per-batch partial (token, count) aggregates
          -> tiny ``groupby("token").sum`` -> small TF table on the driver
          (broadcast once via ``ray.put``).
  pass 2: an actor-pool ``map_batches`` stage holds the TF dict (built once
          per actor in ``__init__``) and annotates each row's token list in
          place.

Token-list logic (common-end tokens, frequency bands, histograms) follows
term_frequencies.py:147-368 exactly; histograms (DuckDB
``list_aggregate(…, 'histogram')`` producing ``map<struct,uint64>``) are
represented as ``list<struct<tok, rel_freq, count>>`` sorted by key, which is
Arrow-kernel-friendly and preserves the comparison semantics (SURVEY §1.2).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable

import pyarrow as pa
import ray

DEFAULT_REL_FREQ = 5e-5  # reference term_frequencies.py:43 COALESCE default

TOKEN_STRUCT = pa.struct([("tok", pa.string()), ("rel_freq", pa.float64())])
HIST_STRUCT = pa.struct(
    [("tok", pa.string()), ("rel_freq", pa.float64()), ("count", pa.int64())]
)

# ---------------------------------------------------------------------------
# pass 1 — corpus token frequencies (A1 first half / A7 / A8)
# ---------------------------------------------------------------------------


def partial_token_counts(t: pa.Table, *, cols: tuple[str, ...]) -> pa.Table:
    """Per-batch combiner: one (token, count) row per distinct token in the
    batch.  Collapses the batch ~100x before the groupby shuffle."""
    counts: Counter = Counter()
    for col in cols:
        if col not in t.column_names:
            continue
        field = t[col]
        if pa.types.is_list(field.type) or pa.types.is_large_list(field.type):
            for lst in field.to_pylist():
                if lst:
                    counts.update(tok for tok in lst if tok is not None)
        else:
            counts.update(v for v in field.to_pylist() if v is not None)
    return pa.table(
        {
            "token": pa.array(list(counts.keys()), pa.string()),
            "count": pa.array(list(counts.values()), pa.int64()),
        }
    )


def compute_token_rel_freq(
    ds: "ray.data.Dataset",
    *,
    cols: tuple[str, ...] = ("address_without_numbers_tokenised",),
) -> pa.Table:
    """A1/A7: corpus-wide relative token frequencies.

    Output is a *small* arrow table ``(token, count, rel_freq)`` with
    ``rel_freq = count / total_token_occurrences`` (term_frequencies.py:20-30).
    The result is intentionally materialised (it is the broadcast side of the
    annotation stage); at 10^12 rows its size is bounded by vocabulary, not
    corpus size.
    """
    partials = ds.map_batches(
        partial_token_counts,
        batch_format="pyarrow",
        fn_kwargs={"cols": cols},
    )
    # materialize before draining: to_arrow_refs() on a lazy aggregate
    # can re-execute upstream tasks (see stages/blocking.py bucket_fn note)
    agg = partials.groupby("token").sum("count").materialize()
    tf = agg.to_arrow_refs()
    tables = [ray.get(r) for r in tf]
    table = pa.concat_tables([tb for tb in tables if tb.num_rows], promote_options="default") \
        if any(tb.num_rows for tb in tables) else pa.table({"token": pa.array([], pa.string()), "sum(count)": pa.array([], pa.int64())})
    counts = table["sum(count)"]
    total = sum(counts.to_pylist()) or 1
    rel = pa.array([c / total for c in counts.to_pylist()], pa.float64())
    return pa.table(
        {"token": table["token"], "count": counts, "rel_freq": rel}
    )


def tf_table_to_dict(tf: pa.Table) -> dict[str, float]:
    return dict(zip(tf["token"].to_pylist(), tf["rel_freq"].to_pylist()))


def get_numeric_term_frequencies(
    ds: "ray.data.Dataset", *, cleaned: bool = False
) -> dict[str, dict[str, float]]:
    """Numeric-token TF lookups for numeric_token_1..3 — the reference ALWAYS
    registers these on its linker (splink_model.py:117-131, builder
    cleaning/pipelines.py:175-214: unnest numeric_tokens, tf = count/total).

    ``cleaned=False`` (default): ``ds`` is a raw address table
    (address_concat [+ postcode]); the numeric tokens are derived with the
    same partial clean queue the reference uses.  ``cleaned=True``: ``ds``
    already has numeric_token_1..3 columns (tokens beyond the third were
    dropped at split time, a negligible tail).

    One partial-aggregate pass either way; the same lookup dict is shared by
    all three column keys, ready to pass as ``tf_tables=`` to the scoring
    stages."""
    if cleaned:
        cols = ("numeric_token_1", "numeric_token_2", "numeric_token_3")
        tf = compute_token_rel_freq(ds, cols=cols)
    else:
        from . import cleaning as C

        for fn in (
            C.trim_whitespace_address_and_postcode,
            C.upper_case_address_and_postcode,
            C.clean_address_string_first_pass,
            C.parse_out_flat_position_and_letter,
            C.parse_out_numbers,
        ):
            ds = ds.map_batches(fn, batch_format="pyarrow")
        tf = compute_token_rel_freq(ds, cols=("numeric_tokens",))
    lookup = tf_table_to_dict(tf)
    return {f"numeric_token_{i}": lookup for i in (1, 2, 3)}


# ---------------------------------------------------------------------------
# pass 2 — annotate rows with token_rel_freq_arr (A1 second half / A2)
# ---------------------------------------------------------------------------


class TermFrequencyAnnotator:
    """Actor-pool stage: attach ``token_rel_freq_arr`` to every row.

    ``tf_ref`` is a ``ray.put`` object ref of a dict (or a plain dict for
    unit tests) — fetched once per actor, zero-copy from the local object
    store.  Reference semantics: term_frequencies.py:84-144 (LEFT JOIN with
    COALESCE 5e-5 for unseen tokens, order preserved).
    """

    def __init__(
        self,
        tf_ref,
        *,
        source_col: str = "address_without_numbers_tokenised",
        default: float = DEFAULT_REL_FREQ,
    ):
        self.tf = ray.get(tf_ref) if isinstance(tf_ref, ray.ObjectRef) else tf_ref
        self.source_col = source_col
        self.default = default

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        tf, default = self.tf, self.default
        arr = t[self.source_col]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        # fully vectorised: dictionary-encode the flat token values, look up
        # each unique token ONCE, gather per-token rel_freqs with a float
        # take, and rebuild the list layout on the original offsets/validity
        # (the per-token Python dict construction this replaces was the
        # single largest CPU cost of the cleaning phase: ~2ms/row)
        values = arr.values
        values = (
            values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
        )
        enc = values.dictionary_encode()
        vocab = enc.dictionary.to_pylist()
        freq_by_code = np.empty(len(vocab) + 1, dtype=np.float64)
        for i, v in enumerate(vocab):
            freq_by_code[i] = tf.get(v, default)
        freq_by_code[-1] = default  # code -1 = null token
        codes = np.asarray(pc.fill_null(enc.indices, -1), dtype=np.int64)
        rel = freq_by_code[codes]
        struct_vals = pa.StructArray.from_arrays(
            [values, pa.array(rel, pa.float64())], names=["tok", "rel_freq"]
        )
        out_type = pa.list_(TOKEN_STRUCT)
        buffers = arr.buffers()[:2]  # [validity, offsets]
        # .values is the UNSLICED child, matching the raw offsets buffer, so
        # propagating the parent's offset keeps sliced inputs correct
        out_arr = pa.Array.from_buffers(
            out_type, len(arr), buffers, children=[struct_vals], offset=arr.offset
        )
        t = t.drop_columns([self.source_col])
        return t.append_column("token_rel_freq_arr", out_arr)


# ---------------------------------------------------------------------------
# A3 — move common end tokens to their own field
# ---------------------------------------------------------------------------
# The A3-A6 stages below are fully vectorised over the flat Arrow list
# layout (offsets arithmetic + numpy masks + one take per output); the
# per-row list-of-dict loops they replace were ~25% of the cleaning phase's
# CPU.  Outputs are element-identical to the loop forms (equivalence-tested
# incl. nulls, empties and sliced inputs).


def _normalised_list(arr) -> pa.Array:
    """Chunk-combined, offset-0 list array (offset-0 lets output arrays
    reuse the input's validity buffer directly)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.offset != 0:
        import numpy as np

        offs = np.asarray(arr.offsets, dtype=np.int64)
        arr = pa.ListArray.from_arrays(
            pa.array((offs - offs[0]).astype("int32")), arr.flatten()
        )
    return arr


def _list_with_validity(template: pa.Array, offsets, child: pa.Array, out_type):
    """List array on fresh offsets/child, carrying the template's nulls."""
    lst = pa.ListArray.from_arrays(pa.array(offsets.astype("int32")), child)
    if template.null_count:
        lst = pa.Array.from_buffers(
            out_type,
            len(template),
            [template.buffers()[0], lst.buffers()[1]],
            children=[lst.values],
        )
    return lst


def _flat_ranges(starts, counts):
    """Concatenated flat indices [starts[i], starts[i]+counts[i]) per row."""
    import numpy as np

    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    csum = np.concatenate(([0], np.cumsum(counts[:-1])))
    local = np.arange(total, dtype=np.int64) - np.repeat(csum, counts)
    return np.repeat(starts, counts) + local


def move_common_end_tokens_to_field(
    t: pa.Table, *, end_tokens: frozenset[str]
) -> pa.Table:
    """term_frequencies.py:147-212: from the last 3 entries take those whose
    token is in the common-end list -> ``common_end_tokens``; then drop such
    tokens from the last 2 positions of ``token_rel_freq_arr``.  (An entry in
    the last 2 positions is always inside the last 3, so the drop condition
    reduces to "last-2 position AND end token".)"""
    import numpy as np
    import pyarrow.compute as pc

    arr = _normalised_list(t["token_rel_freq_arr"])
    n = len(arr)
    offs = np.asarray(arr.offsets, dtype=np.int64)
    starts, ends = offs[:-1], offs[1:]
    lens = ends - starts
    values = arr.values
    toks = values.field("tok")
    if end_tokens:
        is_end = np.asarray(
            pc.is_in(toks, value_set=pa.array(sorted(end_tokens), pa.string())),
            dtype=bool,
        )
    else:
        is_end = np.zeros(len(values), dtype=bool)

    # common = end-token entries among the last 3, in order
    t3 = np.minimum(lens, 3)
    tail_idx = _flat_ranges(ends - t3, t3)
    tail_rows = np.repeat(np.arange(n, dtype=np.int64), t3)
    mc = is_end[tail_idx] if len(tail_idx) else np.empty(0, dtype=bool)
    common_counts = np.bincount(tail_rows[mc], minlength=n)
    common = _list_with_validity(
        arr,
        np.concatenate(([0], np.cumsum(common_counts))),
        values.take(pa.array(tail_idx[mc])),
        pa.list_(TOKEN_STRUCT),
    )

    # kept = all entries except end-token entries in the last 2 positions
    flat_all = _flat_ranges(starts, lens)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    if len(flat_all):
        from_end = np.repeat(ends, lens) - flat_all
        drop = (from_end <= 2) & is_end[flat_all]
        keep_idx = flat_all[~drop]
        kept_counts = lens - np.bincount(row_of[drop], minlength=n)
    else:
        keep_idx = flat_all
        kept_counts = lens
    kept = _list_with_validity(
        arr,
        np.concatenate(([0], np.cumsum(kept_counts))),
        values.take(pa.array(keep_idx)),
        pa.list_(TOKEN_STRUCT),
    )
    t = t.drop_columns(["token_rel_freq_arr"])
    t = t.append_column("common_end_tokens", common)
    t = t.append_column("token_rel_freq_arr", kept)
    return t


# ---------------------------------------------------------------------------
# A4 / A5 — first unusual token fallback
# ---------------------------------------------------------------------------

FIRST_UNUSUAL_THRESHOLD = 0.001  # term_frequencies.py:224


def first_unusual_token(t: pa.Table) -> pa.Table:
    import numpy as np

    arr = _normalised_list(t["token_rel_freq_arr"])
    n = len(arr)
    offs = np.asarray(arr.offsets, dtype=np.int64)
    starts, ends = offs[:-1], offs[1:]
    lens = ends - starts
    values = arr.values
    rel = np.asarray(
        values.field("rel_freq").to_numpy(zero_copy_only=False), dtype=np.float64
    )
    flat_all = _flat_ranges(starts, lens)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    take = np.full(n, -1, dtype=np.int64)
    if len(flat_all):
        flag = rel[flat_all] < FIRST_UNUSUAL_THRESHOLD
        hit_rows, first_pos = np.unique(row_of[flag], return_index=True)
        if len(hit_rows):
            take[hit_rows] = flat_all[flag][first_pos]
    mask = take < 0
    out = values.take(pa.array(np.where(mask, 0, take), mask=mask))
    return t.append_column("first_unusual_token", out)


def use_first_unusual_token_if_no_numeric_token(t: pa.Table) -> pa.Table:
    """term_frequencies.py:236-261: when numeric_token_1 is null, promote the
    first unusual token into it and remove *all* entries with that token from
    the array."""
    import numpy as np
    import pyarrow.compute as pc

    arr = _normalised_list(t["token_rel_freq_arr"])
    n = len(arr)
    offs = np.asarray(arr.offsets, dtype=np.int64)
    starts, ends = offs[:-1], offs[1:]
    lens = ends - starts
    values = arr.values
    toks = values.field("tok")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    fut = t["first_unusual_token"]
    fut = fut.combine_chunks() if isinstance(fut, pa.ChunkedArray) else fut
    fut_tok = fut.field("tok")
    fut_tok = (
        fut_tok.combine_chunks() if isinstance(fut_tok, pa.ChunkedArray) else fut_tok
    )
    nt1 = t["numeric_token_1"]
    nt1 = nt1.combine_chunks() if isinstance(nt1, pa.ChunkedArray) else nt1
    affected = np.asarray(pc.and_(pc.is_null(nt1), pc.is_valid(fut)), dtype=bool)
    new_nt1 = pc.if_else(pc.is_valid(nt1), nt1, fut_tok)
    # drop entries whose tok == the row's promoted tok (affected rows only),
    # compared through a shared dictionary (int codes, no string compares)
    enc = pa.concat_arrays([toks, fut_tok]).dictionary_encode()
    codes = np.asarray(pc.fill_null(enc.indices, -1), dtype=np.int64)
    tok_codes, fut_codes = codes[: len(values)], codes[len(values) :]
    flat_all = _flat_ranges(starts, lens)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    if len(flat_all):
        drop = (
            affected[row_of]
            & (tok_codes[flat_all] == fut_codes[row_of])
            & (fut_codes[row_of] >= 0)
        )
        keep_idx = flat_all[~drop]
        kept_counts = lens - np.bincount(row_of[drop], minlength=n)
    else:
        keep_idx = flat_all
        kept_counts = lens
    new_arr = _list_with_validity(
        arr,
        np.concatenate(([0], np.cumsum(kept_counts))),
        values.take(pa.array(keep_idx)),
        pa.list_(TOKEN_STRUCT),
    )
    t = t.drop_columns(["numeric_token_1", "token_rel_freq_arr", "first_unusual_token"])
    t = t.append_column("numeric_token_1", new_nt1)
    t = t.append_column("token_rel_freq_arr", new_arr)
    return t


# ---------------------------------------------------------------------------
# A6 — frequency bands
# ---------------------------------------------------------------------------

UNUSUAL_BAND = (5e-5, 1e-4)
VERY_UNUSUAL_BAND = (1e-7, 5e-5)
EXTREMELY_UNUSUAL_MAX = 1e-7


def separate_unusual_tokens(
    t: pa.Table,
    *,
    unusual_band: tuple[float, float] = UNUSUAL_BAND,
    very_unusual_band: tuple[float, float] = VERY_UNUSUAL_BAND,
    extremely_unusual_max: float = EXTREMELY_UNUSUAL_MAX,
) -> pa.Table:
    """term_frequencies.py:264-307: stable-sort entries ascending by
    rel_freq, band into unusual / very unusual / extremely unusual token
    lists.  Band edges are parameters so corpora with different vocabulary
    scales can band meaningfully (the reference's constants are defaults).
    Vectorised: one global stable lexsort by (row, rel_freq), then one mask
    + bincount + take per band."""
    import numpy as np

    arr = _normalised_list(t["token_rel_freq_arr"])
    n = len(arr)
    offs = np.asarray(arr.offsets, dtype=np.int64)
    starts, ends = offs[:-1], offs[1:]
    lens = ends - starts
    values = arr.values
    rel = np.asarray(
        values.field("rel_freq").to_numpy(zero_copy_only=False), dtype=np.float64
    )
    toks = values.field("tok")
    flat_all = _flat_ranges(starts, lens)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    if len(flat_all):
        order = np.lexsort((flat_all, rel[flat_all], row_of))
        sorted_flat = flat_all[order]
        sorted_rows = row_of[order]
        sorted_rel = rel[sorted_flat]
    else:
        sorted_flat = flat_all
        sorted_rows = row_of
        sorted_rel = np.empty(0, dtype=np.float64)
    for name, lo, hi in (
        ("unusual_tokens_arr", unusual_band[0], unusual_band[1]),
        ("very_unusual_tokens_arr", very_unusual_band[0], very_unusual_band[1]),
        ("extremely_unusual_tokens_arr", None, extremely_unusual_max),
    ):
        m = (sorted_rel < hi) if lo is None else ((sorted_rel >= lo) & (sorted_rel < hi))
        counts = np.bincount(sorted_rows[m], minlength=n)
        t = t.append_column(
            name,
            _list_with_validity(
                arr,
                np.concatenate(([0], np.cumsum(counts))),
                toks.take(pa.array(sorted_flat[m])),
                pa.list_(pa.string()),
            ),
        )
    return t


# ---------------------------------------------------------------------------
# C16 — histograms + final layout
# ---------------------------------------------------------------------------


def _histogram(entries: Iterable[dict] | None) -> list[dict] | None:
    if entries is None:
        return None
    counts = Counter((x["tok"], x["rel_freq"]) for x in entries)
    return [
        {"tok": k[0], "rel_freq": k[1], "count": v}
        for k, v in sorted(counts.items(), key=lambda kv: (kv[0][0], kv[0][1]))
    ]


def final_column_order(t: pa.Table) -> pa.Table:
    """term_frequencies.py:340-368: multiset-count identical struct entries
    into histogram columns and order the flagship columns first."""
    tok_hist = [_histogram(a) for a in t["token_rel_freq_arr"].to_pylist()]
    end_hist = [_histogram(a) for a in t["common_end_tokens"].to_pylist()]
    t = t.drop_columns(["token_rel_freq_arr", "common_end_tokens"])
    t = t.append_column("token_rel_freq_arr_hist", pa.array(tok_hist, pa.list_(HIST_STRUCT)))
    t = t.append_column("common_end_tokens_hist", pa.array(end_hist, pa.list_(HIST_STRUCT)))
    lead = [
        c
        for c in (
            "unique_id",
            "numeric_token_1",
            "numeric_token_2",
            "numeric_token_3",
            "token_rel_freq_arr_hist",
            "common_end_tokens_hist",
            "postcode",
        )
        if c in t.column_names
    ]
    rest = [c for c in t.column_names if c not in lead]
    return t.select(lead + rest)
