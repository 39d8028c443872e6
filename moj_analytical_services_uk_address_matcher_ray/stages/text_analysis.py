"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All vectorised per-batch; the language-ID stage is
an actor pool (stopword tables built once per actor).

SQL-reproducible semantics (the oracle contract): every statistic here is
defined by simple, DuckDB-expressible formulas so the driver can verify the
Ray output against an ANSI-SQL oracle value-for-value.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

_WS = r"\s+"

# tiny per-language stopword lists (public common words) for the n-gram/
# stopword heuristic language-ID
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "por"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "den", "zu"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "pour", "que"},
    "zh": set(),  # handled by the CJK-codepoint ratio below
}


class LanguageId:
    """Actor-pool stage: add ``lang_pred`` + ``lang_score``.

    Heuristic: CJK codepoint share decides 'zh'; otherwise the language with
    the highest stopword hit-rate wins ('und' when nothing hits).
    """

    def __init__(self):
        self.tables = {k: v for k, v in _STOPWORDS.items() if v}
        self.langs = list(self.tables)
        # stopword value-sets as Arrow arrays, built once per actor: the
        # per-batch work is one pc.is_in over the flattened token stream
        # per language — no per-token Python
        self.stop_arrays = {
            lang: pa.array(sorted(stop)) for lang, stop in self.tables.items()
        }

    def __call__(self, t: pa.Table) -> pa.Table:
        arr = t["text"].combine_chunks()
        if pa.types.is_null(arr.type):
            arr = arr.cast(pa.string())
        filled = pc.coalesce(arr, "")
        n_chars = np.maximum(np.asarray(pc.utf8_length(filled)), 1)
        cjk = np.asarray(
            pc.count_substring_regex(filled, pattern="[一-鿿]")
        )
        cjk_ratio = cjk / n_chars
        is_zh = cjk_ratio > 0.05

        # alpha-run tokens of the lowercased text ([a-zA-Z]+ semantics)
        toks = pc.split_pattern_regex(pc.utf8_lower(filled), pattern="[^a-z]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = np.asarray(toks.offsets)
        starts, ends = offsets[:-1], offsets[1:]
        flat = toks.values
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        nonempty = np.asarray(pc.greater(pc.utf8_length(flat), 0))
        cum = np.concatenate([[0], np.cumsum(nonempty)])
        n_toks = cum[ends] - cum[starts]  # split artefacts ('') not counted

        hit_rows = np.empty((len(self.langs), t.num_rows), dtype=np.int64)
        for li, lang in enumerate(self.langs):
            m = np.asarray(pc.is_in(flat, value_set=self.stop_arrays[lang]))
            c = np.concatenate([[0], np.cumsum(m)])
            hit_rows[li] = c[ends] - c[starts]
        best_li = np.argmax(hit_rows, axis=0)  # first-max, matches dict order
        best_hits = hit_rows[best_li, np.arange(t.num_rows)]
        has_lang = (best_hits > 0) & (n_toks > 0)

        lang_codes = np.array(self.langs)
        preds = np.where(
            is_zh, "zh", np.where(has_lang, lang_codes[best_li], "und")
        )
        scores = np.where(
            is_zh,
            cjk_ratio,
            np.where(has_lang, best_hits / np.maximum(n_toks, 1), 0.0),
        )
        t = t.append_column("lang_pred", pa.array(preds, pa.string()))
        t = t.append_column("lang_score", pa.array(scores, pa.float64()))
        return t


def quality_score(t: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Quality heuristics as plain columns (SQL-mirrorable):

      n_chars        LENGTH(text)
      n_tokens       number of whitespace-separated tokens
      mean_token_len n_chars_alpha / n_tokens
      punct_ratio    punctuation chars / chars
      digit_ratio    digit chars / chars
      upper_ratio    uppercase chars / chars
    """
    arr = t[text_col].combine_chunks()
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    n_chars = pc.utf8_length(arr)
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(arr), pattern=_WS)
    n_tokens = pc.list_value_length(toks)
    punct = pc.utf8_length(pc.replace_substring_regex(arr, pattern=r"[^[:punct:]]", replacement=""))
    digit = pc.utf8_length(pc.replace_substring_regex(arr, pattern=r"[^0-9]", replacement=""))
    upper = pc.utf8_length(pc.replace_substring_regex(arr, pattern=r"[^A-Z]", replacement=""))
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int32()))
    t = t.append_column("n_chars_q", n_chars.cast(pa.int64()))
    t = t.append_column("n_tokens", n_tokens.cast(pa.int64()))
    t = t.append_column(
        "punct_ratio", pc.divide(punct.cast(pa.float64()), denom.cast(pa.float64()))
    )
    t = t.append_column(
        "digit_ratio", pc.divide(digit.cast(pa.float64()), denom.cast(pa.float64()))
    )
    t = t.append_column(
        "upper_ratio", pc.divide(upper.cast(pa.float64()), denom.cast(pa.float64()))
    )
    return t


def token_count(t: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Whitespace token count + a BPE-ish subword-unit estimate
    (count of ``\\w+|[^\\w\\s]`` matches — words and punctuation runs)."""
    texts = t[text_col].to_pylist()
    ws = []
    bpe = []
    # re.ASCII for RE2/DuckDB-oracle parity (unicode \w diverges on accents)
    word_re = re.compile(r"\w+|[^\w\s]", re.ASCII)
    for s in texts:
        s = s or ""
        ws.append(len(s.split()) if s.strip() else 0)
        bpe.append(len(word_re.findall(s)))
    t = t.append_column("ws_tokens", pa.array(ws, pa.int64()))
    t = t.append_column("bpe_ish_tokens", pa.array(bpe, pa.int64()))
    return t


def fingerprint(
    t: pa.Table, *, text_col: str = "text", window: int = 8
) -> pa.Table:
    """Rolling-hash document fingerprint: min rolling hash over byte windows
    (winnowing-style) + full sha256.  Deterministic; near-identical docs with
    small edits keep the min-window fingerprint with high probability."""
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    texts = t[text_col].to_pylist()
    full, mins = [], []
    B = np.uint64(0x100000001B3)  # FNV prime; hash arithmetic wraps mod 2^64
    powers = np.empty(window, dtype=np.uint64)
    acc = np.uint64(1)
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the hash
        for k in range(window - 1, -1, -1):
            powers[k] = acc
            acc = acc * B
    CHUNK = 1 << 16
    for s in texts:
        s = s or ""
        data_b = s.encode()
        full.append(hashlib.sha256(data_b).hexdigest())
        if len(data_b) < window:
            mins.append(hashlib.blake2b(data_b, digest_size=8).hexdigest())
            continue
        # fully vectorised windowed polynomial hash mod 2^64 (uint64 wrap):
        # the earlier per-byte Python loop cost O(len) interpreter ops per
        # document — a cluster-killer at corpus scale
        data = np.frombuffer(data_b, dtype=np.uint8)
        windows_m = sliding_window_view(data, window)
        best = np.uint64(0xFFFFFFFFFFFFFFFF)
        for off in range(0, windows_m.shape[0], CHUNK):
            chunk = windows_m[off : off + CHUNK].astype(np.uint64)
            h = (chunk * powers[None, :]).sum(axis=1, dtype=np.uint64)
            m = h.min()
            if m < best:
                best = m
        mins.append(f"{int(best):016x}")
    t = t.append_column("doc_sha256", pa.array(full, pa.string()))
    t = t.append_column("doc_min_fingerprint", pa.array(mins, pa.string()))
    return t


#: (pattern, replacement) pairs applied IN ORDER — RE2 syntax, identical
#: semantics under pyarrow.compute and DuckDB regexp_replace(..., 'g'), so
#: the driver oracle re-applies the same chain in SQL.  Order matters: the
#: email rule runs before the digit-run rule so addresses with digits are
#: tagged <EMAIL>, not chopped by <NUM>.
REDACT_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9 ().-]{7,}[0-9]", "<PHONE>"),
    (r"[0-9]{6,}", "<NUM>"),
]


def redact(
    t: pa.Table,
    *,
    text_col: str = "text",
    patterns: list[tuple[str, str]] | None = None,
    out_col: str = "redacted_text",
) -> pa.Table:
    """Sequential vectorised regex redaction (emails, phone-ish runs, long
    digit runs by default) + a per-pattern match count.  One
    ``pc.replace_substring_regex`` kernel per pattern — no Python in the
    per-row path."""
    patterns = patterns if patterns is not None else REDACT_PATTERNS
    arr = t[text_col].combine_chunks()
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    cur = pc.coalesce(arr, "")
    total = None
    for pat, repl in patterns:
        n = pc.count_substring_regex(cur, pattern=pat)
        total = n if total is None else pc.add(total, n)
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=repl)
    t = t.append_column(out_col, cur)
    t = t.append_column("n_redacted", total.cast(pa.int64()))
    return t


def chunk_tokens(
    t: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
) -> pa.Table:
    """Split each document into overlapping whitespace-token windows — the
    sequence-packing precursor of a training pipeline.  Emits one row per
    chunk: (id, chunk_id, chunk_text, n_tokens).

    Deterministic chunk rule (SQL-oracle contract): tokens = non-empty
    splits on ``\\s+``; step = chunk_size - overlap; n_chunks =
    ceil(max(n_tokens - overlap, 1) / step); chunk i covers tokens
    [i*step, i*step + chunk_size).  Runs as a flat map over batches — no
    shuffle; output rows stay within the input block.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap
    arr = t[text_col].combine_chunks()
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    toks = pc.split_pattern_regex(pc.coalesce(arr, ""), pattern=_WS)
    ids = t[id_col].to_pylist()
    tok_lists = toks.to_pylist()
    out_id, out_chunk, out_text, out_n = [], [], [], []
    for rid, tl in zip(ids, tok_lists):
        tl = [x for x in (tl or []) if x]
        n = len(tl)
        n_chunks = -(-max(n - overlap, 1) // step)
        for i in range(n_chunks):
            piece = tl[i * step : i * step + chunk_size]
            out_id.append(rid)
            out_chunk.append(i)
            out_text.append(" ".join(piece))
            out_n.append(len(piece))
    return pa.table(
        {
            id_col: pa.array(out_id),
            "chunk_id": pa.array(out_chunk, pa.int32()),
            "chunk_text": pa.array(out_text, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
        }
    )


#: the exact character set DuckDB's ``trim()`` strips — Unicode category Zs
#: (space separators), probed empirically: \t/\n/​/  are NOT
#: stripped, every Zs codepoint is.  Arrow's ``utf8_trim_whitespace`` would
#: strip control whitespace too and break oracle parity on edge inputs.
_DUCKDB_TRIM_CHARS = (
    " \u00a0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u202f\u205f\u3000"
)


def _token_stream(arr, *, lower: bool = True) -> tuple[pa.Array, np.ndarray]:
    """Whitespace-token stream of a string column: (flat token values,
    int64 list offsets).  Token rule shared verbatim with the DuckDB
    oracles: ``regexp_split_to_array(trim(lower(coalesce(text, ''))),
    '\\s+')``.  Parity details: DuckDB ``trim()`` strips exactly Unicode
    Zs (``_DUCKDB_TRIM_CHARS``), null text is coalesced to ``''`` on both
    engines, and an empty/all-space text yields the single empty token;
    pinned by a hypothesis property test against live DuckDB."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    s = pc.utf8_trim(pc.coalesce(arr, ""), characters=_DUCKDB_TRIM_CHARS)
    if lower:
        s = pc.utf8_lower(s)
    toks = pc.split_pattern_regex(s, pattern=_WS)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks.flatten(), np.asarray(toks.offsets, dtype=np.int64)


def _flat_ngrams(
    values: pa.Array, offsets: np.ndarray, n: int
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Every length-``n`` token window of the flattened stream, plus which
    flat positions are whole-document windows.  Returns ``(ngrams,
    doc_of_pos, valid)`` where ``ngrams[i]`` joins tokens [i, i+n) with
    single spaces.  Vectorised: ``n`` shifted zero-copy slices feed ONE
    ``binary_join_element_wise`` kernel; a window that crosses a document
    boundary is masked out by ``valid``, never materialised downstream."""
    L = len(values)
    m = max(L - n + 1, 0)
    ndocs = len(offsets) - 1
    if m == 0:
        empty = np.empty(0, dtype=np.int64)
        return pa.array([], pa.string()), empty, np.empty(0, dtype=bool)
    slices = [values.slice(k, m) for k in range(n)]
    ngrams = pc.binary_join_element_wise(*slices, " ")
    doc_of_pos = np.repeat(
        np.arange(ndocs, dtype=np.int64), np.diff(offsets)
    )[:m]
    valid = (np.arange(m, dtype=np.int64) + n) <= offsets[doc_of_pos + 1]
    return ngrams, doc_of_pos, valid


def build_benchmark_ngrams(ds, *, text_col: str = "text", n: int = 13) -> pa.Array:
    """Distinct token ``n``-grams of a benchmark dataset as one Arrow string
    array, ready for ``ray.put`` broadcast into :class:`NgramDecontaminator`.

    Benchmark suites are orders of magnitude smaller than the corpus being
    decontaminated, so this is the broadcast-small-side pattern: per-batch
    distinct inside ``map_batches``, then a driver union-distinct over the
    already-deduplicated parts — no shuffle, and the corpus side never
    moves."""

    def distinct_batch(t: pa.Table) -> pa.Table:
        values, offsets = _token_stream(t[text_col])
        ngrams, _, valid = _flat_ngrams(values, offsets, n)
        if len(ngrams) == 0:
            return pa.table({"ngram": pa.array([], pa.string())})
        return pa.table({"ngram": pc.unique(ngrams.filter(pa.array(valid)))})

    parts = ray.get(
        ds.map_batches(distinct_batch, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    tbls = [p for p in parts if p.num_rows > 0]
    if not tbls:
        return pa.array([], pa.string())
    col = pa.concat_tables(tbls)["ngram"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.unique(col)


class NgramDecontaminator:
    """Benchmark decontamination: flag documents sharing any token
    ``n``-gram with a held-out benchmark set (the n-gram-overlap rule of
    the GPT-3 appendix-C / C4 lineage; 13-grams published, smaller ``n``
    for short documents).

    Use as an actor-pool ``map_batches`` stage: pass the ``ray.put`` ref of
    :func:`build_benchmark_ngrams`'s array and the benchmark set is fetched
    zero-copy ONCE per actor in ``__init__``, never per batch.  Appends

      n_contaminated_ngrams  number of n-gram positions hitting the set
      contaminated           n_contaminated_ngrams > 0
    """

    def __init__(self, benchmark, *, text_col: str = "text", n: int = 13):
        if not isinstance(benchmark, pa.Array):
            benchmark = ray.get(benchmark)
        self.benchmark = benchmark
        self.text_col = text_col
        self.n = n

    def __call__(self, t: pa.Table) -> pa.Table:
        values, offsets = _token_stream(t[self.text_col])
        ngrams, doc_of_pos, valid = _flat_ngrams(values, offsets, self.n)
        ndocs = t.num_rows
        if len(ngrams) == 0 or len(self.benchmark) == 0:
            hits = np.zeros(ndocs, dtype=np.int64)
        else:
            member = pc.is_in(ngrams, value_set=self.benchmark).to_numpy(
                zero_copy_only=False
            )
            hits = np.bincount(
                doc_of_pos[member & valid], minlength=ndocs
            ).astype(np.int64)
        t = t.append_column("n_contaminated_ngrams", pa.array(hits, pa.int64()))
        t = t.append_column("contaminated", pa.array(hits > 0, pa.bool_()))
        return t


def repetition_stats(t: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Within-document repetition signals (the Gopher/MassiveText repetition
    filters, Rae et al. 2021 — duplicate-token and duplicate-n-gram
    fractions), defined in SQL-mirrorable integer terms:

      rep_n_tokens          tokens per document
      rep_distinct_tokens   distinct tokens per document
      rep_top_token_count   occurrences of the most frequent token
      rep_n_bigrams         token bigrams (n_tokens - 1, floored at 0)
      rep_distinct_bigrams  distinct bigrams
      dup_token_frac        1 - distinct/total
      top_token_frac        top_count/total
      dup_bigram_frac       1 - distinct_bigrams/bigrams (0 when no bigrams)

    Pure per-document map — no shuffle.  Distinct counting is ONE
    contiguous ``dictionary_encode`` over the flattened token stream (9x
    faster than chunked encoding — ROADMAP engine lessons) plus
    ``np.unique`` on a (doc, code) composite key; no Python in the per-row
    path."""
    values, offsets = _token_stream(t[text_col])
    ndocs = t.num_rows
    n_tok = np.diff(offsets)
    doc_of_tok = np.repeat(np.arange(ndocs, dtype=np.int64), n_tok)
    if len(values) == 0:
        distinct = np.zeros(ndocs, dtype=np.int64)
        top = np.zeros(ndocs, dtype=np.int64)
    else:
        enc = pc.dictionary_encode(values)
        codes = np.asarray(enc.indices, dtype=np.int64)
        K = max(len(enc.dictionary), 1)
        uniq, counts = np.unique(doc_of_tok * K + codes, return_counts=True)
        doc_u = uniq // K
        distinct = np.bincount(doc_u, minlength=ndocs).astype(np.int64)
        top = np.zeros(ndocs, dtype=np.int64)
        np.maximum.at(top, doc_u, counts)
    ngrams, doc_of_pos, valid = _flat_ngrams(values, offsets, 2)
    if len(ngrams) == 0:
        n_big = np.zeros(ndocs, dtype=np.int64)
        distinct_big = np.zeros(ndocs, dtype=np.int64)
    else:
        bg = ngrams.filter(pa.array(valid))
        doc_bg = doc_of_pos[valid]
        n_big = np.bincount(doc_bg, minlength=ndocs).astype(np.int64)
        if len(bg) == 0:
            distinct_big = np.zeros(ndocs, dtype=np.int64)
        else:
            enc2 = pc.dictionary_encode(bg)
            codes2 = np.asarray(enc2.indices, dtype=np.int64)
            K2 = max(len(enc2.dictionary), 1)
            uniq2 = np.unique(doc_bg * K2 + codes2)
            distinct_big = np.bincount(uniq2 // K2, minlength=ndocs).astype(
                np.int64
            )
    denom = np.maximum(n_tok, 1).astype(np.float64)
    denom_b = np.maximum(n_big, 1).astype(np.float64)
    t = t.append_column("rep_n_tokens", pa.array(n_tok, pa.int64()))
    t = t.append_column("rep_distinct_tokens", pa.array(distinct, pa.int64()))
    t = t.append_column("rep_top_token_count", pa.array(top, pa.int64()))
    t = t.append_column("rep_n_bigrams", pa.array(n_big, pa.int64()))
    t = t.append_column(
        "rep_distinct_bigrams", pa.array(distinct_big, pa.int64())
    )
    t = t.append_column(
        "dup_token_frac", pa.array(1.0 - distinct / denom, pa.float64())
    )
    t = t.append_column("top_token_frac", pa.array(top / denom, pa.float64()))
    t = t.append_column(
        "dup_bigram_frac",
        pa.array(
            np.where(n_big > 0, 1.0 - distinct_big / denom_b, 0.0), pa.float64()
        ),
    )
    return t


def corpus_df_stats(
    ds,
    *,
    text_col: str = "text",
    terms: list[str] | None = None,
    min_df: int = 1,
) -> tuple[dict, int, float]:
    """Corpus statistics for BM25: ``(document frequency per token, n_docs,
    average doc length in tokens)``.

    Scale shape: each batch emits its local per-token DF (distinct-per-doc,
    so a token counts once per document) plus a ``(n_docs, len_sum)``
    sidecar row; ONE token-bucketed shuffle sums the partials to exact DF
    (per-task state is a bucket's vocabulary slice — the driver NEVER holds
    the concatenation of per-batch partials, which at web scale is billions
    of distinct identifiers/typos/hashes).  The driver then collects only
    the surviving rows: pass ``terms`` (e.g. the BM25 query) and the
    collect is O(|terms|) regardless of corpus size — :class:`BM25Scorer`
    only ever looks up its query terms; without ``terms`` the full
    dictionary is inherently O(vocabulary), gated by ``min_df`` to shed the
    hapax tail.  The returned tuple is meant to be ``ray.put`` once and
    read by every :class:`BM25Scorer` actor."""
    from .bucketing import bucketed_group_apply

    term_set = (
        pa.array(sorted(set(terms)), pa.string()) if terms is not None else None
    )

    def partial(t: pa.Table) -> pa.Table:
        values, offsets = _token_stream(t[text_col])
        ndocs = t.num_rows
        if len(values) == 0:
            tok = pa.array([], pa.string())
            dfc = np.empty(0, dtype=np.int64)
        else:
            doc_of_tok = np.repeat(
                np.arange(ndocs, dtype=np.int64), np.diff(offsets)
            )
            enc = pc.dictionary_encode(values)
            codes = np.asarray(enc.indices, dtype=np.int64)
            K = max(len(enc.dictionary), 1)
            uniq = np.unique(doc_of_tok * K + codes)
            dfc = np.bincount(uniq % K, minlength=K).astype(np.int64)
            keep = dfc > 0
            tok = enc.dictionary.filter(pa.array(keep))
            dfc = dfc[keep]
        if term_set is not None and len(tok):
            # consumer only needs these terms' DF: prune at the map side so
            # the shuffle payload is O(|terms|) per batch, not O(batch vocab)
            keep = pc.is_in(tok, value_set=term_set)
            tok = tok.filter(keep)
            dfc = dfc[keep.to_numpy(zero_copy_only=False)]
        # sidecar row: doc count + token-length sum ride the same shuffle
        # (df=0, so colliding with a real '' token still sums correctly)
        tok = pa.concat_arrays([tok.combine_chunks() if isinstance(tok, pa.ChunkedArray) else tok, pa.array([""], pa.string())])
        dfc = np.r_[dfc, 0]
        n_docs = np.zeros(len(tok), dtype=np.int64)
        len_sum = np.zeros(len(tok), dtype=np.int64)
        n_docs[-1] = ndocs
        len_sum[-1] = int(offsets[-1]) if len(offsets) else 0
        return pa.table(
            {
                "token": tok,
                "df": pa.array(dfc, pa.int64()),
                "n_docs": pa.array(n_docs, pa.int64()),
                "len_sum": pa.array(len_sum, pa.int64()),
            }
        )

    def sum_bucket(g: pa.Table) -> pa.Table:
        agg = g.group_by(["token"]).aggregate(
            [("df", "sum"), ("n_docs", "sum"), ("len_sum", "sum")]
        )
        return agg.rename_columns(["token", "df", "n_docs", "len_sum"])

    reduced = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), ["token"], sum_bucket
    )
    parts = ray.get(reduced.materialize().to_arrow_refs())
    tbls = [p for p in parts if p.num_rows > 0]
    if not tbls:
        return {}, 0, 0.0
    allp = pa.concat_tables(tbls, promote_options="default")
    n_docs = int(pc.sum(allp["n_docs"]).as_py() or 0)
    len_sum = int(pc.sum(allp["len_sum"]).as_py() or 0)
    avg_len = (len_sum / n_docs) if n_docs else 0.0
    keep = pc.greater_equal(allp["df"], pa.scalar(max(min_df, 1), pa.int64()))
    kept = allp.filter(keep)
    dfs = dict(
        zip(
            kept["token"].to_pylist(),
            np.asarray(kept["df"].to_numpy(zero_copy_only=False)).tolist(),
        )
    )
    return dfs, n_docs, avg_len


class BM25Scorer:
    """Okapi BM25 document scoring against a fixed query — the ranked
    retrieval / query-relevance filter of a training-data pipeline.

    Formula (the standard Robertson/Sparck-Jones form with the +1 idf
    floor, so unseen terms score 0 rather than negative):

      idf(q)  = ln( (N - df + 0.5) / (df + 0.5) + 1 )
      s(d)    = sum_q idf(q) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len_d / avg_len))

    Actor-pool stage: corpus stats (``corpus_df_stats``'s ray.put tuple)
    are fetched once per actor in ``__init__``; per batch, each query
    term's tf per document is ONE vectorised equality + bincount over the
    flat token stream (query terms are few; docs are many).  Appends
    ``bm25_score``."""

    def __init__(
        self,
        stats,
        query: list[str],
        *,
        text_col: str = "text",
        k1: float = 1.2,
        b: float = 0.75,
    ):
        if not isinstance(stats, tuple):
            stats = ray.get(stats)
        df, n_docs, avg_len = stats
        self.text_col = text_col
        self.k1 = float(k1)
        self.b = float(b)
        self.avg_len = float(avg_len) if avg_len else 1.0
        # per-term idf precomputed once per actor; terms sorted so the
        # accumulation order (and thus float rounding) is deterministic and
        # matches the SQL oracle's ORDER BY term
        self.terms = sorted(set(query))
        self.idf = {
            q: float(
                np.log((n_docs - df.get(q, 0) + 0.5) / (df.get(q, 0) + 0.5) + 1.0)
            )
            for q in self.terms
        }

    def __call__(self, t: pa.Table) -> pa.Table:
        values, offsets = _token_stream(t[self.text_col])
        ndocs = t.num_rows
        lens = np.diff(offsets).astype(np.float64)
        denom_norm = self.k1 * (1.0 - self.b + self.b * lens / self.avg_len)
        score = np.zeros(ndocs, dtype=np.float64)
        if len(values):
            doc_of_tok = np.repeat(
                np.arange(ndocs, dtype=np.int64), np.diff(offsets)
            )
            for q in self.terms:
                mask = pc.equal(values, q).to_numpy(zero_copy_only=False)
                if not mask.any():
                    continue
                tf = np.bincount(doc_of_tok[mask], minlength=ndocs).astype(
                    np.float64
                )
                score += self.idf[q] * tf * (self.k1 + 1.0) / (tf + denom_norm)
        return t.append_column("bm25_score", pa.array(score, pa.float64()))


def corpus_lm_stats(
    ds,
    *,
    text_col: str = "text",
    max_vocab: int = 65536,
    k: float = 0.5,
) -> tuple:
    """Train an add-k-smoothed bigram language model over a corpus — the
    statistics behind CCNet-style LM quality filtering (Wenzek et al. 2020
    lineage: score documents by cross-entropy under a reference LM).

    Two partial-aggregate passes over the TRAINING set (which, like CCNet's
    Wikipedia LM, is normally a ``sample_by_hash`` subset, not the corpus
    being scored): pass A counts unigrams and picks the top-``max_vocab``
    vocabulary (ties: count desc, token asc — deterministic); pass B counts
    bigrams with out-of-vocabulary tokens folded to ``<unk>``.  Both
    passes combine through ONE hash-bucketed shuffle, so driver peak memory
    is the FINAL model size (``n_buckets x max_vocab`` candidate rows for
    pass A, the observed in-model bigram table for pass B) — never the
    concatenation of per-batch vocabulary partials, which at web scale is
    unbounded.  Returns a plain tuple ``(vocab, uni_counts, bi_keys,
    bi_counts, V, k)`` meant for ONE ``ray.put`` read by every
    :class:`LMScorer` actor."""
    import pandas as pd

    from .bucketing import bucketed_group_apply

    def uni_partial(t: pa.Table) -> pa.Table:
        values, _ = _token_stream(t[text_col])
        if len(values) == 0:
            return pa.table(
                {"w": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(values)
        return pa.table(
            {"w": vc.field("values"), "c": vc.field("counts").cast(pa.int64())}
        )

    def uni_topk_bucket(g: pa.Table) -> pa.Table:
        # exact counts for this bucket's token slice (all partials of a
        # token hash to one bucket), then keep the bucket's top-max_vocab —
        # the global top-k is a subset of the union of per-bucket top-ks.
        agg = g.group_by(["w"]).aggregate([("c", "sum")]).rename_columns(
            ["w", "c"]
        )
        total = int(pc.sum(agg["c"]).as_py() or 0)
        idx = pc.sort_indices(
            agg, sort_keys=[("c", "descending"), ("w", "ascending")]
        )
        top = agg.take(idx[: min(max_vocab, agg.num_rows)])
        tot = np.zeros(top.num_rows, dtype=np.int64)
        if top.num_rows:
            tot[0] = total  # bucket grand total rides the first row
        return top.append_column("tot", pa.array(tot, pa.int64()))

    reduced = bucketed_group_apply(
        ds.map_batches(uni_partial, batch_format="pyarrow"),
        ["w"],
        uni_topk_bucket,
    )
    uparts = [
        p
        for p in ray.get(reduced.materialize().to_arrow_refs())
        if p.num_rows > 0
    ]
    if not uparts:
        return [], np.zeros(1, np.int64), np.empty(0, np.int64), np.empty(0, np.int64), 0, k
    allu = pa.concat_tables(uparts, promote_options="default")
    total_tokens = int(pc.sum(allu["tot"]).as_py() or 0)
    cand = pd.DataFrame(
        {
            "w": allu["w"].to_pandas(),
            "c": np.asarray(allu["c"].to_numpy(zero_copy_only=False)),
        }
    ).sort_values(["c", "w"], ascending=[False, True], kind="mergesort")
    head = cand.head(max_vocab)
    vocab = head["w"].tolist()
    vocab_arr = pa.array(vocab, pa.string())
    nv = len(vocab)
    uni_counts = np.zeros(nv + 1, dtype=np.int64)
    uni_counts[:nv] = head["c"].to_numpy(dtype=np.int64)
    uni_counts[nv] = total_tokens - int(uni_counts[:nv].sum())  # <unk>
    V = nv + (1 if uni_counts[nv] > 0 else 0)

    vocab_ref = ray.put(vocab_arr)

    def bi_partial(t: pa.Table) -> pa.Table:
        va = ray.get(vocab_ref) if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref
        values, offsets = _token_stream(t[text_col])
        if len(values) < 2:
            return pa.table(
                {"key": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        codes = np.asarray(
            pc.fill_null(pc.index_in(values, value_set=va), nv).to_numpy(
                zero_copy_only=False
            ),
            dtype=np.int64,
        )
        ndocs = len(offsets) - 1
        m = len(codes) - 1
        doc_of_pos = np.repeat(
            np.arange(ndocs, dtype=np.int64), np.diff(offsets)
        )[:m]
        valid = (np.arange(m, dtype=np.int64) + 2) <= offsets[doc_of_pos + 1]
        keys = codes[:-1][valid] * (nv + 1) + codes[1:][valid]
        uk, uc = np.unique(keys, return_counts=True)
        return pa.table(
            {"key": pa.array(uk, pa.int64()), "c": pa.array(uc, pa.int64())}
        )

    def sum_bi_bucket(g: pa.Table) -> pa.Table:
        agg = g.group_by(["key"]).aggregate([("c", "sum")])
        return agg.rename_columns(["key", "c"])

    bi_reduced = bucketed_group_apply(
        ds.map_batches(bi_partial, batch_format="pyarrow"),
        ["key"],
        sum_bi_bucket,
    )
    bparts = [
        p
        for p in ray.get(bi_reduced.materialize().to_arrow_refs())
        if p.num_rows > 0
    ]
    if bparts:
        allb = pa.concat_tables(bparts, promote_options="default")
        bi_keys = np.asarray(allb["key"].to_numpy(zero_copy_only=False), dtype=np.int64)
        bi_counts = np.asarray(allb["c"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(bi_keys, kind="stable")
        bi_keys = bi_keys[order]
        bi_counts = bi_counts[order]
    else:
        bi_keys = np.empty(0, dtype=np.int64)
        bi_counts = np.empty(0, dtype=np.int64)
    return vocab, uni_counts, bi_keys, bi_counts, V, k


class LMScorer:
    """Bigram-LM cross-entropy per document (lower = more like the training
    corpus) — the CCNet-style LM quality filter.  Appends
    ``lm_cross_entropy`` (natural-log; 0 for docs with < 2 tokens).

    Actor-pool stage: the stats tuple is fetched once per actor; per batch,
    token->code is ONE ``index_in`` against the broadcast vocabulary and
    bigram-count lookup is ONE ``searchsorted`` against the sorted key
    array — no per-token Python."""

    def __init__(self, stats, *, text_col: str = "text"):
        if not isinstance(stats, tuple):
            stats = ray.get(stats)
        vocab, self.uni_counts, self.bi_keys, self.bi_counts, self.V, self.k = stats
        self.vocab_arr = pa.array(list(vocab), pa.string())
        self.nv = len(vocab)
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        values, offsets = _token_stream(t[self.text_col])
        ndocs = t.num_rows
        ce = np.zeros(ndocs, dtype=np.float64)
        if len(values) >= 2:
            codes = np.asarray(
                pc.fill_null(
                    pc.index_in(values, value_set=self.vocab_arr), self.nv
                ).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            m = len(codes) - 1
            doc_of_pos = np.repeat(
                np.arange(ndocs, dtype=np.int64), np.diff(offsets)
            )[:m]
            valid = (np.arange(m, dtype=np.int64) + 2) <= offsets[doc_of_pos + 1]
            c1 = codes[:-1][valid]
            keys = c1 * (self.nv + 1) + codes[1:][valid]
            pos = np.searchsorted(self.bi_keys, keys)
            pos_c = np.minimum(pos, max(len(self.bi_keys) - 1, 0))
            hit = (
                (self.bi_keys[pos_c] == keys) & (pos < len(self.bi_keys))
                if len(self.bi_keys)
                else np.zeros(len(keys), dtype=bool)
            )
            bc = np.where(hit, self.bi_counts[pos_c] if len(self.bi_counts) else 0, 0)
            contrib = np.log(
                (bc + self.k) / (self.uni_counts[c1] + self.k * self.V)
            )
            docs = doc_of_pos[valid]
            lp = np.bincount(docs, weights=contrib, minlength=ndocs)
            nb = np.bincount(docs, minlength=ndocs)
            has = nb > 0
            ce[has] = -lp[has] / nb[has]
        return t.append_column("lm_cross_entropy", pa.array(ce, pa.float64()))


def doc_entropy(
    t: pa.Table, *, text_col: str = "text", out_col: str = "entropy_bits"
) -> pa.Table:
    """Per-document unigram (token) Shannon entropy in bits — the classic
    "natural language vs boilerplate/garbage" quality signal: low entropy
    flags repetitive or templated text, near-uniform entropy flags random
    token soup.  Pure per-document map, no shuffle; the same contiguous
    dictionary_encode + composite-key ``np.unique`` kernel as
    :func:`repetition_stats` (no Python in the per-row path).

    Token rule is the pinned oracle rule (`_token_stream`); an empty or
    all-space document yields the single empty token and entropy 0."""
    values, offsets = _token_stream(t[text_col])
    ndocs = t.num_rows
    n_tok = np.diff(offsets)
    ent = np.zeros(ndocs, dtype=np.float64)
    if len(values):
        doc_of_tok = np.repeat(np.arange(ndocs, dtype=np.int64), n_tok)
        enc = pc.dictionary_encode(values)
        codes = np.asarray(enc.indices, dtype=np.int64)
        K = max(len(enc.dictionary), 1)
        uniq, counts = np.unique(doc_of_tok * K + codes, return_counts=True)
        doc_u = uniq // K
        p = counts / n_tok[doc_u].astype(np.float64)
        np.add.at(ent, doc_u, -p * np.log2(p))
    return t.append_column(out_col, pa.array(ent, pa.float64()))


def heavy_hitters(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    min_count: int,
    sketch_k: int = 4096,
) -> pa.Table:
    """EXACT global heavy hitters: every token whose corpus-wide count is
    ``>= min_count``, with its exact count — without ever shuffling or
    collecting the full vocabulary (the stopword/boilerplate-token audit a
    100 TB corpus needs, where the vocabulary itself is billions of keys).

    Two streaming scans, zero shuffles:

      1. **Sketch scan** — each block reduces its local exact counts to a
         Misra-Gries summary of ``sketch_k`` counters (subtract the
         (k+1)-th largest local count, keep positives — the mergeable-
         summaries reduction of Agarwal et al., SODA'12).  Each summary
         underestimates a token by at most ``N_block/(k+1)``, so the
         driver-side sum of residuals underestimates by at most
         ``N/(k+1)`` globally: every token with true count
         ``> N/(k+1)`` survives.  Driver combine is O(blocks x k),
         bounded regardless of vocabulary size (contrast
         :func:`corpus_df_stats`, which is O(vocab) by design).
      2. **Confirm scan** — the candidate set (residual upper bound
         ``>= min_count``) is broadcast into a second scan that counts
         ONLY candidate tokens exactly (``pc.is_in`` filter per batch);
         the driver combine is O(candidates).

    Raises ``ValueError`` when the guarantee cannot hold
    (``min_count <= N/(sketch_k+1)``) — raise ``sketch_k`` — rather than
    silently missing hitters.  Returns a small Arrow table
    ``(token, cnt)`` sorted (cnt desc, token asc); token rule is the
    pinned oracle rule (`_token_stream`).
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")

    def sketch(t: pa.Table) -> pa.Table:
        values, _ = _token_stream(t[text_col])
        n_tok = len(values)
        if n_tok == 0:
            tok = pa.array([""], pa.string())
            res = np.zeros(1, dtype=np.int64)
        else:
            enc = pc.dictionary_encode(values)
            counts = np.bincount(
                np.asarray(enc.indices, dtype=np.int64),
                minlength=len(enc.dictionary),
            ).astype(np.int64)
            if len(counts) > sketch_k:
                # (k+1)-th largest local count; subtracting it keeps at
                # most k positive counters and underestimates any token
                # by <= N_block/(k+1).
                d = np.partition(counts, len(counts) - (sketch_k + 1))[
                    len(counts) - (sketch_k + 1)
                ]
                res = counts - d
            else:
                res = counts
            keep = res > 0
            tok = enc.dictionary.filter(pa.array(keep))
            res = res[keep]
            if len(tok) == 0:
                tok = pa.array([""], pa.string())
                res = np.zeros(1, dtype=np.int64)
        ntotal = np.zeros(len(tok), dtype=np.int64)
        ntotal[0] = n_tok
        return pa.table(
            {
                "token": tok,
                "res": pa.array(res, pa.int64()),
                "n_total": pa.array(ntotal, pa.int64()),
            }
        )

    import pandas as pd

    parts = ray.get(
        ds.map_batches(sketch, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    tbls = [p for p in parts if p.num_rows > 0]
    if not tbls:
        return pa.table(
            {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    allp = pa.concat_tables(tbls, promote_options="default")
    n_tokens = int(pc.sum(allp["n_total"]).as_py() or 0)
    max_under = n_tokens // (sketch_k + 1)
    if min_count <= max_under:
        raise ValueError(
            f"heavy_hitters guarantee violated: min_count={min_count} <= "
            f"N/(k+1)={max_under} for N={n_tokens} tokens; raise sketch_k "
            f"above {n_tokens // max(min_count, 1)}"
        )
    res_sum = (
        pd.Series(
            np.asarray(allp["res"].to_numpy(zero_copy_only=False)),
            index=allp["token"].to_pandas(),
        )
        .groupby(level=0)
        .sum()
    )
    # true count <= residual_sum + max_under, so anything whose upper
    # bound misses min_count can be dropped before the confirm scan.
    cand = res_sum[res_sum + max_under >= min_count]
    if not len(cand):
        return pa.table(
            {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    cand_arr = pa.array(cand.index.to_numpy(dtype=object), pa.string())

    def confirm(t: pa.Table) -> pa.Table:
        values, _ = _token_stream(t[text_col])
        if len(values) == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        hit = values.filter(pc.is_in(values, value_set=cand_arr))
        if len(hit) == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        enc = pc.dictionary_encode(hit)
        counts = np.bincount(
            np.asarray(enc.indices, dtype=np.int64),
            minlength=len(enc.dictionary),
        ).astype(np.int64)
        return pa.table(
            {"token": enc.dictionary, "cnt": pa.array(counts, pa.int64())}
        )

    cparts = ray.get(
        ds.map_batches(confirm, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    ctbls = [p for p in cparts if p.num_rows > 0]
    if not ctbls:
        return pa.table(
            {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    allc = pa.concat_tables(ctbls, promote_options="default")
    cnt = (
        pd.Series(
            np.asarray(allc["cnt"].to_numpy(zero_copy_only=False)),
            index=allc["token"].to_pandas(),
        )
        .groupby(level=0)
        .sum()
    )
    cnt = cnt[cnt >= min_count].sort_index()
    cnt = cnt.sort_values(ascending=False, kind="mergesort")
    return pa.table(
        {
            "token": pa.array(cnt.index.to_numpy(dtype=object), pa.string()),
            "cnt": pa.array(cnt.to_numpy(dtype=np.int64), pa.int64()),
        }
    )


def group_topk_tokens(
    ds: "ray.data.Dataset",
    *,
    group_col: str = "lang",
    text_col: str = "text",
    k: int = 5,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Top-``k`` most frequent tokens per group (corpus vocabulary audit /
    per-language stopword discovery): ``(group, token, cnt, rank)`` with the
    deterministic tie-break (count desc, token asc).

    Scale shape — the canonical two-level frequency top-k:
      1. per-BATCH (group, token) partial counts (one vectorised composite
         np.unique; the combiner — a batch contributes at most its local
         vocabulary, never its token stream);
      2. ONE (group, token)-bucketed shuffle summing partials to exact
         counts (payload = vocab-sized, not corpus-sized);
      3. a second TINY shuffle of the vocab table bucketed on group alone;
         per bucket one vectorised sort + per-group cumcount head-``k``.
    """
    import pandas as pd

    from .bucketing import bucketed_group_apply

    def partial(t: pa.Table) -> pa.Table:
        values, offsets = _token_stream(t[text_col])
        ndocs = t.num_rows
        n_tok = np.diff(offsets)
        if len(values) == 0:
            return pa.table(
                {
                    group_col: pa.array([], t.schema.field(group_col).type),
                    "token": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        grp = t[group_col]
        grp = grp.combine_chunks() if isinstance(grp, pa.ChunkedArray) else grp
        genc = grp.dictionary_encode()
        gcodes = np.repeat(np.asarray(genc.indices, dtype=np.int64), n_tok)
        tenc = pc.dictionary_encode(values)
        tcodes = np.asarray(tenc.indices, dtype=np.int64)
        K = max(len(tenc.dictionary), 1)
        uniq, counts = np.unique(gcodes * K + tcodes, return_counts=True)
        return pa.table(
            {
                group_col: genc.dictionary.take(pa.array(uniq // K, pa.int64())),
                "token": tenc.dictionary.take(pa.array(uniq % K, pa.int64())),
                "cnt": pa.array(counts, pa.int64()),
            }
        )

    def sum_bucket(g: pa.Table) -> pa.Table:
        agg = g.group_by([group_col, "token"]).aggregate([("cnt", "sum")])
        return agg.rename_columns([group_col, "token", "cnt"])

    exact = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "token"],
        sum_bucket,
        n_buckets=n_buckets,
    )

    def topk_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return df.assign(rank=pd.Series([], dtype="int64"))
        df = df.sort_values(
            [group_col, "cnt", "token"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        rank = df.groupby(group_col, sort=False).cumcount() + 1
        df = df.assign(rank=rank.astype("int64"))
        return df[df["rank"] <= k]

    return bucketed_group_apply(
        exact, [group_col], topk_bucket, batch_format="pandas",
        n_buckets=n_buckets,
    )


def dsir_weights(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 4096,
    smoothing: float = 1.0,
) -> "ray.data.Dataset":
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document log
    importance ratio between a TARGET distribution (rows where
    ``target_col == target_value``) and the RAW corpus, under hashed
    bigram features — the principled "make my web crawl look like my
    target domain" selector.

      weight(d) = sum over d's bigram occurrences g of
                  ln( (ct[b(g)]+s) / (T+s*B) ) - ln( (cr[b(g)]+s) / (R+s*B) )

    where ``b(g) = md5(g) % B`` (bit-reproducible in DuckDB — the module's
    standard hashing), ct/cr are target/raw bucket counts, T/R the totals,
    s the add-``smoothing`` prior.  Resample downstream with
    :func:`~.sampling.sample_per_group`-style lotteries or a top-k.

    Scale shape: ONE stats scan emitting per-block ``(bucket, cnt_raw,
    cnt_target)`` partials (bounded by B per block — the driver combine is
    O(B), independent of corpus or vocabulary size; that boundedness is
    the reason DSIR hashes), then a broadcast ``lam`` array (B float64,
    ``ray.put`` once) feeds a zero-shuffle scoring scan.  md5 runs once
    per UNIQUE bigram per batch (same discipline as minhash shingles).
    """
    import hashlib

    def _buckets_of(dictionary: pa.Array) -> np.ndarray:
        return np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
                % n_buckets
                for s in dictionary.to_pylist()
            ),
            dtype=np.int64,
            count=len(dictionary),
        )

    def _doc_bigrams(t: pa.Table):
        values, offsets = _token_stream(t[text_col])
        grams, doc_of_pos, valid = _flat_ngrams(values, offsets, 2)
        if len(grams) == 0 or not valid.any():
            return None
        grams = grams.filter(pa.array(valid))
        doc_of_pos = doc_of_pos[valid]
        enc = pc.dictionary_encode(grams)
        codes = np.asarray(enc.indices, dtype=np.int64)
        return _buckets_of(enc.dictionary), codes, doc_of_pos

    def stats(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "cnt_raw": pa.array([], pa.int64()),
                "cnt_tgt": pa.array([], pa.int64()),
            }
        )
        bg = _doc_bigrams(t)
        if bg is None:
            return empty
        bkt, codes, doc_of_pos = bg
        pos_b = bkt[codes]
        cr = np.bincount(pos_b, minlength=n_buckets)
        is_tgt = np.asarray(
            pc.equal(
                pc.coalesce(
                    t[target_col].combine_chunks()
                    if isinstance(t[target_col], pa.ChunkedArray)
                    else t[target_col],
                    "",
                ),
                target_value,
            )
        )
        ct = np.bincount(
            pos_b[is_tgt[doc_of_pos]], minlength=n_buckets
        )
        nz = np.flatnonzero(cr)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "cnt_raw": pa.array(cr[nz], pa.int64()),
                "cnt_tgt": pa.array(ct[nz], pa.int64()),
            }
        )

    parts = ray.get(
        ds.map_batches(stats, batch_format="pyarrow").materialize().to_arrow_refs()
    )
    cr = np.zeros(n_buckets, dtype=np.int64)
    ct = np.zeros(n_buckets, dtype=np.int64)
    for p in parts:
        if p.num_rows:
            b = np.asarray(p["bucket"].to_numpy(zero_copy_only=False))
            cr[b] += np.asarray(p["cnt_raw"].to_numpy(zero_copy_only=False))
            ct[b] += np.asarray(p["cnt_tgt"].to_numpy(zero_copy_only=False))
    R, T = int(cr.sum()), int(ct.sum())
    s = float(smoothing)
    lam = np.log((ct + s) / (T + s * n_buckets)) - np.log(
        (cr + s) / (R + s * n_buckets)
    )
    lam_ref = ray.put(lam)

    def score(t: pa.Table) -> pa.Table:
        lam_v = ray.get(lam_ref)
        w = np.zeros(t.num_rows, dtype=np.float64)
        bg = _doc_bigrams(t)
        if bg is not None:
            bkt, codes, doc_of_pos = bg
            np.add.at(w, doc_of_pos, lam_v[bkt[codes]])
        return pa.table(
            {id_col: t[id_col], "dsir_weight": pa.array(w, pa.float64())}
        )

    return ds.map_batches(score, batch_format="pyarrow")
