"""Cleaning / tokenisation batch transforms (operators C1-C16 of SURVEY.md §2.2).

Every function here is a pure ``pyarrow.Table -> pyarrow.Table`` batch
transform meant for ``Dataset.map_batches(fn, batch_format="pyarrow")`` —
stateless, vectorised where the kernel exists (pyarrow.compute is RE2-based,
matching DuckDB's regex engine bit-for-bit), token-list logic in per-batch
Python over short strings.

Semantics re-derived from the reference's SQL stages:
  - normalisation.py:19-183  (C1-C7, C10)
  - token_parsing.py:118-253 (C8, C9, C11)
  - tokenisation.py:7-52     (C12, C13)
  - token_parsing.py:283-332 (C15 generalised_token_aliases)

The chained ``map_batches`` calls fuse in Ray Data's streaming executor, so
keeping the stages as separate named functions costs nothing at runtime and
preserves the reference's stage-per-operator structure.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import regexes as rx

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _str(col) -> pa.Array:
    """Combine chunks and cast null-typed (all-null block) columns to string
    so the utf8 kernels accept them."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    return arr


def _replace_chain(arr: pa.Array, chain: list[tuple[str, str]]) -> pa.Array:
    for pattern, replacement in chain:
        arr = pc.replace_substring_regex(arr, pattern=pattern, replacement=replacement)
    return arr


def _set_column(t: pa.Table, name: str, arr) -> pa.Table:
    """Replace column in place (preserving position) or append."""
    if name in t.column_names:
        return t.set_column(t.column_names.index(name), name, arr)
    return t.append_column(name, arr)


def _empty_to_null(arr: pa.Array) -> pa.Array:
    """NULLIF(x, '') — DuckDB regexp_extract returns '' on no match."""
    return pc.if_else(pc.equal(arr, ""), pa.scalar(None, pa.string()), arr)


# ---------------------------------------------------------------------------
# C1 — surrogate key
# ---------------------------------------------------------------------------


def assign_ukam_address_id(
    t: pa.Table,
    *,
    id_cols: tuple[str, ...] = ("unique_id", "address_concat", "postcode"),
) -> pa.Table:
    """Surrogate key guaranteeing uniqueness even when ``unique_id`` collides.

    The reference uses ``ROW_NUMBER() OVER ()`` (normalisation.py:19-31);
    a global row number is a full-ordering barrier in a distributed engine,
    so we instead derive a 128-bit content hash of the identifying columns
    plus the row's duplicate-rank within its batch (ties broken by a batch
    fingerprint).  Deterministic under task retries (a retried block has
    identical content).  Collisions require two *fully identical* batches —
    vanishingly unlikely and harmless for linkage semantics.
    """
    cols = [c for c in id_cols if c in t.column_names]
    arrs = [t[c].to_pylist() for c in cols]
    n = t.num_rows
    seen: dict[tuple, int] = {}
    batch_fp = hashlib.blake2b(
        repr((n, tuple(cols))).encode(), digest_size=8
    )
    for a in arrs:
        for v in a[: min(n, 64)]:
            batch_fp.update(repr(v).encode())
    salt = batch_fp.hexdigest()
    out = np.empty(n, dtype=object)
    for i in range(n):
        key = tuple(a[i] for a in arrs)
        rank = seen.get(key, 0)
        seen[key] = rank + 1
        h = hashlib.blake2b(digest_size=16)
        h.update(repr(key).encode())
        if rank:
            h.update(f"#{rank}@{salt}".encode())
        out[i] = h.hexdigest()
    return _set_column(t, "ukam_address_id", pa.array(out, pa.string()))


# ---------------------------------------------------------------------------
# C2-C5, C7, C10 — string normalisation (pure pyarrow.compute)
# ---------------------------------------------------------------------------


def trim_whitespace_address_and_postcode(t: pa.Table) -> pa.Table:
    t = _set_column(t, "address_concat", pc.utf8_trim_whitespace(_str(t["address_concat"])))
    if "postcode" in t.column_names:
        t = _set_column(t, "postcode", pc.utf8_trim_whitespace(_str(t["postcode"])))
    return t


def upper_case_address_and_postcode(t: pa.Table) -> pa.Table:
    t = _set_column(t, "address_concat", pc.utf8_upper(_str(t["address_concat"])))
    if "postcode" in t.column_names:
        t = _set_column(t, "postcode", pc.utf8_upper(_str(t["postcode"])))
    return t


def canonicalise_postcode(t: pa.Table) -> pa.Table:
    pat, rep = rx.UK_POSTCODE
    t = _set_column(
        t,
        "postcode",
        pc.replace_substring_regex(_str(t["postcode"]), pattern=pat, replacement=rep),
    )
    return t


def clean_address_string_first_pass(t: pa.Table) -> pa.Table:
    arr = _replace_chain(_str(t["address_concat"]), rx.FIRST_PASS_CHAIN)
    arr = pc.utf8_trim_whitespace(arr)
    return _set_column(t, "address_concat", arr)


def derive_original_address_concat(t: pa.Table) -> pa.Table:
    return _set_column(t, "original_address_concat", t["address_concat"])


def clean_address_string_second_pass(t: pa.Table) -> pa.Table:
    arr = _replace_chain(_str(t["address_without_numbers"]), rx.SECOND_PASS_CHAIN)
    arr = pc.utf8_trim_whitespace(arr)
    return _set_column(t, "address_without_numbers", arr)


# ---------------------------------------------------------------------------
# C6 — remove duplicated end tokens
# ---------------------------------------------------------------------------


def remove_duplicate_end_tokens(t: pa.Table) -> pa.Table:
    """Drop a repeated final token or repeated final token-pair.

    Reference normalisation.py:120-149:
      tokens[-1] == tokens[-2]                      -> drop last token
      len>=4 and tokens[-4:-2] == tokens[-2:]       -> drop last two tokens
    """
    vals = t["address_concat"].to_pylist()
    out = []
    for s in vals:
        if s is None:
            out.append(None)
            continue
        toks = s.split(" ")
        if len(toks) >= 2 and toks[-1] == toks[-2]:
            out.append(" ".join(toks[:-1]))
        elif len(toks) >= 4 and toks[-4] == toks[-2] and toks[-3] == toks[-1]:
            out.append(" ".join(toks[:-2]))
        else:
            out.append(s)
    return _set_column(t, "address_concat", pa.array(out, pa.string()))


# ---------------------------------------------------------------------------
# C8 — flat positional / flat letter extraction
# ---------------------------------------------------------------------------

_FLOOR_POS_NAMED = (
    r"\b(?P<g>BASEMENT|GROUND FLOOR|FIRST FLOOR|SECOND FLOOR|THIRD FLOOR"
    r"|TOP FLOOR|GARDEN)\b"
)
_FLAT_LETTER_NAMED = r"\b\d{0,4}(?P<g>[A-Za-z])\b"
_LEADING_LETTER_NAMED = r"^\s*\d+(?P<g>[A-Za-z])\b"
_FLAT_NUMBER_NAMED = r"\b(?P<g>FLAT|UNIT|APARTMENT)\s+(?:\S*\d\S*)\s+\S*\d\S*\b"


def _extract_group(arr: pa.Array, pattern: str) -> pa.Array:
    """regexp_extract(arr, pattern, 1) with DuckDB's ''-on-no-match folded
    to null (the reference applies NULLIF afterwards)."""
    res = pc.extract_regex(arr, pattern=pattern)
    return pc.struct_field(res, "g")


def parse_out_flat_position_and_letter(t: pa.Table) -> pa.Table:
    """token_parsing.py:118-174.  Note: the third fallback extracts capture
    group 1 of the FLAT/UNIT/APARTMENT pattern, which is the *keyword*
    ('FLAT'/'UNIT' pass the <=4 char filter) — a reference quirk we keep."""
    arr = _str(t["address_concat"])
    floor_pos = _extract_group(arr, _FLOOR_POS_NAMED)
    flat_letter = _extract_group(arr, _FLAT_LETTER_NAMED)
    leading = _extract_group(arr, _LEADING_LETTER_NAMED)
    flat_num = _extract_group(arr, _FLAT_NUMBER_NAMED)
    flat_num = pc.if_else(
        pc.less_equal(pc.utf8_length(pc.coalesce(flat_num, "")), 4),
        flat_num,
        pa.scalar(None, pa.string()),
    )
    combined = pc.coalesce(
        _empty_to_null(pc.coalesce(flat_letter, "")),
        _empty_to_null(pc.coalesce(leading, "")),
        flat_num,
    )
    t = _set_column(t, "flat_positional", _empty_to_null(pc.coalesce(floor_pos, "")))
    t = _set_column(t, "flat_letter", _empty_to_null(pc.coalesce(combined, "")))
    return t


# ---------------------------------------------------------------------------
# C9 — numeric token extraction
# ---------------------------------------------------------------------------

# re.ASCII: the reference executes these patterns under DuckDB's RE2,
# whose \b / \d / \w are ASCII-only — Python's default unicode classes
# would treat e.g. 'É' as a word char and disagree on '0É' (\b placement).
# The Arrow kernels used for STRIPPING are RE2 too, so extraction must
# match or strip/extract diverge (caught by tests/test_regex_fuzz.py).
_NUMERIC_RE = re.compile(rx.NUMERIC_TOKEN, re.ASCII)
_ALL_DIGITS_RE = re.compile(r"^\d+$", re.ASCII)
_DIGITS_RE = re.compile(rx.DIGITS, re.ASCII)


def parse_out_numbers(t: pa.Table) -> pa.Table:
    """token_parsing.py:177-217: pull numeric tokens into a list column and
    strip them from the string.  If ``flat_letter`` is purely numeric the
    first numeric token is dropped (it duplicates the flat number)."""
    arr = _str(t["address_concat"])
    stripped = pc.replace_substring_regex(arr, pattern=rx.NUMERIC_TOKEN, replacement="")
    vals = arr.to_pylist()
    flat_letters = (
        t["flat_letter"].to_pylist()
        if "flat_letter" in t.column_names
        else [None] * t.num_rows
    )
    tokens_out = []
    for s, fl in zip(vals, flat_letters):
        if s is None:
            tokens_out.append(None)
            continue
        toks = _NUMERIC_RE.findall(s)
        if fl is not None and _ALL_DIGITS_RE.match(fl):
            toks = toks[1:]
        tokens_out.append(toks)
    t = t.drop_columns(["address_concat"])
    t = t.append_column("address_without_numbers", stripped)
    t = t.append_column("numeric_tokens", pa.array(tokens_out, pa.list_(pa.string())))
    return t


def split_numeric_tokens_to_cols(t: pa.Table) -> pa.Table:
    """tokenisation.py:22-36: digits of the first three numeric tokens
    (letters stripped) -> numeric_token_1/2/3."""
    toks = t["numeric_tokens"].to_pylist()
    cols = {1: [], 2: [], 3: []}
    for lst in toks:
        digits = _DIGITS_RE.findall(" ".join(lst)) if lst else []
        for i in (1, 2, 3):
            cols[i].append(digits[i - 1] if len(digits) >= i else None)
    t = t.drop_columns(["numeric_tokens"])
    for i in (1, 2, 3):
        t = t.append_column(f"numeric_token_{i}", pa.array(cols[i], pa.string()))
    return t


# ---------------------------------------------------------------------------
# C12 / C13 — tokenisation
# ---------------------------------------------------------------------------


def create_tokenised_address_concat(t: pa.Table) -> pa.Table:
    """string_split(original_address_concat, ' ') -> address_tokens."""
    arr = pc.split_pattern(_str(t["original_address_concat"]), pattern=" ")
    return _set_column(t, "address_tokens", arr)


def tokenise_address_without_numbers(t: pa.Table) -> pa.Table:
    """regexp_split_to_array(trim(x), '\\s+') -> address_without_numbers_tokenised."""
    arr = pc.utf8_trim_whitespace(_str(t["address_without_numbers"]))
    toks = pc.split_pattern_regex(arr, pattern=r"\s+")
    t = t.drop_columns(["address_without_numbers"])
    return t.append_column("address_without_numbers_tokenised", toks)


# ---------------------------------------------------------------------------
# C15 — generalised token aliases
# ---------------------------------------------------------------------------

_TOKEN_ALIASES = {
    "FIRST": ["UPPERFLOOR", "LEVEL"],
    "SECOND": ["UPPERFLOOR", "LEVEL"],
    "THIRD": ["UPPERFLOOR", "LEVEL"],
    "TOP": ["UPPERFLOOR", "LEVEL"],
    "GARDEN": ["GROUNDFLOOR", "LEVEL"],
    "GROUND": ["GROUNDFLOOR", "LEVEL"],
    "BASEMENT": ["LEVEL"],
}


def generalised_token_aliases(
    t: pa.Table, *, source_col: str = "distinguishing_adj_start_tokens"
) -> pa.Table:
    """token_parsing.py:283-332 — flatten(alias-list per token)."""
    lists = t[source_col].to_pylist()
    out = []
    for lst in lists:
        if lst is None:
            out.append(None)
            continue
        flat: list[str] = []
        for tok in lst:
            flat.extend(_TOKEN_ALIASES.get(tok, [tok]))
        out.append(flat)
    return _set_column(
        t, "distinguishing_adj_token_aliases", pa.array(out, pa.list_(pa.string()))
    )


# ---------------------------------------------------------------------------
# sha256 (domain per-row invariant)
# ---------------------------------------------------------------------------


def add_sha256(t: pa.Table, *, col: str = "content", out: str = "content_sha256") -> pa.Table:
    """Hex sha256 of a string column — the end-to-end per-row invariant for
    the source-code domain (BASELINE.json input_hint)."""
    vals = t[col].to_pylist()
    hashes = [
        hashlib.sha256(v.encode("utf-8")).hexdigest() if v is not None else None
        for v in vals
    ]
    return _set_column(t, out, pa.array(hashes, pa.string()))
