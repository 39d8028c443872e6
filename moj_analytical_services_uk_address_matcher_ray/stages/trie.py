"""Suffix-trie resolution stage (operator J4 — SURVEY.md §2.4).

The reference delegates this to the external ``splink_udfs`` DuckDB
extension (`build_suffix_trie` / `find_address`, resolve_with_trie.py:11-56;
match reason "trie: exact match with skips and fuzziness").  The extension's
exact semantics are not part of the reference repo, so this is a
re-derivation of the documented behaviour: per blocking group, canonical
token lists are folded into a suffix trie (tokens consumed from the END of
the address), and each fuzzy record walks the trie from its own last token,
*skipping* fuzzy tokens absent from the current trie level; it resolves iff
the walk pins down exactly one canonical record.

Ray shape: both sides are co-grouped on the blocking key with ONE
``groupby(key).map_groups`` — the trie is per-group state inside the group
function, so no actor is needed (SURVEY §2.2 J4).
"""

from __future__ import annotations

import pandas as pd
import ray

from .best_match import MATCH_REASON_TRIE

_END = "\x00end"


def _build_suffix_trie(canon_rows: list[tuple[str, str, list[str]]]) -> dict:
    """trie node: {token: child, _END: set of (ukam, unique) that end here or
    pass through}."""
    root: dict = {_END: set()}
    for ukam, uid, tokens in canon_rows:
        node = root
        node[_END].add((ukam, uid))
        for tok in reversed(tokens or []):
            node = node.setdefault(tok, {_END: set()})
            node[_END].add((ukam, uid))
    return root


def _find_address(tokens: list[str], root: dict, *, min_depth: int = 2):
    """Walk from the end of ``tokens``; skip tokens missing at the current
    level; resolve when exactly one canonical remains at depth>=min_depth.

    "Fuzziness" (pinned by the reference golden rows,
    tests/test_exact_matching.py:113-147: fuzzy token 'st' must reach the
    canonical 'street' branch): when a token has no exact child, descend
    into the UNIQUE child related to it by token prefix (either direction);
    an ambiguous prefix stays a skip."""
    node = root
    depth = 0
    candidates = None
    for tok in reversed(tokens or []):
        child = node.get(tok)
        if child is None and tok:
            related = [
                c
                for t2, c in node.items()
                if t2 != _END and (t2.startswith(tok) or tok.startswith(t2))
            ]
            if len(related) == 1:
                child = related[0]
        if child is None:
            continue  # skip
        node = child
        depth += 1
        candidates = node[_END]
        if depth >= min_depth and len(candidates) == 1:
            return next(iter(candidates))
    if candidates is not None and len(candidates) == 1 and depth >= min_depth:
        return next(iter(candidates))
    return None


def resolve_with_trie(
    fuzzy: "ray.data.Dataset",
    canon: "ray.data.Dataset",
    *,
    tokens_col: str = "address_tokens",
    block_col: str = "postcode",
    block_strategy: str = "drop_last_char",  # "exact" | "drop_last_char"
    min_depth: int = 2,
) -> "ray.data.Dataset":
    """Per-group trie build + probe; emits the standard match projection.

    ``block_strategy="drop_last_char"`` is the reference behaviour: tries are
    grouped by the postcode with its final character dropped and fuzzy rows
    join on the same prefix (resolve_with_trie.py:28-35 ``LEFT(postcode,
    LENGTH(postcode)-1) = postcode_group``) — matching across a differing
    last postcode character is the stage's core purpose.  NULL or length<=1
    postcodes get a NULL group (input_filters.py:51-55) and never match."""

    def _project(t, side: str):
        import pyarrow as pa

        uid = (
            [str(v) if v is not None else None for v in t["unique_id"].to_pylist()]
            if side == "c" and "unique_id" in t.column_names
            else [None] * t.num_rows
        )
        if block_strategy == "drop_last_char":
            arr = t[block_col]
            if pa.types.is_null(arr.type):  # all-null batch -> null type
                arr = arr.cast(pa.string())
            block_vals = pa.compute.if_else(
                pa.compute.greater(pa.compute.utf8_length(arr), 1),
                pa.compute.utf8_replace_slice(
                    arr, start=-1, stop=1 << 30, replacement=""
                ),
                pa.scalar(None, pa.string()),
            )
        else:
            block_vals = t[block_col]
        out = pa.table(
            {
                "ukam_address_id": t["ukam_address_id"],
                "canonical_unique_id": pa.array(uid, pa.string()),
                "__tokens": t[tokens_col],
                "__block": block_vals,
                "__side": pa.array([side] * t.num_rows, pa.string()),
            }
        )
        return out.filter(pa.compute.is_valid(out["__block"]))

    fz = fuzzy.map_batches(_project, batch_format="pyarrow", fn_kwargs={"side": "f"})
    cz = canon.map_batches(_project, batch_format="pyarrow", fn_kwargs={"side": "c"})

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        cs = g[g["__side"] == "c"]
        fs = g[g["__side"] == "f"]
        out_cols = [
            "ukam_address_id",
            "canonical_ukam_address_id",
            "resolved_canonical_id",
            "match_reason",
        ]
        if len(cs) == 0 or len(fs) == 0:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        trie = _build_suffix_trie(
            [
                (aid, cid, [] if toks is None else list(toks))
                for aid, cid, toks in zip(
                    cs["ukam_address_id"].tolist(),
                    cs["canonical_unique_id"].tolist(),
                    cs["__tokens"].tolist(),
                )
            ]
        )
        out_ids, out_canon, out_resolved = [], [], []
        for aid, toks in zip(
            fs["ukam_address_id"].tolist(), fs["__tokens"].tolist()
        ):
            toks = [] if toks is None else list(toks)
            hit = _find_address(toks, trie, min_depth=min_depth)
            if hit is not None:
                out_ids.append(aid)
                out_canon.append(hit[0])
                out_resolved.append(hit[1])
        if not out_ids:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        return pd.DataFrame(
            {
                "ukam_address_id": out_ids,
                "canonical_ukam_address_id": out_canon,
                "resolved_canonical_id": out_resolved,
                "match_reason": MATCH_REASON_TRIE,
            }
        )

    from .bucketing import bucketed_pandas_groupby

    return bucketed_pandas_groupby(fz.union(cz), "__block", per_group)
