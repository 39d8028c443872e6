"""Deterministic matching stages (J1, J2, J3, J5 — SURVEY.md §2.4, §3.2).

Re-derivation of linking_model/exact_matching/*.py as Ray Data shuffles:

  * J1 ``restrict_canonical_to_fuzzy_keys`` — semi-join canonical against
    the distinct fuzzy blocking keys ('exact' or 'drop_last_char' postcode
    strategies, input_filters.py:34-96).
  * J2 ``annotate_exact_matches`` — equi-join on (original_address_concat,
    postcode).  The reference picks an *arbitrary* canonical on duplicates
    (LATERAL ... LIMIT 1 without ORDER BY, annotate_exact_matches.py:48-57);
    we pick the MIN canonical ukam id — deterministic under retries, matching
    the trigram stage's own convention (resolve_with_trigrams.py:79-80).
  * J3 ``resolve_with_trigrams`` — per-(block key, trigram hash) unique
    index; fuzzy rows whose hits all point at one canonical resolve
    (resolve_with_trigrams.py:22-175).
  * J5 ``run_deterministic_match_pass`` — driver loop: anti-join the
    already-matched ids before each stage (first stage wins), union stage
    outputs, left-join back to every fuzzy row (matching_stages.py:140-307).

In the source-code domain the exact stage keys on ``content_sha256`` —
content-hash dedup — via the ``match_cols`` parameter.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray

from .best_match import (
    MATCH_REASON_EXACT,
    MATCH_REASON_UNIQUE_TRIGRAM,
)
from .joins import anti_join, left_join, semi_join

MATCH_OUT_COLS = [
    "ukam_address_id",
    "canonical_ukam_address_id",
    "resolved_canonical_id",
    "match_reason",
]


# ---------------------------------------------------------------------------
# J1
# ---------------------------------------------------------------------------


def _drop_last_char(t: pa.Table, col: str, out: str) -> pa.Table:
    """v[:-1], NULL for 0/1-char or null values — vectorised."""
    import pyarrow.compute as pc

    arr = t[col]
    if pa.types.is_null(arr.type):  # all-null batch arrives as null type
        arr = arr.cast(pa.string())
    sliced = pc.utf8_replace_slice(arr, start=-1, stop=1 << 30, replacement="")
    keep = pc.greater(pc.utf8_length(arr), 1)
    return t.append_column(
        out, pc.if_else(keep, sliced, pa.scalar(None, pa.string()))
    )


def restrict_canonical_to_fuzzy_keys(
    canon: "ray.data.Dataset",
    fuzzy: "ray.data.Dataset",
    *,
    key_col: str = "postcode",
    strategy: str = "exact",  # "exact" | "drop_last_char"
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    if strategy not in ("exact", "drop_last_char"):
        raise ValueError(f"unknown postcode strategy {strategy!r}")
    if strategy == "exact":
        return semi_join(canon, fuzzy, key_col, num_partitions=num_partitions)
    ckey = canon.map_batches(
        _drop_last_char,
        batch_format="pyarrow",
        fn_kwargs={"col": key_col, "out": "__k"},
    )
    fkey = fuzzy.map_batches(
        _drop_last_char,
        batch_format="pyarrow",
        fn_kwargs={"col": key_col, "out": "__k"},
    )
    out = semi_join(ckey, fkey, "__k", num_partitions=num_partitions)
    # keep the group key for downstream per-group stages (trie)
    return out.map_batches(
        lambda t: t.rename_columns(
            [("postcode_group" if c == "__k" else c) for c in t.column_names]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# J2
# ---------------------------------------------------------------------------


def exact_dedup_edges(
    ds: "ray.data.Dataset",
    *,
    key_col: str = "content_sha256",
    id_col: str = "ukam_address_id",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Self-dedup exact edges: for every group of rows sharing ``key_col``,
    one edge per non-minimal row to the group's min ``id_col`` (the J2
    deterministic-pass output the flagship feeds into connected
    components).

    Specialised replacement for ``annotate_exact_matches(..., ds, ds,
    exclude_self=True)`` on the edges-only path: that general equi-join
    keys the SAME table twice (2x rows through the exchange), rides the
    sort-based groupby and runs per-bucket pandas merges; this is one
    direct hash exchange over a two-column projection with an all-Arrow
    group-min per bucket.  Output edge set is identical (src = member id,
    dst = group min id, self rows excluded, null keys excluded)."""
    import pyarrow.compute as pc

    from .bucketing import direct_bucket_apply

    proj = ds.map_batches(
        lambda t: pa.table(
            {"__key": t[key_col], "__id": t[id_col]}
        ).filter(pc.is_valid(t[key_col])),
        batch_format="pyarrow",
    )

    def bucket(g: pa.Table) -> pa.Table:
        import numpy as np

        if g.num_rows == 0:
            return pa.table(
                {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
            )
        st = g.take(
            pc.sort_indices(
                g, sort_keys=[("__key", "ascending"), ("__id", "ascending")]
            )
        )
        k = st["__key"].combine_chunks()
        first = np.ones(len(k), dtype=bool)
        if len(k) > 1:
            first[1:] = ~np.asarray(
                pc.equal(k.slice(1), k.slice(0, len(k) - 1))
            )
        gidx = np.cumsum(first) - 1
        ids = st["__id"].combine_chunks()
        mins = ids.take(pa.array(np.flatnonzero(first), pa.int64()))
        dst = mins.take(pa.array(gidx, pa.int64()))
        keep = pa.array(~first)  # group minima emit no self edge
        return pa.table({"src": ids, "dst": dst}).filter(keep)

    return direct_bucket_apply(proj, ["__key"], bucket, n_buckets=n_buckets)


def annotate_exact_matches(
    fuzzy: "ray.data.Dataset",
    canon: "ray.data.Dataset",
    *,
    match_cols: tuple[str, ...] = ("original_address_concat", "postcode"),
    match_reason: str = MATCH_REASON_EXACT,
    exclude_self: bool = False,
) -> "ray.data.Dataset":
    """Exact equi-join on ``match_cols``; duplicates on the canonical side
    collapse deterministically to the min canonical ukam id.

    ``exclude_self=True`` is the self-dedup mode (canon is the fuzzy table
    itself, keyed on ``content_sha256``): a row never matches itself, so
    singleton hashes stay unmatched and duplicate groups resolve to the
    group's min id."""

    def _key(t: pa.Table, side: str) -> pa.Table:
        parts = [t[c].to_pylist() for c in match_cols]
        keys = [
            "\x1f".join(p) if all(x is not None for x in p) else None
            for p in zip(*parts)
        ]
        uid_col = "unique_id" if side == "c" and "unique_id" in t.column_names else None
        uids = (
            [str(v) if v is not None else None for v in t[uid_col].to_pylist()]
            if uid_col
            else [None] * t.num_rows
        )
        out = pa.table(
            {
                "ukam_address_id": t["ukam_address_id"],
                "canonical_unique_id": pa.array(uids, pa.string()),
                "__key": pa.array(keys, pa.string()),
                "__side": pa.array([side] * t.num_rows, pa.string()),
            }
        )
        return out.filter(pa.compute.is_valid(out["__key"]))

    fz = fuzzy.map_batches(_key, batch_format="pyarrow", fn_kwargs={"side": "f"})
    cz = canon.map_batches(_key, batch_format="pyarrow", fn_kwargs={"side": "c"})

    def per_bucket(g: pa.Table) -> pa.Table:
        """Whole-bucket VECTORISED matching (one pandas merge + where — a
        per-group Python loop costs ~200us x groups and dominated the phase
        at 10^5+ keys).  Per key the two smallest canonical ids are enough:
        a fuzzy row takes the min canonical, or the second-min when the min
        is itself (exclude_self)."""
        empty = pa.table(
            {
                "ukam_address_id": pa.array([], pa.string()),
                "canonical_ukam_address_id": pa.array([], pa.string()),
                "resolved_canonical_id": pa.array([], pa.string()),
                "match_reason": pa.array([], pa.string()),
            }
        )
        if g.num_rows == 0:
            return empty
        df = g.to_pandas()
        cs = df[df["__side"] == "c"].sort_values(
            ["__key", "ukam_address_id"], kind="mergesort"
        )
        fs = df[df["__side"] == "f"]
        if len(cs) == 0 or len(fs) == 0:
            return empty
        top2 = cs.groupby("__key", sort=False).head(2).copy()
        rank = top2.groupby("__key", sort=False).cumcount()
        first = top2[rank == 0].set_index("__key")
        second = top2[rank == 1].set_index("__key")
        m = fs.merge(
            first[["ukam_address_id", "canonical_unique_id"]].rename(
                columns={
                    "ukam_address_id": "c1_id",
                    "canonical_unique_id": "c1_uid",
                }
            ),
            left_on="__key",
            right_index=True,
            how="inner",
        ).merge(
            second[["ukam_address_id", "canonical_unique_id"]].rename(
                columns={
                    "ukam_address_id": "c2_id",
                    "canonical_unique_id": "c2_uid",
                }
            ),
            left_on="__key",
            right_index=True,
            how="left",
        )
        if exclude_self:
            is_self = m["ukam_address_id"] == m["c1_id"]
            chosen_id = m["c1_id"].where(~is_self, m["c2_id"])
            chosen_uid = m["c1_uid"].where(~is_self, m["c2_uid"])
            keep = chosen_id.notna() & (chosen_id != m["ukam_address_id"])
            m = m[keep]
            chosen_id = chosen_id[keep]
            chosen_uid = chosen_uid[keep]
        else:
            chosen_id = m["c1_id"]
            chosen_uid = m["c1_uid"]
        if len(m) == 0:
            return empty
        return pa.table(
            {
                "ukam_address_id": pa.array(m["ukam_address_id"].tolist()),
                "canonical_ukam_address_id": pa.array(chosen_id.tolist()),
                "resolved_canonical_id": pa.array(
                    [None if pd.isna(v) else str(v) for v in chosen_uid],
                    pa.string(),
                ),
                "match_reason": pa.array([match_reason] * len(m), pa.string()),
            }
        )

    from .bucketing import bucketed_group_apply

    return bucketed_group_apply(fz.union(cz), "__key", per_bucket)


def build_exact_index(
    canon: "ray.data.Dataset",
    *,
    match_cols: tuple[str, ...] = ("original_address_concat", "postcode"),
) -> "ray.ObjectRef":
    """Build + broadcast the canonical key -> (min ukam id, unique_id)
    exact-match index (see ``annotate_exact_matches_broadcast``).  Split out
    so callers can build the index EARLY (it depends only on pre-TF
    columns) and fuse the annotate map into another clean chain."""
    import pyarrow.compute as pc

    from .joins import _key_strings

    has_uid = "unique_id" in canon.schema().names
    proj = ["ukam_address_id", *match_cols] + (["unique_id"] if has_uid else [])
    ctab = pa.concat_tables(
        ray.get(canon.select_columns(proj).to_arrow_refs()),
        promote_options="default",
    )
    keys = _key_strings(ctab, tuple(match_cols))
    tbl = pa.table(
        {
            "k": keys,
            "cid": ctab["ukam_address_id"],
            "uid": ctab["unique_id"] if has_uid else pa.nulls(
                ctab.num_rows, pa.string()
            ),
        }
    ).filter(pc.is_valid(keys))
    # all-Arrow group-first: one C sort on (key, id) then a shifted-compare
    # dedup mask — the pandas sort_values/drop_duplicates this replaces ran
    # ~1.3 s of driver time at a 274k-row canonical universe (object-dtype
    # round trip); this path is ~0.2 s and allocation-light.
    tbl = tbl.take(
        pc.sort_indices(
            tbl, sort_keys=[("k", "ascending"), ("cid", "ascending")]
        )
    )
    k = tbl["k"].combine_chunks()
    first = (
        pa.concat_arrays(
            [
                pa.array([True]),
                pc.not_equal(k.slice(1), k.slice(0, len(k) - 1)),
            ]
        )
        if len(k)
        else pa.array([], pa.bool_())
    )
    # plasma payload is Arrow — zero-copy per worker; the per-batch lookup
    # is pc.index_in (a C hash probe against the broadcast key array), so
    # no Python index structure is ever built on workers (a pd.Index build
    # per task measured 86s CPU at 176k messy rows)
    return ray.put(tbl.filter(first))


def annotate_with_exact_index(
    fuzzy: "ray.data.Dataset",
    idx_ref: "ray.ObjectRef",
    *,
    match_cols: tuple[str, ...] = ("original_address_concat", "postcode"),
    match_reason: str = MATCH_REASON_EXACT,
) -> "ray.data.Dataset":
    """Annotate every fuzzy row against a prebuilt ``build_exact_index``
    broadcast — the second half of ``annotate_exact_matches_broadcast``."""
    import pyarrow.compute as pc

    from .joins import _key_strings

    def annotate(t: pa.Table) -> pa.Table:
        itab = ray.get(idx_ref)  # zero-copy from the local object store
        keys = _key_strings(t, tuple(match_cols))
        pos = pc.index_in(keys, value_set=itab["k"].combine_chunks())
        cid = itab["cid"].take(pos)  # null pos -> null value
        uid = itab["uid"].take(pos)
        reason = pc.if_else(
            pc.is_valid(pos),
            pa.scalar(match_reason, pa.string()),
            pa.scalar(None, pa.string()),
        )
        t = t.append_column("canonical_ukam_address_id", cid)
        t = t.append_column("resolved_canonical_id", uid)
        t = t.append_column("match_reason", reason)
        return t

    return fuzzy.map_batches(annotate, batch_format="pyarrow")


def annotate_exact_matches_broadcast(
    fuzzy: "ray.data.Dataset",
    canon: "ray.data.Dataset",
    *,
    match_cols: tuple[str, ...] = ("original_address_concat", "postcode"),
    match_reason: str = MATCH_REASON_EXACT,
) -> "ray.data.Dataset":
    """Zero-shuffle J2 for a broadcastable canonical side: the canonical
    key -> (min ukam id, unique_id) index is built ONCE (driver-side pandas
    over the canonical key projection — the 10^12-row route stays
    ``annotate_exact_matches``'s co-partitioned shuffle) and ``ray.put``;
    every fuzzy batch annotates itself with a local hash-merge.

    Unlike ``annotate_exact_matches`` (which returns only matched rows),
    this returns EVERY fuzzy row + nullable (canonical_ukam_address_id,
    resolved_canonical_id, match_reason) — callers split matched/unmatched
    with two narrow filters and no further shuffle (the reference's
    get_linker drops resolved rows the same way, splink_model.py:49-54)."""
    idx_ref = build_exact_index(canon, match_cols=match_cols)
    return annotate_with_exact_index(
        fuzzy, idx_ref, match_cols=match_cols, match_reason=match_reason
    )


# ---------------------------------------------------------------------------
# J3 — unique trigram resolution
# ---------------------------------------------------------------------------


def _trigram_hash(tokens: tuple[str, ...]) -> str:
    return hashlib.blake2b(" ".join(tokens).encode(), digest_size=8).hexdigest()


def _explode_trigrams(
    t: pa.Table,
    *,
    tokens_col: str,
    block_col: str,
    id_cols: list[str],
    ngram_size: int,
) -> pa.Table:
    toks = t[tokens_col].to_pylist()
    blocks = t[block_col].to_pylist()
    ids = {c: t[c].to_pylist() for c in id_cols}
    out_ids: dict[str, list] = {c: [] for c in id_cols}
    out_block, out_hash = [], []
    for i, lst in enumerate(toks):
        if lst is None or len(lst) < ngram_size:
            continue
        seen = set()
        for j in range(len(lst) - ngram_size + 1):
            tri = tuple(lst[j : j + ngram_size])
            h = _trigram_hash(tri)
            if h in seen:
                continue  # DISTINCT per row
            seen.add(h)
            for c in id_cols:
                out_ids[c].append(ids[c][i])
            out_block.append(blocks[i])
            out_hash.append(h)
    data = {c: pa.array(out_ids[c]) for c in id_cols}
    data["block_key"] = pa.array(out_block, pa.string())
    data["trigram_hash"] = pa.array(out_hash, pa.string())
    return pa.table(data)


def resolve_with_trigrams(
    fuzzy: "ray.data.Dataset",
    canon: "ray.data.Dataset",
    *,
    tokens_col: str = "address_tokens",
    block_col: str = "postcode",
    ngram_size: int = 3,
    min_unique_hits: int = 1,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    canon_tris = canon.map_batches(
        lambda t, **kw: _explode_trigrams(
            t.rename_columns(
                [
                    {"unique_id": "canonical_unique_id", "ukam_address_id": "canonical_ukam_address_id"}.get(c, c)
                    for c in t.column_names
                ]
            ),
            **kw,
        ),
        batch_format="pyarrow",
        fn_kwargs={
            "tokens_col": tokens_col,
            "block_col": block_col,
            "id_cols": ["canonical_ukam_address_id", "canonical_unique_id"],
            "ngram_size": ngram_size,
        },
    )

    def unique_index(g: pd.DataFrame) -> pd.DataFrame:
        if g["canonical_ukam_address_id"].nunique() != 1:
            return g.head(0)
        return g.sort_values("canonical_ukam_address_id", kind="mergesort").head(1)

    from .bucketing import bucketed_pandas_groupby

    index = bucketed_pandas_groupby(
        canon_tris, ["block_key", "trigram_hash"], unique_index
    )

    fuzzy_tris = fuzzy.map_batches(
        _explode_trigrams,
        batch_format="pyarrow",
        fn_kwargs={
            "tokens_col": tokens_col,
            "block_col": block_col,
            "id_cols": ["ukam_address_id"],
            "ngram_size": ngram_size,
        },
    )
    from .joins import inner_join

    links = inner_join(
        fuzzy_tris, index, ("block_key", "trigram_hash"),
        num_partitions=num_partitions,
    )

    def consensus(g: pd.DataFrame) -> pd.DataFrame:
        if g["canonical_ukam_address_id"].nunique() != 1 or len(g) < min_unique_hits:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in MATCH_OUT_COLS + ["trigram_hit_count"]})
        return pd.DataFrame(
            {
                "ukam_address_id": [g["ukam_address_id"].iloc[0]],
                "canonical_ukam_address_id": [g["canonical_ukam_address_id"].min()],
                "resolved_canonical_id": [str(g["canonical_unique_id"].min())],
                "match_reason": [MATCH_REASON_UNIQUE_TRIGRAM],
                "trigram_hit_count": [len(g)],
            }
        )

    return bucketed_pandas_groupby(links, "ukam_address_id", consensus)


# ---------------------------------------------------------------------------
# J5 — the deterministic pass driver loop
# ---------------------------------------------------------------------------


def run_deterministic_match_pass(
    fuzzy: "ray.data.Dataset",
    canon: "ray.data.Dataset",
    *,
    stages: list[str] = ["exact"],
    match_cols: tuple[str, ...] = ("original_address_concat", "postcode"),
    restrict_key: str | None = "postcode",
    restrict_strategy: str = "exact",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """matching_stages.py:214-307: EXACT always first, then enabled stages;
    each stage only sees records no earlier stage matched; output = every
    fuzzy row + nullable (resolved_canonical_id, canonical_ukam_address_id,
    match_reason).

    Each stage restricts the canonical side with ITS OWN strategy: exact and
    unique_trigram use ``restrict_strategy`` (default 'exact'), but the trie
    stage always restricts and blocks via drop_last_char — the reference
    builds tries per postcode-minus-last-char group (input_filters.py:70-75,
    resolve_with_trie.py:28-35), so trie matches across a differing final
    postcode character are reachable."""
    from .trie import resolve_with_trie

    restricted: dict[str, "ray.data.Dataset"] = {}

    def canon_for(strategy: str) -> "ray.data.Dataset":
        if restrict_key is None:
            return canon
        if strategy not in restricted:
            restricted[strategy] = restrict_canonical_to_fuzzy_keys(
                canon, fuzzy, key_col=restrict_key, strategy=strategy,
                num_partitions=num_partitions,
            ).materialize()
        return restricted[strategy]

    stage_fns = {
        "exact": lambda fz: annotate_exact_matches(
            fz, canon_for(restrict_strategy), match_cols=match_cols
        ),
        "unique_trigram": lambda fz: resolve_with_trigrams(
            fz, canon_for(restrict_strategy), num_partitions=num_partitions
        ),
        "trie": lambda fz: resolve_with_trie(
            fz, canon_for("drop_last_char"), block_strategy="drop_last_char"
        ),
    }
    ordered = ["exact"] + [s for s in stages if s != "exact"]

    matches: "ray.data.Dataset | None" = None
    unmatched = fuzzy
    for stage_name in ordered:
        if matches is not None:
            unmatched = anti_join(
                unmatched, matches, "ukam_address_id", num_partitions=num_partitions
            ).materialize()
            if unmatched.count() == 0:
                break
        new = (
            stage_fns[stage_name](unmatched)
            .map_batches(lambda t: t.select(MATCH_OUT_COLS), batch_format="pyarrow")
            .materialize()
        )
        matches = new if matches is None else matches.union(new).materialize()

    proj = matches
    return left_join(
        fuzzy,
        proj,
        on="ukam_address_id",
        num_partitions=num_partitions,
        right_suffix="_match",
    )
