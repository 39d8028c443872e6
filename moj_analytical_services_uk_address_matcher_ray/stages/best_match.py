"""Best-match selection & result analysis (P2/P3/P4, A9 — SURVEY.md §2.6/2.3).

Re-derivations of post_linkage/analyse_results.py and
match_candidate_selection.py: window functions over per-messy-record groups
become ``groupby("unique_id_r").map_groups`` (one shuffle), the final
enrichment joins are hash joins, and summary aggregates collapse to tiny
driver-side tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .joins import left_join, broadcast_semi_filter

MATCH_REASON_EXACT = "exact: full match"
MATCH_REASON_TRIE = "trie: exact match with skips and fuzziness"
MATCH_REASON_SPLINK = "splink: probabilistic match"
MATCH_REASON_UNIQUE_TRIGRAM = "unique_trigram: unique trigram match"


# ---------------------------------------------------------------------------
# P2 — best matches with distinguishability
# ---------------------------------------------------------------------------


def _category_labeler(thresholds: list[float]):
    """analyse_results.py:96-143: labels '01: One match only',
    '02: Distinguishability > 10', …, '<next>.: NaN (last match in group)'
    (the reference's quirky '05.:' label strings are kept verbatim)."""
    thres = list(thresholds)
    if 0 not in thres:
        thres.append(0)
    thres_sorted = sorted(thres, reverse=True)
    next_label = f"{str(len(thres_sorted) + 2).zfill(2)}."

    def label(match_count: int, dist: float | None) -> str:
        if match_count == 1:
            return "01: One match only"
        if dist is None or (isinstance(dist, float) and np.isnan(dist)):
            return f"{next_label}: NaN (last match in group)"
        for index, d in enumerate(thres_sorted, start=2):
            if dist > d:
                return f"{str(index).zfill(2)}: Distinguishability > {d}"
        if dist == 0:
            return f"{next_label}: Distinguishability = 0"
        return "99: error, uncategorized"

    return label


def best_matches_with_distinguishability(
    pairs: "ray.data.Dataset",
    addresses_to_match: "ray.data.Dataset",
    *,
    distinguishability_thresholds: list[float] = [1, 5, 10],
    best_match_only: bool = True,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """P2 (analyse_results.py:48-161): per messy record take the margin over
    the runner-up, categorise it, and left-join back to ALL messy records
    ('99: No match' for unmatched)."""
    label = _category_labeler(distinguishability_thresholds)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["match_weight", "unique_id_l"], ascending=[False, True], kind="mergesort"
        )
        mw = g["match_weight"].to_numpy(dtype=np.float64)
        dist = np.concatenate([mw[:-1] - mw[1:], [np.nan]]) if len(mw) else mw
        n = len(g)
        g = g.assign(
            distinguishability=dist,
            match_count=n,
            distinguishability_category=[
                label(n, d if not np.isnan(d) else None) for d in dist
            ],
        )
        if best_match_only:
            g = g.head(1)
        return g

    from .bucketing import bucketed_pandas_groupby

    cat = bucketed_pandas_groupby(pairs, "unique_id_r", per_group)
    cat = cat.select_columns(
        [
            "unique_id_l",
            "ukam_address_id_r",
            "ukam_address_id_l",
            "original_address_concat_l",
            "postcode_l",
            "match_weight",
            "distinguishability",
            "distinguishability_category",
        ]
    )
    base = addresses_to_match.select_columns(
        ["unique_id", "ukam_address_id", "original_address_concat", "postcode"]
    ).rename_columns(
        {
            "unique_id": "unique_id_r",
            "original_address_concat": "address_concat_r",
            "postcode": "postcode_r",
        }
    )
    joined = left_join(
        base,
        cat,
        on="ukam_address_id",
        right_on="ukam_address_id_r",
        num_partitions=num_partitions,
    )
    return joined.map_batches(_fill_no_match, batch_format="pyarrow")


def _fill_no_match(t: pa.Table) -> pa.Table:
    cat = t["distinguishability_category"]
    filled = pc.coalesce(cat, pa.scalar("99: No match"))
    idx = t.column_names.index("distinguishability_category")
    t = t.set_column(idx, "distinguishability_category", filled)
    if "ukam_address_id" in t.column_names and "ukam_address_id_r" not in t.column_names:
        t = t.append_column("ukam_address_id_r", t["ukam_address_id"])
    return t


# ---------------------------------------------------------------------------
# P3 — summary aggregates
# ---------------------------------------------------------------------------


def best_matches_summary(best: "ray.data.Dataset") -> pd.DataFrame:
    """P3 (analyse_results.py:164-236) — tiny result, returned as pandas."""
    counts = (
        best.groupby("distinguishability_category").count().to_pandas()
    )
    counts = counts.rename(columns={"count()": "count"})
    total = counts["count"].sum()
    counts["percentage"] = [
        f"{100.0 * c / total:.2f}%" for c in counts["count"]
    ]
    return counts.sort_values("distinguishability_category").reset_index(drop=True)


def calculate_match_metrics(results: "ray.data.Dataset") -> pd.DataFrame:
    """A9 (analyse_results.py:7-45): counts by COALESCE(match_reason,
    'unmatched') plus percentage strings, ordered by count desc."""
    def _fill(t: pa.Table) -> pa.Table:
        col = t["match_reason"].combine_chunks()
        if pa.types.is_null(col.type):  # all-null block
            col = col.cast(pa.string())
        return t.set_column(
            t.column_names.index("match_reason"),
            "match_reason",
            pc.coalesce(col, pa.scalar("unmatched")),
        )

    filled = results.map_batches(_fill, batch_format="pyarrow")
    counts = filled.groupby("match_reason").count().to_pandas()
    counts = counts.rename(columns={"count()": "match_count"})
    total = counts["match_count"].sum()
    counts["match_percentage"] = [
        f"{100.0 * c / total:.2f}%" for c in counts["match_count"]
    ]
    return counts.sort_values(
        ["match_count", "match_reason"], ascending=[False, True]
    ).reset_index(drop=True)


# ---------------------------------------------------------------------------
# P4 — combine deterministic + probabilistic matches
# ---------------------------------------------------------------------------


def select_top_match_candidates(
    exact_matches: "ray.data.Dataset",
    splink_matches: "ray.data.Dataset",
    canonical: "ray.data.Dataset",
    *,
    match_weight_threshold: float = 10.0,
    distinguishability_threshold: float | None = 5.0,
    include_unmatched: bool = False,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """P4 (match_candidate_selection.py:16-205).

    ``exact_matches``: every messy row annotated with nullable
    (resolved_canonical_id, canonical_ukam_address_id, match_reason).
    ``splink_matches``: output of best_matches_with_distinguishability
    (best_match_only rows).  Deterministic matches take precedence; Splink
    fills the rest; optionally unmatched rows pass through.
    """

    def _filter_splink(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_valid(t["match_weight"]),
            pc.greater_equal(t["match_weight"], match_weight_threshold),
        )
        if distinguishability_threshold is not None:
            mask = pc.and_(
                mask,
                pc.and_(
                    pc.is_valid(t["distinguishability"]),
                    pc.greater_equal(
                        t["distinguishability"], distinguishability_threshold
                    ),
                ),
            )
        return t.filter(mask)

    filtered = splink_matches.map_batches(_filter_splink, batch_format="pyarrow")

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        # ORDER BY mw DESC, distinguishability DESC NULLS LAST, unique_id_l
        g = g.assign(
            _dsort=g["distinguishability"].astype("float64").fillna(-np.inf)
        ).sort_values(
            ["match_weight", "_dsort", "unique_id_l"],
            ascending=[False, False, True],
            kind="mergesort",
        )
        return g.head(1).drop(columns=["_dsort"])

    from .bucketing import bucketed_pandas_groupby as _bpg

    splink_top = _bpg(filtered, "unique_id_r", top1)
    splink_top = splink_top.map_batches(
        lambda t: pa.table(
            {
                "unique_id": t["unique_id_r"],
                "ukam_address_id": t["ukam_address_id_r"],
                "resolved_canonical_id": t["unique_id_l"],
                "canonical_ukam_address_id": t["ukam_address_id_l"],
                "original_address_concat": t["address_concat_r"],
                "postcode": t["postcode_r"],
                "match_weight": t["match_weight"],
                "distinguishability": t["distinguishability"],
                "distinguishability_category": t["distinguishability_category"],
                "match_reason": pa.array(
                    [MATCH_REASON_SPLINK] * t.num_rows, pa.string()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    exact_ids = exact_matches.map_batches(
        lambda t: t.filter(pc.is_valid(t["match_reason"])), batch_format="pyarrow"
    )
    exact_id_list = [
        v
        for b in exact_ids.select_columns(["ukam_address_id"]).iter_batches(
            batch_format="pyarrow"
        )
        for v in b["ukam_address_id"].to_pylist()
    ]
    # deterministic matches take precedence over Splink
    splink_top = broadcast_semi_filter(
        splink_top, exact_id_list, "ukam_address_id", keep=False
    )

    common = [
        "unique_id",
        "resolved_canonical_id",
        "ukam_address_id",
        "canonical_ukam_address_id",
        "original_address_concat",
        "postcode",
        "match_reason",
    ]

    def _exact_part(t: pa.Table) -> pa.Table:
        t = t.select([c for c in common if c in t.column_names])
        for c in common:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, pa.string()))
        t = t.select(common)
        for extra in ("match_weight", "distinguishability"):
            t = t.append_column(extra, pa.nulls(t.num_rows, pa.float64()))
        t = t.append_column(
            "distinguishability_category", pa.nulls(t.num_rows, pa.string())
        )
        return t

    if include_unmatched:
        matched_part = exact_matches.map_batches(
            lambda t: t.filter(pc.is_valid(t["match_reason"])), batch_format="pyarrow"
        )
        splink_matched_ids = [
            v
            for b in splink_top.select_columns(["ukam_address_id"]).iter_batches(
                batch_format="pyarrow"
            )
            for v in b["ukam_address_id"].to_pylist()
        ]
        unmatched_part = exact_matches.map_batches(
            lambda t: t.filter(pc.is_null(t["match_reason"])), batch_format="pyarrow"
        )
        unmatched_part = broadcast_semi_filter(
            unmatched_part, splink_matched_ids, "ukam_address_id", keep=False
        )
        exact_part = matched_part.union(unmatched_part).map_batches(
            _exact_part, batch_format="pyarrow"
        )
    else:
        exact_part = exact_matches.map_batches(
            lambda t: _exact_part(t.filter(pc.is_valid(t["match_reason"]))),
            batch_format="pyarrow",
        )

    combined = exact_part.union(splink_top)

    canon_proj = canonical.select_columns(
        ["ukam_address_id", "original_address_concat", "postcode"]
    ).rename_columns(
        {
            "ukam_address_id": "canonical_ukam_address_id",
            "original_address_concat": "original_address_concat_canonical",
            "postcode": "postcode_canonical",
        }
    )
    return left_join(
        combined,
        canon_proj,
        on="canonical_ukam_address_id",
        num_partitions=num_partitions,
    )
