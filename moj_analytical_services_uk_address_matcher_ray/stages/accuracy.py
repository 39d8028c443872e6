"""Label-based evaluation (A10/A11 of SURVEY.md §2.3).

Re-derivations of benchmarking/analysis/accuracy.py:9-92 (grouping-sets
accuracy cross-tab -> per-level aggregates unioned; Ray has no GROUPING
SETS) and post_linkage/accuracy_from_labels.py:300-371 (top-1 prediction per
messy record inner-joined to labels -> Correct/Incorrect/Total counts), plus
the pairwise precision/recall/F1 metric the north rule gates on.
"""

from __future__ import annotations

import itertools
from collections import defaultdict

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .joins import inner_join, left_join


def jaro_similarity(a: str, b: str) -> float:
    """Classic Jaro similarity (public algorithm; DuckDB exposes the same as
    jaro_similarity).  Empty-vs-empty is 0.0 to match DuckDB's convention
    (the reference computes this metric in DuckDB; classic libraries say
    1.0 — parity wins, fuzz-pinned in tests/test_regex_fuzz.py)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    match_dist = max(la, lb) // 2 - 1
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - match_dist)
        hi = min(lb, i + match_dist + 1)
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ca:
                a_flags[i] = b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def jaro_winkler_similarity(a: str | None, b: str | None, p: float = 0.1) -> float:
    """Jaro-Winkler (prefix-boosted Jaro, standard scaling p=0.1, max prefix
    4, boost only above the standard 0.7 threshold — DuckDB's convention,
    fuzz-pinned against the builtin) — the similarity the reference's
    mismatch analysis ranks by (benchmarking/analysis/mismatches.py:69-74,
    DuckDB builtin)."""
    if a is None or b is None:
        return 0.0
    jaro = jaro_similarity(a, b)
    if jaro <= 0.7:  # Winkler boost threshold (DuckDB parity)
        return jaro
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca == cb:
            prefix += 1
        else:
            break
    return jaro + prefix * p * (1.0 - jaro)


def analyse_mismatches(
    matches: "ray.data.Dataset",
    canonical: "ray.data.Dataset",
    *,
    samples_per_reason: int = 10,
    top_worst: int = 10,
) -> dict[str, pd.DataFrame]:
    """Mismatch triage (benchmarking/analysis/mismatches.py:9-120): for
    matched rows whose prediction disagrees with the ground truth
    (unique_id != resolved_canonical_id), attach the predicted canonical
    address, score ground-truth vs prediction with Jaro-Winkler, and return
    (a) deterministic per-match-reason samples and (b) the worst mismatches.

    Distributed shape: filter + hash join + map_batches similarity, then two
    SMALL driver-side frames (samples_per_reason x reasons and top_worst
    rows) — the mismatch set itself never materialises on the driver."""
    bad = matches.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.is_valid(t["match_reason"]),
                pc.not_equal(t["unique_id"], t["resolved_canonical_id"]),
            )
        ),
        batch_format="pyarrow",
    )
    canon_side = canonical.map_batches(
        lambda t: pa.table(
            {
                "canonical_ukam_address_id": t["ukam_address_id"],
                "predicted_address": t["original_address_concat"],
            }
        ),
        batch_format="pyarrow",
    )
    joined = left_join(bad, canon_side, on="canonical_ukam_address_id")

    def score(t: pa.Table) -> pa.Table:
        gt = t["original_address_concat"].to_pylist()
        pred = t["predicted_address"].to_pylist()
        sims = [jaro_winkler_similarity(a, b) for a, b in zip(gt, pred)]
        out = pa.table(
            {
                "unique_id": t["unique_id"],
                "resolved_canonical_id": t["resolved_canonical_id"],
                "match_reason": t["match_reason"],
                "ground_truth_address": t["original_address_concat"],
                "predicted_address": t["predicted_address"],
                "similarity_score": pa.array(sims, pa.float64()),
            }
        )
        return out

    scored = score_ds = joined.map_batches(score, batch_format="pyarrow")
    worst = scored.sort("similarity_score").limit(top_worst).to_pandas()

    # deterministic per-reason sampling: first-k by hash of unique_id
    def sample_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import zlib

        g = g.assign(
            __h=[zlib.crc32(str(u).encode()) for u in g["unique_id"]]
        ).sort_values("__h", kind="mergesort")
        return g.head(samples_per_reason).drop(columns="__h")

    from .bucketing import bucketed_pandas_groupby

    samples = bucketed_pandas_groupby(
        score_ds, "match_reason", sample_bucket
    ).to_pandas()
    return {"random_samples": samples, "worst_mismatches": worst}


def evaluate_predictions_against_labels(
    predictions: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    *,
    pred_id: str = "unique_id_r",
    pred_match: str = "unique_id_l",
    label_id: str = "unique_id",
    label_match: str = "correct_unique_id",
    weight_col: str = "match_weight",
) -> pd.DataFrame:
    """A11: keep the top-1 prediction per messy id (by weight desc, match id
    asc), join labels, count Correct / Incorrect / Total."""

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            [weight_col, pred_match], ascending=[False, True], kind="mergesort"
        ).head(1)

    from .bucketing import bucketed_pandas_groupby

    top = bucketed_pandas_groupby(predictions, pred_id, top1)
    joined = inner_join(top, labels, on=pred_id, right_on=label_id)
    rows = joined.select_columns([pred_id, pred_match, label_match]).take_all()
    correct = sum(1 for r in rows if str(r[pred_match]) == str(r[label_match]))
    total = len(rows)
    return pd.DataFrame(
        {
            "status": ["Correct", "Incorrect", "Total"],
            "count": [correct, total - correct, total],
        }
    )


def calculate_accuracy_metrics(
    results: "ray.data.Dataset",
    *,
    dataset_col: str = "dataset_name",
    reason_col: str = "match_reason",
    correct_col: str = "is_correct",
) -> pd.DataFrame:
    """A10: GROUPING SETS over (dataset, match_reason) — SQL ``GROUP BY
    GROUPING SETS ((d, r), (d), (r), ())``, rolled-up columns NULL.

    ONE distributed pass: each batch collapses to its (dataset, reason)
    -> (sum, count) partials (an Arrow hash-groupby combiner), the tiny
    partial table lands on the driver, and every coarser grouping level
    is an exact pandas re-aggregation of the finest level — no second
    shuffle, no per-level job, no row-level driver data."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([dataset_col, reason_col, correct_col]).group_by(
            [dataset_col, reason_col]
        ).aggregate([(correct_col, "sum"), (correct_col, "count")])
        return pa.table(
            {
                dataset_col: g[dataset_col],
                reason_col: g[reason_col],
                "correct_count": g[f"{correct_col}_sum"].cast(pa.int64()),
                "total_count": g[f"{correct_col}_count"].cast(pa.int64()),
            }
        )

    fine = (
        results.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby([dataset_col, reason_col], as_index=False)[
            ["correct_count", "total_count"]
        ]
        .sum()
    )
    frames = []
    for keys in ([dataset_col, reason_col], [dataset_col], [reason_col], []):
        if keys:
            lvl = fine.groupby(keys, as_index=False)[
                ["correct_count", "total_count"]
            ].sum()
        else:
            lvl = pd.DataFrame(
                {
                    "correct_count": [fine["correct_count"].sum()],
                    "total_count": [fine["total_count"].sum()],
                }
            )
        for col in (dataset_col, reason_col):
            if col not in lvl.columns:
                lvl[col] = None
        lvl["accuracy_pct"] = (
            100.0 * lvl["correct_count"] / lvl["total_count"]
        )
        frames.append(
            lvl[[dataset_col, reason_col, "correct_count", "total_count", "accuracy_pct"]]
        )
    return pd.concat(frames, ignore_index=True)


# ---------------------------------------------------------------------------
# pairwise F1 (the north-rule gate)
# ---------------------------------------------------------------------------


def _pairs_from_assignment(assign: dict) -> set[tuple]:
    groups = defaultdict(list)
    for uid, cid in assign.items():
        groups[cid].append(uid)
    out = set()
    for members in groups.values():
        for a, b in itertools.combinations(sorted(members), 2):
            out.add((a, b))
    return out


def pairwise_f1(
    predicted: dict[str, str],
    truth: dict[str, str],
    *,
    restrict_to: set[tuple] | None = None,
) -> dict[str, float]:
    """Pairwise precision/recall/F1 of two cluster assignments.

    ``restrict_to``: optional pair set (e.g. pairs sharing a blocking key)
    to evaluate "at shared blocking keys" per the north rule.
    """
    pred_pairs = _pairs_from_assignment(predicted)
    true_pairs = _pairs_from_assignment(truth)
    if restrict_to is not None:
        pred_pairs &= restrict_to
        true_pairs &= restrict_to
    tp = len(pred_pairs & true_pairs)
    precision = tp / len(pred_pairs) if pred_pairs else 1.0
    recall = tp / len(true_pairs) if true_pairs else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp": tp,
        "pred_pairs": len(pred_pairs),
        "true_pairs": len(true_pairs),
    }
