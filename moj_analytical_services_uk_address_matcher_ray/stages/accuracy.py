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

from .joins import inner_join


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
    """A10: GROUPING SETS over (dataset, match_reason) emulated by running
    each grouping level as its own aggregate and unioning (small outputs)."""
    frames = []
    for keys in ([dataset_col, reason_col], [dataset_col], [reason_col], []):
        if keys:
            agg = results.groupby(keys).sum(correct_col).to_pandas()
            cnt = results.groupby(keys).count().to_pandas()
            merged = agg.merge(cnt, on=keys)
        else:
            total = results.count()
            correct = sum(
                r[correct_col]
                for r in results.select_columns([correct_col]).take_all()
            )
            merged = pd.DataFrame(
                {f"sum({correct_col})": [correct], "count()": [total]}
            )
        for col in (dataset_col, reason_col):
            if col not in merged.columns:
                merged[col] = None
        merged = merged.rename(
            columns={f"sum({correct_col})": "correct_count", "count()": "total_count"}
        )
        merged["accuracy_pct"] = 100.0 * merged["correct_count"] / merged["total_count"]
        frames.append(merged[[dataset_col, reason_col, "correct_count", "total_count", "accuracy_pct"]])
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
