"""Single-example drill-down — the reference's notebook inspector
(post_linkage/accuracy_from_labels.py:34-300 ``inspect_match_results_vs_labels``
and splink's ``compare_two_records`` / waterfall chart) re-expressed over Ray
Datasets.

The reference renders an interactive report inside a DuckDB/Jupyter session:
pick the N-th false positive (or a caller-chosen messy id), print the messy /
best-match / true-match addresses with scores, a top-10 candidate table with
the rescore token diagnostics, the cleaned-record columns side by side, and a
per-comparison waterfall of the Fellegi-Sunter weights for best and true
match.

Here each piece is a cheap FILTERED scan over the (possibly huge) prediction
Datasets — one messy id's rows are a handful of records, so every frame that
reaches the driver is tiny; nothing materialises the full pipeline output.
The waterfall is computed exactly by the production scoring kernel
(stages/scoring.py ``_ComparisonEvaluator``) on a one-row pair frame, so the
drill-down can never disagree with the distributed scorer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# the reference's CLEANED_COLS_TO_SELECT ordering (accuracy_from_labels.py:10-31)
_CLEAN_FIRST_COLS = [
    "original_address_concat",
    "flat_positional",
    "flat_letter",
    "numeric_token_1",
    "numeric_token_2",
    "numeric_token_3",
    "unusual_tokens_arr",
    "very_unusual_tokens_arr",
    "extremely_unusual_tokens_arr",
]

_CANDIDATE_COLS = [
    ("original_address_concat_r", "messy_address"),
    ("address_concat_l", "candidate_address"),
    ("final_score", "final_score"),
    ("splink_score", "splink_score"),
    ("adjustment_score", "adjustment_score"),
    ("overlapping_tokens_this_l_and_r", "matching_tokens"),
    ("tokens_elsewhere_in_block_but_not_this", "penalty_tokens"),
    ("missing_tokens", "missing_tokens"),
    ("overlapping_bigrams_this_l_and_r_filtered", "matching_bigrams"),
    ("bigrams_elsewhere_in_block_but_not_this_filtered", "penalty_bigrams"),
    ("unique_id_l", "canonical_id"),
]


def _filter_eq(ds, col: str, value) -> pd.DataFrame:
    """Distributed equality filter -> tiny driver frame (one id's rows)."""
    lit = pa.scalar(str(value))

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(pc.cast(t[col], pa.string()), lit))

    return ds.map_batches(f, batch_format="pyarrow").to_pandas()


# ---------------------------------------------------------------------------
# per-pair waterfall (splink compare_two_records / waterfall_chart analogue)
# ---------------------------------------------------------------------------


def _pair_frame(rec_l: dict, rec_r: dict, model) -> pd.DataFrame:
    """One-row pandas frame with the scorer's ``*_l`` / ``*_r`` suffix
    convention, covering every column any comparison level reads."""
    cols = model.columns()
    data = {}
    for c in sorted(cols):
        data[f"{c}_l"] = [rec_l.get(c)]
        data[f"{c}_r"] = [rec_r.get(c)]
    return pd.DataFrame(data)


def compare_two_records(
    rec_l: dict,
    rec_r: dict,
    model,
    tf_tables: dict | None = None,
) -> pd.DataFrame:
    """Score ONE (canonical, messy) record pair and return the per-comparison
    waterfall: which level matched, its Bayes factor (TF-adjusted, exactly as
    the distributed scorer computes it) and the running match weight.

    Rows: the prior, then one row per model comparison, then the total.
    """
    from .scoring import _ComparisonEvaluator

    df = _pair_frame(rec_l, rec_r, model)
    rows = []
    cum = model.prior_log2_odds
    rows.append(
        {
            "comparison": "prior (lambda)",
            "gamma": None,
            "level": f"P(match) = {model.prior:g}",
            "log2_bayes_factor": round(cum, 6),
            "bayes_factor": None,
            "cumulative_match_weight": round(cum, 6),
        }
    )
    for comp in model.comparisons:
        ev = _ComparisonEvaluator(comp, tf_tables or {})
        gamma_arr, log2_arr = ev.evaluate(df)
        gamma = int(gamma_arr[0])
        log2_bf = float(log2_arr[0])
        inv = {g: i for i, g in ev.gamma_of.items()}
        if gamma >= 0 and gamma in inv:
            label = comp.levels[inv[gamma]].label
        else:
            null_levels = [lv.label for lv in comp.levels if lv.is_null]
            label = null_levels[0] if null_levels else "NULL"
        cum += log2_bf
        rows.append(
            {
                "comparison": comp.name,
                "gamma": gamma,
                "level": label,
                "log2_bayes_factor": round(log2_bf, 6),
                "bayes_factor": round(2.0**log2_bf, 6),
                "cumulative_match_weight": round(cum, 6),
            }
        )
    rows.append(
        {
            "comparison": "TOTAL (match_weight)",
            "gamma": None,
            "level": f"P = {(2.0 ** cum) / (1 + 2.0 ** cum):.6f}",
            "log2_bayes_factor": round(cum, 6),
            "bayes_factor": None,
            "cumulative_match_weight": round(cum, 6),
        }
    )
    return pd.DataFrame(rows)


def waterfall_text(frame: pd.DataFrame, width: int = 40) -> str:
    """ASCII rendering of a ``compare_two_records`` frame (the reference
    displays an altair waterfall; this sandbox renders the same data as a
    signed bar per comparison)."""
    vals = frame["log2_bayes_factor"].to_numpy(dtype=np.float64)
    scale = max(1e-9, np.abs(vals[1:-1]).max() if len(vals) > 2 else 1.0)
    lines = []
    for _, r in frame.iterrows():
        v = float(r["log2_bayes_factor"])
        is_edge = r["comparison"].startswith(("prior", "TOTAL"))
        n = 0 if is_edge else int(round(abs(v) / scale * (width // 2)))
        bar = ("+" if v >= 0 else "-") * n
        lines.append(
            f"{r['comparison'][:28]:<28} {str(r['level'])[:30]:<30} "
            f"{v:>+9.3f}  {bar}"
        )
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# the drill-down report
# ---------------------------------------------------------------------------


@dataclass
class InspectionReport:
    unique_id_r: str
    report: str
    candidates: pd.DataFrame
    records: pd.DataFrame | None = None
    waterfall_best: pd.DataFrame | None = None
    waterfall_true: pd.DataFrame | None = None
    best_match_id: str | None = None
    correct_id: str | None = None
    extras: dict = field(default_factory=dict)

    def __str__(self) -> str:  # pragma: no cover - formatting only
        parts = [self.report, self.candidates.to_string(max_colwidth=60)]
        if self.records is not None:
            parts.append(self.records.to_string(max_colwidth=40))
        if self.waterfall_best is not None:
            parts.append("Waterfall: messy vs best match")
            parts.append(waterfall_text(self.waterfall_best))
        if self.waterfall_true is not None:
            parts.append("Waterfall: messy vs true match")
            parts.append(waterfall_text(self.waterfall_true))
        return "\n\n".join(parts)


def find_false_positive_ids(
    best_matches,
    labels,
    *,
    label_id: str = "unique_id",
    label_match: str = "correct_unique_id",
    limit: int = 100,
) -> list[str]:
    """Messy ids whose top prediction disagrees with the label, ordered by id
    (the reference's deterministic example selection,
    accuracy_from_labels.py:63-85).  Distributed join + filter; only the id
    list reaches the driver."""
    from .joins import inner_join

    lab = labels.map_batches(
        lambda t: pa.table(
            {
                "unique_id_r": pc.cast(t[label_id], pa.string()),
                "__correct": pc.cast(t[label_match], pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    pred = best_matches.map_batches(
        lambda t: pa.table(
            {
                "unique_id_r": pc.cast(t["unique_id_r"], pa.string()),
                "__pred": pc.cast(t["unique_id_l"], pa.string()),
                "__mw": t["match_weight"]
                if "match_weight" in t.column_names
                else pa.nulls(t.num_rows, pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = inner_join(pred, lab, on="unique_id_r")
    fps = joined.map_batches(
        lambda t: t.filter(
            pc.or_kleene(
                pc.is_null(t["__pred"]), pc.not_equal(t["__pred"], t["__correct"])
            )
        ),
        batch_format="pyarrow",
    )
    out = fps.select_columns(["unique_id_r"]).sort("unique_id_r").limit(limit)
    return [r["unique_id_r"] for r in out.take_all()]


def inspect_match_results_vs_labels(
    *,
    labels,
    predictions_improved,
    best_matches,
    canonical,
    messy_clean=None,
    canonical_clean=None,
    model=None,
    tf_tables: dict | None = None,
    unique_id_r: str | None = None,
    example_number: int = 1,
    top_k: int = 10,
    label_id: str = "unique_id",
    label_match: str = "correct_unique_id",
) -> InspectionReport | None:
    """The reference's ``inspect_match_results_vs_labels``
    (accuracy_from_labels.py:34-300) over Ray Datasets.

    Parameters mirror the reference's DuckDB relations:

    * ``labels``               — (unique_id, correct_unique_id)
    * ``predictions_improved`` — rescore output (stages/rescore.py), all
      candidate pairs with final/original weights + token diagnostics
    * ``best_matches``         — best_matches_with_distinguishability output
    * ``canonical``            — canonical universe (unique_id,
      original_address_concat, postcode)
    * ``messy_clean`` / ``canonical_clean`` — cleaned tables for the
      record-by-record column comparison and the waterfalls
    * ``model`` / ``tf_tables`` — enable the per-comparison waterfalls

    Returns ``None`` when no false positive matches ``example_number`` (the
    reference logs an error); otherwise an ``InspectionReport`` whose
    ``str()`` is the full text report.
    """
    target = unique_id_r
    if target is None:
        fps = find_false_positive_ids(
            best_matches, labels, label_id=label_id,
            label_match=label_match, limit=example_number,
        )
        if len(fps) < example_number:
            return None
        target = fps[example_number - 1]
    target = str(target)

    # --- the target's label + best-match row -------------------------------
    lab_rows = _filter_eq(labels, label_id, target)
    correct_id = (
        str(lab_rows[label_match].iloc[0]) if len(lab_rows) else None
    )
    best_rows = _filter_eq(best_matches, "unique_id_r", target)
    if len(best_rows) == 0:
        return None
    best_rows = best_rows.sort_values(
        "match_weight", ascending=False, kind="mergesort"
    )
    best = best_rows.iloc[0].to_dict()
    best_id = best.get("unique_id_l")
    best_id = None if best_id is None or pd.isna(best_id) else str(best_id)

    # --- every scored candidate for the target -----------------------------
    cand = _filter_eq(predictions_improved, "unique_id_r", target)
    cand = cand.sort_values("match_weight", ascending=False, kind="mergesort")

    # the true match's scored row (may be absent: below blocking/threshold)
    true_row = None
    if correct_id is not None and len(cand):
        hit = cand[cand["unique_id_l"].astype(str) == correct_id]
        if len(hit):
            true_row = hit.iloc[0].to_dict()

    # the true match's canonical address
    true_addr, true_pc = "NOT IN CANONICAL", ""
    if correct_id is not None:
        crow = _filter_eq(canonical, "unique_id", correct_id)
        if len(crow):
            true_addr = crow["original_address_concat"].iloc[0]
            true_pc = crow.get("postcode", pd.Series([""])).iloc[0]

    dist = best.get("distinguishability")
    report = (
        "=" * 75
        + f"\nunique_id_r:                  {target}\n"
        + f"{'Messy address:':<30}{best.get('address_concat_r', 'N/A')} "
        + f"{best.get('postcode_r', '') or ''}\n\n"
        + f"{'Best match (score: %.2f):' % best.get('match_weight', float('nan')):<30}"
        + f"{best.get('original_address_concat_l', 'N/A')} "
        + f"{best.get('postcode_l', '') or ''} (ID: {best_id})\n"
        + f"{'True match (score: %.2f):' % (true_row or {}).get('match_weight', float('-inf')):<30}"
        + f"{true_addr} {true_pc or ''} (ID: {correct_id})\n"
        + "Distinguishability:           "
        + (f"{dist:,.2f}" if dist is not None and not pd.isna(dist) else "N/A")
        + "\n"
        + "=" * 75
    )

    # --- candidate table (reference's top-10 with token diagnostics) -------
    view = pd.DataFrame()
    if len(cand):
        c = cand.head(top_k).copy()
        c["final_score"] = c["match_weight"].map(lambda v: f"{v:.2f}")
        if "match_weight_original" in c:
            c["splink_score"] = c["match_weight_original"].map(
                lambda v: f"{v:.2f}"
            )
        if "mw_adjustment" in c:
            c["adjustment_score"] = c["mw_adjustment"].map(lambda v: f"{v:.2f}")
        if "original_address_concat_l" in c:
            marks = [
                ("✅ " if correct_id and str(u) == correct_id else "") + str(a)
                for u, a in zip(c["unique_id_l"], c["original_address_concat_l"])
            ]
            c["address_concat_l"] = marks
        keep = [(src, dst) for src, dst in _CANDIDATE_COLS if src in c.columns]
        view = c[[src for src, _ in keep]].rename(columns=dict(keep))
        view = view.reset_index(drop=True)

    # --- cleaned-record comparison ------------------------------------------
    records = None
    rec_r_clean = rec_best_clean = rec_true_clean = None
    if messy_clean is not None and canonical_clean is not None:
        segs = []
        mrow = _filter_eq(messy_clean, "unique_id", target)
        if len(mrow):
            rec_r_clean = mrow.iloc[0].to_dict()
            segs.append(mrow.head(1).assign(record_type="Messy"))
        if best_id:
            brow = _filter_eq(canonical_clean, "unique_id", best_id)
            if len(brow):
                rec_best_clean = brow.iloc[0].to_dict()
                segs.append(brow.head(1).assign(record_type="Best Match"))
        if correct_id:
            trow = _filter_eq(canonical_clean, "unique_id", correct_id)
            if len(trow):
                rec_true_clean = trow.iloc[0].to_dict()
                segs.append(trow.head(1).assign(record_type="True Match"))
        if segs:
            records = pd.concat(segs, ignore_index=True)
            first = ["record_type"] + [
                c for c in _CLEAN_FIRST_COLS if c in records.columns
            ]
            rest = [c for c in records.columns if c not in first]
            records = records[first + rest]

    # --- waterfalls (exact production scoring kernel) ------------------------
    wf_best = wf_true = None
    if model is not None and rec_r_clean is not None:
        if rec_best_clean is not None:
            wf_best = compare_two_records(
                rec_best_clean, rec_r_clean, model, tf_tables
            )
        if rec_true_clean is not None and (
            correct_id is None or correct_id != best_id
        ):
            wf_true = compare_two_records(
                rec_true_clean, rec_r_clean, model, tf_tables
            )

    return InspectionReport(
        unique_id_r=target,
        report=report,
        candidates=view,
        records=records,
        waterfall_best=wf_best,
        waterfall_true=wf_true,
        best_match_id=best_id,
        correct_id=correct_id,
    )
