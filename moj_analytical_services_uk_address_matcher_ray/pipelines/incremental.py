"""Incremental (delta) matching against persisted canonical state.

The reference's workflow cleans the full canonical table once and reuses it
across matching runs (examples/preclean_full_os.py; the precomputed-TF
clean variant ``clean_data_using_precomputed_rel_tok_freq``,
cleaning/pipelines.py).  This module lifts that pattern to engine level
for the 100-TB shape of the problem: a daily/hourly DELTA of messy records
must match against a huge canonical corpus WITHOUT re-running any
corpus-wide pass.

``prepare_matching_state`` runs the corpus-wide work exactly once:
  * pre-TF clean of the canonical table (fused map chain),
  * ONE partial-aggregate pass for the corpus statistics (token rel-freq
    dict, common-end-token set, unseen-token default),
  * post-TF clean, persisted as partitioned parquet with a manifest
    (resumable — a second call with the same ``state_dir`` is a no-op),
  * numeric-token TF tables for the scorer's TF adjustments,
  * a JSON sidecar with every statistic a future delta run needs.

``match_delta`` then costs O(delta) for cleaning (the precomputed-stats
clean is a single fused map chain — no shuffle, no corpus scan) plus one
columnar read of the cleaned canonical parquet for the blocking/scoring
pass (columns pruned to the carry set).

Scale note: the per-delta canonical read is the remaining corpus-
proportional term; persisting the packed scorer stores / blocking keys
alongside the parquet would amortise it further (ROADMAP round-4).
"""

from __future__ import annotations

import json
import os

import ray

from ..sources.io import write_parquet_with_manifest
from ..stages.term_frequency import get_numeric_term_frequencies
from .clean import apply_post_tf, apply_pre_tf, clean_dataset, corpus_tf_and_end_tokens

_STATS_FILE = "corpus_stats.json"
_CANON_DIR = "canonical_cleaned"


def prepare_matching_state(
    canonical: "ray.data.Dataset", state_dir: str
) -> dict:
    """One-off corpus-wide preparation; resumable via the parquet manifest
    and the stats sidecar.  Returns the manifest + stats summary."""
    stats_path = os.path.join(state_dir, _STATS_FILE)
    canon_dir = os.path.join(state_dir, _CANON_DIR)
    if os.path.exists(stats_path) and os.path.exists(
        os.path.join(canon_dir, "_MANIFEST.json")
    ):
        with open(stats_path) as fh:
            return json.load(fh)

    os.makedirs(state_dir, exist_ok=True)
    pre = apply_pre_tf(canonical).materialize()
    rel_tok_freq, end_tokens, tf_default = corpus_tf_and_end_tokens(pre)
    cleaned = apply_post_tf(
        pre, ray.put(rel_tok_freq), end_tokens, tf_default=tf_default
    ).materialize()
    manifest = write_parquet_with_manifest(cleaned, canon_dir)
    numeric_tf = get_numeric_term_frequencies(cleaned, cleaned=True)
    stats = {
        "rows": manifest["rows"],
        "rel_tok_freq": rel_tok_freq,
        "end_tokens": sorted(end_tokens),
        "tf_default": tf_default,
        "numeric_tf": numeric_tf,
    }
    with open(stats_path + ".tmp", "w") as fh:
        json.dump(stats, fh)
    os.replace(stats_path + ".tmp", stats_path)  # atomic: resume-safe
    return stats


def load_matching_state(state_dir: str) -> tuple["ray.data.Dataset", dict]:
    """(cleaned canonical Dataset, stats dict) from a prepared state dir."""
    import ray.data as rd

    stats_path = os.path.join(state_dir, _STATS_FILE)
    with open(stats_path) as fh:
        stats = json.load(fh)
    canon = rd.read_parquet(os.path.join(state_dir, _CANON_DIR))
    return canon, stats


def match_delta(
    messy_delta: "ray.data.Dataset",
    state_dir: str,
    *,
    model=None,
    predict_threshold: float = -50.0,
    improve_threshold: float = -20.0,
    deterministic_stages: tuple[str, ...] = ("exact", "trie"),
    include_unmatched: bool = True,
    distinguishability_threshold: float | None = None,
) -> "ray.data.Dataset":
    """Match a messy DELTA against the persisted canonical state.

    Runs the reference's full two-table flow (deterministic pass ->
    FS scoring -> distinguishing-token rescore -> best match merge) with
    every corpus-wide statistic read from the state instead of recomputed:
    cleaning the delta is a fused map chain over the delta only.
    """
    from ..stages.best_match import (
        best_matches_with_distinguishability,
        select_top_match_candidates,
    )
    from ..stages.blocking import generate_and_score_pairs
    from ..stages.exact import run_deterministic_match_pass
    from ..stages.rescore import (
        RESCORE_EMIT_COLS,
        improve_predictions_using_distinguishing_tokens,
    )
    from ..state.model import default_address_model
    from .code_linkage import PAIR_CARRY_COLS

    canon, stats = load_matching_state(state_dir)
    canon = canon.materialize()
    messy = clean_dataset(
        messy_delta,
        rel_tok_freq=stats["rel_tok_freq"],
        end_tokens=frozenset(stats["end_tokens"]),
        tf_default=stats["tf_default"],
    ).materialize()

    exact = run_deterministic_match_pass(
        messy, canon, stages=list(deterministic_stages)
    ).materialize()

    model = model or default_address_model()
    scored = generate_and_score_pairs(
        canon,
        messy,
        model,
        carry_cols=PAIR_CARRY_COLS,
        tf_tables=stats["numeric_tf"],
        threshold_match_weight=predict_threshold,
        emit_cols=RESCORE_EMIT_COLS,
    )
    improved = improve_predictions_using_distinguishing_tokens(
        scored, match_weight_threshold=improve_threshold
    )
    best = best_matches_with_distinguishability(improved, messy).materialize()
    return select_top_match_candidates(
        exact,
        best,
        canon,
        include_unmatched=include_unmatched,
        # reference example passes None (example_matching.py:259): one-
        # match-only rows have NULL distinguishability and must survive
        distinguishability_threshold=distinguishability_threshold,
    )
