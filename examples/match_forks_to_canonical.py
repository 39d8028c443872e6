"""Large two-table matching — the Ray-Data analogue of the reference's
EPC->OS run (examples/match_epc_to_os.py:31-137): a big MESSY table matched
against a big CANONICAL universe that is NOT the same dataset.

Code-domain casting of the same shape, over the deterministic datagen
corpus (no external data in this sandbox):

  * canonical universe = one representative file per cluster (the "index");
  * messy table        = every other cluster member (forks, near-dup edits,
    renamed copies) plus the corpus's singletons;
  * the canonical side's corpus term frequencies clean BOTH sides, the way
    the reference cleans EPC with the OS-derived TF table
    (match_epc_to_os.py:60-75);
  * deterministic exact pass (content sha256) peels off identical forks,
    then blocked Fellegi-Sunter scoring + best-match selection resolves the
    rest, EPC-style thresholds (predict -100, improve/top-n 5).

Run:  PYTHONPATH=. python examples/match_forks_to_canonical.py [--clusters 2000]
"""

from __future__ import annotations

import argparse
import time


def main(n_clusters: int = 2000, verbose: bool = True) -> dict:
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from moj_analytical_services_uk_address_matcher_ray.datagen import (
        GenConfig,
        generate_corpus,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.clean import (
        get_token_frequency_table,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        CODE_BLOCKING_RULES,
        DEDUP_CARRY_COLS,
        prepare_code_dataset,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.bucketing import (
        bucketed_pandas_groupby,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
        generate_and_score_pairs,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.exact import (
        annotate_exact_matches,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.term_frequency import (
        tf_table_to_dict,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.model import code_model

    t0 = time.perf_counter()
    files, labels = generate_corpus(
        GenConfig(seed=11, n_clusters=n_clusters, n_repos=max(40, n_clusters // 60))
    )

    # canonical = first member of each cluster; messy = the rest
    uid = labels["unique_id"].to_pylist()
    cid = labels["cluster_id"].to_pylist()
    canonical_of: dict[str, str] = {}
    for u, c in zip(uid, cid):
        canonical_of.setdefault(c, u)
    canon_ids = set(canonical_of.values())
    truth = {u: canonical_of[c] for u, c in zip(uid, cid)}

    uid_arr = pa.array([f"{r}::{p}@{c}" for r, p, c in zip(
        files["repo"].to_pylist(),
        files["path"].to_pylist(),
        files["commit"].to_pylist(),
    )])
    is_canon = pc.is_in(uid_arr, value_set=pa.array(list(canon_ids)))
    canon_tbl = files.filter(is_canon)
    messy_tbl = files.filter(pc.invert(is_canon))

    # clean the canonical universe with its own corpus TF, then reuse that
    # TF table for the messy side (reference match_epc_to_os.py:60-75)
    canon = prepare_code_dataset(rd.from_arrow(canon_tbl)).materialize()
    tf_dict = tf_table_to_dict(get_token_frequency_table(canon))
    messy = prepare_code_dataset(
        rd.from_arrow(messy_tbl), rel_tok_freq=tf_dict
    ).materialize()
    n_messy, n_canon = messy.count(), canon.count()
    t_clean = time.perf_counter() - t0

    # deterministic pass: exact content match against the canonical universe
    det = annotate_exact_matches(
        messy, canon, match_cols=("content_sha256",)
    ).materialize()
    exact_pairs = det.map_batches(
        lambda t: pa.table(
            {
                "messy_id": t["ukam_address_id"],
                "canon_id": t["canonical_ukam_address_id"],
            }
        ),
        batch_format="pyarrow",
    )
    t_exact = time.perf_counter() - t0 - t_clean

    # probabilistic pass: blocked FS scoring, EPC-style low predict threshold
    model = code_model(blocking_rules=list(CODE_BLOCKING_RULES))
    scored = generate_and_score_pairs(
        canon,
        messy,
        model,
        carry_cols=DEDUP_CARRY_COLS,
        threshold_match_weight=-100.0,
        emit_cols=["ukam_address_id_l", "ukam_address_id_r", "match_weight"],
        hot_key_threshold=50_000,
    )
    best = bucketed_pandas_groupby(
        scored,
        "ukam_address_id_r",
        lambda g: g.sort_values(
            ["match_weight", "ukam_address_id_l"],
            ascending=[False, True],
            kind="mergesort",
        ).head(1),
    ).materialize()
    t_score = time.perf_counter() - t0 - t_clean - t_exact

    # evaluate: messy rows whose predicted canonical is the true one
    id_map = {
        r["ukam_address_id"]: r["unique_id"]
        for r in canon.select_columns(["ukam_address_id", "unique_id"]).take_all()
    }
    messy_map = {
        r["ukam_address_id"]: r["unique_id"]
        for r in messy.select_columns(["ukam_address_id", "unique_id"]).take_all()
    }
    pred: dict[str, str] = {}
    for r in exact_pairs.take_all():
        pred[messy_map[r["messy_id"]]] = id_map[r["canon_id"]]
    for r in best.take_all():
        mu = messy_map[r["ukam_address_id_r"]]
        pred.setdefault(mu, id_map[r["ukam_address_id_l"]])
    n_right = sum(1 for mu, cu in pred.items() if truth.get(mu) == cu)
    wall = time.perf_counter() - t0
    out = {
        "n_messy": n_messy,
        "n_canonical": n_canon,
        "matched": len(pred),
        "correct": n_right,
        "recall": round(n_right / max(1, n_messy), 4),
        "sec_clean": round(t_clean, 1),
        "sec_exact": round(t_exact, 1),
        "sec_score": round(t_score, 1),
        "sec_total": round(wall, 1),
        "messy_rows_per_sec": round(n_messy / wall, 1),
    }
    if verbose:
        print(
            f"{n_messy} messy vs {n_canon} canonical: "
            f"{n_right}/{n_messy} correct ({out['recall']:.1%}) in {wall:.1f}s "
            f"(clean {t_clean:.1f}s, exact {t_exact:.1f}s, score {t_score:.1f}s)"
        )
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--clusters", type=int, default=2000)
    args = ap.parse_args()
    main(args.clusters)
