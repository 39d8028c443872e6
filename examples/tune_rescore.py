"""Black-box tuning of the distinguishing-token rescore constants.

Re-derivation of the reference's parameter-optimisation harness
(reference scripts/improve_parameters_using_gradient_descent.py:105-120
exposes REWARD/PUNISHMENT multipliers to an SPSA loop; :819-841 is the
perturb/gradient/momentum update; :383-431 the normalised-reward
objective).  The Ray-first difference: the Fellegi–Sunter scoring pass
does NOT depend on the rescore constants, so it runs ONCE and is
materialized; each objective evaluation re-runs only the rescore stage
over the cached scored pairs — evaluations cost seconds, not the full
pipeline.

Objective (reference :383-431, to_score): per labelled messy record, on
min-max-normalised match weights,

  * true match missing from candidates            -> -0.2
  * best != true                                  ->  true - best   (< 0)
  * best == true                                  ->  min(best - second, 0.2)

score = 5 * sum / n_labels.  Maximised by SPSA with the reference's decay,
clipped steps, momentum and per-parameter bounds, or by a plain coordinate
sweep (``--mode coordinate``), which is also the cheap way to see the
local landscape around the shipped defaults.

Run:  PYTHONPATH=. python examples/tune_rescore.py --iters 20
"""
from __future__ import annotations

import argparse
import json

import numpy as np

# (initial, lower, upper, perturb) — reference param_config :508-575
PARAM_SPEC = {
    "reward_multiplier": (3.0, 0.0, 20.0, 0.5),
    "punishment_multiplier": (1.5, 0.0, 20.0, 0.5),
    "bigram_reward_multiplier": (3.0, 0.0, 20.0, 0.5),
    "bigram_punishment_multiplier": (1.5, 0.0, 20.0, 0.5),
    "missing_token_penalty": (0.1, 0.01, 10.0, 0.05),
}


def build_scored_pairs_edge_cases(yaml_path: str):
    """Pipeline prefix over the curated hard-case corpus (the reference's
    edge_case_addresses.yaml, blocked per test case) — unlike the easy
    synthetic corpus, these blocks are near-ties, so the objective actually
    moves when the multipliers move."""
    import ray.data as rd
    import yaml

    from moj_analytical_services_uk_address_matcher_ray.pipelines.clean import (
        apply_pre_tf,
        clean_dataset,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        PAIR_CARRY_COLS,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages import (
        term_frequency as TF,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
        generate_and_score_pairs,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.rescore import (
        RESCORE_EMIT_COLS,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.model import (
        default_address_model,
    )

    with open(yaml_path) as f:
        cases = yaml.safe_load(f)["addresses"]
    messy_rows, canon_rows = [], []
    for block, case in enumerate(cases, start=1):
        addr, pc = case["messy_address"]
        messy_rows.append(
            {
                "unique_id": f"m{block}",
                "address_concat": addr,
                "postcode": pc,
                "test_block": str(block),
            }
        )
        for i, (caddr, cpc) in enumerate(case["canonical_addresses"], start=1):
            canon_rows.append(
                {
                    "unique_id": f"c{block}_{i}",
                    "address_concat": caddr,
                    "postcode": cpc,
                    "test_block": str(block),
                }
            )
    truth = {r["unique_id"]: f"c{r['test_block']}_1" for r in messy_rows}
    messy = rd.from_items(messy_rows)
    canon = rd.from_items(canon_rows)
    tf = TF.tf_table_to_dict(
        TF.compute_token_rel_freq(apply_pre_tf(messy.union(canon)).materialize())
    )
    messy_c = clean_dataset(messy, rel_tok_freq=tf).materialize()
    canon_c = clean_dataset(canon, rel_tok_freq=tf).materialize()
    model = default_address_model(blocking_rules=["l.test_block = r.test_block"])
    scored = generate_and_score_pairs(
        canon_c,
        messy_c,
        model,
        carry_cols=PAIR_CARRY_COLS,
        threshold_match_weight=-100.0,
        emit_cols=RESCORE_EMIT_COLS,
    ).materialize()
    return scored, truth


def build_scored_pairs(n_canonical: int = 400, n_messy: int = 200):
    """One-time pipeline prefix: labelled corpus -> clean -> block+score.
    Returns (materialized scored pairs Dataset, truth dict)."""
    import ray.data as rd

    from examples._example_data import make_canonical, make_messy
    from moj_analytical_services_uk_address_matcher_ray.pipelines.clean import (
        clean_dataset,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        PAIR_CARRY_COLS,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
        generate_and_score_pairs,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.rescore import (
        RESCORE_EMIT_COLS,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.model import (
        default_address_model,
    )

    canon_tbl = make_canonical(n_canonical)
    messy_tbl = make_messy(canon_tbl, n_messy)
    truth = dict(
        zip(
            messy_tbl["unique_id"].to_pylist(),
            messy_tbl["true_canonical_id"].to_pylist(),
        )
    )
    canon = clean_dataset(rd.from_arrow(canon_tbl)).materialize()
    messy = clean_dataset(rd.from_arrow(messy_tbl)).materialize()
    model = default_address_model()
    scored = generate_and_score_pairs(
        canon,
        messy,
        model,
        carry_cols=PAIR_CARRY_COLS,
        threshold_match_weight=-50.0,
        emit_cols=RESCORE_EMIT_COLS,
    ).materialize()
    return scored, truth


def make_objective(scored, truth):
    """Returns f(params dict) -> score, re-running ONLY the rescore stage."""
    from moj_analytical_services_uk_address_matcher_ray.stages.rescore import (
        improve_predictions_using_distinguishing_tokens,
    )

    n_labels = len(truth)

    def objective(params: dict) -> float:
        improved = improve_predictions_using_distinguishing_tokens(
            scored, match_weight_threshold=-20.0, **params
        )
        df = (
            improved.select_columns(["unique_id_r", "unique_id_l", "match_weight"])
            .to_pandas()  # tuning corpus is small by construction
        )
        if not len(df):
            return -1.0
        w = df["match_weight"].to_numpy(dtype=np.float64)
        lo, hi = w.min(), w.max()
        df["norm_w"] = (w - lo) / (hi - lo) if hi > lo else 0.0
        total = 0.0
        for m, grp in df.groupby("unique_id_r", sort=False):
            t = truth.get(m)
            if t is None:
                continue
            grp = grp.sort_values(
                ["norm_w", "unique_id_l"], ascending=[False, False]
            )
            ws = grp["norm_w"].to_numpy()
            ids = grp["unique_id_l"].to_numpy()
            true_rows = np.flatnonzero(ids == t)
            if len(true_rows) == 0:
                total += -0.2
            elif ids[0] != t:
                total += float(ws[true_rows[0]] - ws[0])
            else:
                second = float(ws[1]) if len(ws) > 1 else 0.0
                total += min(float(ws[0]) - second, 0.2)
        # messy records with NO candidate rows at all = missing true match
        total += -0.2 * (n_labels - df["unique_id_r"].nunique())
        return 5.0 * total / n_labels

    return objective


def spsa(objective, *, iters: int, seed: int = 42, log=print):
    """Reference's SPSA update (:819-841): random +/- perturbation pair,
    finite-difference pseudo-gradient, alpha decay, clipped step, momentum,
    box bounds."""
    names = list(PARAM_SPEC)
    params = np.array([PARAM_SPEC[n][0] for n in names])
    lower = np.array([PARAM_SPEC[n][1] for n in names])
    upper = np.array([PARAM_SPEC[n][2] for n in names])
    perturb = np.array([PARAM_SPEC[n][3] for n in names])
    rng = np.random.RandomState(seed)
    alpha, alpha_decay, min_alpha, momentum = 2.0, 0.95, 0.1, 0.6
    velocity = np.zeros_like(params)
    best = (objective(dict(zip(names, params))), params.copy())
    log(json.dumps({"iter": -1, "score": best[0], **dict(zip(names, params))}))
    for it in range(iters):
        alpha = max(alpha * alpha_decay, min_alpha)
        delta = rng.choice([-1.0, 1.0], size=len(names)) * perturb
        p_plus = np.clip(params + delta, lower, upper)
        p_minus = np.clip(params - delta, lower, upper)
        r_plus = objective(dict(zip(names, p_plus)))
        r_minus = objective(dict(zip(names, p_minus)))
        gradient = -(r_plus - r_minus) / (2 * delta)
        step = np.clip(alpha * gradient, -perturb, perturb)
        velocity = momentum * velocity + step
        params = np.clip(params - velocity, lower, upper)
        score = objective(dict(zip(names, params)))
        if score > best[0]:
            best = (score, params.copy())
        log(
            json.dumps(
                {
                    "iter": it,
                    "score": round(score, 6),
                    "r_plus": round(r_plus, 6),
                    "r_minus": round(r_minus, 6),
                    **{n: round(v, 4) for n, v in zip(names, params)},
                }
            )
        )
    return best


def coordinate_sweep(objective, *, steps=(-2, -1, 1, 2), log=print):
    """One pass of per-parameter probes around the defaults (each parameter
    moved by multiples of its perturb scale, others fixed) — the cheap local
    landscape check."""
    names = list(PARAM_SPEC)
    base = {n: PARAM_SPEC[n][0] for n in names}
    base_score = objective(base)
    log(json.dumps({"probe": "default", "score": round(base_score, 6)}))
    results = {"default": base_score}
    for n in names:
        init, lo, hi, per = PARAM_SPEC[n]
        for s in steps:
            p = dict(base)
            p[n] = float(np.clip(init + s * per, lo, hi))
            if p[n] == init:
                continue
            sc = objective(p)
            results[f"{n}{s:+d}"] = sc
            log(json.dumps({"probe": n, "step": s, "value": p[n], "score": round(sc, 6)}))
    return base_score, results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--mode", choices=["spsa", "coordinate"], default="spsa")
    ap.add_argument("--n-canonical", type=int, default=400)
    ap.add_argument("--n-messy", type=int, default=200)
    ap.add_argument(
        "--corpus",
        choices=["edge", "synthetic"],
        default="edge",
        help="edge = the curated hard-case yaml (near-tie blocks, sensitive "
        "objective); synthetic = the easy generated corpus (sanity only: "
        "its margins saturate the +/-0.2 caps, so the landscape is flat)",
    )
    ap.add_argument(
        "--edge-yaml",
        default="/root/reference/tests/edge_case_addresses.yaml",
    )
    args = ap.parse_args()

    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level=logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import os

    if args.corpus == "edge":
        if not os.path.exists(args.edge_yaml):
            raise SystemExit(
                f"--corpus edge requires {args.edge_yaml} (not found); the "
                "synthetic corpus' landscape is flat (margins saturate the "
                "caps) — pass --corpus synthetic explicitly if you really "
                "want it"
            )
        scored, truth = build_scored_pairs_edge_cases(args.edge_yaml)
    else:
        scored, truth = build_scored_pairs(args.n_canonical, args.n_messy)
    objective = make_objective(scored, truth)

    if args.mode == "coordinate":
        base_score, results = coordinate_sweep(objective)
        best_name = max(results, key=results.get)
        print(
            json.dumps(
                {
                    "default_score": round(base_score, 6),
                    "best_probe": best_name,
                    "best_score": round(results[best_name], 6),
                }
            )
        )
    else:
        score, params = spsa(objective, iters=args.iters)
        print(
            json.dumps(
                {
                    "best_score": round(score, 6),
                    "best_params": {
                        n: round(v, 4) for n, v in zip(PARAM_SPEC, params)
                    },
                }
            )
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
