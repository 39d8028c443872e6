"""Benchmark harness.

Default mode: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and print ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "pairs_scored": ..., "pairs_per_sec": ...}

``--scaling``: run the flagship in FRESH processes at each level of
``UAM_SCALING_CPUS`` (default 2,8,32) on the same cached input and report
throughput at every level + the N->4N efficiencies (the in-sandbox
stand-in for the two-cluster-size criterion).  Levels run flagship-only
(UAM_BENCH_LINKAGE_ONLY) with an untimed worker warm-up wave.  Corpus
size: UAM_BENCH_SCALE (default 10 for scaling).  See BASELINE.md round 4
for the series + the hardware-envelope analysis.

The linkage corpus is generated deterministically (seeded datagen, sized by
the scale factor) and cached as parquet under /tmp so both scaling runs read
identical bytes; one untimed warm-read precedes timing so the page cache is
hot for both parallelism levels.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CACHE = "/tmp/uam_bench_cache"


def _sf_value(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def ensure_corpus(sf: float) -> str:
    """Deterministic linkage corpus sized by sf, cached as parquet.
    ``UAM_BENCH_SCALE`` multiplies the corpus (the --scaling mode uses it so
    the job is compute-bound, not fixed-overhead-bound, at both levels)."""
    scale = float(os.environ.get("UAM_BENCH_SCALE", "1"))
    n_clusters = max(200, int(60000 * sf * scale))
    # repo count scales with the corpus (a fixed repo count makes the
    # repo-token blocking groups grow linearly with corpus size and the
    # candidate pairs quadratically — unrealistic and superlinear)
    n_repos = max(200, n_clusters // 60)
    path = os.path.join(CACHE, f"corpus_seed42_n{n_clusters}_r{n_repos}")
    marker = os.path.join(path, "_DONE")
    fpath = os.path.join(path, "repo_files.parquet")
    if os.path.exists(marker) and os.path.isfile(fpath):
        # old single-file cache layout -> split into parts (a single parquet
        # file reads as ONE Ray task; the directory layout reads in parallel)
        import pyarrow.parquet as pq

        tbl = pq.read_table(fpath)
        os.remove(fpath)
        os.makedirs(fpath, exist_ok=True)
        parts = max(16, min(256, tbl.num_rows // 10_000))
        step = -(-tbl.num_rows // parts)
        for i in range(parts):
            chunk = tbl.slice(i * step, step)
            if chunk.num_rows:
                pq.write_table(chunk, os.path.join(fpath, f"part-{i:04d}.parquet"))
    if not os.path.exists(marker):
        from moj_analytical_services_uk_address_matcher_ray.datagen import (
            GenConfig,
            write_corpus,
        )

        os.makedirs(path, exist_ok=True)
        write_corpus(path, GenConfig(seed=42, n_clusters=n_clusters, n_repos=n_repos))
        with open(marker, "w") as f:
            f.write("ok")
    return os.path.join(path, "repo_files.parquet")


def run_bench() -> dict:
    import logging

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data as rd

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        dedup_code_corpus,
    )
    from moj_analytical_services_uk_address_matcher_ray.sources.io import (
        read_parquet as uam_read_parquet,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.metrics import (
        read_metrics,
        reset_metrics,
    )

    sf = _sf_value(SF_DIR)
    timings: dict[str, float] = {}

    # --- headline: flagship linkage over the deterministic corpus ----------
    corpus_path = ensure_corpus(sf)
    uam_read_parquet(corpus_path).count()  # untimed warm read (page cache)

    # untimed worker warm-up: pre-import the package in every worker
    # process so the first timed task wave measures pipeline throughput,
    # not Python import time.  One-off per fresh session; applied
    # identically at every --scaling parallelism level.
    @ray.remote(num_cpus=1)
    def _warm_worker() -> int:
        import moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage  # noqa: F401
        import moj_analytical_services_uk_address_matcher_ray.stages.blocking  # noqa: F401
        import moj_analytical_services_uk_address_matcher_ray.stages.scoring  # noqa: F401

        return 0

    ray.get(
        [
            _warm_worker.remote()
            for _ in range(int(ray.cluster_resources().get("CPU", 1)))
        ]
    )
    reset_metrics()
    t0 = time.perf_counter()
    clusters = dedup_code_corpus(
        uam_read_parquet(corpus_path),
        scorer_concurrency=max(2, NUM_CPUS // 4),
        # recall-maximal candidate density (UAM_MAX_PAIRS_PER_BLOCK): a
        # larger per-block cap keeps more same-key candidates (fewer
        # counted drops) at proportionally more scoring work — the
        # configuration a precision/recall-critical run uses
        max_pairs_per_block=int(
            os.environ.get("UAM_MAX_PAIRS_PER_BLOCK", "50000")
        ),
        # UAM_BENCH_RESCORE=1: include the distinguishing-token rescore
        # stage — the reference's full predict->improve pipeline shape
        use_rescore=os.environ.get("UAM_BENCH_RESCORE", "").lower()
        in ("1", "true", "yes"),
    ).materialize()
    n_rows = clusters.count()
    timings["linkage_dedup"] = time.perf_counter() - t0
    _m = read_metrics()
    pairs_scored = int(_m.get("scoring.pairs_scored", 0))
    phases = {
        k.split(".", 1)[1]: round(v, 2) for k, v in _m.items() if k.startswith("phase.")
    }
    phases["tail"] = round(timings["linkage_dedup"] - sum(phases.values()), 2)
    fused = {
        k.split(".", 1)[1]: round(v, 2) for k, v in _m.items() if k.startswith("fused.")
    }
    cc_split = {
        k.split(".", 1)[1]: round(v, 2)
        for k, v in _m.items()
        if k.startswith(("cc.", "relabel."))
    }

    # full predict->improve shape (distinguishing-token rescore ON) as its
    # own top-level leg — reported separately so the headline suite sum
    # stays comparable across rounds.  Skipped in --scaling/linkage-only
    # legs and when the main flagship already ran rescore-on.
    rescore_sec = None
    if not os.environ.get("UAM_BENCH_LINKAGE_ONLY") and not (
        os.environ.get("UAM_BENCH_RESCORE", "").lower() in ("1", "true", "yes")
    ):
        reset_metrics()
        t0 = time.perf_counter()
        dedup_code_corpus(
            uam_read_parquet(corpus_path),
            scorer_concurrency=max(2, NUM_CPUS // 4),
            max_pairs_per_block=int(
                os.environ.get("UAM_MAX_PAIRS_PER_BLOCK", "50000")
            ),
            use_rescore=True,
        ).materialize().count()
        rescore_sec = round(time.perf_counter() - t0, 3)

    # --- representative operator pipelines over the sf tables --------------
    queries = entrymod.queries()
    bench_queries = [
        "group_agg",
        "join_agg",
        "topn_per_group",
        "window_margin",
        "exact_dedup",
        "minhash_dedup",
        "ann_topk",
        "quality_score",
        "events_window",
    ]
    if os.environ.get("UAM_BENCH_LINKAGE_ONLY"):
        bench_queries = []
    for name in bench_queries:
        t0 = time.perf_counter()
        res = queries[name](SF_DIR)
        if hasattr(res, "materialize"):
            res.materialize().count()
        timings[name] = time.perf_counter() - t0

    # --- reference-shaped two-table match (readme.md:5-11) -----------------
    # ~176k messy x ~274k canonical, postcode-density blocking keys; the
    # reference's headline run.  Median of three runs — this VM's run-to-run
    # wall variance is ±10-30% (see BASELINE.md), so a single sample is
    # noise.  Only at the driver's sf0.1 level (fixed-size workload).
    two_table = None
    if sf >= 0.1 and not os.environ.get("UAM_BENCH_SKIP_TWO_TABLE"):
        # Each timing iteration runs in a FRESH process/Ray session: the
        # long-lived suite session above accumulates object-store fill and
        # spilled blocks that slow the same run() by 30-50% (measured:
        # 21s fresh vs 27-34s in-session on identical code+corpus), and a
        # production match job owns its cluster the same way.  The corpus
        # parquet is cached on disk by build_corpus, so only the first
        # subprocess pays generation.  The suite session must be DOWN
        # first — an idle parent cluster still pins its plasma store in
        # /dev/shm and doubles every child run (measured 21s -> 40-62s).
        import ray

        ray.shutdown()
        example = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "examples",
            "match_forks_to_canonical.py",
        )
        # median of 5 fresh runs: this VM's wall variance under external
        # load is ±30-130% (measured 21s quiet vs 49s loaded on identical
        # code+corpus); 3 samples let one loaded run drag the median.
        n_runs = int(os.environ.get("UAM_TT_RUNS", "5"))
        runs = []
        for _ in range(n_runs):
            proc = subprocess.run(
                [sys.executable, example, "--reference-shape", "--json"],
                env=dict(
                    os.environ,
                    PYTHONPATH=os.path.dirname(os.path.abspath(__file__)),
                    RAY_GRAFT_CPUS=str(NUM_CPUS),
                ),
                capture_output=True,
                text=True,
                check=True,
            )
            runs.append(json.loads(proc.stdout.strip().splitlines()[-1]))
        walls = sorted(r["sec_total"] for r in runs)
        med = next(r for r in runs if r["sec_total"] == walls[len(walls) // 2])
        timings["two_table_match"] = med["sec_total"]
        two_table = {
            "n_messy": med["n_messy"],
            "n_canonical": med["n_canonical"],
            "recall": med["recall"],
            "messy_rows_per_sec_median": med["messy_rows_per_sec"],
            "sec_runs": walls,
            "reference_rows_per_sec": 15008,
        }

    # headline value stays comparable across rounds: the fixed-size
    # two-table workload reports separately (two_table dict + its own
    # queries entry), not inside the suite sum
    total = sum(v for k, v in timings.items() if k != "two_table_match")
    out = {
        "metric": "headline pipelines wall clock (linkage dedup + operator suite)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "linkage_rows": n_rows,
        "linkage_phases": phases,
        "linkage_fused": fused,
        "linkage_cc": cc_split,
        "pairs_scored": pairs_scored,
        "linkage_rescore_sec": rescore_sec,
        "pairs_per_sec": round(pairs_scored / timings["linkage_dedup"], 1)
        if timings["linkage_dedup"]
        else None,
        "two_table": two_table,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same job at three parallelism levels (2, 8, 32 cpus) in fresh
    processes on the SAME cached input; reports the N->4N efficiency for
    both pairings.

    The in-sandbox stand-in for the two-cluster-size criterion: 2->8 cpus is
    the pairing where one box behaves like independent nodes (neither level
    saturates shared memory bandwidth); 8->32 additionally exposes the
    single-box DRAM ceiling — scorer throughput saturates past ~16 actors
    (see ``--actor-curve``), which a real N->4N NODE cluster, whose memory
    bandwidth scales with nodes, would not hit.  Both numbers plus the
    actor curve are recorded in BASELINE.md."""
    levels = tuple(
        int(x)
        for x in os.environ.get("UAM_SCALING_CPUS", "2,8,32").split(",")
        if x.strip()
    )
    results = {}
    for ncpu in levels:
        # SCALE=30 (~540k files): large enough that per-leg fixed costs
        # (exchange setup, actor-pool ramp, driver-serial constants — all
        # O(1) in corpus size) don't dominate the 2-cpu leg; every leg
        # reads the SAME cached corpus bytes, which is what the
        # two-cluster-size criterion requires.  Round-5 measured 2->8 =
        # 0.913/0.871/0.941 at this scale (BASELINE.md).
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            UAM_BENCH_SCALE=os.environ.get("UAM_BENCH_SCALE", "30"),
            # the scaling legs time the flagship only; the fixed-size
            # two-table workload would add ~3 long runs per leg
            UAM_BENCH_SKIP_TWO_TABLE="1",
            # flagship only: the operator-suite queries are fixed-size
            # side-dishes that add minutes per leg, and Dataset.join's
            # aggregator actors can stall a 1-cpu leg outright
            UAM_BENCH_LINKAGE_ONLY="1",
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        results[ncpu] = json.loads(proc.stdout.strip().splitlines()[-1])
    times = {n: results[n]["queries"]["linkage_dedup"] for n in levels}
    lo = min(levels)
    out: dict = {
        "metric": "scaling efficiency N->4N, linkage pipeline (same input, fresh sessions)",
        "levels": list(levels),
    }
    for n in levels:
        out[f"sec_{n}cpu"] = times[n]
        out[f"queries_{n}"] = results[n]["queries"]
        out[f"phases_{n}"] = results[n].get("linkage_phases")
        out[f"fused_{n}"] = results[n].get("linkage_fused")
        out[f"cc_{n}"] = results[n].get("linkage_cc")
        out[f"pairs_per_sec_{n}"] = results[n].get("pairs_per_sec")
        if n != lo and n % lo == 0:
            factor = n // lo
            out[f"speedup_{lo}_to_{n}"] = round(times[lo] / times[n], 3)
            out[f"scaling_efficiency_{lo}_to_{n}"] = round(
                (times[lo] / times[n]) / factor, 3
            )
    # headline: the N->4N pairing on the two lowest levels present
    four_n = lo * 4
    if four_n in times:
        out["scaling_efficiency"] = round((times[lo] / times[four_n]) / 4, 3)
    if 8 in times and 32 in times:
        out["speedup_8_to_32"] = round(times[8] / times[32], 3)
        out["scaling_efficiency_8_to_32"] = round((times[8] / times[32]) / 4, 3)
    out.update({
        "note": (
            "8->32 on ONE box saturates shared DRAM bandwidth (scorer "
            "throughput flat past ~16 actors, see --actor-curve); on a real "
            "N->4N node cluster memory bandwidth scales with nodes"
        ),
        "sf": results[levels[-1]]["sf"],
    })
    return out


def run_actor_curve() -> dict:
    """pairs/s per scorer actor at fixed pool sizes over CONSTANT work —
    the single-box memory-bandwidth probe (a flat per-actor curve means the
    scoring stage itself scales; a falling one is the shared-memory ceiling
    a real multi-node cluster would not have)."""
    import logging

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data as rd

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        CODE_BLOCKING_RULES,
        DEDUP_CARRY_COLS,
        prepare_code_dataset,
    )
    from moj_analytical_services_uk_address_matcher_ray.sources.io import (
        read_parquet as uam_read_parquet,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages import blocking as B
    from moj_analytical_services_uk_address_matcher_ray.state.model import code_model

    sf = _sf_value(SF_DIR)
    corpus_path = ensure_corpus(sf)
    cleaned = prepare_code_dataset(uam_read_parquet(corpus_path)).materialize()
    model = code_model(blocking_rules=list(CODE_BLOCKING_RULES))
    parsed = B.parse_blocking_rules(model.blocking_rules)
    pairs = B.generate_candidate_pairs(
        cleaned,
        cleaned,
        parsed,
        carry_cols=["ukam_address_id"],
        max_pairs_per_block=50_000,
        ordered_self_pairs=True,
        dedupe=False,
    ).materialize()
    n_pairs = pairs.count()
    store_ref = B._build_arrow_store(cleaned, DEDUP_CARRY_COLS)
    model_ref = ray.put(model)
    tf_ref = ray.put({})
    payload_cols = [c for c in DEDUP_CARRY_COLS if c != "ukam_address_id"]

    curve = {}
    for n_actors in (4, 8, 16, 32):
        if n_actors > NUM_CPUS:
            continue
        t0 = time.perf_counter()
        pairs.map_batches(
            B._BroadcastScorer,
            fn_constructor_args=(store_ref, store_ref, model_ref, tf_ref),
            fn_constructor_kwargs={
                "payload_cols": payload_cols,
                "id_col": "ukam_address_id",
                "threshold": 10.0,
                "emit_cols": [
                    "ukam_address_id_l",
                    "ukam_address_id_r",
                    "match_weight",
                ],
            },
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=(n_actors, n_actors),
            num_cpus=1,
        ).materialize().count()
        dt = time.perf_counter() - t0
        curve[n_actors] = {
            "sec": round(dt, 2),
            "pairs_per_sec": round(n_pairs / dt, 1),
            "pairs_per_sec_per_actor": round(n_pairs / dt / n_actors, 1),
        }
    ray.shutdown()
    return {
        "metric": "scorer throughput vs fixed actor-pool size (constant work)",
        "pairs": n_pairs,
        "num_cpus": NUM_CPUS,
        "curve": curve,
    }


if __name__ == "__main__":
    if "--virtual-nodes" in sys.argv:
        # cluster-relevant N->4N: independent 1-cpu Ray processes on
        # disjoint shards (tools/virtual_node_scaling.py), with the
        # same-occupancy hardware envelope reported alongside
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.virtual_node_scaling import main as vnode_main

        os.environ.setdefault("UAM_BENCH_SCALE", "30")
        print(json.dumps(vnode_main()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--actor-curve" in sys.argv:
        print(json.dumps(run_actor_curve()))
    else:
        print(json.dumps(run_bench()))
