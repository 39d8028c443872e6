"""End-to-end training-data preparation over a documents table — the
composition the extension operators exist for:

  read -> redact (PII-style regex chain)
       -> quality gate (length / punctuation / token-count thresholds)
       -> repetition gate (Gopher-style duplicate-token/bigram fractions)
       -> benchmark decontamination (n-gram overlap vs a broadcast
          held-out set, dropped before training data is cut)
       -> exact dedup (sha256 hash-partition, keep first)
       -> per-source quota (cap_per_group, stable md5 lottery)
       -> deterministic train/val/test split (split_by_hash)
       -> token-window chunks for the train split (chunk_tokens)
       -> resumable partitioned parquet per split, with per-partition
          lineage manifests

Every stage is a zero- or single-shuffle Ray Data transform; nothing
materialises the corpus on the driver.

Run:  PYTHONPATH=. python examples/training_data_prep.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys


def main(
    sf_dir: str = "/root/testdata/sf0.001",
    out_dir: str = "/tmp/uam_training_prep",
    verbose: bool = True,
) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import logging

    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from moj_analytical_services_uk_address_matcher_ray.stages.dedup import exact_dedup
    from moj_analytical_services_uk_address_matcher_ray.stages.sampling import (
        cap_per_group,
        split_by_hash,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
        NgramDecontaminator,
        build_benchmark_ngrams,
        chunk_tokens,
        quality_score,
        redact,
        repetition_stats,
    )
    from moj_analytical_services_uk_address_matcher_ray.sources.io import (
        write_parquet_with_manifest,
    )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    n_in = docs.count()

    # 1. redact, then quality- and repetition-gate on the REDACTED text
    #    (one fused map chain — no shuffle)
    def prep(t):
        t = redact(t)
        t = t.drop_columns(["text"]).rename_columns(
            ["doc_id", "source", "text", "n_redacted"]
        )
        t = quality_score(t)
        t = repetition_stats(t)
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t["n_tokens"], 5),
                pc.less_equal(t["punct_ratio"], 0.2),
            ),
            pc.less_equal(t["dup_bigram_frac"], 0.5),
        )
        return t.filter(keep).select(["doc_id", "source", "text"])

    gated = docs.map_batches(prep, batch_format="pyarrow")

    # 1b. benchmark decontamination: the held-out eval set (stand-in: every
    #     50th doc) contributes a broadcast n-gram array built once; the
    #     corpus is scanned in ONE zero-shuffle actor-pool pass and
    #     benchmark-overlapping docs are dropped before any split is cut.
    #     The benchmark text goes through the SAME redaction as the scanned
    #     stream — n-grams must be compared in the same normalisation or a
    #     redacted overlap region would slip through.
    bench_ds = docs.map_batches(
        lambda t: redact(
            t.filter(
                pc.equal(
                    pc.subtract(
                        t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 50), 50)
                    ),
                    0,
                )
            )
        ).select(["redacted_text"]).rename_columns(["text"]),
        batch_format="pyarrow",
    )
    bench_ref = ray.put(build_benchmark_ngrams(bench_ds, n=5))
    gated = gated.map_batches(
        NgramDecontaminator,
        fn_constructor_args=(bench_ref,),
        fn_constructor_kwargs={"n": 5},
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).map_batches(
        lambda t: t.filter(pc.invert(t["contaminated"])).select(
            ["doc_id", "source", "text"]
        ),
        batch_format="pyarrow",
    )

    # 2. exact dedup on content hash (one bucketed shuffle, keep min doc_id);
    #    winners flow back through a distributed semi join — never through
    #    the driver
    gated = gated.materialize()  # consumed twice (dedup + semi join)
    winners = exact_dedup(gated, id_col="doc_id", text_col="text").map_batches(
        lambda t: t.filter(pc.equal(t["id"], t["dup_group_id"]))
        .select(["id"])
        .rename_columns(["doc_id"]),
        batch_format="pyarrow",
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.joins import semi_join

    unique_docs = semi_join(gated, winners, "doc_id")

    # 3. per-source quota -> 4. deterministic split
    balanced = cap_per_group(unique_docs, group_col="source", k=200)
    split = split_by_hash(
        balanced, id_col="doc_id",
        splits={"train": 0.75, "val": 0.125, "test": 0.125},
    ).materialize()

    counts = {}
    manifests = {}
    for name in ("train", "val", "test"):
        part = split.map_batches(
            lambda t, nm=name: t.filter(pc.equal(t["split"], nm)).drop_columns(
                ["split"]
            ),
            batch_format="pyarrow",
        )
        if name == "train":
            # 5. token-window chunks for the train split only
            part = part.map_batches(
                lambda t: chunk_tokens(t, chunk_size=64, overlap=16),
                batch_format="pyarrow",
            )
        d = os.path.join(out_dir, name)
        manifests[name] = write_parquet_with_manifest(part, d)
        counts[name] = manifests[name]["rows"]

    out = {
        "input_docs": n_in,
        "after_gate_dedup_quota": split.count(),
        "rows_per_split": counts,
        "train_is_chunks": True,
    }
    if verbose:
        print(out)
    return out


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/uam_training_prep",
    )
