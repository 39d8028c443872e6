"""Training-MIX construction over a documents table — the phase after
``training_data_prep.py``: given cleaned/deduped documents, build a
fixed-token-budget, weighted, curriculum-ordered, packed training stream.

  read -> mixture diagnostics (mode_per_group: dominant lang per source)
       -> length-weighted candidate sample (weighted_sample_topk,
          Efraimidis–Spirakis without replacement, weight = n_chars)
       -> per-source token-budget fill (select_to_token_budget)
       -> deterministic weighted curriculum order (curriculum_interleave,
          integer stride scheduling — any prefix holds sources in ~weight
          ratio)
       -> sequence packing plan (pack_sequences, seq_len tokens)
       -> resumable partitioned parquet with a lineage manifest

Every step is a zero- or single-shuffle Ray Data transform with a
deterministic (id, salt)-keyed rule, so the whole mix is reproducible
and each operator is independently SQL-oracle-able (see __ray_entry__).

Run:  PYTHONPATH=. python examples/training_mix.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys


def main(
    sf_dir: str = "/root/testdata/sf0.001",
    out_dir: str = "/tmp/uam_training_mix",
    verbose: bool = True,
) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from moj_analytical_services_uk_address_matcher_ray.stages.aggregates import (
        mode_per_group,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.joins import semi_join
    from moj_analytical_services_uk_address_matcher_ray.stages.packing import (
        curriculum_interleave,
        pack_sequences,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.sampling import (
        select_to_token_budget,
        weighted_sample_topk,
    )
    from moj_analytical_services_uk_address_matcher_ray.sources.io import (
        write_parquet_with_manifest,
    )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source", "lang", "n_chars"],
    ).materialize()  # consumed by diagnostics, sample, and two semi joins
    n_in = docs.count()

    # 1. mixture diagnostics: dominant language per source (exact
    #    distributed mode — distinct-pair combiners, one group exchange)
    lang_mix = (
        mode_per_group(docs, group_col="source", value_col="lang")
        .to_pandas()
        .set_index("source")["mode_value"]
        .to_dict()
    )

    # 2. length-weighted candidate pool: E-S sampling without replacement
    #    keeps longer documents proportionally more often, deterministically
    pool_ids = weighted_sample_topk(
        docs, id_col="doc_id", weight_col="n_chars", k=max(200, n_in // 2)
    ).drop_columns(["n_chars"])
    pool = semi_join(docs, pool_ids, "doc_id")

    # 3. per-source token budgets: fill each source to its budget in the
    #    stable md5 lottery order (greedy, boundary doc may overshoot)
    budget_per_source = 500
    selected = select_to_token_budget(
        pool, budget_per_source, id_col="doc_id", text_col="text",
        source_col="source",
    )
    chosen = semi_join(
        pool, selected.drop_columns(["source", "n_tokens", "tok_start"]),
        "doc_id",
    ).materialize()

    # 4. curriculum: sources interleaved 3:1:... by integer stride
    #    scheduling — deterministic, no shuffle beyond the narrow exchange
    sources = sorted(chosen.unique("source"))
    weights = {s: (3 if i == 0 else 1) for i, s in enumerate(sources)}
    order = curriculum_interleave(
        chosen, source_col="source", id_col="doc_id", weights=weights,
        shard_docs=64,
    )

    # 5. packing plan: fixed-length training sequences over the chosen docs
    packed = pack_sequences(chosen, id_col="doc_id", text_col="text",
                            seq_len=256)

    manifest_order = write_parquet_with_manifest(
        order, os.path.join(out_dir, "curriculum")
    )
    manifest_pack = write_parquet_with_manifest(
        packed, os.path.join(out_dir, "packing_plan")
    )

    n_seqs = (
        packed.map_batches(
            lambda t: t.select(["seq_last"]), batch_format="pyarrow"
        ).max("seq_last")
        + 1
    )
    out = {
        "input_docs": n_in,
        "dominant_lang_per_source": lang_mix,
        "pool_docs": pool.count(),
        "budgeted_docs": chosen.count(),
        "curriculum_rows": manifest_order["rows"],
        "packed_rows": manifest_pack["rows"],
        "n_sequences": int(n_seqs),
        "weights": weights,
    }
    if verbose:
        print(out)
    return out


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/uam_training_mix",
    )
