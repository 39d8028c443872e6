"""Blocking: rule parsing, key derivation, pair generation, caps, salting."""

import pyarrow as pa
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
    KEY_SEP,
    derive_block_keys,
    generate_candidate_pairs,
    parse_blocking_rule,
)
from moj_analytical_services_uk_address_matcher_ray.state.model import (
    default_blocking_rules,
)


def test_parse_all_reference_rules():
    rules = [parse_blocking_rule(r) for r in default_blocking_rules()]
    assert len(rules) == 18
    # rule 2 is asymmetric: l.numeric_token_1 = r.numeric_token_2
    r2 = rules[1]
    assert r2.l_exprs[0].col == "numeric_token_1"
    assert r2.r_exprs[0].col == "numeric_token_2"
    # last rule is plain postcode equality
    assert rules[-1].l_exprs[0].col == "postcode"


def test_derive_block_keys_null_and_list_semantics():
    rule = parse_blocking_rule(
        "list_extract(l.unusual_tokens_arr, 2) = list_extract(r.unusual_tokens_arr, 1)"
        " and split_part(l.postcode, ' ', 1) = split_part(r.postcode, ' ', 1)"
    )
    t = pa.table(
        {
            "unusual_tokens_arr": pa.array([["A", "B"], ["A"]], pa.list_(pa.string())),
            "postcode": pa.array(["W1G 9SU", "W1G 9SU"], pa.string()),
            "ukam_address_id": pa.array(["u1", "u2"], pa.string()),
        }
    )
    out = derive_block_keys(t, [rule], side="l", carry_cols=["ukam_address_id"])
    # row 2 has no 2nd unusual token -> NULL key -> dropped
    assert out.num_rows == 1
    assert out["block_key"].to_pylist() == [f"B{KEY_SEP}W1G"]


def test_pair_generation_and_dedup(ray_session):
    canon = rd.from_items(
        [
            {"ukam_address_id": "c1", "postcode": "P1", "x": 1},
            {"ukam_address_id": "c2", "postcode": "P1", "x": 2},
            {"ukam_address_id": "c3", "postcode": "P2", "x": 3},
        ]
    )
    messy = rd.from_items(
        [
            {"ukam_address_id": "m1", "postcode": "P1", "x": 4},
            {"ukam_address_id": "m2", "postcode": "P3", "x": 5},
        ]
    )
    # two redundant rules -> dedup must collapse to one row per pair
    pairs = generate_candidate_pairs(
        canon,
        messy,
        ["l.postcode = r.postcode", 'l."postcode" = r."postcode"'],
        carry_cols=["ukam_address_id", "postcode", "x"],
    ).materialize()
    rows = pairs.take_all()
    got = {(r["ukam_address_id_l"], r["ukam_address_id_r"]) for r in rows}
    assert got == {("c1", "m1"), ("c2", "m1")}
    assert all(r["rule_idx"] == 0 for r in rows)  # first rule wins
    assert all(r["postcode_l"] == r["postcode_r"] == "P1" for r in rows)


def test_pair_cap(ray_session):
    canon = rd.from_items(
        [{"ukam_address_id": f"c{i}", "k": "X"} for i in range(20)]
    )
    messy = rd.from_items(
        [{"ukam_address_id": f"m{i}", "k": "X"} for i in range(20)]
    )
    pairs = generate_candidate_pairs(
        canon, messy, ["l.k = r.k"], carry_cols=["ukam_address_id", "k"],
        max_pairs_per_block=16,
    ).materialize()
    # cap 16 -> 4x4 deterministic prefix
    assert pairs.count() == 16
    ls = {r["ukam_address_id_l"] for r in pairs.take_all()}
    assert ls == {"c0", "c1", "c10", "c11"}  # lexicographic smallest 4


def test_ordered_self_pairs(ray_session):
    ds = rd.from_items(
        [{"ukam_address_id": f"u{i}", "k": "X"} for i in range(4)]
    )
    pairs = generate_candidate_pairs(
        ds, ds, ["l.k = r.k"], carry_cols=["ukam_address_id", "k"],
        ordered_self_pairs=True,
    ).materialize()
    rows = {(r["ukam_address_id_l"], r["ukam_address_id_r"]) for r in pairs.take_all()}
    assert len(rows) == 6  # C(4,2)
    assert all(a < b for a, b in rows)


def test_salting_replicates_small_side(ray_session):
    canon = rd.from_items(
        [{"ukam_address_id": f"c{i}", "k": "HOT"} for i in range(30)]
    )
    messy = rd.from_items([{"ukam_address_id": "m0", "k": "HOT"}])
    pairs = generate_candidate_pairs(
        canon, messy, ["l.k = r.k"], carry_cols=["ukam_address_id", "k"],
        hot_key_threshold=10,  # 30 rows > 10 -> salted into ceil(30/5k)=2.. buckets
    ).materialize()
    # every canonical row still pairs with m0 exactly once after salting+dedup
    got = {(r["ukam_address_id_l"], r["ukam_address_id_r"]) for r in pairs.take_all()}
    assert got == {(f"c{i}", "m0") for i in range(30)}


def test_dedupe_output_false_same_pairs_up_to_multiplicity(ray_session):
    """dedupe_output=False must yield the same (l, r, weight) pair SET as the
    deduped path — only cross-rule multiplicity may differ (CC consumers
    dedup edges themselves)."""
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.datagen import (
        GenConfig,
        generate_corpus,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        CODE_BLOCKING_RULES,
        DEDUP_CARRY_COLS,
        prepare_code_dataset,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
        generate_and_score_pairs,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.model import code_model

    files, _labels = generate_corpus(GenConfig(seed=11, n_clusters=30))
    cleaned = prepare_code_dataset(rd.from_arrow(files)).materialize()
    model = code_model(blocking_rules=list(CODE_BLOCKING_RULES))

    def pair_set(dedupe_output: bool) -> tuple[set, int]:
        out = generate_and_score_pairs(
            cleaned,
            cleaned,
            model,
            carry_cols=DEDUP_CARRY_COLS,
            threshold_match_weight=10.0,
            emit_cols=["ukam_address_id_l", "ukam_address_id_r", "match_weight"],
            ordered_self_pairs=True,
            dedupe_output=dedupe_output,
        ).take_all()
        trips = [
            (r["ukam_address_id_l"], r["ukam_address_id_r"],
             round(r["match_weight"], 9))
            for r in out
        ]
        return set(trips), len(trips)

    deduped, n_dedup = pair_set(True)
    raw, n_raw = pair_set(False)
    assert raw == deduped  # same pairs, same weights
    assert n_dedup == len(deduped)  # deduped path has no multiplicity
    assert n_raw >= n_dedup


def test_partial_top1_running_best_pruning_is_exact(ray_session):
    """partial_top1_per_r (with its per-record running-best branch-and-bound
    pruning) must yield EXACTLY the same global top-1 per r record as full
    scoring + a driver-side top-1 — including the (max weight, min id_l)
    tie-break."""
    import pandas as pd
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.datagen import (
        GenConfig,
        generate_corpus,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        CODE_BLOCKING_RULES,
        DEDUP_CARRY_COLS,
        prepare_code_dataset,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
        generate_and_score_pairs,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.model import code_model

    files, _labels = generate_corpus(GenConfig(seed=23, n_clusters=40))
    cleaned = prepare_code_dataset(rd.from_arrow(files)).materialize()
    model = code_model(blocking_rules=list(CODE_BLOCKING_RULES))
    kwargs = dict(
        carry_cols=DEDUP_CARRY_COLS,
        threshold_match_weight=-50.0,
        emit_cols=["ukam_address_id_l", "ukam_address_id_r", "match_weight"],
        ordered_self_pairs=True,
        dedupe_output=False,
        n_buckets=6,
    )

    def top1(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(
                ["match_weight", "ukam_address_id_l"],
                ascending=[False, True],
                kind="mergesort",
            )
            .drop_duplicates("ukam_address_id_r", keep="first")
            .sort_values("ukam_address_id_r")
            .reset_index(drop=True)
        )

    full = top1(
        generate_and_score_pairs(cleaned, cleaned, model, **kwargs).to_pandas()
    )
    pruned = top1(
        generate_and_score_pairs(
            cleaned, cleaned, model, partial_top1_per_r=True, **kwargs
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(full, pruned)


def test_payload_auto_rule_prefers_broadcast_by_bytes(ray_session):
    """Above the ROW threshold, auto must still pick the broadcast route
    while the sides' byte volume fits the plasma slice (the 2M-row cliff:
    the shuffle route costs O(pairs x payload) — regression for the
    2.16M-file OutOfDisk).  The broadcast/fused route is identified by its
    fused.* metrics; the shuffle route never emits them."""
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.datagen import (
        GenConfig,
        generate_corpus,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        CODE_BLOCKING_RULES,
        DEDUP_CARRY_COLS,
        prepare_code_dataset,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
        generate_and_score_pairs,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.metrics import (
        read_metrics,
        reset_metrics,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.model import code_model

    files, _ = generate_corpus(GenConfig(seed=5, n_clusters=25))
    cleaned = prepare_code_dataset(rd.from_arrow(files)).materialize()
    model = code_model(blocking_rules=list(CODE_BLOCKING_RULES))
    reset_metrics()
    out = generate_and_score_pairs(
        cleaned,
        cleaned,
        model,
        carry_cols=DEDUP_CARRY_COLS,
        threshold_match_weight=10.0,
        emit_cols=["ukam_address_id_l", "ukam_address_id_r", "match_weight"],
        ordered_self_pairs=True,
        payload_mode="auto",
        broadcast_threshold=1,  # every corpus is "over" the row threshold
    ).materialize()
    assert out.count() > 0
    assert "fused.store_drain_sec" in read_metrics()  # broadcast route ran
