"""Second-pass semantics — the reference's test_bigrams scenarios ported
(/root/reference/tests/test_bigrams.py:156-247)."""

import json

import pandas as pd

from moj_analytical_services_uk_address_matcher_ray.stages.rescore import (
    make_rescore_group_fn,
)


def _group(messy: str, canonical: list[str], common_end_token: str | None = None):
    hist = (
        [{"tok": common_end_token, "rel_freq": 0.0004, "count": 1}]
        if common_end_token
        else []
    )
    rows = []
    for i, addr in enumerate(canonical, start=1):
        rows.append(
            {
                "match_weight": 0.0,
                "match_probability": 0.5,
                "unique_id_l": f"l{i}",
                "unique_id_r": "r1",
                "original_address_concat_l": addr,
                "original_address_concat_r": messy,
                "common_end_tokens_hist_r": hist,
                "postcode_l": "W1A",
                "postcode_r": "W1A",
                "ukam_address_id_l": i,
                "ukam_address_id_r": 1,
            }
        )
    return pd.DataFrame(rows)


def _run(messy, canonical, common_end_token=None):
    fn = make_rescore_group_fn(match_weight_threshold=-100, top_n_matches=5)
    out = fn(_group(messy, canonical, common_end_token))
    return {row["unique_id_l"]: row for _, row in out.iterrows()}


def test_scenario_one():
    out = _run("10 X Y Z", ["10 X Y Z", "9 X Y Z"], common_end_token="D")
    l1 = out["l1"]
    overlap = json.loads(l1["overlapping_tokens_this_l_and_r"])
    assert overlap["10"] == 1
    bigrams = json.loads(l1["overlapping_bigrams_this_l_and_r_filtered"])
    assert bigrams["10 X"] == 1
    l2 = out["l2"]
    elsewhere = json.loads(l2["tokens_elsewhere_in_block_but_not_this"])
    assert elsewhere["10"] == 1


def test_scenario_two():
    out = _run(
        "9 A B C D",
        ["9 A C D", "9 B C D", "8 B A C D Z"],
        common_end_token="D",
    )
    l1 = out["l1"]
    overlap = json.loads(l1["overlapping_tokens_this_l_and_r"])
    assert overlap["A"] == 2
    assert overlap["9"] == 2
    assert "D" not in overlap  # stripped as common end token
    bigrams = json.loads(l1["overlapping_bigrams_this_l_and_r_filtered"])
    assert bigrams["9 A"] == 1
    l2 = out["l2"]
    bigrams2 = json.loads(l2["overlapping_bigrams_this_l_and_r_filtered"])
    assert bigrams2["B C"] == 1
    l3 = out["l3"]
    bg_elsewhere = json.loads(l3["bigrams_elsewhere_in_block_but_not_this_filtered"])
    assert bg_elsewhere["9 A"] == 1


def test_scenario_three():
    out = _run(
        "1 HIGH STREET BOVINGDON",
        ["1 HIGH STREET BOVINGDON", "THE ANNEXE 1 HIGH STREET BOVINGDON"],
    )
    l1 = out["l1"]
    overlap = json.loads(l1["overlapping_tokens_this_l_and_r"])
    assert overlap["HIGH"] == 2
    assert overlap["STREET"] == 2
    l2 = out["l2"]
    assert json.loads(l2["missing_tokens"]) == ["THE", "ANNEXE"]


def test_top_n_and_tiebreak():
    # 7 candidates, top_n=5: ordered mw DESC then unique_id_l DESC
    rows = _group("10 X", [f"10 X{i}" for i in range(7)])
    rows["match_weight"] = [1, 1, 2, 2, 3, 3, 3]
    fn = make_rescore_group_fn(match_weight_threshold=-100, top_n_matches=5)
    out = fn(rows)
    kept = set(out["unique_id_l"])
    # mw 3: l5,l6,l7; mw 2: l3,l4 -> top 5 = l7,l6,l5,l4,l3 (id desc within ties)
    assert kept == {"l3", "l4", "l5", "l6", "l7"}


def test_mw_adjustment_formula():
    out = _run("10 X", ["10 X"])
    l1 = out["l1"]
    overlap = json.loads(l1["overlapping_tokens_this_l_and_r"])
    # tokens: 10, X, W1A all overlap with count 1 -> reward 3*3 = 9
    # bigrams (10,X),(X,W1A) overlap count 1 but filtered (unigrams cover) -> 0
    assert overlap == {"10": 1, "X": 1, "W1A": 1}
    assert l1["mw_adjustment"] == 9.0
    assert l1["match_weight"] == 9.0


def test_threshold_filters_group():
    fn = make_rescore_group_fn(match_weight_threshold=5.0)
    out = fn(_group("10 X", ["10 X"]))  # mw = 0 < 5
    assert len(out) == 0


def test_improve_store_gather_matches_wide_path(ray_session):
    """The narrow-pairs + broadcast-store-gather form of improve_predictions
    must produce EXACTLY the wide-pairs form's output (same corpus, same
    scored stream)."""
    import numpy as np
    import ray
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
        prepare_scoring_warmup,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.rescore import (
        RESCORE_EMIT_COLS,
        RESCORE_NARROW_EMIT_COLS,
        improve_predictions_using_distinguishing_tokens,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.model import code_model

    files, _ = generate_corpus(GenConfig(seed=9, n_clusters=80, n_repos=30))
    cleaned = prepare_code_dataset(rd.from_arrow(files)).materialize()
    model = code_model(blocking_rules=list(CODE_BLOCKING_RULES))

    def score(emit, warmup=None, dedupe=True):
        return generate_and_score_pairs(
            cleaned,
            cleaned,
            model,
            carry_cols=DEDUP_CARRY_COLS,
            threshold_match_weight=-20.0,
            emit_cols=emit,
            max_pairs_per_block=50_000,
            ordered_self_pairs=True,
            dedupe_output=dedupe,
            warmup=warmup,
        )

    wide = improve_predictions_using_distinguishing_tokens(
        score(RESCORE_EMIT_COLS), match_weight_threshold=-20.0
    ).to_pandas()
    warmup = prepare_scoring_warmup(
        cleaned,
        model,
        carry_cols=DEDUP_CARRY_COLS,
        threshold_match_weight=-20.0,
        emit_cols=RESCORE_NARROW_EMIT_COLS,
    )
    # production config: NO dedup barrier — the store-gather form's
    # partial top-N + in-bucket drop_duplicates must absorb the
    # byte-identical cross-rule duplicate rows exactly
    narrow = improve_predictions_using_distinguishing_tokens(
        score(RESCORE_NARROW_EMIT_COLS, warmup=warmup, dedupe=False),
        match_weight_threshold=-20.0,
        store_l_ref=warmup["store_l_ref"],
    ).to_pandas()

    assert len(wide) == len(narrow) and len(wide) > 0
    key = ["ukam_address_id_l", "ukam_address_id_r"]
    w = wide.sort_values(key).reset_index(drop=True)
    n = narrow.sort_values(key).reset_index(drop=True)
    assert sorted(w.columns) == sorted(n.columns)
    for c in sorted(w.columns):
        if w[c].dtype.kind == "f":
            assert np.allclose(
                w[c].to_numpy(dtype=float),
                n[c].to_numpy(dtype=float),
                equal_nan=True,
                rtol=0,
                atol=0,
            ), c
        else:
            assert (w[c].astype(str) == n[c].astype(str)).all(), c


def test_dedup_code_corpus_use_rescore_end_to_end(ray_session):
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.datagen import (
        GenConfig,
        generate_corpus,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        dedup_code_corpus,
    )

    files, labels = generate_corpus(GenConfig(seed=13, n_clusters=60, n_repos=25))
    out = dedup_code_corpus(
        rd.from_arrow(files), use_rescore=True
    ).to_pandas()
    lab = labels.to_pandas()
    m = out.merge(lab, on="unique_id", suffixes=("_pred", "_true"))
    # pairwise F1 against planted clusters stays high through the rescore path
    from collections import Counter

    def pair_count(series):
        return sum(n * (n - 1) // 2 for n in Counter(series).values())

    tp = sum(
        n * (n - 1) // 2
        for n in Counter(
            zip(m["cluster_id_pred"], m["cluster_id_true"])
        ).values()
    )
    prec = tp / max(1, pair_count(m["cluster_id_pred"]))
    rec = tp / max(1, pair_count(m["cluster_id_true"]))
    f1 = 2 * prec * rec / max(1e-9, prec + rec)
    assert f1 > 0.95, (prec, rec, f1)


def test_multi_group_frame_equals_per_group_concat():
    """The group fn accepts a frame holding MANY messy-record groups and
    must produce exactly the concat of per-group invocations (the
    whole-bucket fast path relies on this)."""
    fn = make_rescore_group_fn(match_weight_threshold=-100, top_n_matches=3)
    frames = []
    for gi in range(1, 6):
        g = _group(
            f"{gi} HIGH STREET TOWN{gi}",
            [f"{gi} HIGH STREET TOWN{gi}", f"{gi+1} LOW ROAD TOWN{gi}"],
            common_end_token="TOWN1" if gi == 1 else None,
        )
        g["ukam_address_id_r"] = gi
        g["unique_id_r"] = f"r{gi}"
        frames.append(g)
    whole = pd.concat(frames, ignore_index=True)
    got = fn(whole).sort_values(
        ["ukam_address_id_r", "ukam_address_id_l"]
    ).reset_index(drop=True)
    want = (
        pd.concat([fn(f) for f in frames], ignore_index=True)
        .sort_values(["ukam_address_id_r", "ukam_address_id_l"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_no_bigrams_schema_and_adjustment():
    fn = make_rescore_group_fn(
        match_weight_threshold=-100, top_n_matches=5, use_bigrams=False
    )
    out = fn(_group("1 HIGH STREET", ["1 HIGH STREET", "2 LOW ROAD"]))
    assert "overlapping_bigrams_this_l_and_r" not in out.columns
    assert "mw_adjustment" in out.columns and len(out) == 2
    # the exact match: all 4 tokens overlap (each count 1 within its own
    # list; HIGH/STREET appear once in block, 1 appears once, W1A twice)
    exact = out[out["unique_id_l"] == "l1"].iloc[0]
    overlap = json.loads(exact["overlapping_tokens_this_l_and_r"])
    assert set(overlap) == {"1", "HIGH", "STREET", "W1A"}


def test_additional_columns_retained_and_null_padded():
    fn = make_rescore_group_fn(
        match_weight_threshold=-100,
        top_n_matches=5,
        additional_columns_to_retain=["source"],
    )
    g = _group("1 HIGH STREET", ["1 HIGH STREET"])
    g["source_l"] = ["corpusA"]
    # source_r deliberately absent -> must come back as None
    out = fn(g)
    assert out["source_l"].tolist() == ["corpusA"]
    assert out["source_r"].isna().all() or out["source_r"].tolist() == [None]
