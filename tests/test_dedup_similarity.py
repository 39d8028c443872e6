"""Dedup flavours + similarity search over small deterministic corpora."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    jaccard,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash64,
    simhash_dedup,
)
from moj_analytical_services_uk_address_matcher_ray.stages.similarity import (
    brute_force_topk,
    ivf_topk,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
    (3, "completely different text about database query engines and shuffles"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (5, "yet another unrelated document mentioning vectors and embeddings"),
]


def _docs_ds():
    return rd.from_items([{"doc_id": i, "text": t} for i, t in DOCS])


def test_exact_dedup(ray_session):
    out = exact_dedup(_docs_ds()).materialize()
    got = {r["id"]: r["dup_group_id"] for r in out.take_all()}
    assert got[1] == 1 and got[4] == 1
    assert got[2] == 2 and got[3] == 3 and got[5] == 5


def test_minhash_lsh_dedup(ray_session):
    out = minhash_lsh_dedup(_docs_ds(), jaccard_threshold=0.5).materialize()
    got = {r["id"]: r["dup_group_id"] for r in out.take_all()}
    assert got["1"] == got["2"] == got["4"]  # near-dups cluster
    assert got["3"] != got["1"] and got["5"] != got["1"]


def test_simhash(ray_session):
    a = simhash64(DOCS[0][1])
    b = simhash64(DOCS[1][1])
    c = simhash64(DOCS[2][1])
    assert bin(a ^ b).count("1") < bin(a ^ c).count("1")
    out = simhash_dedup(_docs_ds(), max_hamming=3).materialize()
    got = {r["id"]: r["dup_group_id"] for r in out.take_all()}
    assert got["1"] == got["4"]  # identical text, identical simhash
    assert got["3"] != got["1"]


def test_ngram_jaccard_pairs(ray_session):
    out = ngram_jaccard_pairs(_docs_ds(), threshold=0.5).materialize()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.take_all()}
    assert pairs[("1", "4")] == 1.0
    assert ("1", "2") in pairs
    assert all(k[0] != "3" and k[1] != "3" for k in pairs)


def test_jaccard_scalar():
    assert jaccard({"a", "b"}, {"a", "b"}) == 1.0
    assert jaccard({"a"}, {"b"}) == 0.0
    assert jaccard(set(), set()) == 1.0


def _emb_ds(n=40, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    base = rng.randn(n, dim).astype(np.float32)
    base[1] = base[0] + 0.001 * rng.randn(dim)  # near-dup pair (0, 1)
    return rd.from_items(
        [{"vec_id": i, "embedding": [float(x) for x in base[i]]} for i in range(n)]
    ), base


def test_embedding_neardup(ray_session):
    ds, _ = _emb_ds()
    out = embedding_neardup_pairs(ds, threshold=0.999).materialize()
    pairs = {(r["id_a"], r["id_b"]) for r in out.take_all()}
    assert ("0", "1") in pairs


def test_brute_force_topk_matches_numpy(ray_session):
    ds, base = _emb_ds()
    q = base[:2]
    out = brute_force_topk(ds, q, k=5)
    # verify against direct numpy
    norms = np.linalg.norm(base, axis=1, keepdims=True)
    Vn = base / norms
    Qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = Qn @ Vn.T
    for qi in range(2):
        expect = list(np.argsort(-sims[qi])[:5])
        got = [
            r["vec_id"]
            for r in out.to_pylist()
            if r["query_id"] == qi
        ]
        assert got == expect


def test_ivf_topk_recall(ray_session):
    ds, base = _emb_ds(n=120)
    q = base[:2]
    exact = brute_force_topk(ds, q, k=5)
    approx = ivf_topk(ds, q, k=5, n_centroids=8, n_probe=4)
    for qi in range(2):
        e = {r["vec_id"] for r in exact.to_pylist() if r["query_id"] == qi}
        a = {r["vec_id"] for r in approx.to_pylist() if r["query_id"] == qi}
        assert len(e & a) >= 3  # >=60% recall with 4/8 probes on random data


def test_ivf_indexed_partition_pruning(ray_session, tmp_path):
    """The persisted IVF index must (a) keep recall vs brute force and
    (b) READ ONLY the probed cell partitions — scan bytes scale with
    n_probe/n_centroids, not corpus size (the 'real index' property)."""
    from moj_analytical_services_uk_address_matcher_ray.stages.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    ds, base = _emb_ds(n=160)
    q = base[:2]
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(ds, index_dir, n_centroids=8)
    approx, io = ivf_topk_indexed(index_dir, q, k=5, n_probe=3)
    exact = brute_force_topk(ds, q, k=5)
    for qi in range(2):
        e = {r["vec_id"] for r in exact.to_pylist() if r["query_id"] == qi}
        a = {r["vec_id"] for r in approx.to_pylist() if r["query_id"] == qi}
        assert len(e & a) >= 3
    assert io["total_cells"] >= 6
    assert io["probed_cells"] <= 6  # <= 2 queries x 3 probes
    # the pruning claim: probed bytes are a strict fraction of the index
    assert 0 < io["probed_bytes"] < io["total_bytes"]
    assert io["probed_bytes"] / io["total_bytes"] <= (io["probed_cells"] + 1) / io["total_cells"] + 0.25


def test_ivf_first_k_quantizer_deterministic(ray_session, tmp_path):
    """The oracle-exact quantizer (centroids = n smallest vec_ids, fp64)
    must be deterministic across rebuilds and still prune partitions; the
    driver oracle (__ray_entry__.oracle_sql()['ivf_topk']) re-derives the
    same assignment/probe/rank arithmetic in DuckDB."""
    from moj_analytical_services_uk_address_matcher_ray.stages.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    ds, base = _emb_ds(n=160)
    q = base[:2]
    outs = []
    for d in ("a", "b"):
        index_dir = str(tmp_path / d)
        C = build_ivf_index(ds, index_dir, n_centroids=8, quantizer="first_k")
        assert C.dtype == np.float64
        out, io = ivf_topk_indexed(index_dir, q, k=5, n_probe=3, precise=True)
        assert 0 < io["probed_bytes"] < io["total_bytes"]
        outs.append(out.to_pylist())
    assert outs[0] == outs[1]  # bit-identical across rebuilds


def test_ivf_sq8_quantized_index(ray_session, tmp_path):
    """The sq8 index stores int8 codes (1 byte/dim vs 8 for the float64
    lists): per-cell bytes must shrink severalfold AND recall vs brute
    force must hold — the second byte-reduction lever on top of cell
    pruning at 100-TB scale."""
    from moj_analytical_services_uk_address_matcher_ray.stages.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    # big enough that data bytes dwarf per-file parquet footer overhead
    ds, base = _emb_ds(n=3000, dim=64)
    q = base[:2]
    full_dir, sq8_dir = str(tmp_path / "full"), str(tmp_path / "sq8")
    build_ivf_index(ds, full_dir, n_centroids=8, quantizer="first_k")
    build_ivf_index(
        ds, sq8_dir, n_centroids=8, quantizer="first_k", quantization="sq8"
    )
    exact = brute_force_topk(ds, q, k=5)
    approx, io_sq8 = ivf_topk_indexed(sq8_dir, q, k=5, n_probe=3)
    _, io_full = ivf_topk_indexed(full_dir, q, k=5, n_probe=3)
    for qi in range(2):
        e = {r["vec_id"] for r in exact.to_pylist() if r["query_id"] == qi}
        a = {r["vec_id"] for r in approx.to_pylist() if r["query_id"] == qi}
        assert len(e & a) >= 3  # recall holds through quantisation
    # same quantizer => same cell layout => byte ratio is pure code-width
    assert io_sq8["total_cells"] == io_full["total_cells"]
    assert io_sq8["total_bytes"] < 0.5 * io_full["total_bytes"]
    assert 0 < io_sq8["probed_bytes"] < io_sq8["total_bytes"]


def test_group_centroids_partial_aggregate(ray_session):
    """Per-group centroid must equal the numpy mean regardless of how rows
    are split across blocks (the partial-aggregate combine is exercised by
    forcing many tiny blocks)."""
    from moj_analytical_services_uk_address_matcher_ray.stages.similarity import (
        group_centroids,
    )

    rng = np.random.default_rng(7)
    labels = ["a", "b", "a", "c", "b", "a", "c", "c", "c", "b"]
    vecs = rng.normal(size=(10, 4))
    ds = rd.from_arrow(
        pa.table(
            {
                "label": pa.array(labels),
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )
    ).repartition(5)
    out = group_centroids(ds, group_col="label", vec_col="embedding")
    df = out.to_pandas()
    assert sorted(df["group"].unique()) == ["a", "b", "c"]
    for g in "abc":
        want = vecs[[i for i, l_ in enumerate(labels) if l_ == g]].mean(axis=0)
        got = df[df["group"] == g].sort_values("dim")["centroid"].to_numpy()
        n = df[df["group"] == g]["n"].iloc[0]
        assert n == labels.count(g)
        np.testing.assert_allclose(got, want, rtol=1e-12)
    # dims are 1-based (generate_subscripts convention)
    assert df["dim"].min() == 1 and df["dim"].max() == 4


def test_group_centroids_empty(ray_session):
    from moj_analytical_services_uk_address_matcher_ray.stages.similarity import (
        group_centroids,
    )

    ds = rd.from_arrow(
        pa.table(
            {
                "label": pa.array([], pa.string()),
                "embedding": pa.array([], pa.list_(pa.float64())),
            }
        )
    )
    out = group_centroids(ds)
    assert out.num_rows == 0
    assert out.column_names == ["group", "dim", "centroid", "n"]


def test_semantic_dedup_drops_planted_duplicates(ray_session):
    """Planted near-identical vectors lose to their lower-id originals;
    well-separated vectors all survive; the drop rule is the non-transitive
    'exists a lower-id neighbour with cosine >= eps' (SemDeDup-style)."""
    from moj_analytical_services_uk_address_matcher_ray.stages.dedup import (
        semantic_dedup,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.similarity import (
        first_k_centroids,
    )

    rng = np.random.RandomState(5)
    base = rng.randn(40, 16).astype(np.float64)
    rows = [
        {"vec_id": i, "embedding": list(map(float, v))}
        for i, v in enumerate(base)
    ]
    # ids 1000+i duplicate vector i with a tiny perturbation (cos ~ 1)
    for i in range(10):
        rows.append(
            {
                "vec_id": 1000 + i,
                "embedding": list(map(float, base[i] + 1e-6)),
            }
        )
    ds = rd.from_items(rows).repartition(4)
    cents = first_k_centroids(ds, n_centroids=8)
    out = (
        semantic_dedup(ds, centroids=cents, eps=0.95, n_buckets=4)
        .to_pandas()
        .set_index("vec_id")
    )
    assert len(out) == 50
    # every planted copy dropped, every original kept
    for i in range(10):
        assert not out.loc[1000 + i, "keep"]
    assert out.loc[list(range(40)), "keep"].all()
    # copies land in the same cell as their original
    for i in range(10):
        assert out.loc[1000 + i, "cell"] == out.loc[i, "cell"]
