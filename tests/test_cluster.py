"""Connected components: distributed star rounds vs driver union-find."""

import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.cluster import (
    connected_components,
    connected_components_local,
)


def _edges(pairs):
    return rd.from_items([{"src": a, "dst": b} for a, b in pairs])


def test_chain_and_triangle(ray_session):
    pairs = [("b", "c"), ("a", "b"), ("d", "e"), ("e", "f"), ("f", "d")]
    out = connected_components(_edges(pairs)).materialize()
    got = {r["node"]: r["cluster_id"] for r in out.take_all()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "d"}


def test_chain_and_triangle_distributed(ray_session):
    # force the distributed star loop (driver_threshold=0)
    pairs = [("b", "c"), ("a", "b"), ("d", "e"), ("e", "f"), ("f", "d")]
    out = connected_components(_edges(pairs), driver_threshold=0).materialize()
    got = {r["node"]: r["cluster_id"] for r in out.take_all()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "d"}


def test_planted_mega_cluster_distributed(ray_session):
    """One 100k-node planted cluster through the DISTRIBUTED star path
    (driver_threshold=0): the min node's star is the worst-case degree;
    large-star/small-star rounds must converge and — the mega-star fix —
    NO bucket may ever co-locate the whole component: group mins are
    pre-combined aggregates and the merges are salted, so the observed max
    bucket stays a small fraction of the component size regardless of the
    center's degree (the property that holds at any scale)."""
    import pyarrow as pa
    import ray

    from moj_analytical_services_uk_address_matcher_ray.state.metrics import (
        read_metrics,
        reset_metrics,
    )

    n = 100_000
    # a 100k-node star (the min node's degree IS the cluster size) plus a
    # short chain tail so convergence still needs multiple rounds
    tail = 16
    src = [f"n{1:06d}"] * (n - tail - 1) + [
        f"n{i:06d}" for i in range(n - tail, n - 1)
    ]
    dst = [f"n{i:06d}" for i in range(2, n - tail + 1)] + [
        f"n{i + 1:06d}" for i in range(n - tail, n - 1)
    ]
    src.append(f"n{0:06d}")  # attach the true min via one edge
    dst.append(f"n{n - tail:06d}")
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    edges = rd.from_arrow_refs([ray.put(t)])
    reset_metrics()
    out = connected_components(
        edges, driver_threshold=0, max_rounds=60
    ).materialize()
    assert out.count() == n
    labels = {r["cluster_id"] for r in out.take_all()}
    assert labels == {"n000000"}
    # bounded fan-in: the star center's 100k-degree neighbourhood is never
    # co-located — its min is a pre-combined aggregate and the merge salt
    # width scales with degree, so the max (key, salt) sub-group stays
    # ~STAR_TARGET_GROUP_ROWS regardless of component size (Hash-to-Min put
    # the whole component in one group here)
    from moj_analytical_services_uk_address_matcher_ray.stages.cluster import (
        STAR_TARGET_GROUP_ROWS,
    )

    max_group = read_metrics().get("cc.max_star_group_rows", 0)
    assert 0 < max_group <= 4 * STAR_TARGET_GROUP_ROWS
    assert max_group < n / 3


def test_matches_local_union_find(ray_session):
    import random

    rng = random.Random(5)
    nodes = [f"n{i:03d}" for i in range(60)]
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(50)]
    pairs = [(a, b) for a, b in pairs if a != b]
    out = connected_components(
        _edges(pairs), nodes=rd.from_items([{"node": n} for n in nodes])
    ).materialize()
    got = {r["node"]: r["cluster_id"] for r in out.take_all()}
    expected = connected_components_local(pairs)
    for n in nodes:
        assert got[n] == expected.get(n, n)


def test_isolated_nodes_are_singletons(ray_session):
    out = connected_components(
        _edges([("a", "b")]),
        nodes=rd.from_items([{"node": n} for n in ["a", "b", "z"]]),
    ).materialize()
    got = {r["node"]: r["cluster_id"] for r in out.take_all()}
    assert got == {"a": "a", "b": "a", "z": "z"}


def test_long_path_converges(ray_session):
    # a path of 40 nodes stresses the round loop (diameter >> 1); force the
    # distributed star path
    pairs = [(f"p{i:02d}", f"p{i + 1:02d}") for i in range(39)]
    out = connected_components(_edges(pairs), driver_threshold=0).materialize()
    got = {r["node"]: r["cluster_id"] for r in out.take_all()}
    assert set(got.values()) == {"p00"}


def test_vectorised_cc_large_string_branch(ray_session, monkeypatch):
    """The driver solver must produce identical labels through the
    large_string concat branch (Arrow 2^31 offset ceiling path)."""
    import pyarrow as pa
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.stages import cluster as C

    t = pa.table(
        {
            "node": pa.array(["a", "b", "c", "c", "x"]),
            "nbr": pa.array(["b", "a", "c", "d", "x"]),
        }
    )
    normal = C._vectorised_cc(rd.from_arrow(t))
    monkeypatch.setattr(C, "_LARGE_STRING_BYTES", 1)  # force the branch
    large = C._vectorised_cc(rd.from_arrow(t))
    assert normal.to_pydict() == large.to_pydict()


def test_cc_byte_gate_prefers_driver_over_row_threshold(ray_session):
    """An adjacency over the ROW threshold but tiny in bytes must take the
    driver path (cc.driver_solve_sec recorded, no star metrics)."""
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.stages.cluster import (
        connected_components,
    )
    from moj_analytical_services_uk_address_matcher_ray.state.metrics import (
        read_metrics,
        reset_metrics,
    )

    edges = rd.from_items(
        [{"src": f"n{i}", "dst": f"n{i+1}"} for i in range(500)]
    )
    reset_metrics()
    out = connected_components(edges, driver_threshold=10).materialize()
    assert out.count() == 501
    assert {r["cluster_id"] for r in out.take_all()} == {"n0"}
    m = read_metrics()
    assert m.get("cc.driver_solve_sec", 0) > 0
    assert "cc.max_star_group_rows" not in m
