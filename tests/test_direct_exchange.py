"""direct_bucket_apply / direct_bucket_apply_sources / exact_dedup_edges —
the raw-task hash exchange must be output-set-identical to the sort-based
bucketed_group_apply for any order-insensitive bucket function."""
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.bucketing import (
    bucketed_group_apply,
    direct_bucket_apply,
    direct_bucket_apply_sources,
)
from moj_analytical_services_uk_address_matcher_ray.stages.exact import (
    exact_dedup_edges,
)


def _rows(ds):
    df = ds.to_pandas()
    return sorted(map(tuple, df[sorted(df.columns)].itertuples(index=False)))


def _make_group_sums():
    # defined as a factory so each test closes over a LOCAL function —
    # module-level defs in tests/ pickle by reference to a module Ray's
    # workers cannot import
    def group_sums(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("k", as_index=False)["v"].sum()
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)

    return group_sums


def test_direct_matches_sort_exchange(ray_session):
    items = [{"k": str(i % 13), "v": i} for i in range(997)]
    a = rd.from_items(items)
    got_sort = _rows(bucketed_group_apply(a, ["k"], _make_group_sums(), n_buckets=7))
    got_direct = _rows(direct_bucket_apply(a, ["k"], _make_group_sums(), n_buckets=7))
    assert got_sort == got_direct
    assert len(got_direct) == 13


def test_direct_handles_empty_filtered_blocks(ray_session):
    # Ray skips map UDFs on 0-row blocks, so empty filtered blocks arrive
    # at the split without the bucket column — the regression that
    # surfaced when filter-derived datasets first fed the exchange
    a = rd.from_items([{"k": str(i % 5), "v": i} for i in range(200)])
    filtered = a.materialize().map_batches(
        lambda t: t.filter(pc.greater(t["v"], 10_000)),  # everything drops
        batch_format="pyarrow",
    )
    some = rd.from_items([{"k": "z", "v": 1}, {"k": "z", "v": 2}])
    out = direct_bucket_apply(
        filtered.union(some), ["k"], _make_group_sums(), n_buckets=4
    )
    assert _rows(out) == [("z", 3)]


def test_direct_sources_with_in_task_derivation(ray_session):
    left = rd.from_items([{"id": f"l{i}", "grp": str(i % 3)} for i in range(30)])
    right = rd.from_items([{"id": f"r{i}", "grp": str(i % 3)} for i in range(20)])

    def tag(side):
        def pre(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "k": t["grp"],
                    "side": pa.array([side] * t.num_rows, pa.string()),
                }
            )

        return pre

    def count_sides(g: pa.Table) -> pa.Table:
        df = (
            g.to_pandas()
            .groupby(["k", "side"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)

    out = direct_bucket_apply_sources(
        [(left, tag("l")), (right, tag("r"))], ["k"], count_sides, n_buckets=4
    )
    # _rows sorts columns by name -> tuples are (k, n, side)
    got = dict(((k, s), n) for k, n, s in _rows(out))
    assert got[("0", "l")] == 10 and got[("0", "r")] == 7
    assert got[("2", "l")] == 10 and got[("2", "r")] == 6


def test_exact_dedup_edges_group_min_semantics(ray_session):
    rows = [
        {"content_sha256": "A", "ukam_address_id": "x3"},
        {"content_sha256": "A", "ukam_address_id": "x1"},
        {"content_sha256": "A", "ukam_address_id": "x2"},
        {"content_sha256": "B", "ukam_address_id": "y9"},  # singleton: no edge
        {"content_sha256": "B", "ukam_address_id": "y1"},
        {"content_sha256": None, "ukam_address_id": "n1"},  # null key: excluded
        {"content_sha256": None, "ukam_address_id": "n2"},
    ]
    edges = _rows(exact_dedup_edges(rd.from_items(rows), n_buckets=3))
    # _rows sorts columns by name -> tuples are (dst, src);
    # dst = group min id, src = the non-minimal member
    assert edges == [("x1", "x2"), ("x1", "x3"), ("y1", "y9")]


def test_direct_pandas_batch_format(ray_session):
    import pandas as pd

    a = rd.from_items([{"k": str(i % 4), "v": float(i)} for i in range(100)])

    def psum(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.groupby("k", as_index=False)["v"].sum()

    got = _rows(
        direct_bucket_apply(a, ["k"], psum, n_buckets=3, batch_format="pandas")
    )
    want = _rows(
        bucketed_group_apply(a, ["k"], psum, n_buckets=3, batch_format="pandas")
    )
    assert got == want and len(got) == 4
