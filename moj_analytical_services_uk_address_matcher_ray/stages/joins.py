"""Distributed join helpers (operators J1/J2/J5/K5 of SURVEY.md §2.4/§2.7).

Ray Data 2.49 ships a hash-partitioned ``Dataset.join`` — we wrap it with the
join flavours the reference leans on (inner / left equi-joins, and semi /
anti joins used by the deterministic match-pass loop,
matching_stages.py:173-182).  Semi/anti are expressed as a left join against
the deduplicated key set of the right side plus a marker filter — one hash
shuffle each, no driver materialisation, scale-safe.

For *small* right sides prefer ``broadcast_semi_filter`` (a ``ray.put`` key
set read inside ``map_batches``) — zero shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

DEFAULT_PARTITIONS = 32


def _resolve_partitions(n: int) -> int:
    """Cap join partition count so the hash-join aggregator actors can all
    schedule alongside the streaming executor's map tasks (each aggregator
    reserves a CPU slot; oversubscribing deadlocks on a small cluster)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(1, min(n, max(2, cpus // 2)))


def inner_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: tuple[str, ...] | str,
    *,
    right_on=None,
    num_partitions: int = DEFAULT_PARTITIONS,
    left_suffix: str | None = None,
    right_suffix: str | None = None,
) -> "ray.data.Dataset":
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (right_on,) if isinstance(right_on, str) else right_on
    return left.join(
        right,
        "inner",
        _resolve_partitions(num_partitions),
        on=on,
        right_on=right_on,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )


def left_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: tuple[str, ...] | str,
    *,
    right_on=None,
    num_partitions: int = DEFAULT_PARTITIONS,
    left_suffix: str | None = None,
    right_suffix: str | None = None,
) -> "ray.data.Dataset":
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (right_on,) if isinstance(right_on, str) else right_on
    return left.join(
        right,
        "left_outer",
        _resolve_partitions(num_partitions),
        on=on,
        right_on=right_on,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )


_MARKER = "__semi_marker"


def _key_set(right: "ray.data.Dataset", on: tuple[str, ...]) -> "ray.data.Dataset":
    """Distinct key rows of the right side, with a marker column."""
    dedup = right.select_columns(list(on)).groupby(list(on)).count()
    return dedup.map_batches(
        lambda t: t.drop_columns(["count()"]).append_column(
            _MARKER, pa.array([1] * t.num_rows, pa.int8())
        ),
        batch_format="pyarrow",
    )


def semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: tuple[str, ...] | str,
    *,
    num_partitions: int = DEFAULT_PARTITIONS,
) -> "ray.data.Dataset":
    """Rows of ``left`` whose key appears in ``right`` (J1)."""
    on = (on,) if isinstance(on, str) else tuple(on)
    joined = left_join(left, _key_set(right, on), on, num_partitions=num_partitions)
    return joined.map_batches(
        lambda t: t.filter(pc.is_valid(t[_MARKER])).drop_columns([_MARKER]),
        batch_format="pyarrow",
    )


def anti_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: tuple[str, ...] | str,
    *,
    num_partitions: int = DEFAULT_PARTITIONS,
) -> "ray.data.Dataset":
    """Rows of ``left`` whose key does NOT appear in ``right``
    (matching_stages.py:173-182 `_get_unmatched_subset`)."""
    on = (on,) if isinstance(on, str) else tuple(on)
    joined = left_join(left, _key_set(right, on), on, num_partitions=num_partitions)
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t[_MARKER])).drop_columns([_MARKER]),
        batch_format="pyarrow",
    )


def broadcast_semi_filter(
    left: "ray.data.Dataset",
    keys,
    on: str,
    *,
    keep: bool = True,
) -> "ray.data.Dataset":
    """Zero-shuffle semi (keep=True) / anti (keep=False) filter against a
    *small* key collection: the key set is ``ray.put`` once and read
    zero-copy in every task."""
    keys_ref = keys if isinstance(keys, ray.ObjectRef) else ray.put(frozenset(keys))

    def _filter(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = pa.array([v in ks for v in t[on].to_pylist()], pa.bool_())
        return t.filter(mask if keep else pc.invert(mask))

    return left.map_batches(_filter, batch_format="pyarrow")
