"""Standalone 5M-edge single-component evidence run for the distributed
large-star/small-star CC path (the star-CC scale evidence): a planted component with
a ~1M-degree hub plus random tree edges, forced through the distributed path
(driver_threshold=0), reporting wall, rounds implied, and the max observed
(key, salt) sub-group — which must stay ~STAR_TARGET_GROUP_ROWS regardless
of component size."""

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False
import logging  # noqa: E402

logging.getLogger("ray.data").setLevel(logging.ERROR)

from moj_analytical_services_uk_address_matcher_ray.stages.cluster import (  # noqa: E402
    STAR_TARGET_GROUP_ROWS,
    connected_components,
)
from moj_analytical_services_uk_address_matcher_ray.state.metrics import (  # noqa: E402
    read_metrics,
    reset_metrics,
)

N = 4_000_000  # nodes
HUB_EDGES = 1_000_000  # hub degree (the mega-star)
rng = np.random.default_rng(7)

ids = np.array([f"n{i:07d}" for i in range(N)])
# random tree: every node i>0 links to a random smaller node -> ONE component
parents = (rng.random(N - 1) * np.arange(1, N)).astype(np.int64)
src_tree = ids[1:]
dst_tree = ids[parents]
# hub: node 1 linked to HUB_EDGES random nodes (duplicates fine)
hub_targets = rng.integers(0, N, HUB_EDGES)
src_hub = np.full(HUB_EDGES, ids[1])
dst_hub = ids[hub_targets]

src = np.concatenate([src_tree, src_hub])
dst = np.concatenate([dst_tree, dst_hub])
n_edges = len(src)
parts = []
step = 250_000
for i in range(0, n_edges, step):
    parts.append(
        ray.put(
            pa.table(
                {
                    "src": pa.array(src[i : i + step], pa.string()),
                    "dst": pa.array(dst[i : i + step], pa.string()),
                }
            )
        )
    )
edges = rd.from_arrow_refs(parts)
print(f"{n_edges} edges, {N} nodes, hub degree ~{HUB_EDGES}")

reset_metrics()
t0 = time.perf_counter()
out = connected_components(edges, driver_threshold=0, max_rounds=40).materialize()
wall = time.perf_counter() - t0
n_out = out.count()
import pyarrow.compute as pc  # noqa: E402

labs = out.map_batches(
    lambda t: pa.table({"u": pc.unique(t["cluster_id"])}), batch_format="pyarrow"
)
uniq = set()
for b in labs.iter_batches(batch_format="pyarrow"):
    uniq.update(b["u"].to_pylist())
m = read_metrics()
print(
    f"wall={wall:.1f}s nodes_out={n_out} distinct_labels={len(uniq)} "
    f"label={sorted(uniq)[:3]} max_star_group={m.get('cc.max_star_group_rows')} "
    f"max_bucket={m.get('cc.max_star_bucket_rows')} target={STAR_TARGET_GROUP_ROWS}"
)
assert n_out == N and uniq == {ids[0]}
assert m.get("cc.max_star_group_rows", 1e18) <= 4 * STAR_TARGET_GROUP_ROWS
print("OK")
ray.shutdown()
