"""Constant-work-per-process scaling of the score kernels vs working-set
size — the controlled experiment behind the single-box scaling analysis.

Each of N worker PROCESSES (no shared Python state, private data) runs the
same fixed number of hist_products chunks.  If the kernel were CPU-bound,
aggregate throughput would scale ~linearly in N; any sub-linearity is
contention for the box's shared resources (DRAM bandwidth, LLC).  Running
the experiment at two working-set sizes separates the two regimes:

  * "small" — the packed store fits in cache: near-linear scaling expected;
  * "large" — the store is DRAM-resident (the real flagship's shape):
    throughput saturates at the box's bandwidth ceiling.

On a real N->4N NODE cluster every node brings its own DRAM, so the
"small" curve is the cluster-relevant one; the "large" curve is the
single-box artefact.  Usage:

  PYTHONPATH=. python tools/kernel_scaling_bench.py
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(n_rec: int, n_chunks: int, n_pairs: int, seed: int, q) -> None:
    import numpy as np

    from moj_analytical_services_uk_address_matcher_ray.stages import packed as P

    rng = np.random.default_rng(seed)
    seg = rng.integers(4, 24, n_rec)
    offsets = np.r_[0, np.cumsum(seg)].astype(np.int64)
    total = int(offsets[-1])
    keys = rng.integers(0, 2**63, total, dtype=np.uint64)
    rec = np.repeat(np.arange(n_rec, dtype=np.int64), seg)
    order = np.lexsort((keys, rec))
    ph = P.PackedHists(
        keys=keys,
        rf=rng.random(total),
        cnt=rng.integers(1, 4, total).astype(np.float64),
        offsets=offsets,
        isnull=np.zeros(n_rec, bool),
        lens=seg.astype(np.int64),
        keys_sorted=keys[order],
        cnt_sorted=None,  # set below from cnt[order] (pack_hists invariant)
    )
    ph.cnt_sorted = ph.cnt[order]
    tl = rng.integers(0, n_rec, n_pairs).astype(np.int64)
    tr = rng.integers(0, n_rec, n_pairs).astype(np.int64)
    P.hist_products(ph, ph, tl[:1000], tr[:1000])  # warm
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        P.hist_products(ph, ph, tl, tr)
    q.put(n_chunks * n_pairs / (time.perf_counter() - t0))


def run_level(n_procs: int, n_rec: int, n_chunks: int, n_pairs: int) -> float:
    q: "mp.Queue" = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(n_rec, n_chunks, n_pairs, 100 + i, q))
        for i in range(n_procs)
    ]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    out: dict = {}
    for label, n_rec in (("small_cache_resident", 4_000), ("large_dram_resident", 600_000)):
        # ~4k records ≈ 1.3 MB packed store (L2-resident); 600k ≈ 200 MB
        curve = {}
        for n in (1, 4, 8, 16):
            agg = run_level(n, n_rec, n_chunks=8, n_pairs=131_072)
            curve[n] = round(agg / 1e6, 2)  # M probes/s aggregate
        base = curve[1]
        curve_eff = {
            n: round(v / (base * n), 3) for n, v in curve.items() if n > 1
        }
        out[label] = {"aggregate_Mpairs_per_sec": curve, "per_proc_efficiency": curve_eff}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
