"""Per-stage Ray Data ``stats()`` profiling via ``DebugOptions(capture_stats=True)``.

The reference's runner prints a per-CTE timing report when debug mode is on
(sql_pipeline/runner.py:493-610); this example shows the Ray-native
equivalent: each cleaning stage is materialised separately, and the
executor's own operator stats (wall time, blocks, rows/s, peak heap) are
captured per stage so a slow stage can be localised without guessing.

Run:  PYTHONPATH=. python examples/stage_stats_profile.py
"""

from __future__ import annotations

import re


def _digest(stats_text: str) -> str:
    """One-line digest of a Dataset.stats() blob: operator name + wall time."""
    out = []
    for m in re.finditer(
        r"Operator \d+ (\S+?):.*?Execution time: total ([\d.]+)s",
        stats_text,
        re.S,
    ):
        name, sec = m.group(1), float(m.group(2))
        out.append(f"{name}={sec:.2f}s")
    return ", ".join(out) if out else stats_text.strip().split("\n")[0]


def main(n: int = 2000, verbose: bool = True):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from examples._example_data import make_canonical
    from moj_analytical_services_uk_address_matcher_ray.pipelines.clean import (
        pre_tf_stages,
    )
    from moj_analytical_services_uk_address_matcher_ray.pipelines.framework import (
        DebugOptions,
        Pipeline,
        batch_stage,
    )

    # one Stage per cleaning function so stats are attributed per operator
    pipe = Pipeline(
        [batch_stage(fn) for fn in pre_tf_stages()],
        name="pre_tf_profile",
        description="per-stage stats() capture over the pre-TF cleaning queue",
    )
    out = pipe.run(
        rd.from_arrow(make_canonical(n)),
        debug=DebugOptions(
            materialize_each_stage=True,
            row_counts=True,
            capture_stats=True,
            print_timings=False,
        ),
    )
    if verbose:
        print(pipe.report())
        print("\nexecutor stats per stage:")
        for rep in pipe.reports:
            print(f"  {rep.name:<42} {_digest(rep.stats or '')}")
    assert out.count() == n
    return pipe.reports


if __name__ == "__main__":
    reports = main()
    assert all(r.stats for r in reports), "capture_stats must populate reports"
    print(f"\nOK: {len(reports)} stages profiled with captured stats")
