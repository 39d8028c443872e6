"""Pipeline framework: the ``@stage`` decorator and ``Pipeline`` runner.

The reference composes SQL fragments into one lazy CTE chain via a
``@pipeline_stage`` decorator (sql_pipeline/steps.py:238-283) with optional
per-stage checkpoint/materialise flags (runner.py:465-491) and a
``show_plan`` pretty-printer.  Here the same extension surface wraps
``Dataset -> Dataset`` callables: Ray Data's lazy operator graph plays the
role of the CTE chain (chained ``map_batches`` fuse in the streaming
executor), and ``checkpoint=True`` stages write partitioned Parquet with
per-partition lineage + metrics sidecars and are skipped on resume (see
``state.checkpoint``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

import ray


@dataclass
class Stage:
    name: str
    fn: Callable  # (Dataset, **ctx) -> Dataset  OR  batch fn when batch=True
    description: str = ""
    tags: tuple[str, ...] = ()
    checkpoint: bool = False
    batch: bool = False  # True: fn is a pyarrow.Table batch transform
    batch_kwargs: dict = field(default_factory=dict)

    def apply(self, ds: "ray.data.Dataset", **ctx) -> "ray.data.Dataset":
        if self.batch:
            kwargs = dict(self.batch_kwargs)
            fn_kwargs = kwargs.pop("fn_kwargs", {})
            return ds.map_batches(
                self.fn, batch_format="pyarrow", fn_kwargs=fn_kwargs, **kwargs
            )
        return self.fn(ds, **ctx) if ctx else self.fn(ds)


def stage(
    name: str | None = None,
    *,
    description: str = "",
    tags: tuple[str, ...] = (),
    checkpoint: bool = False,
    batch: bool = False,
    **batch_kwargs,
) -> Callable[[Callable], Stage]:
    """Decorator turning a callable into a :class:`Stage` (the reference's
    ``@pipeline_stage`` analogue)."""

    def wrap(fn: Callable) -> Stage:
        return Stage(
            name=name or fn.__name__,
            fn=fn,
            description=description or (fn.__doc__ or "").strip().split("\n")[0],
            tags=tags,
            checkpoint=checkpoint,
            batch=batch,
            batch_kwargs=batch_kwargs,
        )

    return wrap


def batch_stage(fn: Callable, name: str | None = None, **batch_kwargs) -> Stage:
    """Wrap a ``pyarrow.Table -> pyarrow.Table`` function as a Stage."""
    return Stage(
        name=name or fn.__name__,
        fn=fn,
        description=(fn.__doc__ or "").strip().split("\n")[0],
        batch=True,
        batch_kwargs=batch_kwargs,
    )


@dataclass
class DebugOptions:
    """Analogue of the reference's ``DebugOptions`` (sql_pipeline/
    runner.py:196-238): per-stage incremental materialisation with wall
    timing, row counts, and optional Ray Data ``stats()`` capture.

    Debugging aid only — materialising every stage defeats operator fusion,
    so never enable in production runs."""

    materialize_each_stage: bool = True
    row_counts: bool = True
    capture_stats: bool = False  # keep ds.stats() text per stage
    print_timings: bool = False  # print the report as stages complete


@dataclass
class StageReport:
    name: str
    seconds: float
    rows: int | None = None
    stats: str | None = None


class Pipeline:
    """Ordered stage list; stages fuse lazily, checkpoints cut the graph.

    ``checkpoint_dir``: when set, every ``checkpoint=True`` stage writes its
    output under ``<dir>/<idx>_<stage>/`` (skipped + re-read when already
    complete, making reruns resumable mid-pipeline — north rule).
    """

    def __init__(
        self,
        stages: list[Stage],
        *,
        name: str = "pipeline",
        description: str = "",
        checkpoint_dir: str | None = None,
    ):
        self.stages = list(stages)
        self.name = name
        self.description = description
        self.checkpoint_dir = checkpoint_dir
        self.timings: list[tuple[str, float]] = []
        self.reports: list[StageReport] = []

    def describe(self) -> str:
        lines = [f"Pipeline: {self.name}"]
        if self.description:
            lines.append(f"  {self.description}")
        for i, s in enumerate(self.stages):
            mark = " [checkpoint]" if s.checkpoint else ""
            lines.append(f"  {i:02d} {s.name}{mark}  {s.description}")
        return "\n".join(lines)

    def run(
        self,
        ds: "ray.data.Dataset",
        *,
        debug: DebugOptions | None = None,
        **ctx: Any,
    ) -> "ray.data.Dataset":
        from ..state.checkpoint import checkpoint_stage

        self.reports = []
        for i, s in enumerate(self.stages):
            t0 = time.perf_counter()
            if s.checkpoint and self.checkpoint_dir:
                ds = checkpoint_stage(
                    lambda d, _s=s: _s.apply(d, **ctx),
                    ds,
                    f"{self.checkpoint_dir}/{i:02d}_{s.name}",
                )
            else:
                ds = s.apply(ds, **ctx)
            rows = stats = None
            if debug is not None and debug.materialize_each_stage:
                ds = ds.materialize()
                if debug.row_counts:
                    rows = ds.count()
                if debug.capture_stats:
                    stats = ds.stats()
            dt = time.perf_counter() - t0
            self.timings.append((s.name, dt))
            rep = StageReport(name=s.name, seconds=dt, rows=rows, stats=stats)
            self.reports.append(rep)
            if debug is not None and debug.print_timings:
                row_s = "" if rows is None else f"  rows={rows}"
                print(f"[{self.name}] {i:02d} {s.name}: {dt:.3f}s{row_s}")
        return ds

    def report(self) -> str:
        """Per-stage timing table from the last debug run (the reference's
        runner timing report, runner.py:493-610)."""
        if not self.reports:
            return f"Pipeline: {self.name} (no debug run recorded)"
        width = max(len(r.name) for r in self.reports)
        total = sum(r.seconds for r in self.reports)
        lines = [f"Pipeline: {self.name}  total={total:.3f}s"]
        for i, r in enumerate(self.reports):
            row_s = "" if r.rows is None else f"  rows={r.rows:>9}"
            lines.append(f"  {i:02d} {r.name:<{width}}  {r.seconds:8.3f}s{row_s}")
        return "\n".join(lines)
