"""Deterministic dataset splitting and sampling for training-data pipelines.

Every assignment is a pure function of (id, salt) — no RNG state, no
coordination — so any worker can assign any row independently, reruns are
stable, and the exact rule is re-derivable in ANSI SQL for the driver's
value-hash oracle (DuckDB: ``('0x' || substr(md5(s), 1, 8))::UBIGINT``).

Scale notes: both operators are embarrassingly parallel ``map_batches``
stages — zero shuffle, zero driver state.  md5 is used (rather than a
vectorised polynomial hash) because the split rule must be bit-identical
across engines and languages; at ~1M short hashes/s/core it prices at
<0.1% of a typical clean+score pipeline, and the same tradeoff is already
made by the MinHash/SimHash stages.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

#: denominator for the md5-prefix fraction: first 8 hex digits -> [0, 2^32)
_HASH_SPACE = float(1 << 32)


def _hash_fraction(ids: list, salt: str) -> list[float]:
    return [
        int(
            hashlib.md5(f"{v}:{salt}".encode()).hexdigest()[:8], 16
        )
        / _HASH_SPACE
        for v in ids
    ]


def split_by_hash(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> "ray.data.Dataset":
    """Assign every row to a named split by the md5 fraction of its id.

    ``splits`` maps name -> weight (normalised internally); assignment is by
    cumulative range in the given order, so ``{"train": .9, "val": .05,
    "test": .05}`` puts fraction < 0.9 in train, [0.9, 0.95) in val, the
    rest in test.  Deterministic across runs, workers, and engines; change
    ``salt`` to draw an independent split without touching the data.
    """
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    names, bounds, acc = [], [], 0.0
    for name, w in splits.items():
        acc += w / total
        names.append(name)
        bounds.append(acc)
    bounds[-1] = 1.0 + 1e-9  # the last range absorbs fp rounding

    def assign(t: pa.Table) -> pa.Table:
        fr = _hash_fraction(t[id_col].to_pylist(), salt)
        out = []
        for f in fr:
            for name, b in zip(names, bounds):
                if f < b:
                    out.append(name)
                    break
        return t.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def sample_by_hash(
    ds: "ray.data.Dataset",
    rate: float,
    *,
    id_col: str = "doc_id",
    salt: str = "",
) -> "ray.data.Dataset":
    """Keep a deterministic ``rate`` fraction of rows: md5 fraction of the
    id < rate.  Unlike ``Dataset.random_sample`` the choice is stable
    across runs and resumable shards — the sampling analogue of the split
    rule above."""

    def keep(t: pa.Table) -> pa.Table:
        fr = _hash_fraction(t[id_col].to_pylist(), salt)
        mask = pa.array([f < rate for f in fr], pa.bool_())
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def cap_per_group(
    ds: "ray.data.Dataset",
    *,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> "ray.data.Dataset":
    """Deterministic per-group quota — the "at most k documents per domain"
    operator of a corpus-balancing pipeline.  Within each group the k
    keepers are chosen by md5 fraction of the id (a stable lottery:
    rerun-identical, engine-identical, and unbiased w.r.t. input order).

    ONE hash-bucketed shuffle on the group key; inside each bucket the cap
    is a vectorised sort + cumcount over all groups at once (no per-group
    Ray tasks, no per-group Python).  Hot groups cost O(group) within one
    bucket — cap k is applied before anything leaves the bucket, so the
    output is at most k rows per group regardless of skew.
    """
    from .bucketing import bucketed_group_apply

    def per_bucket(df):
        if not len(df):
            return df
        fr = _hash_fraction(df[id_col].tolist(), salt)
        out = df.assign(__fr=fr).sort_values(
            [group_col, "__fr", id_col], kind="mergesort"
        )
        keep = out.groupby(group_col, sort=False).cumcount() < k
        return out[keep].drop(columns="__fr")

    return bucketed_group_apply(ds, [group_col], per_bucket, batch_format="pandas")


def sample_per_group(
    ds: "ray.data.Dataset",
    fractions: dict,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "",
) -> "ray.data.Dataset":
    """Stratified downsampling: keep a per-group deterministic fraction of
    rows (``fractions`` maps group value -> keep rate; unlisted groups keep
    ``default_rate``).  The tool for reshaping a corpus's source mix —
    e.g. down-weighting a crawl that dominates the token count.

    Same md5-lottery as ``sample_by_hash`` (bit-identical in SQL), keyed on
    the id alone so a row's fate is independent of which group rule applies
    — changing one group's rate never reshuffles another's sample.  Zero
    shuffle: the fractions dict rides the task closure (broadcast-small);
    assignment is embarrassingly parallel."""

    def keep(t: pa.Table) -> pa.Table:
        fr = _hash_fraction(t[id_col].to_pylist(), salt)
        groups = t[group_col].to_pylist()
        mask = pa.array(
            [
                f < fractions.get(g, default_rate)
                for f, g in zip(fr, groups)
            ],
            pa.bool_(),
        )
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def upsample_by_weight(
    ds: "ray.data.Dataset",
    weights: dict,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
    salt: str = "",
    epoch_col: str = "epoch",
) -> "ray.data.Dataset":
    """Deterministic fractional REPETITION — the data-mixture upsampler: a
    row whose group weight is ``w`` is emitted ``floor(w)`` times plus one
    more when its md5 fraction falls below ``frac(w)``, so a group with
    weight 2.3 contributes each doc twice and a stable 30% lottery of docs
    a third time (expected token multiplier exactly ``w``, variance-free
    per doc across reruns).  Copies are tagged ``epoch_col`` = 0..k-1 so a
    downstream packer/shuffler can interleave epochs rather than emit
    back-to-back repeats.

    Zero shuffle, embarrassingly parallel; the weights dict rides the task
    closure.  Downsampling (w < 1) falls out of the same rule — floor(w)=0
    and the lottery keeps the expected fraction — making this the single
    mixing knob a mixture config needs.
    """
    import math

    import numpy as np

    def expand(t: pa.Table) -> pa.Table:
        fr = _hash_fraction(t[id_col].to_pylist(), salt)
        groups = t[group_col].to_pylist()
        reps = np.empty(len(fr), np.int64)
        for i, (f, g) in enumerate(zip(fr, groups)):
            w = float(weights.get(g, default_weight))
            if w < 0:
                raise ValueError(f"negative weight for group {g!r}")
            base = math.floor(w)
            reps[i] = base + (1 if f < (w - base) else 0)
        idx = np.repeat(np.arange(len(fr), dtype=np.int64), reps)
        out = t.take(pa.array(idx, pa.int64()))
        # epoch = 0..rep-1 per source row, vectorised (cumcount per repeat)
        ends = np.cumsum(reps)
        epoch = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - np.repeat(
            ends - reps, reps
        )
        return out.append_column(epoch_col, pa.array(epoch, pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow")


def select_to_token_budget(
    ds: "ray.data.Dataset",
    budgets,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    salt: str = "",
) -> "ray.data.Dataset":
    """Per-source token-budget fill — the "build an N-token training mix
    from weighted sources" selector: within each source, documents are
    taken in the deterministic md5 lottery order until the source's token
    budget is reached (a document is included iff the tokens BEFORE it in
    that order are still under budget, so the boundary document may
    overshoot — greedy fill).

    ``budgets``: an int (same budget for every source) or a dict
    ``{source: budget}``; sources missing from the dict are excluded.
    Token counts use the module-standard ``\\s+`` non-empty split; the
    order key is ``(md5(f"{id}:{salt}"), id)`` — both ANSI-SQL
    re-derivable, so the selection is oracle-able end to end.

    Scale shape (the ``pack_sequences`` 256-range prefix-sum pattern, per
    source): one narrow tokenize pass (text read once, never shuffled);
    per-block ``(source, range) -> sum`` combiners feed a driver reduce of
    O(sources x 256) rows that gives every (source, range) its global
    token offset; then ONE bucketed shuffle of the narrow table and a
    local sort + exclusive cumsum + offset per (source, range) group.  No
    global sort, no per-source driver data.

    Returns ``(id_col, source_col, n_tokens, tok_start)`` for selected
    docs; ``tok_start`` is the source-local exclusive token prefix sum.
    """
    import numpy as np
    import pyarrow.compute as pc

    from .bucketing import bucketed_group_apply
    from .packing import _narrow_batch

    def narrow(t: pa.Table) -> pa.Table:
        return _narrow_batch(
            t, id_col, text_col, salt, carry_cols=(source_col,)
        )

    narrow_ds = ds.map_batches(narrow, batch_format="pyarrow").materialize()

    def partial(t: pa.Table) -> pa.Table:
        agg = t.group_by([source_col, "__r"]).aggregate([("__n", "sum")])
        return agg.rename_columns([source_col, "__r", "n_sum"])

    offsets: dict[tuple, int] = {}
    totals: dict[str, dict[int, int]] = {}
    for row in narrow_ds.map_batches(partial, batch_format="pyarrow").take_all():
        totals.setdefault(row[source_col], {})
        totals[row[source_col]][row["__r"]] = (
            totals[row[source_col]].get(row["__r"], 0) + row["n_sum"]
        )
    for src, per_r in totals.items():
        run = 0
        for r in range(256):
            offsets[(src, r)] = run
            run += per_r.get(r, 0)

    budget_of = (
        (lambda s: budgets.get(s)) if isinstance(budgets, dict) else (lambda s: budgets)
    )

    def per_group(df):
        import pandas as pd

        out = []
        for (src, r), sub in df.groupby([source_col, "__r"], sort=False):
            budget = budget_of(src)
            if budget is None:
                continue
            sub = sub.sort_values(["__k", id_col], kind="mergesort")
            n = sub["__n"].to_numpy(dtype=np.int64)
            before = np.cumsum(n) - n + offsets[(src, int(r))]
            keep = before < budget
            if keep.any():
                out.append(
                    pd.DataFrame(
                        {
                            id_col: sub[id_col].to_numpy()[keep],
                            source_col: src,
                            "n_tokens": n[keep],
                            "tok_start": before[keep],
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=df[id_col].dtype),
                    source_col: pd.Series([], dtype=str),
                    "n_tokens": pd.Series([], dtype=np.int64),
                    "tok_start": pd.Series([], dtype=np.int64),
                }
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(
        narrow_ds, [source_col, "__r"], per_group, batch_format="pandas"
    )


def weighted_sample_topk(
    ds: "ray.data.Dataset",
    *,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "es",
    keep_cols: list[str] | None = None,
) -> "ray.data.Dataset":
    """Efraimidis–Spirakis weighted sampling WITHOUT replacement: the
    global top-``k`` rows by key ``u^(1/w)`` (equivalently ``ln(u)/w``),
    where ``u = (md5_prefix(id:salt) + 1) / 2^32`` ∈ (0, 1] is the
    deterministic md5 lottery draw (the +1 keeps ``ln`` finite, unlike the
    module's [0,1) split fraction).  Inclusion probability is proportional
    to weight, the draw is reproducible from ids alone, and the whole
    selection is ANSI-SQL re-derivable (one window-free ORDER BY ... LIMIT
    k), so it is oracle-able end to end.

    Scale shape: each block keeps its own top-``k`` partial (a global
    top-k row always ranks ≤ k within its block), then ONE k×blocks-row
    reduce — no global sort, no shuffle of the data itself.  Rows with
    NULL or non-positive weights are excluded (ln(u)/w needs w > 0).
    Near-ties are broken by ``id`` DESC so the Ray and SQL orders agree
    even at equal keys."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .bucketing import bucketed_group_apply

    cols = [id_col, weight_col] + [
        c for c in (keep_cols or []) if c not in (id_col, weight_col)
    ]

    def partial(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        w = t[weight_col]
        t = t.filter(
            pc.and_(pc.is_valid(w), pc.greater(w.cast(pa.float64()), 0.0))
        )
        df = t.to_pandas()
        if len(df) == 0:
            df["__es"] = pd.Series(dtype=float)
        else:
            u = np.array(
                [
                    (
                        int(
                            hashlib.md5(f"{v}:{salt}".encode()).hexdigest()[:8],
                            16,
                        )
                        + 1
                    )
                    / _HASH_SPACE
                    for v in df[id_col]
                ]
            )
            df["__es"] = np.log(u) / df[weight_col].to_numpy(dtype=float)
        df = df.sort_values(["__es", id_col], ascending=[False, False]).head(k)
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.select(cols)
        df = g.to_pandas()
        df = df.sort_values(["__es", id_col], ascending=[False, False]).head(k)
        return pa.Table.from_pandas(
            df[cols], preserve_index=False
        ).replace_schema_metadata(None)

    partials = ds.map_batches(partial, batch_format="pyarrow").map_batches(
        lambda t: t.append_column("__one", pa.array([1] * t.num_rows, pa.int32())),
        batch_format="pyarrow",
    )
    return bucketed_group_apply(
        partials, "__one", merge, n_buckets=1, exchange="direct"
    )
