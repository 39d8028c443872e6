"""Pairwise Fellegi-Sunter scoring — the actor-pool stage (SURVEY.md §2.5).

``PairScorer`` is a callable class for
``ds_pairs.map_batches(PairScorer, concurrency=N, batch_size=B,
batch_format="pandas")``: the model spec and TF lookup dicts are loaded once
per actor in ``__init__`` (zero-copy ``ray.get`` of broadcast refs), and each
``__call__`` evaluates all comparison levels over a batch of candidate pairs
with suffixed columns (``*_l`` canonical, ``*_r`` messy — the reference's
convention, proven by tests/test_source_dataset.py:73-85).

Level semantics are re-derived from splink_model.json + public FS math (see
state/model.py).  The histogram-product comparison computes
``P = prod(rel_freq ^ min(cnt_l, cnt_r))`` over keys present on both sides in
plain float64 — underflow to 0.0 lands in the smallest band, exactly as the
reference's DuckDB doubles behave — then bands it against the level
thresholds, so the 35 levels cost one pass.

The ``threshold_match_weight`` filter (reference predict(-50)) is fused into
the same stage: pruned pairs never hit the object store again.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..state.model import Comparison, FSModel, Level

# ---------------------------------------------------------------------------
# scalar helpers
# ---------------------------------------------------------------------------


def levenshtein_leq(a: str, b: str, k: int) -> bool:
    """Banded edit distance <= k (O(k*len) instead of O(len^2))."""
    if a is None or b is None:
        return False
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    if a == b:
        return True
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        lo = max(1, i - k)
        hi = min(lb, i + k)
        if lo > 1:
            cur[lo - 1] = k + 1
        for j in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if hi < lb:
            cur[hi + 1 :] = [k + 1] * (lb - hi)
        if min(cur[lo - 1 : hi + 1]) > k:
            return False
        prev = cur
    return prev[lb] <= k


def levenshtein_leq_batch(al, ar, k: int) -> "np.ndarray":
    """Vectorised ``levenshtein_leq`` over object arrays of strings: the DP
    runs as O(maxlen^2) numpy ops over the WHOLE pair batch instead of one
    Python DP per pair (the per-pair form was the single largest CPU cost
    of the two-table scoring kernel).  The insertion recurrence's in-row
    scan uses the min-plus trick: min over j'<=j of cur[j'] + (j - j') =
    (running min of cur[j'] - j') + j."""
    al = np.asarray(al, dtype=object)
    ar = np.asarray(ar, dtype=object)
    n = len(al)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    valid = (al != None) & (ar != None)  # noqa: E711 (elementwise)
    if not valid.any():
        return out
    A = np.array(np.where(valid, al, ""), dtype="U")
    B = np.array(np.where(valid, ar, ""), dtype="U")
    la = np.char.str_len(A)
    lb = np.char.str_len(B)
    eqs = valid & (A == B)
    out |= eqs
    todo = valid & ~eqs & (np.abs(la - lb) <= k)
    if not todo.any():
        return out
    idx = np.flatnonzero(todo)
    A2, B2 = A[idx], B[idx]
    la2, lb2 = la[idx].astype(np.int64), lb[idx].astype(np.int64)
    m = len(idx)
    wa = max(1, A2.dtype.itemsize // 4)
    wb = max(1, B2.dtype.itemsize // 4)
    Am = A2.view(np.uint32).reshape(m, wa)
    Bm = B2.view(np.uint32).reshape(m, wb)
    maxa = int(la2.max())
    maxb = int(lb2.max())
    rows = np.arange(m)
    res = np.full(m, np.iinfo(np.int32).max, dtype=np.int32)
    jj = np.arange(maxb + 1, dtype=np.int32)
    prev = np.broadcast_to(jj, (m, maxb + 1)).copy()
    done0 = la2 == 0
    if done0.any():
        res[done0] = lb2[done0].astype(np.int32)
    for i in range(1, maxa + 1):
        ai = Am[:, i - 1] if i - 1 < wa else np.zeros(m, dtype=np.uint32)
        cost = (Bm[:, :maxb] != ai[:, None]).astype(np.int32)
        cur = np.empty_like(prev)
        cur[:, 0] = i
        cur[:, 1:] = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        # transitive insertion scan (min-plus running minimum)
        cur = np.minimum.accumulate(cur - jj, axis=1) + jj
        sel = la2 == i
        if sel.any():
            res[sel] = cur[sel, lb2[sel]]
        prev = cur
    out[idx] = res <= k
    return out


def split_part(s, part: int) -> str | None:
    """DuckDB split_part: 1-based, '' when out of range, NULL propagates
    (split_part(NULL, ...) IS NULL — a NULL-side comparison can never fire
    an equality level, mirroring DuckDB's three-valued logic)."""
    if s is None or (isinstance(s, float) and np.isnan(s)):
        return None
    parts = s.split(" ")
    return parts[part - 1] if 0 < part <= len(parts) else ""


def hist_to_dict(hist) -> dict | None:
    """list<struct<tok, rel_freq, count>> -> {(tok, rel_freq): count} — the
    comparison-ready form (precomputed once per record in broadcast stores)."""
    if hist is None:
        return None
    return {(e["tok"], e["rel_freq"]): e["count"] for e in hist}


def hist_product(hist_l, hist_r) -> float:
    """P = prod over keys of hist_l also in hist_r of rel_freq^min(cnt_l,cnt_r).

    Histograms are ``list<struct<tok, rel_freq, count>>`` or the precomputed
    dict form; key equality is (tok, rel_freq) — full struct equality,
    matching DuckDB map semantics.
    """
    if hist_l is None or hist_r is None or len(hist_l) == 0 or len(hist_r) == 0:
        return 1.0
    right = hist_r if isinstance(hist_r, dict) else hist_to_dict(hist_r)
    p = 1.0
    if isinstance(hist_l, dict):
        for (tok, rf), cl in hist_l.items():
            cr = right.get((tok, rf))
            if cr:
                p *= _pow_small_int(rf, min(cl, cr))
        return p
    for e in hist_l:
        cr = right.get((e["tok"], e["rel_freq"]))
        if cr:
            p *= _pow_small_int(e["rel_freq"], min(e["count"], cr))
    return p


def _pow_small_int(rf: float, c) -> float:
    """rf**c by LEFT-TO-RIGHT repeated multiplication for small integer c.

    Plain float64 multiplies are exactly rounded, so this sequence is
    bit-identical wherever it is evaluated — unlike ``pow``, where numpy's
    SIMD kernel and libm differ by 1 ulp.  The packed batch kernel
    (stages/packed.py hist_products) uses the same rule, keeping broadcast
    and shuffle scorer paths float-identical.  Falls back to ``pow`` above
    _POW_UNROLL_MAX (counts that large don't occur in token histograms)."""
    ci = int(c)
    if ci != c or not (0 <= ci <= _POW_UNROLL_MAX):
        return rf**c
    f = 1.0
    for _ in range(ci):
        f *= rf
    return f


_POW_UNROLL_MAX = 64


_DIGITS = r"(\d+)"


# ---------------------------------------------------------------------------
# vectorised level predicates
# ---------------------------------------------------------------------------


def _notna(s: pd.Series) -> np.ndarray:
    return s.notna().to_numpy()


def _isna(s: pd.Series) -> np.ndarray:
    return s.isna().to_numpy()


def _eq(a: pd.Series, b: pd.Series) -> np.ndarray:
    return (a.to_numpy(dtype=object) == b.to_numpy(dtype=object)) & _notna(a) & _notna(b)


def _sparse_rowwise(fn, al, ar, remaining: "np.ndarray | None") -> np.ndarray:
    """Evaluate a per-row Python predicate only on still-unresolved rows —
    the expensive kinds (levenshtein, set overlap, split_part) skip rows an
    earlier level already claimed."""
    n = len(al)
    if remaining is None:
        return np.fromiter((fn(x, y) for x, y in zip(al, ar)), dtype=bool, count=n)
    out = np.zeros(n, dtype=bool)
    idx = np.flatnonzero(remaining)
    for i in idx:
        if fn(al[i], ar[i]):
            out[i] = True
    return out


class _ComparisonEvaluator:
    """Evaluates one comparison's ordered levels over a batch, returning
    (gamma, log2_bf) arrays.

    Gamma numbering follows Splink's convention (reference intermediate
    columns): null levels are -1, non-null levels are numbered in REVERSE
    order of declaration — the strongest (first-declared) level gets the
    highest gamma and the 'else' level gets 0."""

    def __init__(self, comp: Comparison, tf_tables: dict[str, dict[str, float]]):
        self.comp = comp
        self.tf_tables = tf_tables
        non_null = [i for i, lv in enumerate(comp.levels) if not lv.is_null]
        self.gamma_of = {
            i: (len(non_null) - 1 - rank) for rank, i in enumerate(non_null)
        }

    def _level_mask(
        self,
        lv: Level,
        df: pd.DataFrame,
        hist_p: np.ndarray | None,
        remaining: np.ndarray | None = None,
        pre: dict | None = None,
    ) -> np.ndarray:
        """``pre`` carries batch-aligned arrays precomputed from a PACKED
        feature store (stages/packed.py) by the broadcast scorer; when a key
        is present the vectorised array replaces the per-row Python kernel
        (and the referenced column need not exist in ``df`` at all)."""
        k, p = lv.kind, lv.params
        n = len(df)
        pre = pre or {}

        def _side_isna(c: str, side: str) -> np.ndarray:
            got = pre.get(("isnull", c, side))
            if got is not None:
                return got
            return _isna(df[f"{c}_{side}"])

        if k == "else":
            return np.ones(n, dtype=bool)
        if k in ("null_any", "null_any_level"):
            m = np.zeros(n, dtype=bool)
            for c in p["cols"]:
                m |= _side_isna(c, "l") | _side_isna(c, "r")
            return m
        if k == "null_all":
            m = np.ones(n, dtype=bool)
            for c in p["cols"]:
                m &= _side_isna(c, "l") & _side_isna(c, "r")
            return m
        if k == "exact":
            got = pre.get(("eq", p["col"]))
            if got is not None:
                cl, cr = got
                return (cl == cr) & (cl >= 0)
            return _eq(df[f"{p['col']}_l"], df[f"{p['col']}_r"])
        if k == "pair_equal":
            got = pre.get(("eqpair", p["col_l"], p["col_r"]))
            if got is not None:
                cl, cr = got
                return (cl == cr) & (cl >= 0)
            return _eq(df[f"{p['col_l']}_l"], df[f"{p['col_r']}_r"])
        if k == "cross_equal":
            a, b = p["col_a"], p["col_b"]
            got = pre.get(("eqcross", a, b))
            if got is not None:
                al, br, bl, ar = got
                return ((al == br) & (al >= 0)) | ((bl == ar) & (bl >= 0))
            return _eq(df[f"{a}_l"], df[f"{b}_r"]) | _eq(df[f"{b}_l"], df[f"{a}_r"])
        if k == "digits_equal":
            c = p["col"]
            got = pre.get(("eqdig", c))
            if got is not None:
                cl, cr = got
                return (cl == cr) & (cl >= 0)
            dl = df[f"{c}_l"].str.extract(_DIGITS, expand=False)
            dr = df[f"{c}_r"].str.extract(_DIGITS, expand=False)
            return _eq(dl, dr)
        if k == "flat_presence_mismatch":
            na = {
                (c, s): _side_isna(c, s)
                for c in ("flat_positional", "flat_letter")
                for s in ("l", "r")
            }
            fp_l, fp_r = na[("flat_positional", "l")], na[("flat_positional", "r")]
            fl_l, fl_r = na[("flat_letter", "l")], na[("flat_letter", "r")]
            return (~fp_l & fp_r & ~fl_r) | (~fp_r & fp_l & ~fl_l)
        if k == "overlap_geq":
            c, kk = p["col"], p["k"]
            ov = pre.get(("ov", c))
            if ov is not None:
                return ov >= kk
            al = df[f"{c}_l"].to_numpy(dtype=object)
            ar = df[f"{c}_r"].to_numpy(dtype=object)

            def _ov(x, y):
                if x is None or y is None or len(x) == 0 or len(y) == 0:
                    return False
                sx = x if isinstance(x, frozenset) else set(x)
                sy = y if isinstance(y, frozenset) else set(y)
                return len(sx & sy) >= kk

            return _sparse_rowwise(_ov, al, ar, remaining)
        if k == "null_or_empty_list":
            m = np.zeros(n, dtype=bool)
            for c in p["cols"]:
                for side in ("l", "r"):
                    ne = pre.get(("nullempty", c, side))
                    if ne is not None:
                        m |= ne
                        continue
                    vals = df[f"{c}_{side}"].to_numpy(dtype=object)
                    m |= np.fromiter(
                        (v is None or len(v) == 0 for v in vals), dtype=bool, count=n
                    )
            return m
        if k == "hist_product_lt":
            assert hist_p is not None
            return hist_p < p["threshold"]
        if k == "lev_leq":
            c, kk = p["col"], p["k"]
            al = df[f"{c}_l"].to_numpy(dtype=object)
            ar = df[f"{c}_r"].to_numpy(dtype=object)
            if remaining is None:
                return levenshtein_leq_batch(al, ar, kk)
            idx = np.flatnonzero(remaining)
            out = np.zeros(n, dtype=bool)
            out[idx] = levenshtein_leq_batch(al[idx], ar[idx], kk)
            return out
        if k == "split_part_equal":
            c, part = p["col"], p["part"]
            sl = pre.get(("split", c, part, "l"))
            sr = pre.get(("split", c, part, "r"))
            if sl is not None and sr is not None:
                notnull = ~pd.isna(sl) & ~pd.isna(sr)
                return notnull & (sl == sr)
            al = df[f"{c}_l"].to_numpy(dtype=object)
            ar = df[f"{c}_r"].to_numpy(dtype=object)
            def _sp_eq(x, y):
                px, py = split_part(x, part), split_part(y, part)
                # NULL = NULL is NULL in SQL -> the level does NOT fire
                return px is not None and py is not None and px == py

            return _sparse_rowwise(_sp_eq, al, ar, remaining)
        if k == "first_n_tokens_equal":
            # reference training.py:19-91 (get_first_n_tokens_comparison):
            # regexp_extract of the first n whitespace tokens equal on both
            # sides, extract longer than 1 char, AND postcode equality.
            # DuckDB regexp_extract -> '' on no match; pandas extract ->
            # NaN — both fail the >1-length gate, so semantics agree.
            c, nn = p["col"], int(p["n"])
            pc_col = p.get("postcode_col", "postcode")
            pat = (
                rf"^((?:\S+\s+){{{nn - 1}}}\S+)" if nn > 1 else r"^(\S+)"
            )
            el = df[f"{c}_l"].astype("object").str.extract(pat, expand=False)
            er = df[f"{c}_r"].astype("object").str.extract(pat, expand=False)
            ok = el.notna() & er.notna() & (el == er)
            ok &= el.str.len() > 1
            pl_, pr_ = df[f"{pc_col}_l"], df[f"{pc_col}_r"]
            ok &= pl_.notna() & pr_.notna() & (pl_ == pr_)
            return ok.to_numpy(dtype=bool)
        raise ValueError(f"unknown level kind {k!r}")

    def evaluate(
        self, df: pd.DataFrame, pre: dict | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        n = len(df)
        hist_p: np.ndarray | None = None
        needs_hist = any(lv.kind == "hist_product_lt" for lv in self.comp.levels)
        if needs_hist:
            col = next(
                lv.params["col"] for lv in self.comp.levels if lv.kind == "hist_product_lt"
            )
            hist_p = (pre or {}).get(("hist", col))
            if hist_p is None:
                hl = df[f"{col}_l"].to_numpy(dtype=object)
                hr = df[f"{col}_r"].to_numpy(dtype=object)
                hist_p = np.fromiter(
                    (hist_product(a, b) for a, b in zip(hl, hr)),
                    dtype=np.float64,
                    count=n,
                )
        level_idx = np.full(n, -1, dtype=np.int32)
        log2_bf = np.zeros(n, dtype=np.float64)
        remaining = np.ones(n, dtype=bool)
        for i, lv in enumerate(self.comp.levels):
            if not remaining.any():
                break
            mask = self._level_mask(lv, df, hist_p, remaining, pre) & remaining
            if not mask.any():
                continue
            level_idx[mask] = self.gamma_of.get(i, -1)  # null levels -> -1
            if lv.is_null:
                pass  # BF = 1 -> log2 0
            else:
                bf = np.full(mask.sum(), lv.bf, dtype=np.float64)
                if lv.tf_col and lv.tf_col in self.tf_tables:
                    got = (pre or {}).get(("tf", lv.tf_col))
                    if got is not None:
                        # per-record tf values resolved once per actor
                        # (NaN = null value or no tf entry); same max-side
                        # + pow arithmetic as the per-row path below, so
                        # both scorer paths stay float-identical
                        tl_all, tr_all = got
                        with np.errstate(invalid="ignore"):
                            tv = np.fmax(tl_all[mask], tr_all[mask])
                            valid = ~np.isnan(tv) & (tv > 0)
                        adj = np.ones(len(bf), dtype=np.float64)
                        if valid.any():
                            adj[valid] = (lv.u / tv[valid]) ** lv.tf_weight
                        bf *= adj
                    else:
                        tf = self.tf_tables[lv.tf_col]
                        vals_l = df[f"{lv.tf_col}_l"].to_numpy(dtype=object)[mask]
                        vals_r = df[f"{lv.tf_col}_r"].to_numpy(dtype=object)[mask]
                        adj = np.ones(len(bf), dtype=np.float64)
                        for j, (vl, vr) in enumerate(zip(vals_l, vals_r)):
                            tl = tf.get(vl)
                            tr = tf.get(vr)
                            t = max(x for x in (tl, tr) if x is not None) if (tl or tr) else None
                            if t:
                                adj[j] = (lv.u / t) ** lv.tf_weight
                        bf *= adj
                log2_bf[mask] = np.log2(bf)
            remaining &= ~mask
        return level_idx, log2_bf


def score_batch(
    t: "pa.Table",
    evaluators: list[_ComparisonEvaluator],
    prior_log2_odds: float,
    *,
    threshold: float | None = None,
    emit_gammas: bool = False,
) -> "pa.Table":
    """Pure scoring kernel over an Arrow batch of pairs (used by the
    PairScorer actor AND the fused attach+score bucket stage)."""
    import pyarrow as pa

    if t.num_rows == 0:
        t = t.append_column("match_weight", pa.array([], pa.float64()))
        t = t.append_column("match_probability", pa.array([], pa.float64()))
        return t
    from ..state.metrics import inc_metric

    inc_metric("scoring.pairs_scored", t.num_rows)
    df = t.to_pandas()
    mw = np.full(len(df), prior_log2_odds, dtype=np.float64)
    gammas = {}
    for ev in evaluators:
        idx, log2_bf = ev.evaluate(df)
        mw += log2_bf
        if emit_gammas:
            gammas[f"gamma_{ev.comp.name}"] = idx
    for name, idx in gammas.items():
        t = t.append_column(name, pa.array(idx, pa.int32()))
    t = t.append_column("match_weight", pa.array(mw, pa.float64()))
    t = t.append_column(
        "match_probability", pa.array((2.0**mw) / (1.0 + 2.0**mw), pa.float64())
    )
    if threshold is not None:
        t = t.filter(pa.compute.greater(t["match_weight"], threshold))
    return t


# ---------------------------------------------------------------------------
# the actor-pool stage
# ---------------------------------------------------------------------------


class PairScorer:
    """Stateful scoring stage.

    Parameters
    ----------
    model_ref : FSModel or ObjectRef of one — resolved once per actor.
    tf_tables_ref : dict[col -> dict[value -> tf]] (or ObjectRef) for
        tf-adjusted levels (reference splink_model.py:117-131).
    threshold_match_weight : fused prune (reference predict -50).
    emit_gammas : also emit per-comparison level indices (``gamma_<name>``),
        for debugging/parity checks.
    """

    def __init__(
        self,
        model_ref,
        tf_tables_ref=None,
        *,
        threshold_match_weight: float | None = None,
        emit_gammas: bool = False,
    ):
        model: FSModel = (
            ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        )
        tf_tables = (
            ray.get(tf_tables_ref)
            if isinstance(tf_tables_ref, ray.ObjectRef)
            else (tf_tables_ref or {})
        )
        self.model = model
        self.evaluators = [_ComparisonEvaluator(c, tf_tables) for c in model.comparisons]
        self.threshold = threshold_match_weight
        self.emit_gammas = emit_gammas

    def __call__(self, t: "pa.Table") -> "pa.Table":
        """Arrow in / Arrow out — nested payload columns (histograms) stay in
        Arrow; only the evaluation view is pandas (cheap object view)."""
        return score_batch(
            t,
            self.evaluators,
            self.model.prior_log2_odds,
            threshold=self.threshold,
            emit_gammas=self.emit_gammas,
        )


def score_pairs(
    pairs: "ray.data.Dataset",
    model: FSModel,
    tf_tables: dict[str, dict[str, float]] | None = None,
    *,
    threshold_match_weight: float | None = -50.0,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 4096,
    emit_gammas: bool = False,
) -> "ray.data.Dataset":
    """Score candidate pairs with an actor pool; prune below threshold."""
    model_ref = ray.put(model)
    tf_ref = ray.put(tf_tables or {})
    return pairs.map_batches(
        PairScorer,
        fn_constructor_args=(model_ref, tf_ref),
        fn_constructor_kwargs={
            "threshold_match_weight": threshold_match_weight,
            "emit_gammas": emit_gammas,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
