"""Fellegi-Sunter model spec: comparisons, ordered levels, Bayes factors.

Re-derivation of the scoring semantics fully specified by the reference's
checked-in model (/root/reference/uk_address_matcher/data/splink_model.json and
its generator linking_model/training.py), using public Splink/FS math:

  * each comparison is an ordered list of levels; the first level whose
    predicate holds wins;
  * a level's Bayes factor is ``m_probability / u_probability`` (the model
    fixes u=1 for most levels so the m values literally *are* BFs);
  * null levels contribute BF = 1;
  * ``match_weight = log2(prior_odds) + sum(log2(BF))`` with prior
    ``p = 3e-8`` -> ``match_probability = 2^mw / (1 + 2^mw)``;
  * a level with ``tf_adjustment_column`` multiplies its BF by
    ``(u_level / tf(value))^tf_adjustment_weight`` where ``tf(value)`` is the
    greatest term frequency of the two sides (Splink convention); missing TF
    -> no adjustment.

Rather than porting SQL, levels are typed predicates (``kind`` + params)
evaluated vectorised in :mod:`..stages.scoring`.  ``load_model_json`` parses
the *reference's own JSON schema* (so a user's model file loads directly) by
classifying each level's ``sql_condition`` into a predicate kind.
"""

from __future__ import annotations

import json
import math
import re
from dataclasses import dataclass, field

PRIOR_DEFAULT = 3e-8


@dataclass
class Level:
    label: str
    kind: str  # predicate id, see stages/scoring.py
    params: dict = field(default_factory=dict)
    m: float = 1.0
    u: float = 1.0
    is_null: bool = False
    tf_col: str | None = None
    tf_weight: float = 1.0

    @property
    def bf(self) -> float:
        return self.m / self.u


@dataclass
class Comparison:
    name: str
    levels: list[Level]

    #: columns (pre-suffix) this comparison reads — used to prune pair payloads
    def columns(self) -> set[str]:
        cols = {self.name}
        for lv in self.levels:
            for key in ("col", "col_a", "col_b", "cols", "postcode_col"):
                v = lv.params.get(key)
                if isinstance(v, str):
                    cols.add(v)
                elif isinstance(v, (list, tuple)):
                    cols.update(v)
        return cols


@dataclass
class FSModel:
    prior: float
    comparisons: list[Comparison]
    blocking_rules: list[str]  # raw rule strings (reference dialect), parsed in stages/blocking.py

    @property
    def prior_log2_odds(self) -> float:
        return math.log2(self.prior / (1.0 - self.prior))

    def columns(self) -> set[str]:
        out: set[str] = set()
        for c in self.comparisons:
            out |= c.columns()
        return out


# ---------------------------------------------------------------------------
# histogram-product band helper
# ---------------------------------------------------------------------------


def hist_band_levels(
    col: str, thresholds_and_ms: list[tuple[float, float]], else_m: float, else_u: float
) -> list[Level]:
    """Banded levels on P = prod(rel_freq^min(cnt_l, cnt_r)) over histogram
    keys present on both sides (splink_model.json:327-617)."""
    levels = [
        Level(
            label=f"{col} is NULL",
            kind="null_any",
            params={"cols": [col]},
            is_null=True,
        )
    ]
    for thr, m in thresholds_and_ms:
        levels.append(
            Level(
                label=f"< {thr:g}",
                kind="hist_product_lt",
                params={"col": col, "threshold": thr},
                m=m,
                u=1.0,
            )
        )
    levels.append(Level(label="else", kind="else", m=else_m, u=else_u))
    return levels


def _default_hist_bands() -> list[tuple[float, float]]:
    """Thresholds 1e-29 .. 1e4 with BFs decaying from ~78k by factor 2^0.25
    per decade down to 4096 at 1e-12, then by 2x per decade (reference band
    generator training.py:386-455; values match splink_model.json exactly)."""
    bands: list[tuple[float, float]] = []
    for i, exp in enumerate(range(-29, -12 + 1)):  # 1e-29 .. 1e-12
        m = 4096.0 * (2 ** ((-12 - exp) * 0.25))
        bands.append((10.0**exp, m))
    m = 4096.0
    for exp in range(-11, 5):  # 1e-11 .. 1e4
        m = m / 2.0
        bands.append((10.0**exp, m))
    return bands


# ---------------------------------------------------------------------------
# the address model (§2.5 tables F1-F8), built programmatically
# ---------------------------------------------------------------------------


def default_address_model(blocking_rules: list[str] | None = None) -> FSModel:
    c_addr = Comparison(
        "original_address_concat",
        [
            Level("null", "null_any", {"cols": ["original_address_concat"]}, is_null=True),
            Level("exact", "exact", {"col": "original_address_concat"}, m=15, u=1),
            Level("else", "else", m=1, u=2),
        ],
    )
    c_flat = Comparison(
        "flat_positional",
        [
            Level(
                "null",
                "null_all",
                {"cols": ["flat_positional", "flat_letter"]},
                is_null=True,
            ),
            Level("pos exact", "exact", {"col": "flat_positional"}, m=95.00950852025916, u=1),
            Level("letter exact", "exact", {"col": "flat_letter"}, m=95.00950852025916, u=1),
            Level(
                "letter vs numeric cross",
                "cross_equal",
                {"col_a": "flat_letter", "col_b": "numeric_token_1"},
                m=1,
                u=1,
            ),
            Level("presence mismatch", "flat_presence_mismatch", m=1, u=1),
            Level("else", "else", m=0.03125, u=1),
        ],
    )
    c_n1 = Comparison(
        "numeric_token_1",
        [
            Level("null", "null_any", {"cols": ["numeric_token_1"]}, is_null=True),
            Level(
                "exact",
                "exact",
                {"col": "numeric_token_1"},
                m=95.00950852025916,
                u=1,
                tf_col="numeric_token_1",
                tf_weight=0.1,
            ),
            Level(
                "digits equal",
                "digits_equal",
                {"col": "numeric_token_1"},
                m=95.00950852025916,
                u=1,
                tf_col="numeric_token_1",
                tf_weight=0.1,
            ),
            Level(
                "inverted",
                "cross_equal",
                {"col_a": "numeric_token_2", "col_b": "numeric_token_1"},
                m=4,
                u=1,
            ),
            Level("one null", "null_any_level", {"cols": ["numeric_token_1"]}, m=0.0625, u=1),
            Level("else", "else", m=0.00390625, u=1),
        ],
    )
    c_n2 = Comparison(
        "numeric_token_2",
        [
            Level("null", "null_all", {"cols": ["numeric_token_2"]}, is_null=True),
            Level(
                "exact",
                "exact",
                {"col": "numeric_token_2"},
                m=95.00950852025916,
                u=1,
                tf_col="numeric_token_2",
                tf_weight=0.1,
            ),
            Level(
                "inverted",
                "cross_equal",
                {"col_a": "numeric_token_1", "col_b": "numeric_token_2"},
                m=1,
                u=1,
            ),
            Level("one null", "null_any_level", {"cols": ["numeric_token_2"]}, m=0.25, u=1),
            Level("else", "else", m=0.0625, u=1),
        ],
    )
    c_n3 = Comparison(
        "numeric_token_3",
        [
            Level("null", "null_all", {"cols": ["numeric_token_3"]}, is_null=True),
            Level(
                "exact",
                "exact",
                {"col": "numeric_token_3"},
                m=0.6,
                u=0.0001,
                tf_col="numeric_token_3",
                tf_weight=0.5,
            ),
            Level(
                "2l=3r",
                "pair_equal",
                {"col_l": "numeric_token_2", "col_r": "numeric_token_3"},
                m=0.3,
                u=0.0025,
                tf_col="numeric_token_3",
                tf_weight=0.5,
            ),
            Level("one null", "null_any_level", {"cols": ["numeric_token_3"]}, m=1, u=16),
            Level("else", "else", m=1, u=256),
        ],
    )
    c_hist = Comparison(
        "token_rel_freq_arr_hist",
        hist_band_levels("token_rel_freq_arr_hist", _default_hist_bands(), 1, 256),
    )
    c_end = Comparison(
        "common_end_tokens",
        [
            Level("null", "null_any", {"cols": ["common_end_tokens_hist"]}, is_null=True),
            Level(
                "<1e-2",
                "hist_product_lt",
                {"col": "common_end_tokens_hist", "threshold": 1e-2},
                m=4,
                u=1,
            ),
            Level("else", "else", m=1, u=1.5),
        ],
    )
    c_pc = Comparison(
        "postcode",
        [
            Level("null", "null_all", {"cols": ["postcode"]}, is_null=True),
            Level("exact", "exact", {"col": "postcode"}, m=3000000.0, u=1),
            Level("lev<=1", "lev_leq", {"col": "postcode", "k": 1}, m=10000, u=1),
            Level("lev<=2", "lev_leq", {"col": "postcode", "k": 2}, m=5000, u=1),
            Level("district", "split_part_equal", {"col": "postcode", "part": 1}, m=3000, u=1),
            Level("unit", "split_part_equal", {"col": "postcode", "part": 2}, m=2000, u=1),
            Level("else", "else", m=1, u=64),
        ],
    )
    return FSModel(
        prior=PRIOR_DEFAULT,
        comparisons=[c_addr, c_flat, c_n1, c_n2, c_n3, c_hist, c_end, c_pc],
        blocking_rules=blocking_rules if blocking_rules is not None else default_blocking_rules(),
    )


def default_blocking_rules() -> list[str]:
    """The 18 blocking rules of splink_model.json:16-89, as rule strings in
    the reference dialect (parsed by stages/blocking.py)."""
    u1 = "list_extract(l.unusual_tokens_arr, 1) = list_extract(r.unusual_tokens_arr, 1)"
    u2 = "list_extract(l.unusual_tokens_arr, 2) = list_extract(r.unusual_tokens_arr, 2)"
    u12 = "list_extract(l.unusual_tokens_arr, 1) = list_extract(r.unusual_tokens_arr, 2)"
    u21 = "list_extract(l.unusual_tokens_arr, 2) = list_extract(r.unusual_tokens_arr, 1)"
    out = "split_part(l.postcode, ' ', 1) = split_part(r.postcode, ' ', 1)"
    inw = "split_part(l.postcode, ' ', 2) = split_part(r.postcode, ' ', 2)"
    n11 = "l.numeric_token_1 = r.numeric_token_1"
    n12 = "l.numeric_token_1 = r.numeric_token_2"
    n22 = "l.numeric_token_2 = r.numeric_token_2"
    pc = "l.postcode = r.postcode"
    v11 = "list_extract(l.very_unusual_tokens_arr, 1) = list_extract(r.very_unusual_tokens_arr, 1)"
    v12 = "list_extract(l.very_unusual_tokens_arr, 1) = list_extract(r.very_unusual_tokens_arr, 2)"
    e11 = "list_extract(l.extremely_unusual_tokens_arr, 1) = list_extract(r.extremely_unusual_tokens_arr, 1)"
    return [
        f"{n11} and {u1} and {u2} and {out}",
        f"{n12} and {u1} and {out}",
        f"{n12} and {u1} and {inw}",
        f"{n11} and {u12} and {u21} and {out}",
        f"{n11} and {u12} and {inw}",
        f"{n11} and {pc}",
        f"{n12} and {pc}",
        f"{u12} and {pc}",
        f"{v11} and {n11}",
        f"{v12} and {n11}",
        f"{n22} and {u1} and {out}",
        f"{n11} and {u1} and {inw}",
        f"{n22} and {u1} and {inw}",
        f"{n22} and {pc}",
        f"{n11} and {n22} and {out}",
        f"{n11} and {n22} and {inw}",
        f"{e11} and {out}",
        pc,
    ]


# ---------------------------------------------------------------------------
# the source-code-domain model
# ---------------------------------------------------------------------------


def code_model(blocking_rules: list[str] | None = None) -> FSModel:
    """Fellegi-Sunter model for the source-code-file domain.

    Same comparison architecture as the address model (ordered levels, log2
    Bayes factors, TF adjustments, histogram-product bands) but re-weighted
    for code: path identity (lang+stem "postcode", version-number "numeric
    tokens") is weak evidence — many unrelated files share a basename — while
    content-fingerprint overlap (``fp_tokens``: minhash of file lines) is the
    dominant signal.  Weights chosen so an unrelated same-basename pair lands
    well below 0 and a true near-duplicate lands above +15.
    """
    addr = default_address_model()
    by_name = {c.name: c for c in addr.comparisons}

    pc_levels = [
        Level("null", "null_all", {"cols": ["postcode"]}, is_null=True),
        Level("exact", "exact", {"col": "postcode"}, m=300, u=1),
        Level("lev<=1", "lev_leq", {"col": "postcode", "k": 1}, m=100, u=1),
        Level("lev<=2", "lev_leq", {"col": "postcode", "k": 2}, m=30, u=1),
        Level("lang", "split_part_equal", {"col": "postcode", "part": 1}, m=4, u=1),
        Level("stem", "split_part_equal", {"col": "postcode", "part": 2}, m=30, u=1),
        Level("else", "else", m=1, u=8),
    ]
    n1_levels = [
        Level("null", "null_any", {"cols": ["numeric_token_1"]}, is_null=True),
        Level("exact", "exact", {"col": "numeric_token_1"}, m=30, u=1,
              tf_col="numeric_token_1", tf_weight=0.1),
        Level("digits", "digits_equal", {"col": "numeric_token_1"}, m=30, u=1,
              tf_col="numeric_token_1", tf_weight=0.1),
        Level("inverted", "cross_equal",
              {"col_a": "numeric_token_2", "col_b": "numeric_token_1"}, m=4, u=1),
        Level("one null", "null_any_level", {"cols": ["numeric_token_1"]}, m=1, u=4),
        Level("else", "else", m=1, u=4),
    ]
    n2_levels = [
        Level("null", "null_all", {"cols": ["numeric_token_2"]}, is_null=True),
        Level("exact", "exact", {"col": "numeric_token_2"}, m=8, u=1,
              tf_col="numeric_token_2", tf_weight=0.1),
        Level("inverted", "cross_equal",
              {"col_a": "numeric_token_1", "col_b": "numeric_token_2"}, m=2, u=1),
        Level("one null", "null_any_level", {"cols": ["numeric_token_2"]}, m=1, u=2),
        Level("else", "else", m=1, u=2),
    ]
    fp_levels = [
        Level("null", "null_or_empty_list", {"cols": ["fp_tokens"]}, is_null=True),
        # sharing >=4 of the 6 smallest line-hashes means the files share >=4
        # identical lines drawn from the same uniform sample — a near-certain
        # duplicate on its own (the fingerprint is the dominant signal now
        # that fp tokens no longer ride the identity-text histogram):
        # 2^35 clears prior (-20 bits) + edge threshold (+10) with margin.
        Level(">=4 shared", "overlap_geq", {"col": "fp_tokens", "k": 4},
              m=2 ** 35, u=1),
        Level(">=2 shared", "overlap_geq", {"col": "fp_tokens", "k": 2},
              m=2 ** 22, u=1),
        Level(">=1 shared", "overlap_geq", {"col": "fp_tokens", "k": 1},
              m=2 ** 11, u=1),
        Level("none shared", "else", m=1, u=128),
    ]
    comparisons = [
        by_name["original_address_concat"],
        Comparison("numeric_token_1", n1_levels),
        Comparison("numeric_token_2", n2_levels),
        by_name["token_rel_freq_arr_hist"],
        by_name["common_end_tokens"],
        Comparison("postcode", pc_levels),
        Comparison("fp_tokens", fp_levels),
    ]
    return FSModel(
        prior=1e-6,
        comparisons=comparisons,
        blocking_rules=blocking_rules if blocking_rules is not None else [],
    )


# ---------------------------------------------------------------------------
# reference-format JSON loader
# ---------------------------------------------------------------------------

_RE_EXACT = re.compile(r'^"?(\w+)_l"?\s*=\s*"?(\w+)_r"?$')
_RE_LEV = re.compile(r"^levenshtein\((\w+)_l,\s*(\w+)_r\)\s*<=\s*(\d+)$")
_RE_SPLIT = re.compile(
    r"^split_part\((\w+)_l,\s*' ',\s*(\d)\)\s*=\s*split_part\((\w+)_r,\s*' ',\s*\2\)$"
)
_RE_HIST_THRESHOLD = re.compile(r"<\s*([0-9.]+e-?\d+|1e-?\d+)\s*$", re.I)
_RE_NULL_COLS = re.compile(r'"?(\w+?)_(?:l|r)"?\s+IS\s+NULL', re.I)
_RE_DIGITS_EQ = re.compile(r"regexp_extract\((\w+)_l", re.I)


def first_n_tokens_comparison(
    *,
    col: str = "original_address_concat",
    postcode_col: str = "postcode",
    weight_1: float = 1.0,
    weight_2: float = 0.5,
    weight_3: float = 0.0,
    weight_4: float = 0.0,
    weight_5: float = -0.2,
) -> Comparison:
    """Optional first-N-tokens prefix comparison — the reference's
    ``get_first_n_tokens_comparison`` (training.py:19-91): levels fire when
    the first 4/3/2/1 whitespace tokens of ``col`` match on both sides AND
    the postcodes match; m = 2^weight, u = 1 (the reference's
    ``match_weight_to_bayes_factor`` with fixed u).  Not part of the
    shipped default model (the reference defines but does not ship it) —
    append to ``FSModel.comparisons`` to enable."""
    levels = [
        Level(
            label=f"First {n} tokens match",
            kind="first_n_tokens_equal",
            params={"col": col, "n": n, "postcode_col": postcode_col},
            m=2.0**w,
            u=1.0,
        )
        for n, w in ((4, weight_1), (3, weight_2), (2, weight_3), (1, weight_4))
    ]
    levels.append(Level(label="else", kind="else", m=2.0**weight_5, u=1.0))
    return Comparison(name="first_n_tokens", levels=levels)


#: the reference's token-prefix regex inside a model-json sql_condition
_RE_FIRST_N = re.compile(
    r"regexp_extract\((\w+)_l, '\^\(\?:\\S\+\\s\+\)\{(\d+)\}\\S\+'\)"
)


def _classify_sql_condition(cond: str, comparison_name: str) -> tuple[str, dict]:
    c = " ".join(cond.split())
    if c == "ELSE":
        return "else", {}
    m = _RE_EXACT.match(c)
    if m and m.group(1) == m.group(2):
        return "exact", {"col": m.group(1)}
    if m:  # a_l = b_r single-direction
        return "pair_equal", {"col_l": m.group(1), "col_r": m.group(2)}
    m = _RE_LEV.match(c)
    if m:
        return "lev_leq", {"col": m.group(1), "k": int(m.group(3))}
    m = _RE_SPLIT.match(c)
    if m:
        return "split_part_equal", {"col": m.group(1), "part": int(m.group(2))}
    if "regexp_extract(" in c and "postcode_l = postcode_r" in c:
        m = _RE_FIRST_N.search(c)
        if m:  # first 2..4 tokens (training.py:27-30)
            return "first_n_tokens_equal", {
                "col": m.group(1),
                "n": int(m.group(2)) + 1,
                "postcode_col": "postcode",
            }
        m = re.search(r"regexp_extract\((\w+)_l, '\^\\S\+'\)", c)
        if m:  # single-token pattern '^\S+'
            return "first_n_tokens_equal", {
                "col": m.group(1),
                "n": 1,
                "postcode_col": "postcode",
            }
    if "list_reduce" in c and "POW(" in c:
        m = _RE_HIST_THRESHOLD.search(c)
        col = re.search(r"map_entries\((\w+)_l\)", c)
        if m and col:
            return "hist_product_lt", {
                "col": col.group(1),
                "threshold": float(m.group(1)),
            }
    if "nullif(regexp_extract(" in c.lower():
        m = _RE_DIGITS_EQ.search(c)
        if m:
            return "digits_equal", {"col": m.group(1)}
    # cross equality: a_l = b_r or b_l = a_r  /  a_l = b_r OR a_r = b_l
    m = re.match(r"^(\w+)_l = (\w+)_r (?:or|OR) (\w+)_(?:l|r) = (\w+)_(?:r|l)$", c)
    if m:
        cols = {m.group(1), m.group(2), m.group(3), m.group(4)}
        if len(cols) == 2:
            a, b = sorted(cols)
            return "cross_equal", {"col_a": b, "col_b": a}
    if "IS NOT NULL" in c and "flat" in c:
        return "flat_presence_mismatch", {}
    if "IS NULL" in c.upper():
        cols = sorted(set(_RE_NULL_COLS.findall(c)))
        joiner = "null_all" if re.search(r"\bAND\b", c, re.I) else "null_any"
        return joiner, {"cols": cols}
    raise ValueError(
        f"cannot classify comparison level for {comparison_name!r}: {cond[:120]}"
    )


def load_model_json(path_or_dict) -> FSModel:
    """Load a model in the reference's splink_model.json schema."""
    if isinstance(path_or_dict, (str, bytes)):
        with open(path_or_dict) as f:
            spec = json.load(f)
    else:
        spec = path_or_dict
    comparisons = []
    for comp in spec["comparisons"]:
        name = comp["output_column_name"]
        levels = []
        for lv in comp["comparison_levels"]:
            kind, params = _classify_sql_condition(lv["sql_condition"], name)
            is_null = bool(lv.get("is_null_level"))
            if is_null and kind in ("null_any", "null_all"):
                pass
            levels.append(
                Level(
                    label=lv.get("label_for_charts", kind),
                    kind=kind,
                    params=params,
                    m=float(lv.get("m_probability", 1.0)),
                    u=float(lv.get("u_probability", 1.0)),
                    is_null=is_null,
                    tf_col=lv.get("tf_adjustment_column"),
                    tf_weight=float(lv.get("tf_adjustment_weight", 1.0)),
                )
            )
        comparisons.append(Comparison(name, levels))
    rules = [
        r["blocking_rule"] if isinstance(r, dict) else r
        for r in spec.get("blocking_rules_to_generate_predictions", [])
    ]
    return FSModel(
        prior=float(spec.get("probability_two_random_records_match", PRIOR_DEFAULT)),
        comparisons=comparisons,
        blocking_rules=rules,
    )
