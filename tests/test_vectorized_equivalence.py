"""Vectorised stages vs straightforward per-row reference implementations:
language-ID and hot-key counting (the two stages whose Python-loop forms
were replaced by Arrow/numpy kernels)."""

import re

import numpy as np
import pyarrow as pa

from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
    KEY_SEP,
    parse_blocking_rule,
)
from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
    _STOPWORDS,
    LanguageId,
)


def _lang_id_rowwise(text: str) -> tuple[str, float]:
    """The per-row heuristic the vectorised stage replaced, kept as the
    test oracle: CJK codepoint share decides 'zh'; otherwise the language
    with the most stopword hits wins (first-declared wins ties)."""
    text = text or ""
    n_chars = max(1, len(text))
    cjk = len(re.findall(r"[一-鿿]", text))
    if cjk / n_chars > 0.05:
        return "zh", cjk / n_chars
    toks = re.findall(r"[a-zA-Z]+", text.lower())
    if not toks:
        return "und", 0.0
    tables = {k: v for k, v in _STOPWORDS.items() if v}
    hits = {lang: sum(t in stop for t in toks) for lang, stop in tables.items()}
    best = max(tables, key=lambda lang: hits[lang])
    if hits[best] == 0:
        return "und", 0.0
    return best, hits[best] / len(toks)


ADVERSARIAL = [
    None,
    "",
    "   ",
    "!!! ??? ...",
    "the cat sat on the mat and it is that",
    "el perro y el gato en la casa",
    "der hund ist nicht mit den katzen",
    "le chat est pour la maison et les chiens",
    "你好世界 你好世界 你好世界",
    "hello 你 world",  # 1 CJK char in 13 -> under the 0.05... boundary case
    "a 你",  # 1/3 CJK -> zh
    "the el der le",  # one stopword hit per language -> tie, first wins
    "THE AND OF TO",  # uppercase stopwords
    "x" * 500,
    "the " * 200 + "el " * 199,
]


def test_language_id_matches_rowwise_reference():
    t = pa.table({"text": pa.array(ADVERSARIAL, pa.string())})
    out = LanguageId()(t)
    preds = out["lang_pred"].to_pylist()
    scores = out["lang_score"].to_pylist()
    for text, p, s in zip(ADVERSARIAL, preds, scores):
        wp, ws = _lang_id_rowwise(text)
        assert p == wp, (text, p, wp)
        assert abs(s - ws) < 1e-12, (text, s, ws)


def test_language_id_randomized_against_reference():
    rng = np.random.default_rng(5)
    words = ["the", "el", "der", "le", "zzz", "qqq", "la", "de", "und", "是"]
    texts = []
    for _ in range(300):
        k = int(rng.integers(0, 12))
        texts.append(" ".join(words[int(rng.integers(0, len(words)))] for _ in range(k)))
    t = pa.table({"text": pa.array(texts, pa.string())})
    out = LanguageId()(t)
    for text, p, s in zip(
        texts, out["lang_pred"].to_pylist(), out["lang_score"].to_pylist()
    ):
        wp, ws = _lang_id_rowwise(text)
        assert p == wp and abs(s - ws) < 1e-12, (text, p, wp, s, ws)


def test_hot_key_partial_counts_match_bruteforce(ray_session):
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.stages.blocking import (
        detect_hot_keys,
    )

    rng = np.random.default_rng(11)
    n = 4000
    keys = [f"K{int(rng.integers(0, 5))}" for _ in range(n)]
    keys[:2000] = ["HOT"] * 2000  # one key above threshold
    rows = {
        "ukam_address_id": [f"id{i}" for i in range(n)],
        "numeric_token_1": keys,
    }
    ds = rd.from_arrow(pa.table(rows))
    rule = parse_blocking_rule("l.numeric_token_1 = r.numeric_token_1")
    hot = detect_hot_keys(
        ds, ds, [rule], hot_key_threshold=1000, salt_rows=500
    )
    # exact counting path (threshold < 3200 -> no sampling): HOT = 2000 rows
    assert (0, "HOT") in hot
    assert hot[(0, "HOT")] == 4  # ceil(2000 / 500)
    assert all(k == (0, "HOT") for k in hot)
    assert KEY_SEP not in "HOT"


def _features_rowwise(repo, path, commit, lang, content):
    """Per-row reference for derive_code_features' identity fields (the
    Python-loop form the vectorised kernel replaced)."""
    import re as _re

    split_path = _re.compile(r"[/._\-]+")
    stem_strip = _re.compile(r"[^A-Z0-9]")
    segs = [s for s in split_path.split(path or "") if s]
    rsegs = [s for s in split_path.split(repo or "") if s]
    addr = " ".join(segs + rsegs).upper()
    basename = (path or "").rsplit("/", 1)[-1]
    base_stem = basename.split(".", 1)[0]
    stem = stem_strip.sub("", base_stem.upper())[:12] or "X"
    pcd = f"{(lang or 'UNK').upper()} {stem}"
    sb = max(1, len(content or "")).bit_length()
    return {
        "unique_id": f"{repo}::{path}@{commit}",
        "address_concat": addr,
        "postcode": pcd,
        "pc_sb": f"{pcd}|{sb}",
        "pc_sb_up": f"{pcd}|{sb + 1}",
    }


def test_derive_code_features_vectorized_equivalence():
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        _content_fingerprint,
        derive_code_features,
    )

    rows = [
        ("org/repo-a", "src/parser_v2.py", "abc123", "py", "x = 1\ny = 2\n"),
        ("org/repo-a", "/lead/.hidden.tar.gz", "def", "", ""),
        ("r", "", "c", None, "same\nsame\n  \nother"),
        ("weird.repo_name-x", "a//b__c..d", "zz", "RS", "one line"),
        ("o", "noext", "h", "go", "\n\n\n"),
        ("o", "dir.with.dots/file", "h2", "go", "a\n" * 300 + "unique tail"),
    ]
    t = pa.table(
        {
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array([r[2] for r in rows]),
            "lang": pa.array([r[3] for r in rows]),
            "content": pa.array([r[4] for r in rows]),
        }
    )
    out = derive_code_features(t)
    for i, (repo, path, commit, lang, content) in enumerate(rows):
        exp = _features_rowwise(repo, path, commit, lang, content)
        for col, want in exp.items():
            got = out[col][i].as_py()
            assert got == want, (col, i, got, want)
        fp = _content_fingerprint(content)
        assert out["fp_tokens"][i].as_py() == fp, (i, fp)
        assert out["fp_1"][i].as_py() == (fp[0] if len(fp) > 0 else None)
        assert out["fp_2"][i].as_py() == (fp[1] if len(fp) > 1 else None)
        import hashlib

        want_sha = hashlib.sha256(content.encode()).hexdigest()
        assert out["content_sha256"][i].as_py() == want_sha
        assert out["sha_prefix"][i].as_py() == want_sha[:8]


def test_fingerprint_nearly_identical_content_shares_tokens():
    from moj_analytical_services_uk_address_matcher_ray.pipelines.code_linkage import (
        _content_fingerprint,
    )

    base = "\n".join(f"line number {i} of the file" for i in range(40))
    edited = base.replace("line number 17", "LINE NUMBER 17")
    a, b = _content_fingerprint(base), _content_fingerprint(edited)
    assert len(a) == 6 and len(b) == 6
    assert len(set(a) & set(b)) >= 4  # near-dup shares most fp tokens
    assert _content_fingerprint("") == []
    assert _content_fingerprint(None) == []


def test_levenshtein_batch_matches_scalar():
    from moj_analytical_services_uk_address_matcher_ray.stages.scoring import (
        levenshtein_leq,
        levenshtein_leq_batch,
    )

    rng = np.random.default_rng(99)
    vocab = ["", "A", "AB", "ABC", "PY PARSER", "PY PARSER2", "JS PARSERX",
             "JS PARSER", "N12 34X", "N12 35X", "N1 34X", "ÜNICODE", "ÜNICODX",
             None, "LONGSTEMNAME12", "LONGSTEMNAME21", "LONGSTEMNAME123456"]
    al = [vocab[i] for i in rng.integers(0, len(vocab), 400)]
    ar = [vocab[i] for i in rng.integers(0, len(vocab), 400)]
    for k in (0, 1, 2, 3):
        got = levenshtein_leq_batch(al, ar, k)
        for i, (x, y) in enumerate(zip(al, ar)):
            want = (
                x is not None and y is not None and levenshtein_leq(x, y, k)
            )
            assert bool(got[i]) == want, (x, y, k, got[i], want)
