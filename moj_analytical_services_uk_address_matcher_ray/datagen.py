"""Deterministic synthetic source-code corpus with planted duplicate clusters.

Generates the BASELINE.json input table ``(repo, path, commit, lang,
content)`` plus a labels table ``(unique_id, cluster_id)`` — the ground
truth for the pairwise-F1 gate.  Seeded and purely functional: the same
(seed, n_clusters) always yields byte-identical tables.

Cluster construction mirrors how duplicate source files appear in the wild:
  * exact copies (identical content vendored into another repo/commit);
  * near-duplicates (a few lines edited, version token bumped in the path);
  * renamed copies (same content, new directory).
Skew knobs: one hot language and one very common basename so blocking-key
salting and TF down-weighting are actually exercised (FIXTURES.md §1).
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass

import pyarrow as pa

LANGS = ["py", "js", "go", "rs", "java"]
LANG_WEIGHTS = [3, 6, 1, 1, 2]  # "js" is the hot language

_DIR_VOCAB = [
    "src", "lib", "core", "utils", "pkg", "internal", "api", "cmd",
    "services", "handlers", "models", "views", "common", "engine",
    "parser", "runtime", "net", "io", "db", "auth",
]
_STEM_VOCAB = [
    "parser", "lexer", "scheduler", "router", "client", "server", "codec",
    "cache", "buffer", "pool", "queue", "stack", "graph", "matrix",
    "tokenizer", "allocator", "compactor", "planner", "executor", "loader",
    "resolver", "mapper", "reducer", "splitter", "merger", "walker",
]
_CODE_VOCAB = [
    "def", "return", "class", "self", "import", "from", "for", "while",
    "if", "else", "try", "except", "raise", "yield", "lambda", "assert",
    "value", "result", "index", "count", "total", "buffer", "stream",
    "token", "node", "edge", "queue", "stack", "key", "item", "data",
    "parse", "emit", "flush", "read", "write", "open", "close", "init",
]
_HOT_BASENAME_SHARE = 0.12  # fraction of clusters using the hot basename "index"


@dataclass
class GenConfig:
    seed: int = 42
    n_clusters: int = 500
    max_cluster_size: int = 5
    n_repos: int = 40
    #: size of the basename-stem vocabulary.  None = the fixed 26-word
    #: vocabulary (legacy corpora).  Real corpora have ~15 rows per
    #: (lang, stem) blocking key (the UK-postcode density the reference's
    #: blocking assumes); pass ~n_rows/75 for reference-shaped benchmarks.
    n_stems: int | None = None
    #: extra singleton clusters appended AFTER the regular ones (same rng
    #: stream for the regular clusters).  Models a canonical universe far
    #: larger than the messy table (gazetteer-style two-table workloads).
    extra_singletons: int = 0


def _content(rng: random.Random, n_lines: int) -> str:
    lines = []
    for _ in range(n_lines):
        k = rng.randint(3, 9)
        lines.append(" ".join(rng.choice(_CODE_VOCAB) for _ in range(k)))
    return "\n".join(lines)


def _mutate_content(rng: random.Random, content: str, n_edits: int) -> str:
    lines = content.split("\n")
    for _ in range(n_edits):
        i = rng.randrange(len(lines))
        k = rng.randint(3, 9)
        lines[i] = " ".join(rng.choice(_CODE_VOCAB) for _ in range(k))
    return "\n".join(lines)


def _commit(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789abcdef") for _ in range(12))


def generate_corpus(cfg: GenConfig = GenConfig()) -> tuple[pa.Table, pa.Table]:
    """Return (files_table, labels_table).

    files: repo, path, commit, lang, content
    labels: unique_id (repo::path@commit), cluster_id
    """
    rng = random.Random(cfg.seed)
    repos = [
        f"org{rng.randint(0, 9)}/{rng.choice(_STEM_VOCAB)}{i}"
        for i in range(cfg.n_repos)
    ]
    if cfg.n_stems is None:
        stem_vocab = _STEM_VOCAB
    else:
        base = len(_STEM_VOCAB)
        stem_vocab = [
            _STEM_VOCAB[i] if i < base else f"{_STEM_VOCAB[i % base]}{i // base}"
            for i in range(max(1, cfg.n_stems))
        ]
    rows: list[dict] = []
    labels: list[dict] = []
    for cid in range(cfg.n_clusters + cfg.extra_singletons):
        lang = rng.choices(LANGS, weights=LANG_WEIGHTS, k=1)[0]
        hot = rng.random() < _HOT_BASENAME_SHARE
        stem = "index" if hot else rng.choice(stem_vocab)
        version = rng.randint(1, 9) if rng.random() < 0.6 else None
        base_stem = f"{stem}_v{version}" if version is not None else stem
        depth = rng.randint(1, 3)
        dirs = [rng.choice(_DIR_VOCAB) for _ in range(depth)]
        base_path = "/".join(dirs + [f"{base_stem}.{lang}"])
        base_repo = rng.choice(repos)
        base_content = _content(rng, rng.randint(8, 40))
        size = 1 if cid >= cfg.n_clusters else rng.randint(1, cfg.max_cluster_size)
        members = [(base_repo, base_path, base_content)]
        for m in range(1, size):
            kind = rng.random()
            repo = rng.choice(repos)
            if kind < 0.4:  # exact copy, new repo/commit
                members.append((repo, base_path, base_content))
            elif kind < 0.75:  # near-dup: edit a few lines, maybe bump version
                content = _mutate_content(rng, base_content, rng.randint(1, 3))
                if version is not None and rng.random() < 0.5:
                    path = base_path.replace(f"_v{version}.", f"_v{version + 1}.")
                else:
                    path = base_path
                members.append((repo, path, content))
            else:  # renamed copy: same content, new directory
                new_dirs = [rng.choice(_DIR_VOCAB) for _ in range(rng.randint(1, 3))]
                path = "/".join(new_dirs + [f"{base_stem}.{lang}"])
                members.append((repo, path, base_content))
        for repo, path, content in members:
            commit = _commit(rng)
            rows.append(
                {
                    "repo": repo,
                    "path": path,
                    "commit": commit,
                    "lang": lang,
                    "content": content,
                }
            )
            labels.append(
                {
                    "unique_id": f"{repo}::{path}@{commit}",
                    "cluster_id": f"cluster_{cid:06d}",
                }
            )
    files = pa.table(
        {
            "repo": pa.array([r["repo"] for r in rows], pa.string()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "commit": pa.array([r["commit"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "content": pa.array([r["content"] for r in rows], pa.string()),
        }
    )
    labels_t = pa.table(
        {
            "unique_id": pa.array([label["unique_id"] for label in labels], pa.string()),
            "cluster_id": pa.array([label["cluster_id"] for label in labels], pa.string()),
        }
    )
    return files, labels_t


def corpus_sha256(files: pa.Table) -> list[str]:
    return [
        hashlib.sha256(c.encode()).hexdigest() for c in files["content"].to_pylist()
    ]


def write_corpus(
    out_dir: str, cfg: GenConfig = GenConfig(), *, n_parts: int | None = None
) -> tuple[str, str]:
    """Write the corpus as a DIRECTORY of part files: Ray's parquet reader
    assigns at least one read task per file, so a single big file makes the
    initial scan serial (measured: 12-15s single-task read at 180k rows).
    Partitioned output is also the resumable-write story at scale."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    files, labels = generate_corpus(cfg)
    fpath = os.path.join(out_dir, "repo_files.parquet")
    lpath = os.path.join(out_dir, "labels.parquet")
    parts = n_parts or max(16, min(256, files.num_rows // 10_000))
    os.makedirs(fpath, exist_ok=True)
    step = -(-files.num_rows // parts)
    for i in range(parts):
        chunk = files.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(fpath, f"part-{i:04d}.parquet"))
    pq.write_table(labels, lpath)
    return fpath, lpath
