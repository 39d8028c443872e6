"""Flagship pipeline: record linkage over source-code file tables.

Input (BASELINE.json input_hint): Parquet table
``(repo, path, commit, lang, content)``.  The domain transposition
(SURVEY.md §1.4) maps file identity onto the reference's address schema so
the ENTIRE address machinery — cleaning, TF, blocking, FS scoring,
distinguishing-token rescore, clustering — runs unchanged:

  address_concat  <- path tokens (dirs + basename, '/._-' -> ' ') + repo name
  postcode        <- "<LANG> <BASENAME-STEM>" (outward = lang "district",
                     inward = stem "unit"; levenshtein levels then capture
                     stem typos, split_part levels capture same-lang /
                     same-stem partial agreement)
  numeric tokens  <- version/size tokens in the path (v2, 64, 2021)
  unique_id       <- "repo::path@commit"
  content_sha256  <- per-row invariant, preserved end-to-end; the
                     deterministic EXACT stage keys on it (content dedup)

Pipeline (self-dedup / two-corpus linkage):
  read (columns pruned) -> features+sha256 (map_batches; ``content`` dropped
  immediately after hashing so blocks stay narrow) -> clean_dataset ->
  deterministic exact pass on sha256 -> blocking (lang+stem / repo-bigram /
  sha-prefix / postcode-analogue rules) -> FS scoring actor pool -> rescore
  -> edges(mw >= tau) + exact edges -> hash-min connected components ->
  cluster table (node, cluster_id) with sha256 carried through.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..stages import cleaning as C
from ..stages.blocking import generate_candidate_pairs
from ..stages.cluster import connected_components
from ..stages.rescore import improve_predictions_using_distinguishing_tokens
from ..stages.scoring import score_pairs
from ..state.model import FSModel, code_model
from .clean import clean_dataset

_SPLIT_PATH = re.compile(r"[/._\-]+")
_STEM_STRIP = re.compile(r"[^A-Z0-9]")

#: content fingerprint: the K smallest line-hashes (a deterministic minhash
#: sample of the file's distinct lines).  Near-duplicates (a few lines
#: edited) share most fingerprint tokens; unrelated files share none.  The
#: tokens feed a dedicated fp_tokens comparison (code_model fp_levels) and
#: the blocking-key columns fp_1/fp_2 — they are deliberately kept OUT of
#: the identity text so the TF vocabulary stays path-token-sized.
FINGERPRINT_K = 6


def _content_fingerprint(content: str | None, k: int = FINGERPRINT_K) -> list[str]:
    """Reference-semantics scalar form (kept for documentation/tests); the
    pipeline uses the batch-vectorised ``_fingerprint_arrays``."""
    if not content:
        return []
    import numpy as np
    import pandas as pd

    lines = np.array(
        sorted({ln for ln in content.split("\n") if ln.strip()}), dtype=object
    )
    if len(lines) == 0:
        return []
    h = np.sort(pd.util.hash_array(lines, categorize=False))[:k]
    hx = h.astype(">u8").tobytes().hex().upper()
    return ["Q" + hx[i * 16 : (i + 1) * 16] for i in range(len(h))]


def _fingerprint_arrays(contents, n: int, k: int = FINGERPRINT_K):
    """Vectorised line-set min-hash fingerprint for a whole batch: the K
    smallest per-line hashes of each row's distinct non-blank lines.  One
    Arrow split + one C siphash pass over every line in the batch — no
    per-row Python.  Returns (list<string> fp_tokens, fp_1, fp_2)."""
    import numpy as np
    import pandas as pd

    c = pc.coalesce(
        contents.combine_chunks()
        if isinstance(contents, pa.ChunkedArray)
        else contents,
        "",
    )
    lines = pc.split_pattern(c, "\n")
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lines)
    keep = pc.not_equal(pc.utf8_trim_whitespace(flat), "")
    rows = parents[keep.to_numpy(zero_copy_only=False)]
    kept = flat.filter(keep)
    empty_lists = pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, dtype=np.int32), pa.int32()),
        pa.array([], pa.string()),
    )
    if len(kept) == 0:
        nulls = pa.nulls(n, pa.string())
        return empty_lists, nulls, nulls
    h = pd.util.hash_array(
        kept.to_numpy(zero_copy_only=False), categorize=False
    )
    # distinct lines per row, hashes ascending: one lexsort, then first-of-run
    order = np.lexsort((h, rows))
    rs, hs = rows[order], h[order]
    uniq = np.concatenate(([True], (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])))
    rs, hs = rs[uniq], hs[uniq]
    # rank within row (rows are runs; hashes already ascending inside each)
    run_start = np.flatnonzero(np.concatenate(([True], rs[1:] != rs[:-1])))
    run_len = np.diff(np.concatenate((run_start, [len(rs)])))
    rank = np.arange(len(rs)) - np.repeat(run_start, run_len)
    sel = rank < k
    rs, hs = rs[sel], hs[sel]
    # hex tokens "Q" + 16 uppercase hex chars, vectorised via a buffer view
    hexs = hs.astype(">u8").tobytes().hex().upper().encode()
    toks = np.char.add("Q", np.frombuffer(hexs, dtype="S16").astype("U16"))
    counts = np.bincount(rs, minlength=n).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    fp_lists = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), pa.int32()), pa.array(toks, pa.string())
    )
    fp1 = np.full(n, None, dtype=object)
    fp2 = np.full(n, None, dtype=object)
    has1 = counts > 0
    has2 = counts > 1
    fp1[has1] = toks[offsets[:-1][has1]]
    fp2[has2] = toks[offsets[:-1][has2] + 1]
    return fp_lists, pa.array(fp1, pa.string()), pa.array(fp2, pa.string())

#: blocking rules for the code domain — the three key families of the north
#: star (lang + path-suffix token, repo-name bigram, sha256 prefix) plus the
#: full postcode-analogue, expressed in the same rule dialect the reference
#: model uses (so the same parser drives both domains).
CODE_BLOCKING_RULES = [
    # lang+stem (postcode analogue) refined by content-size bucket: the raw
    # lang+stem key grows linearly with corpus size ("index.js" exists in
    # every repo), so at web scale its blocks go quadratic and the per-block
    # cap starts dropping real candidates.  Bucketing by log2(content size)
    # keeps blocks O(corpus / stem / size-range); same-bucket plus BOTH
    # adjacent-bucket directions covers length ratios up to 4x — far beyond
    # what a near-duplicate edit changes.  Both asymmetric directions are
    # required because ordered self-pairs keep only id_l < id_r: a one-
    # direction rule emits each cross-bucket pair in one fixed l/r role and
    # the ordered filter would drop roughly half of them.
    "l.pc_sb = r.pc_sb",
    "l.pc_sb_up = r.pc_sb",
    "l.pc_sb = r.pc_sb_up",
    # same stem, numeric version agreement
    "split_part(l.postcode, ' ', 2) = split_part(r.postcode, ' ', 2) and l.numeric_token_1 = r.numeric_token_1",
    # lang + first unusual path token
    "split_part(l.postcode, ' ', 1) = split_part(r.postcode, ' ', 1) and list_extract(l.unusual_tokens_arr, 1) = list_extract(r.unusual_tokens_arr, 1)",
    # repo-name bigram analogue: very unusual token pair
    "list_extract(l.very_unusual_tokens_arr, 1) = list_extract(r.very_unusual_tokens_arr, 1)",
    # content-hash prefix (near-exact content lands in one block)
    "l.sha_prefix = r.sha_prefix",
    # content fingerprint agreement (near-dup content, path fully renamed)
    "l.fp_1 = r.fp_1",
    "l.fp_2 = r.fp_2",
    "l.fp_1 = r.fp_2",
    "l.fp_2 = r.fp_1",
]


def derive_code_features(t: pa.Table) -> pa.Table:
    """(repo, path, commit, lang, content) -> address-shaped row + sha256.

    Fully vectorised (Arrow kernels + one batched siphash pass for the
    fingerprint): this is the first map stage of the flagship, the one
    stage that touches every content byte, so no per-row Python runs here.
    ``content`` is dropped right after hashing (SURVEY §7.4 "wide rows"):
    only (identity text, sha) travel through the shuffles.
    """
    import numpy as np

    t = C.add_sha256(t, col="content", out="content_sha256")

    def _col(name: str) -> pa.Array:
        arr = t[name]
        return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr

    n = t.num_rows
    repo, path, commit = _col("repo"), _col("path"), _col("commit")
    lang, content, sha = _col("lang"), _col("content"), _col("content_sha256")
    join = pc.binary_join_element_wise

    uid = join(join(repo, path, "::"), commit, "@")
    # identity text: path tokens then repo tokens, '/._-' runs -> spaces
    seg_pat = r"[/._\-]+"
    a = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.coalesce(path, ""), seg_pat, " ")
    )
    b = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.coalesce(repo, ""), seg_pat, " ")
    )
    addr = pc.utf8_upper(pc.utf8_trim_whitespace(join(a, b, " ")))
    # postcode analogue: "<LANG> <BASENAME-STEM>"
    basename = pc.replace_substring_regex(pc.coalesce(path, ""), r"^.*/", "")
    base_stem = pc.replace_substring_regex(basename, r"\..*$", "")
    stem = pc.utf8_slice_codeunits(
        pc.replace_substring_regex(pc.utf8_upper(base_stem), r"[^A-Z0-9]", ""),
        0,
        12,
    )
    stem = pc.if_else(pc.equal(stem, ""), pa.scalar("X"), stem)
    lang_up = pc.utf8_upper(pc.coalesce(lang, "UNK"))
    lang_up = pc.if_else(pc.equal(lang_up, ""), pa.scalar("UNK"), lang_up)
    pcode = join(lang_up, stem, " ")
    # size-bucketed blocking keys: log2 bucket of the content length
    nchars = pc.utf8_length(pc.coalesce(content, "")).to_numpy(
        zero_copy_only=False
    )
    sb = np.frexp(np.maximum(nchars, 1).astype(np.float64))[1]  # bit_length
    lut = np.array([str(i) for i in range(int(sb.max()) + 2)], dtype=object)
    sb_s = pa.array(lut[sb], pa.string())
    sb_up_s = pa.array(lut[sb + 1], pa.string())
    pc_sb = join(pcode, sb_s, "|")
    pc_sb_up = join(pcode, sb_up_s, "|")
    # fp tokens are NOT folded into the identity text: they carry their own
    # dominant comparison (code_model fp_levels) and their own blocking
    # keys, and injecting them into address_concat made them the bulk of
    # the TF vocabulary (6 near-unique tokens per file) — inflating the TF
    # shuffle, the broadcast dict, the per-row histograms and the scoring
    # payload for a redundant signal.
    fps, fp1, fp2 = _fingerprint_arrays(content, n)
    return pa.table(
        {
            "unique_id": uid,
            "address_concat": addr,
            "postcode": pcode,
            "pc_sb": pc_sb,
            "pc_sb_up": pc_sb_up,
            "sha_prefix": pc.utf8_slice_codeunits(sha, 0, 8),
            "fp_1": fp1,
            "fp_2": fp2,
            "fp_tokens": fps,
            "content_sha256": sha,
            "lang": t["lang"],
            "repo": t["repo"],
            "path": t["path"],
            "commit": t["commit"],
        }
    )


#: lean pair payload for the self-dedup flow (blocking keys are derived
#: BEFORE pairs are emitted, so the unusual-token arrays never travel)
DEDUP_CARRY_COLS = [
    "ukam_address_id",
    "unique_id",
    "original_address_concat",
    "postcode",
    "numeric_token_1",
    "numeric_token_2",
    "token_rel_freq_arr_hist",
    "common_end_tokens_hist",
    "fp_tokens",
    "content_sha256",
]

#: columns the scorer + rescorer need on each pair side (full address model)
PAIR_CARRY_COLS = [
    "ukam_address_id",
    "unique_id",
    "original_address_concat",
    "postcode",
    "flat_positional",
    "flat_letter",
    "numeric_token_1",
    "numeric_token_2",
    "numeric_token_3",
    "token_rel_freq_arr_hist",
    "common_end_tokens_hist",
    "unusual_tokens_arr",
    "very_unusual_tokens_arr",
    "extremely_unusual_tokens_arr",
]


def prepare_code_dataset(
    files: "ray.data.Dataset",
    *,
    rel_tok_freq: dict[str, float] | None = None,
    end_tokens: frozenset[str] | None = None,
    tf_concurrency: int | tuple[int, int] | None = None,
    tf_default: float | None = None,
) -> "ray.data.Dataset":
    """features + full cleaning; returns the cleaned, scored-ready table."""
    feats = files.map_batches(derive_code_features, batch_format="pyarrow")
    return clean_dataset(
        feats,
        rel_tok_freq=rel_tok_freq,
        end_tokens=end_tokens,
        tf_concurrency=tf_concurrency,
        tf_default=tf_default,
    )


def dedup_code_corpus(
    files: "ray.data.Dataset",
    *,
    model: FSModel | None = None,
    score_threshold: float = -20.0,
    edge_threshold: float = 10.0,
    max_pairs_per_block: int = 50_000,
    hot_key_threshold: int | None = 50_000,
    scorer_concurrency: int | tuple[int, int] = 4,
    use_rescore: bool = False,
    num_partitions: int = 32,
    broadcast_clusters_threshold: int = 2_000_000,
    checkpoint_dir: str | None = None,
) -> "ray.data.Dataset":
    """Self-dedup the corpus into entity clusters.

    Returns Dataset (unique_id, content_sha256, cluster_id).

    ``checkpoint_dir``: when set, the two expensive phases (cleaning, the
    blocked+scored pair stream) persist to partitioned Parquet with lineage
    + metrics sidecars; a restarted run resumes after the last complete
    phase (state/checkpoint.py — north-rule resumability).
    """
    import time

    from ..state.checkpoint import checkpoint_stage
    from ..state.metrics import inc_metric

    model = model or code_model(blocking_rules=list(CODE_BLOCKING_RULES))
    _t = time.perf_counter()
    if checkpoint_dir:
        cleaned = checkpoint_stage(
            lambda d: prepare_code_dataset(d),
            files,
            f"{checkpoint_dir}/01_cleaned",
            stage_name="cleaned",
        )
    else:
        cleaned = prepare_code_dataset(files).materialize()
    inc_metric("phase.clean_sec", time.perf_counter() - _t)
    _t = time.perf_counter()

    # Coalesce the cleaned table to ~one block per CPU (or 64MB, whichever
    # gives more blocks).  Ray's auto read parallelism leaves small corpora
    # in hundreds of sub-MB blocks, and every sort-based groupby downstream
    # spawns ONE REDUCE TASK PER INPUT BLOCK — at 294 blocks the flagship's
    # two bucketed shuffles ran 588 reduce tasks each, whose per-task fixed
    # cost (~0.1-0.3s) exceeded their UDF time by 10-100x (measured: 84.5s
    # wall for 1.2s of exact-match UDF).  At 10^12-row scale blocks are
    # naturally >=64MB and this is a no-op.
    from ..stages.bucketing import coalesce_blocks

    cleaned = cleaned.materialize()  # no-op unless resuming from checkpoint
    cleaned = coalesce_blocks(cleaned)
    inc_metric("phase.coalesce_sec", time.perf_counter() - _t)
    _t = time.perf_counter()

    # 1. deterministic pass: exact content-hash dedup edges (J2 on sha256)
    #    via the specialised self-dedup operator — one direct hash exchange
    #    over a (sha, id) projection with an all-Arrow group-min per bucket
    #    (the general two-sided equi-join it replaces keyed the same table
    #    twice through a sort shuffle + per-bucket pandas merges; measured
    #    1.4s -> ~0.3s at the driver bench shape).  The direct exchange
    #    executes EAGERLY here (raw tasks), so this IS the exact phase.
    from ..stages.exact import exact_dedup_edges

    exact_edges = exact_dedup_edges(
        cleaned, key_col="content_sha256", id_col="ukam_address_id"
    )
    inc_metric("phase.exact_sec", time.perf_counter() - _t)
    _t = time.perf_counter()

    # 2. probabilistic pass: fused blocked pair generation + scoring (narrow
    #    pair shuffles; the wide pair table never hits the object store).
    #    Without the rescore pass only edge candidates are needed, so the
    #    fused threshold IS the edge threshold — everything below is pruned
    #    inside the scoring task.
    from ..stages.blocking import generate_and_score_pairs, prepare_scoring_warmup

    from ..stages.rescore import RESCORE_NARROW_EMIT_COLS

    fused_threshold = score_threshold if use_rescore else edge_threshold - 1e-9
    # both modes emit NARROW pairs: the rescore path re-gathers its address
    # /histogram payload from the broadcast feature store inside the
    # rescore bucket tasks (improve_predictions store_l_ref form), so the
    # scored stream and the cross-rule dedup exchange stay 3 columns wide
    emit = (
        RESCORE_NARROW_EMIT_COLS
        if use_rescore
        else ["ukam_address_id_l", "ukam_address_id_r", "match_weight"]
    )
    warmup = (
        prepare_scoring_warmup(
            cleaned,
            model,
            carry_cols=DEDUP_CARRY_COLS,
            threshold_match_weight=fused_threshold,
            emit_cols=emit,
        )
        if use_rescore  # the rescore stage needs the store ref anyway
        else None
    )

    def _block_and_score(c: "ray.data.Dataset") -> "ray.data.Dataset":
        return generate_and_score_pairs(
            c,
            c,
            model,
            carry_cols=DEDUP_CARRY_COLS,
            threshold_match_weight=fused_threshold,
            emit_cols=emit,
            max_pairs_per_block=max_pairs_per_block,
            hot_key_threshold=hot_key_threshold,
            ordered_self_pairs=True,
            # no dedup barrier on EITHER path: CC dedups edges itself, and
            # the narrow-emit rescore stream's cross-rule duplicates are
            # byte-identical rows that improve_predictions' store-gather
            # form collapses inside its own partial/bucket stages
            dedupe_output=False,
            warmup=warmup,
        )

    if checkpoint_dir and not use_rescore:  # flat emit schema -> parquet-safe
        scored = checkpoint_stage(
            _block_and_score,
            cleaned,
            f"{checkpoint_dir}/02_scored_pairs",
            stage_name="scored_pairs",
        )
    else:
        scored = _block_and_score(cleaned)
    if use_rescore:
        scored = improve_predictions_using_distinguishing_tokens(
            scored,
            match_weight_threshold=score_threshold,
            store_l_ref=warmup["store_l_ref"],
        )
    def _edges(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.greater_equal(t["match_weight"], edge_threshold))
        return pa.table(
            {"src": kept["ukam_address_id_l"], "dst": kept["ukam_address_id_r"]}
        )

    # Materialise the probabilistic edges as their own phase: the streaming
    # executor divides CPU among every runnable operator of one DAG, and in
    # the combined exact||score||CC graph the heavyweight fused scorer was
    # throttled to ~2 of 8 slots (measured 173s vs 78s standalone).  The
    # edge list is tiny (ids + nothing), so the materialisation is free.
    edges = scored.map_batches(_edges, batch_format="pyarrow").materialize()
    inc_metric("phase.score_sec", time.perf_counter() - _t)
    _t = time.perf_counter()

    # 3. transitive closure over exact + probabilistic edges
    nodes = cleaned.map_batches(
        lambda t: pa.table({"node": t["ukam_address_id"]}), batch_format="pyarrow"
    )
    comps = connected_components(
        exact_edges.union(edges), nodes=nodes, num_partitions=num_partitions
    )

    # 4. map surrogate ids back to (unique_id, sha256)
    id_map = cleaned.map_batches(
        lambda t: pa.table(
            {
                "node": t["ukam_address_id"],
                "unique_id": t["unique_id"],
                "content_sha256": t["content_sha256"],
            }
        ),
        batch_format="pyarrow",
    )
    comps = comps.materialize()
    inc_metric("phase.cc_sec", time.perf_counter() - _t)
    _t = time.perf_counter()
    if comps.count() <= broadcast_clusters_threshold:
        # broadcast fast path: both lookups are BROADCAST HASH JOINS (the
        # right sides ride plasma once as Arrow; per-batch merges are
        # dictionary-encoded C joins).  The previous driver-built Python
        # dicts (~180k string entries each) cost several seconds of serial
        # driver time per run — a constant Amdahl term at every level.
        from ..stages.joins import inner_join

        out = inner_join(id_map, comps, on="node", broadcast=True).materialize()
        inc_metric("phase.join_sec", time.perf_counter() - _t)
        _t = time.perf_counter()

        def partial_min(t: pa.Table) -> pa.Table:
            # min-string per group WITHOUT groupby().min(): on object dtype
            # with ~10^5 groups that aggregate is a per-group Python fallback
            # (measured 30 s on the driver combine below); a C-speed stable
            # sort + first-occurrence keep is the same reduction in <1 s.
            df = t.select(["cluster_id", "unique_id"]).to_pandas()
            df = df.sort_values("unique_id", kind="stable").drop_duplicates(
                "cluster_id", keep="first"
            )
            return pa.Table.from_pandas(
                df.rename(columns={"unique_id": "min_uid"}), preserve_index=False
            ).replace_schema_metadata(None)

        # Combine the per-block (cluster_id, min_uid) partials on the driver:
        # this branch is gated by comps.count() <= broadcast_clusters_threshold,
        # so the pre-reduced partials (<= one row per cluster per block) are
        # broadcast-sized by construction — the same bytes ride plasma one
        # line later anyway.  The previous string-keyed Ray sort-groupby cost
        # ~17 s @ 8 cpus / 52 s @ 2 cpus for a reduce pandas does in <1 s.
        parts = out.map_batches(partial_min, batch_format="pyarrow").materialize()
        inc_metric("relabel.parts_sec", time.perf_counter() - _t)
        _t2 = time.perf_counter()
        import pandas as pd

        pdf = pa.concat_tables(
            [b for b in ray.get(parts.to_arrow_refs()) if b.num_rows]
        ).to_pandas()
        inc_metric("relabel.drain_sec", time.perf_counter() - _t2)
        _t2 = time.perf_counter()
        mins_df = pdf.sort_values("min_uid", kind="stable").drop_duplicates(
            "cluster_id", keep="first"
        )[["cluster_id", "min_uid"]]
        mins_df.columns = ["cluster_id", "final_cluster_id"]
        mins = ray.data.from_arrow(
            pa.Table.from_pandas(mins_df, preserve_index=False)
        )
        inc_metric("relabel.reduce_sec", time.perf_counter() - _t2)
        relabelled = inner_join(out, mins, on="cluster_id", broadcast=True)
        inc_metric("phase.relabel_sec", time.perf_counter() - _t)
        return relabelled.map_batches(
            lambda t: pa.table(
                {
                    "unique_id": t["unique_id"],
                    "content_sha256": t["content_sha256"],
                    "cluster_id": t["final_cluster_id"],
                }
            ),
            batch_format="pyarrow",
        )

    # shuffle path (cluster map too large to broadcast): hash join + bucketed
    # relabel — the 10^12-row route
    from ..stages.joins import inner_join

    out = inner_join(
        id_map, comps, on="node", num_partitions=num_partitions, broadcast=False
    )
    out = out.map_batches(
        lambda t: pa.table(
            {
                "unique_id": t["unique_id"],
                "content_sha256": t["content_sha256"],
                "cluster_id": t["cluster_id"],
            }
        ),
        batch_format="pyarrow",
    )

    # relabel clusters by their min unique_id (human-interpretable and
    # independent of the surrogate hash space) — one bucketed groupby shuffle
    from ..stages.bucketing import bucketed_group_apply

    def relabel_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas()
        mins = df.groupby("cluster_id")["unique_id"].min()
        df["cluster_id"] = df["cluster_id"].map(mins)
        return pa.table(
            {
                "unique_id": pa.array(df["unique_id"].tolist(), pa.string()),
                "content_sha256": pa.array(df["content_sha256"].tolist(), pa.string()),
                "cluster_id": pa.array(df["cluster_id"].tolist(), pa.string()),
            }
        )

    return bucketed_group_apply(out, "cluster_id", relabel_bucket)


def match_code_corpora(
    messy: "ray.data.Dataset",
    canon: "ray.data.Dataset",
    *,
    model: FSModel | None = None,
    predict_threshold: float = -50.0,
    max_pairs_per_block: int = 20_000,
    n_buckets: int | None = None,
    checkpoint_dir: str | None = None,
    payload_mode: str = "auto",
) -> "ray.data.Dataset":
    """Two-table match: best canonical record per messy record.

    The reference's gazetteer flow (examples/match_epc_to_os.py:60-119:
    clean canonical once with its own term frequencies, clean the messy
    side against those precomputed frequencies, deterministic exact pass,
    Splink predict at ``threshold_match_weight``, keep top-1) re-expressed
    Ray-Data-first:

    * canonical TF statistics come from ONE fused aggregate over the
      cleaned canonical table and are broadcast (``ray.put``) — the messy
      clean is then a pure map chain with no shuffle at all;
    * the deterministic pass is a zero-shuffle broadcast sha256 merge;
      resolved rows leave the probabilistic input (reference
      splink_model.py:49-54);
    * FS scoring rides the fused emit+score bucket tasks with per-bucket
      partial top-1 (``partial_top1_per_r``), so ~one row per (messy
      record, touched bucket) reaches the final reduce;
    * the global winner per messy record is ONE bucketed shuffle (max
      weight, ties -> lexicographically smallest canonical id — the
      reference's deterministic ORDER BY tie-break).

    Returns Dataset ``(ukam_address_id, unique_id,
    canonical_ukam_address_id, canonical_unique_id, match_weight,
    match_reason)`` — one row per matched messy record; ``match_weight``
    is null for deterministic (exact-sha) matches.  The user-meaningful
    ``unique_id`` columns (``repo::path@commit``) cost no extra shuffle:
    the messy side's rides the fused-score emit payload and the canonical
    side's comes from the broadcast exact index / the scorer's carry
    columns.
    """
    import numpy as np

    from ..stages.blocking import generate_and_score_pairs, prepare_scoring_warmup
    from ..stages.bucketing import bucketed_group_apply, coalesce_blocks
    from ..stages.exact import annotate_with_exact_index, build_exact_index
    from .clean import apply_post_tf, apply_pre_tf, corpus_tf_and_end_tokens
    from ..state.checkpoint import checkpoint_stage

    def _clean_canon(c):
        return apply_pre_tf(
            c.map_batches(derive_code_features, batch_format="pyarrow")
        )

    if checkpoint_dir:
        canon_pre = checkpoint_stage(
            _clean_canon, canon, f"{checkpoint_dir}/01_canon_pre",
            stage_name="canon_pre",
        ).materialize()
    else:
        canon_pre = _clean_canon(canon).materialize()
    canon_pre = coalesce_blocks(canon_pre)
    tf_dict, end_tokens, tf_default = corpus_tf_and_end_tokens(canon_pre)
    tf_ref = ray.put(tf_dict)
    # the exact-sha index needs only pre-TF columns — build it here so the
    # deterministic-pass annotate FUSES into the messy clean chain (its
    # own annotate+filter pass was a ~2s barrier at the reference shape)
    idx_ref = build_exact_index(canon_pre, match_cols=("content_sha256",))
    canon_c = apply_post_tf(
        canon_pre, tf_ref, end_tokens, tf_default=tf_default
    ).materialize()

    # probabilistic-pass model + head start: drain the canonical feature
    # store and launch the l-side warm scorer shards while the messy side
    # is still cleaning (see blocking.prepare_scoring_warmup).
    # sha_prefix blocks only pair identical content, which the exact pass
    # just removed from the messy side — dead weight
    rules = [r for r in CODE_BLOCKING_RULES if "sha_prefix" not in r]
    mdl = model or code_model(blocking_rules=rules)
    emit_cols = [
        "ukam_address_id_l",
        "ukam_address_id_r",
        "unique_id_l",
        "unique_id_r",
        "match_weight",
    ]
    warmup = (
        prepare_scoring_warmup(
            canon_c,
            mdl,
            carry_cols=DEDUP_CARRY_COLS,
            threshold_match_weight=predict_threshold,
            emit_cols=emit_cols,
        )
        if payload_mode in ("auto", "broadcast")
        else None
    )

    def _clean_messy(m):
        # same pre-TF map chain, then annotate against the canonical TF via
        # the ALREADY-broadcast tf_ref — routing through prepare_code_dataset
        # would ray.put a second identical copy of the TF dict; the exact
        # annotate rides the same fused chain (zero shuffle)
        return annotate_with_exact_index(
            apply_post_tf(
                apply_pre_tf(
                    m.map_batches(derive_code_features, batch_format="pyarrow")
                ),
                tf_ref,
                end_tokens,
                tf_default=tf_default,
            ),
            idx_ref,
            match_cols=("content_sha256",),
        )

    if checkpoint_dir:
        annotated = checkpoint_stage(
            _clean_messy, messy, f"{checkpoint_dir}/02_messy_clean",
            stage_name="messy_clean",
        ).materialize()
    else:
        annotated = _clean_messy(messy).materialize()
    annotated = coalesce_blocks(annotated)
    # deterministic pass (zero shuffle): resolved rows leave the
    # probabilistic input; annotated is materialized — consumed by BOTH
    # branches below (lazy would re-run the clean chain per consumer)

    def _det_rows(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.is_valid(t["match_reason"]))
        return pa.table(
            {
                "ukam_address_id": hit["ukam_address_id"],
                "unique_id": hit["unique_id"],
                "canonical_ukam_address_id": hit["canonical_ukam_address_id"],
                # the broadcast exact index resolves the canonical row's
                # unique_id alongside its ukam id — no join needed
                "canonical_unique_id": hit["resolved_canonical_id"],
                "match_weight": pa.nulls(hit.num_rows, pa.float64()),
                "match_reason": pa.array(
                    ["exact_sha256"] * hit.num_rows, pa.string()
                ),
            }
        )

    det = annotated.map_batches(_det_rows, batch_format="pyarrow")
    unresolved = annotated.map_batches(
        lambda t: t.filter(pc.is_null(t["match_reason"])).drop_columns(
            ["canonical_ukam_address_id", "resolved_canonical_id", "match_reason"]
        ),
        batch_format="pyarrow",
    ).materialize()

    # probabilistic pass: sha_prefix blocks only pair identical content,
    # which the exact pass just removed from the messy side — dead weight
    scored = generate_and_score_pairs(
        canon_c,
        unresolved,
        mdl,
        carry_cols=DEDUP_CARRY_COLS,
        threshold_match_weight=predict_threshold,
        emit_cols=emit_cols,
        max_pairs_per_block=max_pairs_per_block,
        hot_key_threshold=None,
        dedupe_output=False,
        partial_top1_per_r=True,
        n_buckets=n_buckets or 64,
        # "shuffle" forces the non-broadcast payload route (one hash join +
        # bucketed attach+score) — the 10^12-row cluster path; the top-1
        # reduce below handles either output shape (partial-top1 rows or
        # the full scored stream)
        payload_mode=payload_mode,
        warmup=warmup,
    ).materialize()

    # global top-1 per messy record: ONE bucketed shuffle over the sparse
    # partial-top1 stream (~rows = messy x touched buckets, not pairs)
    def top1_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df = df.sort_values(
            ["match_weight", "ukam_address_id_l"],
            ascending=[False, True],
            kind="mergesort",
        ).drop_duplicates("ukam_address_id_r", keep="first")
        n = len(df)
        return pa.table(
            {
                "ukam_address_id": pa.array(
                    df["ukam_address_id_r"].tolist(), pa.string()
                ),
                "unique_id": pa.array(df["unique_id_r"].tolist(), pa.string()),
                "canonical_ukam_address_id": pa.array(
                    df["ukam_address_id_l"].tolist(), pa.string()
                ),
                "canonical_unique_id": pa.array(
                    df["unique_id_l"].tolist(), pa.string()
                ),
                "match_weight": pa.array(
                    np.asarray(df["match_weight"], dtype=np.float64), pa.float64()
                ),
                "match_reason": pa.array(["fs_top1"] * n, pa.string()),
            }
        )

    top1 = bucketed_group_apply(scored, "ukam_address_id_r", top1_bucket)
    return det.union(top1)
