"""Text-analysis and multimodal plumbing stages."""

import pyarrow as pa
import pytest
import ray.data as rd

from moj_analytical_services_uk_address_matcher_ray.stages.multimodal import (
    MediaDecoder,
    decode_media,
    make_fake_media_table,
)
from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
    LanguageId,
    fingerprint,
    quality_score,
    token_count,
)


def _t(texts):
    return pa.table({"text": pa.array(texts, pa.string())})


def test_language_id():
    out = LanguageId()(
        _t(
            [
                "the quick brown fox is that it for the win and the rest",
                "el perro y la casa de los que en un una",
                "der hund und die katze ist ein nicht mit",
                "这是一个中文句子 中文内容很多",
                "zzz qqq xxx",
            ]
        )
    )
    assert out["lang_pred"].to_pylist() == ["en", "es", "de", "zh", "und"]


def test_quality_score():
    out = quality_score(_t(["Hello, World! 123", ""]))
    assert out["n_chars_q"].to_pylist() == [17, 0]
    assert out["n_tokens"].to_pylist()[0] == 3
    assert out["digit_ratio"].to_pylist()[0] == 3 / 17
    assert out["punct_ratio"].to_pylist()[0] == 2 / 17  # ',' and '!'
    assert out["upper_ratio"].to_pylist()[0] == 2 / 17  # 'H' and 'W'


def test_token_count():
    out = token_count(_t(["a b  c", "don't stop!", ""]))
    assert out["ws_tokens"].to_pylist() == [3, 2, 0]
    assert out["bpe_ish_tokens"].to_pylist() == [3, 5, 0]  # don ' t stop !


def test_fingerprint_stability_under_edit():
    a = "line one\nline two\nline three\nline four\nmore padding text here"
    b = a + " end"
    out = fingerprint(_t([a, b, "zz"]))
    f = out["doc_min_fingerprint"].to_pylist()
    # min rolling window survives a tail edit (probabilistic property —
    # holds unless one of the few appended windows hashes below the global
    # min; this fixture is verified stable for the current hash family)
    assert f[0] == f[1]
    assert out["doc_sha256"].to_pylist()[0] != out["doc_sha256"].to_pylist()[1]


def test_media_decode_fake(ray_session):
    media = make_fake_media_table(9)
    ds = rd.from_arrow(media)
    out = decode_media(ds, concurrency=1).materialize()
    rows = out.take_all()
    assert len(rows) == 9
    assert {r["modality"] for r in rows} == {"image", "audio", "video"}
    img = next(r for r in rows if r["modality"] == "image")
    assert len(img["shape"]) == 3 and img["shape"][2] == 3
    assert len(img["feature"]) == 16
    # deterministic: same payload -> same checksum
    again = decode_media(rd.from_arrow(media), concurrency=1).materialize().take_all()
    assert {r["media_id"]: r["payload_checksum"] for r in rows} == {
        r["media_id"]: r["payload_checksum"] for r in again
    }


def test_media_decode_strict_raises_on_unknown_container():
    dec = MediaDecoder(decode="strict")
    with pytest.raises(ValueError, match="unsupported container"):
        dec(make_fake_media_table(1))


def _ref_filter_png(pixels, filters):
    """Reference PNG encoder applying a chosen filter per scanline (the
    spec's forward direction), independent of decode_png's inverse."""
    import zlib

    import numpy as np

    h, w, ch = pixels.shape
    bpp = ch
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        line = pixels[y].reshape(-1).astype(np.int64)
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(w * ch):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] - a
            elif f == 2:
                v = line[x] - b
            elif f == 3:
                v = line[x] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                v = line[x] - pred
            raw.append(v & 0xFF)
        prev = line

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    colour = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, colour, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )


def test_png_roundtrip_all_channel_counts():
    import numpy as np

    from moj_analytical_services_uk_address_matcher_ray.stages.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(3)
    for ch in (1, 2, 3, 4):
        px = rng.randint(0, 256, size=(13, 9, ch)).astype(np.uint8)
        out = decode_png(encode_png(px))
        assert out.shape == (13, 9, ch)
        assert (out == px).all()


def test_png_decode_all_filters_against_reference_encoder():
    import numpy as np

    from moj_analytical_services_uk_address_matcher_ray.stages.multimodal import (
        decode_png,
    )

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(12, 7, 3)).astype(np.uint8)
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        out = decode_png(_ref_filter_png(px, filters))
        assert (out == px).all(), f"filter set {filters} mis-decoded"


def test_wav_pcm_decode_real_samples():
    import numpy as np

    from moj_analytical_services_uk_address_matcher_ray.stages.multimodal import (
        decode_wav,
    )

    t = np.arange(800)
    samples = (
        (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype("<i2").reshape(-1, 1)
    )
    data = samples.tobytes()
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (16000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    wav = b"RIFF" + len(body).to_bytes(4, "little") + body
    out, rate = decode_wav(wav)
    assert rate == 16000 and out.shape == (800, 1)
    assert (out == samples).all()


def test_media_decode_strict_end_to_end(ray_session):
    import numpy as np
    import pyarrow as pa

    from moj_analytical_services_uk_address_matcher_ray.stages.multimodal import (
        encode_png,
        make_wav_bytes,
    )

    px = np.full((10, 6, 3), 7, dtype=np.uint8)
    media = pa.table(
        {
            "media_id": pa.array(["img0", "aud0"], pa.string()),
            "modality": pa.array(["image", "audio"], pa.string()),
            "payload": pa.array(
                [encode_png(px), make_wav_bytes(500)], pa.binary()
            ),
            "meta": pa.array(["{}", "{}"], pa.string()),
        }
    )
    out = {
        r["media_id"]: r
        for r in decode_media(rd.from_arrow(media), decode="strict", concurrency=1)
        .take_all()
    }
    assert list(out["img0"]["shape"]) == [10, 6, 3]
    assert out["img0"]["pixel_sum"] == 10 * 6 * 3 * 7
    assert len(out["img0"]["feature"]) == 16
    assert abs(out["img0"]["feature"][0] - 7 / 255.0) < 1e-6
    assert list(out["aud0"]["shape"]) == [500, 1]
    assert out["aud0"]["pixel_sum"] == 0  # silence


def test_media_header_sniff_kernel():
    from moj_analytical_services_uk_address_matcher_ray.stages.multimodal import (
        make_jpeg_bytes,
        make_png_bytes,
        make_wav_bytes,
        sniff_media_header,
    )

    assert sniff_media_header(make_png_bytes(640, 480)) == {
        "format": "png",
        "shape": [480, 640, 3],
    }
    assert sniff_media_header(make_jpeg_bytes(32, 20)) == {
        "format": "jpeg",
        "shape": [20, 32, 3],
    }
    wav = sniff_media_header(make_wav_bytes(8000, rate=16000, channels=2))
    assert wav["format"] == "wav"
    assert wav["shape"] == [8000, 2]
    assert wav["sample_rate"] == 16000
    assert sniff_media_header(b"\x00\x01garbage") is None
    assert sniff_media_header(b"") is None


def test_media_decode_headers_mode(ray_session):
    from moj_analytical_services_uk_address_matcher_ray.stages.multimodal import (
        make_header_media_table,
    )

    media = make_header_media_table(9)
    out = (
        decode_media(rd.from_arrow(media), decode="headers", concurrency=1)
        .materialize()
        .take_all()
    )
    assert len(out) == 9
    by_id = {r["media_id"]: r for r in out}
    # PNG rows (i % 3 == 0) got REAL dims from the header, channel dim 3
    png = by_id["media_00000"]
    assert png["shape"][2] == 3 and png["shape"][0] >= 16
    # WAV rows (i % 3 == 1) got (n_samples, channels)
    wav = by_id["media_00001"]
    assert wav["shape"][1] == 1 and wav["shape"][0] >= 1000
    # unknown-magic payloads fall back to the deterministic fake
    fake_in = make_fake_media_table(3)
    fb = (
        decode_media(rd.from_arrow(fake_in), decode="headers", concurrency=1)
        .materialize()
        .take_all()
    )
    assert len(fb) == 3


def test_media_decode_auto_mode_falls_back():
    # Pillow is absent in this container: auto == headers behaviour
    from moj_analytical_services_uk_address_matcher_ray.stages.multimodal import (
        make_png_bytes,
    )
    import pyarrow as pa

    dec = MediaDecoder(decode="auto")
    t = pa.table(
        {
            "media_id": ["m1"],
            "modality": ["image"],
            "payload": pa.array([make_png_bytes(100, 50)], pa.binary()),
            "meta": ['{"k":1}'],
        }
    )
    out = dec(t)
    assert out["shape"].to_pylist()[0] == [50, 100, 3]


def test_repetition_stats_hand_computed():
    from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
        repetition_stats,
    )

    out = repetition_stats(
        _t(["a b a b a", "x y z", "  A  a   A ", ""])
    )
    # doc0: tokens [a b a b a] -> 5 tokens, 2 distinct, top=3 (a);
    #       bigrams [a b, b a, a b, b a] -> 4, 2 distinct
    # doc1: all distinct; doc2: lowercased+trimmed -> [a a a];
    # doc3: empty text -> the single empty token (DuckDB split parity)
    assert out["rep_n_tokens"].to_pylist() == [5, 3, 3, 1]
    assert out["rep_distinct_tokens"].to_pylist() == [2, 3, 1, 1]
    assert out["rep_top_token_count"].to_pylist() == [3, 1, 3, 1]
    assert out["rep_n_bigrams"].to_pylist() == [4, 2, 2, 0]
    assert out["rep_distinct_bigrams"].to_pylist() == [2, 2, 1, 0]
    assert out["dup_token_frac"].to_pylist() == pytest.approx(
        [0.6, 0.0, 2 / 3, 0.0]
    )
    assert out["dup_bigram_frac"].to_pylist() == pytest.approx(
        [0.5, 0.0, 0.5, 0.0]
    )


def test_decontaminate_flags_benchmark_overlap(ray_session):
    import ray

    from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
        NgramDecontaminator,
        build_benchmark_ngrams,
    )

    bench_ds = rd.from_arrow(
        _t(["the secret benchmark passage lives here", "another held out row"])
    )
    bench = build_benchmark_ngrams(bench_ds, n=3)
    # every consecutive 3-gram of both benchmark docs, no cross-doc windows
    assert len(bench) == (6 - 3 + 1) + (4 - 3 + 1)
    corpus = _t(
        [
            "contains the secret benchmark passage lives here verbatim",
            "totally clean document with fresh words",
            "ends with the secret benchmark",  # one 3-gram hit
            "benchmark passage",  # shorter than n -> no window
        ]
    )
    out = NgramDecontaminator(ray.put(bench), n=3)(corpus)
    assert out["contaminated"].to_pylist() == [True, False, True, False]
    assert out["n_contaminated_ngrams"].to_pylist() == [4, 0, 1, 0]
    # stage shape: actor-pool map_batches over a Dataset
    ds = rd.from_arrow(corpus).map_batches(
        NgramDecontaminator,
        fn_constructor_args=(ray.put(bench),),
        fn_constructor_kwargs={"n": 3},
        batch_format="pyarrow",
        concurrency=1,
    )
    got = ds.to_pandas().sort_values("text").reset_index(drop=True)
    assert int(got["n_contaminated_ngrams"].sum()) == 5


def test_token_rule_duckdb_parity_edge_cases():
    """The decontaminate/doc_repetition oracle contract on the awkward
    inputs: null text, all-space text, non-space edge whitespace (DuckDB
    trim() strips spaces ONLY), repeated separators, uppercase."""
    import duckdb

    from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
        repetition_stats,
    )

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [None, "", "   ", "\nhello world", "A  a\t a", "x y x y"],
                pa.string(),
            ),
        }
    )
    mine = repetition_stats(t).select(
        [
            "doc_id",
            "rep_n_tokens",
            "rep_distinct_tokens",
            "rep_top_token_count",
            "rep_n_bigrams",
            "rep_distinct_bigrams",
        ]
    )
    con = duckdb.connect()
    con.register("documents", t)
    oracle = con.execute(
        r"""
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS tk
            FROM documents
        ),
        tok AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
        tc AS (
            SELECT doc_id, count(*) AS rep_n_tokens,
                   count(DISTINCT tok) AS rep_distinct_tokens
            FROM tok GROUP BY doc_id
        ),
        topc AS (
            SELECT doc_id, max(c) AS rep_top_token_count
            FROM (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok)
            GROUP BY doc_id
        ),
        big AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
                          i -> array_to_string(tk[i:i+1], ' '))) AS g
            FROM toks
        ),
        bc AS (
            SELECT doc_id, count(*) AS rep_n_bigrams,
                   count(DISTINCT g) AS rep_distinct_bigrams
            FROM big GROUP BY doc_id
        )
        SELECT tc.doc_id, rep_n_tokens, rep_distinct_tokens, rep_top_token_count,
               coalesce(rep_n_bigrams, 0) AS rep_n_bigrams,
               coalesce(rep_distinct_bigrams, 0) AS rep_distinct_bigrams
        FROM tc JOIN topc USING (doc_id) LEFT JOIN bc USING (doc_id)
        ORDER BY doc_id
        """
    ).arrow()
    assert oracle.num_rows == mine.num_rows  # null text must not drop a row
    for c in mine.column_names:
        assert (
            mine[c].to_pylist() == oracle[c].to_pylist()
        ), f"column {c} diverges from DuckDB"
    # the '\nhello world' doc keeps its leading empty token on BOTH engines
    assert mine["rep_n_tokens"].to_pylist()[3] == 3


def test_bm25_formula_and_stats(ray_session):
    import math

    import ray

    from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
        BM25Scorer,
        corpus_df_stats,
    )

    corpus = _t(
        [
            "fast fast table",      # tf(fast)=2
            "fast row row row",     # tf(fast)=1, longer doc
            "slow merge scan",      # no query terms
            "table",                # short doc, rare term
        ]
    )
    ds = rd.from_arrow(corpus)
    df, n_docs, avg_len = corpus_df_stats(ds)
    assert n_docs == 4
    assert df["fast"] == 2 and df["table"] == 2 and df["row"] == 1
    assert avg_len == pytest.approx((3 + 4 + 3 + 1) / 4)

    out = BM25Scorer((df, n_docs, avg_len), ["fast", "table"])(corpus)
    s = out["bm25_score"].to_pylist()
    assert s[2] == 0.0  # no query terms
    assert s[0] > s[1] > 0  # higher tf + shorter doc outranks single hit
    # exact formula on doc 3 ('table'): tf=1, len=1
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1)
    expect = idf * 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * 1 / avg_len))
    assert s[3] == pytest.approx(expect)
    # actor-pool stage shape with a broadcast stats ref
    ref = ray.put((df, n_docs, avg_len))
    got = (
        rd.from_arrow(corpus)
        .map_batches(
            BM25Scorer,
            fn_constructor_args=(ref, ["fast", "table"]),
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    assert sorted(got["bm25_score"]) == sorted(s)


def test_token_rule_duckdb_parity_property():
    """Property-based parity pin for the oracle token rule: random strings
    over an adversarial alphabet (Zs spaces, control whitespace, zero-width,
    case-folding letters) must tokenise identically in the Arrow kernel and
    DuckDB's `regexp_split_to_array(trim(lower(coalesce(text,''))), '\\s+')`
    (DuckDB trim() strips exactly Unicode Zs — probed empirically)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
        _token_stream,
    )

    alphabet = st.sampled_from(
        list("ab zİIßÅ  　\t\n​0.")
    )
    texts = st.lists(
        st.one_of(st.none(), st.text(alphabet, max_size=12)),
        min_size=1,
        max_size=8,
    )
    con = duckdb.connect()

    @settings(deadline=None, max_examples=150)
    @given(texts)
    def check(docs):
        t = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
        values, offsets = _token_stream(t["text"])
        mine = [
            values.slice(offsets[i], offsets[i + 1] - offsets[i]).to_pylist()
            for i in range(len(docs))
        ]
        con.register("d", t)
        oracle = [
            row[0]
            for row in con.execute(
                r"SELECT regexp_split_to_array(trim(lower(coalesce(text, ''))),"
                r" '\s+') FROM d ORDER BY doc_id"
            ).fetchall()
        ]
        assert mine == oracle

    check()


def test_lm_cross_entropy_semantics(ray_session):
    import math

    import ray

    from moj_analytical_services_uk_address_matcher_ray.stages.text_analysis import (
        LMScorer,
        corpus_lm_stats,
    )

    train = _t(["a b a b a b", "a b a b", "c d"])
    vocab, uni, bi_keys, bi_counts, V, k = corpus_lm_stats(
        rd.from_arrow(train), max_vocab=3
    )
    # vocab: a(5), b(5), c(1) — count desc then token asc; d folds to <unk>
    assert vocab == ["a", "b", "c"]
    assert V == 4  # a, b, c + <unk>
    assert uni.tolist() == [5, 5, 1, 1]
    stats = (vocab, uni, bi_keys, bi_counts, V, k)

    scored = LMScorer(stats)(
        _t(["a b a b", "q q q", "a", ""])
    )
    s = scored["lm_cross_entropy"].to_pylist()
    # familiar transitions score much lower CE than all-OOV text
    assert 0 < s[0] < s[1]
    assert s[2] == 0.0 and s[3] == 0.0  # <2 tokens -> no bigrams
    # exact value for 'a b a b': train bigrams ab=5, ba=3; denominators
    # c(w1) + k*V = 5 + 0.5*4 = 7 -> P(b|a)=(5+.5)/7, P(a|b)=(3+.5)/7
    expect = -(2 * math.log(5.5 / 7) + math.log(3.5 / 7)) / 3
    assert s[0] == pytest.approx(expect)
    # actor-pool shape with broadcast stats
    got = (
        rd.from_arrow(_t(["a b a b"]))
        .map_batches(
            LMScorer,
            fn_constructor_args=(ray.put(stats),),
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    assert got["lm_cross_entropy"][0] == pytest.approx(expect)


def test_media_decode_strict_modality_mismatch_raises():
    import pyarrow as pa

    from moj_analytical_services_uk_address_matcher_ray.stages.multimodal import (
        MediaDecoder,
        make_wav_bytes,
    )

    dec = MediaDecoder(decode="strict")
    mislabeled = pa.table(
        {
            "media_id": pa.array(["x"], pa.string()),
            "modality": pa.array(["image"], pa.string()),  # but payload is WAV
            "payload": pa.array([make_wav_bytes(100)], pa.binary()),
            "meta": pa.array(["{}"], pa.string()),
        }
    )
    with pytest.raises(ValueError, match="does not match modality"):
        dec(mislabeled)


def test_image_feature_gray_alpha_drops_alpha():
    import numpy as np

    from moj_analytical_services_uk_address_matcher_ray.stages.multimodal import (
        image_feature,
    )

    # dark gray (10) with fully opaque alpha: the feature must read "dark",
    # not the (10+255)/2 average
    la = np.zeros((8, 8, 2), dtype=np.uint8)
    la[..., 0] = 10
    la[..., 1] = 255
    f = image_feature(la)
    assert abs(f[0] - 10 / 255.0) < 1e-6


# ---------------------------------------------------------------------------
# baseline JPEG codec (functions/jpeg.py)
# ---------------------------------------------------------------------------


def test_jpeg_solid_gray_roundtrips_exactly():
    import numpy as np

    from moj_analytical_services_uk_address_matcher_ray.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    # at quality 100 every quantiser step is 1 and a uniform plane has one
    # exact-integer DC coefficient -> the lossy codec is exact here (the
    # media_decode oracle depends on this invariant)
    for v in (0, 7, 60, 128, 200, 255):
        img = np.full((13, 21, 3), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.shape == (13, 21, 3)
        assert (out == img).all(), v


def test_jpeg_roundtrip_tolerance_and_shapes():
    import numpy as np

    from moj_analytical_services_uk_address_matcher_ray.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    g = np.zeros((41, 57, 3), np.uint8)
    g[:, :, 0] = np.linspace(0, 255, 57, dtype=np.uint8)[None, :]
    g[:, :, 1] = np.linspace(0, 255, 41, dtype=np.uint8)[:, None]
    g[:, :, 2] = np.add.outer(np.arange(41), np.arange(57)).astype(np.uint8)
    for kw in (
        dict(subsample="444"),
        dict(subsample="420"),
        dict(subsample="420", restart_interval=2),
        dict(subsample="444", restart_interval=3),
    ):
        out = decode_jpeg(encode_jpeg(g, quality=92, **kw))
        assert out.shape == g.shape, kw
        diff = np.abs(out.astype(int) - g.astype(int))
        # smooth gradients survive q92 within a tight band; 4:2:0 averages
        # chroma 2x2 so its band is wider
        limit = 8 if kw.get("subsample") == "420" else 4
        assert diff.max() <= limit, (kw, int(diff.max()))
    # grayscale path
    gray = (np.add.outer(np.arange(24), np.arange(40)) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(gray, quality=90))
    assert out.shape == (24, 40, 1)
    assert np.abs(out[:, :, 0].astype(int) - gray.astype(int)).max() <= 2


def test_jpeg_progressive_rejected_by_name():
    import pytest as _pytest

    from moj_analytical_services_uk_address_matcher_ray.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    import numpy as np

    payload = bytearray(
        encode_jpeg(np.zeros((8, 8), np.uint8), quality=90)
    )
    # flip the SOF0 marker (FFC0) to SOF2 (progressive)
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with _pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(payload))


def test_media_decoder_strict_jpeg_pixels():
    import hashlib

    import numpy as np

    from moj_analytical_services_uk_address_matcher_ray.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    payload = encode_jpeg(img, quality=100)
    dec = MediaDecoder(decode="strict")
    t = pa.table(
        {
            "media_id": pa.array(["j1"], pa.string()),
            "modality": pa.array(["image"], pa.string()),
            "payload": pa.array([payload], pa.binary()),
            "meta": pa.array(["{}"], pa.string()),
        }
    )
    out = dec(t)
    assert out["shape"].to_pylist() == [[16, 16, 3]]
    assert out["pixel_sum"].to_pylist() == [16 * 16 * 3 * 77]
    pixels = decode_jpeg(payload)
    assert (
        out["payload_checksum"].to_pylist()[0]
        == hashlib.blake2b(pixels.tobytes(), digest_size=16).hexdigest()
    )


# ---------------------------------------------------------------------------
# GIF codec + frame sampling (functions/gif.py, stages/multimodal.py)
# ---------------------------------------------------------------------------


def test_gif_animated_roundtrip_exact():
    import numpy as np

    from moj_analytical_services_uk_address_matcher_ray.functions.gif import (
        decode_gif,
        encode_gif,
    )

    frames = []
    for f in range(4):
        img = np.zeros((23, 31, 3), np.uint8)
        img[:, :, 0] = (f * 40) % 256
        img[5:15, 7:20, 1] = 200
        img[f : f + 5, :, 2] = 90
        frames.append(img)
    out, delays = decode_gif(encode_gif(frames, delays=[5, 10, 15, 20]))
    assert out.shape == (4, 23, 31, 3) and delays == [5, 10, 15, 20]
    assert all((out[f] == frames[f]).all() for f in range(4))


def test_gif_lzw_table_overflow_and_wide_palette():
    import numpy as np

    from moj_analytical_services_uk_address_matcher_ray.functions.gif import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(2)
    noisy = (rng.integers(0, 4, (128, 128, 3)) * 80).astype(np.uint8)
    out, _ = decode_gif(encode_gif(noisy))
    assert (out[0] == noisy).all()
    grad = np.zeros((16, 16, 3), np.uint8)
    grad[:, :, 0] = np.arange(256).reshape(16, 16)
    out, _ = decode_gif(encode_gif(grad))
    assert (out[0] == grad).all()


def test_gif_interlace_and_transparency_disposal():
    import numpy as np

    from moj_analytical_services_uk_address_matcher_ray.functions.gif import (
        decode_gif,
        encode_gif,
    )

    # hand-build an INTERLACED variant of an encoder-produced GIF: encode a
    # row-permuted image, then set the interlace flag so the decoder's
    # 4-pass deinterlace must restore the original
    h, w = 16, 9
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :, 1] = (np.arange(h) * 16)[:, None] % 256
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4),
         np.arange(1, h, 2)]
    )
    payload = bytearray(encode_gif(img[order]))
    # image descriptor = 0x2C ... flags byte at +9; single-frame encoder
    # layout: header(13) + GCT + GCE(8) + descriptor
    i = payload.index(0x2C, 13)
    payload[i + 9] |= 0x40  # interlace flag
    out, _ = decode_gif(bytes(payload))
    assert (out[0] == img).all()

    # transparency + disposal=2 (restore background): frame 2's transparent
    # pixels must show frame-region background, not frame 1's pixels
    base = np.full((8, 8, 3), 10, np.uint8)
    f2 = np.full((8, 8, 3), 200, np.uint8)
    payload = bytearray(encode_gif([base, f2], delays=[1, 1]))
    # first GCE: set disposal=2 (packed byte at offset +3 of the 0x21 0xF9
    # block) — find the first extension
    j = payload.index(0xF9) + 2  # points at packed byte (after size byte)
    payload[j] |= 0x08  # disposal method 2
    out, _ = decode_gif(bytes(payload))
    assert (out[0] == base).all() and (out[1] == f2).all()


def test_gif_frame_sampler_stage(ray_session):
    import numpy as np
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.functions.gif import (
        encode_gif,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.multimodal import (
        sample_media_frames,
    )

    rows = []
    for d in range(6):
        nf = 2 + d % 3
        frames = [
            np.full((8, 8, 3), (d * 11 + f * 17) % 256, np.uint8)
            for f in range(nf)
        ]
        rows.append(
            {
                "media_id": f"m{d}",
                "payload": encode_gif(frames, delays=list(range(1, nf + 1))),
            }
        )
    out = sample_media_frames(
        rd.from_items(rows), every_n=2, concurrency=(1, 2)
    ).to_pandas()
    # every_n=2 keeps frames 0, 2
    for d in range(6):
        nf = 2 + d % 3
        sub = out[out["media_id"] == f"m{d}"].sort_values("frame_idx")
        assert list(sub["frame_idx"]) == list(range(0, nf, 2))
        for _, r in sub.iterrows():
            v = (d * 11 + int(r["frame_idx"]) * 17) % 256
            assert r["pixel_sum"] == 8 * 8 * 3 * v
