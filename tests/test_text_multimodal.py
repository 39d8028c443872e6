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


def test_media_decode_strict_raises():
    dec = MediaDecoder(decode="strict")
    with pytest.raises(NotImplementedError):
        dec(make_fake_media_table(1))
