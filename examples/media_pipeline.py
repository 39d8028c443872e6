"""End-to-end multimodal pipeline: binary media columns -> REAL stdlib
decode -> content features -> near-duplicate image groups.

Demonstrates the media column path working on genuine bytes (no codec
libraries): constant/gradient PNGs and PCM WAVs are synthesized, strictly
decoded (`stages/multimodal.py:decode_png` / `decode_wav`,
`functions/jpeg.py:decode_jpeg`), and the content-derived 16-dim features
feed the embedding near-dup operator — re-encoded duplicates land in the
same group because the features are functions of the decoded PIXELS, not
the container bytes.  Each image group carries THREE encodings of the same
picture: filter-0 PNG, a decode->re-encode PNG, and a baseline JPEG (a
lossy codec — near-dup still groups it with its PNG siblings because the
pixel loss at quality 95 barely moves the grid feature).

Run:  PYTHONPATH=. python examples/media_pipeline.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_media_table(n_groups: int = 40):
    """Synthesize images where each group is the same picture written
    through DIFFERENT PNG encodings (filter-0 vs a re-encode after a
    round-trip) plus a handful of WAVs."""
    import numpy as np
    import pyarrow as pa

    from moj_analytical_services_uk_address_matcher_ray.functions.gif import (
        encode_gif,
    )
    from moj_analytical_services_uk_address_matcher_ray.functions.jpeg import (
        encode_jpeg,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.multimodal import (
        decode_png,
        encode_png,
        make_wav_bytes,
    )

    rng = np.random.RandomState(17)
    ids, modality, payload, meta, truth = [], [], [], [], []
    for g in range(n_groups):
        h, w = 12 + g % 8, 10 + g % 6
        base = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        # original + a re-encode of the DECODED pixels: different container
        # bytes, identical content
        for v, tag in ((base, "orig"), (decode_png(encode_png(base)), "reenc")):
            ids.append(f"img_{g:03d}_{tag}")
            modality.append("image")
            payload.append(encode_png(v))
            meta.append("{}")
            truth.append(g)
        ids.append(f"img_{g:03d}_jpeg")
        modality.append("image")
        payload.append(encode_jpeg(base, quality=95))
        meta.append("{}")
        truth.append(g)
        if g % 4 == 0:  # a handful of single-frame GIFs of the same picture
            # (GIF needs <=256 distinct colours: quantise to 6 levels per
            # channel — still the same picture, and the content feature is
            # robust to it, so these rows belong to their group's near-dup
            # cluster like the lossy JPEG siblings do)
            q = (base // 43 * 43).astype("uint8")
            ids.append(f"img_{g:03d}_gif")
            modality.append("image")
            payload.append(encode_gif(q))
            meta.append("{}")
            truth.append(g)
    for a in range(10):
        ids.append(f"aud_{a:02d}")
        modality.append("audio")
        payload.append(make_wav_bytes(400 + 40 * a))
        meta.append("{}")
        truth.append(-1)
    tbl = pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "modality": pa.array(modality, pa.string()),
            "payload": pa.array(payload, pa.binary()),
            "meta": pa.array(meta, pa.string()),
        }
    )
    return tbl, dict(zip(ids, truth))


def run(verbose: bool = True) -> dict:
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level=logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow.compute as pc
    import ray.data as rd

    from moj_analytical_services_uk_address_matcher_ray.stages.dedup import (
        embedding_neardup_pairs,
    )
    from moj_analytical_services_uk_address_matcher_ray.stages.multimodal import (
        decode_media,
    )

    tbl, truth = build_media_table()
    decoded = decode_media(
        rd.from_arrow(tbl), decode="strict", concurrency=2
    ).materialize()

    images = decoded.map_batches(
        lambda t: t.filter(pc.equal(t["modality"], "image")).select(
            ["media_id", "feature"]
        ),
        batch_format="pyarrow",
    )
    pairs = embedding_neardup_pairs(
        images, id_col="media_id", vec_col="feature", threshold=0.999
    ).to_pandas()

    n_pairs = len(pairs)
    correct = sum(
        truth[a] == truth[b] for a, b in zip(pairs.iloc[:, 0], pairs.iloc[:, 1])
    )
    out = {
        "media_rows": tbl.num_rows,
        "decoded_rows": decoded.count(),
        "near_dup_pairs": n_pairs,
        "same_group_pairs": int(correct),
    }
    if verbose:
        print(out)
    return out


if __name__ == "__main__":
    run()
    import ray

    ray.shutdown()
