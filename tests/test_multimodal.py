"""Multimodal plumbing tests: binary Arrow transfer, struct metadata,
deterministic stub decode, batch-shape independence, empty partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ner_spark import multimodal as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return M.media_table(docs)


def test_media_schema_and_payload_sizes(media):
    assert media.schema.simpleString() == (
        "struct<doc_id:bigint,kind:string,payload:binary,"
        "meta:struct<format:string,width:int,height:int,"
        "sample_rate:int,duration_ms:int>>"
    )
    pdf = media.limit(50).toPandas()
    from ner_spark.codecs import decode_jpeg, decode_png, decode_wav

    seen_color_jpeg = False
    for _, r in pdf.iterrows():
        expect = (
            r.meta["width"] * r.meta["height"]
            if r.kind == "image"
            else r.meta["duration_ms"]
        )
        fmt = r.meta["format"]
        if fmt == M.FAKE_FORMAT:
            assert len(r.payload) == expect
        elif fmt == "png":  # real container: size checked after decode
            assert decode_png(bytes(r.payload)).size == expect
        elif fmt == "jpeg":  # real (lossy) container — shape must hold
            a = decode_jpeg(bytes(r.payload))
            assert a.shape[:2] == (r.meta["height"], r.meta["width"])
            if a.ndim == 3:  # color rows: baseline (doc_id % 24 == 3)
                # or progressive/SOF2 (doc_id % 48 == 15)
                assert a.shape[2] == 3 and (
                    r.doc_id % 24 == 3 or r.doc_id % 48 == 15
                )
                seen_color_jpeg = True
                if r.doc_id % 48 == 15:
                    assert b"\xff\xc2" in bytes(r.payload)  # SOF2 marker
            assert max(a.shape[:2]) < 64  # thumbnail-capped fixture rows
        else:
            assert fmt == "wav"
            samples, rate = decode_wav(bytes(r.payload))
            assert samples.size == expect and rate == r.meta["sample_rate"]
        assert isinstance(r.payload, (bytes, bytearray))
    # the corpus must actually exercise every container (non-vacuous)
    assert set(pdf.meta.map(lambda m: m["format"])) == {
        M.FAKE_FORMAT, "png", "wav", "jpeg",
    }
    assert seen_color_jpeg  # the color-jpeg slice is present (non-vacuous)


def test_decode_is_deterministic(media):
    a = media.where("kind = 'image'").limit(3).toPandas()
    b = media.where("kind = 'image'").limit(3).toPandas()
    for (pa, ma), (pb, _) in zip(zip(a.payload, a.meta), zip(b.payload, b.meta)):
        assert pa == pb
        img = M.decode_image(pa, ma)
        assert img.shape == (ma["height"], ma["width"])


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"RIFF....WEBP", {"format": "webp"})


def test_image_features_values(spark, media):
    got = M.image_features(media).toPandas().set_index("doc_id")
    src = media.where("kind = 'image'").limit(5).toPandas()
    for _, r in src.iterrows():
        img = M.decode_image(r.payload, r.meta)
        row = got.loc[r.doc_id]
        assert row.mean_intensity == pytest.approx(float(img.mean()))
        assert row.std_intensity == pytest.approx(float(img.std()))
        assert int(sum(row.histogram)) == img.size


def test_resize_shape_and_batch_independence(spark, media):
    """Output is invariant to partitioning/batch boundaries."""
    r1 = M.image_resize(media).toPandas()
    r2 = M.image_resize(media.repartition(7)).toPandas()
    from ner_spark.codecs import decode_jpeg, decode_png

    for df in (r1, r2):
        assert (df.meta.map(lambda m: (m["width"], m["height"])) == (32, 32)).all()
        for _, r in df.iterrows():
            if r.meta["format"] == "png":  # container preserved end-to-end
                assert decode_png(bytes(r.payload)).shape == (32, 32)
            elif r.meta["format"] == "jpeg":
                # resize collapses color to luma (rank-2 contract), so
                # the re-encoded container is grayscale for every row
                assert decode_jpeg(bytes(r.payload)).shape == (32, 32)
            else:
                assert len(r.payload) == 32 * 32
    a = r1.sort_values("doc_id").reset_index(drop=True)
    b = r2.sort_values("doc_id").reset_index(drop=True)
    assert (a.doc_id == b.doc_id).all()
    assert all(x == y for x, y in zip(a.payload, b.payload))


def test_frame_sample(spark, media):
    fs = M.frame_sample(media, n_frames=4).toPandas()
    n_av = media.where("kind in ('audio','video')").count()
    assert len(fs) == 4 * n_av
    assert set(fs.frame_idx) == {0, 1, 2, 3}
    one = fs[fs.doc_id == fs.doc_id.iloc[0]].sort_values("frame_idx")
    assert one.offset_ms.is_monotonic_increasing


def test_empty_input(spark):
    empty = spark.read.parquet(f"{SF}/documents.parquet").where("doc_id < 0")
    m = M.media_table(empty)
    assert M.image_features(m).count() == 0
    assert M.frame_sample(m).count() == 0


def test_media_progressive_jpeg_slice(media):
    """The doc_id % 48 == 15 slice must emit PROGRESSIVE (SOF2) color
    jpegs — the dominant web-delivery variant (round 5) — decodable by
    the general decoder through the same call site as baseline rows."""
    from ner_spark.codecs import decode_jpeg

    rows = media.where("doc_id % 48 = 15").limit(2).toPandas()
    assert len(rows) >= 1  # non-vacuous: the slice exists at this sf
    for _, r in rows.iterrows():
        p = bytes(r.payload)
        assert b"\xff\xc2" in p  # SOF2 frame header
        a = decode_jpeg(p)
        assert a.ndim == 3
        assert a.shape[:2] == (r.meta["height"], r.meta["width"])
