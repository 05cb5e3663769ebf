"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` stages
(SURVEY.md §2.10; task-brief "multimodal columns").

Three REAL container formats run end-to-end on stdlib-only codecs
(ner_spark/codecs.py; PNG/WAV round 3, baseline JPEG round 4): PNG
(zlib inflate + full filter-set unfiltering + CRC checks), WAV (stdlib
``wave`` PCM) and baseline-sequential JPEG (pure-numpy T.81
DCT + Huffman; grayscale round 4, YCbCr color with 4:2:0/4:4:4
interleaved scans + PROGRESSIVE (SOF2, spectral selection + successive
approximation) round 5). :func:`media_table` emits most image/audio
payloads in those containers — including COLOR 4:2:0 jpegs (the
dominant camera variant) and progressive color jpegs (the dominant web
delivery variant) — so the registry entries decode genuine formats
every run; jpeg rows are thumbnail-sized (<= 64 px a side)
because the entropy coder is a python loop — a real cluster swaps
libjpeg in at the same decode call site. The ``x-fake`` format (raw
``np.frombuffer``) remains for the stub path, and the codec's own
NotImplementedError boundary is now INSIDE the format (arithmetic/
hierarchical coding, sampling factors over 2), not the format or its
color/subsampling/progressive variants. Everything else is
production-shaped: binary Arrow transfer, struct metadata, batch
processing, binary-in/binary-out resize (PNG in → PNG out, JPEG in →
JPEG out), per-row frame sampling.

Scale notes: payload rows are wide (binary), so stages keep
maxRecordsPerBatch-bounded Arrow batches; operators are row-parallel
(repartition freely); outputs are flat columns (no driver collect).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ner_spark.codecs import (
    decode_jpeg,
    decode_png,
    decode_wav,
    encode_jpeg,
    encode_jpeg_gray,
    encode_jpeg_progressive,
    encode_png,
    encode_wav,
)

FAKE_FORMAT = "x-fake"

MEDIA_SCHEMA = (
    "doc_id bigint, kind string, payload binary, "
    "meta struct<format:string, width:int, height:int, "
    "sample_rate:int, duration_ms:int>"
)


# ---------------------------------------------------------------------------
# deterministic synthetic media over the documents table
# ---------------------------------------------------------------------------
def media_table(documents: DataFrame) -> DataFrame:
    """Derive a media table from ``documents`` (deterministic, no external
    data): kind cycles image/audio/video by doc_id; payload bytes are a
    pure function of (doc_id, size); metadata is computed from n_chars.

    Payload synthesis runs in a mapInPandas stage so the binary column is
    produced executor-side (never materialized on the driver)."""
    base = documents.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.struct(
            # most of the corpus ships in REAL containers (PNG for even
            # images, baseline JPEG for every 4th odd image, WAV for even
            # audio/video tracks) so the decode path below is a genuine
            # codec round-trip, not just the x-fake stub
            F.when(
                F.col("doc_id") % 2 == 0,
                F.when(F.col("doc_id") % 3 == 0, "png").otherwise("wav"),
            )
            .when(F.col("doc_id") % 12 == 3, "jpeg")
            .otherwise(FAKE_FORMAT)
            .alias("format"),
            # jpeg rows are thumbnails (16-63 px a side): the stdlib
            # entropy coder is per-block python, so the fixture keeps its
            # cost bounded (<= 64 DCT blocks per payload)
            F.when(
                F.col("doc_id") % 12 == 3, (F.col("n_chars") * 7) % 48 + 16
            )
            .otherwise((F.col("n_chars") * 7) % 512 + 16)
            .cast("int")
            .alias("width"),
            F.when(
                F.col("doc_id") % 12 == 3, (F.col("n_chars") * 13) % 48 + 16
            )
            .otherwise((F.col("n_chars") * 13) % 512 + 16)
            .cast("int")
            .alias("height"),
            F.lit(16000).alias("sample_rate"),
            ((F.col("n_chars") * 31) % 5000 + 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, kind, meta in zip(pdf.doc_id, pdf.kind, pdf.meta):
                if kind == "image":
                    n = meta["width"] * meta["height"]
                else:  # audio/video: one byte per ms of duration
                    n = meta["duration_ms"]
                # deterministic bytes: splitmix-style counter stream
                rng = np.random.default_rng(int(doc_id))
                raw = rng.integers(0, 256, n, dtype=np.uint8)
                if meta["format"] == "png":
                    payloads.append(
                        encode_png(raw.reshape(meta["height"], meta["width"]))
                    )
                elif meta["format"] == "jpeg":
                    if doc_id % 24 == 3 or doc_id % 48 == 15:
                        # color rows — 3-channel payload from a FRESH
                        # doc_id-seeded stream (independent of the `raw`
                        # draw above, so the golden recompute can
                        # regenerate it without replaying that draw).
                        # % 24 == 3: baseline 4:2:0, the dominant camera
                        # variant (round 5); % 48 == 15: PROGRESSIVE
                        # 4:2:0 (SOF2), the dominant web delivery
                        # variant (round 5) — same decode call site
                        rgb = np.random.default_rng(int(doc_id)).integers(
                            0, 256,
                            meta["height"] * meta["width"] * 3,
                            dtype=np.uint8,
                        ).reshape(meta["height"], meta["width"], 3)
                        enc = (
                            encode_jpeg_progressive
                            if doc_id % 48 == 15 else encode_jpeg
                        )
                        payloads.append(enc(rgb, subsampling="420"))
                    else:
                        payloads.append(
                            encode_jpeg_gray(
                                raw.reshape(meta["height"], meta["width"])
                            )
                        )
                elif meta["format"] == "wav":
                    payloads.append(encode_wav(raw, meta["sample_rate"]))
                else:
                    payloads.append(raw.tobytes())
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf[["doc_id", "kind", "payload", "meta"]]

    return base.mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# decode stubs (the only not-real part; see module docstring)
# ---------------------------------------------------------------------------
def decode_image(payload: bytes, meta: dict) -> np.ndarray:
    """bytes → (height, width) uint8 array. PNG and baseline JPEG decode
    through the real stdlib/numpy codecs (PNG color collapses to integer
    luma so downstream schemas stay rank-2); other codec-library formats
    still raise. NOTE jpeg decode is LOSSY: the decoded array is the
    codec's reconstruction, not the pre-encode payload bytes — stats
    downstream are over decoded pixels, as on a real cluster."""
    if meta["format"] == "png":
        a = decode_png(payload)
        if a.ndim == 3:  # RGB(A) → luma, integer arithmetic (deterministic)
            r, g, b = a[..., 0].astype(np.int32), a[..., 1], a[..., 2]
            a = ((r * 299 + g.astype(np.int32) * 587 + b.astype(np.int32) * 114)
                 // 1000).astype(np.uint8)
        return a
    if meta["format"] == "jpeg":
        a = decode_jpeg(payload)  # general baseline: gray OR YCbCr color
        if a.ndim == 3:  # color JPEG → luma, same integer collapse as PNG
            r, g, b = a[..., 0].astype(np.int32), a[..., 1], a[..., 2]
            a = ((r * 299 + g.astype(np.int32) * 587 + b.astype(np.int32) * 114)
                 // 1000).astype(np.uint8)
        return a
    if meta["format"] != FAKE_FORMAT:
        raise NotImplementedError(
            f"no codec for {meta['format']!r} in this environment; "
            "plug in PIL/turbojpeg here on a real cluster"
        )
    return np.frombuffer(payload, dtype=np.uint8).reshape(
        meta["height"], meta["width"]
    )


def decode_audio(payload: bytes, meta: dict) -> np.ndarray:
    """bytes → 1-D sample array (uint8 for 8-bit PCM/x-fake, int16 for
    16-bit PCM). WAV decodes through the real stdlib ``wave`` codec."""
    if meta["format"] == "wav":
        samples, _rate = decode_wav(payload)
        return samples
    if meta["format"] != FAKE_FORMAT:
        raise NotImplementedError(f"no codec for {meta['format']!r}")
    return np.frombuffer(payload, dtype=np.uint8)


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------
IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, mean_intensity double, "
    "std_intensity double, histogram array<bigint>"
)


def image_features(media: DataFrame, n_bins: int = 8) -> DataFrame:
    """Decode → per-image intensity stats + fixed-width histogram."""
    imgs = media.where(F.col("kind") == "image")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf.doc_id, pdf.payload, pdf.meta):
                a = decode_image(payload, meta)
                hist = np.bincount(a.ravel() >> (8 - n_bins.bit_length() + 1),
                                   minlength=n_bins)[:n_bins]
                rows.append(
                    (doc_id, meta["width"], meta["height"],
                     float(a.mean()), float(a.std()), hist.tolist())
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "mean_intensity",
                         "std_intensity", "histogram"],
            )

    return imgs.mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, payload binary, "
    "meta struct<format:string, width:int, height:int, "
    "sample_rate:int, duration_ms:int>"
)


def image_resize(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Binary-in → binary-out nearest-neighbor resize (production shape:
    decode, transform, re-encode inside one Arrow batch)."""
    imgs = media.where(F.col("kind") == "image")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for payload, meta in zip(pdf.payload, pdf.meta):
                a = decode_image(payload, meta)
                yi = (np.arange(height) * a.shape[0] // height)[:, None]
                xi = (np.arange(width) * a.shape[1] // width)[None, :]
                resized = a[yi, xi]
                # container-preserving: PNG in → PNG out, JPEG in → JPEG
                # out (real re-encodes); x-fake stays raw bytes
                if meta["format"] == "png":
                    out_payload.append(encode_png(resized))
                elif meta["format"] == "jpeg":
                    out_payload.append(encode_jpeg_gray(resized))
                else:
                    out_payload.append(resized.tobytes())
                m = dict(meta)
                m["width"], m["height"] = width, height
                out_meta.append(m)
            yield pd.DataFrame(
                {"doc_id": pdf.doc_id, "payload": out_payload, "meta": out_meta}
            )

    return imgs.mapInPandas(fn, RESIZE_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, offset_ms int, frame_mean double"


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Sample n equally-spaced frames from audio/video payloads → one row
    per frame (UDTF-shaped output from mapInPandas)."""
    av = media.where(F.col("kind").isin("audio", "video"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf.doc_id, pdf.payload, pdf.meta):
                samples = decode_audio(payload, meta)
                dur = meta["duration_ms"]
                for k in range(n_frames):
                    off = k * dur // n_frames
                    chunk = samples[off : off + max(1, dur // n_frames)]
                    rows.append((doc_id, k, off, float(chunk.mean())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "offset_ms", "frame_mean"]
            )

    return av.mapInPandas(fn, FRAMES_SCHEMA)
