"""Multimodal queries for the driver harness (ner_spark.multimodal).

mm_meta_stats is fully SQL-expressible (the synthetic metadata is a pure
function of documents.n_chars, so DuckDB reproduces it without touching
binary columns). The decode-dependent operators are rows-only entries,
exact-value-tested in tests/test_multimodal.py instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.multimodal import (
    frame_sample,
    image_features,
    image_resize,
    media_table,
)
from ner_spark.registry import register, t


def _media(spark, sf):
    return media_table(t(spark, sf, "documents"))


@register(
    "mm_meta_stats",
    """
    WITH media AS (
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             CAST(CASE WHEN doc_id % 12 = 3 THEN (n_chars * 7) % 48 + 16
                       ELSE (n_chars * 7) % 512 + 16 END AS INT) AS width,
             CAST(CASE WHEN doc_id % 12 = 3 THEN (n_chars * 13) % 48 + 16
                       ELSE (n_chars * 13) % 512 + 16 END AS INT) AS height,
             CAST((n_chars * 31) % 5000 + 1000 AS INT) AS duration_ms
      FROM documents)
    SELECT kind, COUNT(*) AS n_items,
           CAST(SUM(CAST(width AS BIGINT) * height) AS BIGINT) AS total_pixels,
           ROUND(AVG(duration_ms), 6) AS avg_duration_ms
    FROM media GROUP BY kind ORDER BY kind
    """,
)
def mm_meta_stats(spark, sf):
    """Typed-metadata aggregation over the media table (binary payloads
    pruned away — the scan never synthesizes them thanks to column
    pruning through the projection)."""
    m = _media(spark, sf)
    return (
        m.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.col("meta.width").cast("bigint") * F.col("meta.height")
            ).alias("total_pixels"),
            F.round(F.avg("meta.duration_ms"), 6).alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )


@register("mm_image_features")
def mm_image_features(spark, sf):
    """Decode-stub image feature extraction (mean/std/histogram) via
    mapInPandas over binary payloads; rows-only (exact values unit-tested)."""
    return image_features(_media(spark, sf)).drop("histogram")


@register("mm_image_resize")
def mm_image_resize(spark, sf):
    """Binary-in/binary-out resize; returns shape metadata + DECODED
    pixel stats. Decoding the output payload (rather than reporting its
    byte length) both proves the re-encoded container round-trips and
    keeps the golden snapshot independent of the local zlib build —
    compressed PNG sizes differ between zlib implementations at the same
    level, decoded pixels never do."""
    from typing import Iterator

    import pandas as pd

    from ner_spark.multimodal import decode_image

    r = image_resize(_media(spark, sf))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf.doc_id, pdf.payload, pdf.meta):
                a = decode_image(bytes(payload), meta)
                rows.append(
                    (doc_id, meta["width"], meta["height"],
                     int(a.sum()), int(a.size))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "pixel_sum", "n_pixels"],
            )

    return r.mapInPandas(
        fn,
        "doc_id bigint, width int, height int, pixel_sum bigint, "
        "n_pixels bigint",
    )


@register("mm_frame_sample")
def mm_frame_sample(spark, sf):
    """Equally-spaced frame sampling from audio/video payloads."""
    return frame_sample(_media(spark, sf))
