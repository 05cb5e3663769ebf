"""Entity linking (SURVEY.md §2.4 B1/B2, §2.7 B13).

B1  gazetteer candidate join — broadcast hash join (small build side).
B2  link-score join against entity embeddings — the skew hot spot: AQE
    skew-join handles hot entities (spark.sql.adaptive.skewJoin.enabled is
    set by ner_spark.session); no manual salting needed because the
    embedding side is keyed by unique entity_id (no key explosion on the
    build side) and AQE splits oversized candidate partitions.
B13 deterministic top-1 per mention: max link_score, ties → min entity_id.

Cosine is computed by a vectorized pandas UDF calling spec.cosine64 per
candidate (float64 np.dot — the binding arithmetic; candidates are sparse,
~1 per mention, so the python-level loop inside the Arrow batch is not the
hot path; everything else is JVM-side).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ner_spark import spec


# DoubleType() instance (a "double" DDL string would need an active session
# at import time)
@pandas_udf(DoubleType())
def _link_score64(a: pd.Series, b: pd.Series) -> pd.Series:
    """round(W_GAZ + W_EMB*cosine64, 6) with *python* round semantics
    (half-even on the binary double) — Spark's F.round is decimal HALF_UP
    and would disagree with the oracle on exact boundary values."""
    out = []
    for x, y in zip(a, b):
        cos = 0.0 if x is None or y is None else spec.cosine64(x, y)
        out.append(
            round(
                spec.LINK_W_GAZ * spec.GAZ_SCORE_EXACT + spec.LINK_W_EMB * cos,
                spec.SCORE_NDIGITS,
            )
        )
    return pd.Series(out, dtype="float64")


def gazetteer_norm(spark: SparkSession, gazetteer_pdf: pd.DataFrame) -> DataFrame:
    """Gazetteer with python-casefold norm_surface, distinct candidate rows."""
    g = gazetteer_pdf.copy()
    g["norm_surface"] = [spec.norm_surface(s) for s in g["surface_form"]]
    return spark.createDataFrame(
        g[["norm_surface", "entity_id", "ner_type"]].drop_duplicates()
    )


def link_mentions(
    mentions: DataFrame,
    gaz_norm: DataFrame,
    entity_embeddings: DataFrame,
) -> DataFrame:
    """mentions → links (one best entity per linked mention).

    Output: conv_id, turn_idx, mention start/end/sent_idx, norm_surface,
    entity_id, link_score.
    """
    cands = mentions.join(
        F.broadcast(gaz_norm), on=["norm_surface", "ner_type"], how="inner"
    )
    scored = cands.join(entity_embeddings, on="entity_id", how="left").withColumn(
        "link_score", _link_score64("ctx_emb", "embedding")
    )
    w = Window.partitionBy("conv_id", "turn_idx", "start").orderBy(
        F.desc("link_score"), F.asc("entity_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "conv_id",
            "turn_idx",
            "start",
            "end",
            "sent_idx",
            "norm_surface",
            "ner_type",
            "entity_id",
            "link_score",
        )
    )
