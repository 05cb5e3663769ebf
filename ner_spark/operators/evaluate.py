"""B6 — gold-vs-pred span evaluation as DataFrame joins (SURVEY.md §2.4,
§5.1 conlleval semantics: a span counts iff type AND boundaries match).

One full-outer join on the exact span key + a rollup aggregation gives
per-type AND overall precision/recall/F1 in a single shuffle — the
join-then-anti-join formulation costs three. This is the distributed
mirror of the driver's acceptance metric shape (triple P/R, BASELINE.json)
and of the reference's conlleval protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_KEY = ["conv_id", "turn_idx", "start", "end", "ner_type"]


def span_prf(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Exact-span P/R/F1 per ner_type plus an '__all__' rollup row.

    Inputs need the SPAN_KEY columns; duplicates are collapsed (a span
    either is or is not predicted — conlleval semantics)."""
    p = pred.select(*SPAN_KEY).distinct().withColumn("in_p", F.lit(1))
    g = gold.select(*SPAN_KEY).distinct().withColumn("in_g", F.lit(1))
    j = p.join(g, on=SPAN_KEY, how="full_outer").select(
        F.col("ner_type"),
        F.coalesce("in_p", F.lit(0)).alias("in_p"),
        F.coalesce("in_g", F.lit(0)).alias("in_g"),
    )
    agg = (
        j.rollup("ner_type")
        .agg(
            F.sum(F.col("in_p") * F.col("in_g")).alias("tp"),
            F.sum(F.col("in_p") * (1 - F.col("in_g"))).alias("fp"),
            F.sum((1 - F.col("in_p")) * F.col("in_g")).alias("fn"),
        )
        .select(
            F.coalesce("ner_type", F.lit("__all__")).alias("ner_type"),
            "tp", "fp", "fn",
        )
    )
    prec = F.try_divide("tp", F.col("tp") + F.col("fp"))
    rec = F.try_divide("tp", F.col("tp") + F.col("fn"))
    f1 = F.try_divide(2 * prec * rec, prec + rec)
    return agg.select(
        "ner_type", "tp", "fp", "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
