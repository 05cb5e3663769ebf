"""Triple extraction from role/tool-aware turn patterns
(SURVEY.md §2.4 B5, §2.7 B14, spec P_REL / P_COOC / P_TOOL).

Shapes:
- consecutive-mention pairs via a lead() window per (conv_id, turn_idx)
  ordered by mention start (B14-style turn-context window);
- between-text classification + confidence in a vectorized pandas UDF
  (python casefold + python round are the binding semantics);
- P_TOOL uses the union+window as-of trick (SURVEY.md C12) to find the
  nearest previous turn with a linked mention, JSON payload parsed
  python-side, subject resolved through a broadcast unambiguous-surface map;
- canonicalization = two broadcast joins against the (entity→canonical) map;
- final dedup: groupBy (subj, pred, obj, conv_id, turn_idx) max(confidence).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ner_spark import spec

_PAIR_SCHEMA = (
    "conv_id string, turn_idx int, subj string, pred string, obj string, "
    "confidence double"
)


def _pairs_with_text(links: DataFrame, transcripts: DataFrame) -> DataFrame:
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("start")
    pairs = (
        links.select(
            "conv_id",
            "turn_idx",
            "entity_id",
            "link_score",
            "sent_idx",
            "start",
            "end",
            F.lead("entity_id").over(w).alias("b_entity"),
            F.lead("link_score").over(w).alias("b_score"),
            F.lead("sent_idx").over(w).alias("b_sent_idx"),
            F.lead("start").over(w).alias("b_start"),
        )
        .where(F.col("b_entity").isNotNull())
    )
    # the between-mention span is sliced JVM-side: substring counts code
    # points exactly like python slicing (UTF8String chars == str indices,
    # and len<=0 yields "" just like text[end:b_start] when the mentions
    # touch), so the Arrow boundary ships a few chars per pair instead of
    # the full turn text
    return (
        pairs.join(
            transcripts.select("conv_id", "turn_idx", "text"),
            on=["conv_id", "turn_idx"],
            how="inner",
        )
        .withColumn(
            "between",
            F.col("text").substr(
                F.col("end") + F.lit(1), F.col("b_start") - F.col("end")
            ),
        )
        .drop("text")
    )


def rel_cooc_triples(links: DataFrame, transcripts: DataFrame) -> DataFrame:
    pt = _pairs_with_text(links, transcripts)

    def classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # the between slice arrived pre-cut from the JVM; strip /
            # casefold / phrase lookup vectorize over the batch; the
            # confidence keeps python-round semantics (correctly-rounded
            # half-even) via the guarded vectorized batch rounder
            rel = (
                pdf["between"].str.strip()
                .str.casefold()
                .map(spec.REL_PHRASES)
                .where(pdf["sent_idx"].eq(pdf["b_sent_idx"]))
            )
            preds = rel.fillna(spec.COOC_PRED)
            confs = spec.round_half_even_batch(
                pdf["link_score"].to_numpy() * pdf["b_score"].to_numpy(),
                spec.SCORE_NDIGITS,
            )
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "subj": pdf["entity_id"],
                    "pred": preds,
                    "obj": pdf["b_entity"],
                    "confidence": pd.Series(
                        confs, index=pdf.index, dtype="float64"
                    ),
                }
            )

    return pt.mapInPandas(classify, _PAIR_SCHEMA)


def tool_triples(
    links: DataFrame,
    transcripts: DataFrame,
    gazetteer_pdf: pd.DataFrame,
    spark: SparkSession,
) -> DataFrame:
    """P_TOOL (spec): subj = unambiguous gazetteer entity of the JSON
    args.entity; obj = first linked mention of the nearest previous turn."""
    # broadcast unambiguous norm_surface → entity_id map
    norm = [spec.norm_surface(s) for s in gazetteer_pdf["surface_form"]]
    g = pd.DataFrame({"n": norm, "e": gazetteer_pdf["entity_id"]}).drop_duplicates()
    counts = g.groupby("n")["e"].nunique()
    unamb = g[g["n"].isin(counts[counts == 1].index)]
    bc = spark.sparkContext.broadcast(dict(zip(unamb["n"], unamb["e"])))

    def parse_tool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = bc.value
        for pdf in batches:
            subjs, tools = [], []
            for text in pdf["text"]:
                try:
                    payload = json.loads(text)
                    tool_name = payload["tool"]
                    surf = payload["args"]["entity"]
                    subjs.append(m.get(spec.norm_surface(surf)))
                    tools.append(tool_name)
                except (ValueError, KeyError, TypeError):
                    subjs.append(None)
                    tools.append(None)
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "subj_raw": pd.array(subjs, dtype="object"),
                    "tool_name": pd.array(tools, dtype="object"),
                }
            )

    tool_rows = (
        transcripts.where(F.col("role") == "tool")
        .select("conv_id", "turn_idx", "text")
        .mapInPandas(
            parse_tool,
            "conv_id string, turn_idx int, subj_raw string, tool_name string",
        )
        .where(F.col("subj_raw").isNotNull())
    )

    first_per_turn = links.groupBy("conv_id", "turn_idx").agg(
        F.min_by("entity_id", "start").alias("first_ent")
    )

    # union + window as-of: nearest previous turn with a linked mention
    a = first_per_turn.select(
        "conv_id", "turn_idx", "first_ent",
        F.lit(None).cast("string").alias("subj_raw"),
        F.lit(None).cast("string").alias("tool_name"),
        F.lit(0).alias("is_tool"),
    )
    b = tool_rows.select(
        "conv_id", "turn_idx",
        F.lit(None).cast("string").alias("first_ent"),
        "subj_raw", "tool_name", F.lit(1).alias("is_tool"),
    )
    # same-turn link rows sort AFTER the tool row (is_tool desc) so the
    # preceding-rows frame only sees strictly earlier turns' mentions
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").asc(), F.col("is_tool").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        a.unionByName(b)
        .withColumn("obj", F.last("first_ent", ignorenulls=True).over(w))
        .where((F.col("is_tool") == 1) & F.col("obj").isNotNull())
        .select(
            "conv_id",
            "turn_idx",
            F.col("subj_raw").alias("subj"),
            F.concat(F.lit(spec.TOOL_PRED_PREFIX), F.col("tool_name")).alias("pred"),
            "obj",
            F.lit(1.0).alias("confidence"),
        )
    )


def canonicalize_triples(triples: DataFrame, canon: DataFrame) -> DataFrame:
    """Map subj/obj through the canonical-entity map (broadcast joins) and
    dedup on the 5-tuple keeping max confidence."""
    c = F.broadcast(canon)
    out = (
        triples.join(
            c.withColumnRenamed("entity_id", "subj").withColumnRenamed(
                "canonical_id", "subj_canon"
            ),
            on="subj",
            how="left",
        )
        .join(
            c.withColumnRenamed("entity_id", "obj").withColumnRenamed(
                "canonical_id", "obj_canon"
            ),
            on="obj",
            how="left",
        )
        .select(
            F.coalesce("subj_canon", "subj").alias("subj"),
            "pred",
            F.coalesce("obj_canon", "obj").alias("obj"),
            "conv_id",
            "turn_idx",
            "confidence",
        )
    )
    return out.groupBy("subj", "pred", "obj", "conv_id", "turn_idx").agg(
        F.max("confidence").alias("confidence")
    )
