"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship: the full KG pipeline (SURVEY.md §3.2) over the
  deterministic transcript fixture (the input-hint table, FIXTURES.md §B,
  seed=42; driver testdata carries no transcripts table), returning the
  top-10 canonical PER/ORG entities by mention count.
- ``queries()`` — one entry per implemented operator from SURVEY.md §2 plus
  the training-data ops (dedup / similarity / text analysis), over
  /root/testdata parquet tables.
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible entry;
  the deterministic KG/streaming/multimodal entries carry golden-snapshot
  oracles instead (committed parquet pinned against the single-process
  oracle by tools/make_goldens.py; ner_spark/goldens.py). Only the
  approximate-sketch entry stays rows-only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# driver may import this file from any CWD; make the repo importable for the
# driver process and (via PYTHONPATH) freshly-spawned python workers
_ROOT = os.path.dirname(os.path.abspath(__file__))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# importing these modules populates the registry
import ner_spark.queries_relational  # noqa: F401
import ner_spark.queries_text  # noqa: F401
import ner_spark.queries_kg  # noqa: F401
import ner_spark.queries_graph  # noqa: F401
import ner_spark.queries_multimodal  # noqa: F401
import ner_spark.queries_iceberg  # noqa: F401
import ner_spark.goldens  # noqa: F401  (golden-snapshot oracles, after all registers)
from ner_spark.registry import ORACLE_SQL, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: KG build → top-10 PER/ORG entities by mention count."""
    from ner_spark.deploy import ensure_py_files
    from ner_spark.queries_kg import _kg_outputs

    ensure_py_files(spark)

    out = _kg_outputs(spark, "tiny")
    return (
        out["entities"]
        .where(F.col("ner_type").isin("PER", "ORG"))
        .orderBy(F.desc("n_mentions"), "entity_id")
        .select(
            "entity_id",
            F.concat_ws("|", "aliases").alias("aliases"),
            "ner_type",
            "n_mentions",
        )
        .limit(10)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
