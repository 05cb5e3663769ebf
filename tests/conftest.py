"""Shared test fixtures: one local SparkSession per test session (Arrow+AQE
on), deterministic small fixtures materialized on demand, oracle outputs
computed once. ``python -m pytest -x -q`` is the acceptance command
(BASELINE.json:15)."""

from __future__ import annotations

import pandas as pd
import pytest

from fixtures.gen import ensure_fixture_dir
from ner_spark.session import get_spark
from oracle.ref_pipeline import run_on_dir


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", app="ner-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_dir() -> str:
    return ensure_fixture_dir("small")


@pytest.fixture(scope="session")
def oracle_small(small_dir) -> dict[str, pd.DataFrame]:
    return run_on_dir(small_dir)


@pytest.fixture(scope="session")
def small_inputs(spark, small_dir):
    return {
        "transcripts": spark.read.parquet(f"{small_dir}/transcripts.parquet"),
        "gazetteer_pdf": pd.read_parquet(f"{small_dir}/gazetteer.parquet"),
        "entity_embeddings": spark.read.parquet(
            f"{small_dir}/entity_embeddings.parquet"
        ),
    }


@pytest.fixture(scope="session")
def kg_small(spark, small_inputs):
    from ner_spark.plans.kg import build_kg

    return build_kg(
        spark,
        small_inputs["transcripts"],
        small_inputs["gazetteer_pdf"],
        small_inputs["entity_embeddings"],
    )
