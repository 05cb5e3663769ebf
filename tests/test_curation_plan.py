"""Curation pipeline (plans/curation.py): decision invariants and the
same kill-and-resume contract the KG pipeline carries — both run the
xxhash64 production hash (the MD5 differential twin is `curation_decide`
in tests/test_queries_duckdb.py).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from ner_spark import io as nio
from ner_spark.plans.curation import curate

SF_DIR = "/root/testdata/sf0.001"
STAGES = ["signatures", "pairs", "clusters", "decision", "report"]
KEEP = {"signatures", "pairs"}  # committed before the simulated kill


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _manifest(warehouse: str, stage: str) -> dict:
    with open(os.path.join(warehouse, stage, "_manifest.json")) as f:
        return json.load(f)


def _decision_pdf(out) -> pd.DataFrame:
    return (
        out["decision"]
        .toPandas()
        .sort_values("doc_id", kind="mergesort")
        .reset_index(drop=True)
    )


def test_decision_invariants(spark):
    out = curate(spark, _docs(spark))
    dec = _decision_pdf(out)
    docs = _docs(spark).toPandas()

    # total coverage: one decision row per document
    assert sorted(dec.doc_id) == sorted(docs.doc_id)
    # every unclustered doc is kept
    assert dec[dec.cluster_id.isna()].keep.all()
    # every cluster keeps exactly one member, and it is the
    # (max n_chars, min doc_id) winner
    nch = dict(zip(docs.doc_id, docs.n_chars))
    clustered = dec[dec.cluster_id.notna()]
    assert len(clustered) > 0  # non-vacuous: the fixture has near-dups
    for cid, grp in clustered.groupby("cluster_id"):
        kept = grp[grp.keep]
        assert len(kept) == 1, f"cluster {cid} kept {len(kept)}"
        winner = max(grp.doc_id, key=lambda d: (nch[d], -d))
        assert kept.doc_id.iloc[0] == winner

    # decision carries source (report needs no second corpus scan) and
    # the report reconciles with it
    assert dict(zip(dec.doc_id, dec.source)) == dict(
        zip(docs.doc_id, docs.source)
    )
    rep = out["report"].toPandas()
    for r in rep.itertuples():
        g = dec[dec.source == r.source]
        assert r.n_docs == len(g) and r.n_kept == int(g.keep.sum())


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "curation_wh")


def test_curation_kill_and_resume(spark, warehouse):
    run = lambda resume: curate(  # noqa: E731
        spark, _docs(spark), warehouse=warehouse, run_id="c1", resume=resume
    )

    full = _decision_pdf(run(resume=False))
    stamps = {s: _manifest(warehouse, s)["completed_at"] for s in STAGES}

    # simulated kill after `pairs` committed
    for s in set(STAGES) - KEEP:
        os.remove(os.path.join(warehouse, s, "_manifest.json"))
        assert not nio.table_complete(os.path.join(warehouse, s), "c1")

    resumed = _decision_pdf(run(resume=True))

    for s in KEEP:
        assert _manifest(warehouse, s)["completed_at"] == stamps[s], s
    for s in set(STAGES) - KEEP:
        assert _manifest(warehouse, s)["completed_at"] > stamps[s], s

    pd.testing.assert_frame_equal(full, resumed)

    # lineage covers every stage after the resumed run
    lin = pd.read_parquet(os.path.join(warehouse, "lineage_c1.parquet"))
    assert set(lin.stage) == set(STAGES)
