#!/usr/bin/env python
"""Batch KG pipeline entry point (SURVEY.md §3.2; BASELINE.json
"spark-submit --py-files" [B:14]).

Cluster:
    spark-submit --master <cluster> --py-files kg.zip jobs/build_kg.py \
        --input s3://.../transcripts --gazetteer ... --embeddings ... \
        --warehouse s3://.../kg --run-id R7 --partitions 4096

Sandbox (same code path, local master from SPARK_GRAFT_CPUS):
    python jobs/build_kg.py --fixture small --warehouse /tmp/kg --run-id r1

Build kg.zip with:  cd /root/repo && zip -r kg.zip ner_spark fixtures oracle
(`ner_spark.deploy.ensure_py_files` also self-ships the packages when the
job runs from a plain python driver, so --py-files is optional locally.)

Idempotent resume: rerunning with the same --warehouse/--run-id skips
committed stages; --no-resume forces a full rebuild.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="transcripts table/path (parquet)")
    ap.add_argument("--gazetteer", help="gazetteer parquet path")
    ap.add_argument("--embeddings", help="entity embeddings parquet path")
    ap.add_argument("--fixture", help="use a named generated fixture instead "
                    "of --input/--gazetteer/--embeddings (tiny|small|eval|...)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", default="r1")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--model",
        choices=["fixture", "trained"],
        default="fixture",
        help="mention model: 'fixture' = the generated weights; "
        "'trained' = train the distributed structured perceptron on the "
        "CoNLL corpus first (nlp/train.py) and run the pipeline on the "
        "learned weights (the production loop: train -> broadcast -> "
        "score)",
    )
    ap.add_argument(
        "--model-npz",
        help="load mention-model weights from a .npz with arrays WT "
        "(D, L float32), T, start — e.g. saved from a previous "
        "--model trained run (takes precedence over --model)",
    )
    ap.add_argument(
        "--train-corpus",
        default="tiny",
        help="CoNLL fixture name to train on when --model trained",
    )
    ap.add_argument(
        "--train-iters", type=int, default=12,
        help="training passes for --model trained",
    )
    ap.add_argument(
        "--task-cpus",
        type=int,
        default=None,
        help="spark.task.cpus for the job (default: 2 on local masters with "
        ">= 16 cores — each pandas-UDF task pins a JVM thread AND a python "
        "worker, so slots must be sized to ~half the cores or the job "
        "oversubscribes 2x; see BENCH/BASELINE.md)",
    )
    a = ap.parse_args()

    import pandas as pd

    from ner_spark.plans.kg import build_kg
    from ner_spark.session import get_spark, kg_task_cpus

    task_cpus = (
        str(a.task_cpus) if a.task_cpus is not None else kg_task_cpus(a.master)
    )
    extra = {"spark.task.cpus": task_cpus} if task_cpus != "1" else {}
    spark = get_spark(master=a.master, app=f"kg-build-{a.run_id}", extra=extra)
    if a.fixture:
        from fixtures.gen import ensure_fixture_dir

        d = ensure_fixture_dir(a.fixture)
        tx_path, gaz_path, emb_path = (
            f"{d}/transcripts.parquet",
            f"{d}/gazetteer.parquet",
            f"{d}/entity_embeddings.parquet",
        )
    else:
        if not (a.input and a.gazetteer and a.embeddings):
            ap.error("--input/--gazetteer/--embeddings or --fixture required")
        tx_path, gaz_path, emb_path = a.input, a.gazetteer, a.embeddings

    model = None
    train_sec = 0.0
    if a.model_npz:
        import numpy as np

        z = np.load(a.model_npz)
        model = {"WT": z["WT"], "T": z["T"], "start": z["start"]}
    elif a.model == "trained":
        from ner_spark.nlp.train import (
            sentences_from_conll,
            structural_transitions,
            train_perceptron,
        )
        from ner_spark.sources.conll import ensure_conll_fixture, read_conll

        t_tr = time.perf_counter()
        sents = sentences_from_conll(
            read_conll(spark, ensure_conll_fixture(a.train_corpus))
        )
        WT, _ = train_perceptron(
            spark, sents, pd.read_parquet(gaz_path), iters=a.train_iters
        )
        T, start = structural_transitions()
        model = {"WT": WT, "T": T, "start": start}
        train_sec = round(time.perf_counter() - t_tr, 2)

    t0 = time.perf_counter()
    out = build_kg(
        spark,
        spark.read.parquet(tx_path),
        pd.read_parquet(gaz_path),
        spark.read.parquet(emb_path),
        warehouse=a.warehouse,
        run_id=a.run_id,
        resume=not a.no_resume,
        n_partitions=a.partitions,
        model=model,
    )
    metrics = {
        "run_id": a.run_id,
        "warehouse": a.warehouse,
        "model": "npz" if a.model_npz else a.model,
        "train_sec": train_sec,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "rows": {name: df.count() for name, df in out.items()},
    }
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
