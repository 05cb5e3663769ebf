#!/usr/bin/env python
"""Stream-fed KG tick profile at two event-time densities (round-4
VERDICT item 4): the fixture's historical 1-conversation-per-hour corpus
puts ~64k rows into thousands of days(ts)+bucket(16) dirs — per-dir
overhead then dominates the drain and the headline rows/s embeds a
layout artifact, not an engine cost. This harness runs the SAME rows at
the fixture density AND at production-like density (~10^3 conversations
per day-dir, file-sized dirs) and appends both to BENCH/BASELINE.md.

    python tools/tick_profile.py [--convs 8000]
"""
import argparse
import glob
import os
import shutil
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def profile(spark, density: int, n_convs: int) -> dict:
    from fixtures.gen import entity_catalog, transcripts_df
    from ner_spark.plans.wap import wap_ingest
    from ner_spark.sources.iceberg_stream import IcebergStreamDataSource

    cat = entity_catalog(42)
    pdf = transcripts_df(
        cat, n_convs=n_convs, median_turns=8, n_hot=8, hot_turns=400,
        convs_per_hour=density,
    )
    batch = spark.createDataFrame(pdf)
    loc = tempfile.mkdtemp(prefix=f"tick_{density}_")
    shutil.rmtree(loc)
    try:
        t0 = time.perf_counter()
        res = wap_ingest(spark, batch, loc, batch_id="b0")
        ingest_sec = time.perf_counter() - t0
        assert res["published"], res
        n_files = len(glob.glob(f"{loc}/data/**/*.parquet", recursive=True))

        spark.dataSource.register(IcebergStreamDataSource)
        ckpt = tempfile.mkdtemp(prefix="tick_ck_")
        t1 = time.perf_counter()
        q = (
            spark.readStream.format("iceberg_stream")
            .option("location", loc)
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        drain_sec = time.perf_counter() - t1
        rows = int(sum(p["numInputRows"] for p in q.recentProgress))
        shutil.rmtree(ckpt, ignore_errors=True)
        return {
            "density": density,
            "rows": len(pdf),
            "files": n_files,
            "ingest_sec": round(ingest_sec, 1),
            "ingest_rows_per_sec": round(len(pdf) / ingest_sec, 1),
            "drain_sec": round(drain_sec, 1),
            "drain_rows_per_sec": round(rows / drain_sec, 1),
            "drain_rows": rows,
        }
    finally:
        shutil.rmtree(loc, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=8000)
    a = ap.parse_args()

    from ner_spark.session import get_spark

    spark = get_spark(app="tick-profile")
    rows = []
    # 1/hr = the historical fixture artifact; 42/hr ≈ 10^3 convs/day-dir
    for density in (1, 42):
        r = profile(spark, density, a.convs)
        rows.append(r)
        print(r, flush=True)

    md = os.path.join(_ROOT, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(
            "\n## Stream-fed tick at fixture vs production density "
            "({}, {} convs, layout days(ts)+bucket(16, conv_id))\n\n"
            "| convs/hour | rows | data files | WAP ingest | "
            "stream drain |\n| --- | --- | --- | --- | --- |\n".format(
                time.strftime("%Y-%m-%d %H:%M:%S"), a.convs
            )
        )
        for r in rows:
            f.write(
                "| {density} | {rows} | {files} | {ingest_sec}s "
                "({ingest_rows_per_sec}/s) | {drain_sec}s "
                "({drain_rows_per_sec}/s) |\n".format(**r)
            )
    spark.stop()


if __name__ == "__main__":
    main()
