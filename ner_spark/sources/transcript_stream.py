"""Spark 4 Python streaming DataSource: a deterministic transcript
stream (SURVEY.md §2.1/§2.9 — the custom-connector form of the
streaming ingest, complementing the file-based readStream paths).

``spark.dataSource.register(TranscriptStreamDataSource)`` then
``spark.readStream.format("transcript_gen").option(...).load()`` yields
micro-batches of whole conversations from the same deterministic
generator the batch fixtures use (fixtures/gen.py), so stream-vs-batch
parity is exact by construction: offset k = "conversations [0, k) have
been emitted", each batch advances by ``convs_per_batch``, and
``readBetweenOffsets`` replays any window bit-identically because the
corpus is a pure function of the seed — the replayability contract
checkpoint recovery depends on.

A SimpleDataSourceStreamReader runs on the DRIVER and ships rows to
executors (right for a bounded synthetic feed / control-plane source;
a partition-parallel ``streamReader`` is the shape for real 100-TB
ingest, where offsets would be Iceberg snapshot ids and partitions the
snapshot's file manifests)."""

from __future__ import annotations

from typing import Iterator, Tuple

TRANSCRIPT_DDL = (
    # ts is timestamp_ntz: the generator (and every fixture parquet) is
    # tz-naive wall-clock, the same convention streaming/incremental.py's
    # TRANSCRIPT_SCHEMA pins for the file-based stream
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz"
)

try:  # pyspark >= 4 only; import-gated like ConllDataSource
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class TranscriptStreamDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "transcript_gen"

        def schema(self) -> str:
            return TRANSCRIPT_DDL

        def simpleStreamReader(self, schema):
            return _TranscriptStreamReader(self.options)

    class _TranscriptStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.n_convs = int(options.get("n_convs", "24"))
            self.per_batch = int(options.get("convs_per_batch", "8"))
            self.seed = int(options.get("seed", "42"))
            self._pdf = None  # generated lazily, once per reader

        def _corpus(self):
            if self._pdf is None:
                from fixtures.gen import entity_catalog, transcripts_df

                pdf = transcripts_df(
                    entity_catalog(self.seed),
                    seed=self.seed,
                    n_convs=self.n_convs,
                    n_hot=0,
                )
                # conv_id is 'c<no>'; order by numeric conv for slicing
                pdf = pdf.assign(
                    _no=pdf.conv_id.str.lstrip("c").astype(int)
                ).sort_values(["_no", "turn_idx"], kind="mergesort")
                self._pdf = pdf
            return self._pdf

        def initialOffset(self) -> dict:
            return {"conv": 0}

        def _rows(self, lo: int, hi: int) -> list:
            # a LIST, not a generator: the simple-reader runtime pickles
            # the prefetched batch to cache it for replay
            pdf = self._corpus()
            part = pdf[(pdf._no >= lo) & (pdf._no < hi)]
            return [
                (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
                for r in part.itertuples(index=False)
            ]

        def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
            lo = start["conv"]
            hi = min(lo + self.per_batch, self.n_convs)
            return self._rows(lo, hi), {"conv": hi}

        def readBetweenOffsets(
            self, start: dict, end: dict
        ) -> Iterator[Tuple]:
            # replay after failure: pure-function corpus → bit-identical.
            # Must be an ITERATOR — the replay runtime calls next() on it
            # directly (read()'s prefetch path instead pickles a list)
            return iter(self._rows(start["conv"], end["conv"]))

        def commit(self, end: dict) -> None:
            pass  # nothing to clean up — the source is generated

except ImportError:  # pragma: no cover — pyspark < 4
    TranscriptStreamDataSource = None
