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

Two reader shapes under one format name:

* default — a SimpleDataSourceStreamReader on the DRIVER (right for a
  bounded synthetic feed / control-plane source), micro-batched
  ``convs_per_batch`` at a time with bit-identical replay;
* ``option("distributed", "true")`` — a partition-parallel
  ``DataSourceStreamReader``: ``partitions()`` carves the conversation
  range into ``convs_per_partition`` slices and ``read(partition)``
  GENERATES each slice on the EXECUTOR from a range-derived seed, so no
  corpus ever materializes on the driver. This is the 100-TB ingest
  shape, where offsets would be Iceberg snapshot ids and partitions the
  snapshot's file manifests. Because the Python ``latestOffset()`` is
  argless (the reader cannot see the checkpointed start after a
  restart), the bounded distributed feed advertises full availability —
  constant, hence restart-safe — and leaves rate-limited micro-batching
  to the driver-side simple reader.

Trigger.AvailableNow contract (pinned in
tests/test_transcript_stream.py::test_available_now_fallback_contract):
the Python DataSource API exposes no SupportsTriggerAvailableNow hook,
so Spark falls back to single-batch execution — each availableNow run
processes exactly ONE micro-batch, commits, and terminates; repeated
runs on the same checkpoint drain the feed exactly-once; post-
exhaustion runs are clean 0-row no-ops. availableNow here is
Trigger.Once, not drain-everything — a full drain takes
ceil(n_convs / convs_per_batch) runs, or use the processingTime drain
helpers in streaming/incremental.py."""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd


def range_corpus_pdf(seed: int, lo: int, hi: int) -> "pd.DataFrame":
    """The distributed source's per-partition generator (and the test
    oracle): conversations [lo, hi) as a pure function of (seed, lo,
    hi-lo). Each range draws from its own RNG (seed + 1000 + lo), then
    conv ids / event times are re-labeled by +lo so ranges concatenate
    into one corpus with globally unique conv ids and the same
    ts = base + conv_no hours + turn_idx seconds law as fixtures.gen."""
    from fixtures.gen import entity_catalog, transcripts_df

    pdf = transcripts_df(
        entity_catalog(seed), seed=seed + 1000 + lo, n_convs=hi - lo, n_hot=0
    )
    no = pdf.conv_id.str.lstrip("c").astype(int) + lo
    return pdf.assign(
        conv_id="c" + no.astype(str).str.zfill(8),
        ts=pdf.ts + pd.to_timedelta(lo, unit="h"),
    )

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
        DataSourceStreamReader,
        InputPartition,
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

        def streamReader(self, schema):
            if str(self.options.get("distributed", "false")).lower() == "true":
                return _TranscriptPartitionedStreamReader(self.options)
            # raises PySparkNotImplementedError → the runtime falls back
            # to simpleStreamReader (pyspark datasource_internal._streamReader)
            return super().streamReader(schema)

    class _ConvRangePartition(InputPartition):
        def __init__(self, seed: int, lo: int, hi: int):
            self.seed, self.lo, self.hi = seed, lo, hi

    class _TranscriptPartitionedStreamReader(DataSourceStreamReader):
        """Executor-parallel bounded feed: offset = conversations
        emitted, one InputPartition per ``convs_per_partition`` slice,
        rows generated ON THE EXECUTOR by range_corpus_pdf."""

        def __init__(self, options):
            self.n_convs = int(options.get("n_convs", "24"))
            self.per_part = int(options.get("convs_per_partition", "8"))
            self.seed = int(options.get("seed", "42"))
            # rate mode (bench cadence knob): advertise only
            # convs_per_batch new conversations per trigger instead of
            # constant full availability. The high-water mark lives on
            # this driver-side reader instance, so rate mode is for
            # FRESH-CHECKPOINT bounded runs only (bench.py --stream-kg):
            # after a restart the mark restarts at zero and earlier
            # conversations would be re-advertised. The restart-safe
            # default (0 = full availability) is unchanged.
            self.per_batch = int(options.get("convs_per_batch", "0"))
            self._hwm = 0

        def initialOffset(self) -> dict:
            return {"conv": 0}

        def latestOffset(self) -> dict:
            if self.per_batch:
                self._hwm = min(self.n_convs, self._hwm + self.per_batch)
                return {"conv": self._hwm}
            # constant full availability (see module docstring): the one
            # batch still fans out over len(partitions()) executor tasks
            return {"conv": self.n_convs}

        def partitions(self, start: dict, end: dict) -> list:
            lo, hi = start["conv"], end["conv"]
            return [
                _ConvRangePartition(self.seed, a, min(a + self.per_part, hi))
                for a in range(lo, hi, self.per_part)
            ]

        def read(self, part) -> Iterator[Tuple]:
            pdf = range_corpus_pdf(part.seed, part.lo, part.hi)
            return iter(
                (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
                for r in pdf.itertuples(index=False)
            )

        def commit(self, end: dict) -> None:
            # rate mode: never advertise below what the engine committed
            self._hwm = max(self._hwm, end.get("conv", 0))

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
            pdf = self._corpus()
            part = pdf[(pdf._no >= lo) & (pdf._no < hi)]
            return [
                (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
                for r in part.itertuples(index=False)
            ]

        def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
            # must be an ITERATOR, not a list: when the bounded feed is
            # exhausted (end == start) the runtime validates emptiness by
            # calling next() and expecting StopIteration — a list raises
            # TypeError there and kills the query right after the last
            # batch drains (pyspark datasource_internal
            # _SimpleStreamReaderWrapper.add_result_to_cache)
            lo = start["conv"]
            hi = min(lo + self.per_batch, self.n_convs)
            return iter(self._rows(lo, hi)), {"conv": hi}

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
