"""Spark 4 Python streaming DataSource: an iceberg-local table AS a
stream (SURVEY.md §2.1/§2.9 — the "table is the queue" ingest shape).

``spark.dataSource.register(IcebergStreamDataSource)`` then
``spark.readStream.format("iceberg_stream").option("location", loc)
.load()`` emits every row the table's MAIN lineage gains, exactly once
across restarts:

- offset = the last consumed snapshot SEQUENCE NUMBER (monotonic along
  the ancestry chain — branch-staged snapshots never enter the stream;
  they arrive when a WAP publish lands them on main, fast-forwarded or
  cherry-picked, which is what makes sink-side gating and source-side
  consumption compose);
- ``partitions(start, end)`` walks the lineage once on the driver and
  carves ONE InputPartition PER ADDED DATA FILE, resolved entirely from
  manifest metadata (no data file opened at planning time);
- ``read(partition)`` opens its one parquet file on the EXECUTOR with
  pyarrow and yields Arrow record batches — identity-partition columns
  (dropped from file contents by the hive layout) are reattached as
  constants from the manifest's typed partition record, so no path
  parsing and no type guessing.

Snapshot semantics: ``append`` snapshots stream their added files;
``replace`` (compaction / manifest rewrite) adds no logical rows and is
skipped; ``delete`` (MOR row deltas) and ``overwrite`` RAISE by default
— a row-level retraction cannot be expressed as an append stream —
unless ``option("skip_row_deltas", "true")`` opts into append-half-only
consumption (the merge's new rows stream, its deletes don't; upstream
Iceberg's streaming read draws the same line).

Retention contract: the consumer's lag must stay inside snapshot
retention — if expiry breaks the parent chain between the checkpointed
offset and the head, ``partitions()`` raises (lineage no longer
expressible) instead of silently skipping rows. Pair the source with
``expire_snapshots(older_than_ms=...)`` sized to the maximum expected
downtime.

Like every Python DataSource, availableNow degrades to a single
micro-batch per run (no SupportsTriggerAvailableNow hook in the API) —
one run drains everything outstanding in one batch, since
``latestOffset`` advertises the current head.
"""

from __future__ import annotations

from typing import Iterator

TS_COLS = ("timestamp", "timestamp_ntz")


def _iceberg_ddl(location: str) -> str:
    from ner_spark.iceberg.table import IcebergLocalTable

    return IcebergLocalTable(location).spark_ddl()


try:  # pyspark >= 4 only; import-gated like TranscriptStreamDataSource
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class IcebergStreamDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "iceberg_stream"

        def schema(self) -> str:
            loc = self.options.get("location") or self.options.get("path")
            if not loc:
                raise ValueError("iceberg_stream requires option('location')")
            return _iceberg_ddl(loc)

        def streamReader(self, schema):
            return _IcebergStreamReader(self.options)

    class _FilesPartition(InputPartition):
        """One read task over a BIN of data files (path, identity-cols)
        — small files pack together up to the byte budget, the same
        packing Spark's own file sources do via maxPartitionBytes, so a
        trickle-committed table doesn't become one task per tiny file."""

        def __init__(self, files: list, ddl: str):
            self.files, self.ddl = files, ddl

    class _IcebergStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.location = options.get("location") or options.get("path")
            if not self.location:
                raise ValueError("iceberg_stream requires option('location')")
            self.skip_row_deltas = (
                str(options.get("skip_row_deltas", "false")).lower() == "true"
            )
            self.max_partition_bytes = int(
                options.get("max_partition_bytes", str(32 * 1024 * 1024))
            )
            # start_after_seq: consume only snapshots with a strictly
            # greater sequence number (0 = from table creation)
            self.start_seq = int(options.get("start_after_seq", "0"))

        def _table(self):
            from ner_spark.iceberg.table import IcebergLocalTable

            return IcebergLocalTable(self.location)

        def initialOffset(self) -> dict:
            return {"seq": self.start_seq}

        def latestOffset(self) -> dict:
            t = self._table()
            head = t.current_snapshot()
            seq = head["sequence-number"] if head else self.start_seq
            return {"seq": max(seq, self.start_seq)}

        def partitions(self, start: dict, end: dict) -> list:
            lo, hi = start["seq"], end["seq"]
            if hi <= lo:
                return []
            t = self._table()
            md = t.metadata()
            ddl = t.spark_ddl()
            struct = t._schema_struct(md)
            specs = {s["spec-id"]: s["fields"]
                     for s in md.get("partition-specs", [])}
            by_src = {f["id"]: f["name"] for f in struct["fields"]}
            # ancestry walk head→lo: branch snapshots can't leak in, and
            # an expiry hole anywhere in the walk surfaces as an error —
            # a fresh stream over a table whose early history expired
            # must refuse, not silently emit the retained tail only
            chain: list[dict] = []
            snaps = {s["snapshot-id"]: s for s in md.get("snapshots", [])}
            cur = (md.get("refs") or {}).get("main", {}).get("snapshot-id")
            reached = cur is None  # empty table: nothing to stream
            while cur is not None and cur in snaps:
                s = snaps[cur]
                if s["sequence-number"] <= lo:
                    reached = True
                    break
                if s["sequence-number"] <= hi:
                    chain.append(s)
                cur = s.get("parent-snapshot-id")
            else:
                reached = reached or cur is None  # walked to creation
            if not reached:
                raise ValueError(
                    f"snapshot history at seq <= {lo} (ancestor "
                    f"{cur}) has been expired; the stream's offset can no "
                    "longer be expressed — its lag exceeded snapshot "
                    "retention (or start_after_seq skips into expired "
                    "history)"
                )
            entries: list[tuple] = []  # (path, size, identity)
            for s in reversed(chain):  # oldest first
                op = s["summary"]["operation"]
                if op == "replace":
                    continue  # no logical rows
                if op in ("delete", "overwrite") and not self.skip_row_deltas:
                    raise ValueError(
                        f"stream crossed a {op!r} snapshot (seq "
                        f"{s['sequence-number']}); row-level retractions "
                        "cannot be expressed as an append stream — use "
                        "read_iceberg_changelog, or opt into "
                        "option('skip_row_deltas','true')"
                    )
                if op == "overwrite":
                    continue  # skip_row_deltas: rewrites don't stream
                for f in t.scan_snapshot_adds(s["snapshot-id"], md=md):
                    identity = {}
                    sid = None
                    # find the spec the file was written under via its
                    # partition record keys (names are unique per spec)
                    for spec_id, fields in specs.items():
                        if {pf["name"] for pf in fields} == set(f.partition):
                            sid = spec_id
                            break
                    for pf in (specs.get(sid) or []):
                        if pf.get("transform", "identity") != "identity":
                            continue  # derived cols live IN the file
                        col = by_src.get(pf["source-id"])
                        if col is not None:
                            identity[col] = f.partition.get(pf["name"])
                    entries.append((f.path, f.file_size, identity))
            # bin-pack into tasks by byte budget (commit order preserved)
            out: list[_FilesPartition] = []
            cur_files: list = []
            cur_bytes = 0
            for path, size, identity in entries:
                if cur_files and cur_bytes + size > self.max_partition_bytes:
                    out.append(_FilesPartition(cur_files, ddl))
                    cur_files, cur_bytes = [], 0
                cur_files.append((path, identity))
                cur_bytes += size
            if cur_files:
                out.append(_FilesPartition(cur_files, ddl))
            return out

        def read(self, part) -> Iterator:
            import pyarrow as pa
            import pyarrow.parquet as pq

            fields = [f.split(" ", 1) for f in _split_ddl(part.ddl)]
            for path, identity in part.files:
                tbl = pq.read_table(path)
                n = tbl.num_rows
                cols, names = [], []
                for name, typ in fields:
                    names.append(name)
                    if name in tbl.column_names:
                        col = tbl.column(name)
                        if typ in TS_COLS and pa.types.is_timestamp(col.type):
                            # normalize to micros (files carry micros
                            # already; belt-and-braces for old fixtures)
                            col = col.cast(pa.timestamp("us"))
                        cols.append(col)
                    elif name in identity:
                        v = identity[name]
                        pt = _pa_type(typ)
                        cols.append(
                            pa.nulls(n, pt) if v is None
                            else pa.array([v] * n, type=pt)
                        )
                    else:  # schema evolution: column added after this file
                        cols.append(pa.nulls(n, _pa_type(typ)))
                yield from pa.table(cols, names=names).to_batches()

        def commit(self, end: dict) -> None:
            pass  # offsets live in the checkpoint; nothing to clean up

    def _split_ddl(ddl: str) -> list[str]:
        """Split a DDL string on top-level commas only (nested
        array/map/struct types carry their own commas)."""
        parts, depth, cur = [], 0, []
        for ch in ddl:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur).strip())
        return parts

    def _pa_type(ddl_type: str):
        import pyarrow as pa

        if ddl_type.startswith("decimal"):
            p, s = ddl_type[ddl_type.index("(") + 1:-1].split(",")
            return pa.decimal128(int(p), int(s))
        t = {
            "string": pa.string(), "int": pa.int32(), "bigint": pa.int64(),
            "double": pa.float64(), "float": pa.float32(),
            "boolean": pa.bool_(), "date": pa.date32(),
            "timestamp": pa.timestamp("us"),
            "timestamp_ntz": pa.timestamp("us"),
        }.get(ddl_type)
        if t is None:
            # a silent string fallback would hand Spark a wrong-typed
            # Arrow column; fail at the column that needs the mapping
            raise NotImplementedError(
                f"iceberg_stream cannot synthesize a column of type "
                f"{ddl_type!r} (identity-partition or schema-evolved)"
            )
        return t

except ImportError:  # pragma: no cover — pyspark < 4
    IcebergStreamDataSource = None
