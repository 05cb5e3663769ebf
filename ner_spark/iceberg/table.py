"""Iceberg v2 table metadata over parquet data files, stdlib + pyarrow.

Implements the Iceberg table spec (format-version 2) commit protocol in
the HadoopTables filesystem layout — the catalog-free layout every
Iceberg client supports for a plain ``warehouse/table`` path:

    <location>/metadata/version-hint.text      → current metadata version
    <location>/metadata/vN.metadata.json       → table metadata
    <location>/metadata/snap-<id>-*.avro       → manifest list (Avro)
    <location>/metadata/m-<uuid>.avro          → manifest file (Avro)
    <location>/data/seq=N/...parquet           → immutable data files

Spec structures written (field ids per the spec's Avro schemas):
manifest_file (500-519), manifest_entry (0-4) + data_file (100-140,
bounds as the spec's ``k12x``/``v12x`` array-map with logicalType=map),
single-value binary bounds (little-endian per "Appendix D: Single-value
serialization"). Snapshot lineage (parent-snapshot-id, sequence
numbers), snapshot summaries, snapshot-log and metadata-log are all
maintained, so time travel and incremental consumption work from the
metadata alone.

Scans resolve the manifest chain and apply three pruning layers exactly
like a real Iceberg reader: (1) partition pruning against the identity
partition tuple, (2) manifest-level partition-summary pruning, (3) data
file min/max bound pruning from the parquet footers captured at commit
time. The returned file list feeds ``spark.read.parquet`` — at cluster
scale the same listing is what an Iceberg DSv2 source hands Spark as its
file index.

Why not the real Iceberg runtime: no jars, no network in this sandbox
(SURVEY.md §0); this module is the honest alternative — the on-disk
format IS the public one, verified by round-tripping every Avro file
through the JVM's bundled org.apache.avro (tests/test_iceberg_format.py).

Concurrency contract: single writer per table (the stage-commit model of
plans/base.py — one run owns one warehouse). Commits are atomic for
READERS (metadata json + version hint land via os.replace, so a reader
resolves either the old or the new snapshot, never a torn one), but two
concurrent WRITERS can race the version counter; real HadoopTables has
the same constraint and solves it with a lock manager or a catalog,
which is exactly the `fmt='iceberg'` cluster path.
"""

from __future__ import annotations

import json
import os
import struct
import time
import uuid
from dataclasses import dataclass, field

from ner_spark.iceberg import avro_io

# deterministic "current time"/uuid seeds are injectable for tests
_NOW_MS = lambda: int(time.time() * 1000)  # noqa: E731


# ------------------------------------------------------------- schema maps

_SPARK_TO_ICEBERG = {
    "string": "string",
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "long": "long",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
}
_ICEBERG_TO_SPARK = {
    "string": "string",
    "int": "int",
    "long": "bigint",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "binary",
    "date": "date",
    "timestamptz": "timestamp",
    "timestamp": "timestamp_ntz",
}


def schema_from_spark(spark_schema) -> tuple[dict, int]:
    """Spark StructType → Iceberg schema struct (fresh field ids 1..n).

    Nested arrays/structs/maps get element/key/value ids too (the spec
    requires every nested type to carry an id). Returns (schema_struct,
    last_column_id).
    """
    next_id = [0]

    def _fid() -> int:
        next_id[0] += 1
        return next_id[0]

    def _conv(dt) -> object:
        name = dt.typeName()
        if name == "struct":
            return {
                "type": "struct",
                "fields": [
                    {
                        "id": _fid(),
                        "name": f.name,
                        "required": not f.nullable,
                        "type": _conv(f.dataType),
                    }
                    for f in dt.fields
                ],
            }
        if name == "array":
            eid = _fid()
            return {
                "type": "list",
                "element-id": eid,
                "element": _conv(dt.elementType),
                "element-required": not dt.containsNull,
            }
        if name == "map":
            kid, vid = _fid(), _fid()
            return {
                "type": "map",
                "key-id": kid,
                "key": _conv(dt.keyType),
                "value-id": vid,
                "value": _conv(dt.valueType),
                "value-required": not dt.valueContainsNull,
            }
        if name == "decimal":
            return f"decimal({dt.precision}, {dt.scale})"
        try:
            return _SPARK_TO_ICEBERG[name]
        except KeyError:
            raise NotImplementedError(f"spark type {name!r}") from None

    # top-level struct: assign field ids breadth-first like Iceberg's
    # fresh-schema assignment (parents before children is not required by
    # the spec — ids only need to be unique — depth-first is fine)
    struct = _conv(spark_schema)
    return struct, next_id[0]


def schema_to_spark_ddl(schema_struct: dict) -> str:
    """Iceberg schema struct → Spark DDL string (for empty-table reads)."""

    def _conv(t) -> str:
        if isinstance(t, str):
            if t.startswith("decimal"):
                return t
            return _ICEBERG_TO_SPARK[t]
        if t["type"] == "struct":
            inner = ", ".join(
                f"{f['name']}: {_conv(f['type'])}" for f in t["fields"]
            )
            return f"struct<{inner}>"
        if t["type"] == "list":
            return f"array<{_conv(t['element'])}>"
        if t["type"] == "map":
            return f"map<{_conv(t['key'])}, {_conv(t['value'])}>"
        raise NotImplementedError(str(t))

    return ", ".join(
        f"{f['name']} {_conv(f['type'])}" for f in schema_struct["fields"]
    )


# ------------------------------------------ single-value (bounds) encoding

def encode_single(iceberg_type: str, v) -> bytes | None:
    """Appendix D single-value serialization (the bounds byte format).

    Timestamps/dates accept the datetime/date objects pyarrow footer
    stats hand back (converted to micros-from-epoch / days-from-epoch),
    as well as already-converted ints.
    """
    import datetime as _dt

    if v is None:
        return None
    if iceberg_type == "date":
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            v = (v - _dt.date(1970, 1, 1)).days
        return struct.pack("<i", int(v))
    if iceberg_type == "int":
        return struct.pack("<i", int(v))
    if iceberg_type == "long":
        return struct.pack("<q", int(v))
    if iceberg_type == "float":
        return struct.pack("<f", float(v))
    if iceberg_type == "double":
        return struct.pack("<d", float(v))
    if iceberg_type == "boolean":
        return b"\x01" if v else b"\x00"
    if iceberg_type == "string":
        return str(v).encode("utf-8")
    if iceberg_type in ("timestamp", "timestamptz"):
        if isinstance(v, _dt.datetime):
            if v.tzinfo is None:  # pyarrow stats are UTC-naive
                v = v.replace(tzinfo=_dt.timezone.utc)
            v = int(v.timestamp() * 1_000_000)
        return struct.pack("<q", int(v))  # micros from epoch
    if iceberg_type == "binary":
        return bytes(v)
    return None  # unsupported bound type → omit (bounds are optional)


_BOUND_TRUNC = 16  # write.metadata.metrics default: truncate(16)


def truncate_lower(iceberg_type: str, v):
    """Lower bounds may be prefix-truncated (prefix ≤ every value it
    prefixes, in UTF-8/code-point order — which agree)."""
    if iceberg_type == "string" and isinstance(v, str) and len(v) > _BOUND_TRUNC:
        return v[:_BOUND_TRUNC]
    if iceberg_type == "binary" and len(v) > _BOUND_TRUNC:
        return bytes(v)[:_BOUND_TRUNC]
    return v


def truncate_upper(iceberg_type: str, v):
    """Upper bounds are truncated by incrementing the last unit that can
    be incremented; if none can, the bound is dropped (None) — both are
    valid upper bounds per the spec."""
    if iceberg_type == "string" and isinstance(v, str) and len(v) > _BOUND_TRUNC:
        p = v[:_BOUND_TRUNC]
        for i in range(len(p) - 1, -1, -1):
            c = ord(p[i]) + 1
            if 0xD800 <= c <= 0xDFFF:  # surrogates can't occur in text;
                c = 0xE000  # the next real code point is still an upper bound
            if c <= 0x10FFFF:
                return p[:i] + chr(c)
        return None
    if iceberg_type == "binary" and len(v) > _BOUND_TRUNC:
        p = bytearray(bytes(v)[:_BOUND_TRUNC])
        for i in range(len(p) - 1, -1, -1):
            if p[i] < 0xFF:
                p[i] += 1
                return bytes(p[: i + 1])
        return None
    return v


def decode_single(iceberg_type: str, b: bytes | None):
    if b is None:
        return None
    if iceberg_type == "int" or iceberg_type == "date":
        return struct.unpack("<i", b)[0]
    if iceberg_type == "long" or iceberg_type in ("timestamp", "timestamptz"):
        # 4-byte values are pre-promotion int bounds (schema evolution
        # int→long): the spec requires readers to accept them
        if len(b) == 4:
            return struct.unpack("<i", b)[0]
        return struct.unpack("<q", b)[0]
    if iceberg_type == "float":
        return struct.unpack("<f", b)[0]
    if iceberg_type == "double":
        if len(b) == 4:  # pre-promotion float bound (float→double)
            return struct.unpack("<f", b)[0]
        return struct.unpack("<d", b)[0]
    if iceberg_type == "boolean":
        return b == b"\x01"
    if iceberg_type == "string":
        return b.decode("utf-8")
    if iceberg_type == "binary":
        return b
    return None


# ----------------------------------------------------------- avro schemas

def _opt(t) -> list:
    return ["null", t]


def _bounds_map(map_name: str, kid: int, vid: int) -> dict:
    """The spec's map<int, bytes> as an Avro array of k/v records."""
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": map_name,
            "fields": [
                {"name": "key", "type": "int", "field-id": kid},
                {"name": "value", "type": "bytes", "field-id": vid},
            ],
        },
    }


def partition_result_type(pf: dict, schema_struct: dict) -> str:
    """Iceberg type of one partition field's values — the TRANSFORM's
    result type (``bucket``/temporal → int, ``truncate`` → source type),
    which is what the partition record, manifest summaries, and hive dir
    values all carry."""
    from ner_spark.iceberg import transforms as T

    by_id = {f["id"]: f for f in schema_struct["fields"]}
    return T.result_type(
        pf.get("transform", "identity"), by_id[pf["source-id"]]["type"]
    )


def _partition_avro_fields(spec_fields: list[dict], schema_struct: dict) -> list:
    """Avro fields for the r102 partition record, typed by each
    transform's RESULT type."""
    out = []
    for pf in spec_fields:
        t = partition_result_type(pf, schema_struct)
        avro_t = {
            "int": "int", "date": {"type": "int", "logicalType": "date"},
            "long": "long", "string": "string", "double": "double",
            "float": "float", "boolean": "boolean", "binary": "bytes",
            "timestamptz": {"type": "long", "logicalType": "timestamp-micros"},
            "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
        }.get(t if isinstance(t, str) else "")
        if avro_t is None:
            raise NotImplementedError(f"partition source type {t!r}")
        out.append(
            {
                "name": pf["name"],
                "type": _opt(avro_t),
                "default": None,
                "field-id": pf["field-id"],
            }
        )
    return out


def manifest_entry_schema(spec_fields: list[dict], schema_struct: dict) -> dict:
    """Avro schema for manifest_entry (v2), field-ids per the spec."""
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                "name": "partition",
                "type": {
                    "type": "record",
                    "name": "r102",
                    "fields": _partition_avro_fields(spec_fields, schema_struct),
                },
                "field-id": 102,
            },
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {
                "name": "lower_bounds",
                "type": _opt(_bounds_map("k126_v127", 126, 127)),
                "default": None,
                "field-id": 125,
            },
            {
                "name": "upper_bounds",
                "type": _opt(_bounds_map("k129_v130", 129, 130)),
                "default": None,
                "field-id": 128,
            },
            {
                "name": "split_offsets",
                "type": _opt({"type": "array", "items": "long", "element-id": 133}),
                "default": None,
                "field-id": 132,
            },
            {
                "name": "equality_ids",
                "type": _opt({"type": "array", "items": "int", "element-id": 136}),
                "default": None,
                "field-id": 135,
            },
            {
                "name": "sort_order_id",
                "type": _opt("int"),
                "default": None,
                "field-id": 140,
            },
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": _opt("long"), "default": None,
             "field-id": 1},
            {"name": "sequence_number", "type": _opt("long"), "default": None,
             "field-id": 3},
            {"name": "file_sequence_number", "type": _opt("long"),
             "default": None, "field-id": 4},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {
            "name": "partitions",
            "type": _opt(
                {
                    "type": "array",
                    "element-id": 508,
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {"name": "contains_null", "type": "boolean",
                             "field-id": 509},
                            {"name": "contains_nan", "type": _opt("boolean"),
                             "default": None, "field-id": 518},
                            {"name": "lower_bound", "type": _opt("bytes"),
                             "default": None, "field-id": 510},
                            {"name": "upper_bound", "type": _opt("bytes"),
                             "default": None, "field-id": 511},
                        ],
                    },
                }
            ),
            "default": None,
            "field-id": 507,
        },
    ],
}


# --------------------------------------------------------------- data files

class CommitConflictError(RuntimeError):
    """A concurrent writer committed the metadata version this commit
    computed against — the loser of an optimistic-concurrency race. The
    losing commit changed nothing (its staged files are orphan-cleanup
    fodder); re-read the table and re-apply."""


@dataclass
class DataFile:
    """One immutable parquet file + the stats Iceberg tracks for it.

    ``content`` follows the v2 spec: 0 = DATA, 1 = POSITION DELETES
    (rows of ``file_path``/``pos`` naming deleted ordinals of a data
    file), 2 = EQUALITY DELETES (rows of key values whose ``equality_ids``
    name the schema fields they match on). ``sequence_number`` is filled
    on scan — readers need it for the merge-on-read rules (an equality
    delete applies only to data files with a strictly smaller sequence)."""

    path: str
    record_count: int
    file_size: int
    partition: dict = field(default_factory=dict)  # identity values by name
    lower_bounds: dict = field(default_factory=dict)  # field name → raw value
    upper_bounds: dict = field(default_factory=dict)
    split_offsets: list[int] | None = None
    content: int = 0  # 0 data / 1 position deletes / 2 equality deletes
    equality_ids: list[int] | None = None  # content=2: field ids matched on
    sequence_number: int | None = None  # stamped at scan time
    spec_id: int | None = None  # partition spec the file was written with


def collect_parquet_stats(paths: list[str], partition_values=None) -> list[DataFile]:
    """Read parquet footers (pyarrow) → DataFile stats, no data scan.

    ``partition_values``: optional callable path→dict for identity
    partition tuples (hive-style dirs are parsed by the caller).
    """
    import pyarrow.parquet as pq

    out = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        lower: dict = {}
        upper: dict = {}
        offsets: list[int] = []
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            offsets.append(g.column(0).file_offset)
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                name = names[ci]
                if "." in name:  # nested leaves aren't top-level bounds
                    continue
                mn, mx = st.min, st.max
                if name not in lower or _lt(mn, lower[name]):
                    lower[name] = mn
                if name not in upper or _lt(upper[name], mx):
                    upper[name] = mx
        out.append(
            DataFile(
                path=p,
                record_count=md.num_rows,
                file_size=os.path.getsize(p),
                partition=(partition_values(p) if partition_values else {}),
                lower_bounds=lower,
                upper_bounds=upper,
                split_offsets=offsets or None,
            )
        )
    return out


def _lt(a, b) -> bool:
    try:
        return a < b
    except TypeError:
        return False


# ------------------------------------------------------------------ table

class IcebergLocalTable:
    """A HadoopTables-layout Iceberg v2 table rooted at ``location``."""

    def __init__(self, location: str):
        self.location = location.rstrip("/")
        self.meta_dir = os.path.join(self.location, "metadata")

    # ---- metadata plumbing

    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, "version-hint.text")

    def exists(self) -> bool:
        return os.path.exists(self._hint_path())

    def current_version(self) -> int:
        with open(self._hint_path()) as f:
            v = int(f.read().strip())
        # the hint may trail a crash between the version-file link (the
        # durable commit point) and the hint update; roll forward to the
        # newest committed version so the table never wedges on a
        # CommitConflictError loop. The next successful commit rewrites
        # the hint and self-heals.
        while os.path.exists(
            os.path.join(self.meta_dir, f"v{v + 1}.metadata.json")
        ):
            v += 1
        return v

    def metadata(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(os.path.join(self.meta_dir, f"v{v}.metadata.json")) as f:
            return json.load(f)

    def current_snapshot(self) -> dict | None:
        md = self.metadata()
        sid = md.get("current-snapshot-id", -1)
        if sid in (-1, None):
            return None
        return next(s for s in md["snapshots"] if s["snapshot-id"] == sid)

    def snapshots(self) -> list[dict]:
        return list(self.metadata().get("snapshots", []))

    def _write_metadata(self, md: dict, version: int) -> None:
        """Swap in metadata version N — the commit point (HadoopTables
        protocol). The versioned file is created with a FAIL-IF-EXISTS
        link, so two writers racing from the same base version cannot
        both win: the loser gets :class:`CommitConflictError` instead of
        silently overwriting the winner's commit (its staged data files
        remain on disk for ``remove_orphan_files``). This is optimistic
        concurrency's detection half; retry-with-rebase is the caller's
        choice, and the engine's documented contract is a single writer
        per table. (A real HDFS/S3 deployment swaps through a catalog's
        atomic compare-and-set instead — same semantics, different
        primitive.)"""
        os.makedirs(self.meta_dir, exist_ok=True)
        path = os.path.join(self.meta_dir, f"v{version}.metadata.json")
        tmp = path + f".tmp-{uuid.uuid4()}"
        with open(tmp, "w") as f:
            json.dump(md, f, indent=1)
        try:
            os.link(tmp, path)  # atomic create-exclusive on POSIX
        except FileExistsError:
            raise CommitConflictError(
                f"metadata version {version} was committed by a "
                "concurrent writer; re-read the table and retry"
            ) from None
        finally:
            os.unlink(tmp)
        # the hint moves only after a WON commit; under the documented
        # single-writer contract it always names the newest version
        hint_tmp = self._hint_path() + ".tmp"
        with open(hint_tmp, "w") as f:
            f.write(str(version))
        os.replace(hint_tmp, self._hint_path())

    # ---- DDL

    @classmethod
    def create(
        cls,
        location: str,
        spark_schema,
        partition_by: list[str] | None = None,
        properties: dict | None = None,
    ) -> "IcebergLocalTable":
        t = cls(location)
        if t.exists():
            raise FileExistsError(location)
        from ner_spark.iceberg import transforms as T

        struct, last_id = schema_from_spark(spark_schema)
        struct["schema-id"] = 0
        by_name = {f["name"]: f for f in struct["fields"]}
        spec_fields = []
        for i, expr in enumerate(partition_by or []):
            src, transform = T.parse_partition_field(expr)
            if src not in by_name:
                raise ValueError(f"partition column {src!r} not in schema")
            st = by_name[src]["type"]
            if not isinstance(st, str):
                raise ValueError(f"cannot partition by nested column {src!r}")
            T.result_type(transform, st)  # validates transform × type
            spec_fields.append(
                {
                    "name": T.default_field_name(src, transform),
                    "transform": transform,
                    "source-id": by_name[src]["id"],
                    "field-id": 1000 + i,
                }
            )
        md = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid4()),
            "location": t.location,
            "last-sequence-number": 0,
            "last-updated-ms": _NOW_MS(),
            "last-column-id": last_id,
            "current-schema-id": 0,
            "schemas": [struct | {"type": "struct"}],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "last-partition-id": 999 + len(spec_fields),
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {
                "write.format.default": "parquet",
                **{k: str(v) for k, v in (properties or {}).items()},
            },
            "current-snapshot-id": -1,
            "refs": {},
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
        }
        t._write_metadata(md, 1)
        return t

    # ---- schema evolution

    def evolve_schema(self, spark_schema) -> bool:
        """Union-evolve the current schema with ``spark_schema`` (top-level
        adds only). Existing columns keep their field ids — the invariant
        every Iceberg reader depends on; new columns get fresh ids above
        last-column-id and a new schema-id becomes current. Returns True
        if the schema changed.

        Rejected (clear errors, not silent coercion): type changes other
        than the spec's safe promotions (int→long, float→double), and
        dropping a required column from the write schema.
        """
        md = self.metadata()
        cur = self._schema_struct(md)
        by_name = {f["name"]: f for f in cur["fields"]}
        new_struct, _ = schema_from_spark(spark_schema)
        incoming = {f["name"]: f for f in new_struct["fields"]}

        promotions = {("int", "long"), ("float", "double")}
        for name, f in by_name.items():
            inc = incoming.get(name)
            if inc is None:
                if f["required"]:
                    raise ValueError(
                        f"write schema drops required column {name!r}"
                    )
                continue
            old_t, new_t = f["type"], inc["type"]
            if old_t != new_t:
                if (
                    isinstance(old_t, str)
                    and isinstance(new_t, str)
                    and (old_t, new_t) in promotions
                ):
                    f["type"] = new_t  # safe widening, id unchanged
                else:
                    raise ValueError(
                        f"incompatible type change for {name!r}: "
                        f"{old_t} → {new_t}"
                    )

        added = [n for n in incoming if n not in by_name]
        changed = bool(added) or cur != self._schema_struct(self.metadata())
        if not changed:
            return False
        next_id = md["last-column-id"]

        def _reassign(t):
            """fresh ids for a new column's nested types too."""
            nonlocal next_id
            if isinstance(t, str):
                return t
            t = dict(t)
            if t["type"] == "struct":
                fields = []
                for f in t["fields"]:
                    next_id += 1
                    fields.append(
                        {**f, "id": next_id, "type": _reassign(f["type"])}
                    )
                t["fields"] = fields
            elif t["type"] == "list":
                next_id += 1
                t["element-id"] = next_id
                t["element"] = _reassign(t["element"])
            elif t["type"] == "map":
                next_id += 1
                t["key-id"] = next_id
                next_id += 1
                t["value-id"] = next_id
                t["key"] = _reassign(t["key"])
                t["value"] = _reassign(t["value"])
            return t

        new_fields = list(cur["fields"])
        for name in added:
            inc = incoming[name]
            next_id += 1
            new_fields.append(
                {
                    "id": next_id,
                    "name": name,
                    "required": False,  # adds are always optional — old
                    # files can't have the value
                    "type": _reassign(inc["type"]),
                }
            )
        new_schema = {
            "type": "struct",
            "schema-id": max(s["schema-id"] for s in md["schemas"]) + 1,
            "fields": new_fields,
        }
        md["schemas"].append(new_schema)
        md["current-schema-id"] = new_schema["schema-id"]
        md["last-column-id"] = next_id
        md["last-updated-ms"] = _NOW_MS()
        self._write_metadata(md, self.current_version() + 1)
        return True

    def evolve_spec(self, partition_by: list[str]) -> bool:
        """Change the table's partition layout WITHOUT rewriting history
        — Iceberg's partition-spec evolution. The new spec becomes the
        default for future writes; every already-written manifest keeps
        its own spec-id and ``scan()`` prunes each manifest under the
        spec it was written with (a re-bucket from 8 to 64 prunes old
        files mod 8 and new files mod 64 from the same predicate). A
        (source column, transform) pair that already exists in ANY prior
        spec keeps its partition field-id, per the spec's reuse rule;
        new pairs get fresh ids above last-partition-id. Returns True if
        the default spec changed.

        At 100 TB this is the maintenance story partitioning needs:
        yesterday's layout mistake (too few buckets, hourly instead of
        daily) is fixed by one metadata commit, and compaction migrates
        old data to the new layout incrementally instead of as a
        stop-the-world rewrite."""
        from ner_spark.iceberg import transforms as T

        md = self.metadata()
        struct = self._schema_struct(md)
        by_name = {f["name"]: f for f in struct["fields"]}
        reuse: dict[tuple, int] = {}
        for spec in md["partition-specs"]:
            for pf in spec["fields"]:
                reuse[(pf["source-id"], pf["transform"])] = pf["field-id"]
        last_pid = md.get("last-partition-id", 999)
        fields = []
        for expr in partition_by:
            src, transform = T.parse_partition_field(expr)
            if src not in by_name:
                raise ValueError(f"partition column {src!r} not in schema")
            st = by_name[src]["type"]
            if not isinstance(st, str):
                raise ValueError(f"cannot partition by nested column {src!r}")
            T.result_type(transform, st)
            key = (by_name[src]["id"], transform)
            fid = reuse.get(key)
            if fid is None:
                last_pid += 1
                fid = last_pid
            fields.append(
                {
                    "name": T.default_field_name(src, transform),
                    "transform": transform,
                    "source-id": by_name[src]["id"],
                    "field-id": fid,
                }
            )
        cur = self._spec_fields(md)
        if [
            (f["source-id"], f["transform"]) for f in fields
        ] == [(f["source-id"], f["transform"]) for f in cur]:
            return False
        new_sid = max(s["spec-id"] for s in md["partition-specs"]) + 1
        md["partition-specs"].append({"spec-id": new_sid, "fields": fields})
        md["default-spec-id"] = new_sid
        md["last-partition-id"] = last_pid
        md["last-updated-ms"] = _NOW_MS()
        self._write_metadata(md, self.current_version() + 1)
        return True

    # ---- commits

    def _schema_struct(self, md: dict) -> dict:
        return next(
            s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
        )

    def _spec_fields(self, md: dict) -> list[dict]:
        return next(
            s for s in md["partition-specs"] if s["spec-id"] == md["default-spec-id"]
        )["fields"]

    def _write_manifest(
        self,
        md: dict,
        files: list[DataFile],
        snapshot_id: int,
        seq: int,
        content: int = 0,
    ) -> dict:
        """Write one manifest avro; return its manifest_file entry.

        ``content`` is the manifest-level kind: 0 = data manifest,
        1 = delete manifest (its entries carry position/equality delete
        files; per the v2 spec the two kinds never mix in one manifest)."""
        struct = self._schema_struct(md)
        spec_fields = self._spec_fields(md)
        by_name = {f["name"]: f for f in struct["fields"]}
        entry_schema = manifest_entry_schema(spec_fields, struct)

        def _bounds(d: dict, upper: bool) -> list | None:
            out = []
            for name, v in d.items():
                f = by_name.get(name)
                if f is None or not isinstance(f["type"], str):
                    continue
                try:
                    v = (truncate_upper if upper else truncate_lower)(
                        f["type"], v
                    )
                    if v is None:
                        continue
                    enc = encode_single(f["type"], v)
                except (TypeError, ValueError, OverflowError):
                    # a bound we can't serialize is legal to omit; never
                    # fail a commit over an optional statistic
                    continue
                if enc is not None:
                    out.append({"key": f["id"], "value": enc})
            return sorted(out, key=lambda r: r["key"]) or None

        entries = []
        for df in files:
            entries.append(
                {
                    "status": 1,  # ADDED
                    "snapshot_id": snapshot_id,
                    "sequence_number": seq,
                    "file_sequence_number": seq,
                    "data_file": {
                        "content": df.content,
                        "file_path": df.path,
                        "file_format": "PARQUET",
                        "partition": {
                            pf["name"]: df.partition.get(pf["name"])
                            for pf in spec_fields
                        },
                        "record_count": df.record_count,
                        "file_size_in_bytes": df.file_size,
                        "lower_bounds": _bounds(df.lower_bounds, upper=False),
                        "upper_bounds": _bounds(df.upper_bounds, upper=True),
                        "split_offsets": df.split_offsets,
                        "equality_ids": df.equality_ids,
                        "sort_order_id": 0,
                    },
                }
            )
        mpath = os.path.join(self.meta_dir, f"m-{uuid.uuid4()}.avro")
        length = avro_io.write_container(
            mpath,
            entry_schema,
            entries,
            metadata={
                "schema": json.dumps(struct | {"type": "struct"}),
                "schema-id": str(md["current-schema-id"]),
                "partition-spec": json.dumps(spec_fields),
                "partition-spec-id": str(md["default-spec-id"]),
                "format-version": "2",
                "content": "deletes" if content else "data",
            },
        )
        summaries = self._partition_summaries(
            spec_fields, struct, [f.partition for f in files]
        )
        return {
            "manifest_path": mpath,
            "manifest_length": length,
            "partition_spec_id": md["default-spec-id"],
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(files),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": sum(f.record_count for f in files),
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": summaries,
        }

    def _partition_summaries(
        self,
        spec_fields: list[dict],
        struct: dict,
        partitions: list[dict],
    ) -> list[dict] | None:
        """Manifest-level partition summaries (field 507), in spec-field
        order, over the files' partition records — the one formula both
        fresh manifests and merged manifests must share, or pruning
        behaves differently on the two."""
        if not spec_fields:
            return None
        summaries = []
        for pf in spec_fields:
            rt = partition_result_type(pf, struct)
            vals = [p.get(pf["name"]) for p in partitions]
            non_null = [v for v in vals if v is not None]
            lo = (
                encode_single(rt, truncate_lower(rt, min(non_null)))
                if non_null else None
            )
            hi_v = truncate_upper(rt, max(non_null)) if non_null else None
            summaries.append(
                {
                    "contains_null": any(v is None for v in vals),
                    "contains_nan": None,
                    "lower_bound": lo,
                    "upper_bound": (
                        encode_single(rt, hi_v) if hi_v is not None else None
                    ),
                }
            )
        return summaries

    def _rewrite_manifest_without(
        self, m: dict, drop_paths: set[str], snapshot_id: int, seq: int
    ) -> dict | None:
        """Rewrite one carried manifest for a partial file replacement:
        surviving entries become EXISTING (status 0, original sequence
        numbers preserved — the MOR strict-sequence rule depends on
        them), replaced entries are recorded as DELETED (status 2) by
        this snapshot. The avro schema and spec metadata are copied from
        the ORIGINAL container, so manifests written under an evolved-away
        partition spec rewrite under their own spec. Returns the new
        manifest-file record, or None if nothing survives."""
        schema, meta, entries = avro_io.read_container(m["manifest_path"])
        out, n_exist, n_del, rows_exist, rows_del = [], 0, 0, 0, 0
        for e in entries:
            if e["status"] == 2:
                continue  # already deleted in an earlier rewrite
            rec = dict(e)
            if e["data_file"]["file_path"] in drop_paths:
                rec["status"] = 2
                rec["snapshot_id"] = snapshot_id
                n_del += 1
                rows_del += e["data_file"]["record_count"]
            else:
                rec["status"] = 0
                n_exist += 1
                rows_exist += e["data_file"]["record_count"]
            out.append(rec)
        if n_exist == 0 and n_del == 0:
            return None
        mpath = os.path.join(self.meta_dir, f"m-{uuid.uuid4()}.avro")
        length = avro_io.write_container(mpath, schema, out, metadata=meta)
        seqs = [e["sequence_number"] for e in out
                if e["status"] == 0 and e.get("sequence_number") is not None]
        return {
            "manifest_path": mpath,
            "manifest_length": length,
            "partition_spec_id": m["partition_spec_id"],
            "content": m.get("content", 0),
            "sequence_number": seq,
            "min_sequence_number": min(seqs) if seqs else seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": 0,
            "existing_files_count": n_exist,
            "deleted_files_count": n_del,
            "added_rows_count": 0,
            "existing_rows_count": rows_exist,
            "deleted_rows_count": rows_del,
            # partition summaries of the superset stay valid (pruning is
            # may-match; a wider summary only keeps a file it could skip)
            "partitions": m.get("partitions"),
        }

    def commit(
        self,
        files: list[DataFile],
        operation: str = "append",
        summary: dict | None = None,
        delete_files: list[DataFile] | None = None,
        branch: str = "main",
        replace_paths: set[str] | None = None,
        manifests_override=None,
        set_properties: dict | None = None,
    ) -> int:
        """Commit a snapshot; returns the snapshot id.

        ``append`` carries every manifest of the current snapshot forward;
        ``overwrite`` replaces the table contents (prior manifests are
        dropped from the new manifest list, prior data files stay on disk
        for time travel until ``expire_snapshots``); ``replace`` is the
        compaction variant of overwrite (same mechanics, but flagged so
        incremental consumers know no logical rows changed); ``delete`` is
        the merge-on-read row delta: prior manifests carry forward and the
        commit adds ``delete_files`` (position/equality delete files,
        DataFile.content 1/2) in a delete manifest — plus, optionally,
        new data ``files`` in the same atomic snapshot (the MERGE shape:
        equality-delete the matched keys, append the new rows; upstream
        Iceberg labels row deltas "overwrite", this format keeps that
        word for its simpler truncate-and-write semantics).
        """
        if operation not in ("append", "overwrite", "replace", "delete"):
            raise ValueError(operation)
        if delete_files and operation != "delete":
            raise ValueError("delete_files require operation='delete'")
        if operation == "delete":
            bad = [d.path for d in delete_files or [] if d.content not in (1, 2)]
            if bad or not delete_files:
                raise ValueError(
                    "operation='delete' needs delete_files with content 1 "
                    f"(position) or 2 (equality); got {bad or 'none'}"
                )
            bad = [
                d.path for d in delete_files if d.content == 2 and not d.equality_ids
            ]
            if bad:
                raise ValueError(f"equality deletes need equality_ids: {bad}")
        md = self.metadata()
        version = self.current_version()
        seq = md["last-sequence-number"] + 1
        snapshot_id = (seq << 20) | (uuid.uuid4().int & 0xFFFFF)
        # the commit's parent is the BRANCH head; a commit to a branch
        # that doesn't exist yet forks it from the current main head
        # (write-audit-publish: stage on "audit", validate, fast-forward)
        refs = dict(md.get("refs") or {})
        if branch in refs:
            if refs[branch].get("type") == "tag":
                raise ValueError(f"{branch!r} is a tag; tags are immutable")
            parent = refs[branch]["snapshot-id"]
        else:
            parent = md.get("current-snapshot-id", -1)

        if replace_paths is not None and operation != "replace":
            raise ValueError("replace_paths requires operation='replace'")
        manifests: list[dict] = []
        carry = operation in ("append", "delete") or (
            operation == "replace" and replace_paths is not None
        )
        if carry and parent not in (-1, None):
            cur = next(
                s for s in md["snapshots"] if s["snapshot-id"] == parent
            )
            _, _, prior = avro_io.read_container(cur["manifest-list"])
            if replace_paths is None:
                manifests.extend(prior)
            else:
                # partial rewrite: delete manifests and untouched data
                # manifests carry forward as-is; a data manifest naming a
                # replaced file is rewritten (survivors EXISTING, replaced
                # DELETED) so the rest of the table never moves
                for m in prior:
                    if m.get("content", 0) == 1:
                        manifests.append(m)
                        continue
                    _, _, entries = avro_io.read_container(m["manifest_path"])
                    touched = any(
                        e["status"] != 2
                        and e["data_file"]["file_path"] in replace_paths
                        for e in entries
                    )
                    if not touched:
                        manifests.append(m)
                        continue
                    rw = self._rewrite_manifest_without(
                        m, replace_paths, snapshot_id, seq
                    )
                    if rw is not None:
                        manifests.append(rw)
        if delete_files:
            manifests.insert(
                0,
                self._write_manifest(md, delete_files, snapshot_id, seq, content=1),
            )
        if files:
            manifests.insert(0, self._write_manifest(md, files, snapshot_id, seq))
        if manifests_override is not None:
            # metadata-level commit (rewrite_manifests, cherry_pick):
            # the caller supplies the full manifest list, built against
            # the ids this commit allocated
            if operation not in ("replace", "append") or files \
                    or delete_files or replace_paths is not None:
                raise ValueError(
                    "manifests_override requires operation='replace' or "
                    "'append' with no files/delete_files/replace_paths"
                )
            manifests = manifests_override(snapshot_id, seq)

        ml_path = os.path.join(
            self.meta_dir, f"snap-{snapshot_id}-1-{uuid.uuid4()}.avro"
        )
        avro_io.write_container(
            ml_path,
            MANIFEST_FILE_SCHEMA,
            manifests,
            metadata={
                "snapshot-id": str(snapshot_id),
                "parent-snapshot-id": str(parent),
                "sequence-number": str(seq),
                "format-version": "2",
            },
        )
        now = _NOW_MS()
        added_rows = sum(f.record_count for f in files)
        data_manifests = [m for m in manifests if m.get("content", 0) == 0]
        del_manifests = [m for m in manifests if m.get("content", 0) == 1]
        total_rows = sum(m["added_rows_count"] + m["existing_rows_count"]
                         for m in data_manifests)
        total_files = sum(m["added_files_count"] + m["existing_files_count"]
                          for m in data_manifests)
        total_del_rows = sum(m["added_rows_count"] + m["existing_rows_count"]
                             for m in del_manifests)
        total_del_files = sum(m["added_files_count"] + m["existing_files_count"]
                              for m in del_manifests)
        snap = {
            "snapshot-id": snapshot_id,
            "parent-snapshot-id": None if parent in (-1, None) else parent,
            "sequence-number": seq,
            "timestamp-ms": now,
            "manifest-list": ml_path,
            "schema-id": md["current-schema-id"],
            "summary": {
                "operation": operation,
                "added-data-files": str(len(files)),
                "added-records": str(added_rows),
                "added-delete-files": str(len(delete_files or [])),
                "added-delete-records": str(
                    sum(d.record_count for d in delete_files or [])
                ),
                "total-records": str(total_rows),
                "total-data-files": str(total_files),
                "total-delete-files": str(total_del_files),
                "total-delete-records": str(total_del_rows),
                **{k: str(v) for k, v in (summary or {}).items()},
            },
        }
        md["snapshots"].append(snap)
        md["last-sequence-number"] = seq
        md["last-updated-ms"] = now
        if set_properties:
            # table-property updates ride the same atomic metadata swap
            # (e.g. the streaming sink's published batch high-water mark)
            md["properties"] = {
                **(md.get("properties") or {}),
                **{k: str(v) for k, v in set_properties.items()},
            }
        refs[branch] = {"snapshot-id": snapshot_id, "type": "branch"}
        md["refs"] = refs
        if branch == "main":
            # per the Iceberg spec, current-snapshot-id and snapshot-log
            # track the MAIN branch only; a staging-branch commit leaves
            # readers of the table head untouched until publish
            md["current-snapshot-id"] = snapshot_id
            md["snapshot-log"].append(
                {"timestamp-ms": now, "snapshot-id": snapshot_id}
            )
        md["metadata-log"].append(
            {
                "timestamp-ms": now,
                "metadata-file": os.path.join(
                    self.meta_dir, f"v{version}.metadata.json"
                ),
            }
        )
        self._write_metadata(md, version + 1)
        return snapshot_id

    # ---- scans

    def scan(
        self,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        filters: list[tuple] | None = None,
        ref: str | None = None,
    ) -> list[DataFile]:
        """Resolve (snapshot, filters) → pruned list of data files.

        ``filters``: [(col, op, value)] with op in =, <, <=, >, >=, in
        (value = list of candidates); conjunctive. Pruning uses partition
        values (through the spec's transforms — hidden partitioning:
        predicates name SOURCE columns only), manifest partition
        summaries, and file bounds — files that MAY match survive,
        exactly Iceberg's contract (the engine re-applies the residual
        predicate; Spark does on the parquet scan).
        """
        md = self.metadata()
        snap = self._resolve_snapshot(md, snapshot_id, as_of_ms, ref=ref)
        if snap is None:
            return []
        from ner_spark.iceberg import transforms as T

        struct = self._schema_struct(md)
        by_name = {f["name"]: f for f in struct["fields"]}
        by_id = {f["id"]: f for f in struct["fields"]}
        # Per-spec pruning index: source column name → [(spec index,
        # spec field, result type)]. A predicate on the SOURCE column
        # prunes via every transform of it — hidden partitioning
        # (queries never name ts_day; ``ts >= c`` prunes because day()
        # is order-preserving, ``conv_id = c`` because bucket()
        # preserves equality). Each manifest is pruned under the spec it
        # was WRITTEN with (spec evolution: a re-bucket from 8 to 64
        # prunes old files mod 8, new files mod 64).
        specs_by_id = {
            s["spec-id"]: s["fields"] for s in md.get("partition-specs", [])
        }
        default_sid = md.get("default-spec-id", 0)
        _src_cache: dict[int, dict] = {}

        def _specs_by_src(sid: int) -> dict:
            if sid not in _src_cache:
                d: dict[str, list] = {}
                for i, pf in enumerate(specs_by_id.get(sid, [])):
                    src = by_id[pf["source-id"]]["name"]
                    d.setdefault(src, []).append(
                        (i, pf, partition_result_type(pf, struct))
                    )
                _src_cache[sid] = d
            return _src_cache[sid]

        def _transform_prune(op: str, val, pf: dict, src_type: str):
            """(transformed value, effective op) for one predicate against
            one partition field; (None, None) = transform can't serve op.

            Strict ops weaken on a non-identity transform: ``ts < c``
            prunes with ``day(ts) <= day(c)`` because rows in the
            boundary partition can still satisfy the original predicate.
            """
            tr = pf.get("transform", "identity")
            if tr == "identity":
                return val, op
            if op == "in":  # a disjunction of equalities: every
                # transform serves it, bucket included
                return [T.apply_transform(tr, src_type, v) for v in val], "in"
            if T.is_order_preserving(tr):
                eff = {"<": "<=", ">": ">="}.get(op, op)
                return T.apply_transform(tr, src_type, val), eff
            if op == "=":  # bucket: equality only
                return T.apply_transform(tr, src_type, val), "="
            return None, None
        # normalize temporal filter values to the bounds' wire units
        # (micros / days) so timestamp and date predicates prune files
        import datetime as _dt

        def _norm_val(t, val):
            if t in ("timestamp", "timestamptz") and isinstance(
                val, _dt.datetime
            ):
                v = val if val.tzinfo else val.replace(tzinfo=_dt.timezone.utc)
                return int(v.timestamp() * 1_000_000)
            if (
                t == "date"
                and isinstance(val, _dt.date)
                and not isinstance(val, _dt.datetime)
            ):
                return (val - _dt.date(1970, 1, 1)).days
            return val

        norm = []
        for col, op, val in filters or []:
            f = by_name.get(col)
            t = f["type"] if f is not None and isinstance(f["type"], str) else None
            if op == "in":  # disjunction of equalities; keep it a list
                val = [_norm_val(t, v) for v in val]
            else:
                val = _norm_val(t, val)
            norm.append((col, op, val))
        filters = norm

        def _manifest_may_match(m: dict) -> bool:
            parts = m.get("partitions")
            if not parts:
                return True
            by_src = _specs_by_src(m.get("partition_spec_id", default_sid))
            for col, op, val in filters:
                src_type = by_name[col]["type"] if col in by_name else None
                for i, pf, rt in by_src.get(col, []):
                    if i >= len(parts):
                        continue
                    tv, eff = _transform_prune(op, val, pf, src_type)
                    if eff is None:
                        continue
                    s = parts[i]
                    lo = decode_single(rt, s.get("lower_bound"))
                    hi = decode_single(rt, s.get("upper_bound"))
                    if not _range_may_match(eff, tv, lo, hi, s.get("contains_null")):
                        return False
            return True

        def _file_may_match(entry: dict, sid: int) -> bool:
            dfile = entry["data_file"]
            by_src = _specs_by_src(sid)
            for col, op, val in filters:
                # partition values are exact per file: apply the same
                # transform to the predicate constant and compare
                pruned = False
                src_type = by_name[col]["type"] if col in by_name else None
                for _i, pf, _rt in by_src.get(col, []):
                    pv = dfile["partition"].get(pf["name"])
                    if pv is None:  # compacted/legacy file: no dir value
                        continue
                    tv, eff = _transform_prune(op, val, pf, src_type)
                    if eff is None:
                        continue
                    if not _cmp(eff, pv, tv):
                        return False
                    if pf.get("transform", "identity") == "identity":
                        pruned = True  # exact value: bounds check redundant
                if pruned:
                    continue
                f = by_name.get(col)
                if f is None or not isinstance(f["type"], str):
                    continue
                lo = hi = None
                for b in dfile.get("lower_bounds") or []:
                    if b["key"] == f["id"]:
                        lo = decode_single(f["type"], b["value"])
                for b in dfile.get("upper_bounds") or []:
                    if b["key"] == f["id"]:
                        hi = decode_single(f["type"], b["value"])
                if not _range_may_match(op, val, lo, hi, None):
                    return False
            return True

        out: list[DataFile] = []
        _, _, manifests = avro_io.read_container(snap["manifest-list"])
        for m in manifests:
            if m.get("content", 0) != 0:  # delete manifest → scan_deletes
                continue
            if not _manifest_may_match(m):
                continue
            sid = m.get("partition_spec_id", default_sid)
            _, _, entries = avro_io.read_container(m["manifest_path"])
            for e in entries:
                if e["status"] == 2:  # DELETED
                    continue
                if e["data_file"].get("content", 0) != 0:
                    continue
                if not _file_may_match(e, sid):
                    continue
                d = e["data_file"]
                lower = {}
                upper = {}
                for b in d.get("lower_bounds") or []:
                    f = by_id.get(b["key"])
                    if f is not None and isinstance(f["type"], str):
                        lower[f["name"]] = decode_single(f["type"], b["value"])
                for b in d.get("upper_bounds") or []:
                    f = by_id.get(b["key"])
                    if f is not None and isinstance(f["type"], str):
                        upper[f["name"]] = decode_single(f["type"], b["value"])
                out.append(
                    DataFile(
                        path=d["file_path"],
                        record_count=d["record_count"],
                        file_size=d["file_size_in_bytes"],
                        partition=dict(d["partition"]),
                        lower_bounds=lower,
                        upper_bounds=upper,
                        split_offsets=d.get("split_offsets"),
                        sequence_number=e.get("sequence_number"),
                        spec_id=sid,
                    )
                )
        return out

    def scan_deletes(
        self,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        ref: str | None = None,
    ) -> list[DataFile]:
        """Delete files live at a snapshot — the merge-on-read side of
        ``scan``. Readers apply them per the v2 rules: a position delete
        names (file_path, pos) ordinals directly; an equality delete
        matches rows on its ``equality_ids`` columns in data files with a
        STRICTLY smaller sequence number (rows appended after the delete
        survive), nulls matching nulls. Time travel composes for free:
        a past snapshot's manifest list simply doesn't reference deletes
        committed later."""
        md = self.metadata()
        snap = self._resolve_snapshot(md, snapshot_id, as_of_ms, ref=ref)
        if snap is None:
            return []
        out: list[DataFile] = []
        _, _, manifests = avro_io.read_container(snap["manifest-list"])
        for m in manifests:
            if m.get("content", 0) != 1:
                continue
            _, _, entries = avro_io.read_container(m["manifest_path"])
            for e in entries:
                if e["status"] == 2:
                    continue
                d = e["data_file"]
                out.append(
                    DataFile(
                        path=d["file_path"],
                        record_count=d["record_count"],
                        file_size=d["file_size_in_bytes"],
                        partition=dict(d["partition"]),
                        content=d.get("content", 1),
                        equality_ids=d.get("equality_ids"),
                        sequence_number=e.get("sequence_number"),
                    )
                )
        return out

    def _resolve_snapshot(
        self,
        md: dict,
        snapshot_id: int | None,
        as_of_ms: int | None,
        ref: str | None = None,
    ) -> dict | None:
        """(ref | snapshot_id | as_of_ms | current) → snapshot dict or
        None. ``ref`` is a branch or tag name from the refs map."""
        snaps = md.get("snapshots", [])
        if ref is not None:
            if snapshot_id is not None or as_of_ms is not None:
                raise ValueError("ref is exclusive with snapshot_id/as_of_ms")
            r = (md.get("refs") or {}).get(ref)
            if r is None:
                raise ValueError(f"ref {ref!r} not found")
            snapshot_id = r["snapshot-id"]
        if snapshot_id is None and as_of_ms is not None:
            older = [s for s in snaps if s["timestamp-ms"] <= as_of_ms]
            if not older:
                return None
            snapshot_id = max(older, key=lambda s: s["timestamp-ms"])["snapshot-id"]
        if snapshot_id is None:
            snapshot_id = md.get("current-snapshot-id", -1)
        if snapshot_id in (-1, None):
            return None
        snap = next((s for s in snaps if s["snapshot-id"] == snapshot_id), None)
        if snap is None:
            raise ValueError(
                f"snapshot {snapshot_id} not found (expired or never existed)"
            )
        return snap

    def _lineage_between(
        self,
        md: dict,
        from_snapshot_id: int | None,
        to_snapshot_id: int | None,
    ) -> list[dict]:
        """Snapshots on the ANCESTRY chain (from, to], oldest-first —
        the lineage-safe range every incremental consumer must walk. A
        plain sequence-number range would leak snapshots staged on a
        concurrent branch (their sequence numbers interleave with
        main's), handing a changelog or CDC-repair reader rows the
        target lineage never gained. ``from_snapshot_id=None`` walks to
        table creation; a ``from`` that is not an ancestor of ``to``
        raises."""
        snaps = {s["snapshot-id"]: s for s in md.get("snapshots", [])}
        if to_snapshot_id is None:
            to_snapshot_id = md.get("current-snapshot-id")
        if to_snapshot_id in (None, -1):
            if from_snapshot_id is None:
                return []
            raise ValueError(f"to snapshot {to_snapshot_id} not found")
        if to_snapshot_id not in snaps:
            raise ValueError(f"to snapshot {to_snapshot_id} not found")
        if from_snapshot_id is not None and from_snapshot_id not in snaps:
            raise ValueError(f"from snapshot {from_snapshot_id} not found")
        out: list[dict] = []
        cur = to_snapshot_id
        while cur is not None and cur in snaps:
            if cur == from_snapshot_id:
                return out[::-1]
            out.append(snaps[cur])
            cur = snaps[cur].get("parent-snapshot-id")
        if from_snapshot_id is None:
            if cur is None:
                return out[::-1]  # reached table creation
            # the chain broke at an EXPIRED ancestor: a silent partial
            # "since creation" delta would violate the replay contract
            raise ValueError(
                f"history before snapshot {cur} has been expired; a "
                "since-creation delta is no longer expressible — start "
                "from a retained snapshot"
            )
        raise ValueError(
            f"snapshot {from_snapshot_id} is not an ancestor of "
            f"{to_snapshot_id}; cannot express the range as a delta"
        )

    def scan_incremental(
        self, from_snapshot_id: int, to_snapshot_id: int | None = None
    ) -> list[DataFile]:
        """Data files ADDED after ``from_snapshot_id`` (exclusive) up to
        ``to_snapshot_id`` (inclusive; default current) — the incremental
        append-scan a CDC consumer runs instead of re-reading the table.
        The range is the ancestry chain, so snapshots staged on
        concurrent branches can never leak in.

        Only defined over append/replace history (like Iceberg's
        incremental read): an overwrite in the range changes rows the
        file delta cannot express, so it raises. ``replace`` (compaction)
        snapshots are skipped — their files carry no NEW logical rows.
        """
        md = self.metadata()
        in_range = self._lineage_between(md, from_snapshot_id, to_snapshot_id)
        for s in in_range:
            if s["summary"]["operation"] in ("overwrite", "delete"):
                raise ValueError(
                    "incremental scan crosses an "
                    f"{s['summary']['operation']} snapshot "
                    f"(seq {s['sequence-number']}); re-read the table"
                )
        out = []
        # walk each append snapshot's OWN manifest list: after a later
        # compaction the newest list no longer references the original
        # append manifests, but the append snapshot's list still does
        for s in in_range:
            if s["summary"]["operation"] == "replace":
                continue  # compaction adds no logical rows
            _, _, manifests = avro_io.read_container(s["manifest-list"])
            for m in manifests:
                if m["sequence_number"] != s["sequence-number"]:
                    continue  # carried forward from an older commit
                _, _, entries = avro_io.read_container(m["manifest_path"])
                for e in entries:
                    if e["status"] != 1:  # only ADDED entries
                        continue
                    if e["data_file"].get("content", 0) != 0:
                        continue  # delete files carry no new rows
                    d = e["data_file"]
                    out.append(
                        DataFile(
                            path=d["file_path"],
                            record_count=d["record_count"],
                            file_size=d["file_size_in_bytes"],
                            partition=dict(d["partition"]),
                        )
                    )
        return out

    def scan_snapshot_adds(
        self, snapshot_id: int, md: dict | None = None
    ) -> list[DataFile]:
        """Data files ADDED by exactly one snapshot, from its OWN manifest
        list (entries at its sequence number, status ADDED) — works for
        snapshots on any branch, which is why the WAP audit reads staged
        deltas through it. Pass ``md`` to plan many snapshots against ONE
        metadata version (and skip per-call metadata re-reads)."""
        if md is None:
            md = self.metadata()
        snap = next(
            (s for s in md.get("snapshots", [])
             if s["snapshot-id"] == snapshot_id), None,
        )
        if snap is None:
            raise ValueError(f"snapshot {snapshot_id} not found")
        out: list[DataFile] = []
        _, _, manifests = avro_io.read_container(snap["manifest-list"])
        for m in manifests:
            if m["sequence_number"] != snap["sequence-number"]:
                continue
            _, _, entries = avro_io.read_container(m["manifest_path"])
            for e in entries:
                if e["status"] != 1 or e["data_file"].get("content", 0) != 0:
                    continue
                d = e["data_file"]
                out.append(
                    DataFile(
                        path=d["file_path"],
                        record_count=d["record_count"],
                        file_size=d["file_size_in_bytes"],
                        partition=dict(d["partition"]),
                    )
                )
        return out

    def operations_between(
        self, from_snapshot_id: int, to_snapshot_id: int | None = None
    ) -> set[str]:
        """Snapshot operations in the ancestry range (from, to] from
        table metadata alone — no manifest IO. The cheap pre-check that
        routes a consumer to ``scan_incremental`` (append-only range) vs
        ``snapshot_changes`` (row deltas present) without paying either
        walk."""
        md = self.metadata()
        return {
            s["summary"]["operation"]
            for s in self._lineage_between(md, from_snapshot_id,
                                           to_snapshot_id)
        }

    def snapshot_changes(
        self,
        from_snapshot_id: int | None,
        to_snapshot_id: int | None = None,
        allow_overwrite: bool = False,
    ) -> list[dict]:
        """Per-snapshot change sets after ``from_snapshot_id`` (exclusive;
        ``None`` = since table creation) — the CDC view a consumer needs
        when the range is NOT append-only and ``scan_incremental``
        refuses. Each entry is ``{"snapshot", "operation", "data_files",
        "delete_files", "removed_data_files"}`` with only the files ADDED
        by that snapshot (status=1 in its own manifest list); ``replace``
        (compaction) snapshots are skipped — no logical change. An
        ``overwrite`` raises by default because a truncate-and-write
        breaks the append-delta representation; with
        ``allow_overwrite=True`` it is instead expressed as a file diff
        against the parent (``removed_data_files`` = live-at-parent minus
        live-here, by path) for changelog consumers that can turn removed
        files back into deleted rows. The range is the ancestry chain of
        ``to`` — snapshots staged on concurrent branches (whose sequence
        numbers interleave) can never leak into the change sets.
        """
        md = self.metadata()
        out: list[dict] = []
        for s in self._lineage_between(md, from_snapshot_id,
                                       to_snapshot_id):
            op = s["summary"]["operation"]
            if op == "replace":
                continue
            removed: list[DataFile] = []
            if op == "overwrite":
                if not allow_overwrite:
                    raise ValueError(
                        f"changes cross an overwrite snapshot "
                        f"(seq {s['sequence-number']}); re-read the table"
                    )
                parent = s.get("parent-snapshot-id")
                live_here = {f.path for f in
                             self.scan(snapshot_id=s["snapshot-id"])}
                if parent is not None:
                    removed = [
                        f for f in self.scan(snapshot_id=parent)
                        if f.path not in live_here
                    ]
            ch = {"snapshot": s, "operation": op,
                  "data_files": [], "delete_files": [],
                  "removed_data_files": removed}
            _, _, manifests = avro_io.read_container(s["manifest-list"])
            for m in manifests:
                if m["sequence_number"] != s["sequence-number"]:
                    continue  # carried forward from an older commit
                _, _, entries = avro_io.read_container(m["manifest_path"])
                for e in entries:
                    if e["status"] != 1:
                        continue
                    d = e["data_file"]
                    df = DataFile(
                        path=d["file_path"],
                        record_count=d["record_count"],
                        file_size=d["file_size_in_bytes"],
                        partition=dict(d["partition"]),
                        content=d.get("content", 0),
                        equality_ids=d.get("equality_ids"),
                        sequence_number=e.get("sequence_number"),
                    )
                    key = "data_files" if df.content == 0 else "delete_files"
                    ch[key].append(df)
            out.append(ch)
        return out

    def spark_ddl(self) -> str:
        return schema_to_spark_ddl(self._schema_struct(self.metadata()))

    # ---- refs (branches / tags / write-audit-publish)

    def refs(self) -> dict:
        """The refs map: name → {snapshot-id, type: branch|tag}."""
        return dict(self.metadata().get("refs") or {})

    def _set_ref(self, name: str, snapshot_id: int | None, rtype: str) -> int:
        md = self.metadata()
        if snapshot_id is None:
            snapshot_id = md.get("current-snapshot-id", -1)
        if snapshot_id in (-1, None):
            raise ValueError("table has no snapshot to reference")
        if not any(s["snapshot-id"] == snapshot_id for s in md["snapshots"]):
            raise ValueError(f"snapshot {snapshot_id} not found")
        refs = dict(md.get("refs") or {})
        if name in refs:
            raise ValueError(f"ref {name!r} already exists")
        refs[name] = {"snapshot-id": snapshot_id, "type": rtype}
        md["refs"] = refs
        md["last-updated-ms"] = _NOW_MS()
        self._write_metadata(md, self.current_version() + 1)
        return snapshot_id

    def create_branch(self, name: str, snapshot_id: int | None = None) -> int:
        """Fork a branch at ``snapshot_id`` (default: main head). Commits
        with ``branch=name`` advance it without moving the table head —
        the staging half of write-audit-publish."""
        return self._set_ref(name, snapshot_id, "branch")

    def create_tag(self, name: str, snapshot_id: int | None = None) -> int:
        """Pin an immutable named snapshot (default: main head) — survives
        ``expire_snapshots`` until the tag is dropped."""
        return self._set_ref(name, snapshot_id, "tag")

    def drop_ref(self, name: str) -> None:
        if name == "main":
            raise ValueError("cannot drop the main branch")
        md = self.metadata()
        refs = dict(md.get("refs") or {})
        if name not in refs:
            raise ValueError(f"ref {name!r} not found")
        del refs[name]
        md["refs"] = refs
        md["last-updated-ms"] = _NOW_MS()
        self._write_metadata(md, self.current_version() + 1)

    def fast_forward(self, branch: str, to: str) -> int:
        """Advance ``branch`` to the head of ref ``to`` — the publish half
        of write-audit-publish (stage commits on an audit branch, run the
        audit, then ``fast_forward('main', 'audit')``). Fast-forward ONLY:
        the current ``branch`` head must be an ancestor of the target
        head, so a diverged branch refuses rather than silently dropping
        commits. Returns the new head snapshot id."""
        md = self.metadata()
        refs = dict(md.get("refs") or {})
        src = refs.get(to)
        if src is None:
            raise ValueError(f"ref {to!r} not found")
        target = src["snapshot-id"]
        cur = refs.get(branch)
        if cur is not None:
            if cur.get("type") == "tag":
                raise ValueError(f"{branch!r} is a tag; tags are immutable")
            head = cur["snapshot-id"]
            if head != target:
                by_id = {s["snapshot-id"]: s for s in md["snapshots"]}
                anc = by_id[target].get("parent-snapshot-id")
                while anc is not None and anc != head:
                    anc = by_id[anc].get("parent-snapshot-id") if anc in by_id else None
                if anc != head:
                    raise ValueError(
                        f"{branch!r} (head {head}) is not an ancestor of "
                        f"{to!r} (head {target}); cannot fast-forward"
                    )
        refs[branch] = {"snapshot-id": target, "type": "branch"}
        md["refs"] = refs
        now = _NOW_MS()
        md["last-updated-ms"] = now
        if branch == "main":
            md["current-snapshot-id"] = target
            md["snapshot-log"].append(
                {"timestamp-ms": now, "snapshot-id": target}
            )
        self._write_metadata(md, self.current_version() + 1)
        return target

    def cherry_pick(self, snapshot_id: int, branch: str = "main") -> int:
        """Re-apply one APPEND snapshot's changes onto ``branch`` as a
        new commit — the publish path for a staged snapshot whose branch
        has DIVERGED from main (fast_forward correctly refuses there).

        The staged snapshot's own added manifests are carried into the
        new commit's manifest list VERBATIM — same Avro files, original
        entry sequence numbers and bounds — so no data file moves, file
        pruning keeps full statistics, and the hive ``seq=N`` row stamps
        stay consistent with the manifest entries. Only ``append``
        snapshots are eligible: re-applying a delete/overwrite under a
        moved base would silently change which rows it affects (upstream
        Iceberg's cherrypick_snapshot draws the same line).
        """
        md = self.metadata()
        snap = next(
            (s for s in md.get("snapshots", [])
             if s["snapshot-id"] == snapshot_id), None,
        )
        if snap is None:
            raise ValueError(f"snapshot {snapshot_id} not found")
        if snap["summary"]["operation"] != "append":
            raise ValueError(
                "cherry_pick supports append snapshots only; "
                f"{snapshot_id} is {snap['summary']['operation']!r}"
            )
        _, _, own = avro_io.read_container(snap["manifest-list"])
        added = [m for m in own
                 if m["sequence_number"] == snap["sequence-number"]]
        if not added:
            raise ValueError(f"snapshot {snapshot_id} added no manifests")

        def _build(new_id: int, new_seq: int) -> list[dict]:
            md2 = self.metadata()
            refs = md2.get("refs") or {}
            head = (refs.get(branch) or {}).get("snapshot-id")
            carried: list[dict] = []
            if head is not None:
                cur = next(
                    s for s in md2["snapshots"]
                    if s["snapshot-id"] == head
                )
                _, _, carried = avro_io.read_container(cur["manifest-list"])
            # the picked manifests are ADDED BY THIS COMMIT: every
            # added-file detector (scan_incremental, scan_snapshot_adds,
            # snapshot_changes) matches the manifest-level sequence
            # number against the committing snapshot's, so the records
            # must be re-stamped with the new ids — entry-level sequence
            # numbers inside the Avro files stay original (matching the
            # hive seq dirs and MOR scoping), same convention as
            # _rewrite_manifest_without
            picked = [
                {**m, "sequence_number": new_seq, "added_snapshot_id": new_id}
                for m in added
            ]
            return picked + carried

        # the default summary would say added-records=0 (files=[]); the
        # picked manifests know the real counts
        summ = {
            "cherry-picked-from": snapshot_id,
            "added-data-files": sum(m["added_files_count"] for m in added),
            "added-records": sum(m["added_rows_count"] for m in added),
        }
        bid = snap["summary"].get("streaming-batch-id")
        if bid is not None:
            summ["streaming-batch-id"] = bid
        return self.commit(
            [], operation="append", summary=summ, branch=branch,
            manifests_override=_build,
        )

    def set_properties(self, props: dict) -> None:
        """Merge ``props`` into the table properties in one metadata
        commit (no snapshot). Properties survive snapshot expiry, which
        is what makes them the right home for consumer high-water marks
        (e.g. the streaming sink's published batch id)."""
        md = self.metadata()
        md["properties"] = {
            **(md.get("properties") or {}),
            **{k: str(v) for k, v in props.items()},
        }
        md["last-updated-ms"] = _NOW_MS()
        self._write_metadata(md, self.current_version() + 1)

    def properties(self) -> dict:
        return dict(self.metadata().get("properties") or {})

    def rollback_to(
        self, snapshot_id: int, require_ancestor: bool = True
    ) -> int:
        """Move main back to ``snapshot_id`` — the undo for a bad publish.
        Note: the streaming sink's published high-water mark
        (``streaming-batch-id-hwm`` property) is NOT rolled back — if the
        intent is to re-ingest the rolled-back batches, lower or remove
        the property explicitly via ``set_properties``.
        One metadata swap; no file is touched, so rolling FORWARD again
        (rollback_to the newer id with ``require_ancestor=False``) stays
        possible until ``expire_snapshots`` reclaims it. By default the
        target must be an ancestor of the current head (the spec's
        rollback contract); ``require_ancestor=False`` is
        set-current-snapshot for recovering onto a divergent line."""
        md = self.metadata()
        by_id = {s["snapshot-id"]: s for s in md.get("snapshots", [])}
        if snapshot_id not in by_id:
            raise ValueError(f"snapshot {snapshot_id} not found")
        cur = md.get("current-snapshot-id")
        if require_ancestor:
            anc = cur
            while anc not in (None, -1) and anc != snapshot_id:
                anc = by_id[anc].get("parent-snapshot-id") if anc in by_id \
                    else None
            if anc != snapshot_id:
                raise ValueError(
                    f"snapshot {snapshot_id} is not an ancestor of the "
                    f"current head {cur}; pass require_ancestor=False to "
                    "set-current-snapshot explicitly"
                )
        refs = dict(md.get("refs") or {})
        refs["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
        md["refs"] = refs
        md["current-snapshot-id"] = snapshot_id
        now = _NOW_MS()
        md["last-updated-ms"] = now
        md["snapshot-log"].append(
            {"timestamp-ms": now, "snapshot-id": snapshot_id}
        )
        self._write_metadata(md, self.current_version() + 1)
        return snapshot_id

    # ---- maintenance

    def remove_orphan_files(self) -> list[str]:
        """Delete parquet under the table's data/deletes dirs that NO live
        snapshot's manifests reference — the debris of crashed commits
        (files written, metadata never swapped) and of staging branches
        whose snapshots have been expired. Metadata files are never
        touched; expire_snapshots owns snapshot retention. Returns the
        deleted paths."""
        md = self.metadata()
        referenced: set[str] = set()
        for s in md.get("snapshots", []):
            _, _, manifests = avro_io.read_container(s["manifest-list"])
            for m in manifests:
                _, _, entries = avro_io.read_container(m["manifest_path"])
                for e in entries:
                    referenced.add(e["data_file"]["file_path"])
        dead = []
        for sub in ("data", "deletes"):
            root = os.path.join(self.location, sub)
            for dirpath, _dirs, names in os.walk(root):
                for n in names:
                    p = os.path.join(dirpath, n)
                    if n.endswith(".parquet") and p not in referenced:
                        dead.append(p)
        for p in sorted(dead):
            os.remove(p)
        return sorted(dead)

    def rewrite_manifests(self, min_count_to_merge: int = 2) -> dict:
        """Compact the MANIFEST layer: merge each (content, spec-id)
        group of the current manifest list that has at least
        ``min_count_to_merge`` manifests into one manifest, and commit a
        ``replace`` snapshot that changes no data file and no logical
        row. Merged entries become EXISTING with their ORIGINAL
        sequence numbers and snapshot ids (the MOR strict-sequence rule
        and per-file provenance survive); DELETED tombstone entries are
        dropped (history keeps them in the old snapshots' own manifest
        lists); per-manifest partition summaries are recomputed so
        manifest-level pruning keeps working on the merged file.

        Why it exists at scale: a 10^12-turn table ingesting thousands
        of commits per day accrues one manifest per commit — a scan
        plan that opens 100k tiny Avro files is a metadata bottleneck
        long before data IO is. This is upstream Iceberg's
        rewrite_manifests maintenance action; run it on the same
        windows as data compaction. Returns counts:
        ``{"manifests_before", "manifests_after", "merged_groups"}``.
        """
        md = self.metadata()
        snap = self.current_snapshot()
        if snap is None:
            return {"manifests_before": 0, "manifests_after": 0,
                    "merged_groups": 0}
        _, _, manifests = avro_io.read_container(snap["manifest-list"])
        groups: dict[tuple, list[dict]] = {}
        for m in manifests:
            key = (m.get("content", 0), m["partition_spec_id"])
            groups.setdefault(key, []).append(m)
        mergeable = {k: ms for k, ms in groups.items()
                     if len(ms) >= min_count_to_merge}
        if not mergeable:
            return {"manifests_before": len(manifests),
                    "manifests_after": len(manifests), "merged_groups": 0}

        def _build(snapshot_id: int, seq: int) -> list[dict]:
            out: list[dict] = []
            for key in sorted(groups):
                ms = groups[key]
                if key not in mergeable:
                    out.extend(ms)
                    continue
                merged = self._merge_manifest_group(
                    md, ms, *key, snapshot_id, seq
                )
                if merged is not None:
                    out.append(merged)
            return out

        self.commit(
            [], operation="replace",
            summary={"rewrite-manifests": "true",
                     "manifests-replaced": len(manifests)},
            manifests_override=_build,
        )
        _, _, after = avro_io.read_container(
            self.current_snapshot()["manifest-list"]
        )
        return {"manifests_before": len(manifests),
                "manifests_after": len(after),
                "merged_groups": len(mergeable)}

    def _merge_manifest_group(
        self,
        md: dict,
        ms: list[dict],
        content: int,
        spec_id: int,
        snapshot_id: int,
        seq: int,
    ) -> dict | None:
        """Merge one (content, spec-id) manifest group into a single
        manifest of EXISTING entries. Entry sequence numbers, file
        sequence numbers, and snapshot ids are preserved verbatim; the
        entry Avro schema is rebuilt from the group's partition spec and
        the CURRENT table schema (safe across int→long / float→double
        promotions — old narrow values encode under the wide type)."""
        struct = self._schema_struct(md)
        spec_fields = next(
            (s["fields"] for s in md.get("partition-specs", [])
             if s["spec-id"] == spec_id), [],
        )
        entries: list[dict] = []
        seqs: list[int] = []
        n_rows = 0
        for m in ms:
            _, _, es = avro_io.read_container(m["manifest_path"])
            for e in es:
                if e["status"] == 2:
                    continue  # tombstone: not live; old lists keep it
                rec = dict(e)
                rec["status"] = 0  # EXISTING
                entries.append(rec)
                sn = rec.get("sequence_number")
                seqs.append(seq if sn is None else sn)
                n_rows += rec["data_file"]["record_count"]
        if not entries:
            return None
        mpath = os.path.join(self.meta_dir, f"m-{uuid.uuid4()}.avro")
        length = avro_io.write_container(
            mpath,
            manifest_entry_schema(spec_fields, struct),
            entries,
            metadata={
                "schema": json.dumps(struct | {"type": "struct"}),
                "schema-id": str(md["current-schema-id"]),
                "partition-spec": json.dumps(spec_fields),
                "partition-spec-id": str(spec_id),
                "format-version": "2",
                "content": "deletes" if content else "data",
            },
        )
        summaries = self._partition_summaries(
            spec_fields, struct,
            [e["data_file"].get("partition") or {} for e in entries],
        )
        return {
            "manifest_path": mpath,
            "manifest_length": length,
            "partition_spec_id": spec_id,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": min(seqs),
            "added_snapshot_id": snapshot_id,
            "added_files_count": 0,
            "existing_files_count": len(entries),
            "deleted_files_count": 0,
            "added_rows_count": 0,
            "existing_rows_count": n_rows,
            "deleted_rows_count": 0,
            "partitions": summaries,
        }

    def expire_snapshots(
        self, keep_last: int = 1, older_than_ms: int | None = None
    ) -> list[str]:
        """Drop all but the newest ``keep_last`` snapshots; delete data
        files referenced ONLY by expired snapshots. Returns deleted
        paths. ``older_than_ms`` adds upstream Iceberg's age contract:
        only snapshots committed BEFORE that timestamp are eligible, so
        a retention policy like "keep 3 days of time travel" is
        ``older_than_ms=now-3d`` regardless of commit rate — and a
        snapshot newer than the horizon survives even beyond
        ``keep_last``.
        """
        md = self.metadata()
        snaps = sorted(md["snapshots"], key=lambda s: s["sequence-number"])
        if len(snaps) <= keep_last:
            return []
        # ref heads (branches and tags) are pinned: a tag exists to make a
        # snapshot unexpirable, and dropping a live branch head would leave
        # the refs map dangling
        pinned = {r["snapshot-id"] for r in (md.get("refs") or {}).values()}
        keep = snaps[-keep_last:] + [
            s for s in snaps[:-keep_last]
            if s["snapshot-id"] in pinned
            or (older_than_ms is not None
                and s["timestamp-ms"] >= older_than_ms)
        ]
        keep_set = {s["snapshot-id"] for s in keep}
        drop = [s for s in snaps if s["snapshot-id"] not in keep_set]
        if not drop:
            return []

        def _files_of(snap_list):
            paths = set()
            for s in snap_list:
                _, _, manifests = avro_io.read_container(s["manifest-list"])
                for m in manifests:
                    _, _, entries = avro_io.read_container(m["manifest_path"])
                    for e in entries:
                        if e["status"] != 2:
                            paths.add(e["data_file"]["file_path"])
            return paths

        live = _files_of(keep)
        dead = _files_of(drop) - live
        for p in sorted(dead):
            if os.path.exists(p):
                os.remove(p)
        keep_ids = {s["snapshot-id"] for s in keep}
        md["snapshots"] = [s for s in md["snapshots"] if s["snapshot-id"] in keep_ids]
        md["snapshot-log"] = [
            e for e in md["snapshot-log"] if e["snapshot-id"] in keep_ids
        ]
        md["last-updated-ms"] = _NOW_MS()
        self._write_metadata(md, self.current_version() + 1)
        return sorted(dead)


def _cmp(op: str, a, b) -> bool:
    if op == "in":
        return a in b
    if op == "=":
        return a == b
    if op == "<":
        return a < b
    if op == "<=":
        return a <= b
    if op == ">":
        return a > b
    if op == ">=":
        return a >= b
    raise ValueError(op)


def _range_may_match(op: str, val, lo, hi, contains_null) -> bool:
    """Could any value in [lo, hi] satisfy ``x op val``? Missing bounds
    (None) are unknown → keep the file."""
    if op == "in":
        return any(
            _range_may_match("=", v, lo, hi, contains_null) for v in val
        )
    if op == "=":
        if lo is not None and _lt(val, lo):
            return False
        if hi is not None and _lt(hi, val):
            return False
        return True
    if op in ("<", "<="):
        if lo is None:
            return True
        return _lt(lo, val) or (op == "<=" and lo == val)
    if op in (">", ">="):
        if hi is None:
            return True
        return _lt(val, hi) or (op == ">=" and hi == val)
    raise ValueError(op)
