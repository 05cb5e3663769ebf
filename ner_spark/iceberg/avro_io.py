"""Avro object container files, stdlib-only (Avro 1.12 spec).

Iceberg stores manifests and manifest lists as Avro; this module writes
and reads the subset of Avro that Iceberg metadata uses:

- primitives: null, boolean, int, long, string, bytes, double, float
- complex: record, array, map (string keys), fixed
- unions: only the nullable form ``["null", T]`` / ``[T, "null"]``
- codec: ``null`` (uncompressed), the spec default — universally readable

Encoding rules implemented from the Avro 1.12 specification "Binary
encoding" section: int/long are zigzag varints; string/bytes are a long
length followed by the payload; arrays and maps are sequences of
count-prefixed blocks terminated by a zero count; a union is the zigzag
branch index followed by the branch value; records are their fields in
declaration order.

The reader is schema-driven off the container's embedded schema (the
writer schema), which is exactly how Avro readers bootstrap; schema
resolution/evolution is out of scope. Independence check: the JVM's
org.apache.avro (bundled with Spark) decodes files written here —
tests/test_iceberg_format.py round-trips through py4j.
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Any, BinaryIO

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- encoding

def _zigzag(n: int) -> bytes:
    """Variable-length zigzag encoding shared by Avro int and long."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_zigzag(buf: BinaryIO) -> int:
    shift = 0
    u = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        u |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _encode_bytes(v: bytes) -> bytes:
    return _zigzag(len(v)) + v


def _encode_string(v: str) -> bytes:
    return _encode_bytes(v.encode("utf-8"))


def _is_nullable_union(schema: Any) -> bool:
    return (
        isinstance(schema, list)
        and len(schema) == 2
        and "null" in schema[0:1] + schema[1:2]
    )


def _schema_type(schema: Any) -> str:
    """The type tag of a (possibly dict-wrapped) schema node."""
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def encode(schema: Any, value: Any, named: dict[str, Any] | None = None) -> bytes:
    """Encode one value against its writer schema."""
    named = named if named is not None else {}
    t = _schema_type(schema)
    if isinstance(schema, dict) and t in ("record", "fixed", "enum"):
        named[schema["name"]] = schema
    if isinstance(schema, str) and schema in named:
        schema = named[schema]
        t = _schema_type(schema)

    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return _zigzag(int(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "string":
        return _encode_string(value)
    if t == "bytes":
        return _encode_bytes(bytes(value))
    if t == "fixed":
        v = bytes(value)
        if len(v) != schema["size"]:
            raise ValueError(f"fixed size {schema['size']} != {len(v)}")
        return v
    if t == "union":
        if not _is_nullable_union(schema):
            raise NotImplementedError("only nullable unions are supported")
        null_idx = 0 if schema[0] == "null" else 1
        if value is None:
            return _zigzag(null_idx)
        branch = schema[1 - null_idx]
        return _zigzag(1 - null_idx) + encode(branch, value, named)
    if t == "record":
        out = bytearray()
        for f in schema["fields"]:
            if isinstance(value, dict):
                fv = value.get(f["name"])
            else:
                fv = getattr(value, f["name"])
            out += encode(f["type"], fv, named)
        return bytes(out)
    if t == "array":
        out = bytearray()
        items = list(value)
        if items:
            out += _zigzag(len(items))
            for it in items:
                out += encode(schema["items"], it, named)
        out += _zigzag(0)
        return bytes(out)
    if t == "map":
        out = bytearray()
        pairs = list(value.items())
        if pairs:
            out += _zigzag(len(pairs))
            for k, v in pairs:
                out += _encode_string(k)
                out += encode(schema["values"], v, named)
        out += _zigzag(0)
        return bytes(out)
    raise NotImplementedError(f"avro type {t!r}")


# ---------------------------------------------------------------- decoding

def decode(schema: Any, buf: BinaryIO, named: dict[str, Any] | None = None) -> Any:
    named = named if named is not None else {}
    t = _schema_type(schema)
    if isinstance(schema, dict) and t in ("record", "fixed", "enum"):
        named[schema["name"]] = schema
    if isinstance(schema, str) and schema in named:
        schema = named[schema]
        t = _schema_type(schema)

    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_zigzag(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        n = _read_zigzag(buf)
        return buf.read(n).decode("utf-8")
    if t == "bytes":
        n = _read_zigzag(buf)
        return buf.read(n)
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "union":
        idx = _read_zigzag(buf)
        return decode(schema[idx], buf, named)
    if t == "record":
        return {f["name"]: decode(f["type"], buf, named) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_zigzag(buf)
            if n == 0:
                break
            if n < 0:  # block with explicit byte size
                _read_zigzag(buf)
                n = -n
            for _ in range(n):
                out.append(decode(schema["items"], buf, named))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_zigzag(buf)
            if n == 0:
                break
            if n < 0:
                _read_zigzag(buf)
                n = -n
            for _ in range(n):
                k_len = _read_zigzag(buf)
                k = buf.read(k_len).decode("utf-8")
                out[k] = decode(schema["values"], buf, named)
        return out
    raise NotImplementedError(f"avro type {t!r}")


# --------------------------------------------------------- container files

def write_container(
    path: str,
    schema: dict,
    records: list[Any],
    metadata: dict[str, str] | None = None,
) -> int:
    """Write an Avro object container file (null codec); returns file length.

    The 16-byte sync marker is derived deterministically from the path so
    repeated builds of the same table are byte-stable (Iceberg itself only
    requires the marker to be consistent within the file).
    """
    import hashlib

    sync = hashlib.md5(path.encode("utf-8")).digest()
    meta = {"avro.schema": json.dumps(schema), "avro.codec": "null"}
    for k, v in (metadata or {}).items():
        meta[k] = v
    header = bytearray(MAGIC)
    header += _zigzag(len(meta))
    for k, v in sorted(meta.items()):
        header += _encode_string(k)
        header += _encode_bytes(v.encode("utf-8"))
    header += _zigzag(0)
    header += sync

    body = bytearray()
    for rec in records:
        body += encode(schema, rec)

    out = bytearray(header)
    if records:
        out += _zigzag(len(records))
        out += _zigzag(len(body))
        out += body
        out += sync
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, path)
    return len(out)


def read_container(path: str) -> tuple[dict, dict[str, str], list[Any]]:
    """Read an object container file → (schema, file metadata, records)."""
    with open(path, "rb") as f:
        raw = f.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an avro container: {path}")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_zigzag(buf)
        if n == 0:
            break
        if n < 0:
            _read_zigzag(buf)
            n = -n
        for _ in range(n):
            k_len = _read_zigzag(buf)
            k = buf.read(k_len).decode("utf-8")
            v_len = _read_zigzag(buf)
            meta[k] = buf.read(v_len)
    sync = buf.read(16)
    codec = meta.get("avro.codec", b"null").decode()
    if codec != "null":
        raise NotImplementedError(f"codec {codec}")
    schema = json.loads(meta["avro.schema"])
    records: list[Any] = []
    while buf.tell() < len(raw):
        count = _read_zigzag(buf)
        _size = _read_zigzag(buf)
        for _ in range(count):
            records.append(decode(schema, buf))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
    str_meta = {
        k: v.decode("utf-8", "replace") for k, v in meta.items() if k != "avro.schema"
    }
    return schema, str_meta, records
