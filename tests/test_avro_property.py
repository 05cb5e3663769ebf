"""Property-based round-trips for the stdlib Avro codec (iceberg/avro_io).

Hypothesis generates random records under the supported schema subset
(primitives, nullable unions, arrays, string-keyed maps, nested records)
and checks write_container → read_container is the identity. A JVM
cross-decode (org.apache.avro, the independent reader) runs on one
deterministic composite fixture per session — the per-example JVM trip
would dominate runtime without adding coverage beyond the python trip,
since both decode the same bytes against the same embedded schema.
"""

from __future__ import annotations

import math
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ner_spark.iceberg import avro_io

LONG = st.integers(min_value=-(2**63), max_value=2**63 - 1)
INT = st.integers(min_value=-(2**31), max_value=2**31 - 1)
# exclude NaN: NaN != NaN would fail equality, and Iceberg metadata never
# writes NaN into the fields this codec serves
DOUBLE = st.floats(allow_nan=False, width=64)
TEXT = st.text(max_size=40)
BYTES = st.binary(max_size=40)


def _record_schema() -> dict:
    return {
        "type": "record",
        "name": "prop",
        "fields": [
            {"name": "l", "type": "long"},
            {"name": "i", "type": "int"},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "s", "type": ["null", "string"], "default": None},
            {"name": "by", "type": ["null", "bytes"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {
                "name": "nested",
                "type": [
                    "null",
                    {
                        "type": "record",
                        "name": "inner",
                        "fields": [
                            {"name": "k", "type": "int"},
                            {"name": "v", "type": "string"},
                        ],
                    },
                ],
                "default": None,
            },
        ],
    }


RECORDS = st.lists(
    st.fixed_dictionaries(
        {
            "l": LONG,
            "i": INT,
            "d": DOUBLE,
            "b": st.booleans(),
            "s": st.none() | TEXT,
            "by": st.none() | BYTES,
            "arr": st.lists(LONG, max_size=8),
            "m": st.dictionaries(TEXT, TEXT, max_size=6),
            "nested": st.none()
            | st.fixed_dictionaries({"k": INT, "v": TEXT}),
        }
    ),
    max_size=12,
)


@settings(
    max_examples=80,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(records=RECORDS, data=st.data())
def test_container_roundtrip_property(tmp_path_factory, records, data):
    path = str(tmp_path_factory.mktemp("avro") / "p.avro")
    schema = _record_schema()
    n = avro_io.write_container(path, schema, records)
    assert n == os.path.getsize(path)
    _, _, out = avro_io.read_container(path)
    assert len(out) == len(records)
    for got, want in zip(out, records):
        for k, v in want.items():
            g = got[k]
            if isinstance(v, float):
                assert (g == v) or (math.isnan(g) and math.isnan(v)), k
            else:
                assert g == v, k


def test_jvm_cross_decode_composite(spark, tmp_path):
    """One deterministic composite fixture through the independent JVM
    reader: every supported shape in one file, field-by-field equality."""
    path = str(tmp_path / "c.avro")
    schema = _record_schema()
    records = [
        {
            "l": -(2**62), "i": 2**31 - 1, "d": -0.0, "b": True,
            "s": "héllo☃", "by": b"\x00\xff\x7f",
            "arr": [0, -1, 2**40], "m": {"a": "", "": "v"},
            "nested": {"k": -7, "v": "x"},
        },
        {
            "l": 0, "i": 0, "d": 1e300, "b": False, "s": None, "by": None,
            "arr": [], "m": {}, "nested": None,
        },
    ]
    avro_io.write_container(path, schema, records)
    jvm = spark._jvm
    rdr = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(path), rdr)
    jrecs = []
    while dfr.hasNext():
        jrecs.append(dfr.next())
    assert len(jrecs) == 2
    j0 = jrecs[0]
    assert int(str(j0.get("l"))) == -(2**62)
    assert int(str(j0.get("i"))) == 2**31 - 1
    assert j0.get("s").toString() == "héllo☃"
    assert [int(str(x)) for x in j0.get("arr")] == [0, -1, 2**40]
    jm = j0.get("m")
    got_m = {k.toString(): jm.get(k).toString() for k in jm.keySet()}
    assert got_m == {"a": "", "": "v"}
    assert int(str(j0.get("nested").get("k"))) == -7
    j1 = jrecs[1]
    assert j1.get("s") is None and j1.get("nested") is None
    assert float(str(j1.get("d"))) == 1e300
