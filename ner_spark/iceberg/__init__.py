"""Pure-python Iceberg v2 table-format layer (SURVEY.md §4.4).

The north rule targets Iceberg tables, but this sandbox has no Iceberg
runtime jars and no network. Rather than stopping at the JSON-manifest
stand-in (ner_spark.io `fmt='parquet'`), this package implements the
*actual* Iceberg v2 metadata protocol over the same parquet data files,
from the public spec (https://iceberg.apache.org/spec/), stdlib-only:

- ``avro_io``     Avro object-container-file writer/reader (null codec) —
                  manifests and manifest lists are Avro per the spec.
- ``table``       table metadata JSON, snapshots, manifest lists,
                  manifests, commit protocol (version-hint + vN.metadata),
                  time-travel scans, min/max file pruning, snapshot expiry.

An external Iceberg client pointed at ``warehouse/<table>`` reads these
tables directly (HadoopTables layout: ``metadata/version-hint.text`` +
``metadata/vN.metadata.json``). The sandbox's independent oracle is the
JVM's bundled ``org.apache.avro`` (avro-1.12.1.jar on the Spark
classpath), which round-trip-decodes every manifest this package writes
(tests/test_iceberg_format.py).
"""

from ner_spark.iceberg.table import IcebergLocalTable  # noqa: F401
