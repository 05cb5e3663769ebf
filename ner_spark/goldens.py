"""Golden-snapshot oracles for the deterministic rows-only registry
entries (round-3 VERDICT stretch item 10).

Every entry listed here is a pure function of committed inputs (the
seed-42 tiny fixture, the generated conll corpus, the synthetic media
table, or the pure-function transcript_gen feed), so its full output can
be pinned to a committed parquet under ``golden/``. The DuckDB oracle is
then simply ``SELECT * FROM read_parquet(<golden>)`` — which upgrades
these entries from the driver's weak rows-only check to the full
rows+schema+value-hash gate.

Provenance (what makes this more than self-comparison): the snapshots
are produced by ``tools/make_goldens.py``, which FIRST asserts parity
against the independent single-process oracle (oracle/ref_pipeline.py)
on every shared column — the same assertions the pytest contract gates
make — and only then writes the Spark output. A code regression that
changes any value therefore either fails the parity assertion at
regeneration time or fails the driver/sweep hash against the committed
snapshot at run time. Regenerate with::

    python tools/make_goldens.py

`sketch_distinct_quantiles` stays rows-only on purpose: its outputs are
approximate sketches whose exact values are engine-version-specific.
"""

from __future__ import annotations

import os

from ner_spark.registry import ORACLE_SQL

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden"
)

# sf-INDEPENDENT entries (they run on the seed-42 tiny fixture or a pure
# generated feed regardless of the sf_dir argument): one snapshot each
GOLDEN_FIXED = [
    "kg_mentions",
    "kg_links",
    "kg_entities_canonical",
    "kg_triples",
    "kg_entity_rollup",
    "kg_eval_prf",
    "stream_incremental_links",
    "stream_windowed_mentions",
    "stream_stateful_mentions",
    "stream_session_stats",
    "stream_transcript_source",
    "conll_ingest",
]

# sf-DEPENDENT entries (they scan the sf documents table): one snapshot
# per testdata scale, selected at query time by the corpus fingerprint
# (COUNT(*), SUM(doc_id * n_chars)) — content-weighted so a regenerated
# corpus with the same total characters cannot silently select the wrong
# snapshot (ADVICE r03 item 3); the oracle SQL cannot see the sf_dir, but
# it can see the pre-registered `documents` view. CONSTRAINT: these
# oracles only hold
# for the three pinned testdata dirs below; against any other corpus
# every branch's fingerprint predicate is false and the oracle returns 0
# rows (the sweep flags it as a vacuous empty rather than passing). If
# the testdata regenerates, tests/test_goldens.py catches the stale
# fingerprints — rerun tools/make_goldens.py.
GOLDEN_PER_SF = [
    "dedup_minhash_fast",
    "mm_image_features",
    "mm_image_resize",
    "mm_frame_sample",
]

GOLDEN_SF_DIRS = {
    "sf0_001": "/root/testdata/sf0.001",
    "sf0_01": "/root/testdata/sf0.01",
    "sf0_1": "/root/testdata/sf0.1",
}

GOLDEN_ENTRIES = GOLDEN_FIXED + GOLDEN_PER_SF


def register_goldens() -> list[str]:
    """Attach a read_parquet oracle for every committed golden file.
    Missing files are skipped (a fresh tree before make_goldens ran keeps
    the old rows-only behavior rather than erroring)."""
    import json

    attached = []
    for name in GOLDEN_FIXED:
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        if os.path.exists(path):
            sql = f"SELECT * FROM read_parquet('{path}')"
            ORACLE_SQL.setdefault(name, sql)
            if ORACLE_SQL[name] == sql:  # only count a real attach —
                attached.append(name)  # a pre-existing oracle wins
    keys_path = os.path.join(GOLDEN_DIR, "sf_keys.json")
    if os.path.exists(keys_path):
        with open(keys_path) as f:
            sf_keys = json.load(f)  # {tag: [n_rows, sum_doc_id_x_n_chars]}
        for name in GOLDEN_PER_SF:
            parts = []
            for tag, (n_rows, wsum) in sf_keys.items():
                path = os.path.join(GOLDEN_DIR, f"{name}.{tag}.parquet")
                if os.path.exists(path):
                    parts.append(
                        f"SELECT * FROM read_parquet('{path}') WHERE "
                        f"(SELECT COUNT(*) FROM documents) = {n_rows} AND "
                        f"(SELECT SUM(doc_id * n_chars) FROM documents)"
                        f" = {wsum}"
                    )
            if parts:
                sql = "\nUNION ALL\n".join(parts)
                ORACLE_SQL.setdefault(name, sql)
                if ORACLE_SQL[name] == sql:
                    attached.append(name)
    return attached


register_goldens()
