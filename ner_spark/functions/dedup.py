"""Production-path dedup primitives (task brief: dedup at 100 TB).

The registry's `dedup_minhash_lsh` deliberately hashes with MD5 hex
strings because that is the only hash both Spark and DuckDB compute
bit-identically — the price of the differential oracle. This module is
the Spark-only production path: identical LSH shape (per-row signatures
via higher-order functions, banded self-join, >= 2 band hits), but with
64-bit xxhash64 (one JVM intrinsic per shingle per band) instead of 8 MD5
hex strings (~10x less hashing + no string allocation per shingle).

Equivalence to the differential variant is pinned by
tests/test_dedup_functions.py: on the fixture corpus both variants must
recover exactly the ground-truth pairs (word-3-gram Jaccard >= 0.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _parallelize_small_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition IFF the scan produced fewer partitions
    than the cluster has slots. Parquet packs small files into one
    partition (maxPartitionBytes), which serializes every CPU-bound map
    stage downstream — measured 6s single-task vs <0.5s at 32-way for
    the sf0.1 minhash signatures. At warehouse scale the scan already
    has >> slots partitions and this is a no-op; the shuffle it inserts
    on small inputs moves less data than one task's worth of work."""
    if df.isStreaming:
        # micro-batch parallelism is the source's concern (maxFilesPerTrigger
        # etc.), and .rdd is undefined on a streaming frame
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingles array<string>) — distinct word n-grams per doc;
    input re-parallelized if the scan under-partitioned (see
    _parallelize_small_input)."""
    docs = _parallelize_small_input(docs)
    toks = F.split(F.col(text_col), " ")
    gram = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    return docs.where(F.size(toks) >= n).select(
        "doc_id", F.array_distinct(gram).alias("shingles")
    )


def minhash_signatures(
    sh: DataFrame, n_bands: int = 8, hash_fn=F.xxhash64
) -> DataFrame:
    """(doc_id, band, minhash): per-row banded minhash via
    array_min(transform(...)) — zero shuffle before the signature join,
    the property that keeps LSH linear at scale (no shingle explode).

    ``hash_fn`` is the only axis the two variants differ on: xxhash64
    (bigint, JVM intrinsic) for the production path, F.md5 (hex string,
    bit-identical in DuckDB) for the differential oracle pair — ONE copy
    of the banding/self-join scaffolding serves both, so tokenization or
    threshold changes cannot silently diverge them."""

    def band_min(band: int):
        # one-arg lambda factory: a default-arg lambda would be read by
        # F.transform as an (element, index) binary lambda
        return F.array_min(
            F.transform(
                "shingles",
                lambda s: hash_fn(F.concat(F.lit(f"{band}|"), s)),
            )
        )

    return sh.select(
        "doc_id",
        F.posexplode(F.array(*[band_min(b) for b in range(n_bands)])).alias(
            "band", "minhash"
        ),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n_bands: int = 8,
    min_band_hits: int = 2,
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Candidate near-dup pairs (doc_a, doc_b, n_band_hits): docs colliding
    in >= min_band_hits bands. The self-join is equi on (band, minhash), so
    the LSH buckets ARE the shuffle partitions; per-bucket fan-out is
    bounded by bucket size, the standard LSH contract."""
    sig = minhash_signatures(shingles(docs, text_col), n_bands, hash_fn)
    return lsh_pairs_from_signatures(sig, min_band_hits)


def lsh_pairs_from_signatures(
    sig: DataFrame, min_band_hits: int = 2, max_bucket: int | None = 1000
) -> DataFrame:
    """The LSH bucket self-join alone, over an existing (doc_id, band,
    minhash) signature table — split out so a staged pipeline can
    materialize signatures once (the full-corpus scan) and resume from
    them (plans/curation.py).

    Bucket-size cap (default 1000, mirrored in the oracle _pairs_sql): a
    bucket of d colliding docs contributes d^2 rows to the self-join, so
    one degenerate bucket — boilerplate/empty/templated documents all
    sharing a band minhash — turns the join quadratic at 100 TB. Those
    docs are exact-dup-like (every member pairs with every other; the
    hash-groupBy dedup_exact path is the right tool for them), so pair
    enumeration inside giant buckets carries no near-dup signal worth
    d^2 rows. Same guard class as the document-frequency cap on the
    jaccard posting join. At the gate scales the largest bucket is ~20,
    so the cap is behavior-preserving there."""
    if max_bucket:
        hot = (
            sig.groupBy("band", "minhash")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > max_bucket)
            .select("band", "minhash")
        )
        sig = sig.join(hot, ["band", "minhash"], "left_anti")
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_band_hits"))
        .where(F.col("n_band_hits") >= min_band_hits)
    )
