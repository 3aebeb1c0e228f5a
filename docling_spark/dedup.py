"""Deduplication operators over the ``documents`` table.

Four families, all Spark-first (explode/groupBy/join - no driver loops):

- exact: hash-groupBy on a normalized fingerprint;
- MinHash + LSH: shingle -> K minhashes -> B bands -> bucket self-join;
- SimHash: 64-bit sign-aggregated token hashes (bit algebra, no UDF);
- n-gram Jaccard verify: exact similarity on LSH candidate pairs only.

At 100 TB the only materialized shuffles are groupBys on
(band, bucket-hash) keys whose cardinality we control, and the candidate
pair set - never an all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def normalized_text(col="text"):
    return F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) docs: fingerprint -> ids."""
    fp = documents.select(
        "doc_id", F.md5(normalized_text()).alias("fingerprint"))
    return (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("dup_count"),
             F.min("doc_id").alias("keeper_id"),
             F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .where(F.col("dup_count") > 1)
    )


def dedup_keep_first(documents: DataFrame) -> DataFrame:
    """Exact dedup: keep the smallest doc_id per fingerprint."""
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        documents
        .withColumn("fingerprint", F.md5(normalized_text()))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "fingerprint")
    )


def shingles(documents: DataFrame, k: int = 5) -> DataFrame:
    """Word k-shingles per doc (distinct), via sequence+transform -
    JVM-side array algebra, no Python."""
    toks = F.split(normalized_text(), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    return documents.select(
        "doc_id",
        F.explode(F.array_distinct(sh)).alias("shingle"),
    ).where(F.length("shingle") > 0)


def minhash_signatures(documents: DataFrame, k: int = 5,
                       num_hashes: int = 64) -> DataFrame:
    """K minhash values per doc: min over xxhash64(shingle, seed) per seed.

    One explode + one groupBy; the seed dimension is an array column, so
    the shuffle carries num_hashes longs per doc, not per shingle.
    """
    sh = shingles(documents, k)
    seeds = list(range(num_hashes))
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(s))).alias(f"h{s}")
        for s in seeds
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{s}") for s in seeds]).alias("signature"))


def lsh_candidate_pairs(documents: DataFrame, k: int = 5,
                        num_hashes: int = 64, bands: int = 16) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(documents, k, num_hashes)
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("signature"),
                                    b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"))))
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(right,
                  (F.col("l.band") == F.col("r.band"))
                  & (F.col("l.bucket") == F.col("r.bucket"))
                  & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard(documents: DataFrame, pairs: DataFrame,
                  k: int = 5) -> DataFrame:
    """Exact Jaccard over word k-shingles for candidate pairs (verification
    stage after LSH; the join fans out only over candidates)."""
    sh = shingles(documents, k)
    a = sh.withColumnRenamed("doc_id", "doc_a").alias("a")
    b = sh.withColumnRenamed("doc_id", "doc_b").alias("b")
    inter = (
        pairs.join(a, "doc_a").join(
            b, (F.col("b.doc_b") == pairs["doc_b"])
            & (F.col("a.shingle") == F.col("b.shingle")))
        .groupBy("doc_a", pairs["doc_b"])
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
              .withColumnRenamed("n_shingles", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_shingles", "size_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter_size")
            / (F.col("size_a") + F.col("size_b") - F.col("inter_size")))
        .select("doc_a", "doc_b", "inter_size", "jaccard")
    )


def near_duplicates(documents: DataFrame, k: int = 5, num_hashes: int = 64,
                    bands: int = 16, threshold: float = 0.8) -> DataFrame:
    """MinHash-LSH candidates verified by exact shingle Jaccard."""
    pairs = lsh_candidate_pairs(documents, k, num_hashes, bands)
    return (ngram_jaccard(documents, pairs, k)
            .where(F.col("jaccard") >= threshold))


def simhash(documents: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc: sign aggregation of per-token hashes.

    Pure column algebra: explode tokens, per-bit +-1 votes via bit tests on
    xxhash64(token), aggregate sums, reassemble the sign bits.
    """
    toks = documents.select(
        "doc_id", F.explode(F.split(normalized_text(), r"\s+")).alias("tok"))
    toks = toks.where(F.col("tok") != "")
    h = F.xxhash64("tok")
    votes = [
        F.sum(F.when(
            F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) != 0, 1)
            .otherwise(-1)).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sig = F.lit(0).cast("long")
    for b in range(bits - 1):  # top bit excluded to stay in signed-long range
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(0)
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_near_duplicates(documents: DataFrame,
                            max_hamming: int = 3) -> DataFrame:
    """Candidate pairs whose simhashes differ in <= max_hamming bits.

    Block on 4 x 16-bit sub-bands (pigeonhole: any pair within hamming<=3
    shares at least one exact band), then verify with bit_count."""
    sig = simhash(documents)
    bands = [
        F.shiftrightunsigned(F.col("simhash"), 16 * i)
        .bitwiseAND(F.lit(0xFFFF)).alias(f"band{i}")
        for i in range(4)
    ]
    banded = sig.select("doc_id", "simhash", *bands)
    pairs = None
    for i in range(4):
        l = banded.alias("l")
        r = banded.alias("r")
        p = (l.join(r, (F.col(f"l.band{i}") == F.col(f"r.band{i}"))
                    & (F.col("l.doc_id") < F.col("r.doc_id")))
             .select(F.col("l.doc_id").alias("doc_a"),
                     F.col("r.doc_id").alias("doc_b"),
                     F.col("l.simhash").alias("sim_a"),
                     F.col("r.simhash").alias("sim_b")))
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.distinct()
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (pairs.withColumn("hamming", hamming)
            .where(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))
