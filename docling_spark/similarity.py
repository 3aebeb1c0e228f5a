"""Similarity search over the ``embeddings`` table (array<float> column).

- Brute-force cosine top-k: the exact baseline. Dot products via
  ``F.zip_with`` + ``F.aggregate`` (JVM-side higher-order functions, no
  Python). Query side is broadcast - the big side streams.
- LSH (random hyperplane) bucketed variant: the 100-TB path. Sign-bit
  sketches bucket the corpus; only same-bucket pairs get exact scoring.
  Hyperplanes are deterministic (seeded) so results are reproducible.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_normalized(embeddings: DataFrame, col="embedding") -> DataFrame:
    n = _norm(F.col(col))
    return embeddings.withColumn(
        "norm_emb",
        F.when(n > 0, F.transform(F.col(col), lambda v: v / n))
        .otherwise(F.col(col)),
    )


def cosine_topk_bruteforce(embeddings: DataFrame, queries: DataFrame,
                           k: int = 5) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    ``queries``: (vec_id, embedding) - small; broadcast to every task so the
    corpus never shuffles. Score = cosine; ties broken by neighbor id.
    """
    corpus = with_normalized(embeddings).select(
        F.col("vec_id").alias("nbr_id"), F.col("norm_emb").alias("nbr_emb"))
    qs = with_normalized(queries).select(
        F.col("vec_id").alias("query_id"), F.col("norm_emb").alias("q_emb"))
    scored = corpus.join(F.broadcast(qs),
                         F.col("nbr_id") != F.col("query_id"))
    scored = scored.withColumn("cosine", _dot(F.col("q_emb"),
                                              F.col("nbr_emb")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("nbr_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "nbr_id", F.round("cosine", 6).alias("cosine"),
                    "rank"))


def random_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42):
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def lsh_bucket(embeddings: DataFrame, dim: int, n_planes: int = 16,
               seed: int = 42, col="embedding") -> DataFrame:
    """Sign-bit sketch: bucket id = bits of sign(embedding . plane_i)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(random_hyperplanes(dim, n_planes, seed)):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(_dot(F.col(col), arr) > 0,
                                 F.lit(1 << i)).otherwise(0)
    return embeddings.withColumn("bucket", bucket)


def _probe_masks(n_planes: int, radius: int) -> list:
    """XOR masks for all buckets within Hamming ``radius`` of a sketch."""
    from itertools import combinations
    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_planes), r):
            masks.append(sum(1 << b for b in bits))
    return masks


def cosine_topk_lsh(embeddings: DataFrame, queries: DataFrame, dim: int,
                    k: int = 5, n_planes: int = 8, seed: int = 42,
                    n_tables: int = 1, probe_hamming: int = 1) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket(s).

    Recall is governed by two standard knobs (both compose, and both keep
    the corpus-side scan bucket-pruned):

    - ``probe_hamming``: multi-probe - each query also probes every bucket
      within this Hamming radius of its sketch (vectors near a hyperplane
      land on either side; single-probe recall cliffs at scale). Radius 1
      scans ~(n_planes+1)/2^n_planes of the corpus.
    - ``n_tables``: independent hash tables with different hyperplanes; a
      true neighbor is found if ANY table buckets it with the query
      (miss probability decays geometrically in n_tables).

    Candidates are deduped across tables/probes before scoring, so each
    (query, neighbor) pair is scored exactly once.
    """
    from functools import reduce

    corpus = with_normalized(embeddings).select(
        F.col("vec_id").alias("nbr_id"), F.col("norm_emb").alias("nbr_emb"))
    qs = with_normalized(queries).select(
        F.col("vec_id").alias("query_id"), F.col("norm_emb").alias("q_emb"))
    masks = _probe_masks(n_planes, probe_hamming)
    cand_frames = []
    for t in range(n_tables):
        s = seed + 7919 * t
        cb = lsh_bucket(corpus, dim, n_planes, s, col="nbr_emb").select(
            "nbr_id", "bucket")
        qb = lsh_bucket(qs, dim, n_planes, s, col="q_emb").select(
            "query_id", "bucket")
        if len(masks) > 1:
            qb = qb.withColumn("bucket", F.explode(F.array(
                *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])))
        cand_frames.append(
            cb.join(F.broadcast(qb), "bucket")
            .select("query_id", "nbr_id"))
    cands = (reduce(lambda a, b: a.unionByName(b), cand_frames)
             .where(F.col("nbr_id") != F.col("query_id"))
             .distinct())
    scored = (cands.join(corpus, "nbr_id")
              .join(F.broadcast(qs), "query_id")
              .withColumn("cosine", _dot(F.col("q_emb"), F.col("nbr_emb"))))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("nbr_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "nbr_id", F.round("cosine", 6).alias("cosine"),
                    "rank"))


def embedding_dedup(embeddings: DataFrame, dim: int,
                    threshold: float = 0.95, n_planes: int = 10,
                    seed: int = 7) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets + exact verify."""
    corpus = lsh_bucket(with_normalized(embeddings), dim, n_planes, seed,
                        col="norm_emb")
    l = corpus.select(F.col("vec_id").alias("id_a"),
                      F.col("norm_emb").alias("emb_a"), "bucket")
    r = corpus.select(F.col("vec_id").alias("id_b"),
                      F.col("norm_emb").alias("emb_b"), "bucket")
    pairs = l.join(r, ["bucket"]).where(F.col("id_a") < F.col("id_b"))
    pairs = pairs.withColumn("cosine", _dot(F.col("emb_a"), F.col("emb_b")))
    return (pairs.where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
            .distinct())
