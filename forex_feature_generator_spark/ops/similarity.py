"""Similarity search over an embedding column (array<float>).

  * brute_force_topk — broadcast the (small) query set, exact cosine top-k.
    JVM-side dot products via zip_with/aggregate; one narrow stage + per-query
    top-k window. Baseline and oracle-checkable.
  * lsh_topk — random-hyperplane signatures -> bucket join -> exact rerank.
    The 100 TB path: candidates per query ~ bucket size, not corpus size.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    av = F.transform(F.col(a), lambda x: x.cast("double"))
    bv = F.transform(F.col(b), lambda x: x.cast("double"))
    return df.withColumn(out, _dot(av, bv) / (_norm(av) * _norm(bv)))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(query_id, neighbor_id, rank, cosine). Excludes self-pairs; the query
    side is broadcast (no shuffle of the corpus)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"))
    joined = (c.crossJoin(F.broadcast(q))
              .filter(F.col("neighbor_id") != F.col("query_id")))
    scored = with_cosine(joined, "q_vec", "c_vec").drop("q_vec", "c_vec")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("cosine", 6).alias("cosine")))


def embedding_near_dups(corpus: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).
    Brute-force baseline (broadcast one side); at scale swap the candidate
    generation for lsh_topk-style bucket joins."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("id_a") < F.col("id_b"))
    scored = with_cosine(pairs, "va", "vb").drop("va", "vb")
    return (scored.filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", F.round("cosine", 6).alias("cosine")))


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_planes, dim)).tolist()


def lsh_signature(vec_col, planes: list[list[float]]):
    """Bit-signature: sign of the dot product against each hyperplane."""
    bits = [F.when(_dot(F.transform(vec_col, lambda x: x.cast("double")),
                        F.array(*[F.lit(float(w)) for w in plane])) > 0, 1).otherwise(0)
            for plane in planes]
    sig = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        sig = sig.bitwiseOR(F.shiftleft(b.cast("long"), i))
    return sig


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_planes: int = 16, n_bands: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bands restrict candidates to
    shared buckets, then exact cosine rerank. Recall grows with n_bands."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)
    bits_per_band = n_planes // n_bands

    def banded(df, idn):
        sig = lsh_signature(F.col(vec_col), planes)
        d = df.select(F.col(id_col).alias(idn), F.col(vec_col).alias(f"{idn}_vec"),
                      sig.alias("sig"))
        return d.select(
            idn, f"{idn}_vec",
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"),
                         F.shiftright("sig", b * bits_per_band)
                          .bitwiseAND(F.lit((1 << bits_per_band) - 1)).alias("bh"))
                for b in range(n_bands)])).alias("bb")
        ).select(idn, f"{idn}_vec", "bb.band", "bb.bh")

    qb = banded(queries, "query_id")
    cb = banded(corpus, "neighbor_id")
    cand = (cb.join(F.broadcast(qb), ["band", "bh"])
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "query_id_vec", "neighbor_id", "neighbor_id_vec")
            .distinct())
    scored = with_cosine(cand, "query_id_vec", "neighbor_id_vec") \
        .select("query_id", "neighbor_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("cosine", 6).alias("cosine")))
