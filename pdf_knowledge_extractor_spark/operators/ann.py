"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline — cross join with a
  broadcast query side, dot product via F.zip_with/F.aggregate
  (JVM-side; no Python), window top-k.
- LSH-bucketed variant (scale path): random-hyperplane signatures
  (sign of dot with deterministic ±1 vectors — SimHash for vectors,
  Charikar '02), multi-table OR; candidates re-scored exactly.
- embedding near-dup pairs: all-pairs cosine >= threshold via the
  same bucketing.

At 100 TB the brute-force path is the *rescoring* primitive, never
the full join; the bucketed path bounds candidates per table/bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query. ``queries`` defaults to
    the corpus itself (self-join, excluding self matches). The smaller
    side broadcasts."""
    base = embeddings.select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec")
    )
    q = (queries or embeddings).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("nbr_id"))
        .withColumn(
            "cosine", cosine_expr(F.col("q_vec"), F.col("nbr_vec"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def _hyperplane_bits(vec_col, dim: int, n_bits: int, table: int):
    """n_bits sign bits from deterministic ±1 hyperplanes
    (component sign = parity of xxhash64(table, bit, index))."""
    bits = []
    for b in range(n_bits):
        # dot(v, r_b) with r_b[i] = ±1 from hash parity
        contrib = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: F.when(
                    F.pmod(F.xxhash64(F.lit(table), F.lit(b), i), 2) == 1, x
                ).otherwise(-x),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(contrib > 0, F.lit(1)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig * 2 + b
    return sig


def lsh_bucketed_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_bits: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: per table, hash each vector to a
    ``n_bits``-bit hyperplane bucket; candidates = same (table,
    bucket); exact cosine rescore + window top-k. Recall grows with
    n_tables; candidate cost shrinks with n_bits."""
    if dim is None:
        first = embeddings.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    sigs = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        *[
            _hyperplane_bits(F.col(vec_col), dim, n_bits, t).alias(f"sig{t}")
            for t in range(n_tables)
        ],
    ).persist()
    buckets = sigs.select(
        "vid",
        "vec",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("tbl"), F.col(f"sig{t}").alias("sig"))
                for t in range(n_tables)
            ])
        ).alias("b"),
    ).select("vid", "vec", F.col("b.tbl"), F.col("b.sig"))
    c1 = buckets.select(
        F.col("vid").alias("query_id"), F.col("vec").alias("q_vec"),
        "tbl", "sig",
    )
    c2 = buckets.select(
        F.col("vid").alias("nbr_id"), F.col("vec").alias("nbr_vec"),
        "tbl", "sig",
    )
    cand = (
        c1.join(c2, ["tbl", "sig"])
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "q_vec", "nbr_id", "nbr_vec")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine", cosine_expr(F.col("q_vec"), F.col("nbr_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: KMeans partitions the corpus into ``n_lists``
    inverted lists; each query probes its ``n_probe`` nearest
    centroids and scores exactly within those lists only. The classic
    coarse-quantizer trade: recall grows with n_probe, cost is
    ~n_probe/n_lists of brute force. Spark-shaped: centroid assignment
    is an ML transform; the probe set is a small broadcast join on
    list id.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features"),
    )
    km = KMeans(k=n_lists, seed=seed, featuresCol="features",
                predictionCol="list_id")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select("vid", "vec", "list_id").persist()

    # query -> its n_probe nearest centroids (centroids are tiny:
    # compute distances via a literal array per centroid)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    spark = embeddings.sparkSession
    centers_df = spark.createDataFrame(
        centers, "list_id int, center array<double>"
    )
    q = assigned.select(F.col("vid").alias("query_id"),
                        F.col("vec").alias("q_vec"))
    probes = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn("sim", cosine_expr(F.col("q_vec"), F.col("center")))
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("sim"), F.asc("list_id")
                )
            ),
        )
        .filter(F.col("r") <= n_probe)
        .select("query_id", "q_vec", "list_id")
    )
    cand = (
        probes.join(assigned, "list_id")
        .filter(F.col("query_id") != F.col("vid"))
        .select(
            "query_id", "q_vec",
            F.col("vid").alias("nbr_id"), F.col("vec").alias("nbr_vec"),
        )
    )
    scored = cand.withColumn(
        "cosine", cosine_expr(F.col("q_vec"), F.col("nbr_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs embedding cosine >= threshold (exact; broadcast
    self-join — the rescoring primitive, bucket upstream at scale)."""
    a = embeddings.select(
        F.col(id_col).alias("doc1_id"), F.col(vec_col).alias("v1")
    )
    b = embeddings.select(
        F.col(id_col).alias("doc2_id"), F.col(vec_col).alias("v2")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("doc1_id") < F.col("doc2_id"))
        .withColumn("cosine", cosine_expr(F.col("v1"), F.col("v2")))
        .filter(F.col("cosine") >= threshold)
        .select("doc1_id", "doc2_id", "cosine")
    )
