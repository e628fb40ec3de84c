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

from pdf_knowledge_extractor_spark.tuning import hinted


# Registry of the RDD JVM handles backing every localCheckpointed
# result produced by _finalize, awaiting an explicit release. The
# checkpoint blocks live in executor storage for the session lifetime
# otherwise — spark.catalog.clearCache() does NOT remove them (it only
# walks the DataFrame cache manager), so a long-lived session looping
# these operators accumulates storage invisible to the usual cleanup
# path. Entries are (id(result_df), jrdd); the id key lets callers
# release ONLY the results they own (ADVICE r5 #2: a blanket drain
# after consuming one operator's result used to unpersist every OTHER
# still-held finalized DataFrame, whose next action then failed with
# CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — lineage is truncated, nothing
# recomputes). _PENDING_LOCK guards the list: concurrent pipelines in
# one session must not race appends against drains.
import threading as _threading

_PENDING_LOCK = _threading.Lock()
_PENDING_CHECKPOINTS: list = []  # [(key, jrdd)]


def _checkpoint_rdd(df: DataFrame):
    """JVM handle of the RDD backing a localCheckpointed DataFrame
    (its analyzed plan is a LogicalRDD whose ``rdd`` field holds the
    checkpointed partitions)."""
    return df._jdf.queryExecution().analyzed().rdd()


def _finalize(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize the (small) result via an eager localCheckpoint,
    then release the operator's internal caches — persisted
    intermediates must outlive every job that computes the result, and
    a lazy return would leak them across repeated operator calls in a
    long-lived session (they are invisible to the caller).

    localCheckpoint stores partitions on executor local disks (not
    fault-tolerant to executor loss); these results are top-k /
    near-dup pair tables, small enough that a lost-executor recompute
    from source is acceptable. For durable outputs, write the returned
    DataFrame to a real sink.

    Lifecycle: the checkpoint blocks of the RESULT are registered in a
    module-level registry keyed by the returned DataFrame; call
    :func:`release_checkpointed_results` (all results, e.g. end of a
    bench loop) or ``release_checkpointed_results(df)`` (just the ones
    you own) once consumed, or the blocks stay in executor storage for
    the session lifetime (they are invisible to
    ``spark.catalog.clearCache()``)."""
    out = result.localCheckpoint(eager=True)
    try:
        with _PENDING_LOCK:
            _PENDING_CHECKPOINTS.append((id(out), _checkpoint_rdd(out)))
    except Exception:  # pragma: no cover
        pass
    for df in cached:
        df.unpersist()
    return out


def release_checkpointed_results(*results: DataFrame) -> int:
    """Unpersist the checkpoint blocks of finalized results
    (similarity / dedup / ann pair and top-k tables).

    With DataFrame arguments, releases ONLY those results' blocks —
    the owned-lifecycle form safe to call while other finalized results
    are still live elsewhere in the session. With no arguments,
    releases EVERY pending result (the end-of-session / end-of-loop
    drain) — only safe when no finalized DataFrame from any operator
    will be used again: a released DataFrame's lineage is truncated, so
    any later job on it fails loudly with
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND rather than recomputing.
    Returns the number of checkpoints released."""
    with _PENDING_LOCK:
        if results:
            keys = {id(df) for df in results}
            taken = [e for e in _PENDING_CHECKPOINTS if e[0] in keys]
            _PENDING_CHECKPOINTS[:] = [
                e for e in _PENDING_CHECKPOINTS if e[0] not in keys
            ]
        else:
            taken = list(_PENDING_CHECKPOINTS)
            _PENDING_CHECKPOINTS.clear()
    n = 0
    for _, jrdd in taken:
        try:
            jrdd.unpersist(False)
            n += 1
        except Exception:
            pass
    return n


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


def hyperplane_sign(table: int, bit: int, index: int) -> float:
    """Deterministic ±1 hyperplane component: parity of the first hex
    digit of md5("table_bit_index"). md5 is identical in Python,
    Spark SQL and DuckDB, so the same hyperplanes — and therefore the
    exact bucket assignment — can be re-derived by the SQL oracle."""
    import hashlib

    h = hashlib.md5(f"{table}_{bit}_{index}".encode()).hexdigest()
    return 1.0 if int(h[0], 16) & 1 else -1.0


def _hyperplane_bits(vec_col, dim: int, n_bits: int, table: int):
    """n_bits-bit bucket id: bit b = [dot(v, r_{table,b}) > 0], packed
    as Σ bit_b * 2^b. The ±1 hyperplanes are PYTHON-side constants
    (hyperplane_sign) folded into literal arrays — computed once at
    plan build instead of hashed per row per component."""
    sig = F.lit(0)
    for b in range(n_bits):
        r = F.array(
            *[F.lit(hyperplane_sign(table, b, i)) for i in range(dim)]
        )
        contrib = _dot(vec_col, r)
        sig = sig + F.when(contrib > 0, F.lit(1 << b)).otherwise(F.lit(0))
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
    # bucket rows carry ids only — the multi-table dedup (distinct)
    # must not shuffle embedding vectors; they are re-attached to the
    # deduped id pairs afterwards (the _rescore_candidates pattern)
    buckets = sigs.select(
        "vid",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("tbl"), F.col(f"sig{t}").alias("sig"))
                for t in range(n_tables)
            ])
        ).alias("b"),
    ).select("vid", F.col("b.tbl"), F.col("b.sig"))
    c1 = buckets.select(F.col("vid").alias("query_id"), "tbl", "sig")
    c2 = buckets.select(F.col("vid").alias("nbr_id"), "tbl", "sig")
    # hash-join the bucket self-join and dedup the multi-table pair
    # stream in ONE exchange on query_id (a subset of the pair key
    # co-locates all copies, and it is the distribution the q_vec
    # join and the top-k window both need) — distinct() would add a
    # second full exchange of the pair stream, and sort-merge joins
    # would sort it besides (the similarity-operator spill fix)
    cand = (
        c1.join(c2.transform(hinted), ["tbl", "sig"])
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id")
        .repartition(F.col("query_id"))
        .dropDuplicates(["query_id", "nbr_id"])
    )
    vecs = sigs.select("vid", "vec")
    scored = (
        cand.join(
            vecs.select(
                F.col("vid").alias("query_id"), F.col("vec").alias("q_vec")
            ).transform(hinted),
            "query_id",
        )
        .join(
            vecs.select(
                F.col("vid").alias("nbr_id"), F.col("vec").alias("nbr_vec")
            ).transform(hinted),
            "nbr_id",
        )
        .withColumn("cosine", cosine_expr(F.col("q_vec"), F.col("nbr_vec")))
    )
    # tie-break on round(cosine, 9) so last-ulp float noise between
    # engines cannot reorder equal-similarity neighbors
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 9)), F.asc("nbr_id")
    )
    return _finalize(
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank"),
        sigs,
    )


def ivf_multiprobe_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF with a deterministic hyperplane coarse quantizer +
    multi-probe (Lv et al., "Multi-Probe LSH", VLDB'07 — public
    technique): list id = log2(n_lists) hyperplane sign bits; a query
    probes the ``n_probe`` lists closest to its own code by Hamming
    distance (ties: list id asc) and scores exactly within them.

    Same shape as the KMeans IVF (ivf_topk) — inverted lists bound the
    candidate set to ~n_probe/n_lists of the corpus — but the
    quantizer is a pure function of the vector, so the whole operator
    (lists, probe order, rescoring, top-k) is reproducible by the
    DuckDB SQL oracle, which is how the driver contract gates it.
    ``n_lists`` must be a power of two.
    """
    m = n_lists.bit_length() - 1
    if (1 << m) != n_lists:
        raise ValueError("n_lists must be a power of two")
    if dim is None:
        first = embeddings.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    assigned = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        _hyperplane_bits(F.col(vec_col), dim, m, table=0).alias("list_id"),
    ).persist()
    spark = embeddings.sparkSession
    lists = spark.range(n_lists).select(F.col("id").cast("int").alias("probe_list"))
    # probe set: n_probe lists by hamming(query code, list id)
    q = assigned.select(
        F.col("vid").alias("query_id"), F.col("list_id").alias("q_code")
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("probe_list")
    )
    probes = (
        q.crossJoin(F.broadcast(lists))
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("q_code").bitwiseXOR(F.col("probe_list")).cast("long")
            ),
        )
        .withColumn("r", F.row_number().over(pw))
        .filter(F.col("r") <= n_probe)
        .select("query_id", F.col("probe_list").alias("list_id"))
    )
    cand = (
        probes.join(assigned, "list_id")
        .filter(F.col("query_id") != F.col("vid"))
        .select("query_id", F.col("vid").alias("nbr_id"))
    )
    vecs = assigned.select("vid", "vec")
    # hash-join the vector re-attach (build = per-partition vector
    # slice) — merge joins would sort the candidate stream twice
    scored = (
        cand.join(
            vecs.select(
                F.col("vid").alias("query_id"), F.col("vec").alias("q_vec")
            ).transform(hinted),
            "query_id",
        )
        .join(
            vecs.select(
                F.col("vid").alias("nbr_id"), F.col("vec").alias("nbr_vec")
            ).transform(hinted),
            "nbr_id",
        )
        .withColumn("cosine", cosine_expr(F.col("q_vec"), F.col("nbr_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 9)), F.asc("nbr_id")
    )
    return _finalize(
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank"),
        assigned,
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fixed_centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: KMeans partitions the corpus into ``n_lists``
    inverted lists; each query probes its ``n_probe`` nearest
    centroids and scores exactly within those lists only. The classic
    coarse-quantizer trade: recall grows with n_probe, cost is
    ~n_probe/n_lists of brute force. Spark-shaped: centroid assignment
    is an ML transform; the probe set is a small broadcast join on
    list id.

    ``fixed_centroids`` (list_id int, center array<double>) swaps the
    KMeans fit for a caller-pinned quantizer: assignment = argmin
    squared euclidean distance (exactly what KMeans.transform does,
    ties -> list_id asc), everything downstream identical. With
    deterministic centroids the WHOLE operator — lists, probe order,
    rescoring, top-k — is reproducible by the DuckDB SQL oracle, which
    is how the driver contract gates this KMeans-shaped variant
    (ann_ivf_kmeans_topk); the hyperplane twin (ivf_multiprobe_topk)
    is gated the same way via md5 hyperplanes.
    """
    spark = embeddings.sparkSession
    if fixed_centroids is not None:
        centers_df = fixed_centroids
        vecs0 = embeddings.select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
        )
        d2 = F.aggregate(
            F.zip_with(F.col("vec"), F.col("center"), lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        aw = Window.partitionBy("vid").orderBy(F.asc("d2"), F.asc("list_id"))
        assigned = (
            vecs0.crossJoin(F.broadcast(centers_df))
            .withColumn("d2", d2)
            .withColumn("r", F.row_number().over(aw))
            .filter(F.col("r") == 1)
            .select("vid", "vec", "list_id")
            .persist()
        )
    else:
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
            (i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ]
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
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 9)), F.asc("nbr_id")
    )
    return _finalize(
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank"),
        assigned,
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
