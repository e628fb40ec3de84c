"""Document-similarity θ self-join (J1): exact + LSH-blocked paths.

Semantics reproduced from _compute_document_similarities
(semantic_analyzer.py:255-389): all-pairs cosine over L2-normalized
TF-IDF, keep pairs with score >= threshold (default 0.7,
semantic_analyzer.py:99), emit (doc1, doc2) once with doc1 < doc2;
``shared_concepts`` ships empty (reference leaves it deferred,
semantic_analyzer.py:353-354).

Scale design:
- exact path: long-form self-join on term — sum(w_a * w_b) per pair.
  The join shuffles on hash(term); a per-term posting-list cap (df
  stop-listing) bounds the quadratic blowup of ultra-frequent terms
  exactly like the reference's stopword drop bounds its vectorizer.
  Right at small scale and for oracle checking; O(sum df^2) at 100 TB.
- scale path: BucketedRandomProjectionLSH over the hashed TF-IDF
  vectors. For unit vectors, cosine >= t  <=>  euclidean distance
  <= sqrt(2 - 2t), so the LSH approxSimilarityJoin with that radius
  blocks candidates; we then re-score candidates with the exact dot
  product (cheap: candidate set is near-linear) so emitted scores are
  exact, only recall is approximate (tunable via numHashTables).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_THRESHOLD = 0.7


def exact_cosine_pairs(
    tfidf: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    max_df: int | None = None,
    round_dp: int | None = None,
) -> DataFrame:
    """(doc_id, term, weight[, df]) L2-normalized -> pairs
    (doc1_id, doc2_id, similarity_score) with doc1 < doc2 and score >=
    threshold. ``max_df`` stop-lists terms occurring in more docs
    (bounds the term self-join at scale). ``round_dp`` applies the
    threshold to round(score, dp) instead of the raw double, so
    last-ulp summation-order noise cannot flip borderline pairs (the
    oracle-parity convention)."""
    t = tfidf
    if max_df is not None and "df" in t.columns:
        t = t.filter(F.col("df") <= max_df)
    a = t.select(
        F.col("doc_id").alias("doc1_id"),
        F.col("term"),
        F.col("weight").alias("w1"),
    )
    b = t.select(
        F.col("doc_id").alias("doc2_id"),
        F.col("term"),
        F.col("weight").alias("w2"),
    )
    score = F.col("similarity_score")
    if round_dp is not None:
        score = F.round(score, round_dp)
    return (
        a.join(b, "term")
        .filter(F.col("doc1_id") < F.col("doc2_id"))
        .groupBy("doc1_id", "doc2_id")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("similarity_score"))
        .filter(score >= threshold)
    )


def lsh_cosine_pairs(
    vectors: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    num_hash_tables: int = 4,
    bucket_length: float = 0.5,
    seed: int = 42,
    tfidf: DataFrame | None = None,
) -> DataFrame:
    """Scale path: LSH candidate blocking + exact rescoring.

    ``vectors``: (doc_id, features: Vector), rows assumed
    L2-normalized (hashed term space — collisions OK, they only
    inflate the candidate set). Returns
    (doc1_id, doc2_id, similarity_score).

    When ``tfidf`` (the long-form L2-normalized table) is given,
    candidate pairs are re-scored EXACTLY by the term-join dot product,
    so emitted scores are collision-free and identical to the exact
    path — only recall is approximate (validated >= 0.95 by tests at
    the default parameters). Without it, scores derive from the hashed
    vectors via cos = 1 - dist^2/2.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    radius = math.sqrt(max(2.0 - 2.0 * threshold, 1e-12))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        bucketLength=bucket_length,
        seed=seed,
    )
    model = lsh.fit(vectors)
    # slack on the radius when rescoring: hash collisions can only
    # *raise* hashed-vector similarity, never lower it, so the exact
    # radius already over-collects; no extra slack needed for recall.
    pairs = model.approxSimilarityJoin(
        vectors, vectors, radius, distCol="_dist"
    )
    cand = pairs.filter(
        F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
    ).select(
        F.col("datasetA.doc_id").alias("doc1_id"),
        F.col("datasetB.doc_id").alias("doc2_id"),
        (1.0 - F.col("_dist") * F.col("_dist") / 2.0).alias("_approx"),
    )
    if tfidf is None:
        return cand.filter(F.col("_approx") >= threshold).select(
            "doc1_id", "doc2_id", F.col("_approx").alias("similarity_score")
        )
    return _rescore_candidates(
        cand.select("doc1_id", "doc2_id"), tfidf, threshold
    )


def _doc_vectors(tfidf: DataFrame) -> DataFrame:
    """(doc_id, m: map<term,weight>) — compact per-doc vector for
    map-side rescoring."""
    return tfidf.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("term", "weight"))).alias("m")
    )


def _rescore_candidates(
    candidates: DataFrame, tfidf: DataFrame, threshold: float
) -> DataFrame:
    """Exact dot product for candidate pairs via map-side lookups:
    join the two compact doc vectors onto each candidate row (the
    vector table broadcasts when small; co-partitions on doc_id
    otherwise), then aggregate over the smaller map's entries —
    O(candidates * avg_terms) with no exploded shuffle, versus the
    naive candidate x term join that materializes |cand| * |terms|
    rows."""
    vec = _doc_vectors(tfidf)
    v1 = vec.select(F.col("doc_id").alias("doc1_id"), F.col("m").alias("m1"))
    v2 = vec.select(F.col("doc_id").alias("doc2_id"), F.col("m").alias("m2"))
    dot = F.aggregate(
        F.map_entries("m1"),
        F.lit(0.0),
        lambda acc, e: acc
        + F.coalesce(F.element_at(F.col("m2"), e["key"]), F.lit(0.0))
        * e["value"],
    )
    return (
        candidates.join(v1, "doc1_id")
        .join(v2, "doc2_id")
        .withColumn("similarity_score", dot)
        .filter(F.col("similarity_score") >= threshold)
        .select("doc1_id", "doc2_id", "similarity_score")
    )


def prefix_cosine_pairs(
    tfidf: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    eps: float = 1e-9,
) -> DataFrame:
    """Exact threshold cosine self-join via prefix filtering
    (all-pairs similarity search, Bayardo/Ma/Srikant, WWW'07 — public
    algorithm). The default scale path: exact results, no LSH recall
    loss, and the candidate join touches only *prefix* posting lists.

    Terms are canonically ordered rare-first (df asc). For an
    L2-normalized doc, once the cumulative squared weight of its
    rarest terms reaches 1 - t², the remaining (common) terms alone
    cannot push any pair's dot product to t — so only the rare-term
    prefix participates in the candidate join; candidates that share a
    term in BOTH prefixes are re-scored exactly over the full term
    lists. Cost drops from Σ df² to Σ prefix_df², which removes the
    hot common terms from the quadratic join at 100 TB scale.

    Requires ``df`` column (kept by tfidf_longform) and normalized
    weights.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("term"))
    with_cum = tfidf.withColumn(
        "_cum_before",
        F.coalesce(
            F.sum(F.col("weight") * F.col("weight")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0.0),
        ),
    )
    # row is in the prefix while the mass at-or-after it can still
    # reach the threshold: 1 - cum_before >= t^2
    prefix = with_cum.filter(
        (1.0 - F.col("_cum_before")) >= (threshold * threshold - eps)
    ).select("doc_id", "term")

    pa = prefix.select(F.col("doc_id").alias("doc1_id"), "term")
    pb = prefix.select(F.col("doc_id").alias("doc2_id"), "term")
    candidates = (
        pa.join(pb, "term")
        .filter(F.col("doc1_id") < F.col("doc2_id"))
        .select("doc1_id", "doc2_id")
        .distinct()
    )
    return _rescore_candidates(candidates, tfidf, threshold)


def minhash_blocked_cosine_pairs(
    tfidf: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    num_hashes: int = 60,
    bands: int = 12,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Scale path for the θ self-join: MinHash-Jaccard banding over
    each doc's TERM SET as the candidate blocker, exact cosine rescore
    (map-side dot product) as the scorer.

    Why this beats prefix filtering / cosine-LSH at 100 TB: the
    banding collision curve 1-(1-j^r)^b is far sharper in Jaccard than
    any hyperplane scheme is in cosine — r=5, b=12 gives ~1e-5
    collision probability for unrelated pairs (j≈0.1) and >=0.99 for
    near-duplicates (j>=0.85), so the candidate set stays near-linear
    where the exact prefix join went quadratic (658M candidates at
    100k docs on flat-weight content). Recall at the cosine threshold
    is approximate and data-dependent (pairs with cosine>=0.7 but low
    term-set Jaccard can be missed); tests validate recall >= 0.95 on
    the near-duplicate-structured corpus. Precision is exact (every
    emitted score is the true cosine).

    ``max_bucket_size``: the quadratic failure mode of banding is a
    DEGENERATE bucket — one (band, band_hash) shared by thousands of
    docs (boilerplate, tiny vocabularies) contributes |bucket|²
    candidate pairs; measured superlinear at 600k rows on a 500-word
    vocabulary before the cap existed. Buckets above the limit are
    dropped with a broadcast left-anti join BEFORE the self-join (the
    same guard as dedup.minhash_lsh_pairs) — their members are
    near-identical boilerplate better handled by exact-fingerprint
    dedup, and each doc still has ``bands - 1`` other chances to
    collide with its true near-duplicates. None keeps full banding
    recall (the oracle-parity setting); the pipeline default caps at a
    few hundred (PipelineConfig.similarity_max_bucket).
    """
    rows_per_band = num_hashes // bands
    # one groupBy(doc) to gather the term set; signatures and band
    # hashes computed as array expressions (no K-fold explode shuffle —
    # the 60x row blowup was the dominant allocation/shuffle cost)
    term_sets = tfidf.groupBy("doc_id").agg(
        F.collect_list("term").alias("_terms")
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda k: F.array_min(
            F.transform(F.col("_terms"), lambda t: F.xxhash64(t, k))
        ),
    )
    # Generate barrier: materialize the K-minhash signature once per
    # doc — CollapseProject would otherwise inline it into each of the
    # ``bands`` band hashes, and interpreted HOF eval has no common-
    # subexpression elimination (bands x num_hashes recompute)
    with_sig = term_sets.select(
        "doc_id", F.explode(F.array(sig)).alias("sig")
    )
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(
                "_",
                F.transform(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                ),
            )
        ),
    )
    banded = (
        with_sig.select("doc_id", F.posexplode(band_hashes))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "band_hash")
    )
    if max_bucket_size is not None:
        # persist the banded rows (3 narrow columns) so the bucket
        # census and the anti-join probe don't each recompute the
        # signature HOFs — the expensive subtree of this operator.
        # Cache lifecycle: this operator returns a lazy plan that the
        # pipeline materializes exactly once (similarities is itself
        # persisted), so the cache lives for the job and is evicted
        # LRU afterwards; callers looping this operator should
        # spark.catalog.clearCache() between iterations (bench.py does)
        banded = banded.persist()
        hot_buckets = (
            banded.groupBy("band", "band_hash")
            .count()
            .filter(F.col("count") > max_bucket_size)
            .select("band", "band_hash")
        )
        banded = banded.join(
            F.broadcast(hot_buckets), ["band", "band_hash"], "left_anti"
        )
    b1 = banded.select(F.col("doc_id").alias("doc1_id"), "band", "band_hash")
    b2 = banded.select(F.col("doc_id").alias("doc2_id"), "band", "band_hash")
    candidates = (
        b1.join(b2, ["band", "band_hash"])
        .filter(F.col("doc1_id") < F.col("doc2_id"))
        .select("doc1_id", "doc2_id")
        .distinct()
    )
    return _rescore_candidates(candidates, tfidf, threshold)


def with_similarity_metadata(pairs: DataFrame) -> DataFrame:
    """Attach the reference record shape (similarity_type='cosine',
    shared_concepts=[] — semantic_analyzer.py:42-49, 353-354)."""
    return pairs.select(
        "doc1_id",
        "doc2_id",
        "similarity_score",
        F.lit("cosine").alias("similarity_type"),
        F.array().cast("array<string>").alias("shared_concepts"),
    )


def top_similar_per_doc(pairs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k similar docs per target (semantic_analyzer.py:574-587):
    symmetrize then window top-k."""
    from pyspark.sql import Window

    sym = pairs.select(
        F.col("doc1_id").alias("doc_id"),
        F.col("doc2_id").alias("other_id"),
        "similarity_score",
    ).unionByName(
        pairs.select(
            F.col("doc2_id").alias("doc_id"),
            F.col("doc1_id").alias("other_id"),
            "similarity_score",
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("similarity_score"), F.asc("other_id")
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
