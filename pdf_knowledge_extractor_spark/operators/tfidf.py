"""TF-IDF — DataFrame-native long form + Spark ML vector form.

Semantics reproduced from the reference vectorizer setup
(semantic_analyzer.py:286-304): sublinear TF (1 + ln(tf)), smooth-free
idf = ln(N / df), L2-normalized rows; token rule = the keyword token
rule (lexicons.TOKEN rules); per-doc top-k keyword scoring
(semantic_analyzer.py:653-674).

The long form ``(doc_id, term, weight)`` is the engine's canonical
representation: it is oracle-checkable in SQL, joins/aggregates shuffle
on hash(term) or hash(doc_id) with map-side partial aggregation, and it
feeds both the exact cosine self-join and the LSH vectorizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.tuning import hinted


def term_frequencies(mentions: DataFrame) -> DataFrame:
    """(doc_id, text) mention stream -> (doc_id, term, tf).

    INVARIANT (ADVICE r6): doc_id is non-null here. Every mention
    stream in the engine derives doc_id from a source id column
    (explode of tokens under a selected id), so no NULL-doc_id group
    can exist — which is what lets tfidf_longform compute df as a
    plain count(*) over this table (a NULL-doc_id group would count
    toward df where countDistinct(doc_id) ignored it). Callers
    feeding external mention streams must not pass NULL doc ids."""
    return (
        mentions.groupBy(F.col("doc_id"), F.col("text").alias("term"))
        .agg(F.count("*").alias("tf"))
    )


def tfidf_longform(
    mentions: DataFrame,
    n_docs: int | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Long-form L2-normalized sublinear TF-IDF.

    weight = (1 + ln(tf)) * ln(N / df); rows with idf == 0 (term in
    every doc) keep weight 0 and are dropped after normalization.
    ``n_docs``: pass the corpus size if already known to skip a count
    job; otherwise computed via an aggregate + broadcast cross join
    (stays distributed — no driver collect of data rows).
    """
    tf = term_frequencies(mentions)
    # df = count(*), NOT countDistinct(doc_id): tf is unique per
    # (doc_id, term) by construction (it IS the groupBy output), and
    # countDistinct plans a second full exchange of the long form
    # (expand on (term, doc_id), reshuffle, then the term aggregate)
    # that the plain count avoids — measured -25% cold / -10% warm on
    # the 50k-doc tfidf materialization, and one fewer long-form
    # shuffle at any scale
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    if n_docs is None:
        n_df = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
        tf = tf.crossJoin(F.broadcast(n_df))
    else:
        tf = tf.withColumn("n_docs", F.lit(n_docs))
    # hash-join the df and norm lookups (build = the narrow per-term /
    # per-doc aggregate slice): sort-merge would sort the full tf
    # long form twice for two equi-lookups
    weighted = (
        tf.join(df_t.transform(hinted), "term")
        .withColumn(
            "weight",
            (1.0 + F.log(F.col("tf"))) * F.log(F.col("n_docs") / F.col("df")),
        )
        .select("doc_id", "term", "tf", "df", "weight")
    )
    if not normalize:
        return weighted
    norms = weighted.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("_norm")
    )
    return (
        weighted.join(norms.transform(hinted), "doc_id")
        .filter(F.col("_norm") > 0)
        .withColumn("weight", F.col("weight") / F.col("_norm"))
        .drop("_norm")
    )


def per_doc_top_terms(tfidf: DataFrame, k: int = 20) -> DataFrame:
    """Per-doc top-k terms by tfidf weight (keyword extraction,
    semantic_analyzer.py:653-674). Deterministic tie-break on term."""
    w = Window.partitionBy("doc_id").orderBy(F.desc("weight"), F.asc("term"))
    return (
        tfidf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "weight", "rank")
    )


def to_ml_vectors(tfidf: DataFrame, vocab_size: int = 1 << 18) -> DataFrame:
    """Long form -> (doc_id, features: SparseVector) by hashing terms
    into a fixed vocab space (feature-hashing; collisions vanish at
    2^18 for <100k-term vocabularies). Feeds KMeans / LSH."""
    from pyspark.ml.linalg import SparseVector, VectorUDT

    indexed = (
        tfidf.withColumn(
            "_idx", F.pmod(F.xxhash64("term"), F.lit(vocab_size)).cast("int")
        )
        # merge hash collisions before vector assembly
        .groupBy("doc_id", "_idx")
        .agg(F.sum("weight").alias("_w"))
    )
    grouped = indexed.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_idx"), F.col("_w")))
        ).alias("_entries")
    )

    import numpy as np

    # Arrow-optimized UDF (ArrowEvalPython — batched Arrow transfer,
    # never BatchEvalPython). pandas_udf cannot return VectorUDT (the
    # Arrow serializer rejects UDT Series), so a scalar Arrow UDF is
    # the fastest Python path Spark offers for sparse-vector assembly.
    # Round 7: the vector crosses the boundary as TWO parallel
    # primitive arrays (projected from the sorted entries JVM-side)
    # instead of an array of structs, and the SparseVector is built by
    # filling the instance fields directly — the struct-to-dict
    # conversion plus Vectors.sparse's per-row list building and
    # validation was 4x the whole operator (22.8s -> 5.9s at 500k
    # docs, identical vectors; indices are unique and ascending by
    # construction: grouped per (doc, _idx) and array_sort'ed).
    @F.udf(VectorUDT(), useArrow=True)
    def _to_vec(idx, vals):
        sv = SparseVector.__new__(SparseVector)
        sv.size = vocab_size
        sv.indices = np.asarray(idx, dtype=np.int32)
        sv.values = np.asarray(vals, dtype=np.float64)
        return sv

    return grouped.select(
        "doc_id",
        _to_vec(
            F.col("_entries._idx"), F.col("_entries._w")
        ).alias("features"),
    )
