"""Related-documents co-occurrence join (J2) and entity-pair
relationships (J5).

Semantics reproduced:
- find_related_documents (claude_integration.py:1342-1375): build the
  keyword posting list from each doc's top-20 keywords; two docs are
  related when they share >= min_shared_keywords (3) keywords; keep
  top 10 per doc by shared count.
- find_relationships (analyzer.py:211-230): all entity pairs with
  different concept_type; strength = mean importance; keep > 0.5;
  emit (e1, e2, 'related_to', strength).

Scale design: the posting-list self-join shuffles on hash(keyword);
ultra-frequent keywords would square. ``max_df_cap`` stop-lists
keywords whose posting list exceeds the cap (the reference's stopword
drop plays the same role); with per-doc top-20 keywords the list is
already bounded by corpus size, and the cap bounds the join by
cap * |keywords|. Entity pairs use a broadcast nested-loop join —
the entity table is tiny after the top-k concept cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def related_documents(
    doc_keywords: DataFrame,
    min_shared: int = 3,
    top_k: int = 10,
    max_df_fraction: float | None = 0.5,
    max_df_abs: int | None = None,
) -> DataFrame:
    """doc_keywords(doc_id, text) posting list -> directed related pairs
    (doc_id, related_doc_id, shared_kw_count, rank<=top_k).

    ``max_df_fraction`` stop-lists keywords present in more than that
    fraction of documents — the posting self-join is Σ df², so one
    corpus-wide keyword alone squares the corpus. This mirrors the
    reference's defenses (stopword drop at claude_integration.py:1305
    and the vectorizer max_df at semantic_analyzer.py:288): a keyword
    shared by most documents carries no relatedness signal."""
    posts = doc_keywords.select("doc_id", F.col("text").alias("keyword"))
    if max_df_fraction is not None or max_df_abs is not None:
        n_docs = posts.select(
            F.countDistinct("doc_id").alias("_n")
        )
        dfs = (
            posts.groupBy("keyword")
            .agg(F.countDistinct("doc_id").alias("_df"))
            .crossJoin(F.broadcast(n_docs))
        )
        cond = F.lit(False)
        if max_df_fraction is not None:
            cond = cond | (F.col("_df") > F.col("_n") * max_df_fraction)
        if max_df_abs is not None:
            # hard cap: the posting self-join costs Σ df², so one
            # keyword with df=d contributes d² pairs regardless of
            # corpus size; d must be bounded by an absolute constant
            # for the join to stay near-linear at 10^12 files
            cond = cond | (F.col("_df") > max_df_abs)
        hot = dfs.filter(cond).select("keyword")
        posts = posts.join(F.broadcast(hot), "keyword", "left_anti")
    a = posts.select(F.col("doc_id").alias("doc_id"), "keyword")
    b = posts.select(F.col("doc_id").alias("related_doc_id"), "keyword")
    pairs = (
        a.join(b, "keyword")
        .filter(F.col("doc_id") != F.col("related_doc_id"))
        .groupBy("doc_id", "related_doc_id")
        .agg(F.count("*").alias("shared_kw_count"))
        .filter(F.col("shared_kw_count") >= min_shared)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("shared_kw_count"), F.asc("related_doc_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def entity_relationships(
    concepts: DataFrame, min_strength: float = 0.5
) -> DataFrame:
    """Cross-type entity pairs: (entity1, entity2, pred='related_to',
    strength = (imp1+imp2)/2 > min_strength). Broadcast θ-join — the
    concept table is capped (top-100) upstream."""
    a = concepts.select(
        F.col("text").alias("entity1"),
        F.col("concept_type").alias("type1"),
        F.col("importance").alias("imp1"),
    )
    b = concepts.select(
        F.col("text").alias("entity2"),
        F.col("concept_type").alias("type2"),
        F.col("importance").alias("imp2"),
    )
    return (
        a.join(F.broadcast(b), F.col("entity1") < F.col("entity2"))
        .filter(F.col("type1") != F.col("type2"))
        .withColumn("strength", (F.col("imp1") + F.col("imp2")) / 2.0)
        .filter(F.col("strength") > min_strength)
        .select(
            "entity1",
            "entity2",
            F.lit("related_to").alias("pred"),
            "strength",
        )
    )
