"""Deduplication operators for large-scale training-data pipelines.

All four standard flavors, DataFrame-first:

- exact: md5 fingerprint of normalized text (groupBy — one shuffle)
- n-gram Jaccard (exact): word-shingle posting-list self-join
- MinHash + LSH banding: shingle -> K minhashes -> bands -> bucket
  join -> candidate pairs -> exact Jaccard verify. All column
  expressions (xxhash64 with per-function salts); no UDFs, no ML fit.
- SimHash: 64-bit signature from per-token hash bits weighted by tf;
  hamming-ball candidates via band equality.

Scale design: every join is an equi-join on a hash/bucket key;
banding keys are (band_id, band_hash) so hot buckets can be salted or
capped; the verify step touches only candidates. MinHash signatures
use the standard min-over-permutations estimator (Broder '97).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.functions.text import clean_text


def normalized_text(col):
    return F.lower(clean_text(col))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint, canonical_id, group_size, is_duplicate)."""
    fp = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalized_text(F.col(text_col))).alias("fingerprint"),
    )
    grp = fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("group_size"),
    )
    return fp.join(grp, "fingerprint").select(
        "doc_id",
        "fingerprint",
        "canonical_id",
        "group_size",
        (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
    )


def word_shingles(col, n: int = 3):
    """Array of word n-gram shingles over normalized text."""
    words = F.split(normalized_text(col), " ")
    m = F.size(words)
    cnt = F.greatest(m - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), F.greatest(cnt, F.lit(1)))
    shingle = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i, n))
    )
    return F.when(cnt > 0, shingle).otherwise(F.array())


def shingle_posting(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct posting list."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 100_000,
) -> DataFrame:
    """Exact n-gram Jaccard self-join:
    |A ∩ B| / |A ∪ B| >= threshold. One equi-join on shingle plus two
    cheap size lookups. ``max_df`` stop-lists boilerplate shingles."""
    posts = shingle_posting(docs, id_col, text_col, n).persist()
    if max_df:
        hot = (
            posts.groupBy("shingle")
            .count()
            .filter(F.col("count") > max_df)
            .select("shingle")
        )
        posts = posts.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = posts.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = posts.select(F.col("doc_id").alias("doc1_id"), "shingle")
    b = posts.select(F.col("doc_id").alias("doc2_id"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc1_id") < F.col("doc2_id"))
        .groupBy("doc1_id", "doc2_id")
        .agg(F.count("*").alias("inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1_id"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2_id"), F.col("sz").alias("sz2"))
    return (
        inter.join(s1, "doc1_id")
        .join(s2, "doc2_id")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1_id", "doc2_id", "inter", "sz1", "sz2", "jaccard")
    )


def minhash_signatures(
    posts: DataFrame, num_hashes: int = 64
) -> DataFrame:
    """(doc_id, sig: array<long>) — k minhashes per doc via
    min(xxhash64(shingle, seed_k)). One explode + one groupBy."""
    ks = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    hashed = posts.select(
        "doc_id",
        F.explode(ks).alias("k"),
        F.col("shingle"),
    ).select(
        "doc_id", "k", F.xxhash64(F.col("shingle"), F.col("k")).alias("h")
    )
    return (
        hashed.groupBy("doc_id", "k")
        .agg(F.min("h").alias("mh"))
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "mh"))),
                lambda s: s["mh"],
            ).alias("sig")
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash banding dedup: K=num_hashes minhashes split into
    ``bands`` bands of K/bands rows; docs sharing any band hash become
    candidates; candidates verified with EXACT Jaccard over shingle
    sets. Precision exact; recall = 1-(1-t^r)^b (t=0.8, r=4, b=16:
    0.9997)."""
    rows_per_band = num_hashes // bands
    posts = shingle_posting(docs, id_col, text_col, n).persist()
    sigs = minhash_signatures(posts, num_hashes)
    banded = sigs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        F.col("sig"),
    ).select(
        "doc_id",
        "band",
        F.xxhash64(
            F.concat_ws(
                "_",
                F.transform(
                    F.slice(
                        F.col("sig"),
                        F.col("band") * rows_per_band + 1,
                        rows_per_band,
                    ),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("band_hash"),
    )
    b1 = banded.select(F.col("doc_id").alias("doc1_id"), "band", "band_hash")
    b2 = banded.select(F.col("doc_id").alias("doc2_id"), "band", "band_hash")
    candidates = (
        b1.join(b2, ["band", "band_hash"])
        .filter(F.col("doc1_id") < F.col("doc2_id"))
        .select("doc1_id", "doc2_id")
        .distinct()
    )
    # exact verify on candidates only
    sizes = posts.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = posts.select(F.col("doc_id").alias("doc1_id"), "shingle")
    b = posts.select(F.col("doc_id").alias("doc2_id"), "shingle")
    inter = (
        candidates.join(a, "doc1_id")
        .join(b, ["doc2_id", "shingle"])
        .groupBy("doc1_id", "doc2_id")
        .agg(F.count("*").alias("inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1_id"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2_id"), F.col("sz").alias("sz2"))
    return (
        inter.join(s1, "doc1_id")
        .join(s2, "doc2_id")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1_id", "doc2_id", "jaccard")
    )


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """64-bit SimHash over word tokens weighted by tf (Charikar,
    STOC'02 — public algorithm): bit_j = sign(Σ_tokens tf * ±1 where
    the sign is bit j of hash(token)). Signature carried as two 32-bit
    halves (sh_hi, sh_lo) — overflow-free under ANSI mode. Pure column
    expressions; the per-bit explode is 64x the token table but stays
    map-side until the (doc, bit) groupBy."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.xxhash64("w"))
    )
    per_bit = tf.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        "tf",
        "h",
    ).withColumn(
        "contrib",
        F.when(
            F.expr("shiftright(h, bit) & 1") == 1, F.col("tf")
        ).otherwise(-F.col("tf")),
    )
    bitvals = (
        per_bit.groupBy("doc_id", "bit")
        .agg(F.sum("contrib").alias("s"))
        .withColumn("bitval",
                    F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)))
    )
    half = F.when(F.col("bit") < 32, F.lit("lo")).otherwise(F.lit("hi"))
    packed = (
        bitvals.withColumn("half", half)
        .withColumn(
            "weighted",
            F.expr("cast(bitval as bigint) * shiftleft(1L, bit % 32)"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("half") == "lo", F.col("weighted"))
                  .otherwise(0)).alias("sh_lo"),
            F.sum(F.when(F.col("half") == "hi", F.col("weighted"))
                  .otherwise(0)).alias("sh_hi"),
        )
    )
    return packed


def simhash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 8,
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming via the
    pigeonhole band trick: split 64 bits into ``bands`` 8-bit blocks —
    any pair within distance d < bands shares at least one identical
    block; block-equality equi-join, then exact popcount verify on
    candidates only."""
    sigs = simhash_signatures(docs, id_col, text_col).persist()
    block_bits = 64 // bands
    half_blocks = 32 // block_bits
    blocks = sigs.select(
        "doc_id",
        "sh_lo",
        "sh_hi",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("blk"),
    ).withColumn(
        "blk_val",
        F.expr(
            f"(CASE WHEN blk < {half_blocks} "
            f"THEN shiftright(sh_lo, blk * {block_bits}) "
            f"ELSE shiftright(sh_hi, (blk - {half_blocks}) * {block_bits}) "
            f"END) & {(1 << block_bits) - 1}"
        ),
    )
    c1 = blocks.select(
        F.col("doc_id").alias("doc1_id"), "blk", "blk_val",
        F.col("sh_lo").alias("lo1"), F.col("sh_hi").alias("hi1"),
    )
    c2 = blocks.select(
        F.col("doc_id").alias("doc2_id"), "blk", "blk_val",
        F.col("sh_lo").alias("lo2"), F.col("sh_hi").alias("hi2"),
    )
    cand = (
        c1.join(c2, ["blk", "blk_val"])
        .filter(F.col("doc1_id") < F.col("doc2_id"))
        .select("doc1_id", "doc2_id", "lo1", "lo2", "hi1", "hi2")
        .distinct()
    )
    hamming = F.bit_count(
        F.col("lo1").bitwiseXOR(F.col("lo2"))
    ) + F.bit_count(F.col("hi1").bitwiseXOR(F.col("hi2")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1_id", "doc2_id", "hamming")
    )
