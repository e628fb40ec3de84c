"""Heaps-vocabulary realism of the synthetic corpus (ADVICE r5 #1).

The r5 defect: tail words beyond BODY_VOCAB were synthesized as
``tok<idx>`` (digits embedded), but the keyword tokenizer only keeps
``[a-z]{4,}`` runs (lexicons.TOKEN_SPLIT_RE / keyword_tokens, matching
the reference's claude_integration.py:1302 rule) — so every synthesized
word was silently dropped from the mention/tfidf stream, ``n_vocab``
never grew the effective vocabulary, and it only shortened documents.
That voided the round-5 heaps-vs-linear census controls. These tests
pin the fix: synthesized words are pure-alphabetic and actually reach
the token stream, growing both vocabulary and keeping document length.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.corpus import (
    BODY_VOCAB,
    generate_corpus,
    heaps_vocab,
)
from pdf_knowledge_extractor_spark.functions.text import keyword_tokens


def _token_stats(spark, n_vocab):
    docs = generate_corpus(spark, 300, n_vocab=n_vocab)
    toks = docs.select(
        F.explode(keyword_tokens(F.col("content"))).alias("tok")
    )
    row = toks.agg(
        F.countDistinct("tok").alias("vocab"),
        F.count("*").alias("total"),
        F.coalesce(
            F.sum(F.col("tok").rlike("^tok[a-z]+$").cast("long")), F.lit(0)
        ).alias("tail_hits"),
        F.coalesce(
            F.sum((~F.col("tok").rlike("^[a-z]+$")).cast("long")), F.lit(0)
        ).alias("non_alpha"),
    ).first()
    return row


def test_tail_words_survive_keyword_tokens(spark):
    V = 20_000  # >> len(BODY_VOCAB)=4000 -> tail path active
    assert V > len(BODY_VOCAB)
    row = _token_stats(spark, V)
    # synthesized tail words reach the token stream...
    assert row["tail_hits"] > 0, "no synthesized tail word survived"
    # ...and every surviving token is pure-alphabetic by construction
    assert row["non_alpha"] == 0


def test_n_vocab_grows_effective_vocabulary_not_shrinks_docs(spark):
    base = _token_stats(spark, None)
    heaps = _token_stats(spark, 20_000)
    # the knob must grow the tokenized vocabulary, not be inert
    assert heaps["vocab"] > base["vocab"] * 1.5, (
        f"effective vocab inert: {base['vocab']} -> {heaps['vocab']}"
    )
    # and must NOT shorten documents (the r5 symptom was a silent
    # 20-30% token loss); allow small jitter from the quality-filter
    # rows and Zipf draw differences
    assert heaps["total"] >= base["total"] * 0.95, (
        f"token stream shrank: {base['total']} -> {heaps['total']}"
    )


def test_heaps_vocab_monotone():
    assert heaps_vocab(100) == len(BODY_VOCAB)  # floored at the base
    assert heaps_vocab(1_200_000) > heaps_vocab(300_000) > len(BODY_VOCAB)
