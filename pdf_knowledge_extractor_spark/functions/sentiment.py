"""Lexicon sentiment scoring — pure column expressions.

Semantics reproduced from analyzer.py:180-209: count whitespace tokens
of lower(text) hitting 6-word positive / negative lexicons; label =
argmax, score = max/total, neutral+0.0 on tie or no hits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.lexicons import NEGATIVE_WORDS, POSITIVE_WORDS


def _hit_count(text: Column, lexicon: tuple[str, ...]) -> Column:
    words = F.split(F.lower(F.trim(text)), r"\s+")
    lex = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(words, lambda w: F.array_contains(lex, w)))


def sentiment_struct(text: Column) -> Column:
    """struct<sentiment:string, score:double, positive_indicators:int,
    negative_indicators:int>."""
    pos = _hit_count(text, POSITIVE_WORDS)
    neg = _hit_count(text, NEGATIVE_WORDS)
    total = pos + neg
    label = (
        F.when(total == 0, "neutral")
        .when(pos > neg, "positive")
        .when(neg > pos, "negative")
        .otherwise("neutral")
    )
    score = (
        F.when(total == 0, F.lit(0.0))
        .when(pos > neg, pos / total)
        .when(neg > pos, neg / total)
        .otherwise(F.lit(0.0))
    )
    return F.struct(
        label.alias("sentiment"),
        score.cast("double").alias("score"),
        pos.alias("positive_indicators"),
        neg.alias("negative_indicators"),
    )
