"""Document quality scoring — pure column expressions (JVM codegen).

Semantics reproduced from the reference quality model
(claude_integration.py:723-843): five banded metrics with weights
text_quality 0.40, extraction_ratio 0.25, content_density 0.15,
language_quality 0.10, structure_quality 0.10; plus the text validity
predicate (claude_integration.py:845-877) and the pre-filter
(claude_integration.py:948-1010).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.functions.text import (
    alnum_ratio,
    unique_word_ratio,
)

EXPECTED_CHARS_PER_PAGE = 2500
MAX_CONTENT_LENGTH = 500_000
MIN_CONTENT_QUALITY_RATIO = 0.7
MIN_UNIQUE_WORD_RATIO = 0.1

QUALITY_WEIGHTS = {
    "text_quality": 0.40,
    "extraction_ratio": 0.25,
    "content_density": 0.15,
    "language_quality": 0.10,
    "structure_quality": 0.10,
}

# Structure indicators (claude_integration.py:811-827). `^` is
# string-start (reference uses re.search without re.M).
STRUCTURE_PATTERNS = (
    r"\n\n",
    r"[.!?]\s+[A-Z]",
    r":\s*\n",
    r"^\s*\d+\.",
    r"^\s*[•\-\*]",
)


def split_words(text: Column) -> Column:
    """Whitespace word array, empties dropped (computed once and
    shared when performance matters)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda w: F.length(w) > 0)


def band_text_quality(ar: Column) -> Column:
    return (
        F.when((ar >= 0.6) & (ar <= 0.9), 1.0)
        .when((ar >= 0.4) & (ar < 0.6), 0.7)
        .when((ar >= 0.2) & (ar < 0.4), 0.4)
        .otherwise(0.1)
    )


def text_quality_metric(text: Column) -> Column:
    """Banded alphanumeric-ratio score (0.1/0.4/0.7/1.0)."""
    return band_text_quality(alnum_ratio(text))


def band_extraction_ratio(n_chars: Column, page_count: Column) -> Column:
    expected = page_count * F.lit(EXPECTED_CHARS_PER_PAGE)
    ratio = F.least(n_chars / expected, F.lit(2.0))
    return F.when(
        expected > 0,
        F.when(ratio >= 0.8, 1.0)
        .when(ratio >= 0.5, 0.8)
        .when(ratio >= 0.2, 0.5)
        .otherwise(0.2),
    ).otherwise(0.0)


def extraction_ratio_metric(text: Column, page_count: Column) -> Column:
    """Banded chars-vs-expected(2500/page) score."""
    return band_extraction_ratio(F.length(text), page_count)


def band_content_density(words: Column) -> Column:
    n = F.size(words)
    total_len = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    avg = total_len / n
    return F.when(
        n > 0,
        F.when((avg >= 4) & (avg <= 8), 1.0)
        .when(((avg >= 3) & (avg < 4)) | ((avg > 8) & (avg <= 12)), 0.7)
        .otherwise(0.3),
    ).otherwise(0.0)


def content_density_metric(text: Column) -> Column:
    """Banded average-word-length score (4-8 chars ideal)."""
    return band_content_density(split_words(text))


def band_language_quality(words_lower: Column) -> Column:
    n = F.size(words_lower)
    r = F.when(
        n > 0, F.size(F.array_distinct(words_lower)) / n
    ).otherwise(F.lit(0.0))
    return F.when(
        n > 50,
        F.when(r >= 0.4, 1.0)
        .when(r >= 0.2, 0.6)
        .when(r >= 0.1, 0.3)
        .otherwise(0.1),
    ).otherwise(0.8)


def language_quality_metric(text: Column) -> Column:
    """Banded unique-word-ratio score; short texts (<=50 words) get 0.8."""
    return band_language_quality(split_words(F.lower(text)))


def structure_quality_metric(text: Column) -> Column:
    """0.2 per structural regex indicator present, capped at 1.0."""
    score = None
    for pat in STRUCTURE_PATTERNS:
        hit = F.when(text.rlike(pat), F.lit(0.2)).otherwise(F.lit(0.0))
        score = hit if score is None else score + hit
    return F.least(score, F.lit(1.0))


def quality_struct(text: Column, page_count: Column) -> Column:
    """struct of the five metrics + weighted overall_score.

    Empty/blank text yields all-zero metrics (reference early return).
    """
    blank = F.length(F.trim(text)) == 0
    tq = F.when(blank, 0.0).otherwise(text_quality_metric(text))
    er = F.when(blank, 0.0).otherwise(extraction_ratio_metric(text, page_count))
    cd = F.when(blank, 0.0).otherwise(content_density_metric(text))
    lq = F.when(blank, 0.0).otherwise(language_quality_metric(text))
    sq = F.when(blank, 0.0).otherwise(structure_quality_metric(text))
    overall = (
        tq * QUALITY_WEIGHTS["text_quality"]
        + er * QUALITY_WEIGHTS["extraction_ratio"]
        + cd * QUALITY_WEIGHTS["content_density"]
        + lq * QUALITY_WEIGHTS["language_quality"]
        + sq * QUALITY_WEIGHTS["structure_quality"]
    )
    return F.struct(
        tq.alias("text_quality"),
        er.alias("extraction_ratio"),
        cd.alias("content_density"),
        lq.alias("language_quality"),
        sq.alias("structure_quality"),
        overall.alias("overall_score"),
    )


def is_valid_text(text: Column) -> Column:
    """Text validity predicate (claude_integration.py:845-877):
    non-blank, <= 500k chars, alnum ratio >= 0.7, unique ratio >= 0.1."""
    return (
        (F.length(F.trim(text)) > 0)
        & (F.length(text) <= MAX_CONTENT_LENGTH)
        & (alnum_ratio(text) >= MIN_CONTENT_QUALITY_RATIO)
        & (unique_word_ratio(text) >= MIN_UNIQUE_WORD_RATIO)
    )
