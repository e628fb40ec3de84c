"""Parity of quality / sentiment / doc-type column expressions vs
independent Python restatements of the reference rules
(claude_integration.py:723-1010, analyzer.py:180-209)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from pdf_knowledge_extractor_spark.functions.doctype import doc_type
from pdf_knowledge_extractor_spark.functions.quality import quality_struct
from pdf_knowledge_extractor_spark.functions.sentiment import sentiment_struct
from tests.golden_reference import golden_doc_type, golden_sentiment

TEXTS = [
    "",
    "   ",
    "short text",
    "This is a good and effective approach. It works great!\n\n"
    "1. First point\n2. Second point",
    "bad poor harmful " * 30,
    "research methodology hypothesis study findings university",
    "revenue profit market strategy investment quarterly",
    "word " * 100,  # highly repetitive, >50 words
    " ".join(f"unique{i}" for i in range(80)),
    "!!!! ???? ####",
    "abc " * 20 + "supercalifragilistic " * 10,
]


def python_quality(text: str, page_count: int) -> dict:
    """Independent restatement of the 5-metric quality model."""
    m = dict.fromkeys(
        ["text_quality", "extraction_ratio", "content_density",
         "language_quality", "structure_quality", "overall_score"], 0.0
    )
    if not text or not text.strip():
        return m
    alnum = sum(1 for c in text if re.match(r"[a-zA-Z0-9]", c))
    ar = alnum / len(text) if text else 0.0
    if 0.6 <= ar <= 0.9:
        m["text_quality"] = 1.0
    elif 0.4 <= ar < 0.6:
        m["text_quality"] = 0.7
    elif 0.2 <= ar < 0.4:
        m["text_quality"] = 0.4
    else:
        m["text_quality"] = 0.1
    expected = page_count * 2500
    if expected > 0:
        r = min(len(text) / expected, 2.0)
        m["extraction_ratio"] = 1.0 if r >= 0.8 else 0.8 if r >= 0.5 else 0.5 if r >= 0.2 else 0.2
    words = text.split()
    if words:
        avg = len("".join(words)) / len(words)
        if 4 <= avg <= 8:
            m["content_density"] = 1.0
        elif 3 <= avg < 4 or 8 < avg <= 12:
            m["content_density"] = 0.7
        else:
            m["content_density"] = 0.3
    if len(words) > 50:
        uniq = len({w.lower() for w in words}) / len(words)
        m["language_quality"] = 1.0 if uniq >= 0.4 else 0.6 if uniq >= 0.2 else 0.3 if uniq >= 0.1 else 0.1
    else:
        m["language_quality"] = 0.8
    score = 0.0
    for pat in [r"\n\n", r"[.!?]\s+[A-Z]", r":\s*\n", r"^\s*\d+\.", r"^\s*[•\-\*]"]:
        if re.search(pat, text):
            score += 0.2
    m["structure_quality"] = min(score, 1.0)
    m["overall_score"] = (
        m["text_quality"] * 0.40 + m["extraction_ratio"] * 0.25
        + m["content_density"] * 0.15 + m["language_quality"] * 0.10
        + m["structure_quality"] * 0.10
    )
    return m


def test_quality_struct_parity(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string"
    )
    pages = (F.floor(F.length("text") / 2500.0) + 1).cast("long")
    rows = df.select("id", quality_struct(F.col("text"), pages).alias("q")).collect()
    for r in rows:
        t = TEXTS[r["id"]]
        expected = python_quality(t, len(t) // 2500 + 1)
        got = r["q"].asDict()
        for k, v in expected.items():
            assert abs(got[k] - v) < 1e-9, (t[:40], k, got[k], v)


def test_sentiment_parity(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string"
    )
    rows = df.select("id", sentiment_struct(F.col("text")).alias("s")).collect()
    for r in rows:
        label, score = golden_sentiment(TEXTS[r["id"]])
        assert r["s"]["sentiment"] == label
        assert abs(r["s"]["score"] - score) < 1e-9


def test_doc_type_parity(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string"
    )
    rows = df.select("id", doc_type(F.col("text")).alias("t")).collect()
    for r in rows:
        assert r["t"] == golden_doc_type(TEXTS[r["id"]]), TEXTS[r["id"]][:40]
