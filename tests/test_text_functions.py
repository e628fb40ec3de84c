"""Unit parity for the scalar text functions vs independent Python
restatements (reference semantics per SURVEY.md §2.2)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest

from pdf_knowledge_extractor_spark.functions.text import (
    bpe_ish_token_count,
    char_count,
    chunk_text,
    estimate_tokens,
    fingerprint,
    keyword_tokens_nostop,
    uri_encode,
    word_count,
)
from pdf_knowledge_extractor_spark.lexicons import STOP_WORDS

TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "",
    "   ",
    "one",
    "hello, world! 123 foo_bar baz-qux",
    "AAAA bbbb AAAA bbbb cccc",
    "Special chars: \t\n\r £$%^&*()",
    "this that with have will from they been",  # all stopwords
    "x" * 5000,
]


def _df(spark, texts=TEXTS):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")


def test_word_and_char_counts(spark):
    rows = (
        _df(spark)
        .select(
            "id",
            word_count(F.col("text")).alias("wc"),
            char_count(F.col("text")).alias("cc"),
        )
        .collect()
    )
    for r in rows:
        t = TEXTS[r["id"]]
        assert r["wc"] == len(t.split()), t
        assert r["cc"] == len(t)


def test_estimate_and_bpe_tokens(spark):
    rows = (
        _df(spark)
        .select(
            "id",
            estimate_tokens(F.col("text")).alias("est"),
            bpe_ish_token_count(F.col("text")).alias("bpe"),
        )
        .collect()
    )
    bpe_re = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    for r in rows:
        t = TEXTS[r["id"]]
        assert r["est"] == len(t) // 4
        assert r["bpe"] == len(bpe_re.findall(t))


def test_keyword_tokens_match_reference_rule(spark):
    rows = (
        _df(spark)
        .select("id", keyword_tokens_nostop(F.col("text")).alias("toks"))
        .collect()
    )
    kw_re = re.compile(r"\b[a-z]{4,}\b")
    for r in rows:
        t = TEXTS[r["id"]]
        expected = [w for w in kw_re.findall(t.lower()) if w not in STOP_WORDS]
        assert r["toks"] == expected, t


def test_keyword_tokens_nostop_fused_parity(spark):
    """The r6 fused single-regex form (negative lookahead at token
    start) must emit byte-identical arrays to the r1-r5 two-pass form
    (extract then array_contains filter) — including on stopword
    PREFIX words (afterward/overly/backbone must survive; the
    lookahead's \\b fails on the following word char) and stopwords
    split by punctuation boundaries (after-ward drops 'after', keeps
    'ward')."""
    cases = [
        "afterward overly backbone thereafter willow themselves",
        "after-ward some.body could've these, words",
        "AFTER After aFtEr shouting CASE words",
        "after", "ward after", "",
        "duplicate duplicate after after duplicate",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "id long, text string"
    )
    stop = F.array(*[F.lit(w) for w in STOP_WORDS])
    twopass = F.filter(
        F.regexp_extract_all(F.lower(F.col("text")),
                             F.lit(r"\b[a-z]{4,}\b"), 0),
        lambda w: ~F.array_contains(stop, w),
    )
    rows = df.select(
        "id",
        keyword_tokens_nostop(F.col("text")).alias("fused"),
        twopass.alias("twopass"),
    ).collect()
    for r in rows:
        assert r["fused"] == r["twopass"], cases[r["id"]]
    by_id = {r["id"]: r["fused"] for r in rows}
    assert by_id[0] == ["afterward", "overly", "backbone",
                       "thereafter", "willow", "themselves"]
    assert "after" not in by_id[1] and "ward" in by_id[1]
    assert by_id[5] == []
    # stopword list must stay regex-literal-safe for the alternation
    assert all(w.isalpha() and w == w.lower() for w in STOP_WORDS)


def test_uri_encode(spark):
    rows = (
        spark.createDataFrame(
            [(0, "Hello World!"), (1, "a@@b##c"), (2, "_lead_trail_"), (3, "x" * 300)],
            "id long, s string",
        )
        .select("id", uri_encode(F.col("s")).alias("enc"))
        .collect()
    )
    vals = {r["id"]: r["enc"] for r in rows}
    assert vals[0] == "Hello_World"
    assert vals[1] == "a_b_c"
    assert vals[2] == "lead_trail"
    assert len(vals[3]) == 100


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(0, "Hello   world"), (1, "hello world"), (2, " HELLO\tWORLD ")],
        "id long, s string",
    ).select(fingerprint(F.col("s")).alias("fp"))
    fps = [r["fp"] for r in df.collect()]
    assert fps[0] == fps[1] == fps[2]


def test_chunking_windows(spark):
    text = "a" * 2500
    rows = (
        spark.createDataFrame([(text,)], "text string")
        .select(F.explode(chunk_text(F.col("text"), 1000, 100)).alias("c"))
        .collect()
    )
    chunks = [r["c"] for r in rows]
    # starts at 0, 900, 1800, 2400-> len 2500: offsets 0,900,1800 cover
    assert chunks[0] == "a" * 1000
    assert all(len(c) <= 1000 for c in chunks)
    # overlap: consecutive chunks share 100 chars of position space
    assert len(chunks) == (2500 - 1) // 900 + 1


def test_nfkc_clean(spark):
    from pdf_knowledge_extractor_spark.functions.normalize import clean_for_llm

    df = spark.createDataFrame(
        [
            (0, "ﬁle  ｆｕｌｌwidth"),            # ligature + fullwidth
            (1, "a\x00b\x07c"),                  # control chars
            (2, "abcdefghij" * 5),               # 5 repeats of 10 chars -> 2
            (3, None),
        ],
        "id long, s string",
    )
    rows = {r["id"]: r["c"] for r in df.select(
        "id", clean_for_llm(F.col("s")).alias("c")).collect()}
    assert rows[0] == "file fullwidth"
    assert rows[1] == "abc"
    assert rows[2] == "abcdefghij" * 2
    assert rows[3] is None


def test_chunk_sentence_backoff(spark):
    """Reference parity for split_into_chunks (processor.py:33-55):
    break at the last '.' past 80% of the window, strip, step by
    end - overlap."""
    from pdf_knowledge_extractor_spark.functions.text import (
        chunk_text,
        chunk_text_sentence_aligned,
    )

    # '.' at position 17 of a 20-char window (> 0.8*20=16) -> back-off
    text = "aaaa bbbb cccc dd. eeee ffff gggg hhhh iiii."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = df.select(
        chunk_text_sentence_aligned(F.col("text"), 20, 5).alias("c")
    ).first()["c"]

    def golden(t, size, ov):
        if not t:
            return []
        out, start = [], 0
        while start < len(t):
            end = start + size
            chunk = t[start:end]
            if end < len(t):
                lp = chunk.rfind(".")
                if lp > size * 0.8:
                    end = start + lp + 1
                    chunk = t[start:end]
            out.append(chunk.strip())
            start = end - ov
        return out

    assert rows == golden(text, 20, 5)
    assert any(c.endswith(".") for c in rows[:-1])  # back-off fired

    # no '.' in range -> degenerates to the fixed-window chunker
    plain = "x" * 95
    df2 = spark.createDataFrame([(1, plain)], "doc_id long, text string")
    aligned = df2.select(
        chunk_text_sentence_aligned(F.col("text"), 30, 10).alias("c")
    ).first()["c"]
    fixed = df2.select(chunk_text(F.col("text"), 30, 10).alias("c")).first()["c"]
    assert aligned == fixed

    import pytest

    with pytest.raises(ValueError):
        chunk_text_sentence_aligned(F.col("text"), 100, 90)
