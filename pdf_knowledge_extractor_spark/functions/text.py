"""Text projections as pure Spark column expressions (whole-stage
codegen; no Python in the hot path).

Semantics reproduced (reference file:line under /root/reference/src/
pdf_knowledge_extractor/):
- clean_text: processor.py:19-31 (collapse whitespace, trim)
- clean_text_for_claude: claude_integration.py:696-721 (ws collapse,
  control-char strip, NFKC — NFKC lives in normalize.py as pandas UDF)
- estimate_tokens: claude_integration.py:378-388 (len // 4)
- word/char counts: analyzer.py:30-39
- keyword tokens: claude_integration.py:1302 (\\b[A-Za-z]{4,}\\b)
- chunking: processor.py:33-55
- uri/label encoding: exporters/data_analysis.py:1192-1196
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.lexicons import (
    KEYWORD_MIN_LEN,
    STOP_WORDS,
)


def clean_text(col: Column) -> Column:
    """Collapse whitespace runs to single spaces and trim."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def strip_control_chars(col: Column) -> Column:
    """Drop C0/C1 control characters except \\t \\n \\r."""
    return F.regexp_replace(col, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]", "")


def word_count(col: Column) -> Column:
    """len(text.split()) — whitespace-delimited word count."""
    return F.size(F.split(F.trim(col), r"\s+")) - F.when(
        F.length(F.trim(col)) == 0, F.lit(1)
    ).otherwise(F.lit(0))


def char_count(col: Column) -> Column:
    return F.length(col)


def estimate_tokens(col: Column) -> Column:
    """Token estimate = floor(len(text) / 4)."""
    return (F.length(col) / F.lit(4)).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token count: alpha runs + digit runs + single
    non-alnum-non-space marks (training-data-pipeline extension)."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def keyword_tokens(col: Column, min_len: int = KEYWORD_MIN_LEN) -> Column:
    """Array of lowercase alphabetic tokens of length >= min_len
    (reference regex \\b[A-Za-z]{min_len,}\\b on lowercased text)."""
    pattern = rf"\b[a-z]{{{min_len},}}\b"
    return F.regexp_extract_all(F.lower(col), F.lit(pattern), 0)


def keyword_tokens_nostop(col: Column, min_len: int = KEYWORD_MIN_LEN) -> Column:
    """keyword_tokens minus the reference stopword list (duplicates
    preserved — array_except would dedupe and break term frequencies).

    Single fused regex pass: stopwords of length >= min_len are
    excluded at extraction time via a negative lookahead anchored at
    each token start (shorter stopwords can never match the
    ``[a-z]{min_len,}`` token pattern, so they are omitted from the
    alternation). This replaces the r1-r5 two-pass form
    (extract, then per-token ``array_contains`` over the 83-word
    list — a linear scan per token in the hottest path of the
    engine); measured ~20% faster on the sf0.1 corpus with
    byte-identical arrays (`test_keyword_tokens_nostop_fused_parity`).
    The lookahead is safe for prefixes: at the start of "afterward",
    ``(?:after)\\b`` fails on the following word char, so the token
    survives."""
    stops = sorted(w for w in STOP_WORDS if len(w) >= min_len)
    if not stops:
        return keyword_tokens(col, min_len)
    pattern = rf"\b(?!(?:{'|'.join(stops)})\b)[a-z]{{{min_len},}}\b"
    return F.regexp_extract_all(F.lower(col), F.lit(pattern), 0)


# the 62 ASCII alphanumerics, for translate()-based alnum counting
_ALNUM_CHARS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def alnum_len(col: Column) -> Column:
    """Count of [a-zA-Z0-9] chars via translate (delete the 62 alnum
    chars, subtract the remainder's length) — value-identical to
    ``length(regexp_replace(col, '[^a-zA-Z0-9]', ''))`` but a straight
    char-map instead of a regex replace, measured 27x faster on the
    500k-row corpus (38.9s -> 1.45s for the projection; 0 mismatching
    rows)."""
    return F.length(col) - F.length(F.translate(col, _ALNUM_CHARS, ""))


def alnum_ratio(col: Column) -> Column:
    """alphanumeric chars / total chars (0.0 for empty)."""
    total = F.length(col)
    return F.when(total > 0, alnum_len(col) / total).otherwise(F.lit(0.0))


def unique_word_ratio(col: Column) -> Column:
    """distinct(lower(word)) / words over whitespace tokens; 0 if empty."""
    words = F.split(F.lower(F.trim(col)), r"\s+")
    words = F.filter(words, lambda w: F.length(w) > 0)
    return F.when(
        F.size(words) > 0, F.size(F.array_distinct(words)) / F.size(words)
    ).otherwise(F.lit(0.0))


def uri_encode(col: Column, max_len: int = 100) -> Column:
    """[^\\w\\-.] -> _, collapse runs of _, strip leading/trailing _,
    cap length (reference exporters/data_analysis.py:1192-1196)."""
    enc = F.regexp_replace(col, r"[^\w\-.]", "_")
    enc = F.regexp_replace(enc, "_+", "_")
    enc = F.regexp_replace(enc, "^_|_$", "")
    return F.substring(enc, 1, max_len)


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized lowercase text (training-data dedup key)."""
    return F.md5(F.lower(clean_text(col)))


def sha256(col: Column) -> Column:
    """Per-row content invariant: sha2(content, 256)."""
    return F.sha2(col, 256)


def chunk_text(col: Column, chunk_size: int = 1000, overlap: int = 100) -> Column:
    """Fixed windows of ``chunk_size`` chars stepping by
    ``chunk_size - overlap`` (reference processor.py:33-55 without the
    sentence back-off, which only shifts boundaries). Pure column
    expression: sequence of start offsets -> substring.
    """
    step = chunk_size - overlap
    n = F.greatest(F.length(col), F.lit(1))
    starts = F.sequence(F.lit(0), n - 1, F.lit(step))
    return F.transform(starts, lambda s: F.substring(col, s + 1, chunk_size))


def chunk_text_sentence_aligned(
    col: Column, chunk_size: int = 1000, overlap: int = 100
) -> Column:
    """Exact reference chunking INCLUDING the sentence back-off
    (processor.py:33-55): each window ending mid-text breaks at the
    last '.' when it falls past 80% of the chunk, the chunk is
    stripped, and the next window starts at end - overlap. Boundaries
    are sequentially dependent per document, so this cannot be a fixed
    window expression; it runs as an Arrow-batched pandas UDF
    (ArrowEvalPython — one Python call per batch of docs, never
    row-at-a-time BatchEvalPython). Prefer chunk_text (pure column
    expressions) when fixed boundaries are acceptable."""
    if chunk_size * 0.8 <= overlap:
        raise ValueError("chunk_size * 0.8 must exceed overlap "
                         "(back-off could step backwards)")
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _chunks(texts):
        def split(text):
            if not text:
                return []
            chunks = []
            start = 0
            while start < len(text):
                end = start + chunk_size
                chunk = text[start:end]
                if end < len(text):
                    last_period = chunk.rfind(".")
                    if last_period > chunk_size * 0.8:
                        end = start + last_period + 1
                        chunk = text[start:end]
                chunks.append(chunk.strip())
                start = end - overlap
            return chunks

        return texts.map(split)

    return _chunks(col)
