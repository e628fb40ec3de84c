"""Mention extraction: keywords, phrases, code entities.

The reference extracts three mention streams per document
(semantic_analyzer.py:399-406): NLTK entities (:624-651), TF-IDF
keywords (:653-674), and POS-pattern phrases (:676-701). This engine
re-expresses them Spark-first:

- keyword mentions: pure column expressions (explode of the token
  array; stopword removal by array_except against a literal array).
- phrase mentions: consecutive-bigram composition, pure column
  expressions (importance 0.4 + 0.1 * n_words, mirroring the
  reference's 0.4 + 0.1*len rule at semantic_analyzer.py:699).
- code entity mentions (the graft's per-``lang`` detectors: imports,
  definitions, CamelCase symbols): Arrow-batched pandas UDF with
  vectorized ``Series.str.findall`` — never row-at-a-time Python.

Entity importance mirrors the reference's per-type table
(semantic_analyzer.py:636-645: PERSON .8, ORG .7, GPE .6, MONEY .5,
DATE .4, default .3) re-mapped to code entity types.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_knowledge_extractor_spark.functions.text import (
    keyword_tokens_nostop,
)

# code-entity importance by type (analog of semantic_analyzer.py:636-645)
ENTITY_IMPORTANCE = {
    "module": 0.8,      # imported module / package
    "definition": 0.7,  # def/class/func/type definition
    "symbol": 0.6,      # CamelCase / dotted symbol reference
    "reference": 0.5,   # cross-repo reference
}

MENTION_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("concept_type", T.StringType()),
            T.StructField("importance", T.DoubleType()),
        ]
    )
)

_IMPORT_PATTERNS = {
    # lang -> regex whose group 1 is the imported module
    "python": r"(?:^|\n)\s*(?:from|import)\s+([A-Za-z_][\w.]*)",
    "go": r'(?:^|\n)\s*import\s+(?:\w+\s+)?"([^"]+)"',
    "java": r"(?:^|\n)\s*import\s+(?:static\s+)?([A-Za-z_][\w.]*)",
    "js": r"""(?:from|require\()\s*['"]([^'"]+)['"]""",
}
_DEF_PATTERNS = {
    "python": r"(?:^|\n)\s*(?:def|class)\s+([A-Za-z_]\w*)",
    "go": r"(?:^|\n)\s*(?:func|type)\s+(?:\(\s*\w+\s+\*?\w+\s*\)\s*)?([A-Za-z_]\w*)",
    "java": r"(?:class|interface|enum)\s+([A-Za-z_]\w*)",
    "js": r"(?:function|class)\s+([A-Za-z_]\w*)|const\s+([A-Za-z_]\w*)\s*=",
}
_SYMBOL_PATTERN = r"\b([A-Z][a-z0-9]+(?:[A-Z][a-z0-9]+)+)\b"  # CamelCase


@F.pandas_udf(MENTION_SCHEMA)
def _code_entities(content: pd.Series, lang: pd.Series) -> pd.Series:
    """Vectorized per-lang code entity detection (imports, defs,
    CamelCase symbols)."""
    out = []
    # vectorize by grouping rows per language value within the batch
    frame = pd.DataFrame({"content": content.fillna(""), "lang": lang.fillna("")})
    results = [None] * len(frame)
    for lg, grp in frame.groupby("lang", sort=False):
        imp_pat = _IMPORT_PATTERNS.get(lg)
        def_pat = _DEF_PATTERNS.get(lg)
        imports = (
            grp["content"].str.findall(imp_pat)
            if imp_pat
            else pd.Series([[]] * len(grp), index=grp.index)
        )
        defs = (
            grp["content"].str.findall(def_pat)
            if def_pat
            else pd.Series([[]] * len(grp), index=grp.index)
        )
        symbols = grp["content"].str.findall(_SYMBOL_PATTERN)
        for idx in grp.index:
            ments = []
            for m in imports.at[idx]:
                name = m if isinstance(m, str) else next((g for g in m if g), "")
                if name:
                    ments.append((name, "module", ENTITY_IMPORTANCE["module"]))
            for m in defs.at[idx]:
                name = m if isinstance(m, str) else next((g for g in m if g), "")
                if name:
                    ments.append((name, "definition", ENTITY_IMPORTANCE["definition"]))
            for s in symbols.at[idx]:
                ments.append((s, "symbol", ENTITY_IMPORTANCE["symbol"]))
            results[frame.index.get_loc(idx)] = ments
    out = pd.Series(results)
    return out


def keyword_mentions(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     with_context: bool = False) -> DataFrame:
    """Per-doc keyword mention stream: (doc_id, text, concept_type,
    importance[, context]). importance = 0.5 flat pre-TFIDF (re-scored
    by the concept aggregation / tfidf stage).

    ``with_context`` adds the first sentence containing the mention
    (reference _extract_context, semantic_analyzer.py:703-711) as
    a pure column expression: sentence split + array filter. The split
    regex is ``[.!?]\\s+`` (delimiter consumed, terminal punctuation
    dropped) rather than the lookbehind form — RE2 engines (DuckDB's
    regexp_split_to_array, used by the oracle) cannot express
    lookbehind, and mention tokens never contain punctuation so the
    containment test is unaffected. The sentence split runs in the
    projection BELOW the token explode (once per document), so per
    mention only the array-filter containment test runs — never a
    re-split of the full text per mention row.
    """
    pre_cols = [
        F.col(id_col).alias("doc_id"),
        F.explode(keyword_tokens_nostop(F.col(text_col))).alias("text"),
    ]
    if with_context:
        pre_cols.insert(
            1, F.split(F.col(text_col), r"[.!?]\s+").alias("_sents")
        )
    out = (
        # NOT spread here: tokenization is light enough that a
        # round-robin text shuffle costs more than it parallelizes
        # (measured at sf0.1); heavy projections (shingling, enrich)
        # spread at their own entry points instead
        docs.select(*pre_cols)
        .withColumn("concept_type", F.lit("keyword"))
        .withColumn("importance", F.lit(0.5))
    )
    if with_context:
        # every keyword token comes from the same text the sentences
        # partition and contains no punctuation/whitespace, so the
        # filter is never empty (element_at(…, 1) is ANSI-safe here)
        ctx = F.element_at(
            F.filter(
                F.col("_sents"),
                lambda s: F.contains(F.lower(s), F.col("text")),
            ),
            1,
        )
        out = out.withColumn("context", ctx).drop("_sents")
    return out


def _context_expr(sents_col: str, mention_col: str):
    """First sentence whose lowercase form contains the (lowercased)
    mention text — _extract_context, semantic_analyzer.py:703-711.
    try_element_at: legitimately null when the mention never appears
    contiguously in the raw text (e.g. a bigram whose tokens were
    adjacent only after stopword removal) — the reference stores no
    context in that case either (`if context:` guard,
    semantic_analyzer.py:427-428)."""
    return F.try_element_at(
        F.filter(
            F.col(sents_col),
            lambda s: F.contains(F.lower(s), F.lower(F.col(mention_col))),
        ),
        F.lit(1),
    )


def phrase_mentions(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    with_context: bool = False) -> DataFrame:
    """Consecutive-token bigram phrases; importance = 0.4 + 0.1*2.
    ``with_context`` attaches the first containing sentence (the
    reference extracts context for EVERY concept type,
    semantic_analyzer.py:426); null when the bigram is not contiguous
    in the raw text. The sentence split runs once per doc below the
    explode, like keyword_mentions."""
    toks = keyword_tokens_nostop(F.col(text_col))
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    pre_cols = [
        F.col(id_col).alias("doc_id"),
        F.explode(pairs).alias("text"),
    ]
    if with_context:
        pre_cols.insert(
            1, F.split(F.col(text_col), r"[.!?]\s+").alias("_sents")
        )
    out = (
        docs.select(*pre_cols)
        .withColumn("concept_type", F.lit("phrase"))
        .withColumn("importance", F.lit(0.4 + 0.1 * 2))
    )
    if with_context:
        out = out.withColumn(
            "context", _context_expr("_sents", "text")
        ).drop("_sents")
    return out


def entity_mentions(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "content",
                    lang_col: str = "lang",
                    with_context: bool = False) -> DataFrame:
    """Code entity mention stream via the Arrow-batched detector.
    ``with_context`` attaches the first sentence containing the entity
    (case-insensitive, matching _extract_context) — computed as a
    column expression AFTER the UDF explode, so the Python side stays
    detection-only."""
    pre_cols = [
        F.col(id_col).alias("doc_id"),
        F.explode(_code_entities(F.col(text_col), F.col(lang_col))).alias("m"),
    ]
    if with_context:
        pre_cols.insert(
            1, F.split(F.col(text_col), r"[.!?]\s+").alias("_sents")
        )
    out = docs.select(*pre_cols).select(
        "doc_id", "m.text", "m.concept_type", "m.importance",
        *(["_sents"] if with_context else []),
    )
    if with_context:
        out = out.withColumn(
            "context", _context_expr("_sents", "text")
        ).drop("_sents")
    return out


def all_mentions(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 lang_col: str | None = None,
                 with_context: bool = False) -> DataFrame:
    """Union of the mention streams (semantic_analyzer.py:399-406).

    ``with_context`` carries a context sentence on EVERY stream —
    keywords, phrases, and code entities — matching the reference,
    which calls _extract_context for every concept type
    (semantic_analyzer.py:426); individual mentions whose text never
    appears contiguously in a sentence carry null, like the
    reference's `if context:` guard storing nothing."""
    parts = [
        keyword_mentions(docs, id_col, text_col, with_context=with_context),
        phrase_mentions(docs, id_col, text_col, with_context=with_context),
    ]
    if lang_col is not None and lang_col in docs.columns:
        parts.append(
            entity_mentions(
                docs, id_col, text_col, lang_col, with_context=with_context
            )
        )
    if with_context:
        parts = [
            p if "context" in p.columns
            else p.withColumn("context", F.lit(None).cast("string"))
            for p in parts
        ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
