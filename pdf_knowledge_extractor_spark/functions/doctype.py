"""Document-type detection — pure column expressions.

Semantics reproduced from claude_integration.py:879-946: count how many
lexicon phrases occur as substrings of lower(text) per category;
return the argmax category ("general" when all zero, "unknown" for
empty text); ties break by lexicon declaration order
(academic > business > technical > legal > creative), matching Python
``max`` over an insertion-ordered dict.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.lexicons import DOC_TYPE_LEXICONS, DOC_TYPE_ORDER


def _category_hits(text_lower: Column, phrases: tuple[str, ...]) -> Column:
    # array-filter keeps the expression tree small (a 100-term CASE sum
    # overflows janino's 64KB codegen method limit and falls back to
    # slow interpreted evaluation)
    lex = F.array(*[F.lit(p) for p in phrases])
    return F.size(F.filter(lex, lambda p: F.contains(text_lower, p)))


def doc_type(text: Column) -> Column:
    tl = F.lower(text)
    counts = {
        cat: _category_hits(tl, DOC_TYPE_LEXICONS[cat]) for cat in DOC_TYPE_ORDER
    }
    best = F.greatest(*counts.values())
    # first category (declaration order) achieving the max
    pick = None
    for cat in reversed(DOC_TYPE_ORDER):
        cond = F.when(counts[cat] == best, F.lit(cat))
        pick = cond.otherwise(pick) if pick is not None else cond
    return (
        F.when(F.length(F.coalesce(text, F.lit(""))) == 0, "unknown")
        .when(best == 0, "general")
        .otherwise(pick)
    )
