"""Language identification heuristic — pure column expressions.

Training-data-pipeline extension (not in the reference, which assumes
English): score each candidate language by the fraction of whitespace
tokens that hit its 10-word common-word profile; argmax with
declaration-order tie-break; "und" (undetermined) when no profile hits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.lexicons import LANG_PROFILES


def _profile_hits(words: Column, profile: tuple[str, ...]) -> Column:
    lex = F.array(*[F.lit(w) for w in profile])
    return F.size(F.filter(words, lambda w: F.array_contains(lex, w)))


def detect_language(text: Column) -> Column:
    words = F.split(F.lower(F.trim(text)), r"\s+")
    counts = {lang: _profile_hits(words, prof) for lang, prof in LANG_PROFILES.items()}
    best = F.greatest(*counts.values())
    pick = None
    for lang in reversed(tuple(LANG_PROFILES)):
        cond = F.when(counts[lang] == best, F.lit(lang))
        pick = cond.otherwise(pick) if pick is not None else cond
    return F.when(best == 0, "und").otherwise(pick)
