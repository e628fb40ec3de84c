"""Shared lexicons and token rules.

These constants are the single source of truth for BOTH the Spark
implementation and the DuckDB oracle SQL (rendered via ``sql_list``),
so the two sides cannot drift.

Semantics reproduced (reference file:line, /root/reference):
- keyword token rule + stopword list:
  src/pdf_knowledge_extractor/claude_integration.py:1302-1316
- document-type lexicons: claude_integration.py:894-931
- sentiment lexicons: src/pdf_knowledge_extractor/analyzer.py:183-184
"""

from __future__ import annotations

# Tokens for keyword extraction: alphabetic runs of length >= 4 on the
# lowercased text (reference regex \b[A-Za-z]{4,}\b at
# claude_integration.py:1302). We split on non-alpha, which yields the
# same token set as the \b-anchored findall.
KEYWORD_MIN_LEN = 4
TOKEN_SPLIT_RE = "[^a-z]+"

STOP_WORDS: tuple[str, ...] = (
    "this", "that", "with", "have", "will", "from", "they", "been",
    "were", "said", "each", "which", "their", "time", "would", "there",
    "more", "very", "what", "know", "just", "first", "into", "over",
    "after", "back", "other", "many", "than", "then", "them", "these",
    "some", "could", "make", "like", "only", "also", "when", "here",
    "how", "our", "out", "may", "way", "use", "her", "new", "now",
    "old", "see", "him", "two", "who", "its", "did", "yes", "his",
    "had", "let", "put", "say", "she", "too", "end", "why", "try",
    "god", "six", "dog", "eat", "ago", "sit", "fun", "bad", "yet",
    "arm", "far", "off", "ill", "own", "under", "last",
)

# Document-type keyword lexicons (claude_integration.py:894-931).
DOC_TYPE_LEXICONS: dict[str, tuple[str, ...]] = {
    "academic": (
        "abstract", "methodology", "literature review", "hypothesis",
        "research", "citation", "bibliography", "peer review", "journal",
        "publication", "experiment", "data analysis", "statistical",
        "study", "findings", "conclusion", "university", "professor",
        "phd", "doctoral",
    ),
    "business": (
        "revenue", "profit", "market", "business plan", "strategy", "roi",
        "investment", "financial", "quarterly", "annual report",
        "stakeholder", "executive summary", "kpi", "metrics", "corporate",
        "company", "organization", "management", "board of directors",
        "shareholder",
    ),
    "technical": (
        "algorithm", "implementation", "system", "architecture",
        "framework", "api", "database", "server", "client", "protocol",
        "specification", "technical", "engineering", "software",
        "hardware", "documentation", "manual", "guide", "tutorial",
        "installation", "configuration",
    ),
    "legal": (
        "contract", "agreement", "clause", "provision", "legal", "law",
        "regulation", "compliance", "terms", "conditions", "liability",
        "warranty", "intellectual property", "copyright", "patent",
        "litigation", "court", "judge", "jury", "counsel",
    ),
    "creative": (
        "story", "narrative", "character", "plot", "theme", "creative",
        "artistic", "design", "aesthetic", "poetry", "novel", "fiction",
        "non-fiction", "memoir", "autobiography", "biography", "essay",
    ),
}
# Tie-break order = insertion order above (Python max() keeps the first
# maximal key, matching the reference dict ordering).
DOC_TYPE_ORDER: tuple[str, ...] = tuple(DOC_TYPE_LEXICONS)

POSITIVE_WORDS: tuple[str, ...] = (
    "good", "great", "excellent", "positive", "beneficial", "effective",
)
NEGATIVE_WORDS: tuple[str, ...] = (
    "bad", "poor", "negative", "harmful", "ineffective", "problematic",
)

# Tiny per-language stopword profiles for the n-gram/stopword language
# identification heuristic (training-data-pipeline extension; public
# common-word lists).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "as"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"),
    "es": ("el", "la", "que", "de", "los", "una", "por", "con", "para", "las"),
}


def sql_list(values: tuple[str, ...] | list[str]) -> str:
    """Render a python string list as a SQL IN-list literal."""
    return ", ".join("'" + v.replace("'", "''") + "'" for v in values)
