"""Deterministic synthetic source-code corpus generator.

Produces the BASELINE.json ``input_hint`` table
``(repo, path, commit, lang, content)`` at any row count, fully
Spark-native (spark.range + column expressions — no driver-side data,
no Python in the generation path) and deterministic in the row id
(xxhash64-derived pseudo-randomness; same N -> byte-identical corpus).

Embedded structure (FIXTURES.md §1) so expected triples are computable
in closed form:
- one HOT symbol (``CommonUtil``) imported by ~30% of rows — the skew
  test for the salted concept aggregation;
- near-duplicate pairs: rows where id % 23 == 1 share their body with
  id-1 (only the def name differs) — the similarity-join test;
- alias variants of the same entity (``DataLoader`` / ``Data_Loader``
  / ``data_loader``) — the canonicalization test;
- a few empty and punctuation-only rows (id % 199 ∈ {7, 8}) — the
  quality-filter test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ("python", "java", "go", "js", "md")
EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "md": "md"}

# vocabulary for body text: 25 x 20 = 500 composed source-code-flavored
# words, large enough that two random 40-word bodies share few tokens
# (cosine ~0.1) while intentional near-dup rows stay at ~1.0
_PREFIXES = (
    "buffer", "cache", "client", "column", "config", "cursor", "decode",
    "encode", "engine", "export", "filter", "format", "handle", "index",
    "logger", "memory", "merge", "module", "object", "offset",
    "parse", "partition", "query", "record", "reduce",
)
_SUFFIXES = (
    "pool", "node", "task", "slot", "unit", "page", "span", "lane",
    "tier", "zone", "rank", "seed", "path", "sink", "gate", "fork",
    "ring", "heap", "disk", "wire",
)
_VARIANTS = ("alpha", "beta", "gamma", "delta", "omega", "kappa", "sigma", "theta")
BODY_VOCAB = tuple(
    f"{p}{s}{v}" for p in _PREFIXES for s in _SUFFIXES for v in _VARIANTS
)

# module pool for import statements; index 0 is the HOT module
MODULES = (
    "commonutil", "jsonlib", "httpcore", "mathkit", "datautil",
    "logkit", "netio", "parsekit", "cryptolib", "sqlkit",
    "figlib", "asyncpool", "memcache", "regexkit", "yamlio",
)

ALIAS_SYMBOLS = ("DataLoader", "Data_Loader", "dataLoader")

HOT_SYMBOL = "CommonUtil"
HOT_FRACTION_MOD = 10  # ids with hash%10 < 3 => ~30% hot rows


def heaps_vocab(n_rows: int, k: float = 30.0, beta: float = 0.5) -> int:
    """Heaps'-law vocabulary size V = k·N^β for a corpus of ``n_rows``
    documents (k=30, β=0.5 are mid-range published constants for
    English/code corpora). Pass as ``generate_corpus(..., n_vocab=...)``
    so scaling experiments grow vocabulary with N the way real corpora
    do, instead of densifying a fixed vocabulary."""
    return max(len(BODY_VOCAB), int(k * n_rows ** beta))


def generate_corpus(
    spark: SparkSession,
    n_rows: int = 10_000,
    n_repos: int = 20,
    body_words: int = 40,
    partitions: int | None = None,
    boilerplate_fraction: float = 0.0,
    boilerplate_families: int = 4,
    boilerplate_mutation_permille: int = 30,
    n_vocab: int | None = None,
) -> DataFrame:
    """-> DataFrame(repo, path, commit, lang, content, doc_id).

    ``boilerplate_fraction`` > 0 injects MUTATED-BOILERPLATE families
    (the round-4 bucket-cap recall corpus): that fraction of rows is
    assigned to one of ``boilerplate_families`` clone groups; each
    member's body is the family's base body with each word position
    independently mutated to a member-specific word with probability
    ``boilerplate_mutation_permille``/1000. At the default 3% mutation
    the members of one family are pairwise near-duplicates (term-set
    Jaccard ≈ 0.85, tf-idf cosine ≈ 0.8) whose TEXTS ALL DIFFER — so
    exact-fingerprint dedup recovers none of them, and any
    band-bucket cap that silently drops hot buckets loses true
    `similar_to` pairs. A `bp_family` column (family id, -1 for
    non-members) is added in this mode only, so experiments can
    compute family-level ground truth; the default mode's schema and
    bytes are unchanged.

    ``n_vocab`` overrides the body-vocabulary size (default: the
    4,000-word composed BODY_VOCAB, byte-identical to every previous
    round). Real corpora grow vocabulary with size (Heaps' law,
    V ≈ k·N^β with β ≈ 0.5); a FIXED vocabulary instead densifies as N
    grows — every term's df rises ∝ N, band-bucket occupancy rises ∝ N
    and candidate pairs ∝ N², which is a property of the synthetic
    corpus, not of any engine. Scaling runs that want corpus-realistic
    behavior should pass e.g. ``n_vocab=int(30 * sqrt(n_rows))``
    (heaps_vocab helper below). Sizes beyond the composed list are
    synthesized as pure-alphabetic ``tok`` + base-26(idx) words (>= 4
    letters, so they survive the ``[a-z]{4,}`` keyword tokenizer and
    genuinely grow the effective vocabulary); the Zipf shape is
    preserved over the full range, and the default size keeps the
    byte-identical legacy corpus."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 4)
    df = spark.range(0, n_rows, 1, partitions)
    rid = F.col("id")

    def h(salt: int):
        """Deterministic 64-bit hash stream per row and salt."""
        return F.abs(F.xxhash64(rid, F.lit(salt)))

    repo_i = h(1) % n_repos
    repo = F.concat(F.lit("org"), (repo_i % 5).cast("string"),
                    F.lit("/proj"), repo_i.cast("string"))
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (h(2) % len(LANGS) + 1).cast("int")
    )
    ext = F.element_at(
        F.array(*[F.lit(EXT[x]) for x in LANGS]),
        (h(2) % len(LANGS) + 1).cast("int"),
    )
    path = F.concat(
        F.lit("src/mod"), (h(3) % 50).cast("string"),
        F.lit("/file"), rid.cast("string"), F.lit("."), ext,
    )
    commit = F.sha2(F.concat(repo, F.lit("@"), path), 256).substr(1, 40)

    # --- content assembly -------------------------------------------------
    vocab = F.array(*[F.lit(w) for w in BODY_VOCAB])
    base_vocab = len(BODY_VOCAB)
    V = n_vocab if n_vocab is not None else base_vocab
    # body from the PREVIOUS id for near-dup rows (id % 23 == 1 copies id-1)
    body_seed = F.when(rid % 23 == 1, rid - 1).otherwise(rid)

    def zipf_word(seed_col, j, salt=100):
        """Zipf(s=1) word pick: index = floor(V^u) for u ~ U[0,1)
        (log-uniform => P(idx=k) ∝ 1/k). Gives the corpus a realistic
        Zipfian term distribution: a few hot terms (skew/salting
        tests), a long rare tail (prefix-filter selectivity)."""
        u = (F.abs(F.xxhash64(seed_col, F.lit(salt), j)) % 1_000_000) / 1_000_000.0
        idx = F.least(
            F.floor(F.pow(F.lit(float(V)), u)).cast("int"),
            F.lit(V - 1),
        )
        word = F.element_at(vocab, F.least(idx, F.lit(base_vocab - 1)) + 1)
        if V <= base_vocab:
            return word
        # Heaps-scaled tail beyond the composed list: synthesized words
        # MUST survive the keyword tokenizer (lexicons.TOKEN_SPLIT_RE
        # splits on [^a-z]+ and keyword_tokens keeps [a-z]{4,} only,
        # mirroring the reference's claude_integration.py:1302 rule),
        # so they are pure-alphabetic: "tok" + base-26 letters of idx
        # (conv emits 0-9a-p for base 26; translate maps those digits
        # onto a-z). A digit-embedded form like "tok123" tokenizes to
        # the 3-letter fragment "tok" and is dropped — the r5 inert-
        # vocab-knob defect (ADVICE r5 #1): n_vocab then never grew
        # the effective vocabulary, it only shortened documents.
        tail = F.concat(
            F.lit("tok"),
            F.translate(
                F.lower(F.conv(idx.cast("string"), 10, 26)),
                "0123456789abcdefghijklmnop",
                "abcdefghijklmnopqrstuvwxyz",
            ),
        )
        return F.when(idx < base_vocab, word).otherwise(tail)

    pick_body_word = lambda j: zipf_word(body_seed, j)  # noqa: E731
    bp_family = F.lit(-1).cast("long")
    if boilerplate_fraction > 0:
        is_bp = (h(8) % 1000) < int(round(boilerplate_fraction * 1000))
        fam = (h(9) % boilerplate_families) + F.lit(10_000_000)
        bp_family = F.when(is_bp, fam - 10_000_000).otherwise(F.lit(-1))

        def pick_body_word(j):  # noqa: F811
            mut = (
                F.abs(F.xxhash64(rid, F.lit(300), j)) % 1000
            ) < boilerplate_mutation_permille
            member_word = F.when(
                mut, zipf_word(rid, j, salt=400)
            ).otherwise(zipf_word(fam, j, salt=150))
            return F.when(is_bp, member_word).otherwise(
                zipf_word(body_seed, j)
            )

    body = F.concat_ws(
        " ",
        F.transform(F.sequence(F.lit(1), F.lit(body_words)), pick_body_word),
    )

    hot = (h(4) % HOT_FRACTION_MOD) < 3
    mod_pick = F.element_at(
        F.array(*[F.lit(m) for m in MODULES]),
        (h(5) % (len(MODULES) - 1) + 2).cast("int"),  # skip index 1 (hot)
    )
    import_line = F.concat(
        F.lit("import "),
        F.when(hot, F.lit(MODULES[0])).otherwise(mod_pick),
    )
    hot_ref = F.when(hot, F.lit(" " + HOT_SYMBOL + ".setup()")).otherwise(
        F.lit("")
    )
    alias_sym = F.element_at(
        F.array(*[F.lit(s) for s in ALIAS_SYMBOLS]),
        (h(6) % len(ALIAS_SYMBOLS) + 1).cast("int"),
    )
    alias_line = F.when(
        h(7) % 4 == 0, F.concat(F.lit("\nclass "), alias_sym, F.lit(":"))
    ).otherwise(F.lit(""))
    def_line = F.concat(
        F.lit("\ndef fn_"), rid.cast("string"), F.lit("(arg): return arg")
    )

    content = F.concat(
        import_line, hot_ref, alias_line, def_line, F.lit("\n"), body, F.lit("\n")
    )
    # quality-filter rows: empty / punctuation-only
    content = (
        F.when(rid % 199 == 7, F.lit(""))
        .when(rid % 199 == 8, F.lit("!!! ??? ### $$$ %%% ^^^ &&& *** ((("))
        .otherwise(content)
    )

    cols = [
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    ]
    if boilerplate_fraction > 0:
        cols.append(bp_family.alias("bp_family"))
    return df.select(*cols).withColumn(
        "doc_id",
        F.concat(F.col("repo"), F.lit("/"), F.col("path"), F.lit("@"),
                 F.col("commit").substr(1, 8)),
    )
