"""Document-similarity θ self-join (J1): exact + LSH-blocked paths.

Semantics reproduced from _compute_document_similarities
(semantic_analyzer.py:255-389): all-pairs cosine over L2-normalized
TF-IDF, keep pairs with score >= threshold (default 0.7,
semantic_analyzer.py:99), emit (doc1, doc2) once with doc1 < doc2;
``shared_concepts`` ships empty (reference leaves it deferred,
semantic_analyzer.py:353-354).

Scale design:
- exact path: long-form self-join on term — sum(w_a * w_b) per pair.
  The join shuffles on hash(term); a per-term posting-list cap (df
  stop-listing) bounds the quadratic blowup of ultra-frequent terms
  exactly like the reference's stopword drop bounds its vectorizer.
  Right at small scale and for oracle checking; O(sum df^2) at 100 TB.
- scale path: BucketedRandomProjectionLSH over the hashed TF-IDF
  vectors. For unit vectors, cosine >= t  <=>  euclidean distance
  <= sqrt(2 - 2t), so the LSH approxSimilarityJoin with that radius
  blocks candidates; we then re-score candidates with the exact dot
  product (cheap: candidate set is near-linear) so emitted scores are
  exact, only recall is approximate (tunable via numHashTables).
"""

from __future__ import annotations

import logging
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.tuning import hinted

DEFAULT_THRESHOLD = 0.7

_LOG = logging.getLogger(__name__)


def exact_cosine_pairs(
    tfidf: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    max_df: int | None = None,
    round_dp: int | None = None,
) -> DataFrame:
    """(doc_id, term, weight[, df]) L2-normalized -> pairs
    (doc1_id, doc2_id, similarity_score) with doc1 < doc2 and score >=
    threshold. ``max_df`` stop-lists terms occurring in more docs
    (bounds the term self-join at scale). ``round_dp`` applies the
    threshold to round(score, dp) instead of the raw double, so
    last-ulp summation-order noise cannot flip borderline pairs (the
    oracle-parity convention)."""
    t = tfidf
    if max_df is not None and "df" in t.columns:
        t = t.filter(F.col("df") <= max_df)
    a = t.select(
        F.col("doc_id").alias("doc1_id"),
        F.col("term"),
        F.col("weight").alias("w1"),
    )
    b = t.select(
        F.col("doc_id").alias("doc2_id"),
        F.col("term"),
        F.col("weight").alias("w2"),
    )
    score = F.col("similarity_score")
    if round_dp is not None:
        score = F.round(score, round_dp)
    return (
        a.join(b, "term")
        .filter(F.col("doc1_id") < F.col("doc2_id"))
        .groupBy("doc1_id", "doc2_id")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("similarity_score"))
        .filter(score >= threshold)
    )


def lsh_cosine_pairs(
    vectors: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    num_hash_tables: int = 4,
    bucket_length: float = 0.5,
    seed: int = 42,
    tfidf: DataFrame | None = None,
) -> DataFrame:
    """Scale path: LSH candidate blocking + exact rescoring.

    ``vectors``: (doc_id, features: Vector), rows assumed
    L2-normalized (hashed term space — collisions OK, they only
    inflate the candidate set). Returns
    (doc1_id, doc2_id, similarity_score).

    When ``tfidf`` (the long-form L2-normalized table) is given,
    candidate pairs are re-scored EXACTLY by the term-join dot product,
    so emitted scores are collision-free and identical to the exact
    path — only recall is approximate (validated >= 0.95 by tests at
    the default parameters). Without it, scores derive from the hashed
    vectors via cos = 1 - dist^2/2.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    radius = math.sqrt(max(2.0 - 2.0 * threshold, 1e-12))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        bucketLength=bucket_length,
        seed=seed,
    )
    model = lsh.fit(vectors)
    # slack on the radius when rescoring: hash collisions can only
    # *raise* hashed-vector similarity, never lower it, so the exact
    # radius already over-collects; no extra slack needed for recall.
    pairs = model.approxSimilarityJoin(
        vectors, vectors, radius, distCol="_dist"
    )
    cand = pairs.filter(
        F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
    ).select(
        F.col("datasetA.doc_id").alias("doc1_id"),
        F.col("datasetB.doc_id").alias("doc2_id"),
        (1.0 - F.col("_dist") * F.col("_dist") / 2.0).alias("_approx"),
    )
    if tfidf is None:
        return cand.filter(F.col("_approx") >= threshold).select(
            "doc1_id", "doc2_id", F.col("_approx").alias("similarity_score")
        )
    return _rescore_candidates(
        cand.select("doc1_id", "doc2_id"), tfidf, threshold
    )


def _doc_vectors(tfidf: DataFrame) -> DataFrame:
    """(doc_id, m: map<bigint,weight>) — compact per-doc vector for
    map-side rescoring.

    Term keys are xxhash64(term), not the term string: the pair ×
    vector intermediate is the single largest stream in the banded
    pipeline (14 GB at 1.2M rows — the one stage the 1→4 octave shows
    not scaling), and 8-byte keys both shrink it ~35% and turn every
    dot-product probe into a long compare. Dot products are
    bit-identical to the string-keyed form: weights are untouched and
    a within-corpus 64-bit collision (which could only ADD a spurious
    product term) has probability ~V²/2⁶⁵ < 1e-10 at V = 33k terms."""
    return tfidf.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(F.xxhash64("term").alias("key"),
                         F.col("weight").alias("value"))
            )
        ).alias("m")
    )


def _dedup_pairs(pairs: DataFrame) -> DataFrame:
    """Global (doc1_id, doc2_id) dedup in ONE shuffle of the raw
    candidate stream instead of two.

    ``distinct()`` exchanges the full pre-dedup pair stream on
    (doc1_id, doc2_id), then the rescore join immediately re-exchanges
    the deduped pairs on doc1_id — and sort-merge-joins SORT them, the
    disk-spill hot spot the 1.2M-row octave profile pinned (the pair
    stream is the largest shuffle in the whole pipeline; sorting it
    spilled 15-17 GB against one shared disk and broke scaling).
    Hash-partitioning on doc1_id alone already co-locates every copy
    of a pair (a subset of the grouping keys satisfies the aggregate's
    clustering requirement), and it is exactly the distribution the
    downstream vector join on doc1_id needs — so the deduped pairs
    flow into the rescore with no further exchange."""
    return pairs.repartition(F.col("doc1_id")).dropDuplicates(
        ["doc1_id", "doc2_id"]
    )


def _rescore_candidates(
    candidates: DataFrame,
    tfidf: DataFrame,
    threshold: float,
    keep_cols: tuple[str, ...] = (),
    vec_join: str | None = "default",
    vec: DataFrame | None = None,
) -> DataFrame:
    """Exact dot product for candidate pairs via map-side lookups:
    join the two compact doc vectors onto each candidate row, then
    aggregate over the smaller map's entries —
    O(candidates * avg_terms) with no exploded shuffle, versus the
    naive candidate x term join that materializes |cand| * |terms|
    rows. ``keep_cols`` are passed through (used by the hot-bucket
    density probe to keep the bucket key on sampled pairs).

    ``vec_join`` picks the physical join of candidates x vectors:
    the default ``shuffle_hash`` builds a per-partition hash map of
    the doc vectors and STREAMS the (much larger) candidate side —
    a sort-merge join would sort the candidate stream twice (once
    per vector side, the second time carrying the first map column
    as payload), which is pure disk spill at scale. The build side
    is |docs|/P maps; size ``spark.sql.shuffle.partitions`` to the
    corpus (the documented knob) to keep it tens of MB. Pass
    ``broadcast`` when the vector table is known-tiny (the density
    probe's sampled docs) or ``None`` to let Catalyst choose;
    ``"default"`` resolves through tuning.join_hint_name(), so
    PKE_JOIN_HINT=none reverts this join to Catalyst/AQE too
    (ADVICE r5 #4 — the SHJ build side must fit executor memory and
    cannot spill; see tuning.py for the sizing rule)."""
    from pdf_knowledge_extractor_spark.tuning import join_hint_name

    if vec_join == "default":
        vec_join = join_hint_name()
    if vec is None:
        vec = _doc_vectors(tfidf)
    # ``vec``: callers that rescore repeatedly over the same doc set
    # (the stop-list and hot-bucket probes) pass a PERSISTED
    # _doc_vectors table here — the v1/v2 sides below are two separate
    # broadcast/build subtrees, and without the cache each one re-ran
    # the full tfidf scan + map-assembly object agg (the probe paid
    # three 18M-row passes at 500k docs for a 117k-pair sample).
    v1 = vec.select(F.col("doc_id").alias("doc1_id"), F.col("m").alias("m1"))
    v2 = vec.select(F.col("doc_id").alias("doc2_id"), F.col("m").alias("m2"))
    if vec_join == "broadcast":
        v1, v2 = F.broadcast(v1), F.broadcast(v2)
    elif vec_join:
        v1, v2 = v1.hint(vec_join), v2.hint(vec_join)
    def _dot(entries: str, probe: str):
        return F.aggregate(
            F.map_entries(entries),
            F.lit(0.0),
            lambda acc, e: acc
            + F.coalesce(F.element_at(F.col(probe), e["key"]), F.lit(0.0))
            * e["value"],
        )

    # Iterate the SMALLER map, probe the larger: the dot product is
    # symmetric, and on length-skewed corpora (a 10k-term doc paired
    # with a 10-term doc) iterating the short side is orders of
    # magnitude less work per pair. Summation order differs between
    # the two branches only in float last-ulps, which the pipeline's
    # round-before-threshold/round-before-hash convention absorbs
    # (the DuckDB oracle's own sum order already differs).
    dot = F.when(F.size("m1") <= F.size("m2"), _dot("m1", "m2")).otherwise(
        _dot("m2", "m1")
    )
    return (
        candidates.join(v1, "doc1_id")
        .join(v2, "doc2_id")
        .withColumn("similarity_score", dot)
        .filter(F.col("similarity_score") >= threshold)
        .select("doc1_id", "doc2_id", "similarity_score", *keep_cols)
    )


def prefix_cosine_pairs(
    tfidf: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    eps: float = 1e-9,
) -> DataFrame:
    """Exact threshold cosine self-join via prefix filtering
    (all-pairs similarity search, Bayardo/Ma/Srikant, WWW'07 — public
    algorithm). The default scale path: exact results, no LSH recall
    loss, and the candidate join touches only *prefix* posting lists.

    Terms are canonically ordered rare-first (df asc). For an
    L2-normalized doc, once the cumulative squared weight of its
    rarest terms reaches 1 - t², the remaining (common) terms alone
    cannot push any pair's dot product to t — so only the rare-term
    prefix participates in the candidate join; candidates that share a
    term in BOTH prefixes are re-scored exactly over the full term
    lists. Cost drops from Σ df² to Σ prefix_df², which removes the
    hot common terms from the quadratic join at 100 TB scale.

    Requires ``df`` column (kept by tfidf_longform) and normalized
    weights.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("term"))
    with_cum = tfidf.withColumn(
        "_cum_before",
        F.coalesce(
            F.sum(F.col("weight") * F.col("weight")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0.0),
        ),
    )
    # row is in the prefix while the mass at-or-after it can still
    # reach the threshold: 1 - cum_before >= t^2
    prefix = with_cum.filter(
        (1.0 - F.col("_cum_before")) >= (threshold * threshold - eps)
    ).select("doc_id", "term")

    pa = prefix.select(F.col("doc_id").alias("doc1_id"), "term")
    pb = prefix.select(F.col("doc_id").alias("doc2_id"), "term")
    candidates = (
        pa.join(pb.transform(hinted), "term")
        .filter(F.col("doc1_id") < F.col("doc2_id"))
        .select("doc1_id", "doc2_id")
    )
    return _rescore_candidates(_dedup_pairs(candidates), tfidf, threshold)


# bound on the head-term list shipped through the driver by the AUTO
# signature stop-list: #terms with df > frac·N is at most
# avg_doc_len / frac (Σ df = N·L), i.e. ~32k at L=160, frac=0.005 —
# comfortably local; a corpus that overflows this bound skips the
# stop-list entirely (recall-safe: identical output, just slower)
_HEAD_TERMS_LOCAL_MAX = 100_000

# df floor for the AUTO stop-list's head census (shared with
# head_term_census_agg so a caller-folded census uses the same floor)
SIGNATURE_HEAD_DF_FLOOR = 256


def collect_signature_head_census(
    tfidf: DataFrame,
    df_floor: int = SIGNATURE_HEAD_DF_FLOOR,
    sample_docs: int = 16,
) -> list:
    """ONE job over the tfidf long form returning the AUTO stop-list's
    head-term census (term, df) AND each head's deterministic posting
    sample — everything `_auto_signature_stoplist` needs before its
    probe, so the operator pays no further full-corpus scans for
    sampling. The sample selection replicates the r6 window form
    exactly (same hash pre-filter, same (xxhash64(term, doc_id),
    doc_id) order), so probe decisions are byte-identical.

    Callers that must materialize the tfidf cache anyway (the
    pipeline) use THIS action as the materialization job and pass the
    rows to ``minhash_blocked_cosine_pairs(signature_heads=...)`` —
    zero extra stop-list jobs on that path (VERDICT r6 item 1); the
    operator runs it internally otherwise. Driver memory stays
    bounded: <= sample_docs structs per head term survive the slice
    and the limit caps the row count at the overflow bound."""
    surv = F.pmod(
        F.xxhash64("term", "doc_id"), F.col("df")
    ) < F.least(F.lit(4 * sample_docs), F.col("df"))
    return (
        tfidf.filter(F.col("df") > df_floor)
        .groupBy("term")
        .agg(
            F.first("df").alias("df"),
            F.slice(
                F.array_sort(
                    F.collect_set(
                        F.when(
                            surv,
                            F.struct(
                                F.xxhash64("term", "doc_id").alias("h"),
                                F.col("doc_id").alias("doc_id"),
                            ),
                        )
                    )
                ),
                1,
                sample_docs,
            ).alias("sampled"),
        )
        .limit(_HEAD_TERMS_LOCAL_MAX + 1)
        .collect()
    )


def _auto_signature_stoplist(
    tfidf: DataFrame,
    threshold: float,
    n_docs: int | None = None,
    head_df_frac: float = 0.005,
    head_df_floor: int = 256,
    sample_docs: int = 16,
    min_precision: float = 0.2,
    probe_max_frac: float = 0.05,
    stats: dict | None = None,
    head_rows: list | None = None,
) -> DataFrame | None:
    """Probe-verified head-term stop-list for the banding SIGNATURE
    (round-6 headline: the recall-safe, default-on form of the r5
    opt-in ``signature_max_df``).

    Head terms (df > max(floor, frac·N)) drive the blocker's sub-cap
    random-collision volume — the measured cause of the superlinear
    fixed-cluster data-size exponent (1.30 at 1.2M→2.4M; three-arm
    census controls, BENCH/census_scale_controls_r5). Excluding them
    from signatures cut candidates ~19× with byte-identical output on
    the Zipf corpus — but a blanket df cap silently erases the banding
    signal of mutated-boilerplate families LARGER than the cap (their
    shared base words ARE high-df; test_signature_max_df_loses_large_
    families). This is the identical dichotomy the hot-bucket cap
    already solved with its density probe (false-positive pile-ups vs
    true-dense families), so the same machinery decides per TERM:

    - sample ``sample_docs`` docs from the term's posting list
      (deterministic hash order), exactly rescore the ≤ C(s,2) sample
      pairs (broadcast vectors — the sampled-doc table is tiny);
    - if at least ``min_precision`` of the sampled pairs are genuinely
      similar (cosine ≥ threshold), the term's high df IS signal — a
      boilerplate family sharing it — so it STAYS in signatures (its
      dense buckets then flow to the hot-bucket verify path, which
      keeps output-bound families);
    - otherwise its df is Zipf-head noise: random co-occurrence whose
      band collisions the rescore would reject — exclude it.

    ``min_precision`` is deliberately LOW (0.2 vs the bucket probe's
    0.5): the asymmetry is that falsely KEEPING a noise term only
    costs wasted candidates (recall-safe), while falsely excluding a
    family term loses output — mixed posting lists (one family + Zipf-
    head random docs) must err toward keep.

    Driver-job budget: one head-census job (plus one n_docs count when
    the caller didn't pass it — the pipeline does), plus ONE probe job
    when any head exists. Returns a local-relation DataFrame of terms
    to exclude, or None (no heads / probe kept everything / head list
    overflow / small-corpus probe-budget gate).

    ``probe_max_frac`` — the ENGAGEMENT gate (round-6 refinement):
    the stop-list is a large-N device. Its payoff is the head terms'
    banding-collision volume, which only dominates when posting lists
    are huge RELATIVE to a fixed-size probe; when sampling the heads
    would touch more than this fraction of the corpus (estimated
    locally from the head census as Σ min(sample_docs, df) — an upper
    bound, so the gate errs toward skipping), the collision volume
    the exclusions could prevent is the same order as the probe
    itself, and the probe becomes pure overhead: measured +11.5 s on
    the 50 k-doc bench corpus (946 heads at the floor cap, 30% of the
    corpus sampled, byte-identical output) vs ~1% of corpus sampled
    and a net 19× candidate cut at 1.2 M docs. Skipping keeps ALL
    terms in signatures — recall-safe by construction; pathological
    small-corpus families stay guarded by the hot-bucket verify path.
    The gate self-scales: it disengages exactly when the per-term
    sample stops being a rounding error against N.
    """
    spark = tfidf.sparkSession
    if n_docs is None:
        n_docs = int(
            tfidf.agg(F.count_distinct(F.col("doc_id")).alias("n"))
            .first()["n"]
        )
    if head_rows is None:
        # ONE job: head census AND per-term posting samples together
        # (round 7 — the r6 form ran the census, then a second full
        # posting scan + window job just to draw the per-term samples)
        head_rows = collect_signature_head_census(
            tfidf, df_floor=head_df_floor, sample_docs=sample_docs
        )
    # rows from collect_signature_head_census carry the samples; a
    # caller passing a bare (term, df) census falls back to the
    # distributed window sampler below (identical selection)
    samples_by_term = None
    if head_rows and "sampled" in head_rows[0].__fields__:
        samples_by_term = {
            str(r["term"]): [s["doc_id"] for s in r["sampled"]]
            for r in head_rows
        }
    cap = max(head_df_floor, int(head_df_frac * n_docs))
    heads = [
        (str(r["term"]), int(r["df"]))
        for r in head_rows
        if int(r["df"]) > cap
    ]
    if stats is not None:
        stats["signature_df_cap"] = cap
        stats["signature_head_terms"] = len(heads)
        stats["signature_heads_excluded"] = 0
        stats["signature_heads_kept_family"] = 0
    if not heads:
        return None
    if len(head_rows) > _HEAD_TERMS_LOCAL_MAX:
        _LOG.warning(
            "signature stop-list: >%d head terms over df floor %d — "
            "head census overflowed the local bound; skipping the "
            "stop-list (output unchanged, banding keeps all terms)",
            _HEAD_TERMS_LOCAL_MAX, head_df_floor,
        )
        return None
    # engagement gate: estimated probe footprint (upper bound — the
    # per-term samples overlap, so clamp at "the whole corpus") as a
    # fraction of the corpus; a non-positive n_docs hint is treated as
    # the documented skip (ADVICE r6: no ZeroDivisionError on an
    # inconsistent n_docs=0 alongside a non-empty tfidf)
    if n_docs <= 0:
        if stats is not None:
            stats["signature_probe_skipped_small_corpus"] = True
        return None
    probe_frac = min(
        1.0, sum(min(sample_docs, d) for _, d in heads) / n_docs
    )
    if stats is not None:
        stats["signature_probe_frac"] = round(probe_frac, 4)
    if probe_frac > probe_max_frac:
        if stats is not None:
            stats["signature_probe_skipped_small_corpus"] = True
        _LOG.info(
            "signature stop-list: probing %d heads would sample "
            "%.1f%% of the %d-doc corpus (> %.1f%% budget) — small-N "
            "regime, stop-list disengaged (output unchanged, banding "
            "keeps all terms; hot-bucket verify guards dense families)",
            len(heads), 100 * probe_frac, n_docs, 100 * probe_max_frac,
        )
        return None

    doc_id_type = tfidf.schema["doc_id"].dataType
    sample_persisted = False
    if samples_by_term is not None:
        # the fused census already drew the samples — ship them back
        # as a LOCAL relation (no job, broadcasts for free below)
        from pyspark.sql import types as T

        sample = spark.createDataFrame(
            [(t, d) for t, _d in heads for d in samples_by_term[t]],
            schema=T.StructType([
                T.StructField("term", T.StringType()),
                T.StructField("doc_id", doc_id_type),
            ]),
        )
    else:
        from pyspark.sql import Window

        head_df = F.broadcast(
            spark.createDataFrame(heads, schema="term string, df bigint")
            .select("term")
        )
        postings = tfidf.join(head_df, "term", "left_semi").select(
            "term", "doc_id", "df"
        )
        # pre-thin each posting list with a deterministic hash filter
        # BEFORE the row_number window: a head term's posting list is
        # up to N rows (a 30%-df term at 1.2M docs = 360k rows in ONE
        # window partition to sort); keeping rows with hash mod df <
        # 4·s leaves ~4·s expected survivors per term (P[< s
        # survivors] is negligible, and a short sample only shrinks
        # the probe — never wrong, just less evidence), so the window
        # sorts O(s·heads) rows total instead of Σ df
        survivors = postings.filter(
            F.pmod(F.xxhash64("term", "doc_id"), F.col("df"))
            < F.least(F.lit(4 * sample_docs), F.col("df"))
        )
        w = Window.partitionBy("term").orderBy(
            F.xxhash64("term", "doc_id"), "doc_id"
        )
        # persist the sampled postings (~4·sample_docs rows per head
        # term): the pair join reads this subtree twice and the
        # probe's doc-list broadcast a third time, and each un-cached
        # read re-ran the full long-form scan + hash-filter + window
        sample = survivors.withColumn(
            "_rn", F.row_number().over(w)
        ).filter(F.col("_rn") <= sample_docs).select(
            "term", "doc_id"
        ).persist()
        sample_persisted = True
    s1 = sample.select("term", F.col("doc_id").alias("doc1_id"))
    s2 = sample.select("term", F.col("doc_id").alias("doc2_id"))
    sample_pairs = s1.join(s2, "term").filter(
        F.col("doc1_id") < F.col("doc2_id")
    )
    probe_tfidf = tfidf.join(
        F.broadcast(sample.select("doc_id").distinct()), "doc_id",
        "left_semi",
    )
    # materialize the sampled docs' vectors ONCE: the rescore's two
    # broadcast sides would otherwise each re-run the tfidf semi-join
    # + map-assembly agg (measured 3 full long-form passes for the
    # probe at 500k docs — the probe was the single largest stage of
    # the similarity operator)
    probe_vec = _doc_vectors(probe_tfidf).persist()
    scored = _rescore_candidates(
        sample_pairs, probe_tfidf, 0.0,
        keep_cols=("term",), vec_join="broadcast", vec=probe_vec,
    )
    verdicts = scored.groupBy("term").agg(
        F.count("*").alias("_tot"),
        F.sum((F.col("similarity_score") >= threshold).cast("long"))
        .alias("_ok"),
    ).collect()
    probe_vec.unpersist()
    if sample_persisted:
        sample.unpersist()
    excluded = [
        (r["term"],)
        for r in verdicts
        if r["_ok"] < min_precision * r["_tot"]
    ]
    kept = len(verdicts) - len(excluded)
    if stats is not None:
        stats["signature_heads_excluded"] = len(excluded)
        stats["signature_heads_kept_family"] = kept
        stats["signature_probe_pairs"] = sum(r["_tot"] for r in verdicts)
    _LOG.info(
        "signature stop-list (auto, df cap %d): %d head terms probed, "
        "%d excluded as Zipf-head noise, %d kept (family signal)",
        cap, len(verdicts), len(excluded), kept,
    )
    if not excluded:
        return None
    return F.broadcast(
        spark.createDataFrame(excluded, schema="term string")
    )


def minhash_blocked_cosine_pairs(
    tfidf: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    num_hashes: int = 60,
    bands: int = 12,
    max_bucket_size: int | None = None,
    hot_bucket_mode: str = "verify",
    hot_sample_docs: int = 24,
    hot_min_precision: float = 0.5,
    stats: dict | None = None,
    signature_max_df: int | str | None = "auto",
    n_docs: int | None = None,
    signature_head_df_frac: float = 0.005,
    signature_head_df_floor: int = SIGNATURE_HEAD_DF_FLOOR,
    signature_head_sample_docs: int = 16,
    signature_head_min_precision: float = 0.2,
    signature_probe_max_frac: float = 0.05,
    signature_heads: list | None = None,
) -> DataFrame:
    """Scale path for the θ self-join: MinHash-Jaccard banding over
    each doc's TERM SET as the candidate blocker, exact cosine rescore
    (map-side dot product) as the scorer.

    ``signature_max_df`` — head-term treatment for the banding
    SIGNATURE only (the rescore always dots the full vectors, so every
    emitted score stays the exact cosine):

    - ``"auto"`` (DEFAULT, round 6): probe-verified stop-list — head
      terms (df > max(floor, 0.5%·N)) are each density-probed on a
      sample of their posting list; only terms whose sampled pairs are
      NOT genuinely similar (Zipf-head noise) are excluded, so
      boilerplate-family base words keep their banding signal and flow
      to the hot-bucket verify path. Recall-safe by construction; see
      :func:`_auto_signature_stoplist`. The measured win of head
      removal: a 0.5%·N cap cut candidate pairs ~19× (32.5M → 1.7M at
      1.2M rows) with byte-identical output, dropping the fixed-
      cluster data-size exponent 1.30 → 1.17
      (BENCH/census_scale_r5.json). Engages only when the probe's
      sampled-doc footprint is ≤ ``signature_probe_max_frac`` of the
      corpus (small corpora skip the machinery with output unchanged
      — the probe was pure overhead there; see
      :func:`_auto_signature_stoplist` ``probe_max_frac``).
    - an ABSOLUTE int cap: the r5 manual knob — excludes every term
      with df > cap, NO probe. Faster (no probe job) but recall-UNSAFE
      on corpora with mutated-boilerplate families larger than the
      cap: their shared base words have df ≈ family size and the cap
      erases the family's entire banding signal — a silent recall
      loss (asserted by test_signature_max_df_loses_large_families).
      Use only where high-df sharing is known to be noise (e.g.
      pre-deduplicated web text).
    - ``None``: band over the full term set (the oracle-parity /
      measurement-baseline setting).

    Why this beats prefix filtering / cosine-LSH at 100 TB: the
    banding collision curve 1-(1-j^r)^b is far sharper in Jaccard than
    any hyperplane scheme is in cosine — r=5, b=12 gives ~1e-5
    collision probability for unrelated pairs (j≈0.1) and >=0.99 for
    near-duplicates (j>=0.85), so the candidate set stays near-linear
    where the exact prefix join went quadratic (658M candidates at
    100k docs on flat-weight content). Recall at the cosine threshold
    is approximate and data-dependent (pairs with cosine>=0.7 but low
    term-set Jaccard can be missed); tests validate recall >= 0.95 on
    the near-duplicate-structured corpus. Precision is exact (every
    emitted score is the true cosine).

    ``max_bucket_size``: the quadratic failure mode of banding is a
    DEGENERATE bucket — one (band, band_hash) shared by thousands of
    docs contributes |bucket|² candidate pairs; measured superlinear
    at 600k rows on a 500-word vocabulary before the cap existed. Hot
    buckets come in two kinds with OPPOSITE correct treatments:

    - FALSE-POSITIVE buckets (tiny vocabularies / hash pile-ups):
      members are not actually similar, so the |bucket|² candidates
      are wasted work — drop them (the 600k attribution control:
      capped vs uncapped produced byte-identical triples because every
      hot bucket was of this kind).
    - TRUE-DENSE buckets (mutated-boilerplate families): members ARE
      pairwise similar, so the |bucket|² pairs are real OUTPUT — the
      quadratic work is output-bound and unavoidable for a complete
      pair list; dropping silently loses true `similar_to` pairs that
      exact-fingerprint dedup CANNOT recover (the texts differ).

    ``hot_bucket_mode`` picks the treatment once a bucket exceeds
    ``max_bucket_size``:

    - "verify" (default): a density probe distinguishes the kinds —
      sample ``hot_sample_docs`` members per hot bucket
      (deterministic hash order), exactly rescore the ≤ C(s,2) sample
      pairs, and keep the bucket's full pair set only when the sampled
      fraction ≥ threshold is at least ``hot_min_precision``. Dense
      buckets then contribute their (output-bound) pairs; sparse
      buckets are dropped. Probe cost per hot bucket is O(s²) exact
      rescores — bounded and tiny relative to either outcome.
    - "drop": drop every hot bucket (round-3 behavior). Fastest, but
      silently loses true pairs on corpora with dense near-dup
      families; the recall cost is quantified in BENCH/BASELINE.md
      (capped-vs-uncapped P/R on a boilerplate-heavy corpus).

    None keeps full banding recall (the oracle-parity setting); the
    pipeline default caps at a few hundred with mode "verify"
    (PipelineConfig.similarity_max_bucket / similarity_hot_mode).

    No silent caps: whenever the cap is active, the bucket census
    (total / over-cap / kept-dense / dropped buckets, banded rows in
    hot buckets) is logged and, if ``stats`` (a dict) is passed,
    written into it — so capped runs are always distinguishable from
    full-recall runs (the run_pipeline result carries this dict as
    result["similarity_stats"]).

    Driver-job budget (the capped path's parallelism-independent
    overhead): ONE census job that also collects the hot-key list
    (shipped back as a local relation — no checkpoint, broadcasts for
    free), ONE probe job that decides bucket density AND the
    near-threshold histogram, then the caller's rescore job(s). The
    probe's sampled cosines feed ``stats``: probe_sampled_pairs,
    probe_pairs_near_threshold, probe_near_threshold_frac, and
    ``banding_boundary_hint`` — True when >=30% of sampled in-bucket
    pair cosines lie within ±0.1 of the threshold, the online form of
    the offline recall-sweep finding that recall falls on the banding
    collision curve (raise ``bands`` in that regime).

    Cache lifecycle: the capped path persists the banded rows for the
    census + probe + anti-join, then eagerly materializes the (small)
    result pair table via localCheckpoint and releases the cache
    (`_finalize`, as in the ann/dedup siblings). The result's own
    checkpoint blocks are registered with
    `ann.release_checkpointed_results` — call it once the pairs have
    been consumed, so looping sessions release even the result storage
    (`clearCache()` cannot see checkpoint blocks).
    """
    exclude = None
    if signature_max_df == "auto":
        signature_max_df = None
        if "df" in tfidf.columns:
            exclude = _auto_signature_stoplist(
                tfidf, threshold, n_docs=n_docs,
                head_df_frac=signature_head_df_frac,
                head_df_floor=signature_head_df_floor,
                sample_docs=signature_head_sample_docs,
                min_precision=signature_head_min_precision,
                probe_max_frac=signature_probe_max_frac,
                stats=stats,
                head_rows=signature_heads,
            )
    banded = _banded_rows(tfidf, num_hashes, bands,
                          signature_max_df=signature_max_df,
                          signature_exclude=exclude)
    return _pairs_from_banded(banded, tfidf, threshold, max_bucket_size,
                             hot_bucket_mode, hot_sample_docs,
                             hot_min_precision, stats)


def _banded_rows(
    tfidf: DataFrame,
    num_hashes: int,
    bands: int,
    signature_max_df: int | None = None,
    signature_exclude: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band, band_hash) MinHash-banding rows for a tfidf
    long form — the blocker shared by the pair join and the
    standalone census.

    ``signature_max_df``: band over the df-filtered term set, FALLING
    BACK to the full set for docs whose every term is over the cap —
    an all-head-word doc would otherwise have an empty signature and
    silently fall out of the blocker entirely (measured: ~1 doc in
    24k on the 1.2M Zipf corpus, 40 lost triples). The fallback docs
    band among themselves, where the ordinary cap+probe machinery
    applies. Same single groupBy either way.

    ``signature_exclude``: an explicit (small) term table to exclude
    from signatures instead of a df cap — the probe-verified AUTO
    stop-list path (_auto_signature_stoplist). Broadcast-joined onto
    the long form; the same empty-signature full-set fallback
    applies. Mutually exclusive with ``signature_max_df``.

    Physical shape (round 7): ONE groupBy(doc) computing the K
    minhashes as K flat ``min(xxhash64(term, k))`` aggregate columns —
    a fixed-width codegen hash aggregate. The r2-r6 form collected the
    term array per doc and evaluated the signature as nested HOF
    transforms, whose interpreted per-element overhead dominated the
    stage (measured 8.2s vs 3.4s for the flat form at 500k docs,
    bit-identical signatures — same xxhash64(term, k) stream feeding
    the same min). With a stop-list, each k carries a kept-only min
    plus an all-terms min and coalesces — per-doc all-or-nothing
    fallback semantics are preserved exactly (a doc with any kept term
    has every kept-min non-null; an all-head doc falls back to the
    full-set signature for every k)."""
    rows_per_band = num_hashes // bands
    if signature_max_df and signature_exclude is not None:
        raise ValueError(
            "signature_max_df and signature_exclude are mutually "
            "exclusive"
        )
    kept = None
    t = tfidf
    if signature_max_df:
        kept = F.col("df") <= signature_max_df
    elif signature_exclude is not None:
        t = tfidf.join(
            F.broadcast(
                signature_exclude.select("term")
                .withColumn("_x", F.lit(True))
            ),
            "term",
            "left",
        )
        kept = F.col("_x").isNull()

    def h(k: int):
        return F.xxhash64(F.col("term"), F.lit(k))

    if kept is not None:
        aggs = []
        for k in range(num_hashes):
            aggs.append(F.min(F.when(kept, h(k))).alias(f"_mk{k}"))
            aggs.append(F.min(h(k)).alias(f"_ma{k}"))
        sig_cols = [
            F.coalesce(F.col(f"_mk{k}"), F.col(f"_ma{k}"))
            for k in range(num_hashes)
        ]
    else:
        aggs = [F.min(h(k)).alias(f"_mk{k}") for k in range(num_hashes)]
        sig_cols = [F.col(f"_mk{k}") for k in range(num_hashes)]
    mins = t.groupBy("doc_id").agg(*aggs)
    band_hashes = F.array(*[
        F.xxhash64(
            F.concat_ws(
                "_",
                *[
                    c.cast("string")
                    for c in sig_cols[
                        b * rows_per_band:(b + 1) * rows_per_band
                    ]
                ],
            )
        )
        for b in range(bands)
    ])
    return (
        mins.select("doc_id", F.posexplode(band_hashes))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "band_hash")
    )


def banding_census(
    tfidf: DataFrame,
    num_hashes: int = 60,
    bands: int = 12,
    max_bucket_size: int = 400,
    signature_exclude: DataFrame | None = None,
) -> dict:
    """Candidate-volume census of the MinHash blocker WITHOUT running
    the rescore: bucket count, over-cap tail, and the sub-cap
    candidate-pair volume Σ n·(n−1)/2 that drives rescore cost. Used
    by tools/census_scale.py to attribute data-size scaling.
    ``signature_exclude`` censuses the df-stop-listed blocker (pass
    _auto_signature_stoplist's result to measure the AUTO default)."""
    census = (
        _banded_rows(tfidf, num_hashes, bands,
                     signature_exclude=signature_exclude)
        .groupBy("band", "band_hash")
        .agg(F.count("*").alias("_n"))
    )
    agg = census.agg(
        F.count("*").alias("total"),
        F.coalesce(
            F.sum((F.col("_n") > max_bucket_size).cast("long")), F.lit(0)
        ).alias("over"),
        F.coalesce(
            F.sum(
                F.when(F.col("_n") > max_bucket_size, F.col("_n")).otherwise(0)
            ),
            F.lit(0),
        ).alias("hot_rows"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_n") <= max_bucket_size,
                    F.col("_n").cast("long") * (F.col("_n") - 1) / 2,
                ).otherwise(0.0)
            ).cast("long"),
            F.lit(0),
        ).alias("subcap_pairs"),
    ).first()
    return {
        "cap": max_bucket_size,
        "buckets_total": int(agg["total"]),
        "buckets_over_cap": int(agg["over"]),
        "banded_rows_in_hot_buckets": int(agg["hot_rows"]),
        "candidate_pairs_subcap": int(agg["subcap_pairs"]),
    }


# above this many hot (over-cap) buckets, the capped path stops
# shipping the hot-key / dense-key lists through the driver as local
# relations (the one-job fold) and keeps them distributed: ~100k
# (band, band_hash) structs is a few MB on the driver — safe; an
# adversarial corpus with millions of hot buckets is not
_HOT_KEYS_LOCAL_MAX = 100_000


def _pairs_from_banded(banded, tfidf, threshold, max_bucket_size,
                      hot_bucket_mode, hot_sample_docs,
                      hot_min_precision, stats):
    def _self_join(rows: DataFrame) -> DataFrame:
        b1 = rows.select(F.col("doc_id").alias("doc1_id"), "band", "band_hash")
        b2 = rows.select(F.col("doc_id").alias("doc2_id"), "band", "band_hash")
        # shuffle-hash: build a per-partition map of one banded side
        # (narrow rows, |banded|/P per partition) and stream the
        # other — sort-merge would sort both sides of the largest
        # fan-out join in the operator for no benefit
        return (
            b1.join(b2.transform(hinted), ["band", "band_hash"])
            .filter(F.col("doc1_id") < F.col("doc2_id"))
            .select("doc1_id", "doc2_id")
        )

    if max_bucket_size is None:
        return _rescore_candidates(
            _dedup_pairs(_self_join(banded)), tfidf, threshold
        )

    if hot_bucket_mode not in ("verify", "drop"):
        raise ValueError(f"unknown hot_bucket_mode: {hot_bucket_mode!r}")
    import os as _os
    import time as _time

    from pyspark.sql import Window

    from pdf_knowledge_extractor_spark.operators.ann import _finalize

    _dbg = _os.environ.get("PKE_SIM_DEBUG_TIMING")
    _t0 = _time.perf_counter()

    def _mark(label: str):
        if _dbg:
            _LOG.warning(
                "SIM-TIMING %s %.1fs", label, _time.perf_counter() - _t0
            )

    # persist the banded rows (3 narrow columns): the census, the
    # density probe and the anti-join all read them; recomputing the
    # signature HOFs — the expensive subtree — per consumer would
    # multiply the operator's cost. Released via _finalize below.
    banded = banded.persist()
    census = banded.groupBy("band", "band_hash").agg(
        F.count("*").alias("_n")
    )
    # ONE eager job materializes the banded cache AND returns both the
    # census scalars and the full hot-key list (collect_list skips the
    # NULLs of sub-cap buckets; the list is bounded by rows/cap, tens
    # of thousands at worst — driver-safe). The cap must never be
    # silent — see the docstring. Folding the hot-key materialization
    # into the census action (instead of a second job + an eager
    # localCheckpoint) removes two driver-serialized jobs and the
    # checkpoint blocks that round 4 measured as parallelism-
    # independent overhead (VERDICT r4 item 3).
    agg = census.agg(
        F.count("*").alias("total"),
        F.coalesce(
            F.sum((F.col("_n") > max_bucket_size).cast("long")), F.lit(0)
        ).alias("over"),
        F.coalesce(
            F.sum(
                F.when(F.col("_n") > max_bucket_size, F.col("_n")).otherwise(0)
            ),
            F.lit(0),
        ).alias("hot_rows"),
        # sub-cap candidate volume Σ n·(n−1)/2 — the direct driver of
        # rescore cost, recorded so data-size scaling runs can
        # attribute superlinear wall growth to blocking-key
        # densification from the artifact instead of inferring it
        # from the hot tail (BENCH/BASELINE.md 1.2M→2.4M analysis)
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_n") <= max_bucket_size,
                    F.col("_n").cast("long") * (F.col("_n") - 1) / 2,
                ).otherwise(0.0)
            ).cast("long"),
            F.lit(0),
        ).alias("subcap_pairs"),
        # BOUNDED at the aggregation (slice caps the array the driver
        # receives): n_over is bounded by banded_rows/cap in theory but
        # an adversarial corpus can push it to millions — the exact
        # `over` count above decides below whether the local-relation
        # fast path is safe or the distributed hot-key join must run
        F.slice(
            F.collect_list(
                F.when(
                    F.col("_n") > max_bucket_size,
                    F.struct("band", "band_hash"),
                )
            ),
            1,
            _HOT_KEYS_LOCAL_MAX + 1,
        ).alias("hot"),
    ).first()
    hot_list = list(agg["hot"])
    n_over, n_hot_rows = int(agg["over"]), int(agg["hot_rows"])
    info = {
        "cap": max_bucket_size,
        "mode": hot_bucket_mode,
        "buckets_total": int(agg["total"]),
        "buckets_over_cap": n_over,
        "banded_rows_in_hot_buckets": n_hot_rows,
        "candidate_pairs_subcap": int(agg["subcap_pairs"]),
        "dense_buckets_kept": 0,
        "buckets_dropped": n_over,
    }

    if n_over == 0:
        # no bucket over the cap: the anti-join, hot-key checkpoint
        # and probe would all be no-ops — skip their jobs entirely
        # (the common case on healthy corpora)
        if stats is not None:
            stats.update(info)
        _LOG.info(
            "similarity banding cap %d (mode=%s): no bucket over cap "
            "(%d buckets)", max_bucket_size, hot_bucket_mode,
            info["buckets_total"],
        )
        out = _rescore_candidates(
            _dedup_pairs(_self_join(banded)), tfidf, threshold
        )
        return _finalize(out, banded)

    # the hot-key list arrived with the census collect — ship it back
    # as a LOCAL relation (no job, no checkpoint blocks; broadcasts
    # for free in the anti-/semi-joins below). Pathological corpora
    # (more hot keys than the slice bound) keep the keys DISTRIBUTED
    # instead: the filtered census recomputes from the persisted
    # banded cache per consumer — an extra cheap job each, paid only
    # when a driver collect would be the real scale risk.
    spark = tfidf.sparkSession
    extra_caches = []
    if n_over <= _HOT_KEYS_LOCAL_MAX:
        hot_keys = F.broadcast(spark.createDataFrame(
            [(int(r["band"]), int(r["band_hash"])) for r in hot_list],
            schema="band int, band_hash bigint",
        ))
    else:
        _LOG.warning(
            "similarity banding cap: %d hot buckets exceeds the "
            "local-relation bound (%d) — using distributed hot-key "
            "joins", n_over, _HOT_KEYS_LOCAL_MAX,
        )
        hot_keys = census.filter(
            F.col("_n") > max_bucket_size
        ).select("band", "band_hash").persist()
        extra_caches.append(hot_keys)
    cold = banded.join(hot_keys, ["band", "band_hash"], "left_anti")
    candidates = _self_join(cold)

    _mark("census+hotkeys done")
    if hot_bucket_mode == "verify" and n_over > 0:
        hot_members = banded.join(
            hot_keys, ["band", "band_hash"], "left_semi"
        )
        w = Window.partitionBy("band", "band_hash").orderBy(
            F.xxhash64("doc_id"), "doc_id"
        )
        # persisted for the same three-consumer reason as the
        # stop-list sample (pair join sides + doc-list broadcast)
        sample = hot_members.withColumn(
            "_rn", F.row_number().over(w)
        ).filter(F.col("_rn") <= hot_sample_docs).persist()
        extra_caches.append(sample)
        s1 = sample.select(
            "band", "band_hash", F.col("doc_id").alias("doc1_id")
        )
        s2 = sample.select(
            "band", "band_hash", F.col("doc_id").alias("doc2_id")
        )
        sample_pairs = s1.join(s2, ["band", "band_hash"]).filter(
            F.col("doc1_id") < F.col("doc2_id")
        )
        # restrict the probe rescore's doc-vector build to the SAMPLED
        # docs (<= hot_sample_docs * n_hot rows, broadcastable):
        # building maps for the whole corpus to score a few thousand
        # sample pairs was another parallelism-independent fixed cost
        probe_tfidf = tfidf.join(
            F.broadcast(sample.select("doc_id").distinct()),
            "doc_id",
            "left_semi",
        )
        # one materialized vector build for both broadcast sides
        # (same fix as the stop-list probe)
        probe_vec = _doc_vectors(probe_tfidf).persist()
        extra_caches.append(probe_vec)
        # threshold 0.0 keeps EVERY sampled pair's exact cosine
        # (tf-idf weights are non-negative): the same scores decide
        # bucket density AND measure how close the corpus's in-bucket
        # similarity mass sits to the threshold — the banding-boundary
        # signal the offline recall sweep found (recall falls on the
        # 1-(1-j^r)^b collision curve, not the cap)
        scored = _rescore_candidates(
            sample_pairs, probe_tfidf, 0.0,
            keep_cols=("band", "band_hash"),
            # the probe's vector table is <= hot_sample_docs * n_hot
            # rows by construction — broadcast, don't shuffle
            vec_join="broadcast",
            vec=probe_vec,
        )
        # ONE probe job: per-bucket density verdict + near-threshold
        # histogram, collected together (was: eager dense checkpoint
        # + dense.count() — two more driver-serialized jobs)
        s = F.col("similarity_score")
        bucket_stats = scored.groupBy("band", "band_hash").agg(
            F.count("*").alias("_tot"),
            F.sum((s >= threshold).cast("long")).alias("_ok"),
            F.sum(
                ((s >= threshold - 0.1) & (s < threshold)).cast("long")
            ).alias("_near_lo"),
            F.sum(
                ((s >= threshold) & (s < threshold + 0.1)).cast("long")
            ).alias("_near_hi"),
        )
        is_dense = F.col("_ok") >= F.lit(hot_min_precision) * F.col("_tot")
        dense = None
        if n_over <= _HOT_KEYS_LOCAL_MAX:
            probe_rows = bucket_stats.collect()
            _mark("density probe done")
            dense_list = [
                (int(r["band"]), int(r["band_hash"]))
                for r in probe_rows
                if r["_ok"] >= hot_min_precision * r["_tot"]
            ]
            n_dense = len(dense_list)
            n_sampled = sum(r["_tot"] for r in probe_rows)
            n_near = sum(
                r["_near_lo"] + r["_near_hi"] for r in probe_rows
            )
            if n_dense > 0:
                dense = F.broadcast(spark.createDataFrame(
                    dense_list, schema="band int, band_hash bigint"
                ))
        else:
            # pathological hot-bucket count: keep the per-bucket stats
            # DISTRIBUTED — one persisted aggregate, one scalar job,
            # dense keys as a filtered view (shuffle-joined below; a
            # multi-million-row "broadcast" would be its own failure)
            bucket_stats = bucket_stats.persist()
            extra_caches.append(bucket_stats)
            g = bucket_stats.agg(
                F.coalesce(F.sum(is_dense.cast("long")), F.lit(0)),
                F.coalesce(F.sum("_tot"), F.lit(0)),
                F.coalesce(
                    F.sum(F.col("_near_lo") + F.col("_near_hi")), F.lit(0)
                ),
            ).first()
            _mark("density probe done (distributed)")
            n_dense, n_sampled, n_near = (int(x) for x in g)
            if n_dense > 0:
                dense = bucket_stats.filter(is_dense).select(
                    "band", "band_hash"
                )
        info["dense_buckets_kept"] = n_dense
        info["buckets_dropped"] = n_over - n_dense
        info["probe_sampled_pairs"] = n_sampled
        info["probe_pairs_near_threshold"] = n_near
        near_frac = n_near / n_sampled if n_sampled else 0.0
        info["probe_near_threshold_frac"] = round(near_frac, 4)
        # the recall sweep (BENCH/BASELINE.md) pinned recall loss to
        # the banding collision curve as family similarity approaches
        # the threshold; when >=30% of sampled in-bucket mass sits
        # within ±0.1 of it, the same loss is likely happening OUTSIDE
        # hot buckets too — surface the tuning hint online
        info["banding_boundary_hint"] = bool(
            n_sampled and near_frac >= 0.30
        )
        if info["banding_boundary_hint"]:
            _LOG.warning(
                "similarity probe: %.0f%% of sampled in-bucket pair "
                "cosines lie within ±0.1 of threshold %.2f — corpus "
                "similarity mass sits near the banding collision "
                "boundary; consider raising similarity_bands (e.g. "
                "64 hashes / 16 bands) for fuller recall",
                100 * near_frac, threshold,
            )
        if dense is not None:
            dense_members = banded.join(
                dense, ["band", "band_hash"], "left_semi"
            )
            candidates = candidates.unionByName(_self_join(dense_members))

    log = _LOG.warning if info["buckets_dropped"] > 0 else _LOG.info
    log(
        "similarity banding cap %d (mode=%s): %d/%d buckets over cap "
        "(%d banded rows), %d kept as verified-dense, %d dropped",
        max_bucket_size,
        hot_bucket_mode,
        n_over,
        info["buckets_total"],
        n_hot_rows,
        info["dense_buckets_kept"],
        info["buckets_dropped"],
    )
    if stats is not None:
        stats.update(info)
    out = _rescore_candidates(_dedup_pairs(candidates), tfidf, threshold)
    out = _finalize(out, banded, *extra_caches)
    _mark("rescore+finalize done")
    return out


def with_similarity_metadata(pairs: DataFrame) -> DataFrame:
    """Attach the reference record shape (similarity_type='cosine',
    shared_concepts=[] — semantic_analyzer.py:42-49, 353-354)."""
    return pairs.select(
        "doc1_id",
        "doc2_id",
        "similarity_score",
        F.lit("cosine").alias("similarity_type"),
        F.array().cast("array<string>").alias("shared_concepts"),
    )


def top_similar_per_doc(pairs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k similar docs per target (semantic_analyzer.py:574-587):
    symmetrize then window top-k."""
    from pyspark.sql import Window

    sym = pairs.select(
        F.col("doc1_id").alias("doc_id"),
        F.col("doc2_id").alias("other_id"),
        "similarity_score",
    ).unionByName(
        pairs.select(
            F.col("doc2_id").alias("doc_id"),
            F.col("doc1_id").alias("other_id"),
            "similarity_score",
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("similarity_score"), F.asc("other_id")
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
