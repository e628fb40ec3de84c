"""EP1 analyze routing + incremental new-doc detection."""

from __future__ import annotations

import pyspark.sql.functions as F

from pdf_knowledge_extractor_spark.plans.analyze import (
    analyze_corpus,
    analyze_incremental,
)


def test_analyze_routing_and_summary(spark, small_corpus):
    res = analyze_corpus(small_corpus, text_col="content", max_pages=100)
    s = res["summary"].first()
    assert s["total_analyzed"] == 200
    assert (
        s["n_processable"] + s["n_special"] + s["n_errors"] == 200
    )
    # the corpus embeds empty + punctuation-only rows -> errors
    assert s["n_errors"] >= 1
    err_routes = {
        r["route"] for r in res["errors"].select("route").distinct().collect()
    }
    assert err_routes == {"errors"}
    # sha invariant present on every row
    assert res["analysis"].filter(F.col("content_sha256").isNull()).count() == 0


def test_analyze_incremental_detects_new_docs(spark, small_corpus):
    prev = small_corpus.select("doc_id").limit(150)
    res = analyze_incremental(
        spark, small_corpus, prev, id_col="doc_id", text_col="content",
        lang_col="lang",
    )
    assert res["new_documents"].count() == 50
    assert res["triples"].count() > 0


def test_multi_format_roundtrip(spark, small_corpus, tmp_path):
    from pdf_knowledge_extractor_spark.sources.formats import (
        load_corpus_any,
        write_corpus_any,
    )

    src = small_corpus.select("repo", "path", "commit", "lang", "content")
    n = src.count()
    for fmt in ("parquet", "json", "orc"):
        out = str(tmp_path / fmt)
        write_corpus_any(src, out, fmt)
        back = load_corpus_any(spark, out, fmt)
        assert back.count() == n, fmt
        assert back.columns == src.columns, fmt
    # csv: newlines in content need multiLine handling — verify the
    # loader enforces schema on a flat subset instead
    flat = src.withColumn("content", F.regexp_replace("content", "\n", " "))
    out = str(tmp_path / "csv")
    write_corpus_any(flat, out, "csv")
    back = load_corpus_any(spark, out, "csv")
    assert back.count() == n
