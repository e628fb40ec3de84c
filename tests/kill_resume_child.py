"""Subprocess driver for the hard-kill resume test
(tests/test_kill_resume.py): runs the checkpointed KG pipeline over
the deterministic synthetic corpus. The parent test SIGKILLs this
process group mid-run, then reruns it to completion.

Usage: python tests/kill_resume_child.py <ckpt_dir> <n_rows>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_knowledge_extractor_spark.corpus import generate_corpus  # noqa: E402
from pdf_knowledge_extractor_spark.plans.pipeline import (  # noqa: E402
    PipelineConfig,
)
from pdf_knowledge_extractor_spark.session import get_spark  # noqa: E402
from pdf_knowledge_extractor_spark.sources.checkpoint import (  # noqa: E402
    run_pipeline_checkpointed,
)


def main() -> None:
    ckpt_dir, n_rows = sys.argv[1], int(sys.argv[2])
    spark = get_spark("kill-resume-child", cpus=4)
    corpus = generate_corpus(spark, n_rows)
    cfg = PipelineConfig(
        similarity_strategy="exact",
        similarity_round_dp=6,
        created_at="2026-01-01T00:00:00",
    )
    out = run_pipeline_checkpointed(
        spark, corpus, ckpt_dir, cfg,
        id_col="doc_id", text_col="content", lang_col="lang",
    )
    print("TRIPLES", out["triples"].count(), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
