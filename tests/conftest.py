from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from pdf_knowledge_extractor_spark.session import get_spark

    s = get_spark("pke-tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def small_corpus(spark):
    from pdf_knowledge_extractor_spark.corpus import generate_corpus

    return generate_corpus(spark, 200).persist()
