"""pdf_knowledge_extractor_spark — a brand-new PySpark-native
knowledge-graph construction engine with the query and data-processing
capabilities of jjc324/pdf-knowledge-extractor, re-imagined Spark-first.

Pipeline: extract -> analyze -> link -> canonicalize -> materialize
(subj, pred, obj) triples, over a table of source-code repositories
``(repo, path, commit, lang, content)`` (or any document corpus with a
doc_id + text column).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the observable behavior of the reference repository.
No code is copied from the reference; reference file:line citations in
docstrings identify the *semantics* being reproduced, Spark-first.
"""

__version__ = "0.1.0"

from pdf_knowledge_extractor_spark.operators.ann import (  # noqa: F401
    release_checkpointed_results,
)
from pdf_knowledge_extractor_spark.session import get_spark  # noqa: F401
