"""NFKC normalization + repeated-pattern squashing.

Semantics reproduced from clean_text_for_claude
(claude_integration.py:696-721). NFKC is not expressible as a Spark
column expression, so it runs as an Arrow-batched pandas UDF
(vectorized; never row-at-a-time Python).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_REPEAT_RE = re.compile(r"(.{10,}?)\1{2,}", re.DOTALL)


@F.pandas_udf(T.StringType())
def nfkc_clean(texts: pd.Series) -> pd.Series:
    def one(t):
        if t is None:
            return None
        t = unicodedata.normalize("NFKC", t)
        t = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]", "", t)
        t = re.sub(r"\s+", " ", t).strip()
        t = _REPEAT_RE.sub(lambda m: m.group(1) * 2, t)
        return t

    return texts.map(one)


def clean_for_llm(col: Column) -> Column:
    return nfkc_clean(col)
