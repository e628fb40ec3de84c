"""Multi-format sources and sinks (S4/K1 and friends).

Every loader takes an EXPLICIT schema (no inference in production —
schema drift at 10^12 files must fail loudly, not silently re-type).
Iceberg/Delta need jars not present in this image; `load_table`
falls back to parquet and the Iceberg path is gated behind an
import-try (SURVEY.md §2.1 S1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def load_corpus_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType = CORPUS_SCHEMA,
) -> DataFrame:
    """Load the corpus table from parquet / json / csv / orc / iceberg
    with the canonical schema enforced."""
    fmt = fmt.lower()
    if fmt == "parquet":
        return spark.read.schema(schema).parquet(path)
    if fmt == "json":
        return spark.read.schema(schema).json(path)
    if fmt == "csv":
        return spark.read.schema(schema).option("header", True).csv(path)
    if fmt == "orc":
        return spark.read.schema(schema).orc(path)
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(path)
        except Exception as exc:  # noqa: BLE001
            raise RuntimeError(
                "iceberg runtime jar not on the classpath in this image; "
                "use parquet (operators are storage-agnostic)"
            ) from exc
    raise ValueError(f"unsupported format: {fmt}")


def write_corpus_any(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    fmt = fmt.lower()
    writer = df.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")
