"""Custom hook registry (SURVEY.md §2.9) — the engine analog of the
reference's plugin config (config.yaml.example:176-181):

    advanced.custom_models.preprocessing_pipeline: [step, ...]
    advanced.custom_models.feature_extractors:     [extractor, ...]

Two hook points, both Spark-shaped so user extensions stay on the
vectorized path:

- PREPROCESSORS: name -> fn(Column) -> Column. Column-expression (or
  Arrow pandas-UDF) text transforms, applied in registration-list
  order to the text column before enrichment/mention extraction.
- MENTION_DETECTORS: name -> fn(docs, id_col, text_col) -> DataFrame
  with (doc_id, text, concept_type, importance). Extra mention
  streams unioned into the pipeline's mention union (U1), flowing
  into concepts, TF-IDF-independent triples and the graph exactly
  like the built-in keyword/phrase/entity streams.
- MEDIA_EMBEDDERS: name -> fn(data, kind, feature_dim) -> iterable of
  list[float], where ``data``/``kind`` are pandas Series covering one
  Arrow batch (operators/multimodal.py ships them from mapInPandas).
  Batch-shaped on purpose: a real ONNX/torch encoder wants the whole
  batch for vectorized inference, never a per-row Python call. The
  deterministic ``byte_hash`` kernel (the sandbox default that the
  oracle gate pins) registers itself in operators/multimodal.py; a
  deployment registers its model under another name and selects it
  via ``extract_media_features(..., embedder="my_cnn")`` — no plan
  code changes. The kernel is captured into the UDF closure, so it
  must be picklable and its weights/libraries shipped to executors
  (--py-files / an initialized global per worker, the usual pattern).

Wire-up: ``PipelineConfig.extra = {"preprocessing_pipeline": [...],
"feature_extractors": [...]}`` (plans/pipeline.py). Hooks must be
registered (imported) on the driver before the plan is built; at
cluster scale ship them via --py-files like any code.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame

PREPROCESSORS: dict[str, Callable[[Column], Column]] = {}
MENTION_DETECTORS: dict[str, Callable[..., DataFrame]] = {}
MEDIA_EMBEDDERS: dict[str, Callable] = {}


def register_preprocessor(name: str):
    """Decorator: register a Column -> Column text transform."""

    def deco(fn: Callable[[Column], Column]):
        PREPROCESSORS[name] = fn
        return fn

    return deco


def register_mention_detector(name: str):
    """Decorator: register a (docs, id_col, text_col) -> mentions
    DataFrame detector."""

    def deco(fn: Callable[..., DataFrame]):
        MENTION_DETECTORS[name] = fn
        return fn

    return deco


def register_media_embedder(name: str):
    """Decorator: register a batch media-embedding kernel
    ``fn(data: pd.Series[bytes], kind: pd.Series[str],
    feature_dim: int) -> iterable of list[float]`` (one vector per
    input row, in order)."""

    def deco(fn: Callable):
        MEDIA_EMBEDDERS[name] = fn
        return fn

    return deco


def get_media_embedder(name: str) -> Callable:
    """Resolve a registered media embedder; raises KeyError with the
    registered names at PLAN BUILD time (driver-side), not inside the
    executor UDF where the failure would surface as a task error."""
    if name not in MEDIA_EMBEDDERS:
        raise KeyError(
            f"unknown media embedder {name!r}; registered: "
            f"{sorted(MEDIA_EMBEDDERS)}"
        )
    return MEDIA_EMBEDDERS[name]


def apply_preprocessors(col: Column, names: list[str]) -> Column:
    """Chain the named preprocessors over ``col`` in list order."""
    for name in names:
        if name not in PREPROCESSORS:
            raise KeyError(
                f"unknown preprocessor {name!r}; registered: "
                f"{sorted(PREPROCESSORS)}"
            )
        col = PREPROCESSORS[name](col)
    return col


def detector_mentions(
    docs: DataFrame, names: list[str],
    id_col: str = "doc_id", text_col: str = "text",
) -> list[DataFrame]:
    """Run the named detectors; each returns a mention stream with the
    standard (doc_id, text, concept_type, importance) columns."""
    out = []
    for name in names:
        if name not in MENTION_DETECTORS:
            raise KeyError(
                f"unknown mention detector {name!r}; registered: "
                f"{sorted(MENTION_DETECTORS)}"
            )
        m = MENTION_DETECTORS[name](docs, id_col=id_col, text_col=text_col)
        required = {"doc_id", "text", "concept_type", "importance"}
        missing = required - set(m.columns)
        if missing:
            raise ValueError(
                f"detector {name!r} output missing columns {sorted(missing)}"
            )
        out.append(m.select("doc_id", "text", "concept_type", "importance"))
    return out
