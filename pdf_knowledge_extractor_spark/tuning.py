"""Physical-plan tuning switches shared by the heavy operators.

The similarity / tfidf / dedup / ann operators pin ShuffledHashJoin on
their big equi-joins: SHJ builds a per-partition hash map of one side
and STREAMS the other, where sort-merge would sort the largest shuffle
in the pipeline (measured 15-17 GB of spill at 1.2M rows before the
hints landed — see operators/similarity.py docstrings). The tradeoff
(ADVICE r5 #4): the build side must FIT executor memory per partition
and SHJ cannot fall back to sort-merge, so a deployment whose
``spark.sql.shuffle.partitions`` is not sized to the data can OOM
where SMJ would have spilled; the hints also preempt AQE's join/skew
choices.

Budget rule of thumb (document once, apply everywhere): the hinted
build sides are narrow row sets — doc vectors, banded rows, posting
slices — of |rows| / shuffle_partitions rows per partition. Size
partitions so that build_rows_per_partition x avg_row_bytes stays in
the tens of MB (e.g. 1.2M docs x ~1 KB vectors / 64 partitions ≈
19 MB — fine; the same corpus on 4 partitions ≈ 300 MB — raise
partitions or disable the hint).

``PKE_JOIN_HINT`` reverts to Catalyst's own choice without a code
change:

- unset / ``shuffle_hash`` — pin SHJ (default; the measured-fast
  configuration when partitions are sized per the rule above)
- ``none`` — no hint: Catalyst + AQE pick the strategy (sort-merge
  with spill-safety, skew splitting, broadcast promotion)
- any other hint name (``merge``, ``shuffle_merge``) — forwarded
  verbatim
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_ENV = "PKE_JOIN_HINT"
DEFAULT_JOIN_HINT = "shuffle_hash"


def join_hint_name() -> str | None:
    """Resolve the configured build-side join hint (None = unhinted)."""
    v = os.environ.get(_ENV, DEFAULT_JOIN_HINT).strip().lower()
    return None if v in ("", "none", "off", "auto") else v


def hinted(df: DataFrame) -> DataFrame:
    """Apply the configured join hint to the BUILD side of a join
    (the side the operator wants hash-mapped per partition). With
    PKE_JOIN_HINT=none this is the identity, handing the physical
    choice back to Catalyst/AQE."""
    name = join_hint_name()
    return df.hint(name) if name else df
