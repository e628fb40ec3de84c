#!/usr/bin/env python
"""A/B microbenchmark for the smaller-map rescore dot product.

Quantifies commit "Iterate the smaller map in the rescore dot
product": on a length-skewed candidate set (big x tiny doc pairs,
the shape a 100-TB web/code corpus actually has — Zipf doc lengths),
time the OLD expression (always iterate m1) against the NEW one
(iterate the smaller side) over the SAME cached joined rows, in the
same session, alternating arms. Run:

    python tools/bench_skew_rescore.py            # default 150x2000
    PKE_SKEW_BIG=200 PKE_SKEW_TINY=4000 python tools/bench_skew_rescore.py
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

N_BIG = int(os.environ.get("PKE_SKEW_BIG", "150"))
N_TINY = int(os.environ.get("PKE_SKEW_TINY", "2000"))
BIG_TERMS = int(os.environ.get("PKE_SKEW_BIG_TERMS", "4000"))
TINY_TERMS = int(os.environ.get("PKE_SKEW_TINY_TERMS", "15"))
REPS = int(os.environ.get("PKE_SKEW_REPS", "3"))


def _dot(entries: str, probe: str):
    return F.aggregate(
        F.map_entries(entries),
        F.lit(0.0),
        lambda acc, e: acc
        + F.coalesce(F.element_at(F.col(probe), e["key"]), F.lit(0.0))
        * e["value"],
    )


def main() -> None:
    from pdf_knowledge_extractor_spark.session import get_spark

    spark = get_spark("skew-rescore-ab", cpus=4, shuffle_partitions=8)
    rng = random.Random(11)
    vocab = list(range(200_000))

    def vec(n_terms: int) -> dict[int, float]:
        ks = rng.sample(vocab, n_terms)
        return {k: rng.random() for k in ks}

    # doc1 = big side (iterated by the OLD expression), doc2 = tiny.
    # Ship only the per-doc vectors from the driver; the pair fan-out
    # (and the map replication it implies) happens executor-side via
    # the cross join, exactly like the real rescore's vector joins.
    big = spark.createDataFrame(
        [(f"a_big_{i:04d}", vec(BIG_TERMS)) for i in range(N_BIG)],
        "doc1_id string, m1 map<bigint,double>",
    )
    tiny = spark.createDataFrame(
        [(f"z_tiny_{i:05d}", vec(TINY_TERMS)) for i in range(N_TINY)],
        "doc2_id string, m2 map<bigint,double>",
    )
    joined = (
        big.crossJoin(F.broadcast(tiny))
        .filter(F.xxhash64("doc1_id", "doc2_id") % 2 == 0)
        .repartition(8)
        .persist()
    )
    n = joined.count()

    old_expr = _dot("m1", "m2")
    new_expr = F.when(F.size("m1") <= F.size("m2"), _dot("m1", "m2")).otherwise(
        _dot("m2", "m1")
    )

    def run(expr) -> tuple[float, float]:
        t0 = time.monotonic()
        s = joined.select(F.sum(expr).alias("s")).collect()[0]["s"]
        return time.monotonic() - t0, s

    run(old_expr)  # warm both the cache and codegen
    run(new_expr)
    out = {"pairs": n, "big_terms": BIG_TERMS, "tiny_terms": TINY_TERMS}
    for name, expr in (("old_fixed_m1", old_expr), ("new_min_side", new_expr)):
        times, sums = zip(*(run(expr) for _ in range(REPS)))
        out[name] = {"median_s": sorted(times)[len(times) // 2], "runs": [round(t, 3) for t in times]}
        out.setdefault("checksum", {})[name] = sums[0]
    a, b = out["checksum"]["old_fixed_m1"], out["checksum"]["new_min_side"]
    out["checksum_rel_delta"] = abs(a - b) / abs(a)
    out["speedup"] = round(
        out["old_fixed_m1"]["median_s"] / out["new_min_side"]["median_s"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
