#!/usr/bin/env python3
"""Measure incremental update vs full recompute (BENCH/UPDATE.md).

Four timings over the same committed base:
  1. run(base)                      — full pipeline
  2. update(additive 2% delta)     — canon increment + merge fast path
  3. update(reassigning delta)     — canon increment + DIFFERENTIAL
                                     materialize (a 1-doc delta that
                                     renames an existing component)
  4. update(additive, incremental=False, merge_materialize=False)
                                   — full derived-stage recompute, the
                                     pre-incremental worst case

Run pinned for honest per-core numbers:
    taskset -c 0-7 python tools/update_bench.py
"""

import hashlib
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from ner_spark.plans.job import KgJob  # noqa: E402
from ner_spark.schemas import SOURCE_SCHEMA  # noqa: E402
from ner_spark.session import get_spark  # noqa: E402
from ner_spark.sources.fixtures import bench_source  # noqa: E402


def main() -> None:
    spark = get_spark("update-bench", master="local[8]", shuffle_partitions=16)
    src = bench_source(spark, "/root/testdata/sf0.1", mult=48).localCheckpoint(
        eager=True
    )
    n_base = src.count()

    # disjoint additive delta: 2% of the corpus re-keyed to new (repo, path)
    def sampled_delta(tag: str):
        return (
            src.sample(0.02, seed=7)
            .withColumn("path", F.concat("path", F.lit(f"@{tag}")))
            .withColumn("content", F.concat("content", F.lit(f" delta{tag}")))
            .withColumn("content_sha256", F.sha2("content", 256))
            .localCheckpoint(eager=True)
        )

    delta_add = sampled_delta("d1")
    n_delta = delta_add.count()

    # reassigning delta: the mention "B" links to Q155 and renames the
    # large KB-linked component (canonical surface "b" sorts first),
    # forcing the differential materialize over every doc that mentions
    # a surface of that component
    text = "O presidente visitou B."
    delta_re = spark.createDataFrame(
        [("repoX", "docs/delta-re/0.txt", "c" * 40, "pt", text,
          hashlib.sha256(text.encode()).hexdigest())], SOURCE_SCHEMA)

    out = tempfile.mkdtemp() + "/kg"
    job = KgJob(spark, out, run_id="base")
    job.prewarm()
    t0 = time.perf_counter()
    job.run(src)
    base_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    KgJob(spark, out, run_id="upd").update(delta_add, update_id="d1")
    merge_s = time.perf_counter() - t0

    # guard LIFTED (threshold=inf): at this corpus the rename's
    # link-row blast radius is ~2/3 of the table (the renamed
    # component holds the most-linked surfaces), so the default guard
    # correctly takes the full recompute — lifting it is how the
    # differential path itself gets timed
    t0 = time.perf_counter()
    KgJob(spark, out, run_id="upd-re").update(
        delta_re, update_id="d-re",
        differential_threshold=float("inf"),
    )
    diff_s = time.perf_counter() - t0
    m = KgJob(spark, out, run_id="m").metrics()
    affected = m.where(
        (F.col("run_id") == "upd-re")
        & (F.col("stage") == "materialize_differential")
    ).collect()
    affected_docs = int(affected[0].rows_out) if affected else -1

    t0 = time.perf_counter()
    KgJob(spark, out, run_id="upd-full").update(
        sampled_delta("d3"), update_id="d3",
        incremental=False, merge_materialize=False,
    )
    full_derived_s = time.perf_counter() - t0

    # major compaction: fold the 3 deltas back into the base tables
    # (one full mention+link rewrite — the amortized cost ceiling)
    cjob = KgJob(spark, out, run_id="cmp")
    t0 = time.perf_counter()
    n_folded = cjob.compact()
    compact_s = time.perf_counter() - t0

    print(json.dumps({
        "n_base": n_base, "n_delta_additive": n_delta,
        "base_run_sec": round(base_s, 2),
        "update_merge_sec": round(merge_s, 2),
        "update_differential_sec": round(diff_s, 2),
        "differential_affected_docs": affected_docs,
        "update_full_derived_sec": round(full_derived_s, 2),
        "docs_ratio": round(n_delta / n_base, 4),
        "merge_time_ratio": round(merge_s / base_s, 4),
        "differential_time_ratio": round(diff_s / base_s, 4),
        "compact_sec": round(compact_s, 2),
        "compact_folded": n_folded,
    }))


if __name__ == "__main__":
    main()
