#!/usr/bin/env python3
"""Measure incremental update vs full recompute (BENCH/UPDATE.md).

Run pinned for honest per-core numbers:
    taskset -c 0-7 python tools/update_bench.py
"""

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from ner_spark.plans.job import KgJob  # noqa: E402
from ner_spark.session import get_spark  # noqa: E402
from ner_spark.sources.fixtures import bench_source  # noqa: E402


def main() -> None:
    spark = get_spark("update-bench", master="local[8]", shuffle_partitions=16)
    src = bench_source(spark, "/root/testdata/sf0.1", mult=48).localCheckpoint(
        eager=True
    )
    n_base = src.count()

    # disjoint delta: 2% of the corpus re-keyed to new (repo, path)
    delta = (
        src.sample(0.02, seed=7)
        .withColumn("path", F.concat("path", F.lit("@d1")))
        .withColumn("content", F.concat("content", F.lit(" delta1")))
        .withColumn("content_sha256", F.sha2("content", 256))
        .localCheckpoint(eager=True)
    )
    n_delta = delta.count()

    out = tempfile.mkdtemp() + "/kg"
    job = KgJob(spark, out, run_id="base")
    job.prewarm()
    t0 = time.perf_counter()
    job.run(src)
    base_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    KgJob(spark, out, run_id="upd").update(delta, update_id="d1")
    upd_s = time.perf_counter() - t0

    print(json.dumps({
        "n_base": n_base, "n_delta": n_delta,
        "base_run_sec": round(base_s, 2), "update_sec": round(upd_s, 2),
        "docs_ratio": round(n_delta / n_base, 4),
        "time_ratio": round(upd_s / base_s, 4),
    }))


if __name__ == "__main__":
    main()
