"""Streaming ingest: incremental file pickup, exactly-once restart."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ner_spark.sources.fixtures import source_table  # noqa: E402
from ner_spark.streaming.ingest import stream_mentions  # noqa: E402


def _land(spark, tmp, n_rows, sub):
    src = source_table(spark, n_rows=n_rows).coalesce(1)
    src.write.mode("overwrite").parquet(f"{tmp}/landing/{sub}")
    # move files into the watched dir as a new batch
    import glob
    import os
    import shutil

    os.makedirs(f"{tmp}/in", exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(f"{tmp}/landing/{sub}/*.parquet"))):
        shutil.copy(f, f"{tmp}/in/{sub}-{i}.parquet")


def test_stream_drains_and_resumes(spark, tmp_path):
    tmp = str(tmp_path)
    _land(spark, tmp, 20, "a")
    q = stream_mentions(spark, f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt")
    q.awaitTermination(120)
    first = spark.read.parquet(f"{tmp}/out").count()
    assert first > 0

    # second drain with no new files: checkpoint prevents reprocessing
    q = stream_mentions(spark, f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt")
    q.awaitTermination(120)
    assert spark.read.parquet(f"{tmp}/out").count() == first

    # new files are picked up incrementally
    _land(spark, tmp, 40, "b")
    q = stream_mentions(spark, f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt")
    q.awaitTermination(120)
    after = spark.read.parquet(f"{tmp}/out").count()
    assert after > first
