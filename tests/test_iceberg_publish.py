"""Iceberg publication path: the deploy-time bridge from the parquet +
sidecar checkpoint protocol to an atomic table-format commit.

This container has no Iceberg runtime jars, so the meaningful local
assertions are the guard rails: availability is probed up front, the
failure is a clear deployment recipe (not a ClassNotFoundException mid
write), and nothing is mutated on the refused path.  The real publish
test is skipif-gated on the probe and runs wherever the jars exist
(spark-submit --packages org.apache.iceberg:iceberg-spark-runtime).
"""

from __future__ import annotations

import pytest

from ner_spark.plans.job import KgJob, iceberg_available
from ner_spark.sources.fixtures import source_table


def test_publish_refuses_without_runtime(spark, tmp_path):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present; the refusal path is moot here")
    out = str(tmp_path / "kg")
    job = KgJob(spark, out, run_id="pub")
    job.run(source_table(spark, n_rows=24))
    before = sorted(map(tuple, job.metrics().collect()))
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        job.publish_iceberg("iceberg.kg.triples")
    # refusal happens before any write: metrics (and the checkpoints the
    # publish reads) are untouched
    assert sorted(map(tuple, job.metrics().collect())) == before


def test_publish_requires_committed_triples(spark, tmp_path):
    job = KgJob(spark, str(tmp_path / "empty"), run_id="pub2")
    if not iceberg_available(spark):
        # the availability guard fires first in jar-less environments
        with pytest.raises(RuntimeError, match="Iceberg runtime"):
            job.publish_iceberg("iceberg.kg.triples")
    else:
        with pytest.raises(ValueError, match="no committed materialize"):
            job.publish_iceberg("iceberg.kg.triples")


def test_publish_roundtrip_with_runtime(spark, tmp_path):
    """Deploy-environment test: publish, then read the snapshot back
    through the catalog and compare to the committed checkpoint.
    Skips wherever the Iceberg runtime is absent (this container)."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jars not on the classpath "
                    "(deploy-environment test)")
    out = str(tmp_path / "kg")
    job = KgJob(spark, out, run_id="pub3")
    triples = job.run(source_table(spark, n_rows=24))
    job.publish_iceberg("iceberg.kg.triples_test")
    back = spark.read.table("iceberg.kg.triples_test")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, triples.collect()))
