"""Driver-contract tests: every ``__spark_entry__.queries()`` entry runs,
and every ``oracle_sql()`` twin matches it value-for-value via DuckDB
(the same check the driver performs at sf0.01, here at sf0.001 for
speed)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


from tests.oracle_compare import assert_df_matches_duckdb  # noqa: E402

ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


def test_oracle_keys_subset_of_queries():
    assert set(ORACLE_KEYS) <= set(entrymod.queries().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    assert_df_matches_duckdb(
        q(spark, SF_DIR), ddb, entrymod.oracle_sql()[name], name=name
    )


ROWS_ONLY = sorted(set(entrymod.queries().keys()) - set(ORACLE_KEYS))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"subj", "pred", "obj", "evidence_count"} <= set(df.columns)


def test_stable_round6_python_twin_matches_spark(spark):
    """The goldens-oracle quantizer (`_stable_round6`) must be an exact
    twin of `functions.text.stable_round(col, 6)`.  Spark's Round is
    BigDecimal.valueOf(d) — the SHORTEST double repr — so the twin must
    quantize Decimal(repr(x)), not Decimal(x): the two diverge for
    doubles within half an ULP of a 7th-decimal .5 boundary, like the
    crafted value below (exact binary 0.12345649999..., repr
    0.1234565 → HALF_UP gives 0.123457)."""
    from pyspark.sql import functions as F

    from ner_spark.functions.text import stable_round

    vals = [0.1234565 - 1e-9, 0.9999995 - 1e-9, 0.0, 1.0,
            0.123456, 0.1234564, 0.1234566, 0.87, 1e-7, 0.5 - 1e-9]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r.q for r in df.select(
            stable_round(F.col("x"), 6).alias("q")
        ).collect()
    ]
    expect = [entrymod._stable_round6(v) for v in vals]
    assert got == expect
