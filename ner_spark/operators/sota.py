"""Zero-shot span×class predictions (GLiNER simulator) as a stage.

Spark mapping of SURVEY.md §2.8 G1: ``mapInPandas`` over the source
table, per-doc span enumeration + keyword-triggered embeddings + greedy
NMS from :mod:`ner_spark.core.sota`.  Free-form ``category`` strings
(the reference's zero-shot surface) — the one place the engine's
closed 4-category domain is open (SURVEY §1.3).

The web layer's defaults are threshold 0.5 and max span 4
(reference: ner-web/src/main.rs:258).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType, IntegerType, StringType, StructField, StructType,
)

SOTA_SCHEMA = StructType([
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("mention_text", StringType()),
    StructField("category", StringType()),
    StructField("start_token", IntegerType()),
    StructField("end_token", IntegerType()),
    StructField("start", IntegerType()),
    StructField("end", IntegerType()),
    StructField("confidence", DoubleType()),
])

DEFAULT_CLASSES = ("Pessoa", "Local", "Organizacao", "Data")


def sota_predictions(
    source: DataFrame,
    user_classes: tuple[str, ...] = DEFAULT_CLASSES,
    threshold: float = 0.5,
    max_span_length: int = 4,
    tokenizer_mode: str = "standard",
) -> DataFrame:
    narrow = source.select("repo", "path", "content")
    classes = list(user_classes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ner_spark.core.sota import simulate_gliner
        from ner_spark.core.tokenizer import tokenize

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in SOTA_SCHEMA.fields}
            for repo, path, content in zip(pdf["repo"], pdf["path"], pdf["content"]):
                if content is None:
                    continue
                preds = simulate_gliner(
                    tokenize(content, tokenizer_mode), classes,
                    threshold=threshold, max_span_length=max_span_length,
                )
                for text, cat, st, et, sb, eb, conf in preds:
                    out["repo"].append(repo)
                    out["path"].append(path)
                    out["mention_text"].append(text)
                    out["category"].append(cat)
                    out["start_token"].append(st)
                    out["end_token"].append(et)
                    out["start"].append(sb)
                    out["end"].append(eb)
                    out["confidence"].append(conf)
            if out["repo"]:
                yield pd.DataFrame(out)

    return narrow.mapInPandas(run, schema=SOTA_SCHEMA)
