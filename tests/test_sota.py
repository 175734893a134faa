"""GLiNER simulator parity with the reference semantics
(ner-core/src/sota_2024.rs:86-177)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ner_spark.core.sota import (  # noqa: E402
    get_class_embedding,
    get_span_embedding,
    simulate_gliner,
)
from ner_spark.core.tokenizer import tokenize  # noqa: E402

CLASSES = ["Pessoa", "Local", "Organizacao", "Data"]


def test_class_embeddings():
    assert get_class_embedding("pessoa") == (0.9, 0.1, 0.2, 0.0, -0.4)
    assert get_class_embedding("PER") == (0.9, 0.1, 0.2, 0.0, -0.4)
    assert get_class_embedding("unknown-thing") == (0.0, 0.0, 0.0, 0.0, 0.0)


def test_span_trigger_priority():
    # "paris hilton" matches the person trigger (checked before "paris")
    assert get_span_embedding("Paris Hilton")[0] == 0.85
    assert get_span_embedding("paris")[1] == 0.88


def test_lula_is_pessoa():
    toks = tokenize("Lula visitou Paris ontem")
    preds = simulate_gliner(toks, CLASSES, threshold=0.5, max_span_length=4)
    by_text = {p[0]: p[1] for p in preds}
    assert by_text.get("Lula") == "Pessoa"
    assert by_text.get("ontem") == "Data"
    # NMS keeps the first enumerated tie: "visitou Paris" (span 1..2)
    # beats the single-token "Paris" at equal score — reference stable
    # sort_by parity (sota_2024.rs:152-174)
    assert by_text.get("visitou Paris") == "Local"


def test_nms_drops_overlaps():
    toks = tokenize("Lula Silva chegou")
    preds = simulate_gliner(toks, CLASSES, threshold=0.5, max_span_length=4)
    # every token covered by at most one prediction
    used: set[int] = set()
    for _t, _c, st, et, _sb, _eb, _conf in preds:
        span = set(range(st, et + 1))
        assert not (span & used)
        used |= span


def test_threshold_filters_everything():
    toks = tokenize("Lula visitou Paris")
    assert simulate_gliner(toks, CLASSES, threshold=0.99) == []
    assert simulate_gliner(toks, ["UnknownClass"], threshold=0.1) == []


def test_empty_inputs():
    assert simulate_gliner([], CLASSES) == []
    assert simulate_gliner(tokenize("Lula"), []) == []


def test_byte_offsets():
    text = "Ontem São Lula falou"
    toks = tokenize(text)
    preds = simulate_gliner(toks, CLASSES, threshold=0.5, max_span_length=1)
    for t, _c, st, et, sb, eb, _conf in preds:
        if st == et:  # single-token span text == byte slice
            assert text.encode("utf-8")[sb:eb].decode("utf-8") == t


def test_spark_operator(spark):
    from ner_spark.operators.sota import sota_predictions
    from ner_spark.sources.fixtures import source_table

    df = sota_predictions(source_table(spark, n_rows=24))
    rows = df.collect()
    assert rows
    cats = {r.category for r in rows}
    assert cats <= {"Pessoa", "Local", "Organizacao", "Data"}
    assert all(r.confidence > 0.5 for r in rows)
