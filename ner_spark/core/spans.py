"""BIO tag sequences → entity spans.

Two FSMs with deliberately different edge rules (both exist in the
reference and are used on different paths):

- :func:`tokens_to_spans` (reference: ner-core/src/tagger.rs:233-282):
  only ``B-`` starts a span; orphan ``I-`` is dropped; ``end_token``
  inclusive; text = byte-slice of the original, trimmed.
- :func:`bio_to_spans` (reference: ner-core/src/span.rs:248-291):
  tolerant — orphan ``I-`` and category switches start new spans;
  ``end`` exclusive; label without B-/I- prefix.
"""

from __future__ import annotations

from ner_spark.core.tokenizer import Token

# (text, category, start_token, end_token, start, end, confidence, source)
EntitySpan = tuple[str, str, int, int, int, int, float, str]


def tokens_to_spans(
    tokens: list[Token],
    tags: list[str],
    confidences: list[float],
    original_text: str,
    source: str = "crf",
) -> list[EntitySpan]:
    tb = original_text.encode("utf-8")
    spans: list[EntitySpan] = []
    n = len(tokens)
    i = 0
    while i < n:
        tag = tags[i]
        if tag.startswith("B-"):
            cat = tag[2:]
            start_token = i
            start_byte = tokens[i][1]
            end_token = i
            end_byte = tokens[i][2]
            conf_sum = confidences[i]
            count = 1
            j = i + 1
            while j < n and tags[j] == f"I-{cat}":
                end_token = j
                end_byte = tokens[j][2]
                conf_sum += confidences[j]
                count += 1
                j += 1
            entity_text = tb[start_byte:end_byte].decode("utf-8").strip()
            spans.append(
                (entity_text, cat, start_token, end_token, start_byte, end_byte,
                 conf_sum / count, source)
            )
            i = j
        else:
            i += 1
    return spans


def bio_to_spans(tags: list[str]) -> list[tuple[int, int, str]]:
    """(start, end_exclusive, label) spans from BIO labels."""
    spans: list[tuple[int, int, str]] = []
    current_start: int | None = None
    current_label: str | None = None

    for i, tag in enumerate(tags):
        if tag.startswith("B-"):
            if current_start is not None:
                spans.append((current_start, i, current_label))  # type: ignore[arg-type]
            current_start = i
            current_label = tag[2:]
        elif tag.startswith("I-"):
            if current_label is not None:
                if tag[2:] != current_label:
                    spans.append((current_start, i, current_label))  # type: ignore[arg-type]
                    current_start = i
                    current_label = tag[2:]
            else:
                current_start = i
                current_label = tag[2:]
        else:
            if current_start is not None:
                spans.append((current_start, i, current_label))  # type: ignore[arg-type]
                current_start = None
                current_label = None

    if current_start is not None:
        spans.append((current_start, len(tags), current_label))  # type: ignore[arg-type]
    return spans
