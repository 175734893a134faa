"""Freeze golden tokens/tags/spans for the fixture texts.

Runs the engine's per-document kernel over all 41 corpus sentences +
10 demo texts, every algorithm mode (standard tokenizer) and every
tokenizer mode, and writes ``tests/goldens/goldens.json``.

These goldens pin the reference-parity semantics (FIXTURES.md §2/§4);
any behavioural drift in the kernels fails ``tests/test_goldens.py``.

Regenerate (only after deliberate semantic review):
    python tools/gen_goldens.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ner_spark.core.pipeline import MODES, analyze  # noqa: E402
from ner_spark.core.tokenizer import MODES as TOKENIZER_MODES, tokenize  # noqa: E402
from ner_spark.data.corpus import CORPUS, DEMO_TEXTS  # noqa: E402


def fixture_texts() -> list[tuple[int, str, str]]:
    """(text_id, source, text) for corpus sentences then demo texts."""
    out = [(i, "corpus", text) for i, (text, _domain, _ann) in enumerate(CORPUS)]
    base = len(out)
    out += [(base + i, f"demo:{dom}", text) for i, (dom, text) in enumerate(DEMO_TEXTS)]
    return out


def generate() -> list[dict]:
    records = []
    for text_id, source, text in fixture_texts():
        tokens = {
            tm: [[t, s, e] for t, s, e in tokenize(text, tm)]
            for tm in TOKENIZER_MODES
        }
        modes = {}
        for mode in MODES:
            tagged, entities = analyze(text, mode=mode)
            modes[mode] = {
                "tags": [[tag, round(conf, 12)] for _tok, tag, conf in tagged],
                "spans": [
                    [t, cat, st, et, sb, eb, round(conf, 12), src]
                    for t, cat, st, et, sb, eb, conf, src in entities
                ],
            }
        records.append(
            {"text_id": text_id, "source": source, "text": text,
             "tokens": tokens, "modes": modes}
        )
    return records


if __name__ == "__main__":
    out_path = Path(__file__).resolve().parents[1] / "tests" / "goldens" / "goldens.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    records = generate()
    out_path.write_text(json.dumps(records, ensure_ascii=False, indent=1))
    n_spans = sum(len(r["modes"][m]["spans"]) for r in records for m in r["modes"])
    print(f"wrote {out_path}: {len(records)} texts, {n_spans} spans total")
