#!/usr/bin/env python3
"""Differential test: the COMPILED Rust reference vs this engine.

Builds tools/rust_diff (which links the actual /root/reference/ner-core
crate), feeds it the 51 fixture texts, and diffs its tokens / per-token
tags / entity spans against ``tests/goldens/goldens.json`` (the pinned
outputs of ner_spark.core).  Reports exact-match counts and span-level
precision/recall per algorithm mode; writes BENCH/RUST_DIFF.md.

Usage:  python tools/rust_diff/compare.py
Exit 0 iff span P/R == 1.0 for every mode and all tokens/tags match.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
GOLDENS = REPO / "tests" / "goldens" / "goldens.json"
CRATE = REPO / "tools" / "rust_diff"
TARGET = os.environ.get("CARGO_TARGET_DIR", "/tmp/ner_target")
CONF_TOL = 1e-9


def esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")


def unesc(s: str) -> str:
    out, it = [], iter(s)
    for c in it:
        if c == "\\":
            n = next(it, None)
            out.append({"n": "\n", "t": "\t", "\\": "\\"}.get(n, "\\" + (n or "")))
        else:
            out.append(c)
    return "".join(out)


def build_and_run(texts: list[str]) -> str:
    env = dict(os.environ, CARGO_TARGET_DIR=TARGET)
    subprocess.run(
        ["cargo", "build", "--release", "--offline"],
        cwd=CRATE, env=env, check=True, capture_output=True,
    )
    inp = Path(TARGET) / "fixture_texts.txt"
    inp.write_text("\n".join(esc(t) for t in texts), encoding="utf-8")
    res = subprocess.run(
        [str(Path(TARGET) / "release" / "ner-dump"), str(inp)],
        check=True, capture_output=True, text=True,
    )
    return res.stdout


def parse_dump(out: str):
    tokens = defaultdict(list)   # (tid, tokmode) -> [(idx, start, end, text)]
    tags = defaultdict(list)     # (tid, algmode) -> [(idx, label, conf)]
    spans = defaultdict(list)    # (tid, algmode) -> [(st, et, sb, eb, cat, conf, src, text)]
    ned = defaultdict(list)      # tid -> [(st, et, orig, resolved, conf)]
    nel = defaultdict(list)      # tid -> [(st, et, resolved, kb_id|None, score)]
    sota = defaultdict(list)     # tid -> [(st, et, sb, eb, class, score, text)]
    for line in out.splitlines():
        f = line.split("\t")
        if f[0] == "TOKEN":
            tokens[(int(f[1]), f[2])].append((int(f[3]), int(f[4]), int(f[5]), unesc(f[6])))
        elif f[0] == "TAG":
            tags[(int(f[1]), f[2])].append((int(f[3]), f[4], float(f[5])))
        elif f[0] == "SPAN":
            spans[(int(f[1]), f[2])].append(
                (int(f[3]), int(f[4]), int(f[5]), int(f[6]), f[7], float(f[8]), f[9], unesc(f[10]))
            )
        elif f[0] == "NED":
            ned[int(f[1])].append((int(f[2]), int(f[3]), f[4], f[5], float(f[6])))
        elif f[0] == "NEL":
            nel[int(f[1])].append(
                (int(f[2]), int(f[3]), f[4], None if f[5] == "-" else f[5], float(f[6]))
            )
        elif f[0] == "SOTA":
            sota[int(f[1])].append(
                (int(f[2]), int(f[3]), int(f[4]), int(f[5]), f[6], float(f[7]), unesc(f[8]))
            )
    return tokens, tags, spans, ned, nel, sota


# f32-vs-f64 tolerance: the reference computes NED/NEL/SOTA scores in
# f32 (e.g. f32(0.8)+f32(0.15) prints 0.949999988079); the engine uses
# doubles (NED/NEL) or replicated-f32 numpy (SOTA).
SCORE_TOL = 1e-6


def engine_ned_nel(texts: list[str]):
    """Run the engine's Spark NED/NEL operators over the fixture texts
    (hybrid tagger → disambiguate → link_mentions, the composition of
    ner-web/src/main.rs:217-236) and key results by (tid, span)."""
    import hashlib

    from pyspark.sql import SparkSession

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as em
    from ner_spark.operators.link import disambiguate, link_mentions
    from ner_spark.operators.tag import extract_mentions
    from ner_spark.schemas import SOURCE_SCHEMA

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("ner-rust-diff")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    em._ensure_pkg(spark)
    rows = [
        (f"r{tid}", f"t/{tid}.txt", "c", "pt", text,
         hashlib.sha256(text.encode("utf-8")).hexdigest())
        for tid, text in enumerate(texts)
    ]
    source = spark.createDataFrame(rows, SOURCE_SCHEMA)
    linked = link_mentions(disambiguate(extract_mentions(source))).select(
        "path", "start_token", "end_token", "category",
        "resolved_category", "ned_confidence", "kb_id", "link_score"
    ).collect()
    spark.stop()
    ned = defaultdict(list)
    nel = defaultdict(list)
    for r in linked:
        tid = int(r.path.split("/")[1].split(".")[0])
        ned[tid].append((r.start_token, r.end_token, r.category,
                         r.resolved_category, r.ned_confidence))
        nel[tid].append((r.start_token, r.end_token, r.resolved_category,
                         r.kb_id, r.link_score))
    return ned, nel


def engine_sota(texts: list[str]):
    """The engine's GLiNER-simulator kernel on the same raw-text tokens
    the reference handler uses (tokenize → simulate_gliner)."""
    sys.path.insert(0, str(REPO))
    from ner_spark.core.sota import simulate_gliner
    from ner_spark.core.tokenizer import tokenize

    out = defaultdict(list)
    for tid, text in enumerate(texts):
        toks = tokenize(text, "standard")
        for t, cat, st, et, sb, eb, conf in simulate_gliner(
            toks, ["Pessoa", "Local", "Organizacao", "Data"],
            threshold=0.5, max_span_length=4,
        ):
            out[tid].append((st, et, sb, eb, cat, conf, t))
    return out


def diff_scored(ours: dict, ref: dict, n_texts: int, score_idx, label: str,
                mismatches: list[str]):
    """Order-insensitive diff: score fields match within ``SCORE_TOL``,
    everything else exactly; returns (matched, ours_total, ref_total).

    Rows may carry None fields (an unlinked NEL mention has
    kb_id=None), so sorting uses a None-safe key, and scores compare
    by |delta| <= tol rather than fixed-decimal quantization (which
    would flag two scores a nano apart that straddle a bucket edge)."""
    ok = o_n = r_n = 0
    idxs = (score_idx,) if isinstance(score_idx, int) else tuple(score_idx)

    def nkey(row):
        return tuple((v is None, v) for v in row)

    def close(x, y):
        if len(x) != len(y):
            return False
        return all(
            (a is not None and b is not None and abs(a - b) <= SCORE_TOL)
            if i in idxs else a == b
            for i, (a, b) in enumerate(zip(x, y))
        )

    for tid in range(n_texts):
        a = sorted(ours.get(tid, []), key=nkey)
        b = sorted(ref.get(tid, []), key=nkey)
        o_n += len(a)
        r_n += len(b)
        rest = list(b)
        for r in a:
            hit = next((j for j, s in enumerate(rest) if close(r, s)), None)
            if hit is not None:
                rest.pop(hit)
                ok += 1
            elif len(mismatches) < 80:
                mismatches.append(f"{label} tid={tid} ours-only: {r}")
        for s in rest:
            if len(mismatches) < 80:
                mismatches.append(f"{label} tid={tid} ref-only: {s}")
    return ok, o_n, r_n


def main() -> int:
    goldens = json.loads(GOLDENS.read_text(encoding="utf-8"))
    texts = [r["text"] for r in goldens]
    r_tokens, r_tags, r_spans, r_ned, r_nel, r_sota = parse_dump(build_and_run(texts))

    tok_ok = tok_n = 0
    tag_ok = tag_n = 0
    per_mode = defaultdict(lambda: [0, 0, 0])  # mode -> [match, ours, ref]
    mismatches: list[str] = []

    for tid, rec in enumerate(goldens):
        for tmode, toks in rec["tokens"].items():
            ours = [(i, int(s), int(e), t) for i, (t, s, e) in enumerate(toks)]
            ref = sorted(r_tokens.get((tid, tmode), []))
            tok_n += max(len(ours), len(ref))
            tok_ok += sum(1 for a, b in zip(ours, ref) if a == b)
            if ours != ref and len(mismatches) < 20:
                mismatches.append(f"TOKEN tid={tid} mode={tmode}: {ours[:3]} vs {ref[:3]}")
        for mode, md in rec["modes"].items():
            ours_tags = [(i, t, round(c, 9)) for i, (t, c) in enumerate(md["tags"])]
            ref_tags = sorted(r_tags.get((tid, mode), []))
            tag_n += max(len(ours_tags), len(ref_tags))
            for a, b in zip(ours_tags, ref_tags):
                if a[0] == b[0] and a[1] == b[1] and abs(a[2] - b[2]) <= CONF_TOL:
                    tag_ok += 1
                elif len(mismatches) < 40:
                    mismatches.append(f"TAG tid={tid} mode={mode}: {a} vs {b}")
            ours_sp = {
                (st, et, sb, eb, cat, src, t)
                for t, cat, st, et, sb, eb, _c, src in md["spans"]
            }
            ref_sp = {
                (st, et, sb, eb, cat, src, t)
                for st, et, sb, eb, cat, _c, src, t in r_spans.get((tid, mode), [])
            }
            m = per_mode[mode]
            m[0] += len(ours_sp & ref_sp)
            m[1] += len(ours_sp)
            m[2] += len(ref_sp)
            for d in sorted(ours_sp ^ ref_sp):
                if len(mismatches) < 60:
                    side = "ours-only" if d in ours_sp else "ref-only"
                    mismatches.append(f"SPAN tid={tid} mode={mode} {side}: {d}")

    e_ned, e_nel = engine_ned_nel(texts)
    e_sota = engine_sota(texts)
    ned_ok, ned_o, ned_r = diff_scored(e_ned, r_ned, len(texts), 4, "NED", mismatches)
    nel_ok, nel_o, nel_r = diff_scored(e_nel, r_nel, len(texts), 4, "NEL", mismatches)
    sota_ok, sota_o, sota_r = diff_scored(e_sota, r_sota, len(texts), 5, "SOTA", mismatches)

    lines = ["# RUST_DIFF — engine vs compiled Rust reference", ""]
    lines.append(f"- texts: {len(goldens)} (41 corpus + 10 demo), tokenizer modes: 5, algorithm modes: 8")
    lines.append(f"- tokens exact-match: {tok_ok}/{tok_n}")
    lines.append(f"- per-token tags exact-match (label + conf@1e-9): {tag_ok}/{tag_n}")
    lines.append(f"- NED (hybrid → ned::disambiguate, Spark operator vs binary): {ned_ok}/{max(ned_o, ned_r)} exact (resolved tag + conf@1e-6)")
    lines.append(f"- NEL (→ KnowledgeBase::link, Spark operator vs binary): {nel_ok}/{max(nel_o, nel_r)} exact (kb_id + score@1e-6)")
    lines.append(f"- GLiNER simulator (simulate_gliner, kernel vs binary): {sota_ok}/{max(sota_o, sota_r)} exact (class + span + score@1e-6)")
    lines.append("")
    lines.append("| mode | matched spans | ours | reference | precision | recall |")
    lines.append("|---|---|---|---|---|---|")
    all_ok = (tok_ok == tok_n and tag_ok == tag_n
              and ned_ok == ned_o == ned_r
              and nel_ok == nel_o == nel_r
              and sota_ok == sota_o == sota_r)
    for mode in sorted(per_mode):
        m, o, r = per_mode[mode]
        p = m / o if o else 1.0
        rc = m / r if r else 1.0
        all_ok = all_ok and p == 1.0 and rc == 1.0
        lines.append(f"| {mode} | {m} | {o} | {r} | {p:.4f} | {rc:.4f} |")
    lines.append("")
    if mismatches:
        lines.append("## Mismatches (first 60)")
        lines += [f"- {m}" for m in mismatches]
    else:
        lines.append("No mismatches: every token, tag and span is identical to the compiled reference binary.")
    report = "\n".join(lines) + "\n"
    (REPO / "BENCH" / "RUST_DIFF.md").write_text(report, encoding="utf-8")
    print(report)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
