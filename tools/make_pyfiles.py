#!/usr/bin/env python
"""Package ner_spark into a --py-files zip for spark-submit.

Usage::

    python tools/make_pyfiles.py [out.zip]     # default: dist/ner_spark.zip
    spark-submit --py-files dist/ner_spark.zip tools/run_job.py \
        --fixture-rows 120 --output /tmp/kg
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "ner_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "ner_spark.zip")
    print(build(out))
