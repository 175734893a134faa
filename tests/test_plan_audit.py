"""The physical-plan audit is a regression gate, not a report: every
scale-critical plan property (distributed heap top-k, pushdown/pruning,
broadcastability, salted CC join, partition pruning of the committed
triple table, IVF cell balance) is asserted by ``tools/plan_audit.py``,
and this test runs it as part of the suite so a plan regression fails
CI instead of waiting for a human to re-read BENCH/PLANS.md.

Runs in a subprocess: the audit owns its own SparkSession (local[4])
and stops it on exit, which must not tear down the suite's shared
session.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plan_audit_all_green():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plan_audit.py")],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")},
    )
    fails = [ln for ln in proc.stdout.splitlines() if ln.startswith("FAIL")]
    assert proc.returncode == 0 and not fails, (
        f"plan audit failed (rc={proc.returncode}):\n"
        + "\n".join(fails or proc.stdout.splitlines()[-20:])
        + "\n--- stderr tail ---\n" + "\n".join(proc.stderr.splitlines()[-10:])
    )
