"""Task-retry correctness under injected failures (verdict r8 ask #5).

The reference's per-file error isolation (``main.cc:267-271``) maps at
cluster scale to the scheduler retrying a failed task. These tests run
tests/chaos_script.py in a SUBPROCESS (it needs a ``local[8, 4]`` master —
maxFailures=4 — which the shared session fixture does not have) and assert
that a first-attempt-only failure injected into the scan stage leaves the
results of a shuffle-heavy key (dedup_exact) and an iterative
persisted-frame key (graph_pagerank_iterations) hash-identical to the
clean run, with the retry demonstrably observed.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_task_retry_correctness():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "chaos_script.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-6:])
    assert proc.returncode == 0, (
        f"chaos script failed (rc={proc.returncode}):\n{tail}\n"
        f"stderr tail:\n{chr(10).join(proc.stderr.splitlines()[-10:])}"
    )
    assert "chaos: 2/2 keys retry-correct" in proc.stdout, tail
