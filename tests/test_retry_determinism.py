"""Task-retry determinism gate (r8 verdict item 2) — pytest wrapper.

Spark re-executes failed/speculated tasks; any value that differs
between a task's first attempt and its re-execution silently corrupts
results on a real cluster.  ``tools/retry_gate.py`` injects a genuine
task failure into every scan (raise on ``TaskContext.attemptNumber()
== 0`` under ``local[8, 3]``) and replays the retried attempt with
REVERSED partition rows, then asserts the flagship tie-sensitive
queries produce byte-identical snapshots to a clean run.

The gate needs ``spark.task.maxFailures > 1``, which only the
``local[N, F]`` master form provides — it cannot share the suite's
``local[*]`` session, so it runs as one subprocess here (the runner
amortizes a single Spark startup across all targets plus the
negative control that proves the injection fires).
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

TARGETS = [
    "group_maxby",
    "flowerpot",
    "kmeans_clusters",
    "weighted_sample_docs",
    "dedup_keep_best",
]


@pytest.fixture(scope="module")
def gate_output():
    env = dict(os.environ, PYTHONPATH=ROOT)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "retry_gate.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    # keep stderr out of the assertion surface (Spark banner noise) but
    # surface it on failure for diagnosis
    return proc.returncode, proc.stdout, proc.stderr[-2000:]


def test_retry_gate_exit_green(gate_output):
    code, out, err = gate_output
    assert code == 0, f"retry gate failed:\n{out}\n{err}"


def test_retry_gate_negative_control_fired(gate_output):
    """The order-sensitive probe MUST diverge under chaos — otherwise
    the injection never fired and every PASS is vacuous."""
    _, out, err = gate_output
    assert "RETRYGATE [retry] control PASS" in out, f"{out}\n{err}"


@pytest.mark.parametrize("name", TARGETS)
def test_retry_identical(gate_output, name):
    _, out, err = gate_output
    assert f"RETRYGATE [retry] {name} PASS" in out, f"{out}\n{err}"
