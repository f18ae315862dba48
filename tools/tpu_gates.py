"""Run the real-TPU regression gates and commit the evidence.

``RUN_TPU_TESTS=1 pytest tests/test_tpu.py`` validates Mosaic lowering
and XLA-TPU numerics on the attached chip (interpret-mode tests cover
semantics only — tests/test_tpu.py docstring). This wrapper runs that
suite and records per-gate pass/fail + timings into TPU_GATES.json so
hardware validation is visible in-repo (VERDICT r2 task 2).

Usage:  python tools/tpu_gates.py [--out TPU_GATES.json]

Serialize with any other TPU use — the chip is single-tenant.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TPU_GATES.json")
    args = ap.parse_args()

    env = dict(os.environ, RUN_TPU_TESTS="1")
    report = os.path.abspath("/tmp/tpu_gates_report.json")
    t0 = time.time()
    proc = subprocess.run(
        [
            sys.executable, "-m", "pytest", "tests/test_tpu.py", "-q",
            "--json-report", f"--json-report-file={report}",
        ],
        env=env, capture_output=True, text=True,
    )
    has_json = os.path.exists(report)
    if not has_json:
        # pytest-json-report not installed: fall back to -rA parsing.
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_tpu.py", "-q",
             "-rA", "--durations=0"],
            env=env, capture_output=True, text=True,
        )
    elapsed = time.time() - t0

    gates = []
    if has_json:
        with open(report) as f:
            rep = json.load(f)
        for t in rep.get("tests", []):
            gates.append({
                "gate": t["nodeid"].split("::")[-1],
                "outcome": t["outcome"],
                "seconds": round(
                    sum(
                        t.get(k, {}).get("duration", 0.0)
                        for k in ("setup", "call", "teardown")
                    ), 2,
                ),
            })
    else:
        for line in proc.stdout.splitlines():
            for mark, outcome in (
                ("PASSED", "passed"), ("FAILED", "failed"),
                ("SKIPPED", "skipped"), ("ERROR", "error"),
            ):
                if line.startswith(mark) and "test_tpu.py" in line:
                    gates.append({
                        "gate": line.split("::")[-1].strip(),
                        "outcome": outcome,
                    })

    import datetime

    out = {
        "suite": "tests/test_tpu.py (RUN_TPU_TESTS=1, real chip)",
        "date": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%d"),
        "returncode": proc.returncode,
        "all_passed": proc.returncode == 0,
        "elapsed_s": round(elapsed, 1),
        "gates": gates,
        "tail": proc.stdout.strip().splitlines()[-2:],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
