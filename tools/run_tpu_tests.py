# -*- coding: utf-8 -*-
"""
Run the on-hardware (tests_tpu/) tier and record the outcome in
TPU_TESTS.json at the repo root. bench.py folds this artifact into its
JSON line so each round's bench record carries the hardware-tier result.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/run_tpu_tests.py

"""

import json
import pathlib
import re
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main():
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", str(ROOT / "tests_tpu"), "-q",
         "--no-header", "-p", "no:cacheprovider"],
        cwd=ROOT, capture_output=True, text=True, timeout=3600,
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-5:])
    counts = dict.fromkeys(("passed", "failed", "skipped", "error"), 0)
    for n, what in re.findall(r"(\d+) (passed|failed|skipped|error)", tail):
        counts[what] = int(n)
    record = {
        "ok": proc.returncode == 0 and counts["passed"] > 0,
        "returncode": proc.returncode,
        **counts,
        "seconds": round(time.time() - t0, 1),
        "summary": tail.splitlines()[-1] if tail else "",
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    (ROOT / "TPU_TESTS.json").write_text(json.dumps(record, indent=1))
    print(json.dumps(record))
    sys.exit(0 if record["ok"] else 1)


if __name__ == "__main__":
    main()
