"""Stamp measurement provenance onto a bench.py JSON line.

Usage: python tools/stamp_bench_artifact.py <arm> '<json line>' [rev]
Prints the JSON object with a `provenance` field (git rev + UTC time +
playbook arm) so a later reader can tell which code a deposited
BENCH_MEASURED_*.json number belongs to. Exits non-zero on malformed
input — the caller (tools/hw_playbook.sh deposit()) writes through a
temp file so a failure cannot truncate an existing artifact.

The optional [rev] argument is the git rev recorded INTO the arm log at
run time by hw_playbook.sh run_bench(); without it the stamp falls back
to HEAD-at-stamp-time, which can misattribute a measurement when the
idempotent deposit sweep re-stamps a log left by an earlier partial
playbook run at an older commit (ADVICE r4).
"""

import json
import subprocess
import sys
import time
from pathlib import Path


def main() -> int:
    arm, line = sys.argv[1], sys.argv[2]
    j = json.loads(line)
    rev = sys.argv[3].strip() if len(sys.argv) > 3 and sys.argv[3].strip() else ""
    if not rev:
        # cwd pinned to the repo root so the stamp is independent of the
        # caller's working directory (ADVICE r4).
        try:
            rev = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True,
                cwd=Path(__file__).resolve().parents[1],
            ).stdout.strip()
        except OSError:
            rev = ""
    j["provenance"] = {
        "measured_at": time.strftime("%Y-%m-%dT%H:%MZ", time.gmtime()),
        "git_rev_at_measurement": rev or "unknown",
        "note": f"tools/hw_playbook.sh arm '{arm}' on the real axon TPU chip",
    }
    print(json.dumps(j))
    return 0


if __name__ == "__main__":
    sys.exit(main())
