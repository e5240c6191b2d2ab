"""Stamp measurement provenance onto a bench.py JSON line.

Usage: python tools/stamp_bench_artifact.py <arm> '<json line>'
Prints the JSON object with a `provenance` field (git rev + UTC time +
playbook arm) so a later reader can tell which code a deposited
BENCH_MEASURED_*.json number belongs to. Exits non-zero on malformed
input — the caller (tools/hw_playbook.sh deposit()) writes through a
temp file so a failure cannot truncate an existing artifact.
"""

import json
import subprocess
import sys
import time


def main() -> int:
    arm, line = sys.argv[1], sys.argv[2]
    j = json.loads(line)
    rev = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    j["provenance"] = {
        "measured_at": time.strftime("%Y-%m-%dT%H:%MZ", time.gmtime()),
        "git_rev_at_measurement": rev or "unknown",
        "note": f"tools/hw_playbook.sh arm '{arm}' on the real axon TPU chip",
    }
    print(json.dumps(j))
    return 0


if __name__ == "__main__":
    sys.exit(main())
