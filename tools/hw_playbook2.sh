#!/usr/bin/env bash
# Continuation of tools/hw_playbook.sh for the round-5 hardware window:
# the bench arms + driver contracts, run AFTER the kernel adjudication
# verdicts are applied to the tree — so every deposited artifact
# measures the SHIPPING 'auto' config (CLAUDE.md: "deposited
# BENCH_MEASURED_*.json must reflect shipping 'auto'"), instead of
# pre-flip numbers that would need a second pass.
#
# Usage: bash tools/hw_playbook2.sh [outdir]   (default /tmp/hw)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hw}
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  if timeout "$t" "$@" >"$OUT/$name.log" 2>&1; then
    echo "    OK"; tail -n 25 "$OUT/$name.log" | sed 's/^/    /'
  else
    echo "    FAIL/TIMEOUT (exit $?) — see $OUT/$name.log"
    tail -n 8 "$OUT/$name.log" | sed 's/^/    /'
  fi
}

run_bench() { # run_bench <name> <timeout_s> <bench.py args...>
  local name=$1 t=$2; shift 2
  git rev-parse --short HEAD > "$OUT/$name.rev" 2>/dev/null || true
  run "$name" "$t" env "BASD_BENCH_WATCHDOG_S=$((t - 120))" python bench.py "$@"
  deposit "$name" "$name"
}

deposit() { # deposit <arm> <dest> — stamp provenance, write artifact
  local arm=$1 dest=$2
  [ -f "$OUT/$arm.log" ] || return 0
  local line
  line=$(grep -m1 '^{.*"metric"' "$OUT/$arm.log" || true)
  if [ -n "$line" ] && ! printf '%s' "$line" | grep -q '"error"'; then
    local rev=""
    [ -f "$OUT/$arm.rev" ] && rev=$(cat "$OUT/$arm.rev")
    if python tools/stamp_bench_artifact.py "$arm" "$line" "$rev" \
         > "$OUT/$dest.json.tmp"; then
      mv "$OUT/$dest.json.tmp" "BENCH_MEASURED_$dest.json"
      echo "deposited BENCH_MEASURED_$dest.json (from $arm)"
    else
      echo "provenance stamp FAILED for $arm; artifact left untouched"
    fi
  fi
}

# Headlines at the shipping (post-adjudication) config.
run_bench bench_t3        1800
run_bench bench_t1        2400 --imagenet
# Table-2 (cross-arch) and the literal reference Table-1 teacher:
# first-ever measurements, full cold-compile budget.
run_bench bench_t2        2400 --cross-arch
run_bench bench_t1_vitl   2400 --imagenet --teacher dinov2_vitl14
# Driver contract.
run entry           1200 python __graft_entry__.py
echo "=== playbook2 done ($(date +%H:%M:%S)); logs in $OUT ==="
