#!/usr/bin/env bash
# Hardware measurement playbook — run when the axon tunnel returns after
# an outage. Ordered cheap->expensive; every step is timeout-bounded and
# logged to $OUT. Killed steps still seed the persistent XLA compile
# cache (.jax_cache/), so a re-run usually completes (CLAUDE.md gotchas).
#
# Usage: bash tools/hw_playbook.sh [outdir]   (default /tmp/hw)
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
  # bench's internal watchdog fires 120 s inside the arm's timeout, so a
  # slow cold compile yields bench's own error JSON instead of SIGKILL
  # (and a timeout edit can never desync the watchdog).
  local name=$1 t=$2; shift 2
  # Rev sidecar written AT RUN TIME: the idempotent deposit sweep may
  # re-stamp a log left by an earlier partial playbook run at an older
  # commit — stamping HEAD-at-deposit-time would misattribute it.
  git rev-parse --short HEAD > "$OUT/$name.rev" 2>/dev/null || true
  run "$name" "$t" env "BASD_BENCH_WATCHDOG_S=$((t - 120))" python bench.py "$@"
  # Deposit IMMEDIATELY (not at playbook end): if the session/round dies
  # mid-playbook, measurements already taken must survive as artifacts.
  # bench_t3_first seeds BENCH_MEASURED_bench_t3; the later full-budget
  # bench_t3 arm simply overwrites it (same run-order semantics).
  local dest=$name
  [ "$name" = bench_t3_first ] && dest=bench_t3
  deposit "$name" "$dest"
}

deposit() { # deposit <arm> <dest> — stamp provenance, write artifact
  local arm=$1 dest=$2
  [ -f "$OUT/$arm.log" ] || return 0
  local line
  line=$(grep -m1 '^{.*"metric"' "$OUT/$arm.log" || true)
  if [ -n "$line" ] && ! printf '%s' "$line" | grep -q '"error"'; then
    local rev=""
    [ -f "$OUT/$arm.rev" ] && rev=$(cat "$OUT/$arm.rev")
    # Temp-file write: a failed stamp must not truncate an existing artifact.
    if python tools/stamp_bench_artifact.py "$arm" "$line" "$rev" \
         > "$OUT/$dest.json.tmp"; then
      mv "$OUT/$dest.json.tmp" "BENCH_MEASURED_$dest.json"
      echo "deposited BENCH_MEASURED_$dest.json (from $arm)"
    else
      echo "provenance stamp FAILED for $arm; artifact left untouched"
    fi
  fi
}

# 0a. Grab the Table-3 headline FIRST: its XLA binaries are already in
#     the persistent cache from round 3, so a warm run lands in minutes —
#     if the tunnel window turns out to be short, the round still gets a
#     measured driver-arm artifact (re-measured properly at step 3).
run_bench bench_t3_first  1500
# 0b. Kernel smoke: an un-Mosaic-compilable kernel must be caught
#    before any full-shape probe (self-healing covers bench/entry only).
run smoke            900 python tools/smoke_kernels.py
# 1. Outage-built kernels, isolated A/Bs (DESIGN.md §7 day-3 pending).
#    Warp kernel hardware parity re-check: production ships it, and this
#    exact producer chain once exposed an XLA:TPU miscompile
#    (probe_warp_parity8.py) — cheap insurance on every hardware return.
run warp             900 python tools/probe_warp_kernel.py
run dualview        1200 python tools/probe_dualview.py
run selector        1200 python tools/probe_selector_internals.py
run loss_tail       1800 python tools/probe_loss_tail.py
# 2. In-context stage profiles (regression watch; the round-5 kernel
#    adjudication is DONE — all five outage-built kernels lost and were
#    deleted, docs/DESIGN.md section 9 — so there are no fused arms).
run profile_t1      2400 python tools/profile_step.py --imagenet
run profile_t3      1800 python tools/profile_step.py --only dual_view,teacher,student,selector
run summarize        120 python tools/hw_summarize.py "$OUT"
# 3. Headlines.
run_bench bench_t1        2400 --imagenet
run_bench bench_t3        1800
# Table-2 (cross-arch, ConvNeXt-V2-Tiny teacher): first-ever measurement,
# full cold compile budget.
run_bench bench_t2        2400 --cross-arch
# Literal reference Table-1 teacher (dinov2_vitl14): first-ever
# measurement — decides whether the ViT-B/14 deviation is replaced or
# re-justified with numbers (DESIGN.md §2).
run_bench bench_t1_vitl   2400 --imagenet --teacher dinov2_vitl14
# 4. Driver contracts.
run entry           1200 python __graft_entry__.py

# 5. Final idempotent deposit sweep (each bench arm already deposited
#    inline; this re-runs them in order in case an arm's log was produced
#    by an earlier partial playbook run in the same $OUT).
for pair in bench_t3_first:bench_t3 bench_t3:bench_t3 bench_t1:bench_t1 \
            bench_t2:bench_t2 bench_t1_vitl:bench_t1_vitl; do
  deposit "${pair%%:*}" "${pair##*:}"
done
echo "=== playbook done ($(date +%H:%M:%S)); logs in $OUT ==="
