"""Summarize a hardware-playbook output directory into an adjudication table.

`tools/hw_playbook.sh` writes one log per step to $OUT. After it runs,
this tool turns the raw logs into the decision evidence the dispatch
flips need (docs/DESIGN.md §8):

  * stage-by-stage `auto` vs forced-fused deltas for the Table-1 and
    Table-3 in-context profiles — the gate for flipping the outage-built
    kernels (BLOCK/TRAIN_BLOCK/MLP/SUBSPACE/NSPG) to `auto` dispatch;
  * the isolated probe timings (block_kernel, block_train, dualview,
    selector, loss_tail);
  * every bench arm's JSON headline (metric, value, MFU, step time).

Usage: python tools/hw_summarize.py [outdir]   (default /tmp/hw)

Pure host-side log parsing — no jax import, safe with the tunnel down.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

# "some stage name:   12.345 ms" — the shared print format of
# tools/profile_step.py and the probe_* scripts.
_TIMING = re.compile(r"^(.{2,60}?):\s+([0-9]+\.[0-9]+)\s*ms\b(.*)$")


def parse_timings(path: Path) -> dict[str, float]:
    out: dict[str, float] = {}
    if not path.exists():
        return out
    for line in path.read_text(errors="replace").splitlines():
        m = _TIMING.match(line.strip())
        if m:
            out[m.group(1).strip()] = float(m.group(2))
    return out


def parse_bench_json(path: Path) -> dict | None:
    if not path.exists():
        return None
    for line in path.read_text(errors="replace").splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def profile_delta_table(out: Path, base_name: str, fused_name: str) -> str:
    base = parse_timings(out / f"{base_name}.log")
    fused = parse_timings(out / f"{fused_name}.log")
    if not base and not fused:
        return f"  (no {base_name}/{fused_name} logs)\n"
    rows = [f"  {'stage':<24} {'auto ms':>9} {'fused ms':>9} {'delta':>8}"]
    # Keep the auto-arm's print order (profile_step.py stage order), then
    # any fused-only stages — set iteration order is nondeterministic.
    stages = list(base) + [s for s in fused if s not in base]
    for stage in stages:
        b, f = base.get(stage), fused.get(stage)
        d = f"{f - b:+8.2f}" if (b is not None and f is not None) else "       ?"
        rows.append(
            f"  {stage:<24} "
            f"{b if b is not None else float('nan'):>9.2f} "
            f"{f if f is not None else float('nan'):>9.2f} {d}"
        )
    return "\n".join(rows) + "\n"


def main() -> int:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/hw")
    if not out.is_dir():
        print(f"no such dir: {out}")
        return 1

    print(f"== playbook summary: {out} ==\n")

    print("-- in-context profiles (kernel adjudication) --")
    print("Table-1 (auto vs BLOCK/MLP/TRAIN_BLOCK/SUBSPACE/NSPG forced):")
    print(profile_delta_table(out, "profile_t1", "profile_t1_fused"))
    print("Table-3:")
    print(profile_delta_table(out, "profile_t3", "profile_t3_fused"))

    print("-- isolated probes --")
    for name in ("smoke", "warp", "block_kernel", "block_train", "dualview",
                 "selector", "loss_tail"):
        t = parse_timings(out / f"{name}.log")
        if t:
            print(f"{name}:")
            for k, v in t.items():
                print(f"  {k:<44} {v:9.3f} ms")
        else:
            log = out / f"{name}.log"
            print(f"{name}: "
                  + ("no timing lines" if log.exists() else "missing"))
    print()

    print("-- bench arms --")
    for name in ("bench_t3_first", "bench_t3", "bench_t1", "bench_t2",
                 "bench_t1_vitl"):
        j = parse_bench_json(out / f"{name}.log")
        if j is None:
            log = out / f"{name}.log"
            print(f"{name}: "
                  + ("no JSON line" if log.exists() else "missing"))
            continue
        if "error" in j:
            print(f"{name}: ERROR — {j['error']}")
            continue
        det = j.get("detail", {})
        print(
            f"{name}: {j.get('metric')} = {j.get('value')} {j.get('unit')}"
            f"  step={det.get('step_time_ms')} ms"
            f"  mfu={det.get('mfu_vs_bf16_peak')}"
            f"  loss={det.get('loss')}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
