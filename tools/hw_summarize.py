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

Usage: python tools/hw_summarize.py [outdir] [--adjudicate]
       (default outdir /tmp/hw)

`--adjudicate` applies the PRE-COMMITTED decision rule (VERDICT r4 ask
#2 — fixed before the measurements exist so adjudication is mechanical,
not post-hoc):

  FLIP a pending kernel to 'auto' iff its primary in-context stage gets
  >=5% faster with the kernel forced (fused <= 0.95 * auto on that
  stage); otherwise DELETE the kernel + its probe and ledger the
  negative result in docs/DESIGN.md. No third state. Policy A/Bs
  (MIX_DTYPE, STUDENT_BASIS) collapse to the faster arm iff it wins by
  >=2% on the loss-tail f+b, else keep the current default.

Primary evidence per kernel (each owns a distinct stage, so the
all-fused arm attributes cleanly; MLP is subsumed by BLOCK there and
gets its own MLP-only arm):

  BLOCK        profile_t1{,_fused}      stage "teacher forward"
  TRAIN_BLOCK  profile_t1{,_fused}      stage "student fwd+bwd (CE)"
  MLP          profile_t1{,_mlp}        stage "teacher forward"
  SUBSPACE     profile_t3{,_fused}      stage "selector fwd"
  NSPG         loss_tail probe          "f+b BASD_TPU_NSPG={fused,xla}"

Secondary (reported, and used for shape-gating the flip): the same
stage on the other workload's arms.

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


# (kernel, base log, variant log, stage key, workload tag) — primary
# evidence rows for the pre-committed flip/delete rule (docstring).
_KERNEL_EVIDENCE = [
    ("BLOCK", "profile_t1", "profile_t1_fused", "teacher forward", "t1"),
    ("BLOCK", "profile_t3", "profile_t3_fused", "teacher forward", "t3"),
    ("TRAIN_BLOCK", "profile_t1", "profile_t1_fused",
     "student fwd+bwd (CE)", "t1"),
    ("TRAIN_BLOCK", "profile_t3", "profile_t3_fused",
     "student fwd+bwd (CE)", "t3"),
    ("MLP", "profile_t1", "profile_t1_mlp", "teacher forward", "t1"),
    ("MLP", "profile_t3", "profile_t3_mlp", "teacher forward", "t3"),
    ("SUBSPACE", "profile_t3", "profile_t3_fused", "selector fwd", "t3"),
    ("SUBSPACE", "profile_t1", "profile_t1_fused", "selector fwd", "t1"),
]
_PRIMARY = {"BLOCK": "t1", "TRAIN_BLOCK": "t1", "MLP": "t1",
            "SUBSPACE": "t3", "NSPG": "t1"}
_FLIP_MARGIN = 0.05   # kernel must save >=5% of its stage's auto time
_POLICY_MARGIN = 0.02  # policy A/B collapses on a >=2% loss-tail win


def _verdict(auto: float | None, fused: float | None, margin: float) -> str:
    if auto is None or fused is None:
        return "PENDING (evidence missing)"
    rel = (auto - fused) / auto
    if fused <= (1.0 - margin) * auto:
        return f"FLIP  (saves {rel * 100:.1f}% of stage)"
    return f"DELETE (saves only {rel * 100:+.1f}%)"


def adjudicate(out: Path) -> None:
    print("-- mechanical adjudication (rule pre-committed; see docstring) --")
    rows: dict[str, dict[str, tuple[float | None, float | None]]] = {}
    for kern, base, var, stage, tag in _KERNEL_EVIDENCE:
        b = parse_timings(out / f"{base}.log").get(stage)
        f = parse_timings(out / f"{var}.log").get(stage)
        rows.setdefault(kern, {})[tag] = (b, f)
    # NSPG: the in-context full-loss jit is pathological over the tunnel
    # (CLAUDE.md probe laws) — the designated evidence is the loss-tail
    # probe's full f+b with NSPG forced vs xla.
    tail = parse_timings(out / "loss_tail.log")
    nspg = {k: v for k, v in tail.items() if "BASD_TPU_NSPG" in k}
    rows.setdefault("NSPG", {})["t1"] = (
        next((v for k, v in nspg.items() if "xla" in k), None),
        next((v for k, v in nspg.items() if "fused" in k), None),
    )
    for kern in ("BLOCK", "TRAIN_BLOCK", "MLP", "SUBSPACE", "NSPG"):
        prim = _PRIMARY[kern]
        auto, fused = rows.get(kern, {}).get(prim, (None, None))
        print(f"  {kern:<12} [{prim}] auto={auto} fused={fused} ms -> "
              f"{_verdict(auto, fused, _FLIP_MARGIN)}")
        for tag, (b, f) in sorted(rows.get(kern, {}).items()):
            if tag != prim and (b is not None or f is not None):
                print(f"    secondary [{tag}]: auto={b} fused={f} ms "
                      f"({_verdict(b, f, _FLIP_MARGIN)}) — gate the flip "
                      "to shapes where it wins")
    print()
    print("-- policy A/Bs (loss-tail f+b; collapse env var to winner) --")
    for env, default in (("BASD_TPU_MIX_DTYPE", "f32"),
                         ("BASD_TPU_STUDENT_BASIS", "iter")):
        arms = {k.split("=")[-1]: v for k, v in tail.items() if env in k}
        if len(arms) < 2:
            print(f"  {env}: PENDING (evidence missing)")
            continue
        best = min(arms, key=arms.get)
        cur = arms.get(default)
        msg = (f"collapse to '{best}'"
               if best != default and arms[best] <= (1 - _POLICY_MARGIN) * cur
               else f"keep default '{default}'")
        detail = " ".join(f"{k}={v}ms" for k, v in sorted(arms.items()))
        print(f"  {env}: {detail} -> {msg}")
    print()


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--adjudicate"]
    want_adjudicate = len(argv) != len(sys.argv) - 1
    out = Path(argv[0] if argv else "/tmp/hw")
    if not out.is_dir():
        print(f"no such dir: {out}")
        return 1
    if want_adjudicate:
        adjudicate(out)

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
