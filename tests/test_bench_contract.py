"""Contract test for the driver-facing bench artifact.

`bench.py` is what the round driver runs on real hardware; a staging or
JSON-schema regression there is invisible to the unit suite until the
driver fails. The hidden `--smoke` mode shrinks shapes so the FULL arm
(kernel smoke -> teacher/student staging -> subspace-K calibration ->
jitted train step -> slope timing -> JSON) executes on the CPU backend.
Slow-marked: one subprocess run costs ~60 s warm on the 1-core host.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

_ROOT = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_bench_smoke_json_contract():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        BASD_BENCH_WATCHDOG_S="0",  # no watchdog on the CPU backend
    )
    proc = subprocess.run(
        [sys.executable, str(_ROOT / "bench.py"), "--smoke"],
        env=env, cwd=_ROOT, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    # ONE JSON line on stdout (kernel-smoke warnings would precede it)
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    # the _smoke suffix keeps a wiring check un-ingestable as a
    # production throughput measurement (VERDICT r3 weak #5)
    assert out["metric"] == "vit_tiny_basd_distill_throughput_smoke"
    assert out["unit"] == "images/sec/chip"
    assert out["value"] > 0
    assert out["vs_baseline"] is None
    d = out["detail"]
    assert d["smoke"] is True  # never mistakable for a measurement
    assert d["teacher"] == "dinov2_vitb14"
    arch = d["student_arch"]
    # the self-describing-architecture contract (round-2 VERDICT weak #6)
    for key in ("img_size", "patch_size", "embed_dim", "depth",
                "num_heads", "num_tokens", "params_m", "remat"):
        assert key in arch, key
    assert arch["patch_size"] == 4 and arch["num_tokens"] == 65
    assert "kernel_fallbacks" in d
    import numpy as np

    assert np.isfinite(d["loss"])


@pytest.mark.slow
@pytest.mark.parametrize("arm,metric", [
    (("--imagenet",), "vit_small_imagenet_basd_distill_throughput_smoke"),
    (("--cross-arch",), "vit_tiny_cross_arch_basd_distill_throughput_smoke"),
    # literal reference-Table-1 teacher (playbook arm bench_t1_vitl)
    (("--imagenet", "--teacher", "dinov2_vitl14"),
     "vit_small_imagenet_basd_distill_throughput_teacher_dinov2_vitl14"
     "_smoke"),
])
def test_bench_table_arm_smoke_contract(arm, metric):
    """Table-1/Table-2 arm staging must survive offline: the hardware
    playbook's most expensive failure mode is discovering a staging bug
    only once the tunnel is up (round-3: both arms have never run on
    hardware, so this wiring check is their only regression net)."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        BASD_BENCH_WATCHDOG_S="0",
    )
    proc = subprocess.run(
        [sys.executable, str(_ROOT / "bench.py"), *arm, "--smoke"],
        env=env, cwd=_ROOT, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["metric"] == metric
    assert out["detail"]["smoke"] is True
    import numpy as np

    assert np.isfinite(out["detail"]["loss"])


@pytest.mark.slow
def test_bench_watchdog_emits_error_json():
    """A blocked backend must yield a parseable error JSON with rc=3,
    never a bare timeout (VERDICT r3: BENCH_r03 was rc=124/parsed=null
    because the 2400 s watchdog fired after the driver gave up). The
    BASD_BENCH_TEST_HANG hook simulates the hang deterministically."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BASD_BENCH_WATCHDOG_S="1",
        BASD_BENCH_TEST_HANG="1",
    )
    proc = subprocess.run(
        [sys.executable, str(_ROOT / "bench.py")],
        env=env, cwd=_ROOT, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 3, (proc.returncode, proc.stdout[-500:])
    first = proc.stdout.strip().splitlines()[0]
    out = json.loads(first)
    assert out["value"] == 0.0
    assert "watchdog" in out["error"]


@pytest.mark.slow
def test_dryrun_multichip_pinned_loss():
    """The driver contract AND the repo's cheapest full-pipeline numerics
    invariant (CLAUDE.md verification discipline): the 8-device dryrun's
    first-step loss is pinned to 4 decimals. Any unintended numerics
    change anywhere in the step (augment, models, selector, Procrustes,
    optimizer) moves it."""
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=dict(os.environ), cwd=_ROOT, capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "dryrun_multichip ok devices=8 mesh=(4x2) loss=5.8303" in (
        proc.stdout
    ), proc.stdout[-2000:]
