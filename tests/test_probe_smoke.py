"""Offline staging checks for the hardware-playbook probes.

Every probe tools/hw_playbook.sh runs supports BASD_PROBE_SMOKE=1: tiny
shapes, interpret-mode Pallas kernels off-TPU — the probe's FULL code
path executes on CPU. A staging regression (import error, shape bug,
renamed symbol) is caught here instead of burning a hardware-window
slot. Slow: each probe is a fresh subprocess (jax import + compiles);
probe_loss_tail inits the full ViT-B/14 teacher (~3 min on this host).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

PLAYBOOK_PROBES = (
    "probe_warp_kernel.py",
    "probe_dualview.py",
    "probe_selector_internals.py",
    "probe_loss_tail.py",
)


def test_playbook_runs_every_smoke_probe():
    """Each smoke-checked probe must actually be a playbook arm (and the
    list must not rot as probes are added/pruned)."""
    playbook = (REPO / "tools" / "hw_playbook.sh").read_text()
    for probe in PLAYBOOK_PROBES:
        assert f"tools/{probe}" in playbook, probe


PROFILE_ARMS = (
    # default (Table-3) arm at batch 4: every stage lambda compiles and
    # runs, including the full-loss fwd+bwd (~2 min on this host)
    ["--batch", "4", "--n", "1"],
    # Table-1 / Table-2 branch wiring: teacher+student staging runs in
    # full; one cheap stage keeps runtime ~40 s each
    ["--imagenet", "--img", "112", "--batch", "2", "--n", "1",
     "--only", "dual_view"],
    ["--cross-arch", "--img", "128", "--batch", "2", "--n", "1",
     "--only", "dual_view"],
)


@pytest.mark.slow
@pytest.mark.parametrize("arm", PROFILE_ARMS, ids=lambda a: a[0])
def test_profile_step_arm_stages_on_cpu(arm):
    """tools/profile_step.py is the playbook's adjudication instrument
    (profile_t1/profile_t3 arms) — its staging must not regress offline."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "profile_step.py"), *arm],
        env=env, capture_output=True, text=True, timeout=540, cwd=REPO,
    )
    assert proc.returncode == 0, (
        " ".join(arm) + "\n" + proc.stdout[-2000:] + proc.stderr[-2000:]
    )
    # at least one parseable timing line (hw_summarize contract)
    assert " ms" in proc.stdout, proc.stdout[-2000:]


@pytest.mark.slow
@pytest.mark.parametrize("probe", PLAYBOOK_PROBES)
def test_probe_smoke_executes(probe):
    env = dict(
        os.environ,
        BASD_PROBE_SMOKE="1",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="",  # single CPU device is enough; drop any mesh forcing
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / probe)],
        env=env, capture_output=True, text=True, timeout=540, cwd=REPO,
    )
    assert proc.returncode == 0, (
        probe + "\n" + proc.stdout[-2000:] + proc.stderr[-2000:]
    )
