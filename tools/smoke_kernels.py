"""Mosaic smoke-compile of every Pallas kernel at small real shapes on
the live backend — run FIRST when hardware returns so an un-compilable
kernel is caught before any bench or probe runs at full shape. One
PASS/FAIL line per kernel; exit 1 if anything failed.

The same checks run automatically (self-healing: failures flip the
kernel's policy env to `xla`) at the top of bench.py and
__graft_entry__.entry() — see `basd_tpu.utils.kernel_smoke`.

`--interpret` self-tests the harness on CPU."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from basd_tpu.utils.kernel_smoke import validate_kernel_dispatches


def main():
    interpret = "--interpret" in sys.argv
    failures = validate_kernel_dispatches(interpret=interpret, verbose=True)
    for name, err in failures.items():
        print(f"FAIL {name}: {err}", flush=True)
    print("ALL PASS" if not failures else "SOME FAILED", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
