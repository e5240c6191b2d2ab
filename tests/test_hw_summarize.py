"""Pure-host tests for tools/hw_summarize.py — the adjudication parser.

The playbook (tools/hw_playbook.sh) output is only useful if this parser
reads it correctly; a silent parsing bug would waste a hardware window.
Fixtures mirror the REAL print formats: profile_step.py's
``stage:   12.345 ms`` lines and bench.py's one-line JSON.
No jax import — safe to run with the tunnel down.
"""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load():
    spec = importlib.util.spec_from_file_location(
        "hw_summarize", REPO / "tools" / "hw_summarize.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_timings_matches_profile_step_format(tmp_path):
    hs = _load()
    log = tmp_path / "profile_t1.log"
    log.write_text(
        "compiling step...\n"
        "dual_view:         18.012 ms\n"
        "teacher forward:  122.400 ms\n"
        "student fwd+bwd (CE): 117.300 ms\n"
        "selector fwd:      28.300 ms\n"
        "WARNING: some jax noise line\n"
        "not a timing: line without ms\n"
    )
    t = hs.parse_timings(log)
    assert t == {
        "dual_view": 18.012,
        "teacher forward": 122.4,
        "student fwd+bwd (CE)": 117.3,
        "selector fwd": 28.3,
    }
    assert hs.parse_timings(tmp_path / "missing.log") == {}


def test_profile_delta_table_orders_and_diffs(tmp_path):
    hs = _load()
    (tmp_path / "profile_t1.log").write_text(
        "teacher forward:  122.400 ms\nselector fwd:      28.300 ms\n"
    )
    (tmp_path / "profile_t1_fused.log").write_text(
        "teacher forward:   98.100 ms\nextra stage:        5.000 ms\n"
    )
    table = hs.profile_delta_table(tmp_path, "profile_t1", "profile_t1_fused")
    lines = table.splitlines()
    # auto-arm order first, fused-only stages after; deltas where both exist
    assert lines[1].lstrip().startswith("teacher forward")
    assert "-24.30" in lines[1]
    assert lines[2].lstrip().startswith("selector fwd")
    assert "?" in lines[2]
    assert lines[3].lstrip().startswith("extra stage")
    # both logs absent -> explicit note, not an empty table
    assert "(no profile_t3/profile_t3_fused logs)" in hs.profile_delta_table(
        tmp_path, "profile_t3", "profile_t3_fused"
    )


def test_parse_bench_json_picks_metric_line_and_skips_noise(tmp_path):
    hs = _load()
    good = {
        "metric": "vit_tiny_basd_distill_throughput",
        "value": 7728.9,
        "unit": "images/sec/chip",
        "detail": {"step_time_ms": 16.561, "mfu_vs_bf16_peak": 0.1352},
    }
    log = tmp_path / "bench_t3.log"
    log.write_text(
        "WARNING:jax._src.xla_bridge: Platform 'axon' is experimental\n"
        "{broken json\n"
        + json.dumps(good)
        + "\n"
    )
    assert hs.parse_bench_json(log) == good
    assert hs.parse_bench_json(tmp_path / "nope.log") is None


def test_main_summarizes_mixed_dir(tmp_path, capsys, monkeypatch):
    hs = _load()
    (tmp_path / "profile_t1.log").write_text("teacher forward:  122.400 ms\n")
    (tmp_path / "profile_t1_fused.log").write_text("teacher forward:   98.100 ms\n")
    (tmp_path / "block_kernel.log").write_text("xla block fwd:      4.210 ms\n")
    (tmp_path / "bench_t1.log").write_text(
        json.dumps(
            {
                "metric": "m",
                "value": 661.7,
                "unit": "images/sec/chip",
                "detail": {"step_time_ms": 386.9, "mfu_vs_bf16_peak": 0.279,
                           "loss": 13.44},
            }
        )
        + "\n"
    )
    (tmp_path / "bench_t2.log").write_text(
        json.dumps({"metric": "m2", "error": "watchdog fired"}) + "\n"
    )
    monkeypatch.setattr(sys, "argv", ["hw_summarize.py", str(tmp_path)])
    assert hs.main() == 0
    out = capsys.readouterr().out
    assert "-24.30" in out                      # delta table rendered
    assert "xla block fwd" in out               # probe timings rendered
    assert "warp:" in out                       # every playbook probe listed
    assert "step=386.9 ms" in out               # bench arm headline
    assert "bench_t2: ERROR — watchdog fired" in out
    assert "bench_t3: missing" in out           # absent arm flagged
    # a nonexistent dir is an error, not a crash
    monkeypatch.setattr(sys, "argv", ["hw_summarize.py", str(tmp_path / "x")])
    assert hs.main() == 1


def test_adjudicate_applies_precommitted_rule(tmp_path, capsys, monkeypatch):
    """The flip/delete rule is pre-committed (DESIGN.md §9): flip iff the
    kernel's primary in-context stage gets >=5% faster; policy A/Bs
    collapse on a >=2% loss-tail win. Verdicts must be mechanical."""
    hs = _load()
    (tmp_path / "profile_t1.log").write_text(
        "teacher forward:  122.000 ms\n"
        "student fwd+bwd (CE): 117.000 ms\n"
        "selector fwd:      28.300 ms\n"
    )
    (tmp_path / "profile_t1_fused.log").write_text(
        "teacher forward:  100.000 ms\n"       # -18% -> FLIP
        "student fwd+bwd (CE): 115.000 ms\n"   # -1.7% -> DELETE
        "selector fwd:      28.100 ms\n"
    )
    (tmp_path / "profile_t1_mlp.log").write_text(
        "teacher forward:  119.000 ms\n"       # -2.5% -> DELETE
    )
    (tmp_path / "profile_t3.log").write_text("selector fwd:  28.300 ms\n")
    (tmp_path / "profile_t3_fused.log").write_text(
        "selector fwd:  22.000 ms\n"           # -22% -> FLIP
    )
    (tmp_path / "loss_tail.log").write_text(
        "  f+b BASD_TPU_MIX_DTYPE=f32:   87.40 ms\n"
        "  f+b BASD_TPU_MIX_DTYPE=bf16:  80.10 ms\n"     # >2% -> collapse
        "  f+b BASD_TPU_STUDENT_BASIS=iter:   87.40 ms\n"
        "  f+b BASD_TPU_STUDENT_BASIS=eigh:   87.00 ms\n"  # <2% -> keep
        "  f+b BASD_TPU_NSPG=fused:   84.00 ms\n"          # -3.9% -> DELETE
        "  f+b BASD_TPU_NSPG=xla:     87.40 ms\n"
    )
    monkeypatch.setattr(
        sys, "argv", ["hw_summarize.py", str(tmp_path), "--adjudicate"]
    )
    assert hs.main() == 0
    out = capsys.readouterr().out
    verdicts = {
        line.split()[0]: line
        for line in out.splitlines()
        if line.strip().startswith(
            ("BLOCK", "TRAIN_BLOCK", "MLP", "SUBSPACE", "NSPG")
        )
    }
    assert "FLIP" in verdicts["BLOCK"]
    assert "DELETE" in verdicts["TRAIN_BLOCK"]
    assert "DELETE" in verdicts["MLP"]
    assert "FLIP" in verdicts["SUBSPACE"]
    assert "DELETE" in verdicts["NSPG"]
    assert "collapse to 'bf16'" in out
    assert "keep default 'iter'" in out
    # TRAIN_BLOCK with no t3 evidence must not invent a secondary row;
    # missing arms degrade to PENDING, never to a false verdict
    (tmp_path / "loss_tail.log").unlink()
    capsys.readouterr()
    assert hs.main() == 0
    out = capsys.readouterr().out
    assert "NSPG" in out and "PENDING" in out
