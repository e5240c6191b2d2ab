"""Converged-ACCURACY parity vs the executing torch reference.

Round-4 VERDICT ask #4 — the chaos-insensitive rung the 20-step
trajectory net (test_full_step_parity.py) cannot give. Step-level
trajectories diverge under Lyapunov amplification of the ~1e-4
loss-eval noise floor (docs/DESIGN.md §8 day-4 chaos control), but
chaos does NOT prevent comparing where the two implementations
*converge*: train both sides — the torch twin + the reference's own
`BASDLoss` (`/root/reference/src/losses/combined.py`) vs the PRODUCTION
jitted `make_train_step` — on the same small class-structured synthetic
dataset to plateau, then assert the ScheduleFree EVAL-point val
accuracies and the selector-temperature endpoints agree.

Dataset: C class prototypes + Gaussian pixel noise, so the task is
learnable (not pure memorization) and val accuracy is a meaningful
endpoint. Augmentation and mixup are off on both sides (reference
trainer would apply mixup before the loss, `src/training/trainer.py:
133-147`; parity needs the deterministic path) — the same matched
silencing as the trajectory test.
"""

import os
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

_REFERENCE = Path("/root/reference")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not (_REFERENCE / "src" / "losses").is_dir(),
        reason="reference checkout not available",
    ),
]
if _REFERENCE.is_dir() and str(_REFERENCE) not in sys.path:
    sys.path.insert(0, str(_REFERENCE))

# 300 steps x 16 batches of 8 = ~19 epochs over 128 train images: both
# sides plateau (train loss flat, val acc stable) well before the end.
# BASD_ACC_STEPS extends the horizon for one-off evidence runs.
STEPS = int(os.environ.get("BASD_ACC_STEPS", "300"))
LR, WD, WARMUP, SMOOTH = 1e-3, 0.05, 5, 0.1
B, IMG, RAW, C = 8, 16, 20, 10
N_TRAIN_BATCHES, N_VAL = 16, 256
# Difficulty tuned so the plateau lands in the INTERIOR (~85%), where
# the accuracy assertion has teeth — at full-contrast prototypes both
# sides saturate at 100%/100% and any near-correct implementation would
# pass. Measured sweep (jax side): shrink 1.0/noise 48 -> 1.00,
# 0.6/48 -> 0.996, 0.45/56 -> 0.855, 0.3/64 -> 0.32, 0.2/80 -> 0.14.
SHRINK, NOISE = 0.45, 56.0
BETA1, BETA2, EPS = 0.9, 0.999, 1e-8
TEACHER_STATS = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
DATASET_STATS = ((0.507, 0.487, 0.441), (0.267, 0.256, 0.276))


def _make_dataset(rng):
    """Class prototypes (shrunk toward mid-gray) + pixel noise; balanced."""
    protos = 128.0 + SHRINK * (rng.random((C, RAW, RAW, 3)) * 255.0 - 128.0)

    def draw(n):
        labels = np.tile(np.arange(C, dtype=np.int32), -(-n // C))[:n]
        rng.shuffle(labels)
        imgs = protos[labels] + rng.normal(0.0, NOISE, (n, RAW, RAW, 3))
        return np.clip(imgs, 0, 255).astype(np.uint8), labels

    train_u8, train_labels = draw(N_TRAIN_BATCHES * B)
    val_u8, val_labels = draw(N_VAL)
    return train_u8, train_labels, val_u8, val_labels


@pytest.fixture(scope="module")
def setting():
    """Shared staging: dataset, per-batch deterministic views + teacher
    intermediates, twin weights grafted onto the flax student."""
    import jax
    import jax.numpy as jnp
    import torch

    from basd_tpu.losses import extraction_points, init_selector
    from basd_tpu.models import create_student, load_teacher
    from basd_tpu.models.convert import export_teacher_npz, load_converted_weights
    from basd_tpu.models.teacher import extract_intermediates
    from basd_tpu.ops.preprocess import dual_view_eval
    from torch_twin import make_torch_twin

    rng = np.random.default_rng(1234)
    train_u8, train_labels, val_u8, val_labels = _make_dataset(rng)

    teacher = load_teacher("vit_mini_patch4", img_size=IMG, dtype=jnp.float32)
    points = extraction_points(4, 2)
    student, cfg = create_student(
        "vit_micro_patch4",
        num_classes=C,
        drop_path_rate=0.0,
        img_size=IMG,
        capture_layers=points,
        dtype=jnp.float32,
        remat=False,
    )

    torch.manual_seed(7)
    twin = make_torch_twin(cfg)
    state_np = {k: v.detach().numpy() for k, v in twin.state_dict().items()}

    import tempfile

    template = student.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False
    )
    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "twin.npz"
        export_teacher_npz(p, state_np)
        converted = load_converted_weights(p, template)

    selector = init_selector(
        jax.random.PRNGKey(1), len(points), cfg.embed_dim, teacher.spec.embed_dim
    )

    view = jax.jit(
        lambda u8: dual_view_eval(
            u8, img_size=IMG, crop_ratio=IMG / RAW,
            teacher_stats=TEACHER_STATS, dataset_stats=DATASET_STATS,
        )
    )
    extract = jax.jit(
        lambda v, x: extract_intermediates(teacher._replace(variables=v), x)
    )

    batches = []
    for i in range(N_TRAIN_BATCHES):
        u8 = train_u8[i * B : (i + 1) * B]
        clean, student_imgs = view(jnp.asarray(u8))
        t_tokens, t_imp = extract(teacher.variables, clean)
        batches.append(dict(
            u8=u8,
            labels=train_labels[i * B : (i + 1) * B],
            student_imgs=np.asarray(student_imgs),
            t_tokens=np.asarray(t_tokens),
            t_imp=np.asarray(t_imp),
        ))

    _, val_student_imgs = view(jnp.asarray(val_u8))

    return dict(
        teacher=teacher, student=student, cfg=cfg, points=points,
        twin=twin, converted=converted, selector=selector, batches=batches,
        val_student_imgs=np.asarray(val_student_imgs), val_labels=val_labels,
    )


@pytest.fixture(scope="module")
def torch_endpoint(setting):
    import torch

    from src.losses.combined import BASDLoss
    from torch_twin import TorchScheduleFreeAdamW

    cfg = setting["cfg"]
    twin = setting["twin"]
    L = setting["batches"][0]["t_tokens"].shape[0]
    n_t = setting["batches"][0]["t_tokens"].shape[2]
    h = int(np.atleast_1d(setting["teacher"].spec.num_heads)[0])

    ref = BASDLoss(
        base_criterion=torch.nn.CrossEntropyLoss(label_smoothing=SMOOTH),
        student_dim=cfg.embed_dim,
        teacher_dim=setting["teacher"].spec.embed_dim,
        student_depth=cfg.depth,
        num_student_tokens=cfg.num_patches,
        config=SimpleNamespace(num_extraction_points=len(setting["points"])),
        teacher_has_cls_token=True,
    )
    with torch.no_grad():
        ref.layer_selector.proj_s.copy_(
            torch.tensor(np.asarray(setting["selector"].proj_s))
        )
        ref.layer_selector.proj_t.copy_(
            torch.tensor(np.asarray(setting["selector"].proj_t))
        )
        ref.layer_selector.log_temperatures.copy_(
            torch.tensor(np.asarray(setting["selector"].log_temperatures))
        )

    # per-batch torch tensors built once (teacher attention maps whose
    # CLS-row reduction reproduces our importance vectors exactly — the
    # reference only consumes attn[:, :, 0, 1:].mean(heads))
    prepared = []
    for b in setting["batches"]:
        imp = b["t_imp"]
        attn = np.full((L, B, h, n_t + 1, n_t + 1), 1.0 / (n_t + 1), np.float32)
        attn[:, :, :, 0, 1:] = imp[:, :, None, :]
        attn[:, :, :, 0, 0] = 1.0 - imp.sum(-1)[:, :, None]
        targets = torch.zeros((B, C))
        targets[np.arange(B), b["labels"]] = 1.0
        prepared.append(dict(
            x=torch.tensor(np.transpose(b["student_imgs"], (0, 3, 1, 2))),
            targets=targets,
            t_tokens={i: torch.tensor(b["t_tokens"][i]) for i in range(L)},
            t_attns={i: torch.tensor(attn[i]) for i in range(L)},
        ))

    opt = TorchScheduleFreeAdamW(
        [*twin.parameters(), ref.layer_selector.log_temperatures],
        lr=LR, weight_decay=WD, warmup_steps=WARMUP,
        beta1=BETA1, beta2=BETA2, eps=EPS,
    )

    losses = []
    for step in range(STEPS):
        pb = prepared[step % N_TRAIN_BATCHES]
        logits, tokens, _ = twin(pb["x"])
        s_tokens = {i: tokens[i] for i in setting["points"]}
        total = ref(
            logits, pb["targets"], s_tokens, pb["t_tokens"], pb["t_attns"]
        ).squeeze()
        losses.append(float(total.detach()))
        opt.zero_grad()
        total.backward()
        opt.step()

    # val accuracy at the ScheduleFree EVAL point (x-params) — the
    # quantity the reference's val metric is computed from
    # (src/training/trainer.py:180-199 eval-mode switch)
    x_params = opt.eval_params()
    with torch.no_grad():
        backup = [p.detach().clone() for p in opt.params]
        for p, x in zip(opt.params, x_params):
            p.copy_(x)
        val_x = torch.tensor(
            np.transpose(setting["val_student_imgs"], (0, 3, 1, 2))
        )
        val_logits, _, _ = twin(val_x)
        for p, bk in zip(opt.params, backup):
            p.copy_(bk)
    acc = float(
        (val_logits.argmax(-1).numpy() == setting["val_labels"]).mean()
    )
    return dict(
        losses=np.array(losses),
        acc=acc,
        temps=ref.layer_selector.log_temperatures.detach().numpy().copy(),
    )


@pytest.fixture(scope="module")
def jax_endpoint(setting):
    import jax
    import jax.numpy as jnp

    from basd_tpu.training.schedule_free import eval_params
    from basd_tpu.training.train_step import TrainState, make_train_step

    optimizer, init_fn, step_fn = make_train_step(
        setting["student"],
        setting["teacher"],
        learning_rate=LR,
        weight_decay=WD,
        warmup_steps=WARMUP,
        label_smoothing=SMOOTH,
        img_size=IMG,
        crop_ratio=IMG / RAW,
        teacher_stats=TEACHER_STATS,
        dataset_stats=DATASET_STATS,
        num_classes=C,
        augment=False,
    )
    state = init_fn(jax.random.PRNGKey(0), setting["selector"])
    params = setting["converted"]["params"]
    trainable = {
        "student": params,
        "log_temperatures": setting["selector"].log_temperatures,
    }
    state = TrainState(
        params=params,
        selector=setting["selector"],
        opt_state=jax.jit(optimizer.init)(trainable),
        rng=state.rng,
        step=state.step,
    )

    step = jax.jit(step_fn, donate_argnums=0)
    teacher_vars = setting["teacher"].variables
    images = [jnp.asarray(b["u8"]) for b in setting["batches"]]
    labels = [jnp.asarray(b["labels"]) for b in setting["batches"]]

    losses = []
    for i in range(STEPS):
        j = i % N_TRAIN_BATCHES
        state, metrics = step(state, teacher_vars, images[j], labels[j])
        losses.append(float(metrics["loss"]))

    trainable = {
        "student": state.params,
        "log_temperatures": state.selector.log_temperatures,
    }
    x = eval_params(state.opt_state, trainable, beta1=BETA1)
    out = jax.jit(
        lambda p, im: setting["student"].apply({"params": p}, im, train=False)
    )(x["student"], jnp.asarray(setting["val_student_imgs"]))
    acc = float(
        (np.asarray(out.logits).argmax(-1) == setting["val_labels"]).mean()
    )
    return dict(
        losses=np.array(losses),
        acc=acc,
        # y-point temperatures, matching the torch side's recording
        temps=np.asarray(state.selector.log_temperatures),
    )


class TestConvergedAccuracyParity:
    def test_both_sides_actually_converge(self, torch_endpoint, jax_endpoint):
        """Plateau sanity: the endpoint comparison is meaningless unless
        both implementations actually learned the task."""
        for side, ep in (("torch", torch_endpoint), ("jax", jax_endpoint)):
            tail = ep["losses"][-N_TRAIN_BATCHES:].mean()
            head = ep["losses"][:N_TRAIN_BATCHES].mean()
            assert tail < head * 0.5, (
                f"{side} did not converge: first-epoch mean {head:.3f}, "
                f"last-epoch mean {tail:.3f}"
            )
            assert ep["acc"] > 0.5, (  # chance is 1/C = 0.1
                f"{side} val acc {ep['acc']:.3f} barely above chance"
            )

    def test_val_accuracy_endpoints_agree(self, torch_endpoint, jax_endpoint):
        """The north-star-shaped assertion: converged val accuracy of the
        production jitted step matches the executing torch reference.
        Tolerance 2 pts on 256 val samples (granularity 0.39 pts;
        measured endpoint: torch 85.16% vs jax 85.55%, one borderline
        sample apart): chaos wiggles individual borderline samples but
        cannot move the plateau — a semantic drift (CE smoothing,
        UW-SO, selector mixing, ScheduleFree bookkeeping) shifts
        accuracy itself."""
        a_t, a_j = torch_endpoint["acc"], jax_endpoint["acc"]
        assert abs(a_t - a_j) <= 0.02 + 1e-9, (
            f"converged val acc diverged: torch {a_t:.4f} vs jax {a_j:.4f}"
        )

    def test_temperature_endpoints_agree(self, torch_endpoint, jax_endpoint):
        """Selector temperatures are the slowest mode (still tracking at
        120 steps in the chaos study) — their plateau must agree.
        Measured endpoint maxdiff 7.9e-3 at 300 steps; 3x headroom."""
        np.testing.assert_allclose(
            jax_endpoint["temps"], torch_endpoint["temps"], atol=2.5e-2
        )

    def test_plateau_losses_agree(self, torch_endpoint, jax_endpoint):
        """Epoch-averaged plateau loss (averaging washes out step chaos).
        Measured endpoint: 0.99540 vs 0.99619 (8e-4 rel); 25x headroom."""
        t = torch_endpoint["losses"][-N_TRAIN_BATCHES:].mean()
        j = jax_endpoint["losses"][-N_TRAIN_BATCHES:].mean()
        assert abs(t - j) / t < 2e-2, (
            f"plateau train loss diverged: torch {t:.4f} vs jax {j:.4f}"
        )
