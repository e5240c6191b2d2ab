"""FULL-train-step trajectory parity vs the executing torch reference.

Round-3 VERDICT ask #6 — the last offline proxy before real CIFAR-100
accuracy parity. The loss-stack trajectory test (test_reference_parity.py)
co-evolves the losses alone; here the ENTIRE production step runs on both
sides for 20 steps from identical weights on an identical fixed batch:

  torch side: the torch twin student (tests/torch_twin.py) + the
    reference's own `BASDLoss` (`/root/reference/src/losses/combined.py`)
    + a test-local torch transcription of AdamWScheduleFree (the exact
    update rule `basd_tpu/training/schedule_free.py` implements, from
    Defazio et al. 2024 — the `schedulefree` pip package is not in this
    image, reference `src/training/trainer.py:54-58`),
  jax side: the PRODUCTION `make_train_step` step_fn, jitted, with
    `augment=False` (the stochastic input stages silenced — both sides
    see the same deterministic dual view + one-hot targets).

Losses, temperatures, and the ScheduleFree EVAL-point (x) logits must
track. A drift in any step-level semantic — CE smoothing, UW-SO
weighting, selector mixing, Procrustes, ScheduleFree y/z/x bookkeeping,
weight decay placement — shows up as trajectory divergence here.
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

# BASD_PARITY_STEPS extends the horizon for one-off evidence runs (the
# 20-step default is the pinned regression net; measured extended-horizon
# results live in docs/DESIGN.md §8).
STEPS = int(os.environ.get("BASD_PARITY_STEPS", "20"))
# LR chosen to keep the dynamics out of the chaotic steep-descent regime:
# at 3e-3 both sides drop 5.1 -> 1.0 in ~7 steps and the ~1e-4 loss-eval
# noise floor (Newton-Schulz nuclear norm vs torch svdvals) amplifies to
# ~8% transient divergence before re-converging; at 1e-3 the same
# semantics produce smoothly-tracking trajectories. The SEMANTIC parity is
# what this test pins — step-chaos amplification is a property of the
# problem, not of either implementation.
LR, WD, WARMUP, SMOOTH = 1e-3, 0.05, 5, 0.1
B, IMG, RAW, C = 8, 16, 20, 10
BETA1, BETA2, EPS = 0.9, 0.999, 1e-8
TEACHER_STATS = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
DATASET_STATS = ((0.507, 0.487, 0.441), (0.267, 0.256, 0.276))


class TorchScheduleFreeAdamW:
    """Line-for-line torch transcription of
    `basd_tpu.training.schedule_free.schedule_free_adamw` (params = y)."""

    def __init__(self, params):
        import torch

        self.params = list(params)
        self.z = [p.detach().clone() for p in self.params]
        self.v = [torch.zeros_like(p) for p in self.params]
        self.t = 0
        self.weight_sum = 0.0

    def step(self):
        import torch

        self.t += 1
        sched = min(1.0, self.t / max(WARMUP, 1)) if WARMUP else 1.0
        gamma = LR * sched * (1.0 - BETA2**self.t) ** 0.5
        weight = gamma**2.0  # weight_lr_power = 2
        self.weight_sum += weight
        ckp1 = weight / self.weight_sum if self.weight_sum > 0 else 0.0
        with torch.no_grad():
            for p, z, v in zip(self.params, self.z, self.v):
                g = p.grad
                v.mul_(BETA2).add_((1.0 - BETA2) * g * g)
                u = g / (v.sqrt() + EPS) + WD * p
                # y update reads the OLD z; z updates after
                p.add_(ckp1 * (z - p) + gamma * (BETA1 * (1.0 - ckp1) - 1.0) * u)
                z.sub_(gamma * u)

    def zero_grad(self):
        for p in self.params:
            p.grad = None

    def eval_params(self):
        return [
            ((p.detach() - (1.0 - BETA1) * z) / BETA1) for p, z in zip(self.params, self.z)
        ]


@pytest.fixture(scope="module")
def setting():
    """Shared staging: fixed batch, teacher intermediates, twin weights
    converted onto the flax student, identical selector."""
    import jax
    import jax.numpy as jnp
    import torch

    from basd_tpu.losses import extraction_points, init_selector
    from basd_tpu.models import create_student, load_teacher
    from basd_tpu.models.convert import export_teacher_npz, load_converted_weights
    from basd_tpu.ops.preprocess import dual_view_eval
    from torch_twin import make_torch_twin

    rng = np.random.default_rng(42)
    images_u8 = (rng.random((B, RAW, RAW, 3)) * 255).astype(np.uint8)
    labels = rng.integers(0, C, B, dtype=np.int32)

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
    assert points == (0, 3)

    torch.manual_seed(7)
    twin = make_torch_twin(cfg)
    state_np = {k: v.detach().numpy() for k, v in twin.state_dict().items()}

    # graft the twin's weights onto the flax student (the converter is the
    # tested bridge, tests/test_convert.py golden parity)
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

    # the deterministic dual view both sides consume
    clean, student_imgs = jax.jit(
        lambda u8: dual_view_eval(
            u8, img_size=IMG, crop_ratio=IMG / RAW,
            teacher_stats=TEACHER_STATS, dataset_stats=DATASET_STATS,
        )
    )(jnp.asarray(images_u8))

    from basd_tpu.models.teacher import extract_intermediates

    t_tokens, t_imp = jax.jit(
        lambda v, x: extract_intermediates(teacher._replace(variables=v), x)
    )(teacher.variables, clean)

    return dict(
        images_u8=images_u8, labels=labels, teacher=teacher,
        student=student, cfg=cfg, points=points, twin=twin,
        converted=converted, selector=selector,
        clean=np.asarray(clean), student_imgs=np.asarray(student_imgs),
        t_tokens=np.asarray(t_tokens), t_imp=np.asarray(t_imp),
    )


@pytest.fixture(scope="module")
def torch_trajectory(setting):
    import torch

    from src.losses.combined import BASDLoss

    cfg = setting["cfg"]
    twin = setting["twin"]
    L = setting["t_tokens"].shape[0]
    n_t = setting["t_tokens"].shape[2]

    ref = BASDLoss(
        base_criterion=torch.nn.CrossEntropyLoss(label_smoothing=SMOOTH),
        student_dim=cfg.embed_dim,
        teacher_dim=setting["teacher"].spec.embed_dim,
        student_depth=cfg.depth,
        num_student_tokens=cfg.num_patches,
        config=SimpleNamespace(num_extraction_points=len(setting["points"])),
        teacher_has_cls_token=True,
    )
    assert ref.token_layers == list(setting["points"])
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

    # teacher attention maps whose CLS-row reduction reproduces our
    # importance vectors exactly (the reference only ever consumes
    # attn[:, :, 0, 1:].mean(heads); rows are kept stochastic)
    imp = setting["t_imp"]  # (L, B, N)
    h = int(np.atleast_1d(setting["teacher"].spec.num_heads)[0])
    attn = np.full((L, B, h, n_t + 1, n_t + 1), 1.0 / (n_t + 1), np.float32)
    attn[:, :, :, 0, 1:] = imp[:, :, None, :]
    attn[:, :, :, 0, 0] = 1.0 - imp.sum(-1)[:, :, None]

    t_tokens = {i: torch.tensor(setting["t_tokens"][i]) for i in range(L)}
    t_attns = {i: torch.tensor(attn[i]) for i in range(L)}
    x_in = torch.tensor(
        np.transpose(setting["student_imgs"], (0, 3, 1, 2))
    )
    targets = torch.zeros((B, C))
    targets[np.arange(B), setting["labels"]] = 1.0

    opt = TorchScheduleFreeAdamW(
        [*twin.parameters(), ref.layer_selector.log_temperatures]
    )

    losses, temps = [], []
    for _ in range(STEPS):
        logits, tokens, _ = twin(x_in)
        s_tokens = {i: tokens[i] for i in setting["points"]}
        total = ref(logits, targets, s_tokens, t_tokens, t_attns).squeeze()
        losses.append(float(total.detach()))
        temps.append(
            ref.layer_selector.log_temperatures.detach().numpy().copy()
        )
        opt.zero_grad()
        total.backward()
        opt.step()

    # ScheduleFree EVAL point: logits at x-params (reference eval-mode
    # switch, trainer.py:180-184)
    x_params = opt.eval_params()
    with torch.no_grad():
        backup = [p.detach().clone() for p in opt.params]
        for p, x in zip(opt.params, x_params):
            p.copy_(x)
        eval_logits, _, _ = twin(x_in)
        for p, b in zip(opt.params, backup):
            p.copy_(b)
    return dict(
        losses=np.array(losses),
        temps=np.stack(temps),
        eval_logits=eval_logits.numpy(),
    )


@pytest.fixture(scope="module")
def jax_trajectory(setting):
    import jax
    import jax.numpy as jnp

    from basd_tpu.training.schedule_free import eval_params
    from basd_tpu.training.train_step import TrainState, make_train_step

    cfg = setting["cfg"]
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
    images = jnp.asarray(setting["images_u8"])
    labels = jnp.asarray(setting["labels"])
    teacher_vars = setting["teacher"].variables

    losses, temps = [], []
    for _ in range(STEPS):
        # temperatures BEFORE the update, matching the torch recording
        temps.append(np.asarray(state.selector.log_temperatures))
        state, metrics = step(state, teacher_vars, images, labels)
        losses.append(float(metrics["loss"]))

    trainable = {
        "student": state.params,
        "log_temperatures": state.selector.log_temperatures,
    }
    x = eval_params(state.opt_state, trainable, beta1=BETA1)
    out = jax.jit(
        lambda p, im: setting["student"].apply({"params": p}, im, train=False)
    )(x["student"], jnp.asarray(setting["student_imgs"]))
    return dict(
        losses=np.array(losses),
        temps=np.stack(temps),
        eval_logits=np.asarray(out.logits),
    )


class TestFullStepTrajectoryParity:
    def test_losses_co_evolve(self, torch_trajectory, jax_trajectory):
        ref, ours = torch_trajectory["losses"], jax_trajectory["losses"]
        rel = np.abs(ours - ref) / np.abs(ref)
        assert rel.max() < 2e-2, (
            f"worst per-step loss rel err {rel.max():.4f}\n"
            f"torch: {ref}\njax:   {ours}"
        )
        # the optimization must actually be moving
        assert ref[-1] < ref[0] - 1e-3

    def test_temperatures_co_evolve(self, torch_trajectory, jax_trajectory):
        np.testing.assert_allclose(
            jax_trajectory["temps"], torch_trajectory["temps"], atol=5e-3
        )
        drift = np.abs(
            torch_trajectory["temps"][-1] - torch_trajectory["temps"][0]
        ).max()
        assert drift > 1e-5  # temperatures actually moved

    def test_eval_point_logits_match(self, torch_trajectory, jax_trajectory):
        """The x-params (ScheduleFree eval switch) after 20 steps: the
        quantity val-accuracy is computed from. Catches y/z bookkeeping
        drift that per-step losses (evaluated at y) could mask."""
        ref = torch_trajectory["eval_logits"]
        ours = jax_trajectory["eval_logits"]
        scale = np.abs(ref).max()
        # 20 steps of compounded fp drift leave a ~3% tail on a few
        # logits (measured 0.143 max abs at scale 4.4); 5% headroom
        np.testing.assert_allclose(ours, ref, atol=5e-2 * scale)
        # identical predicted classes => identical val-acc on this batch
        np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
