"""Cross-architecture (Table-2) full-train-step parity vs the torch reference.

Round-4 VERDICT ask #8: the ConvNeXt-teacher path's offline evidence was
thinner than the ViT path's. This is test_full_step_parity.py's protocol
pointed at the Table-2 semantics (reference
`configs/experiment/basd_imagenet_cross_arch.yaml`, teacher
`convnextv2_tiny.fcmae`): a CNN teacher emits ONE token layer in nhwc
format with NO cls token, the reference substitutes uniform attention
(`src/models/teacher.py:184-191`), the selector mixes 4 student
extraction points against that single teacher layer, and the
geometric loss reduces attention by query-mean instead of the CLS row
(`src/losses/relational.py:22-28`). 20 production train steps on both
sides from identical weights:

  torch side: the torch twin student + the reference's own `BASDLoss`
    with `teacher_has_cls_token=False` and the single-layer uniform
    attention dict the reference's CNN extractor produces,
  jax side: the PRODUCTION `make_train_step` with the convnextv2_micro
    teacher (GRN MLP — the V2 block), `augment=False`.

Teacher here is a 4-stage micro ConvNeXt-V2 (stride 32 like the real
family) at 64 px — 2x2 = 4 final-stage tokens against 256 student
patch tokens, so the token-count aligner runs in its upsampling regime.
"""

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

STEPS = 20
LR, WD, WARMUP, SMOOTH = 1e-3, 0.05, 5, 0.1
B, IMG, RAW, C = 8, 64, 80, 10
BETA1, BETA2, EPS = 0.9, 0.999, 1e-8
TEACHER_STATS = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
DATASET_STATS = ((0.507, 0.487, 0.441), (0.267, 0.256, 0.276))


@pytest.fixture(scope="module")
def setting():
    import jax
    import jax.numpy as jnp
    import torch

    from basd_tpu.losses import extraction_points, init_selector
    from basd_tpu.models import create_student, load_teacher
    from basd_tpu.models.convert import export_teacher_npz, load_converted_weights
    from basd_tpu.models.teacher import extract_intermediates
    from basd_tpu.ops.preprocess import dual_view_eval
    from torch_twin import make_torch_twin

    rng = np.random.default_rng(99)
    images_u8 = (rng.random((B, RAW, RAW, 3)) * 255).astype(np.uint8)
    labels = rng.integers(0, C, B, dtype=np.int32)

    teacher = load_teacher("convnextv2_micro", img_size=IMG, dtype=jnp.float32)
    assert teacher.spec.feature_format == "nhwc"
    assert not teacher.spec.has_cls_token

    # Table-2 keeps the default num_extraction_points: 4 (the cross-arch
    # overlay only swaps the teacher, reference cross_arch.yaml)
    points = extraction_points(4, 4)
    student, cfg = create_student(
        "vit_micro_patch4",
        num_classes=C,
        drop_path_rate=0.0,
        img_size=IMG,
        capture_layers=points,
        dtype=jnp.float32,
        remat=False,
    )
    assert points == (0, 1, 2, 3)

    torch.manual_seed(11)
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

    clean, student_imgs = jax.jit(
        lambda u8: dual_view_eval(
            u8, img_size=IMG, crop_ratio=IMG / RAW,
            teacher_stats=TEACHER_STATS, dataset_stats=DATASET_STATS,
        )
    )(jnp.asarray(images_u8))

    t_tokens, t_imp = jax.jit(
        lambda v, x: extract_intermediates(teacher._replace(variables=v), x)
    )(teacher.variables, clean)
    assert t_tokens.shape[0] == 1  # single-layer CNN token stack
    np.testing.assert_allclose(  # uniform importance, teacher.py:188-191
        np.asarray(t_imp), 1.0 / t_tokens.shape[2], rtol=1e-6
    )

    return dict(
        images_u8=images_u8, labels=labels, teacher=teacher,
        student=student, cfg=cfg, points=points, twin=twin,
        converted=converted, selector=selector,
        student_imgs=np.asarray(student_imgs),
        t_tokens=np.asarray(t_tokens),
    )


@pytest.fixture(scope="module")
def torch_trajectory(setting):
    import torch

    from src.losses.combined import BASDLoss
    from torch_twin import TorchScheduleFreeAdamW

    cfg = setting["cfg"]
    twin = setting["twin"]
    n_t = setting["t_tokens"].shape[2]

    ref = BASDLoss(
        base_criterion=torch.nn.CrossEntropyLoss(label_smoothing=SMOOTH),
        student_dim=cfg.embed_dim,
        teacher_dim=setting["teacher"].spec.embed_dim,
        student_depth=cfg.depth,
        num_student_tokens=cfg.num_patches,
        config=SimpleNamespace(num_extraction_points=len(setting["points"])),
        teacher_has_cls_token=False,
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

    # the reference CNN extractor's outputs verbatim: ONE token layer,
    # uniform (B, 1, N, N)/N attention (src/models/teacher.py:184-191)
    t_tokens = {0: torch.tensor(setting["t_tokens"][0])}
    t_attns = {0: torch.ones(B, 1, n_t, n_t) / n_t}
    x_in = torch.tensor(np.transpose(setting["student_imgs"], (0, 3, 1, 2)))
    targets = torch.zeros((B, C))
    targets[np.arange(B), setting["labels"]] = 1.0

    opt = TorchScheduleFreeAdamW(
        [*twin.parameters(), ref.layer_selector.log_temperatures],
        lr=LR, weight_decay=WD, warmup_steps=WARMUP,
        beta1=BETA1, beta2=BETA2, eps=EPS,
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

    x_params = opt.eval_params()
    with torch.no_grad():
        backup = [p.detach().clone() for p in opt.params]
        for p, x in zip(opt.params, x_params):
            p.copy_(x)
        eval_logits, _, _ = twin(x_in)
        for p, bk in zip(opt.params, backup):
            p.copy_(bk)
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


class TestCrossArchTrajectoryParity:
    def test_losses_co_evolve(self, torch_trajectory, jax_trajectory):
        ref, ours = torch_trajectory["losses"], jax_trajectory["losses"]
        rel = np.abs(ours - ref) / np.abs(ref)
        assert rel.max() < 2e-2, (
            f"worst per-step loss rel err {rel.max():.4f}\n"
            f"torch: {ref}\njax:   {ours}"
        )
        assert ref[-1] < ref[0] - 1e-3

    def test_temperatures_co_evolve(self, torch_trajectory, jax_trajectory):
        np.testing.assert_allclose(
            jax_trajectory["temps"], torch_trajectory["temps"], atol=5e-3
        )

    def test_eval_point_logits_match(self, torch_trajectory, jax_trajectory):
        ref = torch_trajectory["eval_logits"]
        ours = jax_trajectory["eval_logits"]
        scale = np.abs(ref).max()
        np.testing.assert_allclose(ours, ref, atol=5e-2 * scale)
        np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
