"""BASD-TPU: TPU-native Bias-Aligned Spectral Distillation framework.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of the
PyTorch reference `indrajeetadityaroy9/vit-inductive-bias-distillation`
(see SURVEY.md): feature-based knowledge distillation for Vision
Transformers driven by a spectrally-adaptive Grassmannian layer selector
(Marchenko-Pastur rank estimation, spectrally-weighted principal angles,
soft teacher-layer mixing), an attention-weighted Procrustes loss, and
UW-SO inverse-loss weighting -- all fused into a single jitted train step
that runs under data-parallel sharding on TPU meshes.

Layer map (mirrors SURVEY.md section 1, re-designed TPU-first):

    basd_tpu.config      -- config tree + experiment overlays + resolvers
    basd_tpu.data        -- host decode + on-device dual-view input path
    basd_tpu.models      -- Flax ViT / CNN model zoo returning intermediates
    basd_tpu.spectral    -- batched MP-rank / Grassmann / principal-angle core
    basd_tpu.losses      -- selector, Procrustes, token interp, UW-SO, BASD
    basd_tpu.training    -- ScheduleFree AdamW, jitted train step, trainer
    basd_tpu.parallel    -- mesh construction + sharding rules
    basd_tpu.evaluation  -- accuracy / robustness / efficiency suite
    basd_tpu.checkpoint  -- orbax-backed best/latest checkpointing + resume
"""

__version__ = "0.1.0"

# Honor an explicit JAX_PLATFORMS=cpu request. Some images register an
# accelerator PJRT plugin from sitecustomize with a platform-priority
# config override ("axon,cpu"), which silently outranks the user's env
# var; when the accelerator transport is unreachable, backend init then
# hangs forever instead of falling back. An env var the user set
# explicitly must win (tests/conftest.py does the same for pytest).
import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    if _jax.config.jax_platforms != "cpu":
        _jax.config.update("jax_platforms", "cpu")
del _os
