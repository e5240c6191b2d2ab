"""Parameter-free token-grid alignment as a precomputed matmul.

The reference aligns mismatched token counts (e.g. DINOv2 patch-14's 256
tokens vs a patch-16 student's 196) with `F.interpolate(mode="linear",
align_corners=False)` (`src/losses/combined.py:9-14`,
`src/losses/relational.py:29-33`). Token counts are static under jit, so we
precompute the (N_out, N_in) interpolation matrix once at trace time and
apply it as a single MXU matmul — faster than a gather-based resize and
bit-compatible with torch's half-pixel linear rule.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def linear_interp_matrix(n_out: int, n_in: int) -> np.ndarray:
    """W such that (W @ x) == F.interpolate(x, n_out, mode='linear',
    align_corners=False) for a length-n_in signal x."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        w[:, 0] = 1.0
        return w
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        src = min(max(src, 0.0), n_in - 1.0)
        i0 = int(np.floor(src))
        i1 = min(i0 + 1, n_in - 1)
        frac = src - i0
        w[i, i0] += 1.0 - frac
        w[i, i1] += frac
    return w


def align_token_count(tokens: jax.Array, n_out: int) -> jax.Array:
    """(..., N_in, D) -> (..., n_out, D) by linear interpolation over the
    token axis (reference `_align_token_count`, `combined.py:9-14`)."""
    n_in = tokens.shape[-2]
    if n_in == n_out:
        return tokens
    w = jnp.asarray(linear_interp_matrix(n_out, n_in))
    return jnp.einsum(
        "on,...nd->...od", w, tokens.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


def align_vector(values: jax.Array, n_out: int) -> jax.Array:
    """(..., N_in) -> (..., n_out), same rule (reference
    `relational.py:29-33` for attention-importance vectors)."""
    n_in = values.shape[-1]
    if n_in == n_out:
        return values
    w = jnp.asarray(linear_interp_matrix(n_out, n_in))
    return jnp.einsum(
        "on,...n->...o", w, values.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
