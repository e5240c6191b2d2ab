"""Megatron-style tensor-parallel sharding rules for the ViT param tree.

Data parallelism shards the batch; tensor parallelism shards the wide
matmuls across the 'model' mesh axis: column-parallel qkv / mlp.fc1
(output-dim sharded), row-parallel attn.proj / mlp.fc2 (input-dim sharded),
everything else replicated. GSPMD inserts the reduce-scatter/all-gather
collectives over ICI. Not required for reference parity (SURVEY.md 2.3 —
the reference has no TP) but first-class here so larger students/teachers
scale past one chip's HBM.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple[str, ...], leaf) -> P:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    joined = "/".join(names)
    if joined.endswith("qkv/kernel") or joined.endswith("fc1/kernel"):
        return P(None, "model")  # column parallel
    if joined.endswith("proj/kernel") or joined.endswith("fc2/kernel"):
        return P("model", None)  # row parallel
    if joined.endswith("qkv/bias") or joined.endswith("fc1/bias"):
        return P("model")
    return P()


def student_param_sharding(mesh: Mesh, params):
    """NamedSharding tree for the student params under the given mesh."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), params
    )


def state_sharding(mesh: Mesh, state):
    """Shard a TrainState: student params (y), ScheduleFree z and v follow
    the same layout; scalars/selector replicated."""
    from basd_tpu.parallel.mesh import replicated

    p_sh = student_param_sharding(mesh, state.params)
    rep = replicated(mesh)

    opt = state.opt_state
    opt_sh = opt._replace(
        step=rep,
        weight_sum=rep,
        z={
            "student": student_param_sharding(mesh, opt.z["student"]),
            "log_temperatures": rep,
        },
        exp_avg_sq={
            "student": student_param_sharding(mesh, opt.exp_avg_sq["student"]),
            "log_temperatures": rep,
        },
    )
    return state._replace(
        params=p_sh,
        selector=jax.tree_util.tree_map(lambda _: rep, state.selector),
        opt_state=opt_sh,
        rng=rep,
        step=rep,
    )
