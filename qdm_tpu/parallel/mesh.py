"""Device mesh + sharding rules.

The reference has no real parallelism (SURVEY.md §2c): `accelerate`
device maps and a CUDA_VISIBLE_DEVICES heuristic (utils/parallel.py:7-29).
Here scaling is first-class XLA GSPMD:

* mesh axes ('data', 'model'): batch/prompts/latents shard over 'data'
  (the images/sec/chip axis), tensor-parallel param shards over 'model'
  (megatron-style column/row splits on attention + MLP matrices) for
  models whose params exceed one chip's HBM (SD3.5-large / T5-XXL).
* collectives (psum/all_gather/reduce_scatter) are emitted by the
  compiler from these shardings and ride ICI.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


# megatron-style tensor-parallel rules for the UNet/MMDiT/text encoders:
# column-split (out axis over 'model') for QKV + MLP in-projections,
# row-split (in axis over 'model') for output projections (psum at the
# boundary inserted by GSPMD).
_COL_SPLIT = (r"to_q", r"to_k", r"to_v", r"net_0/proj", r"fc1", r"q_proj",
              r"k_proj", r"v_proj", r"gate_proj", r"up_proj", r"linear_1")
_ROW_SPLIT = (r"to_out_0", r"net_2", r"fc2", r"out_proj", r"o_proj",
              r"down_proj", r"linear_2")


def param_pspec(path_str: str, leaf_name: str, ndim: int, tp: bool) -> P:
    """PartitionSpec for one param leaf."""
    if not tp or ndim == 0:
        return P()
    if leaf_name in ("kernel", "qweight"):
        if any(re.search(p, path_str) for p in _COL_SPLIT):
            return P(*([None] * (ndim - 1) + ["model"]))
        if any(re.search(p, path_str) for p in _ROW_SPLIT):
            if ndim == 2:
                return P("model", None)
            if ndim == 4:
                return P(None, None, "model", None)
    if leaf_name in ("bias", "scales", "zeros") and any(
            re.search(p, path_str) for p in _COL_SPLIT):
        if ndim == 1:
            return P("model")
        if ndim == 2:
            return P(None, "model")
    return P()


def shard_params(params: dict, mesh: Mesh, tp: bool = False):
    """Apply NamedShardings to a params pytree (device_put)."""

    def rec(tree, prefix):
        if isinstance(tree, dict):
            return {k: rec(v, prefix + (k,)) for k, v in tree.items()}
        leaf_name = prefix[-1]
        spec = param_pspec("/".join(prefix[:-1]), leaf_name, tree.ndim, tp)
        return jax.device_put(tree, NamedSharding(mesh, spec))

    return rec(params, ())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ----------------------------------------------------------------- expert par

def stack_moe_experts(moe_params: dict):
    """Stack a block_sparse_moe param subtree's per-expert kernels into
    (E, in, out) arrays — the shardable layout for expert parallelism
    (per-expert dict arrays cannot be partitioned over devices; one
    stacked axis can).  Returns (w1, w3, w2, gate_kernel)."""
    import re as _re

    names = sorted((k for k in moe_params if _re.fullmatch(r"experts_\d+", k)),
                   key=lambda k: int(k.split("_")[1]))
    import jax.numpy as jnp

    w1 = jnp.stack([moe_params[e]["w1"]["kernel"] for e in names])
    w3 = jnp.stack([moe_params[e]["w3"]["kernel"] for e in names])
    w2 = jnp.stack([moe_params[e]["w2"]["kernel"] for e in names])
    return w1, w3, w2, moe_params["gate"]["kernel"]


def moe_ep_forward(x, stacked, mesh: Mesh, top_k: int = 2,
                   axis: str = "model"):
    """Expert-parallel MoE MLP over a device mesh.

    Decode-shape strategy (tokens are few, expert weights are the HBM
    story — Mixtral: 45 GB of experts vs KBs of tokens): expert weights
    shard over `axis` (each device holds E/n_axis experts), tokens
    replicate, every device computes the weighted sum of ITS experts for
    all tokens, one psum combines.  No all-to-all: at decode batch sizes
    the token traffic is trivial next to the weight-read saving, and the
    psum rides ICI.  Router math (softmax -> top-k -> renormalize)
    matches models/moe.py exactly; outputs equal the single-device dense
    path (tested on the 8-device CPU mesh, tests/test_moe.py).

    x: (n_tokens, d) float.  stacked: from stack_moe_experts.
    """
    from functools import partial

    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map

    w1, w3, w2, gate = stacked
    num_e = w1.shape[0]
    n_shards = mesh.shape[axis]
    assert num_e % n_shards == 0, (num_e, n_shards)

    def body(x_l, w1_l, w3_l, w2_l, gate_l):
        # replicated router (gate replicates; logits over ALL experts)
        logits = x_l @ gate_l.astype(x_l.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        top_w, top_i = jax.lax.top_k(probs, top_k)
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
        e0 = jax.lax.axis_index(axis) * (num_e // n_shards)
        out = jnp.zeros((x_l.shape[0], w2_l.shape[-1]), jnp.float32)
        for j in range(num_e // n_shards):
            w_e = jnp.sum(jnp.where(top_i == e0 + j, top_w, 0.0), axis=-1)
            h = jax.nn.silu(x_l @ w1_l[j]) * (x_l @ w3_l[j])
            out = out + w_e[:, None] * (h @ w2_l[j]).astype(jnp.float32)
        return jax.lax.psum(out, axis)

    espec = P(axis)       # stacked expert axis sharded
    rspec = P()           # tokens + router replicated
    fn = shard_map(body, mesh=mesh,
                   in_specs=(rspec, espec, espec, espec, rspec),
                   out_specs=rspec)
    return fn(x, w1, w3, w2, gate).astype(x.dtype)
