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
