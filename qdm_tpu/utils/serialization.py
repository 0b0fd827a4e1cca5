"""Param pytree <-> safetensors serialization (the framework's artifact
format; reference contract: models/base.py:530-582 save_quantized +
find_and_load_weights base.py:697-726).

Keys are '|'-joined tree paths.  bf16 leaves are stored natively
(safetensors supports BF16); layouts are forced C-contiguous before
writing because XLA may hold transposed physical layouts.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def save_params(params: dict, path: str) -> None:
    from safetensors.numpy import save_file

    host = jax.device_get(params)
    flat: Dict[str, np.ndarray] = {}

    def rec(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                rec(v, prefix + (k,))
            elif v is not None:
                flat["|".join(prefix + (k,))] = np.ascontiguousarray(np.asarray(v))

    rec(host, ())
    save_file(flat, path)


def load_params(path: str) -> dict:
    from safetensors import safe_open

    params: dict = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            parts = key.split("|")
            sub = params
            for p in parts[:-1]:
                sub = sub.setdefault(p, {})
            sub[parts[-1]] = jnp.asarray(f.get_tensor(key))
    return params
