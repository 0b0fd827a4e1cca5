"""Calibration statistics without hooks.

The reference registers forward hooks on every nn.Linear and keeps a
per-call-step dict of per-channel input absmax
(Mean_Max_Activation_Hook, calib_data.py:105-124), then averages over
steps (mean_of_dict, StableDiffusion1_x.py:104-112).

Here QDense/QConv *sow* the within-call per-channel absmax into the
'calib' collection (max-reduced across multiple calls inside one apply,
e.g. CFG-batched forwards).  The helpers below flatten that collection
and maintain the running mean across denoising steps on device.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def flatten_calib(calib_tree: dict, leaf: str = "act_absmax") -> Dict[str, jnp.ndarray]:
    """'calib' collection -> {'down_blocks_0/.../to_q': absmax (C,)}."""
    out = {}

    def rec(tree, prefix):
        if isinstance(tree, dict):
            if leaf in tree and not isinstance(tree[leaf], dict):
                v = tree[leaf]
                if isinstance(v, tuple):
                    v = v[0]
                out["/".join(prefix)] = v
                return
            for k, v in tree.items():
                rec(v, prefix + (str(k),))

    rec(calib_tree, ())
    return out


def save_stats(stats: Dict[str, jnp.ndarray], path: str) -> None:
    """Checkpoint calibration stats so long calibrations can resume
    (SURVEY.md §5 checkpoint/resume plan — the reference recomputes the
    full 50-step x 96-prompt sweep every run)."""
    from safetensors.numpy import save_file
    import numpy as np

    save_file({k: np.ascontiguousarray(np.asarray(v)) for k, v in stats.items()},
              path)


def load_stats(path: str) -> Dict[str, jnp.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = jnp.asarray(f.get_tensor(k))
    return out


class RunningMeanMax:
    """Running mean over steps of per-step per-channel absmax — the
    reference's mean_of_dict collapsed online (no per-step dict kept)."""

    def __init__(self):
        self.sums: Dict[str, jnp.ndarray] = {}
        self.count = 0

    def update(self, step_stats: Dict[str, jnp.ndarray]):
        for k, v in step_stats.items():
            if k in self.sums:
                self.sums[k] = self.sums[k] + v
            else:
                self.sums[k] = v
        self.count += 1

    def mean(self) -> Dict[str, jnp.ndarray]:
        assert self.count > 0, "no calibration steps recorded"
        return {k: v / self.count for k, v in self.sums.items()}

    def max_over_batches(self, other: "RunningMeanMax"):
        """Merge data-parallel shards: elementwise max of means would be
        wrong; we max the raw absmax sums assuming equal counts."""
        for k, v in other.sums.items():
            self.sums[k] = jnp.maximum(self.sums.get(k, v), v)
        self.count = max(self.count, other.count)
