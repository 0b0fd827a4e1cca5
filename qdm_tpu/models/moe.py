"""Sparse Mixture-of-Experts MLP (Mixtral-class) — TPU-native.

The reference's quantizer carries explicit Mixtral/DeepSeek-V2 MoE
support (quantize/quantizer.py:1106-1116 captures the whole
``block_sparse_moe`` input for scale search; AutoAWQ's fused kernel zoo
ships ``awq/modules/fused/moe.py``).  This is the corresponding model
family here: HF-Mixtral param naming (``block_sparse_moe.gate`` router,
``experts.N.w1/w2/w3``) so the safetensors loader maps checkpoints with
no remapping, and every expert matmul is a QDense so the full
RTN/SmoothQuant/AWQ lifecycle + packed kernels apply per expert.

Two execution paths, selected by ``config.moe_capacity_factor``:

* ``0.0`` (default) — **dense-exact**: every expert computes all
  tokens, outputs combined with the (renormalized top-k softmax) router
  weights.  Exact MoE semantics, no token dropping.  This is also the
  right TPU shape for DECODE (a few tokens: E small matmuls beat any
  gather machinery) and for calibration (every expert sees the full
  calib stream, so sown stats/input-captures exist for all experts).
* ``> 0`` — **capacity dispatch** for long prefill: tokens scatter into
  per-expert ``(capacity, d)`` buffers (position = running count via
  cumsum of the routing one-hot; overflow tokens drop, the standard
  GShard/Switch semantics), each expert runs ONE ``(capacity, d)``
  matmul stack, results gather back weighted.  All shapes static under
  jit; capacity = ceil(cf * n_tokens * top_k / n_experts).  With
  ``cf >= n_experts / top_k`` no token can drop and the path is exactly
  the dense one (tested).

Expert parallelism lives in ``qdm_tpu/parallel/mesh.py::moe_ep_forward``
(stacked expert weights sharded over the 'model' axis, tokens
replicated, one psum combine).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from qdm_tpu.models.layers import NO_PLAN, QDense
from qdm_tpu.quant.plan import QuantPlan

Dtype = Any


class MoeExpert(nn.Module):
    """One SwiGLU expert: down(silu(gate(x)) * up(x)).  Leaf names are
    HF-Mixtral (w1/w3/w2) by default; deepseek-v2 experts use
    gate_proj/up_proj/down_proj (HF mlp.experts.N.* keys)."""

    intermediate_size: int
    hidden_size: int
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN
    leaf_names: tuple = ("w1", "w3", "w2")    # (gate, up, down)

    @nn.compact
    def __call__(self, x):
        gname, uname, dname = self.leaf_names
        gate = QDense(self.intermediate_size, use_bias=False,
                      dtype=self.dtype, plan=self.plan, name=gname)(x)
        up = QDense(self.intermediate_size, use_bias=False,
                    dtype=self.dtype, plan=self.plan, name=uname)(x)
        return QDense(self.hidden_size, use_bias=False, dtype=self.dtype,
                      plan=self.plan, name=dname)(nn.silu(gate) * up)


class MoeMLP(nn.Module):
    """Router + experts.  Replaces LlamaMLP when config.num_experts > 0;
    named ``block_sparse_moe`` by the decoder layer (HF Mixtral keys)."""

    config: Any               # LlamaConfig with num_experts > 0
    dtype: Dtype = jnp.bfloat16
    plan: QuantPlan = NO_PLAN

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        b, s, d = x.shape
        n = b * s
        num_e, top_k = cfg.num_experts, cfg.num_experts_per_tok
        deepseek = getattr(cfg, "moe_layout", "mixtral") == "deepseek"
        inter = (cfg.moe_intermediate_size or cfg.intermediate_size) \
            if deepseek else cfg.intermediate_size
        xf = x.reshape(n, d)

        # Router: plain Linear in HF Mixtral AND deepseek ("gate");
        # excluded from quantization by the plan (reference
        # modules_to_not_convert semantics — a handful of fp16 FLOPs
        # that steer everything).  The reference's quantizer captures
        # this module's input for deepseek_v2 (quantizer.py:1106-1116).
        logits = QDense(num_e, use_bias=False, dtype=self.dtype,
                        plan=self.plan, name="gate")(xf)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        top_w, top_i = jax.lax.top_k(probs, top_k)            # (n, k)
        if getattr(cfg, "moe_renormalize", True):
            top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
        else:
            # deepseek-v2 (norm_topk_prob=False): raw softmax weights,
            # scaled by routed_scaling_factor
            top_w = top_w * jnp.float32(
                getattr(cfg, "routed_scaling_factor", 1.0))

        leaf = ("gate_proj", "up_proj", "down_proj") if deepseek \
            else ("w1", "w3", "w2")
        experts = [MoeExpert(inter, cfg.hidden_size,
                             dtype=self.dtype, plan=self.plan,
                             leaf_names=leaf, name=f"experts_{e}")
                   for e in range(num_e)]

        # deepseek always-on shared experts: one SwiGLU of width
        # n_shared * moe_intermediate, added to the routed output
        # (reference quantizer.py:1112-1116 captures its input)
        shared = None
        if deepseek and getattr(cfg, "n_shared_experts", 0):
            shared = MoeExpert(cfg.n_shared_experts * inter,
                               cfg.hidden_size, dtype=self.dtype,
                               plan=self.plan, leaf_names=leaf,
                               name="shared_experts")(xf)

        cf = getattr(cfg, "moe_capacity_factor", 0.0)
        if not cf or cf <= 0.0 or n <= num_e:
            # dense-exact: weight_e = router weight if expert e is in the
            # token's top-k else 0
            out = jnp.zeros((n, d), jnp.float32)
            for e in range(num_e):
                w_e = jnp.sum(jnp.where(top_i == e, top_w, 0.0), axis=-1)
                out = out + w_e[:, None] * experts[e](xf).astype(jnp.float32)
            if shared is not None:
                out = out + shared.astype(jnp.float32)
            return out.astype(self.dtype).reshape(b, s, d)

        # capacity dispatch (prefill): static per-expert buffers
        cap = min(n, int(math.ceil(cf * n * top_k / num_e)))
        slot_e = top_i.reshape(n * top_k)                     # (n*k,)
        onehot = jax.nn.one_hot(slot_e, num_e, dtype=jnp.int32)
        pos = jnp.cumsum(onehot, axis=0) - onehot             # running count
        slot_p = jnp.sum(onehot * pos, axis=-1)               # (n*k,)
        # overflow -> out-of-bounds index; scatter mode 'drop' discards
        slot_p = jnp.where(slot_p < cap, slot_p, cap)
        tok = jnp.repeat(jnp.arange(n), top_k)
        buf = jnp.zeros((num_e, cap, d), xf.dtype)
        buf = buf.at[slot_e, slot_p].set(xf[tok], mode="drop")
        ys = jnp.stack([experts[e](buf[e]) for e in range(num_e)])
        rows = ys.at[slot_e, slot_p].get(mode="fill", fill_value=0.0)
        out = jnp.sum(rows.reshape(n, top_k, d).astype(jnp.float32)
                      * top_w[..., None], axis=1)
        if shared is not None:
            out = out + shared.astype(jnp.float32)
        return out.astype(self.dtype).reshape(b, s, d)
