"""Megakernel decode engine for LLM serving.

``DecodeEngine`` decodes with THREE pallas calls per decoder
layer (qdm_tpu/ops/decode_kernels.py) instead of the ~15 small XLA ops
the module-based path emits — the fix for the measured
small-op-overhead bound at batch-32 serving (BENCH_NOTES.md round 2:
25.5 ms/step vs a 3.7 ms HBM roofline).  TPU-native counterpart of the
reference's fused-for-inference module stack
(models/base.py:1494-1515 fuse_layers, utils/fused_utils.py:45-142).

Modes
-----
* ``bf16``        — full-precision weights, fused kernels only.
* ``w8a8_static`` — int8 per-out-channel weights + calibrated static
  per-tensor activation scales (the measured-fastest int8 act scheme
  on v5e).  Prefill runs through the regular bf16 model (prefill is
  MXU-bound, not weight-bound; running it unquantized is strictly
  higher quality), decode through the int8 megakernels.
* ``w4a8_static`` — int4 group-quantized weights (planar nibble
  packing, group-128 scales — the reference's W4 group scheme as
  in-kernel dequant on the int8 MXU) + the same static act scales.
  Decode weight HBM traffic halves again vs int8; this is the
  AWQ-style W4A8 serving mode.

Exactness caveat: "token-exact" engine claims are pinned on the f32
CPU suite against the NON-flash module prefill.  On TPU, prompts
S >= 1024 route through the flash prefill kernel
(ops/flash_prefill.py; QDM_FLASH_PREFILL_MIN), whose online-softmax
reassociation is sub-ULP in bf16 but CAN flip near-tied argmaxes —
measured tok0 agreement across prefill paths is 0.72-0.97 on
random-weight models (BENCH_NOTES r4; real checkpoints have far fewer
near-ties).  Set QDM_DISABLE_FLASH_PREFILL=1 to force the einsum
prefill when bit-stability across program shapes matters more than
prefill speed.

The engine extracts weights once from a :class:`CausalLM`'s canonical
(unfused) params; the KV cache is ONE combined [K|V] depth-major array
(B, 2*hkv, d, T) per layer — a single dynamic_update_slice per step,
dense (sublane x lane) DMA tiles in the attention kernel, and the
module-path prefill writes it directly (llama.py's len-1-tuple cache
branch), so prefill->decode needs no layout conversion.

Parallel serving (dp x tp)
--------------------------
Pass ``mesh=`` (a ``jax.sharding.Mesh`` with ``('data', 'model')``
axes, e.g. ``parallel.mesh.make_mesh(dp, tp)``).  Tensor parallelism
(the 'model' axis) is megatron-style over ICI: qkv/gate/up are
column-split by head / inner channel, o_proj/down are row-split with
one ``psum`` each per layer, the KV cache shards over kv heads, and
the lm_head splits the vocab with a cross-shard argmax.  Data
parallelism (the 'data' axis) shards the batch and the KV cache's
batch dim; weights replicate (their specs name only 'model'), and no
collectives cross 'data'.  The decode step runs under ``shard_map`` so
each device launches its own pallas megakernels on local shards.
Counterpart of the reference's multi-GPU device-map placement
(utils/parallel.py) — re-designed as SPMD rather than per-layer
placement.

Sliding-window models (mistral/qwen2: ``config.sliding_window``)
serve with a ROLLING window-slot cache once the serving length exceeds
the window: decode writes slot ``pos % window`` and the kernels'
``t_ids <= pos`` mask is already exact on it, so long-context decode
reads ``window`` cache columns instead of ``ctx`` (bench_llm.py
--swa).  Mixtral-class sparse MoE serves dense-exact through
stacked-expert batched einsums (``_moe_mlp``); attention keeps the
megakernels.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from qdm_tpu.ops import decode_kernels as dk
from qdm_tpu.ops.quant_matmul import _round_up


def _xla_norm(x, scale, bias, norm_type: str, eps: float):
    """f32 rmsnorm/layernorm matching models/layers.py exactly (used
    once per layer for the parallel-residual arch, where one norm
    feeds both branches and the kernels skip theirs)."""
    xf = x.astype(jnp.float32)
    if norm_type == "layernorm":
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + 1e-5)
                * scale.astype(jnp.float32) + bias.astype(jnp.float32))
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y * scale.astype(jnp.float32)


def _quant_w(w, dtype=jnp.int8):
    """Per-out-channel symmetric int8: w (K, N) -> (codes, scales (1,N))."""
    wf = w.astype(jnp.float32)
    s = jnp.clip(jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-8, None) / 127.0
    return jnp.clip(jnp.round(wf / s), -127, 127).astype(dtype), s


def _quant_w_stacked(w, dtype=jnp.int8):
    """Per-(expert, out-channel) symmetric int8 for stacked MoE expert
    tensors: w (E, K, N) -> (codes, scales (E, 1, N))."""
    wf = w.astype(jnp.float32)
    s = jnp.clip(jnp.max(jnp.abs(wf), axis=1, keepdims=True),
                 1e-8, None) / 127.0
    return jnp.clip(jnp.round(wf / s), -127, 127).astype(dtype), s


def _quant_w4(w, group: int, block: int = 0):
    """Group-wise symmetric int4, planar nibble packing (see
    decode_kernels pack_int4_planar): w (K, N) -> (packed (K/2, N)
    bytes, scales (K/group, N))."""
    wq, s = dk.quantize_int4_group(w, group)
    return dk.pack_int4_planar(wq, block=block), s


def _quant_w4_rowsharded(w, group: int, tp: int, block: int = 0):
    """Row-split (tensor-parallel) int4 packing: planar nibble pairs
    must stay WITHIN a shard's rows (row r pairs with r + K_local/2),
    so each shard's slice packs independently and the packs concatenate
    along the packed-row axis — P('model', None) then hands every
    device a self-contained local planar pack + its group scales."""
    k = w.shape[0]
    kl = k // tp
    packs, scs = [], []
    for s_ in range(tp):
        pk, sc = _quant_w4(w[s_ * kl:(s_ + 1) * kl], group, block=block)
        packs.append(pk)
        scs.append(sc)
    return jnp.concatenate(packs, axis=0), jnp.concatenate(scs, axis=0)


def _quant_w_gptq(w, H):
    """GPTQ placement on the engine's per-out-channel symmetric int8
    grid (same grid as _quant_w; only the CODES differ — each rounding
    error is redistributed through the input Hessian, quant/gptq.py).
    With an identity Hessian this IS _quant_w (tested)."""
    from qdm_tpu.quant.gptq import gptq_quantize_kernel_h

    codes, scales, _ = gptq_quantize_kernel_h(
        w.astype(jnp.float32), H, n_bits=8, group_size=0,
        zero_point=False, return_q=True, narrow_range=True)
    return codes.astype(jnp.int8), scales.astype(jnp.float32)


def _quant_w4_gptq(w, H, group: int, block: int = 0):
    """GPTQ placement on the engine's group-wise symmetric int4 grid
    (same grid as _quant_w4), planar-packed for the i4 kernels."""
    from qdm_tpu.quant.gptq import gptq_quantize_kernel_h

    codes, scales, _ = gptq_quantize_kernel_h(
        w.astype(jnp.float32), H, n_bits=4, group_size=group,
        zero_point=False, return_q=True, narrow_range=True)
    return (dk.pack_int4_planar(codes.astype(jnp.int8), block=block),
            scales.astype(jnp.float32))


def _quant_w4_gptq_rowsharded(w, H, group: int, tp: int, block: int = 0):
    """Row-split int4 GPTQ: each shard's rows quantize against the
    matching diagonal Hessian block (cross-shard compensation is
    impossible in this layout anyway — each device owns its rows)."""
    k = w.shape[0]
    kl = k // tp
    packs, scs = [], []
    for s_ in range(tp):
        pk, sc = _quant_w4_gptq(w[s_ * kl:(s_ + 1) * kl],
                                H[s_ * kl:(s_ + 1) * kl,
                                  s_ * kl:(s_ + 1) * kl], group, block=block)
        packs.append(pk)
        scs.append(sc)
    return jnp.concatenate(packs, axis=0), jnp.concatenate(scs, axis=0)


def _qkv_shard_perm(h: int, hkv: int, d: int, tp: int) -> np.ndarray:
    """Column permutation putting the fused [q | k | v] projection into
    shard-major order: shard s's columns are [q_s | k_s | v_s], so a
    plain P(None, 'model') split hands each device a local fused qkv
    weight with the SAME internal layout the kernels expect."""
    hl, hkvl = h // tp, hkv // tp
    q0, k0, v0 = 0, h * d, (h + hkv) * d
    idx = []
    for s in range(tp):
        idx.append(np.arange(q0 + s * hl * d, q0 + (s + 1) * hl * d))
        idx.append(np.arange(k0 + s * hkvl * d, k0 + (s + 1) * hkvl * d))
        idx.append(np.arange(v0 + s * hkvl * d, v0 + (s + 1) * hkvl * d))
    return np.concatenate(idx)


def _i4_layout(cfg, tp: int = 1):
    """(i4_group, i4_mlp_block) for the w4a8 engine's LOCAL shards:
    the int4 group is 128 (the reference W4 group scheme) shrunk to
    divide every planar half-contraction the local kernels see (K/2
    for qkv/gate/up, local h*d/2 for the row-split o_proj, local
    block_j/2 for the streamed w_down blocks)."""
    import math

    inner_l = cfg.intermediate_size // tp
    hd_l = (cfg.num_attention_heads // tp) * cfg.head_dim
    mlp_block = dk.mlp_i4_block(inner_l)
    group = math.gcd(math.gcd(cfg.hidden_size // 2, mlp_block // 2),
                     math.gcd(hd_l // 2, 128))
    return group, mlp_block


def _rope_consts(cfg, h=None, hkv=None):
    """Per-column rope tables over the fused [q | k | v] layout:
    (freqs (r/2,), is_rope, sign, base_idx, partner) — partner is the
    lane-roll pair index (j +/- r/2 within each head; v columns
    self-pair, their sin is 0).  r is the rotated width per head:
    head_dim normally, cfg.rotary_dim under phi partial rotary (the
    trailing d-r dims of each q/k head pass through like v columns —
    is_rope=0 there, so cos=1/sin=0).  h/hkv override for LOCAL
    (tp-shard) head counts."""
    h = cfg.num_attention_heads if h is None else h
    hkv = cfg.num_key_value_heads if hkv is None else hkv
    d = cfg.head_dim
    r = (cfg.rotary_dim
         if getattr(cfg, "partial_rotary_factor", 1.0) < 1.0 else d)
    half = r // 2
    freqs = 1.0 / (cfg.rope_theta
                   ** (jnp.arange(0, r, 2, dtype=jnp.float32) / r))
    n_qkv = (h + 2 * hkv) * d
    w_rope = (h + hkv) * d
    col = np.arange(n_qkv)
    col_j = col % d
    rotated = (col < w_rope) & (col_j < r)
    if getattr(cfg, "pos_emb_type", "rope") == "learned":
        # OPT-class: no rotary at all — all-False rotation mask makes
        # every kernel's rope epilogue the identity (cos=1, sin=0)
        rotated = np.zeros_like(rotated)
    partner = np.where(rotated,
                       np.where(col_j < half, col + half, col - half), col)
    return (freqs, jnp.asarray(rotated),
            jnp.asarray(np.where(col_j < half, -1.0, 1.0), jnp.float32),
            jnp.asarray(col_j % half), jnp.asarray(partner))


def _local_row_range(sh, shape):
    """[lo, hi) of the leading ('data'-sharded) axis owned by THIS
    process under sharding ``sh`` (contiguous for the (data, model)
    meshes this engine builds)."""
    pid = jax.process_index()
    rows = [idx[0] for d, idx in sh.devices_indices_map(tuple(shape)).items()
            if d.process_index == pid]
    lo = min(r.start or 0 for r in rows)
    hi = max(r.stop if r.stop is not None else shape[0] for r in rows)
    return lo, hi


def _params_packed(tree) -> bool:
    """True if any layer carries packed quant buffers instead of an fp
    kernel (a from_quantized / AutoAWQ-imported params tree)."""
    if isinstance(tree, dict):
        if "qweight" in tree:
            return True
        return any(_params_packed(v) for v in tree.values())
    return False


def _kv_shard_perm(hkv: int, tp: int) -> np.ndarray:
    """Axis-1 permutation of the combined [K | V] cache (2*hkv rows of
    heads) into shard-major [k_s | v_s] blocks."""
    hkvl = hkv // tp
    idx = []
    for s in range(tp):
        idx.append(np.arange(s * hkvl, (s + 1) * hkvl))
        idx.append(np.arange(hkv + s * hkvl, hkv + (s + 1) * hkvl))
    return np.concatenate(idx)


def recommended_kv(ctx_len: int, sliding_window: Optional[int] = None):
    """Measured KV-cache policy for the DecodeEngine (BENCH_NOTES
    r3l/r3n, 1.1B GQA on v5e): below ~2k context bf16 KV wins — the
    VPU dequant/unpack overhead exceeds the cache-read saving while
    the cache is a minority of step traffic (ctx 1024: bf16-KV 8431
    tok/s > kv4 7497).  At long context the read dominates and
    channel-static int4 KV wins big (ctx 4096: kv4 5594 > bf16-KV
    2590, 2.16x).  Returns (kv_dtype, kv_scale_mode) for the expected
    serving context length.

    Sliding-window models read at most `window` cache columns (the
    rolling cache / floored ragged starts), so the operating point is
    min(ctx, window) — at ctx 4096 window 1024 the rolling bf16-KV
    engine beat rolling kv8c 5592 vs 5298 (r3s)."""
    if sliding_window:
        ctx_len = min(ctx_len, sliding_window)
    return ("int4", "channel") if ctx_len >= 2048 else (None, "token")


class DecodeEngine:
    """Extracted-weight decode engine over megakernels: greedy or
    sampled, equal-length or ragged batches, EOS early exit, dp x tp
    meshes (multi-host capable) — see the module docstring."""

    def __init__(self, lm, mode: str = "bf16",
                 act_stats: Optional[Dict[str, jnp.ndarray]] = None,
                 act_margin: float = 1.0, kv_dtype=None, unroll: int = 1,
                 merge_o: bool = False, mesh=None,
                 prefill_quant: bool = False,
                 head_quant: Optional[str] = None,
                 kv_scale_mode: str = "token", kv_margin: float = 2.0,
                 gptq_grams: Optional[Dict[str, jnp.ndarray]] = None):
        if mode not in ("bf16", "w8a8_static", "w4a8_static"):
            raise ValueError(mode)
        if mode != "bf16" and act_stats is None:
            raise ValueError(f"{mode} needs act_stats "
                             "(see DecodeEngine.calibrate_scales)")
        if gptq_grams and mode == "bf16":
            raise ValueError("gptq_grams places quantized weight codes; "
                             "bf16 mode has none (use w8a8/w4a8_static)")
        cfg = lm.config
        # DeepSeek-V2 MLA (models/mla.py): the engine serves the
        # ABSORBED form against the (B, T, r+dr) latent cache — its own
        # extraction + layer path (_init_mla / _mla_layer)
        self.mla = getattr(cfg, "kv_lora_rank", None) is not None
        if self.mla:
            self._init_mla(lm, mode, act_stats, act_margin, kv_dtype,
                           unroll, merge_o, mesh, prefill_quant,
                           head_quant, kv_scale_mode, kv_margin,
                           gptq_grams)
            return
        # Mixtral-family sparse MoE: the attention half serves through
        # the same megakernels; the expert MLP runs as stacked-expert
        # XLA einsums ('bk,ekf->ebf' batched over E — dense-exact, the
        # same math the module path uses for decode).  At serve batch
        # sizes most experts are hit every step anyway, so reading all
        # E expert weights is near the gathered-dispatch traffic with
        # none of the dynamic-shape cost.
        self.moe = getattr(cfg, "num_experts", 0) > 0
        if self.moe:
            if mesh is not None and (
                    "model" in getattr(mesh, "axis_names", ()) and
                    int(mesh.shape["model"]) > 1):
                raise NotImplementedError(
                    "MoE engine serving is dp-only under a mesh; for "
                    "expert parallelism use parallel.mesh.moe_ep_forward "
                    "(module path)")
            if merge_o:
                raise NotImplementedError(
                    "merge_o fuses o_proj into the dense MLP kernel; "
                    "MoE has no dense MLP kernel to merge into")
        # SPMD serving (module docstring): tp = size of the mesh's
        # 'model' axis, dp = size of its 'data' axis (batch sharding,
        # weights replicated).  No mesh (or a 1x1 mesh) = the
        # single-device path.
        self.mesh = mesh
        self.tp = int(mesh.shape["model"]) if (
            mesh is not None and "model" in mesh.axis_names) else 1
        self.dp = int(mesh.shape["data"]) if (
            mesh is not None and "data" in mesh.axis_names) else 1
        self.spmd = self.tp > 1 or self.dp > 1
        # multi-host (DCN) mesh: placement cannot jax.device_put a
        # host-local array onto non-addressable devices — build global
        # arrays from each process's local portion instead
        self.multihost = bool(mesh is not None and any(
            d.process_index != jax.process_index()
            for d in mesh.devices.flat))
        if self.tp > 1:
            if merge_o:
                raise NotImplementedError(
                    "tensor-parallel engine: merge_o is a single-device "
                    "option (the merged kernel's o_proj epilogue has no "
                    "psum seam)")
            if (cfg.num_attention_heads % self.tp
                    or cfg.num_key_value_heads % self.tp
                    or cfg.intermediate_size % self.tp
                    or cfg.vocab_size % self.tp):
                raise ValueError(
                    f"heads/kv-heads/intermediate/vocab must divide "
                    f"tp={self.tp}")
        # the engine covers the WHOLE registry config space: qkv bias
        # (qwen2), layernorm (stablelm), parallel residual + logit
        # scale + tied embeds (cohere) — see _layer
        if cfg.logit_scale <= 0:
            raise ValueError("logit_scale must be positive (greedy "
                             "argmax drops it as a monotone transform)")
        # w4a8 on non-canonical archs: the i4 kernels carry no
        # bias/layernorm epilogues, so those pieces run XLA-side —
        # layernorm prologues via _xla_norm (norm_scale=None into the
        # kernel), qkv bias added post-kernel (which forces rope out
        # of the kernel epilogue: rope is position-dependent, the bias
        # must land pre-rotation), parallel residual off the shared
        # XLA norm.  Covers qwen2 (bias), stablelm (layernorm),
        # cohere (parallel+gated), qwen3 (qk-norm).  Still excluded:
        # the phi-class ungated/all-bias MLP (below).
        self.lm = lm
        self.cfg = cfg
        self.mode = mode
        self.dtype = lm.dtype
        # int8 KV cache: halves the cache HBM traffic that dominates
        # decode attention.  Two scale schemes:
        # * 'token'   — per-token per-head scales, exact-range but the
        #   kernel pays (g, T) scale multiplies + scale-plane reads
        #   (measured LOSER vs bf16 at ctx 1024, BENCH_NOTES round 3);
        # * 'channel' — per-(head, depth-channel) STATIC scales set at
        #   prefill (x kv_margin headroom, decode writes clip; the
        #   margin sweep showed clipping, not resolution, is the
        #   binding error — 2.0 matches per-token agreement).  K
        #   scales fold into q, V scales into the output — zero
        #   per-token scale arithmetic in the kernel
        #   (decode_attention_kv_i8c), so the halved cache read is pure
        #   saving.  Quality is a measured trade (quality-table row).
        # kv_dtype='int4' packs two depth channels per cache byte
        # (pack_kv_int4) — a QUARTER of the bf16 cache read.  int4 KV
        # is channel-static only (per-token int4 scales would cost
        # more arithmetic than the per-token int8 scheme that already
        # loses), so kv_scale_mode is forced to 'channel'.
        if kv_dtype == "auto":
            raise ValueError(
                "kv_dtype='auto' needs the serving context length: use "
                "recommended_kv(ctx_len) -> (kv_dtype, kv_scale_mode) "
                "(measured policy, BENCH_NOTES)")
        self.kv_dtype = kv_dtype
        if kv_dtype == "int4":
            if cfg.head_dim % 2:
                raise ValueError("int4 KV packs depth-channel pairs; "
                                 f"head_dim={cfg.head_dim} must be even")
            kv_scale_mode = "channel"
        if kv_scale_mode not in ("token", "channel"):
            raise ValueError(f"kv_scale_mode: {kv_scale_mode!r}")
        if kv_scale_mode == "channel" and kv_dtype not in (jnp.int8, "int4"):
            raise ValueError("kv_scale_mode='channel' requires "
                             "kv_dtype=jnp.int8 or 'int4'")
        # quantized-KV code range: int8 codes span +-127, int4 +-7
        self._kv_qmax = 7.0 if kv_dtype == "int4" else 127.0
        self.kv_scale_mode = kv_scale_mode
        self.kv_margin = float(kv_margin)
        # mistral/qwen2 sliding-window attention: the engine serves a
        # ROLLING window-slot cache — decode writes slot pos % W, the
        # kernels' `t_ids <= pos` mask is already exact on it (pre-wrap
        # the slot order IS position order; post-wrap every slot is in
        # the window), so long-context decode reads W cache columns
        # instead of ctx with zero kernel changes.  Rolling engages
        # only when the serving length exceeds the window (prefill
        # re-lays the last-W prompt positions into slot order).
        self.window = getattr(cfg, "sliding_window", None)
        if self.window is not None:
            self.window = int(self.window)
            if jax.default_backend() == "tpu" and self.window % 128:
                raise ValueError(
                    f"sliding_window={self.window} must be a multiple "
                    "of 128 on TPU (the rolling cache's T axis rides "
                    "the 128 lanes)")
        # gemma2/3: per-layer local/global alternation — windowed
        # layers get rolling/floored caches, global layers full ones
        self._layer_windows = [
            cfg.layer_window(l) if hasattr(cfg, "layer_window") else
            self.window for l in range(cfg.num_hidden_layers)]
        # gemma2 soft-caps + sandwich norms (engine support: bf16 /
        # w8a8_static, single device, bf16 KV for the capped attention)
        self.sandwich = bool(getattr(cfg, "sandwich_norms", False))
        self.attn_softcap = float(
            getattr(cfg, "attn_logit_softcapping", None) or 0.0)
        self.final_softcap = float(
            getattr(cfg, "final_logit_softcapping", None) or 0.0)
        # attention scale override rides on q (logits = (q*r) k / sqrt(d)
        # == q k * attn_scale), so every KV-format kernel inherits it
        self._q_scale_ratio = float(
            getattr(cfg, "attn_scale", cfg.head_dim ** -0.5)
            * cfg.head_dim ** 0.5)
        if abs(self._q_scale_ratio - 1.0) < 1e-9:
            # float noise from the -0.5/+0.5 power round-trip must not
            # inject a needless (and bf16-lossy) q multiply
            self._q_scale_ratio = 1.0
        if self.sandwich or self.attn_softcap:
            # w4a8 works too: the sandwich post-norms run in XLA, the
            # pre-ff norm is the i4 MLP prologue, and the soft-cap
            # tanh lives in the (mode-independent) attention kernels
            if self.tp > 1:
                raise NotImplementedError(
                    "gemma2-class serving is dp-only under a mesh "
                    "(sandwich norms/softcap aren't threaded through "
                    "the tp-split megakernels yet)")
            if merge_o:
                raise NotImplementedError(
                    "merge_o fuses the residual the sandwich norms "
                    "re-order; serve gemma2 without merge_o")
        if self.attn_softcap and kv_dtype is not None:
            raise NotImplementedError(
                "attention soft-capping runs on the bf16 KV kernels "
                "(quantized-KV variants carry no tanh epilogue)")
        # phi-class features: ungated fc1->act->fc2 MLP (runs as XLA
        # einsums off the parallel-residual branch, like _moe_mlp),
        # biases on every linear (the dense kernels' bias epilogue +
        # XLA adds), partial rotary (the generalized _rope_consts
        # tables applied XLA-side — the kernels' lane-roll partner is
        # head_dim/2, not rotary_dim/2)
        self.ungated = not getattr(cfg, "mlp_gated", True)
        self.all_bias = getattr(cfg, "all_bias", False)
        # qwen3-class QK-norm: per-head q/k RMSNorm sits BETWEEN the
        # projection and rope, so rope leaves the qkv kernel epilogue
        # and runs XLA-side after the norm (the phi partial-rotary
        # machinery — same generalized tables)
        self.qk_norm = bool(getattr(cfg, "qk_norm", False))
        self.rope_in_xla = (getattr(cfg, "partial_rotary_factor", 1.0) < 1.0
                            or self.qk_norm
                            or (mode == "w4a8_static"
                                and cfg.attention_bias))
        if self.ungated or self.all_bias or self.rope_in_xla or (
                mode == "w4a8_static" and (cfg.attention_bias
                                           or cfg.norm_type != "rmsnorm"
                                           or cfg.parallel_residual)):
            if self.tp > 1:
                raise NotImplementedError(
                    "phi/qwen3/non-canonical-w4a8 serving is dp-only "
                    "under a mesh (the XLA-side rope partner perm and "
                    "bias epilogues assume the global head layout)")
        self._partner = (_rope_consts(cfg)[4] if self.rope_in_xla
                         else None)
        # full partner perm for the batch-1 bf16 XLA-layer variant
        # (_layer_xla_b1), kept regardless of rope_in_xla
        self._partner_any = _rope_consts(cfg)[4]
        # gemma3 dual rope: windowed layers rotate with the LOCAL base
        # freq at raw positions; global layers fold the linear scaling
        # factor into their freqs (exactly as the module's rope() does,
        # so tokens stay bit-equal)
        self.dual_rope = getattr(cfg, "rope_local_theta", None) is not None
        self._pos_scale = 1.0 / getattr(cfg, "rope_scaling_factor", 1.0)
        if self.dual_rope:
            if self.tp > 1:
                raise NotImplementedError(
                    "dual-rope (gemma3) serving is dp-only under a "
                    "mesh (the local-theta trig tables aren't built "
                    "for tp-local fused-qkv layouts yet)")
            r = cfg.head_dim
            self._freqs_local = 1.0 / (
                cfg.rope_local_theta
                ** (jnp.arange(0, r, 2, dtype=jnp.float32) / r))
        else:
            self._freqs_local = None
        # attention kernel batch rows per program (measured sweep:
        # bb=2 is fastest at the serve shapes — bench_decode_probe)
        self.block_b = 2
        # lax.scan unroll over decode steps: probes whether the
        # measured scan-interleaving overhead (chained-layer marginal
        # ~96us vs ~186us realized in-scan, BENCH_NOTES round 3) is
        # per-iteration scan machinery XLA can amortize
        self.unroll = unroll
        # fold o_proj + residual + MLP into ONE dense megakernel after
        # attention (2 pallas calls/layer instead of 3).  Merging into
        # the attention kernel instead is relayout-blocked on Mosaic
        # (sublane->lane flatten, decode_kernels module comment).
        # Neutral at batch 32 (launches overlap compute there) but a
        # batch-1 lever, where per-launch fixed cost dominates the
        # engine step (BENCH_NOTES round 3)
        self.merge_o = (merge_o and mode in ("w8a8_static", "w4a8_static")
                        and cfg.norm_type == "rmsnorm"
                        and not cfg.parallel_residual)
        if mode == "w4a8_static":
            self.i4_group, self.i4_mlp_block = _i4_layout(cfg, self.tp)
        p = lm.params
        if _params_packed(p):
            # a from_quantized / AutoAWQ-imported model: materialize
            # the dequantized fp kernels once (the values the packed
            # module path computes with), then re-quantize into the
            # engine's planar layouts below.  Counterpart of the
            # reference's fuse_layers over loaded WQLinear modules
            # (models/base.py:1494-1515).
            from qdm_tpu.models import llama as llama_lib
            from qdm_tpu.quant import apply as qapply

            tmpl = llama_lib.LlamaForCausalLM(config=cfg, dtype=lm.dtype)
            shapes = jax.eval_shape(
                lambda: tmpl.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 8), jnp.int32)))["params"]
            p = qapply.unpack_params(p, lm.plan, shapes)

        def scale_of(key):
            s = jnp.clip(jnp.max(act_stats[key]), 1e-5, None) / 127.0
            return (s * act_margin).astype(jnp.float32)

        # GPTQ weight placement (DecodeEngine.gptq_grams -> per-layer
        # input Hessians): codes on the SAME engine grids, rounding
        # error redistributed through H.  Layers without a
        # matching-shape Gram fall back to plain RTN codes; with an
        # identity Hessian the codes ARE the RTN codes (tested), so
        # this is a pure quality lever at identical serving speed.
        grams = gptq_grams or {}

        def gram_for(key, k_dim):
            h_ = grams.get(key)
            if h_ is not None and getattr(h_, "shape", None) == (k_dim,
                                                                 k_dim):
                return h_
            return None

        def qw8(w, key):
            h_ = gram_for(key, w.shape[0])
            return _quant_w_gptq(w, h_) if h_ is not None else _quant_w(w)

        def qw4(w, key, group, block=0, rowsharded=False):
            h_ = gram_for(key, w.shape[0])
            if rowsharded:
                if h_ is not None:
                    return _quant_w4_gptq_rowsharded(w, h_, group, self.tp,
                                                     block=block)
                return _quant_w4_rowsharded(w, group, self.tp, block=block)
            if h_ is not None:
                return _quant_w4_gptq(w, h_, group, block=block)
            return _quant_w4(w, group, block=block)

        qkv_perm = (_qkv_shard_perm(cfg.num_attention_heads,
                                    cfg.num_key_value_heads, cfg.head_dim,
                                    self.tp) if self.tp > 1 else None)
        layers = []
        for l in range(cfg.num_hidden_layers):
            lp = p[f"layers_{l}"]
            at = lp["self_attn"]
            w_qkv = jnp.concatenate(
                [at["q_proj"]["kernel"], at["k_proj"]["kernel"],
                 at["v_proj"]["kernel"]], axis=1).astype(self.dtype)
            if qkv_perm is not None:
                w_qkv = w_qkv[:, qkv_perm]
            w_o = at["o_proj"]["kernel"].astype(self.dtype)
            if self.moe:
                # stacked-expert tensors (E, K, F)/(E, F, K): one
                # batched einsum per projection replaces E separate
                # matmuls (HF-Mixtral param names, models/moe.py)
                moe_p = lp["block_sparse_moe"]
                n_e = cfg.num_experts
                router = moe_p["gate"]["kernel"].astype(self.dtype)
                W1 = jnp.stack([moe_p[f"experts_{e}"]["w1"]["kernel"]
                                for e in range(n_e)]).astype(self.dtype)
                W3 = jnp.stack([moe_p[f"experts_{e}"]["w3"]["kernel"]
                                for e in range(n_e)]).astype(self.dtype)
                W2 = jnp.stack([moe_p[f"experts_{e}"]["w2"]["kernel"]
                                for e in range(n_e)]).astype(self.dtype)
            elif self.ungated:
                mp_ = lp["mlp"]
                w1 = mp_["fc1"]["kernel"].astype(self.dtype)
                w2 = mp_["fc2"]["kernel"].astype(self.dtype)
            else:
                mp_ = lp["mlp"]
                wg = mp_["gate_proj"]["kernel"].astype(self.dtype)
                wu = mp_["up_proj"]["kernel"].astype(self.dtype)
                wd = mp_["down_proj"]["kernel"].astype(self.dtype)
            entry = {
                "ln1": lp["input_layernorm"]["scale"].astype(jnp.float32),
            }
            if self.qk_norm:
                entry["qn"] = at["q_norm"]["scale"].astype(jnp.float32)
                entry["kn"] = at["k_norm"]["scale"].astype(jnp.float32)
            if self.sandwich:
                # gemma2: ln2 is the MLP-kernel prologue norm (the
                # pre-feedforward one); the two POST norms run in XLA
                entry["ln2"] = lp["pre_feedforward_layernorm"][
                    "scale"].astype(jnp.float32)
                entry["ln_pa"] = lp["post_attention_layernorm"][
                    "scale"].astype(jnp.float32)
                entry["ln_pf"] = lp["post_feedforward_layernorm"][
                    "scale"].astype(jnp.float32)
            elif not cfg.parallel_residual or getattr(
                    cfg, "parallel_norms", False):
                # gpt-neox: the parallel MLP branch runs off its OWN
                # norm (parallel_norms), so ln2 is needed there too
                entry["ln2"] = lp["post_attention_layernorm"][
                    "scale"].astype(jnp.float32)
            if cfg.norm_type == "layernorm":
                entry["ln1_b"] = lp["input_layernorm"]["bias"].astype(
                    jnp.float32)
                if not cfg.parallel_residual or getattr(
                        cfg, "parallel_norms", False):
                    entry["ln2_b"] = lp["post_attention_layernorm"][
                        "bias"].astype(jnp.float32)
            if cfg.attention_bias:
                b_qkv = jnp.concatenate(
                    [at["q_proj"]["bias"], at["k_proj"]["bias"],
                     at["v_proj"]["bias"]]).astype(jnp.float32)
                if qkv_perm is not None:
                    b_qkv = b_qkv[qkv_perm]
                entry["b_qkv"] = b_qkv
            if self.all_bias:
                entry["b_o"] = at["o_proj"]["bias"].astype(jnp.float32)
                if self.ungated:
                    entry["b_fc1"] = lp["mlp"]["fc1"]["bias"].astype(
                        jnp.float32)
                    entry["b_fc2"] = lp["mlp"]["fc2"]["bias"].astype(
                        jnp.float32)
            if self.moe and mode == "bf16":
                entry.update(w_qkv=w_qkv, w_o=w_o, router=router,
                             W1=W1, W3=W3, W2=W2)
            elif self.moe and mode == "w4a8_static":
                # stacked-expert int4: HALF the int8 path's expert
                # weight stream (MoE decode reads every expert), one
                # pallas call for the whole MLP + routing combine
                pre = f"layers_{l}/block_sparse_moe"
                entry["w_qkv"], entry["s_qkv"] = qw4(
                    w_qkv, f"layers_{l}/self_attn/q_proj", self.i4_group)
                entry["w_o"], entry["s_o"] = qw4(
                    w_o, f"layers_{l}/self_attn/o_proj", self.i4_group)
                entry["router"] = router
                entry["W1"], entry["sW1"] = dk.pack_moe_expert_i4(
                    W1, self.i4_group)
                entry["W3"], entry["sW3"] = dk.pack_moe_expert_i4(
                    W3, self.i4_group)
                entry["W2"], entry["sW2"] = dk.pack_moe_expert_i4(
                    W2, self.i4_group, block=self.i4_mlp_block)
                entry["a_qkv"] = scale_of(
                    f"layers_{l}/self_attn/q_proj").reshape(1)
                entry["a_o"] = scale_of(
                    f"layers_{l}/self_attn/o_proj").reshape(1)
                entry["a_moe_scl"] = jnp.concatenate(
                    [scale_of(f"{pre}/experts_0/w1").reshape(1),
                     jnp.stack([scale_of(f"{pre}/experts_{e}/w2")
                                for e in range(cfg.num_experts)])])
            elif self.moe:                        # w8a8_static MoE
                pre = f"layers_{l}/block_sparse_moe"
                entry["w_qkv"], entry["s_qkv"] = qw8(
                    w_qkv, f"layers_{l}/self_attn/q_proj")
                entry["w_o"], entry["s_o"] = qw8(
                    w_o, f"layers_{l}/self_attn/o_proj")
                entry["router"] = router          # fp router (reference
                # modules_to_not_convert semantics: routing stays exact)
                entry["W1"], entry["sW1"] = _quant_w_stacked(W1)
                entry["W3"], entry["sW3"] = _quant_w_stacked(W3)
                entry["W2"], entry["sW2"] = _quant_w_stacked(W2)
                entry["a_qkv"] = scale_of(
                    f"layers_{l}/self_attn/q_proj").reshape(1)
                entry["a_o"] = scale_of(
                    f"layers_{l}/self_attn/o_proj").reshape(1)
                # shared expert input scale (every expert sees the same
                # normed activations on the dense-exact path) + the
                # per-expert down-projection input scales
                entry["a_moe"] = scale_of(f"{pre}/experts_0/w1").reshape(1)
                entry["a_w2"] = jnp.stack(
                    [scale_of(f"{pre}/experts_{e}/w2")
                     for e in range(cfg.num_experts)])        # (E,)
            elif self.ungated and mode == "bf16":
                entry.update(w_qkv=w_qkv, w_o=w_o, w1=w1, w2=w2)
            elif self.ungated and mode == "w4a8_static":
                pre = f"layers_{l}"
                entry["w_qkv"], entry["s_qkv"] = qw4(
                    w_qkv, f"{pre}/self_attn/q_proj", self.i4_group)
                entry["w_o"], entry["s_o"] = qw4(
                    w_o, f"{pre}/self_attn/o_proj", self.i4_group)
                entry["w1"], entry["s1"] = qw4(w1, f"{pre}/mlp/fc1",
                                               self.i4_group)
                entry["w2"], entry["s2"] = qw4(w2, f"{pre}/mlp/fc2",
                                               self.i4_group)
                entry["a_qkv"] = scale_of(
                    f"{pre}/self_attn/q_proj").reshape(1)
                entry["a_o"] = scale_of(f"{pre}/self_attn/o_proj").reshape(1)
                entry["a_fc"] = jnp.stack(
                    [scale_of(f"{pre}/mlp/fc1"),
                     scale_of(f"{pre}/mlp/fc2")])
            elif self.ungated:                    # w8a8_static phi
                pre = f"layers_{l}"
                entry["w_qkv"], entry["s_qkv"] = qw8(
                    w_qkv, f"{pre}/self_attn/q_proj")
                entry["w_o"], entry["s_o"] = qw8(
                    w_o, f"{pre}/self_attn/o_proj")
                entry["w1"], entry["s1"] = qw8(w1, f"{pre}/mlp/fc1")
                entry["w2"], entry["s2"] = qw8(w2, f"{pre}/mlp/fc2")
                entry["a_qkv"] = scale_of(
                    f"{pre}/self_attn/q_proj").reshape(1)
                entry["a_o"] = scale_of(f"{pre}/self_attn/o_proj").reshape(1)
                entry["a_fc"] = jnp.stack(
                    [scale_of(f"{pre}/mlp/fc1"),
                     scale_of(f"{pre}/mlp/fc2")])
            elif mode == "bf16":
                entry.update(w_qkv=w_qkv, w_o=w_o, wg=wg, wu=wu, wd=wd)
            elif mode == "w8a8_static":
                pre = f"layers_{l}"
                entry["w_qkv"], entry["s_qkv"] = qw8(
                    w_qkv, f"{pre}/self_attn/q_proj")
                entry["w_o"], entry["s_o"] = qw8(
                    w_o, f"{pre}/self_attn/o_proj")
                entry["wg"], entry["sg"] = qw8(wg, f"{pre}/mlp/gate_proj")
                entry["wu"], entry["su"] = qw8(wu, f"{pre}/mlp/up_proj")
                entry["wd"], entry["sd"] = qw8(wd, f"{pre}/mlp/down_proj")
                entry["a_qkv"] = scale_of(
                    f"{pre}/self_attn/q_proj").reshape(1)
                entry["a_o"] = scale_of(f"{pre}/self_attn/o_proj").reshape(1)
                entry["a_mlp"] = jnp.stack(
                    [scale_of(f"{pre}/mlp/gate_proj"),
                     scale_of(f"{pre}/mlp/down_proj")])
            else:  # w4a8_static
                pre = f"layers_{l}"
                entry["w_qkv"], entry["s_qkv"] = qw4(
                    w_qkv, f"{pre}/self_attn/q_proj", self.i4_group)
                entry["wg"], entry["sg"] = qw4(
                    wg, f"{pre}/mlp/gate_proj", self.i4_group)
                entry["wu"], entry["su"] = qw4(
                    wu, f"{pre}/mlp/up_proj", self.i4_group)
                if self.tp > 1:
                    # row-split weights pack per shard (helper doc)
                    entry["w_o"], entry["s_o"] = qw4(
                        w_o, f"{pre}/self_attn/o_proj", self.i4_group,
                        rowsharded=True)
                    entry["wd"], entry["sd"] = qw4(
                        wd, f"{pre}/mlp/down_proj", self.i4_group,
                        block=self.i4_mlp_block, rowsharded=True)
                else:
                    entry["w_o"], entry["s_o"] = qw4(
                        w_o, f"{pre}/self_attn/o_proj", self.i4_group)
                    entry["wd"], entry["sd"] = qw4(
                        wd, f"{pre}/mlp/down_proj", self.i4_group,
                        block=self.i4_mlp_block)
                entry["a_qkv"] = scale_of(
                    f"{pre}/self_attn/q_proj").reshape(1)
                entry["a_o"] = scale_of(f"{pre}/self_attn/o_proj").reshape(1)
                entry["a_mlp"] = jnp.stack(
                    [scale_of(f"{pre}/mlp/gate_proj"),
                     scale_of(f"{pre}/mlp/down_proj")])
            layers.append(entry)
        self.layers = layers
        self.embed = p["embed_tokens"]["embedding"].astype(self.dtype)
        # OPT-class learned absolute positions: the decode step adds
        # pos_tab[pos + offset] after the token-embed lookup (prefill
        # runs through the module, which adds its own).  Closed over by
        # the jitted run closures (a few-MB table, single-device only).
        self._pos_tab = None
        self._pos_off = 0
        if getattr(cfg, "pos_emb_type", "rope") == "alibi":
            raise NotImplementedError(
                "alibi (baichuan-13b-class) serving runs through the "
                "module path (CausalLM.generate) — the decode "
                "megakernels carry rope trig, not additive biases")
        if getattr(cfg, "pos_emb_type", "rope") == "learned":
            if self.tp > 1:
                raise NotImplementedError(
                    "learned-position (OPT-class) serving is dp-only "
                    "under a mesh (the position table rides replicated "
                    "in the decode closure)")
            self._pos_tab = p["embed_positions"]["embedding"].astype(
                self.dtype)
            self._pos_off = int(getattr(cfg, "learned_pos_offset", 0))
        self.final_norm = p["norm"]["scale"].astype(jnp.float32)
        self.final_norm_b = (p["norm"]["bias"].astype(jnp.float32)
                             if cfg.norm_type == "layernorm" else None)
        if cfg.tie_word_embeddings:
            self.w_head = self.embed.T
        else:
            self.w_head = p["lm_head"]["kernel"].astype(self.dtype)
        head_bias = (cfg.all_bias if getattr(cfg, "lm_head_bias", None)
                     is None else cfg.lm_head_bias)
        self.head_bias = (p["lm_head"]["bias"].astype(jnp.float32)
                          if head_bias and not cfg.tie_word_embeddings
                          else None)
        if getattr(cfg, "norm_plus_one", False):
            # gemma (1+w) norms: fold the +1 into the snapshotted scales
            # so every kernel keeps standard rmsnorm semantics
            for entry in self.layers:
                for k in ("ln1", "ln2", "ln_pa", "ln_pf", "qn", "kn"):
                    if k in entry:
                        entry[k] = entry[k] + 1.0
            self.final_norm = self.final_norm + 1.0
        if getattr(cfg, "scale_embeddings", False):
            # gemma sqrt(hidden) embed scaling — folded into the
            # engine's embedding table (w_head above stays unscaled;
            # the tied head reads raw embeddings)
            self.embed = self.embed * jnp.asarray(
                cfg.hidden_size ** 0.5, self.embed.dtype)
        # opt-in quantized lm_head: per-out-channel int8 codes or
        # group-128 planar int4, plus the calibrated static scale of
        # the final-norm output.  The head is the single largest
        # decode weight read (vocab x hidden = 131 MB bf16 on the 1B
        # bench model — ~8% of the batch-1 step); int8 halves it,
        # int4 quarters it.  Greedy argmax is NOT invariant to head
        # quantization, so this is a measured-quality option (quality
        # table rows), not a default.
        self.head_quant = head_quant
        if head_quant is not None:
            if head_quant not in ("int8", "int4"):
                raise ValueError(f"head_quant: {head_quant!r} "
                                 "(supported: 'int8', 'int4')")
            if self.spmd:
                raise NotImplementedError(
                    "head_quant is a single-device option (the sharded "
                    "head is vocab-split / replicated bf16)")
            if act_stats is None or "lm_head" not in act_stats:
                raise ValueError(
                    "head_quant needs 'lm_head' act stats — calibrate "
                    "with DecodeEngine.calibrate_scales on a model with "
                    "an untied lm_head")
            if head_quant == "int4":
                # the i4 dense kernel does rmsnorm only (no
                # layernorm-bias prologue variant)
                if cfg.norm_type != "rmsnorm":
                    raise NotImplementedError(
                        "head_quant='int4' requires an rmsnorm final "
                        "norm (the i4 kernel has no layernorm prologue)")
                # planar packing needs the group to divide both K and
                # the K/2 nibble planes; fall back to one group per
                # plane on tiny (test) widths
                hs = cfg.hidden_size
                self._head_group = (128 if (hs // 2) % 128 == 0
                                    else hs // 2)
                wh_p, wh_s = qw4(self.w_head, "lm_head", self._head_group)
                self._head = (wh_p, wh_s, scale_of("lm_head").reshape(1))
            else:
                wh_q, wh_s = qw8(self.w_head, "lm_head")
                self._head = (wh_q, wh_s, scale_of("lm_head").reshape(1))
        else:
            self._head = self.w_head
        if self.spmd:
            # place each leaf on its shard once, up front (the decode
            # jit then sees correctly-sharded inputs; no resharding).
            # Weight specs reference only the 'model' axis, so under
            # dp they replicate across 'data' automatically.
            self._lspecs = [
                {k: self._tp_spec(k) for k in e} for e in self.layers]
            self.layers = jax.tree.map(self._put, self.layers,
                                       self._lspecs)
            self.embed = self._put(self.embed, P())
            self.final_norm = self._put(self.final_norm, P())
            self.w_head = self._put(self.w_head, P(None, "model"))
            self._head = self.w_head
        # opt-in int8 prefill: the (B, S) prefill forward is MXU-bound.
        # prefill_quant="dynamic" (old path) quantizes acts per-token at
        # runtime — measured NEUTRAL at (32, 1024): the dynamic-quant
        # elementwise passes cost what the int8 MXU saves (BENCH_NOTES
        # round 3 "int8 prefill is neutral").  prefill_quant=True /
        # "static" reuses the engine's calibrated act_stats as STATIC
        # per-tensor scales (the same scheme as the SD1.5 w8a8_xla
        # winner — no runtime quant pass, just one multiply folded into
        # the matmul epilogue); falls back to dynamic without act_stats.
        # prefill_quant="fused": the engine-native fused-block prefill
        # (r4) — per-token act quant INSIDE the Pallas matmuls (the
        # SD GEGLU trick), fused [q|k|v] / [up|gate] projections, and
        # the GQA flash kernel with in-kernel q-rope.  Dynamic-scale
        # quality (KL ~0.003 vs static's 0.029) at better-than-static
        # speed; falls back to the bf16 module prefill on shapes the
        # kernels don't take (unaligned s).
        self.prefill_fused = (prefill_quant == "fused" and mode != "bf16")
        if prefill_quant == "fused":
            prefill_quant = False
        self.prefill_quant = prefill_quant and mode != "bf16"
        if self.prefill_quant:
            from qdm_tpu.quant.apply import (fill_static_act_scales,
                                             pack_params)
            from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan

            static = (prefill_quant != "dynamic"
                      and act_stats is not None)
            w8 = LayerQuantSpec(
                mode="w8a8_xla", w_bits=8, a_bits=8, quantize_act=True,
                act_quant="static" if static else "per_token")
            # "static_i8attn": static weights/acts PLUS int8 QK/PV
            # attention on the flash-prefill path (quantize_bmm_input
            # semantics — plan.int8_bmm routes it in the module)
            pplan = QuantPlan(
                default=w8,
                int8_bmm=(prefill_quant == "static_i8attn"),
            ).with_rule("lm_head", None)
            self._prefill_model = type(lm.model)(config=cfg,
                                                 dtype=self.dtype,
                                                 plan=pplan)
            # pack from `p` (the fp kernels), not lm.params — on a
            # from_quantized model lm.params is already packed and
            # pack_params would silently no-op on it
            pp = pack_params(p, pplan)
            if static:
                pp = fill_static_act_scales(pp, act_stats,
                                            margin=act_margin)
            self._prefill_params = pp
        else:
            # SNAPSHOT the module + params at construction: prefill
            # must keep working even if the caller later mutates the
            # lm (e.g. lm.quantize() repacks lm.params under a new
            # plan, which would no longer match lm.model's traced
            # structure mid-engine)
            self._prefill_model = lm.model
            self._prefill_params = lm.params
        if self.prefill_fused:
            self._build_fused_prefill(p)
        # memoized jitted closures (fresh @jax.jit per call re-traces
        # every time — the measured 4.3x pipeline bug, CLAUDE.md)
        self._run_cache: Dict = {}
        self._score_cache: Dict[int, callable] = {}
        self._prefill_fn = None
        self._prefix_fn = None
        self._prefixed_fn = None
        self._prefixed_ragged_fn = None
        self._prefill_ragged_fn = None
        self._admit_scatter_fn = None
        self._rebase_fn = None
        self._last_prefill_logits = None

    # ------------------------------------------------------------------ MLA

    def _init_mla(self, lm, mode, act_stats, act_margin, kv_dtype,
                  unroll, merge_o, mesh, prefill_quant, head_quant,
                  kv_scale_mode, kv_margin, gptq_grams):
        """DeepSeek-V2 MLA engine setup (models/mla.py is the module
        family; the reference names deepseek_v2 in its quantizer input
        capture, /root/reference/quantize/quantizer.py:1106-1116).

        The engine serves the ABSORBED form: fold W_UK (the per-head
        nope-key up-projection inside kv_b_proj) into the query and
        W_UV into the attention output, and attend DIRECTLY against the
        (B, T, r + dr) latent cache as a single MQA head of width
        r + dr.  Algebraically identical to the module's explicit form
        (q_nope . (W_UK c) == (W_UK^T q_nope) . c); the decode step
        reads r + dr floats/token of cache instead of 2*h*d — the
        HBM-bound-decode win MLA exists for (BENCH_NOTES: decode rides
        the HBM roofline).

        Supported: mode 'bf16' / 'w8a8_static', single device,
        generate()/prefill() (module-path prefill writes the latent
        cache natively — MLAAttention's len-1-tuple branch).  Quality
        note: the low-rank q/latent projections are MORE quant
        -sensitive than canonical projections — serve with smooth=True
        (SmoothQuant through the MLA scaling groups), which recovers
        the canonical-family w8a8 band (tools/mla_quality.json).  The MLA
        attention decode runs as XLA einsums, not megakernels: the
        whole step is a handful of dense contractions whose traffic is
        dominated by weights + the (tiny) latent cache; on w8a8_static
        the projections run as static-scale int8 XLA matmuls (the SD1.5
        w8a8_xla winner scheme).  The absorbed W_UK/W_UV tensors stay
        bf16: they contract against q/attention-outputs, a path with no
        calibrated activation scale (and only ~2x h*d*r params/layer).
        """
        cfg = self.cfg = lm.config
        if mode == "w4a8_static":
            raise NotImplementedError(
                "MLA serving modes are 'bf16' and 'w8a8_static' (the "
                "i4 planar kernels are built around fused-qkv rope "
                "epilogues MLA does not use; its projections run as "
                "static-int8 XLA matmuls)")
        if mesh is not None:
            raise NotImplementedError(
                "MLA serving is single-device (the latent cache is "
                "MQA-shaped — tp would shard only query heads; dp "
                "sharding of the (B, T, r+dr) cache is unimplemented); "
                "pass mesh=None")
        if kv_dtype is not None:
            raise NotImplementedError(
                "quantized-KV MLA serving: the latent cache is already "
                "r+dr (~576) floats/token, 10-50x under MHA KV; serve "
                "with kv_dtype=None")
        for flag, name in ((merge_o, "merge_o"),
                           (head_quant, "head_quant"),
                           (prefill_quant, "prefill_quant"),
                           (gptq_grams, "gptq_grams")):
            if flag:
                raise NotImplementedError(
                    f"{name} is not supported on the MLA engine path "
                    "(supported: bf16 / w8a8_static decode, module "
                    "prefill)")
        if (cfg.attention_bias or cfg.sliding_window
                or cfg.norm_type != "rmsnorm"):
            raise NotImplementedError(
                "the MLA engine assumes the deepseek shape: rmsnorm, "
                "no attention bias, no sliding window")
        if cfg.num_experts > 0 and cfg.moe_layout != "deepseek":
            raise NotImplementedError(
                "MLA engine MoE support follows the deepseek layout "
                "(mlp.gate router / mlp.experts_N / shared_experts)")

        # single-device, no special positional machinery
        self.mesh = None
        self.tp = self.dp = 1
        self.spmd = self.multihost = False
        self.moe = False          # _mla_layer handles deepseek MoE itself
        self.lm = lm
        self.mode = mode
        self.dtype = lm.dtype
        self.kv_dtype = None
        self.kv_scale_mode = "token"
        self.kv_margin = float(kv_margin)
        self._kv_qmax = 127.0
        self.window = None
        self._layer_windows = [None] * cfg.num_hidden_layers
        self.sandwich = False
        self.attn_softcap = 0.0
        self.final_softcap = float(
            getattr(cfg, "final_logit_softcapping", None) or 0.0)
        self._q_scale_ratio = 1.0
        self.block_b = 2
        self.unroll = unroll
        self.merge_o = False
        self.ungated = False
        self.all_bias = False
        self.qk_norm = False
        self.rope_in_xla = False
        self._partner = None
        self.dual_rope = False
        self._freqs_local = None
        self._pos_scale = 1.0
        self._pos_tab = None
        self._pos_off = 0
        self.head_quant = None
        self.prefill_fused = False
        self.prefill_quant = False
        # SNAPSHOT prefill module+params (same rationale as __init__)
        self._prefill_model = lm.model
        self._prefill_params = lm.params

        dr = cfg.qk_rope_head_dim
        # module rope() formula at d=dr (models/mla.py::mla_rope)
        self._mla_freqs = 1.0 / (
            cfg.rope_theta ** (jnp.arange(0, dr, 2, jnp.float32) / dr))
        # Latent-cache layouts, by measurement (BENCH_NOTES r5):
        # DEFAULT — (B, T, r+dr) module-native rows + XLA einsum
        # attention (b32 ctx1024: 5605 tok/s bf16).  The combined
        # [K|V]-kernel variant (QDM_MLA_KERNEL_ATTN=1: kv (B, 2, dpad,
        # T), dpad = round_up(r+dr, 128), K row [c|kpe|0] / V row
        # [c|0|0], one hkv=1 MQA head through the decode megakernels)
        # was BUILT AND MEASURED LOSING at every measurable shape
        # (3617 vs 5605 at b32 ctx1024; 2162 vs 2924 at b16 ctx2048)
        # — a single kv head gives the kernel grid almost no
        # parallelism and the duplicated c_kv doubles the cache read,
        # while XLA fuses the einsum softmax chain well at MQA widths.
        # The flag keeps the variant testable.
        import os as _os

        self._mla_kernel = bool(_os.environ.get("QDM_MLA_KERNEL_ATTN"))
        self._mla_dpad = _round_up(cfg.kv_lora_rank + dr, 128)

        p = lm.params
        if _params_packed(p):
            from qdm_tpu.models import llama as llama_lib
            from qdm_tpu.quant import apply as qapply

            tmpl = llama_lib.LlamaForCausalLM(config=cfg, dtype=lm.dtype)
            shapes = jax.eval_shape(
                lambda: tmpl.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 8), jnp.int32)))["params"]
            p = qapply.unpack_params(p, lm.plan, shapes)

        def scale_of(key):
            if key not in act_stats:
                raise ValueError(
                    f"act_stats missing {key!r} — calibrate with "
                    "DecodeEngine.calibrate_scales on this model")
            s = jnp.clip(jnp.max(act_stats[key]), 1e-5, None) / 127.0
            return (s * act_margin).astype(jnp.float32)

        i8 = mode == "w8a8_static"

        def q8(w, key):
            """(codes, per-oc scales, static act scale) triple; bf16
            mode returns the raw kernel."""
            if not i8:
                return w.astype(self.dtype)
            codes, ws = _quant_w(w)
            return (codes, ws, scale_of(key).reshape(1))

        h = cfg.num_attention_heads
        dn, dv, r = cfg.qk_nope_head_dim, cfg.v_head_dim, cfg.kv_lora_rank
        layers = []
        for l in range(cfg.num_hidden_layers):
            lp = p[f"layers_{l}"]
            at = lp["self_attn"]
            pre = f"layers_{l}"
            e = {
                "ln1": lp["input_layernorm"]["scale"].astype(jnp.float32),
                "ln2": lp["post_attention_layernorm"][
                    "scale"].astype(jnp.float32),
                "kvn": at["kv_a_layernorm"]["scale"].astype(jnp.float32),
            }
            if cfg.q_lora_rank:
                e["qan"] = at["q_a_layernorm"]["scale"].astype(jnp.float32)
                e["w_qa"] = q8(at["q_a_proj"]["kernel"],
                               f"{pre}/self_attn/q_a_proj")
                e["w_qb"] = q8(at["q_b_proj"]["kernel"],
                               f"{pre}/self_attn/q_b_proj")
            else:
                e["w_q"] = q8(at["q_proj"]["kernel"],
                              f"{pre}/self_attn/q_proj")
            e["w_kva"] = q8(at["kv_a_proj_with_mqa"]["kernel"],
                            f"{pre}/self_attn/kv_a_proj_with_mqa")
            e["w_o"] = q8(at["o_proj"]["kernel"],
                          f"{pre}/self_attn/o_proj")
            # absorbed kv_b split: (r, h, dn) keys / (r, h, dv) values
            kv_b = at["kv_b_proj"]["kernel"].astype(self.dtype) \
                .reshape(r, h, dn + dv)
            e["w_uk"] = kv_b[..., :dn]
            e["w_uv"] = kv_b[..., dn:]

            mlp = lp["mlp"]
            is_moe = (cfg.num_experts > 0
                      and l >= cfg.first_k_dense_replace)
            if not is_moe:
                e["wg"] = q8(mlp["gate_proj"]["kernel"],
                             f"{pre}/mlp/gate_proj")
                e["wu"] = q8(mlp["up_proj"]["kernel"],
                             f"{pre}/mlp/gate_proj")  # same input scale
                e["wd"] = q8(mlp["down_proj"]["kernel"],
                             f"{pre}/mlp/down_proj")
            else:
                n_e = cfg.num_experts
                e["router"] = mlp["gate"]["kernel"].astype(self.dtype)
                Wg = jnp.stack([mlp[f"experts_{x}"]["gate_proj"]["kernel"]
                                for x in range(n_e)]).astype(self.dtype)
                Wu = jnp.stack([mlp[f"experts_{x}"]["up_proj"]["kernel"]
                                for x in range(n_e)]).astype(self.dtype)
                Wd = jnp.stack([mlp[f"experts_{x}"]["down_proj"]["kernel"]
                                for x in range(n_e)]).astype(self.dtype)
                if i8:
                    e["Wg"], e["sWg"] = _quant_w_stacked(Wg)
                    e["Wu"], e["sWu"] = _quant_w_stacked(Wu)
                    e["Wd"], e["sWd"] = _quant_w_stacked(Wd)
                    # shared expert-input scale (all experts see the
                    # same normed stream) + per-expert down scales
                    e["a_moe"] = scale_of(
                        f"{pre}/mlp/experts_0/gate_proj").reshape(1)
                    e["a_wd"] = jnp.stack(
                        [scale_of(f"{pre}/mlp/experts_{x}/down_proj")
                         for x in range(n_e)])
                else:
                    e["Wg"], e["Wu"], e["Wd"] = Wg, Wu, Wd
                if getattr(cfg, "n_shared_experts", 0):
                    sh = mlp["shared_experts"]
                    e["sh_g"] = q8(sh["gate_proj"]["kernel"],
                                   f"{pre}/mlp/shared_experts/gate_proj")
                    e["sh_u"] = q8(sh["up_proj"]["kernel"],
                                   f"{pre}/mlp/shared_experts/gate_proj")
                    e["sh_d"] = q8(sh["down_proj"]["kernel"],
                                   f"{pre}/mlp/shared_experts/down_proj")
            layers.append(e)
        self.layers = layers
        self.embed = p["embed_tokens"]["embedding"].astype(self.dtype)
        self.final_norm = p["norm"]["scale"].astype(jnp.float32)
        self.final_norm_b = None
        if cfg.tie_word_embeddings:
            self.w_head = self.embed.T
        else:
            self.w_head = p["lm_head"]["kernel"].astype(self.dtype)
        self.head_bias = None
        self._head = self.w_head
        self._run_cache = {}
        self._score_cache = {}
        self._prefill_fn = None
        self._prefix_fn = None
        self._prefixed_fn = None
        self._prefixed_ragged_fn = None
        self._prefill_ragged_fn = None
        self._admit_scatter_fn = None
        self._rebase_fn = None
        self._last_prefill_logits = None

    def _mla_guard(self, feature: str):
        if getattr(self, "mla", False):
            raise NotImplementedError(
                f"{feature} is not implemented on the MLA (DeepSeek-V2) "
                "engine path — supported: generate()/prefill() decode "
                "in bf16 or w8a8_static on a single device against the "
                "(B, T, r+dr) latent cache (api/serve.py::_mla_layer)")

    def _mla_mm(self, x, w, out_f32: bool = False):
        """bf16 matmul or static-scale int8 XLA matmul, by extraction
        format (raw kernel vs (codes, w_scales, act_scale) triple)."""
        if not isinstance(w, tuple):
            y = x @ w
            return y.astype(jnp.float32) if out_f32 else y
        codes, ws, a = w
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a),
                      -127, 127).astype(jnp.int8)
        y = jnp.dot(xq, codes, preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * (ws * a)
        return y if out_f32 else y.astype(x.dtype)

    def _mla_layer(self, x, cache, w, pos):
        """One MLA decoder layer, absorbed-form decode (see _init_mla).
        x (bp, D) padded rows; cache ((B, T, r + dr),); pos traced
        scalar.  Returns (x, cache)."""
        cfg = self.cfg
        h = cfg.num_attention_heads
        dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
        dv, r = cfg.v_head_dim, cfg.kv_lora_rank
        qd = dn + dr
        eps = cfg.rms_norm_eps
        dt = x.dtype
        bp = x.shape[0]
        (C,) = cache
        b = C.shape[0]

        # rope at scalar pos on the dr-wide slice — the module's rope()
        # formula exactly (f32 trig, half-split rotation)
        ang = pos.astype(jnp.float32) * self._mla_freqs        # (dr/2,)
        cosv, sinv = jnp.cos(ang), jnp.sin(ang)

        def rot(y):                                            # (.., dr)
            yf = y.astype(jnp.float32)
            y1, y2 = yf[..., : dr // 2], yf[..., dr // 2:]
            return jnp.concatenate([y1 * cosv - y2 * sinv,
                                    y2 * cosv + y1 * sinv],
                                   axis=-1).astype(dt)

        xn = _xla_norm(x, w["ln1"], None, "rmsnorm", eps).astype(dt)
        if cfg.q_lora_rank:
            q = self._mla_mm(xn, w["w_qa"])
            q = _xla_norm(q, w["qan"], None, "rmsnorm", eps).astype(dt)
            q = self._mla_mm(q, w["w_qb"])
        else:
            q = self._mla_mm(xn, w["w_q"])
        q = q.reshape(bp, h, qd)
        q_nope, q_pe = q[..., :dn], rot(q[..., dn:])

        lat = self._mla_mm(xn, w["w_kva"])                     # (bp, r+dr)
        c_kv = _xla_norm(lat[..., :r], w["kvn"], None, "rmsnorm",
                         eps).astype(dt)
        k_pe = rot(lat[..., r:])
        q_abs = jnp.einsum("bhd,rhd->bhr", q_nope.astype(jnp.float32),
                           w["w_uk"].astype(jnp.float32))

        if not self._mla_kernel:
            # DEFAULT (measured winner, see _init_mla): module-native
            # (B, T, r+dr) cache rows + the XLA einsum softmax chain —
            # the absorbed attention is one MQA head (W_UK^T q_nope
            # rides the r part, q_pe the dr part)
            rows = jnp.concatenate([c_kv, k_pe], axis=-1)[:b] \
                .astype(C.dtype)                               # (b, W)
            C = jax.lax.dynamic_update_slice(C, rows[:, None],
                                             (0, pos, 0))
            Cf = C.astype(jnp.float32)
            logits = (jnp.einsum("bhr,btr->bht", q_abs[:b], Cf[..., :r])
                      + jnp.einsum("bhp,btp->bht",
                                   q_pe[:b].astype(jnp.float32),
                                   Cf[..., r:])) * cfg.attn_scale
            t_ids = jnp.arange(C.shape[1])
            logits = jnp.where(t_ids[None, None] <= pos, logits, -1e9)
            probs = jax.nn.softmax(logits, axis=-1)            # (b, h, T)
            o_lat = jnp.einsum("bht,btr->bhr", probs, Cf[..., :r])
        else:
            # combined-kernel variant (QDM_MLA_KERNEL_ATTN=1 — built,
            # measured losing; kept testable): one hkv=1 MQA head
            # through the depth-major decode kernels at dpad lanes
            dpad = self._mla_dpad
            krow = jnp.concatenate(
                [c_kv, k_pe, jnp.zeros((bp, dpad - r - dr), dt)],
                axis=-1)[:b]
            vrow = jnp.concatenate(
                [c_kv, jnp.zeros((bp, dpad - r), dt)], axis=-1)[:b]
            new = jnp.stack([krow, vrow], axis=1).astype(C.dtype)
            C = jax.lax.dynamic_update_slice(C, new[:, :, :, None],
                                             (0, 0, 0, pos))
            q_eff = jnp.concatenate(
                [q_abs.astype(dt), q_pe,
                 jnp.zeros((bp, h, dpad - r - dr), dt)],
                axis=-1)[:b, None]                             # (b,1,h,dpad)
            bb = self.block_b if b % self.block_b == 0 else 1
            attn = dk.decode_attention_kv(q_eff, C, pos,
                                          sm_scale=float(cfg.attn_scale),
                                          block_b=bb)
            o_lat = attn[:, 0, :, :r].astype(jnp.float32)
        out = jnp.einsum("bhr,rhv->bhv", o_lat,
                         w["w_uv"].astype(jnp.float32)) \
            .reshape(b, h * dv).astype(dt)
        if bp > b:
            out = jnp.pad(out, ((0, bp - b), (0, 0)))
        o = self._mla_mm(out, w["w_o"], out_f32=True)
        x = (x.astype(jnp.float32) + o).astype(dt)

        xin = _xla_norm(x, w["ln2"], None, "rmsnorm", eps).astype(dt)
        if "router" not in w:   # dense MLP layer (first-k / no MoE)
            g = self._mla_mm(xin, w["wg"], out_f32=True)
            u = self._mla_mm(xin, w["wu"], out_f32=True)
            mid = (jax.nn.silu(g) * u).astype(dt)
            m = self._mla_mm(mid, w["wd"], out_f32=True)
        else:
            m = self._mla_moe_mlp(xin, w)
        return (x.astype(jnp.float32) + m).astype(dt), (C,)

    def _mla_moe_mlp(self, xin, w):
        """deepseek-v2 MoE decode MLP (dense-exact, models/moe.py
        semantics): softmax router, top-k WITHOUT renormalization
        scaled by routed_scaling_factor (norm_topk_prob=False in every
        v2 config; moe_renormalize=True follows the module's renorm
        branch), always-on shared experts added to the routed output.
        Routed experts run as stacked-expert batched einsums — int8
        with the shared expert-input scale + per-expert down scales
        under w8a8_static (the mixtral engine scheme)."""
        cfg = self.cfg
        logits = (xin @ w["router"]).astype(jnp.float32)       # (B, E)
        probs = jax.nn.softmax(logits, axis=-1)
        top_w, top_i = jax.lax.top_k(probs, cfg.num_experts_per_tok)
        if getattr(cfg, "moe_renormalize", True):
            top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
        else:
            top_w = top_w * jnp.float32(
                getattr(cfg, "routed_scaling_factor", 1.0))
        w_be = jnp.sum(jax.nn.one_hot(top_i, cfg.num_experts,
                                      dtype=jnp.float32)
                       * top_w[..., None], axis=1)             # (B, E)
        if self.mode == "bf16":
            g = jnp.einsum("bk,ekf->ebf", xin, w["Wg"])
            u = jnp.einsum("bk,ekf->ebf", xin, w["Wu"])
            y = jnp.einsum("ebf,efk->ebk", jax.nn.silu(g) * u,
                           w["Wd"]).astype(jnp.float32)
        else:
            a = w["a_moe"]
            xq = jnp.clip(jnp.round(xin.astype(jnp.float32) / a),
                          -127, 127).astype(jnp.int8)
            g = jnp.einsum("bk,ekf->ebf", xq, w["Wg"],
                           preferred_element_type=jnp.int32
                           ).astype(jnp.float32) * (w["sWg"] * a)
            u = jnp.einsum("bk,ekf->ebf", xq, w["Wu"],
                           preferred_element_type=jnp.int32
                           ).astype(jnp.float32) * (w["sWu"] * a)
            hmid = jax.nn.silu(g) * u
            a2 = w["a_wd"][:, None, None]                      # (E,1,1)
            hq = jnp.clip(jnp.round(hmid / a2), -127, 127).astype(jnp.int8)
            y = jnp.einsum("ebf,efk->ebk", hq, w["Wd"],
                           preferred_element_type=jnp.int32
                           ).astype(jnp.float32) * (w["sWd"] * a2)
        out = jnp.einsum("ebk,be->bk", y, w_be)                # f32
        if "sh_g" in w:
            sg = self._mla_mm(xin, w["sh_g"], out_f32=True)
            su = self._mla_mm(xin, w["sh_u"], out_f32=True)
            smid = (jax.nn.silu(sg) * su).astype(xin.dtype)
            out = out + self._mla_mm(smid, w["sh_d"], out_f32=True)
        return out

    def _make_pick(self, sampler, cap_logits: bool = True):
        if not sampler:
            return None
        from qdm_tpu.api.causal_lm import sample_token

        temperature, top_k, top_p = sampler
        base = functools.partial(sample_token, temperature=temperature,
                                 top_k=top_k, top_p=top_p)
        cap = self.final_softcap
        if not cap or not cap_logits:
            return base

        def capped(logits, key):
            # gemma2 final soft-cap before SAMPLING (greedy argmax is
            # invariant under the monotone tanh cap and skips it)
            return base(cap * jnp.tanh(logits / cap), key)

        return capped

    def _pick0(self, sampler):
        """Memoized jitted first-token sampler (over the prefill's
        last-position logits — the MODULE path, which already applies
        the gemma2 final soft-cap, so no cap here)."""
        pick0 = self._run_cache.get(("pick0", sampler))
        if pick0 is None:
            pick0 = jax.jit(self._make_pick(sampler, cap_logits=False))
            self._run_cache[("pick0", sampler)] = pick0
        return pick0

    def _put(self, x, spec, local: bool = False):
        """Place an array under a PartitionSpec on the engine mesh —
        device_put on one host, make_array_from_process_local_data on
        a multi-host mesh (each process supplies its local portion;
        for weight specs that never name 'data', that is the full
        leaf, replicated across hosts).  local=True: x already holds
        only this process's 'data' rows."""
        sh = NamedSharding(self.mesh, spec)
        if not self.multihost:
            return jax.device_put(x, sh)
        arr = np.asarray(x)
        if (not local and spec and len(spec) > 0 and spec[0] == "data"):
            lo, hi = _local_row_range(sh, arr.shape)
            arr = arr[lo:hi]
        return jax.make_array_from_process_local_data(sh, arr)

    def _tp_spec(self, key: str) -> P:
        """PartitionSpec for one engine weight leaf (megatron rules:
        qkv/gate/up column-split, o/down row-split, scales follow the
        split axis, scalars replicate).  Under w4a8 the row-split
        weights' group scales are 2D (K/g, N) and row-split too."""
        if key in ("w_qkv", "s_qkv", "wg", "wu", "sg", "su"):
            return P(None, "model")
        if key in ("w_o", "wd"):
            return P("model", None)
        if key == "b_qkv":
            return P("model")
        if self.mode == "w4a8_static" and key in ("s_o", "sd"):
            return P("model", None)
        return P()

    # ------------------------------------------------------------- calibration

    @staticmethod
    def smooth_lm(lm, calib_ids, alpha: float = 0.5):
        """SmoothQuant-migrate ``lm.params`` in place (an fp-exact
        reparameterization: norm ÷ s, fc × s) so the engine's int8/int4
        weight codes and static act scales quantize a flatter
        distribution.  Run BEFORE constructing the engine; then
        calibrate_scales on the smoothed lm.  Counterpart of the
        reference's smooth-then-quantize serving flow
        (quantize/quantizer_SQ.py:395-431 ahead of the fused modules)."""
        from qdm_tpu.config import QuantConfig
        from qdm_tpu.models.shims import llama_scaling_groups
        from qdm_tpu.quant import smooth as smooth_lib

        if _params_packed(lm.params):
            raise NotImplementedError(
                "smooth_lm needs fp kernels; this model's params are "
                "already packed (from_quantized) — migrate before "
                "quantizing, or serve the packed model without "
                "migration")
        cfg = QuantConfig(w_bit=8, a_bit=8)
        stats, _ = lm._calibrate(cfg, np.asarray(calib_ids),
                                 capture_inputs=False)
        groups = llama_scaling_groups(lm.params, include_fc_groups=False,
                                      norm_plus_one=lm.config.norm_plus_one)
        lm.params = smooth_lib.smooth_params(lm.params, groups, stats,
                                             alpha=alpha)
        return lm

    @staticmethod
    def awq_lm(lm, calib_ids, w_bits: int = 4, group_size: int = 128,
               zero_point: bool = False):
        """AWQ scale+clip migration applied to ``lm.params`` ahead of
        engine construction — the activation-aware counterpart of
        :meth:`smooth_lm` for the w4a8 serving mode: the 20-point
        duo-scale grid flattens salient channels, then the clip search
        clamps per-(oc, group) weight ranges to minimize the int4 MSE
        the engine's group quantizer realizes.  zero_point defaults to
        False to match the engine's SYMMETRIC int4 codes
        (decode_kernels.quantize_int4_group).  Run BEFORE
        ``DecodeEngine(...)``; then ``calibrate_scales`` on the
        migrated lm.  Counterpart of the reference quantizing with AWQ
        before building its fused serving modules
        (quantize/quantizer.py scale/clip search ahead of
        utils/fused_utils.py:45-142)."""
        from qdm_tpu.config import QuantConfig
        from qdm_tpu.models.shims import llama_scaling_groups
        from qdm_tpu.quant import awq as awq_lib

        if _params_packed(lm.params):
            raise NotImplementedError(
                "awq_lm needs fp kernels; this model's params are "
                "already packed (from_quantized) — migrate before "
                "quantizing, or serve the packed model without "
                "migration")
        cfg = QuantConfig(w_bit=w_bits, q_group_size=group_size,
                          zero_point=zero_point)
        _, feats = lm._calibrate(cfg, np.asarray(calib_ids),
                                 capture_inputs=True, capture_seq=4)
        from qdm_tpu.models.shims import attn_geom_from_config

        groups = llama_scaling_groups(
            lm.params, include_fc_groups=True,
            norm_plus_one=lm.config.norm_plus_one,
            mlp_act=lm.config.mlp_act,
            moe_top_k=lm.config.num_experts_per_tok,
            moe_renormalize=getattr(lm.config, 'moe_renormalize', True),
            attn_geom=attn_geom_from_config(lm.config))
        lm.params = awq_lib.awq_search_and_apply(lm.params, groups, feats,
                                                 cfg)
        return lm

    @staticmethod
    def calibrate_scales(lm, calib_ids) -> Dict[str, jnp.ndarray]:
        """Per-layer input-absmax stats from one sown capture forward
        (the engine's static act scales; same machinery as the
        module-path calibration, models/layers.py 'calib' collection)."""
        from qdm_tpu.calib.stats import flatten_calib
        from qdm_tpu.models import llama as llama_lib

        plan = lm.plan.with_capture(True)
        model = llama_lib.LlamaForCausalLM(config=lm.config, dtype=lm.dtype,
                                           plan=plan)

        @jax.jit
        def fwd(params, ids):
            _, mut = model.apply({"params": params}, ids, mutable=["calib"])
            return flatten_calib(mut["calib"])

        return fwd(lm.params, jnp.asarray(calib_ids))

    @staticmethod
    def calibrate_with_grams(lm, calib_ids, gram_chunk: int = 0):
        """(act stats, GPTQ Grams) from ONE sown capture forward — the
        serve(gptq=True) path (two separate forwards would double the
        calibration wall-clock and, on the tunnel, the remote
        compiles).

        gram_chunk > 0 (or the auto default when the full Gram set
        would exceed ~8 GB) captures the Hessians CHUNKED: each forward
        returns only `gram_chunk` layers' Grams and XLA dead-code
        eliminates the rest, bounding live memory at
        chunk x max(C)^2 f32 at the cost of ceil(n/chunk) forwards —
        this is what makes serve(gptq=True) viable at 7B scale on one
        v5e."""
        from qdm_tpu.calib.stats import flatten_calib
        from qdm_tpu.models import llama as llama_lib

        gram_chunk = DecodeEngine._check_gram_tokens(lm, calib_ids,
                                                     gram_chunk)
        plan = lm.plan.with_capture(True, inputs=False, gram=True)
        model = llama_lib.LlamaForCausalLM(config=lm.config, dtype=lm.dtype,
                                           plan=plan)
        ids = jnp.asarray(calib_ids)

        def fwd_all(params, ids):
            _, mut = model.apply({"params": params}, ids,
                                 mutable=["calib", "calib_h"])
            return (flatten_calib(mut["calib"]),
                    flatten_calib(mut["calib_h"], leaf="h"))

        if not gram_chunk:
            return jax.jit(fwd_all)(lm.params, ids)

        keys = sorted(jax.eval_shape(fwd_all, lm.params, ids)[1])
        stats = None
        grams: Dict[str, jnp.ndarray] = {}
        for i in range(0, len(keys), gram_chunk):
            sel = tuple(keys[i:i + gram_chunk])

            @jax.jit
            def fwd_sel(params, ids, sel=sel):
                st, hs = fwd_all(params, ids)
                # returning a key subset lets XLA DCE the other
                # layers' (C, C) Gram matmuls entirely
                return st, {k: hs[k] for k in sel}

            st, hs = fwd_sel(lm.params, ids)
            stats = st
            grams.update(hs)
        return stats, grams

    @staticmethod
    def _check_gram_tokens(lm, calib_ids, gram_chunk: int = 0) -> int:
        """Warn on rank-deficient Grams; pick an automatic chunk size
        when the full Gram set would not fit next to the weights."""
        ids_arr = np.asarray(calib_ids)
        n_tok = int(ids_arr.shape[0] * ids_arr.shape[1])
        k_max = max(lm.config.hidden_size, lm.config.intermediate_size,
                    lm.config.num_attention_heads * lm.config.head_dim)
        if n_tok < k_max:
            import warnings

            warnings.warn(
                f"gptq_grams: {n_tok} calibration tokens < the largest "
                f"contraction dim {k_max} — the Gram is rank-deficient "
                "and GPTQ will compensate into unobserved directions "
                "(measured: LOSES to plain RTN codes).  Calibrate with "
                "at least K tokens.")
        if gram_chunk:
            return gram_chunk
        # full-Gram memory: every layer's (C, C) f32 would materialize
        # in one forward — auto-chunk beyond ~8 GB (v5e headroom next
        # to the weights)
        per_layer = (lm.config.hidden_size ** 2 * 3
                     + lm.config.intermediate_size ** 2
                     + (lm.config.num_attention_heads
                        * lm.config.head_dim) ** 2) * 4
        total_gb = per_layer * lm.config.num_hidden_layers / 2 ** 30
        if total_gb <= 8.0:
            return 0
        budget = int(8.0 * 2 ** 30)
        # keys are per-LINEAR (7/layer for llama); scale the layer
        # estimate accordingly
        per_key = per_layer / 7
        return max(1, int(budget / per_key))

    @staticmethod
    def gptq_grams(lm, calib_ids,
                   gram_chunk: int = 0) -> Dict[str, jnp.ndarray]:
        """Per-layer input Hessians H = X^T X for GPTQ weight placement
        in the engine (``DecodeEngine(..., gptq_grams=...)``): one sown
        'calib_h' capture forward (quant/gptq.py — full-data Grams,
        bounded (C, C) memory; auto-chunked past ~8 GB, see
        calibrate_with_grams).  Run AFTER smooth_lm/awq_lm: those
        mutate the weights, which changes every layer's inputs.  The
        codes land on the engine's own symmetric grids, so serving
        speed is identical — this is a pure quality lever (quality
        table: the composed smooth+gptq row is the best w4)."""
        return DecodeEngine.calibrate_with_grams(lm, calib_ids,
                                                 gram_chunk=gram_chunk)[1]

    # ------------------------------------------------------------------ layers

    def _local_trig(self, pos, is_rope, sign, base_idx):
        """(cos, sin) rope vectors over the LOCAL-layer tables for
        dual-rope (gemma3) models; None otherwise.  pos: traced scalar
        (shared decode step) or (B,) per-row logical positions (ragged
        batches)."""
        if not self.dual_rope:
            return None
        posf = jnp.asarray(pos).astype(jnp.float32)
        if posf.ndim == 0:
            ang = posf * self._freqs_local
            return (jnp.where(is_rope, jnp.cos(ang)[base_idx], 1.0),
                    jnp.where(is_rope, sign * jnp.sin(ang)[base_idx], 0.0))
        ang = posf[:, None] * self._freqs_local
        return (jnp.where(is_rope[None], jnp.cos(ang)[:, base_idx], 1.0),
                jnp.where(is_rope[None],
                          sign[None] * jnp.sin(ang)[:, base_idx], 0.0))

    def _pick_trig(self, l, cosv, sinv, trig_l):
        """Layer l's rope vectors: the local tables on windowed layers
        of a dual-rope model, the (scaling-folded) global ones
        otherwise."""
        if trig_l is not None and self._layer_windows[l] is not None:
            return trig_l
        return cosv, sinv

    def _xla_ok_b1(self, b: int) -> bool:
        """True when the batch-1 bf16 XLA-layer decode variant applies
        (see _layer_xla_b1): canonical rope/rmsnorm llama family, bf16
        KV, single device.  At batch 1 the megakernels' 3 pallas
        launches/layer cost more than XLA's fused graph (measured
        0.88x module, BENCH_NOTES r3) — there is no batch to amortize
        them, so the engine runs the same extracted weights through
        XLA ops instead."""
        cfg = self.cfg
        return (b == 1 and self.mode == "bf16" and not self.spmd
                and not self.moe and not getattr(self, "mla", False)
                and not self.ungated and not self.all_bias
                and not cfg.parallel_residual and not self.sandwich
                and not self.qk_norm and not self.dual_rope
                and self.window is None and self.kv_dtype is None
                and not self.attn_softcap
                and getattr(cfg, "pos_emb_type", "rope") == "rope"
                and cfg.norm_type == "rmsnorm"
                and self.head_quant is None)

    def _layer_xla_b1(self, x, cache, w, pos, cosv, sinv):
        """Batch-1 bf16 decode layer as pure XLA ops on the engine's
        extracted weights (fused [q|k|v], head-major combined cache):
        same math as the megakernels, zero pallas launches — the
        batch-1 overhead fix (BENCH_NOTES r3: engine bf16 0.88x module
        at B=1 from per-launch fixed cost; XLA fuses the whole layer
        graph)."""
        cfg = self.cfg
        h, hkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim)
        g = h // hkv
        eps = cfg.rms_norm_eps
        bp = x.shape[0]
        (kv,) = cache
        b = kv.shape[0]

        xn = _xla_norm(x, w["ln1"], None, "rmsnorm", eps).astype(x.dtype)
        qkv = xn @ w["w_qkv"]
        if "b_qkv" in w:
            qkv = (qkv.astype(jnp.float32) + w["b_qkv"]).astype(qkv.dtype)
        # rope with the run body's shared trig vectors — the kernels'
        # exact lane-roll-partner formula (y*cos + y[partner]*sin)
        qf = qkv.astype(jnp.float32)
        qkv = (qf * cosv + qf[:, self._partner_any] * sinv).astype(
            qkv.dtype)
        q = qkv[:, : h * d].reshape(bp, hkv, g, d)
        if self._q_scale_ratio != 1.0:
            q = (q.astype(jnp.float32) * self._q_scale_ratio).astype(
                q.dtype)
        kv_new = qkv[:b, h * d:].reshape(b, 2 * hkv, d)
        kv = jax.lax.dynamic_update_slice(
            kv, kv_new.astype(kv.dtype)[:, :, :, None], (0, 0, 0, pos))
        kt, vt = kv[:, :hkv], kv[:, hkv:]            # (B, hkv, d, T)
        logits = jnp.einsum("bhgd,bhdt->bhgt", q[:b], kt).astype(
            jnp.float32) * (d ** -0.5)
        t_ids = jnp.arange(kv.shape[-1])
        logits = jnp.where(t_ids[None, None, None] <= pos, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhgt,bhdt->bhgd", probs, vt).reshape(b, h * d)
        if bp > b:
            attn = jnp.pad(attn, ((0, bp - b), (0, 0)))
        x = (x.astype(jnp.float32)
             + (attn @ w["w_o"]).astype(jnp.float32)).astype(x.dtype)
        xn2 = _xla_norm(x, w["ln2"], None, "rmsnorm", eps).astype(x.dtype)
        act = {"silu": jax.nn.silu, "relu": jax.nn.relu}.get(
            cfg.mlp_act, jax.nn.gelu)
        mid = (act((xn2 @ w["wg"]).astype(jnp.float32))
               * (xn2 @ w["wu"]).astype(jnp.float32)).astype(x.dtype)
        x = (x.astype(jnp.float32)
             + (mid @ w["wd"]).astype(jnp.float32)).astype(x.dtype)
        return x, (kv,)

    def _layer(self, x, cache, w, pos, cosv, sinv, h=None, hkv=None,
               tp_axis=None, rope_xla=None, attn_starts=None, slot=None):
        """One decoder layer.  h/hkv default to the model's head counts;
        under shard_map (tp_axis set) they are the LOCAL per-shard
        counts and the row-split o_proj/down partials psum over
        tp_axis with the residual added once, in f32.

        rope_xla=(cos (bp, n_qkv), sin (bp, n_qkv), partner_perm):
        ragged batches need PER-ROW rotation angles, which the shared
        kernel trig vectors cannot carry — pass cosv=sinv=None and the
        rotation runs here in XLA with the exact kernel formula
        (y*cos + partner*sin).  attn_starts (B,): first valid cache
        slot per row (left-padded ragged batches).  slot: cache write
        index when it differs from pos (rolling sliding-window cache:
        slot = pos % window; the attention mask stays on pos)."""
        if getattr(self, "mla", False):
            # MLA (DeepSeek-V2): absorbed-form latent-cache layer; the
            # fused-qkv trig/slot machinery does not apply
            return self._mla_layer(x, cache, w, pos)
        cfg = self.cfg
        h = cfg.num_attention_heads if h is None else h
        hkv = cfg.num_key_value_heads if hkv is None else hkv
        d = cfg.head_dim
        g = h // hkv
        bp = x.shape[0]
        b = cache[0].shape[0]
        eps = cfg.rms_norm_eps
        slot = pos if slot is None else slot

        nt = cfg.norm_type
        if cosv is not None and self.rope_in_xla:
            # partial rotary (phi): the kernels' lane-roll partner sits
            # d/2 apart but the rotated pairs are rotary_dim/2 apart —
            # run the rotation here with the generalized tables'
            # partner perm (same y*cos + partner*sin formula)
            rope_xla = (cosv[None], sinv[None], self._partner)
            cosv = sinv = None
        parallel = cfg.parallel_residual
        if parallel:
            # cohere-style: ONE norm feeds attention AND the MLP.  The
            # norm runs once in XLA; both kernels skip theirs.
            xin = _xla_norm(x, w["ln1"], w.get("ln1_b"), nt,
                            eps).astype(x.dtype)
            qkv_in, qkv_ns, qkv_nb = xin, None, None
        elif nt == "layernorm" and self.mode == "w4a8_static":
            # the i4 kernels have no layernorm prologue — pre-norm in
            # XLA (stablelm-class at w4a8)
            qkv_in = _xla_norm(x, w["ln1"], w.get("ln1_b"), nt,
                               eps).astype(x.dtype)
            qkv_ns, qkv_nb = None, None
        else:
            qkv_in, qkv_ns, qkv_nb = x, w["ln1"], w.get("ln1_b")

        # rope applied IN the qkv kernel epilogue (lane-roll partner
        # trick, decode_kernels._rope_epilogue) — the XLA-side rotation
        # was ~5 small dispatches/layer at ~10us fixed cost each
        if self.mode == "bf16":
            qkv = dk.fused_dense_decode(qkv_in, w["w_qkv"],
                                        norm_scale=qkv_ns,
                                        norm_bias=qkv_nb, norm_type=nt,
                                        bias=w.get("b_qkv"),
                                        rope_cos=cosv, rope_sin=sinv,
                                        head_dim=d, eps=eps)
        elif self.mode == "w8a8_static":
            qkv = dk.fused_dense_decode_i8(qkv_in, w["w_qkv"], w["s_qkv"],
                                           w["a_qkv"], norm_scale=qkv_ns,
                                           norm_bias=qkv_nb, norm_type=nt,
                                           bias=w.get("b_qkv"),
                                           rope_cos=cosv, rope_sin=sinv,
                                           head_dim=d, eps=eps)
        else:
            qkv = dk.fused_dense_decode_i4(qkv_in, w["w_qkv"], w["s_qkv"],
                                           w["a_qkv"], norm_scale=qkv_ns,
                                           rope_cos=cosv, rope_sin=sinv,
                                           head_dim=d, eps=eps,
                                           group=self.i4_group)
            if "b_qkv" in w:
                # bias lands pre-rotation (rope_in_xla is forced for
                # bias models at w4a8, so the kernel did not rope)
                qkv = (qkv.astype(jnp.float32)
                       + w["b_qkv"]).astype(qkv.dtype)
        if self.qk_norm:
            # qwen3-class per-head q/k RMSNorm, PRE-rope (which is why
            # qk_norm forces rope_in_xla: the kernel epilogue would
            # rotate un-normalized heads)
            w_qk = (h + hkv) * d
            qk = qkv[:, :w_qk].astype(jnp.float32).reshape(bp, h + hkv, d)
            qk = qk * jax.lax.rsqrt(
                jnp.mean(qk * qk, axis=-1, keepdims=True) + eps)
            sc = jnp.concatenate([jnp.broadcast_to(w["qn"], (h, d)),
                                  jnp.broadcast_to(w["kn"], (hkv, d))])
            qk = (qk * sc[None]).reshape(bp, w_qk)
            qkv = jnp.concatenate(
                [qk, qkv[:, w_qk:].astype(jnp.float32)],
                axis=-1).astype(qkv.dtype)
        if rope_xla is not None:
            cosb, sinb, perm = rope_xla
            qf32 = qkv.astype(jnp.float32)
            qkv = (qf32 * cosb + qf32[:, perm] * sinb).astype(qkv.dtype)
        q = qkv[:, : h * d].reshape(bp, hkv, g, d)
        if self._q_scale_ratio != 1.0:
            # gemma2 query_pre_attn_scalar: fold the scale override
            # into q so every KV-format kernel (which divides by
            # sqrt(head_dim)) inherits it
            q = (q.astype(jnp.float32) * self._q_scale_ratio).astype(q.dtype)
        kv_new = qkv[:b, h * d:].reshape(b, 2 * hkv, d)
        if self.kv_scale_mode == "channel" and self.kv_dtype is not None:
            kv, csc = cache            # csc (B, 2hkv, d, 1) static
            qmax = self._kv_qmax
            newq = jnp.clip(jnp.round(kv_new.astype(jnp.float32)
                                      / csc[..., 0]), -qmax, qmax)
            if self.kv_dtype == "int4":
                upd = dk.pack_kv_int4(
                    newq.astype(jnp.int32)[:, :, :, None])
            else:
                upd = newq.astype(jnp.int8)[:, :, :, None]
            kv = jax.lax.dynamic_update_slice(kv, upd, (0, 0, 0, slot))
            # K channel scales fold into q (QK contracts over d), V
            # channel scales into the output (d is free in PV) — the
            # kernel sees no scales at all
            kf = csc[:, :hkv].transpose(0, 1, 3, 2)          # (B,hkv,1,d)
            vf = csc[:, hkv:].transpose(0, 1, 3, 2)
            if bp > b:
                pad = ((0, bp - b), (0, 0), (0, 0), (0, 0))
                kf = jnp.pad(kf, pad, constant_values=1.0)
                vf = jnp.pad(vf, pad, constant_values=1.0)
            bb = self.block_b if b % self.block_b == 0 else 1
            # q rides f32 into the kernel (tiny array; a bf16 fold
            # would stack rounding on top of the int8 quantization)
            attn_kernel = (dk.decode_attention_kv_i4c
                           if self.kv_dtype == "int4"
                           else dk.decode_attention_kv_i8c)
            attn = attn_kernel(q.astype(jnp.float32) * kf, kv, pos,
                               starts=attn_starts, block_b=bb)
            attn = (attn.astype(jnp.float32) * vf).astype(x.dtype)
            cache = (kv, csc)
        elif self.kv_dtype == jnp.int8:
            kv, kvs = cache
            # k and v are ADJACENT columns of the fused qkv output, so
            # the combined [K|V] rows come from one slice — no concat
            newf = kv_new.astype(jnp.float32)                 # (B, 2hkv, d)
            sn = jnp.clip(jnp.max(jnp.abs(newf), axis=-1), 1e-8, None) / 127.0
            kv = jax.lax.dynamic_update_slice(
                kv, jnp.round(newf / sn[..., None]).astype(
                    jnp.int8)[:, :, :, None], (0, 0, 0, slot))
            kvs = jax.lax.dynamic_update_slice(
                kvs, sn[:, :, None, None], (0, 0, 0, slot))
            bb = self.block_b if b % self.block_b == 0 else 1
            attn = dk.decode_attention_kv_i8(q, kv, kvs, pos, block_b=bb)
            cache = (kv, kvs)
        else:
            (kv,) = cache
            newc = kv_new.astype(kv.dtype)[:, :, :, None]
            kv = jax.lax.dynamic_update_slice(kv, newc, (0, 0, 0, slot))
            bb = self.block_b if b % self.block_b == 0 else 1
            cache = (kv,)
            attn = dk.decode_attention_kv(q, kv, pos, starts=attn_starts,
                                          block_b=bb,
                                          softcap=self.attn_softcap)
        attn = attn.reshape(bp, h * d)
        if self.moe:
            # o_proj + residual through the dense megakernel, then the
            # stacked-expert MoE MLP (dense-exact top-k routing)
            if self.mode == "bf16":
                x = dk.fused_dense_decode(attn, w["w_o"], residual=x)
            elif self.mode == "w4a8_static":
                x = dk.fused_dense_decode_i4(attn, w["w_o"], w["s_o"],
                                             w["a_o"], residual=x,
                                             group=self.i4_group)
            else:
                x = dk.fused_dense_decode_i8(attn, w["w_o"], w["s_o"],
                                             w["a_o"], residual=x)
            return self._moe_mlp(x, w), cache
        if self.sandwich:
            # gemma2 sandwich: x += norm_pa(o_proj(attn));
            # x += norm_pf(mlp(norm_pre_ff(x))) — the post-norms run in
            # XLA (f32), the pre-ff norm stays the MLP kernel prologue
            if self.mode == "bf16":
                o = dk.fused_dense_decode(attn, w["w_o"],
                                          out_dtype=jnp.float32)
            elif self.mode == "w4a8_static":
                o = dk.fused_dense_decode_i4(attn, w["w_o"], w["s_o"],
                                             w["a_o"],
                                             group=self.i4_group,
                                             out_dtype=jnp.float32)
            else:
                o = dk.fused_dense_decode_i8(attn, w["w_o"], w["s_o"],
                                             w["a_o"],
                                             out_dtype=jnp.float32)
            x = (x.astype(jnp.float32)
                 + _xla_norm(o, w["ln_pa"], None, nt, eps)).astype(x.dtype)
            if self.mode == "bf16":
                m = dk.fused_mlp_decode(x, w["wg"], w["wu"], w["wd"],
                                        w["ln2"], eps=eps,
                                        act=cfg.mlp_act, residual=False,
                                        out_dtype=jnp.float32)
            elif self.mode == "w4a8_static":
                # ln2 (pre_feedforward, rmsnorm with the +1 folded) is
                # the i4 MLP kernel's prologue
                m = dk.fused_mlp_decode_i4(x, w["wg"], w["wu"], w["wd"],
                                           (w["sg"], w["su"], w["sd"]),
                                           w["a_mlp"], w["ln2"], eps=eps,
                                           act=cfg.mlp_act, residual=False,
                                           group=self.i4_group,
                                           out_dtype=jnp.float32)
            else:
                m = dk.fused_mlp_decode_i8(x, w["wg"], w["wu"], w["wd"],
                                           (w["sg"], w["su"], w["sd"]),
                                           w["a_mlp"], w["ln2"], eps=eps,
                                           act=cfg.mlp_act, residual=False,
                                           out_dtype=jnp.float32)
            x = (x.astype(jnp.float32)
                 + _xla_norm(m, w["ln_pf"], None, nt, eps)).astype(x.dtype)
            return x, cache
        if self.merge_o and tp_axis is None:
            if self.mode == "w4a8_static":
                x = dk.fused_o_mlp_decode_i4(
                    attn, w["w_o"], w["s_o"], w["a_o"], x, w["wg"],
                    w["wu"], w["wd"], (w["sg"], w["su"], w["sd"]),
                    w["a_mlp"], w["ln2"], eps=eps, act=cfg.mlp_act,
                    group=self.i4_group)
            else:
                x = dk.fused_o_mlp_decode_i8(
                    attn, w["w_o"], w["s_o"], w["a_o"], x, w["wg"],
                    w["wu"], w["wd"], (w["sg"], w["su"], w["sd"]),
                    w["a_mlp"], w["ln2"], eps=eps, act=cfg.mlp_act)
            return x, cache
        if parallel:
            # x + attn_out + mlp_out, both branches off the same xin
            # (gpt-neox parallel_norms: the MLP branch has its OWN
            # norm); under tp each branch is a row-split partial -> psum
            xin_mlp = xin
            if getattr(cfg, "parallel_norms", False):
                xin_mlp = _xla_norm(x, w["ln2"], w.get("ln2_b"), nt,
                                    eps).astype(x.dtype)
            if self.mode == "bf16":
                o_part = dk.fused_dense_decode(attn, w["w_o"],
                                               bias=w.get("b_o"),
                                               out_dtype=jnp.float32)
                m_part = (self._ungated_mlp(xin_mlp, w) if self.ungated
                          else dk.fused_mlp_decode(xin_mlp, w["wg"],
                                                   w["wu"],
                                                   w["wd"], None, eps=eps,
                                                   act=cfg.mlp_act,
                                                   residual=False,
                                                   out_dtype=jnp.float32))
            elif self.mode == "w4a8_static":
                # cohere/phi-class parallel residual at w4a8: both
                # branches off the shared XLA norm; biases land in XLA
                # (the i4 kernels carry no bias epilogue)
                o_part = dk.fused_dense_decode_i4(attn, w["w_o"], w["s_o"],
                                                  w["a_o"],
                                                  group=self.i4_group,
                                                  out_dtype=jnp.float32)
                if "b_o" in w:
                    o_part = o_part + w["b_o"]
                m_part = (self._ungated_mlp(xin_mlp, w) if self.ungated
                          else dk.fused_mlp_decode_i4(
                              xin_mlp, w["wg"], w["wu"], w["wd"],
                              (w["sg"], w["su"], w["sd"]), w["a_mlp"],
                              None, eps=eps, act=cfg.mlp_act,
                              residual=False, group=self.i4_group,
                              out_dtype=jnp.float32))
            else:
                o_part = dk.fused_dense_decode_i8(attn, w["w_o"], w["s_o"],
                                                  w["a_o"],
                                                  bias=w.get("b_o"),
                                                  out_dtype=jnp.float32)
                m_part = (self._ungated_mlp(xin_mlp, w) if self.ungated
                          else dk.fused_mlp_decode_i8(
                              xin_mlp, w["wg"], w["wu"], w["wd"],
                              (w["sg"], w["su"], w["sd"]),
                              w["a_mlp"], None, eps=eps,
                              act=cfg.mlp_act, residual=False,
                              out_dtype=jnp.float32))
            if tp_axis is not None:
                o_part = jax.lax.psum(o_part, tp_axis)
                m_part = jax.lax.psum(m_part, tp_axis)
            x = (x.astype(jnp.float32) + o_part + m_part).astype(x.dtype)
            return x, cache
        if tp_axis is not None:
            if self.mode == "bf16":
                part = dk.fused_dense_decode(attn, w["w_o"],
                                             out_dtype=jnp.float32)
            elif self.mode == "w8a8_static":
                part = dk.fused_dense_decode_i8(attn, w["w_o"], w["s_o"],
                                                w["a_o"],
                                                out_dtype=jnp.float32)
            else:
                part = dk.fused_dense_decode_i4(attn, w["w_o"], w["s_o"],
                                                w["a_o"],
                                                group=self.i4_group,
                                                out_dtype=jnp.float32)
            x = (x.astype(jnp.float32)
                 + jax.lax.psum(part, tp_axis)).astype(x.dtype)
            if self.mode == "bf16":
                part = dk.fused_mlp_decode(x, w["wg"], w["wu"], w["wd"],
                                           w["ln2"], eps=eps,
                                           act=cfg.mlp_act, residual=False,
                                           norm_bias=w.get("ln2_b"),
                                           norm_type=nt,
                                           out_dtype=jnp.float32)
            elif self.mode == "w8a8_static":
                part = dk.fused_mlp_decode_i8(x, w["wg"], w["wu"], w["wd"],
                                              (w["sg"], w["su"], w["sd"]),
                                              w["a_mlp"], w["ln2"], eps=eps,
                                              act=cfg.mlp_act,
                                              residual=False,
                                              norm_bias=w.get("ln2_b"),
                                              norm_type=nt,
                                              out_dtype=jnp.float32)
            else:
                part = dk.fused_mlp_decode_i4(x, w["wg"], w["wu"], w["wd"],
                                              (w["sg"], w["su"], w["sd"]),
                                              w["a_mlp"], w["ln2"], eps=eps,
                                              act=cfg.mlp_act,
                                              residual=False,
                                              group=self.i4_group,
                                              out_dtype=jnp.float32)
            x = (x.astype(jnp.float32)
                 + jax.lax.psum(part, tp_axis)).astype(x.dtype)
            return x, cache
        if self.ungated:
            # sequential ungated MLP (OPT/starcoder2-class): o_proj +
            # residual, ln2 in XLA, fc1 -> act -> fc2 off it
            if self.mode == "bf16":
                x = dk.fused_dense_decode(attn, w["w_o"],
                                          bias=w.get("b_o"), residual=x)
            elif self.mode == "w8a8_static":
                x = dk.fused_dense_decode_i8(attn, w["w_o"], w["s_o"],
                                             w["a_o"], bias=w.get("b_o"),
                                             residual=x)
            else:
                x = dk.fused_dense_decode_i4(attn, w["w_o"], w["s_o"],
                                             w["a_o"], residual=x,
                                             group=self.i4_group)
                if "b_o" in w:
                    x = (x.astype(jnp.float32) + w["b_o"]).astype(x.dtype)
            xin2 = _xla_norm(x, w["ln2"], w.get("ln2_b"), nt,
                             eps).astype(x.dtype)
            x = (x.astype(jnp.float32)
                 + self._ungated_mlp(xin2, w)).astype(x.dtype)
            return x, cache
        if self.mode == "bf16":
            x = dk.fused_dense_decode(attn, w["w_o"], residual=x)
            x = dk.fused_mlp_decode(x, w["wg"], w["wu"], w["wd"], w["ln2"],
                                    eps=eps, act=cfg.mlp_act,
                                    norm_bias=w.get("ln2_b"), norm_type=nt)
        elif self.mode == "w8a8_static":
            x = dk.fused_dense_decode_i8(attn, w["w_o"], w["s_o"], w["a_o"],
                                         residual=x)
            x = dk.fused_mlp_decode_i8(x, w["wg"], w["wu"], w["wd"],
                                       (w["sg"], w["su"], w["sd"]),
                                       w["a_mlp"], w["ln2"], eps=eps,
                                       act=cfg.mlp_act,
                                       norm_bias=w.get("ln2_b"),
                                       norm_type=nt)
        else:
            x = dk.fused_dense_decode_i4(attn, w["w_o"], w["s_o"], w["a_o"],
                                         residual=x, group=self.i4_group)
            if nt == "layernorm":
                # no layernorm prologue in the i4 MLP kernel — pre-norm
                # in XLA and add the residual back here
                xin2 = _xla_norm(x, w["ln2"], w.get("ln2_b"), nt,
                                 eps).astype(x.dtype)
                part = dk.fused_mlp_decode_i4(
                    xin2, w["wg"], w["wu"], w["wd"],
                    (w["sg"], w["su"], w["sd"]), w["a_mlp"], None,
                    eps=eps, act=cfg.mlp_act, residual=False,
                    group=self.i4_group, out_dtype=jnp.float32)
                x = (x.astype(jnp.float32) + part).astype(x.dtype)
            else:
                x = dk.fused_mlp_decode_i4(x, w["wg"], w["wu"], w["wd"],
                                           (w["sg"], w["su"], w["sd"]),
                                           w["a_mlp"], w["ln2"], eps=eps,
                                           act=cfg.mlp_act,
                                           group=self.i4_group)
        return x, cache

    def _moe_mlp(self, x, w):
        """Dense-exact sparse-MoE decode MLP: router top-k weights gate
        ONE stacked-expert batched einsum per projection (all E experts
        computed — at serve batch sizes nearly every expert is hit each
        step, so the full expert weight read approximates gathered
        dispatch with zero dynamic-shape cost).  Token-exact vs the
        module path (models/moe.py dense-exact branch; the reference
        captures the whole block_sparse_moe input for quantization,
        quantizer.py:1106-1111).  w8a8_static: int8 stacked einsums
        with the shared expert-input scale (every expert sees the same
        normed activations) and per-expert down-projection scales."""
        cfg = self.cfg
        act = {"silu": jax.nn.silu, "relu": jax.nn.relu}.get(
            cfg.mlp_act, jax.nn.gelu)
        xin = _xla_norm(x, w["ln2"], None, cfg.norm_type,
                        cfg.rms_norm_eps).astype(x.dtype)
        logits = (xin @ w["router"]).astype(jnp.float32)      # (B, E)
        probs = jax.nn.softmax(logits, axis=-1)
        top_w, top_i = jax.lax.top_k(probs, cfg.num_experts_per_tok)
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
        w_be = jnp.sum(jax.nn.one_hot(top_i, cfg.num_experts,
                                      dtype=jnp.float32)
                       * top_w[..., None], axis=1)            # (B, E)
        if self.mode == "bf16":
            g = jnp.einsum("bk,ekf->ebf", xin, w["W1"])
            u = jnp.einsum("bk,ekf->ebf", xin, w["W3"])
            y = jnp.einsum("ebf,efk->ebk", act(g) * u,
                           w["W2"]).astype(jnp.float32)
        elif self.mode == "w4a8_static":
            # one pallas call: all experts' int4 MLP + routing combine
            # (half the int8 stacked-einsum path's expert weight read)
            out = dk.fused_moe_mlp_decode_i4(
                xin, w_be, w["W1"], w["W3"], w["W2"],
                w["sW1"], w["sW3"], w["sW2"], w["a_moe_scl"],
                act=cfg.mlp_act, group=self.i4_group)
            return (x.astype(jnp.float32) + out).astype(x.dtype)
        else:
            a = w["a_moe"]                                    # (1,)
            xq = jnp.clip(jnp.round(xin.astype(jnp.float32) / a),
                          -127, 127).astype(jnp.int8)
            g = jnp.einsum("bk,ekf->ebf", xq, w["W1"],
                           preferred_element_type=jnp.int32
                           ).astype(jnp.float32) * (w["sW1"] * a)
            u = jnp.einsum("bk,ekf->ebf", xq, w["W3"],
                           preferred_element_type=jnp.int32
                           ).astype(jnp.float32) * (w["sW3"] * a)
            h = act(g) * u                                    # (E, B, F)
            a2 = w["a_w2"][:, None, None]                     # (E, 1, 1)
            hq = jnp.clip(jnp.round(h / a2), -127, 127).astype(jnp.int8)
            y = jnp.einsum("ebf,efk->ebk", hq, w["W2"],
                           preferred_element_type=jnp.int32
                           ).astype(jnp.float32) * (w["sW2"] * a2)
        out = jnp.einsum("ebk,be->bk", y, w_be)
        return (x.astype(jnp.float32) + out).astype(x.dtype)

    def _ungated_mlp(self, xin, w):
        """phi MLP branch: fc1 -> act -> fc2 as XLA matmuls (f32 out),
        off the shared parallel-residual norm output — the fused MLP
        kernels are gated-only, and phi's biases land here in f32.
        w8a8_static: static-scale int8 matmuls (per-out-channel int8
        weights, the engine's calibrated fc1/fc2 input scales), the
        same scheme as the gated kernel path."""
        cfg = self.cfg
        act = {"silu": jax.nn.silu, "relu": jax.nn.relu}.get(
            cfg.mlp_act, jax.nn.gelu)
        if self.mode == "bf16":
            h = (xin @ w["w1"]).astype(jnp.float32)
            if "b_fc1" in w:
                h = h + w["b_fc1"]
            m = (act(h).astype(xin.dtype) @ w["w2"]).astype(jnp.float32)
        elif self.mode == "w4a8_static":
            # two i4 dense kernels with XLA bias/act glue between (the
            # i4 kernels carry no bias epilogue; bias must land
            # PRE-activation, so fc1 cannot fuse the act either)
            h = dk.fused_dense_decode_i4(xin, w["w1"], w["s1"],
                                         w["a_fc"][0:1],
                                         group=self.i4_group,
                                         out_dtype=jnp.float32)
            if "b_fc1" in w:
                h = h + w["b_fc1"]
            m = dk.fused_dense_decode_i4(act(h).astype(xin.dtype),
                                         w["w2"], w["s2"],
                                         w["a_fc"][1:2],
                                         group=self.i4_group,
                                         out_dtype=jnp.float32)
        else:
            a1, a2 = w["a_fc"][0], w["a_fc"][1]
            xq = jnp.clip(jnp.round(xin.astype(jnp.float32) / a1),
                          -127, 127).astype(jnp.int8)
            h = jnp.dot(xq, w["w1"], preferred_element_type=jnp.int32
                        ).astype(jnp.float32) * (w["s1"] * a1)
            if "b_fc1" in w:
                h = h + w["b_fc1"]
            hq = jnp.clip(jnp.round(act(h) / a2), -127, 127).astype(jnp.int8)
            m = jnp.dot(hq, w["w2"], preferred_element_type=jnp.int32
                        ).astype(jnp.float32) * (w["s2"] * a2)
        if "b_fc2" in w:
            m = m + w["b_fc2"]
        return m

    def _head_logits(self, x, w_head, final_norm):
        """final norm + lm_head as one fused launch.  w_head is either
        the bf16 (K, V) matrix or, under head_quant='int8', the
        (codes, per-channel scales, static act scale) triple."""
        cfg = self.cfg
        if self.head_quant == "int8":
            wh, whs, ah = w_head
            return dk.fused_dense_decode_i8(
                x, wh, whs, ah, norm_scale=final_norm,
                eps=cfg.rms_norm_eps, norm_bias=self.final_norm_b,
                norm_type=cfg.norm_type, bias=self.head_bias,
                out_dtype=jnp.float32, block_n=1280)
        if self.head_quant == "int4":
            wh, whs, ah = w_head
            out = dk.fused_dense_decode_i4(
                x, wh, whs, ah, norm_scale=final_norm,
                eps=cfg.rms_norm_eps, group=self._head_group,
                out_dtype=jnp.float32, block_n=1280)
            # the i4 kernel carries no bias epilogue (phi head bias)
            return out if self.head_bias is None else out + self.head_bias
        return dk.fused_dense_decode(
            x, w_head, norm_scale=final_norm, eps=cfg.rms_norm_eps,
            norm_bias=self.final_norm_b, norm_type=cfg.norm_type,
            bias=self.head_bias, out_dtype=jnp.float32, block_n=1280)

    # ------------------------------------------------------------------ decode

    def _make_run(self, n_tokens: int, sampler=()):
        memo = (n_tokens, sampler)
        if memo in self._run_cache:
            return self._run_cache[memo]
        if self.spmd:
            if sampler and self.tp > 1:
                raise NotImplementedError(
                    "sampling under tensor parallelism needs a "
                    "cross-shard logits gather (the tp lm_head is "
                    "vocab-split); sample on a dp-only mesh or a "
                    "single device")
            run = self._make_run_tp(n_tokens, sampler)
            self._run_cache[memo] = run
            return run
        cfg = self.cfg
        d = cfg.head_dim
        freqs, is_rope, sign, base_idx, _ = _rope_consts(cfg)
        if self._pos_scale != 1.0:
            # linear rope scaling on GLOBAL layers (folded into freqs
            # exactly as the module's rope() folds it)
            freqs = freqs * jnp.float32(self._pos_scale)
        pick = self._make_pick(sampler)

        @jax.jit
        def run(layers, embed, final_norm, w_head, tok0, caches, start_pos,
                key=None):
            b = tok0.shape[0]
            bp = max(_round_up(b, 8), 8)
            use_xla = self._xla_ok_b1(b)

            def body(carry, i):
                tok, caches = carry
                pos = start_pos + i
                angles = pos.astype(jnp.float32) * freqs     # (d/2,)
                cosv = jnp.where(is_rope, jnp.cos(angles)[base_idx], 1.0)
                sinv = jnp.where(is_rope,
                                 sign * jnp.sin(angles)[base_idx], 0.0)
                trig_l = self._local_trig(pos, is_rope, sign, base_idx)
                x = jnp.zeros((bp,), tok.dtype).at[:b].set(tok)
                x = embed[x]
                if self._pos_tab is not None:
                    # OPT-class learned absolute position embedding
                    x = x + self._pos_tab[pos + self._pos_off]
                new_caches = []
                for l, w in enumerate(layers):
                    # rolling sliding-window cache: write slot wraps
                    # mod the LAYER's cache width (== window on local
                    # layers once serving exceeds it; global/short
                    # layers have width > pos, so the mod is identity)
                    slot = (jnp.mod(pos, caches[l][0].shape[-1])
                            if self.window else None)
                    cv, sv = self._pick_trig(l, cosv, sinv, trig_l)
                    if use_xla:
                        # batch-1 bf16: pure-XLA layer (no pallas
                        # launches to amortize — _layer_xla_b1)
                        x, cache = self._layer_xla_b1(x, caches[l], w,
                                                      pos, cv, sv)
                    else:
                        x, cache = self._layer(x, caches[l], w, pos,
                                               cv, sv, slot=slot)
                    new_caches.append(cache)
                logits = self._head_logits(x, w_head, final_norm)
                if pick is None:
                    # logit_scale (cohere) is a positive monotone
                    # transform — greedy argmax is invariant
                    nxt = jnp.argmax(logits[:b], axis=-1).astype(tok.dtype)
                else:
                    from qdm_tpu.api.causal_lm import fold_key

                    # sampling IS logit_scale/temperature sensitive
                    nxt = pick(logits[:b] * self.cfg.logit_scale,
                               fold_key(key, i)).astype(tok.dtype)
                return (nxt, new_caches), nxt

            (_, _), toks = jax.lax.scan(body, (tok0, caches),
                                        jnp.arange(n_tokens),
                                        unroll=min(self.unroll,
                                                   max(n_tokens, 1)))
            return toks.T  # (B, n_tokens)

        self._run_cache[memo] = run
        return run

    def _make_run_while(self, n_tokens: int, sampler, eos: int):
        """Early-exit decode: lax.while_loop that stops once EVERY row
        has emitted eos (the scan variant computes all max_new_tokens
        steps regardless).  Finished rows keep emitting eos; the token
        buffer is eos-initialized so the unreached tail is already
        pad-after-eos."""
        memo = ("while", n_tokens, sampler, eos)
        if memo in self._run_cache:
            return self._run_cache[memo]
        cfg = self.cfg
        freqs, is_rope, sign, base_idx, _ = _rope_consts(cfg)
        if self._pos_scale != 1.0:
            # linear rope scaling on GLOBAL layers (folded into freqs
            # exactly as the module's rope() folds it)
            freqs = freqs * jnp.float32(self._pos_scale)
        pick = self._make_pick(sampler)

        @jax.jit
        def run(layers, embed, final_norm, w_head, tok0, caches, start_pos,
                key=None):
            b = tok0.shape[0]
            bp = max(_round_up(b, 8), 8)
            done0 = tok0 == eos
            buf0 = jnp.full((b, n_tokens), eos, tok0.dtype)

            def cond(st):
                i, _, done, _, _ = st
                return (i < n_tokens) & ~jnp.all(done)

            use_xla = self._xla_ok_b1(tok0.shape[0])

            def body(st):
                i, tok, done, caches, buf = st
                pos = start_pos + i
                angles = pos.astype(jnp.float32) * freqs
                cosv = jnp.where(is_rope, jnp.cos(angles)[base_idx], 1.0)
                sinv = jnp.where(is_rope,
                                 sign * jnp.sin(angles)[base_idx], 0.0)
                trig_l = self._local_trig(pos, is_rope, sign, base_idx)
                x = jnp.zeros((bp,), tok.dtype).at[:b].set(tok)
                x = embed[x]
                if self._pos_tab is not None:
                    x = x + self._pos_tab[pos + self._pos_off]
                new_caches = []
                for l, w in enumerate(layers):
                    slot = (jnp.mod(pos, caches[l][0].shape[-1])
                            if self.window else None)
                    cv, sv = self._pick_trig(l, cosv, sinv, trig_l)
                    if use_xla:
                        x, cache = self._layer_xla_b1(x, caches[l], w,
                                                      pos, cv, sv)
                    else:
                        x, cache = self._layer(x, caches[l], w, pos,
                                               cv, sv, slot=slot)
                    new_caches.append(cache)
                logits = self._head_logits(x, w_head, final_norm)
                if pick is None:
                    nxt = jnp.argmax(logits[:b], axis=-1).astype(tok.dtype)
                else:
                    from qdm_tpu.api.causal_lm import fold_key

                    nxt = pick(logits[:b] * cfg.logit_scale,
                               fold_key(key, i)).astype(tok.dtype)
                nxt = jnp.where(done, eos, nxt)
                return (i + 1, nxt, done | (nxt == eos), new_caches,
                        jax.lax.dynamic_update_slice(buf, nxt[:, None],
                                                     (0, i)))

            _, _, _, _, buf = jax.lax.while_loop(
                cond, body, (jnp.int32(0), tok0, done0, caches, buf0))
            return buf

        self._run_cache[memo] = run
        return run

    def _make_run_tp(self, n_tokens: int, sampler=()):
        """Sharded decode step: the whole scan runs under shard_map,
        so each device launches megakernels on its local shards and
        the two psums per layer ride ICI.  Sampling is supported on
        dp-only meshes (tp == 1: every shard holds the full vocab);
        each data shard folds its axis index into the key, so dp
        sampling is seed-deterministic but draws a DIFFERENT stream
        than the single-device engine."""
        import inspect

        try:
            from jax import shard_map
        except ImportError:                      # jax < 0.6
            from jax.experimental.shard_map import shard_map
        # the replication checker was check_rep in the experimental
        # API, check_vma in jax.shard_map; disable under either name
        # (psum-produced outputs are replicated, but the static
        # checker cannot see through the pallas kernels)
        sig = inspect.signature(shard_map).parameters
        rep_kw = ({"check_vma": False} if "check_vma" in sig
                  else {"check_rep": False})

        cfg = self.cfg
        tp = self.tp
        h_l = cfg.num_attention_heads // tp
        hkv_l = cfg.num_key_value_heads // tp
        # rope mask/sign over the LOCAL fused qkv layout [q_l | k_l | v_l]
        # — structurally identical to the global one at local head counts
        freqs, is_rope, sign, base_idx, _ = _rope_consts(cfg, h_l, hkv_l)
        if self._pos_scale != 1.0:
            # linear rope scaling on GLOBAL layers (folded into freqs
            # exactly as the module's rope() folds it)
            freqs = freqs * jnp.float32(self._pos_scale)
        pick = self._make_pick(sampler)

        def body_sharded(layers, embed, final_norm, w_head, tok0, caches,
                         start_pos, key):
            b = tok0.shape[0]
            bp = max(_round_up(b, 8), 8)
            v_l = w_head.shape[1]
            off = jax.lax.axis_index("model").astype(jnp.int32) * v_l

            def body(carry, i):
                tok, caches = carry
                pos = start_pos + i
                angles = pos.astype(jnp.float32) * freqs
                cosv = jnp.where(is_rope, jnp.cos(angles)[base_idx], 1.0)
                sinv = jnp.where(is_rope,
                                 sign * jnp.sin(angles)[base_idx], 0.0)
                # dual-rope (gemma3, dp-only): windowed layers rotate
                # with the local-theta tables, like the single-device
                # body (the local [q|k|v] layout == global at tp == 1)
                trig_l = self._local_trig(pos, is_rope, sign, base_idx)
                x = jnp.zeros((bp,), tok.dtype).at[:b].set(tok)
                x = embed[x]
                if self._pos_tab is not None:
                    # OPT-class learned positions (dp-only; the table
                    # rides replicated in the closure)
                    x = x + self._pos_tab[pos + self._pos_off]
                new_caches = []
                # dp-only (tp == 1): every device holds FULL weights,
                # so the layer runs the single-device path (tp_axis
                # None) — that path carries every family feature
                # (sandwich norms, ungated MLPs, parallel residual,
                # dual rope, biases); the tp-split branch only knows
                # the canonical llama shape
                ax = "model" if tp > 1 else None
                for l, w in enumerate(layers):
                    slot = (jnp.mod(pos, caches[l][0].shape[-1])
                            if self.window else None)
                    cv, sv = self._pick_trig(l, cosv, sinv, trig_l)
                    x, cache = self._layer(x, caches[l], w, pos, cv,
                                           sv, h=h_l, hkv=hkv_l,
                                           tp_axis=ax, slot=slot)
                    new_caches.append(cache)
                if tp > 1:
                    logits = dk.fused_dense_decode(
                        x, w_head, norm_scale=final_norm,
                        eps=cfg.rms_norm_eps,
                        norm_bias=self.final_norm_b,
                        norm_type=cfg.norm_type, out_dtype=jnp.float32,
                        block_n=1280)
                else:
                    logits = self._head_logits(x, w_head, final_norm)
                logits = logits[:b]
                if pick is not None:
                    # dp-only (tp==1): the local logits span the full
                    # vocab; each data shard draws its own stream
                    sub = jax.random.fold_in(
                        jax.random.fold_in(key, i),
                        jax.lax.axis_index("data").astype(jnp.uint32))
                    nxt = pick(logits * cfg.logit_scale,
                               sub).astype(tok.dtype)
                    return (nxt, tuple(new_caches)), nxt
                lmax = jnp.max(logits, axis=-1)                     # (b,)
                larg = jnp.argmax(logits, axis=-1).astype(jnp.int32) + off
                gmax = jax.lax.all_gather(lmax, "model")            # (tp, b)
                garg = jax.lax.all_gather(larg, "model")
                widx = jnp.argmax(gmax, axis=0)                     # (b,)
                nxt = jnp.take_along_axis(garg, widx[None], axis=0)[0]
                nxt = nxt.astype(tok.dtype)
                return (nxt, tuple(new_caches)), nxt

            (_, _), toks = jax.lax.scan(body, (tok0, caches),
                                        jnp.arange(n_tokens))
            return toks.T

        lspecs = tuple(
            {k: self._tp_spec(k) for k in e} for e in self.layers)
        # both cache planes (int8 codes and either scale layout) shard
        # over the head axis AND the batch over 'data'; the bf16 cache
        # is a 1-tuple.  Weights replicate across 'data' (their specs
        # name only 'model').
        kv_spec = P("data", "model", None, None)
        n_planes = 2 if self.kv_dtype == jnp.int8 else 1
        cache_spec = tuple((kv_spec,) * n_planes for _ in self.layers)
        fn = shard_map(
            body_sharded, mesh=self.mesh,
            in_specs=(lspecs, P(), P(), P(None, "model"), P("data"),
                      cache_spec, P(), P()),
            out_specs=P("data"),
            **rep_kw)

        @jax.jit
        def run(layers, embed, final_norm, w_head, tok0, caches, start_pos,
                key=None):
            if key is None:
                key = jax.random.PRNGKey(0)      # unused on greedy
            return fn(tuple(layers), embed, final_norm, w_head, tok0,
                      tuple(tuple(c) for c in caches), start_pos, key)

        return run

    def _window_guard(self, max_len, feature: str):
        """Prefix-reuse and VLM-embeds serving keep semantics the
        rolling/floored window paths don't cover (a shared prefix must
        stay visible forever; window semantics evict it) — reject
        serving lengths where the window would bind.  Ragged batches
        and the continuous batcher DO support windows: linear caches +
        a per-step floor on the start masks (+ batcher rebasing, which
        reclaims the dead pre-window tail)."""
        if self.window is not None and max_len > self.window:
            raise NotImplementedError(
                f"{feature} does not support sliding-window serving "
                f"(serving length {max_len} > window {self.window}); "
                "use generate()/generate_ragged/ContinuousBatcher, or "
                "keep prompt+new tokens within the window")

    def init_cache(self, batch: int, max_len: int):
        """Combined [K | V] cache (B, 2*hkv, d, T): one array per layer
        so the per-step write is a single dynamic_update_slice.  MLA:
        the (B, T, r + dr) latent cache instead (module-native — the
        MLAAttention len-1-tuple branch writes it directly)."""
        cfg = self.cfg
        tp = _round_up(max_len, 128)
        if getattr(self, "mla", False):
            if self._mla_kernel:
                return [(jnp.zeros((batch, 2, self._mla_dpad, tp),
                                   self.dtype),)
                        for _ in range(cfg.num_hidden_layers)]
            width = cfg.kv_lora_rank + cfg.qk_rope_head_dim
            return [(jnp.zeros((batch, tp, width), self.dtype),)
                    for _ in range(cfg.num_hidden_layers)]
        shape = (batch, 2 * cfg.num_key_value_heads, cfg.head_dim, tp)
        if self.kv_dtype == "int4":
            return [(jnp.zeros(shape[:2] + (cfg.head_dim // 2, tp),
                               jnp.int8),
                     jnp.ones((batch, 2 * cfg.num_key_value_heads,
                               cfg.head_dim, 1), jnp.float32))
                    for _ in range(cfg.num_hidden_layers)]
        if self.kv_dtype == jnp.int8 and self.kv_scale_mode == "channel":
            return [(jnp.zeros(shape, jnp.int8),
                     jnp.ones((batch, 2 * cfg.num_key_value_heads,
                               cfg.head_dim, 1), jnp.float32))
                    for _ in range(cfg.num_hidden_layers)]
        if self.kv_dtype == jnp.int8:
            return [(jnp.zeros(shape, jnp.int8),
                     jnp.zeros((batch, 2 * cfg.num_key_value_heads, 1, tp),
                               jnp.float32))
                    for _ in range(cfg.num_hidden_layers)]
        return [(jnp.zeros(shape, self.dtype),)
                for _ in range(cfg.num_hidden_layers)]

    def _kv_finalize(self, caches, pad, roll_s=None, roll=False):
        """Engine-format cache post-pass shared by the prefill flavors
        (traced inside their jits): optional tp shard-major head perm,
        optional int8/int4 KV quantization (per-token or channel-static
        scales), then pad each cache to the serving length.

        roll_s (static int or traced scalar): true prompt length when
        the prompt exceeds the sliding window — re-lays the LAST window
        positions into rolling slot order (position p -> slot
        p % window) so decode's slot = pos % window writes land exactly
        where the window semantics need them.  Slots that never held a
        real position (prompt shorter than the window) keep clamped
        junk the `t_ids <= pos` kernel mask never reads.

        roll (static bool): sliding-window serving is active (serving
        length exceeds the window).  Per-LAYER geometry: windowed
        layers re-lay/pad to the window; global layers (gemma2/3
        alternation) pad by `pad` to the full serving length."""
        if getattr(self, "mla", False):
            if not self._mla_kernel:
                # module-native (B, S, r+dr) rows: pad T to the
                # serving length, nothing else applies
                return [(jnp.pad(C, ((0, 0), (0, pad), (0, 0))),)
                        for (C,) in caches]
            # kernel variant: module latent caches -> the combined MQA
            # layout (B, 2, dpad, T): K row = [c|kpe|0], V row =
            # [c|0|0] (_init_mla), one cheap transpose at prefill time
            r = self.cfg.kv_lora_rank
            dpad = self._mla_dpad
            out = []
            for (C,) in caches:
                ct = C.transpose(0, 2, 1)          # (B, W, S)
                wdt = ct.shape[1]
                k = jnp.pad(ct, ((0, 0), (0, dpad - wdt), (0, pad)))
                v = jnp.pad(ct[:, :r], ((0, 0), (0, dpad - r), (0, pad)))
                out.append((jnp.stack([k, v], axis=1),))
            return out
        if roll_s is not None:
            roll = True
        gather = None
        if roll_s is not None:
            win = self.window
            j = jnp.arange(win)
            gather = jnp.clip(roll_s - 1 - ((roll_s - 1 - j) % win),
                              0, None).astype(jnp.int32)
        kv_int8 = self.kv_dtype == jnp.int8
        kv_channel = (self.kv_scale_mode == "channel"
                      and self.kv_dtype is not None)
        kv_int4 = self.kv_dtype == "int4"
        qmax = self._kv_qmax
        kv_margin = self.kv_margin
        kv_perm = (jnp.asarray(_kv_shard_perm(
            self.cfg.num_key_value_heads, self.tp))
            if self.tp > 1 else None)

        eng = []
        for l, (kvdm,) in enumerate(caches):             # (B, 2hkv, d, T)
            wl = self._layer_windows[l] if roll else None
            if wl:
                if gather is not None and kvdm.shape[-1] > wl:
                    kvdm = jnp.take(kvdm, gather, axis=3)
                    lpad = 0
                else:
                    lpad = wl - kvdm.shape[-1]
                    assert lpad >= 0, (l, wl, kvdm.shape)
            else:
                lpad = pad

            def widen(kv, lpad=lpad, fill=0.0):
                if lpad > 0:
                    return jnp.pad(kv, ((0, 0),) * 3 + ((0, lpad),),
                                   constant_values=fill)
                if lpad < 0:       # chunked-scan cache wider than the
                    return kv[..., : kv.shape[-1] + lpad]  # serving len
                return kv

            if kv_perm is not None:
                # shard-major [k_s | v_s] head order (tp cache
                # layout; see _kv_shard_perm)
                kvdm = jnp.take(kvdm, kv_perm, axis=1)
            if kv_channel:
                # static per-(head, channel) scales from the
                # prompt range x margin; decode writes clip
                kvf = kvdm.astype(jnp.float32)
                sc = jnp.clip(jnp.max(jnp.abs(kvf), axis=3,
                                      keepdims=True),
                              1e-8, None) * (kv_margin / qmax)
                codes = jnp.clip(jnp.round(kvf / sc), -qmax, qmax)
                if kv_int4:
                    eng.append((widen(dk.pack_kv_int4(
                        codes.astype(jnp.int32))), sc))
                else:
                    eng.append((widen(codes.astype(jnp.int8)),
                                sc))                     # (B,2hkv,d,1)
            elif kv_int8:
                kvf = kvdm.astype(jnp.float32)
                ss = jnp.clip(jnp.max(jnp.abs(kvf), axis=2,
                                      keepdims=True),
                              1e-8, None) / 127.0        # (B,2hkv,1,T)
                eng.append((widen(jnp.round(kvf / ss).astype(jnp.int8)),
                            widen(ss, fill=1.0)))
            else:
                eng.append((widen(kvdm),))
        return eng

    def _build_fused_prefill(self, p):
        """Quantize + lay out the fused-prefill weights: per-layer
        concat [q|k|v] and [up|gate] int8 (K, N) matrices with
        per-out-channel scales — the act quant happens per-token INSIDE
        the kernels, so no calibration is needed and prompt quality is
        the dynamic-scale one (KL ~0.003 vs static's 0.029,
        tools/bench_prefill_tpu.py)."""
        cfg = self.cfg
        if (self.spmd or self.window or self.moe
                or getattr(cfg, "qk_norm", False)
                or cfg.attention_bias or getattr(cfg, "all_bias", False)
                or cfg.norm_type != "rmsnorm"
                or cfg.parallel_residual
                or getattr(cfg, "sandwich_norms", False)
                or cfg.partial_rotary_factor < 1.0
                or getattr(cfg, "rope_local_theta", None) is not None
                or getattr(cfg, "pos_emb_type", "rope") != "rope"
                or getattr(cfg, "norm_plus_one", False)
                or self.kv_dtype is not None):
            raise NotImplementedError(
                "prefill_quant='fused' covers the canonical llama "
                "family (rmsnorm, full rope, no biases/window/MoE, "
                "bf16 KV, single-device) — use prefill_quant=True "
                "elsewhere")

        def qi8(w):
            wf = w.astype(jnp.float32)
            s = jnp.clip(jnp.max(jnp.abs(wf), axis=0), 1e-8, None) / 127.0
            return (jnp.round(wf / s).astype(jnp.int8),
                    s.reshape(1, -1).astype(jnp.float32))

        layers = []
        for l in range(cfg.num_hidden_layers):
            lp = p[f"layers_{l}"]
            at, ml = lp["self_attn"], lp["mlp"]
            qkv_w, qkv_s = qi8(jnp.concatenate(
                [at["q_proj"]["kernel"], at["k_proj"]["kernel"],
                 at["v_proj"]["kernel"]], axis=1))
            ug_w, ug_s = qi8(jnp.concatenate(
                [ml["up_proj"]["kernel"], ml["gate_proj"]["kernel"]],
                axis=1))
            o_w, o_s = qi8(at["o_proj"]["kernel"])
            dn_w, dn_s = qi8(ml["down_proj"]["kernel"])
            layers.append({
                "qkv_w": qkv_w, "qkv_s": qkv_s, "ug_w": ug_w,
                "ug_s": ug_s, "o_w": o_w, "o_s": o_s, "dn_w": dn_w,
                "dn_s": dn_s,
                "ln1": lp["input_layernorm"]["scale"].astype(jnp.float32),
                "ln2": lp["post_attention_layernorm"]["scale"]
                .astype(jnp.float32),
            })
        # STACKED (L, ...) leaves: the fused forward runs one
        # lax.scan over layers — the unrolled 22-layer graph kept
        # every layer's qkv/mid buffers live (11.5 GB of XLA temps,
        # measured memory_analysis) where scan bounds temps to one
        # layer's working set
        stacked = {k: jnp.stack([lay[k] for lay in layers])
                   for k in layers[0]}
        self._fp_weights = {
            "layers": stacked,
            "embed": p["embed_tokens"]["embedding"].astype(self.dtype),
        }

    def _prefill_fused_run(self, ids, max_len: int):
        """One fused-block prefill dispatch: RMSNorms/rope-k/residuals
        in XLA (measured free), everything hot in Pallas — fused-QKV /
        fused-[up|gate]-SwiGLU / o / down int8 matmuls with in-kernel
        per-token act quant, and the GQA flash kernel with in-kernel
        q-rope.  Writes the engine's combined depth-major caches
        directly.  Returns (tok0, caches) like prefill()."""
        b, s = ids.shape
        tp = _round_up(max_len, 128)
        key = ("fused_prefill", b, s, tp)
        fn = self._run_cache.get(key)
        if fn is None:
            from qdm_tpu.ops import quant_matmul as qmm
            from qdm_tpu.ops.flash_prefill import (flash_prefill_gqa,
                                                   flash_prefill_gqa_ref,
                                                   rope_tables)

            cfg = self.cfg
            h, hkv, d = (cfg.num_attention_heads,
                         cfg.num_key_value_heads, cfg.head_dim)
            eps = cfg.rms_norm_eps
            on_tpu = jax.default_backend() == "tpu"
            # linear rope scaling folds into the tables exactly as the
            # module's rope() folds it (pos_scale = 1/factor) — without
            # this a linear-scaled checkpoint would prefill keys at
            # unscaled positions while decode applies self._pos_scale
            cos, sin = rope_tables(s, d, cfg.rope_theta,
                                   pos_scale=self._pos_scale)

            def mm(x, w, ws):
                if on_tpu:
                    return qmm.w8a8_matmul_fused(x, w, ws)
                xi, xs = qmm.quantize_act_per_token_int(x, 8)
                return qmm.w8a8_matmul_ref(xi, w, xs, ws, x.dtype)

            def glu(x, w, ws):
                zero = jnp.zeros((1, w.shape[1]), jnp.float32)
                if on_tpu:
                    return qmm.w8a8_geglu_fused(x, w, ws, zero, act="silu")
                return qmm.w8a8_geglu_ref(x, w, ws, zero, act="silu")

            def attn(q, k, v):
                f = flash_prefill_gqa if on_tpu else flash_prefill_gqa_ref
                return f(q, k, v, sm_scale=cfg.attn_scale,
                         rope_cos=cos, rope_sin=sin)

            dt = self.dtype

            def norm(x, scale):
                xf = x.astype(jnp.float32)
                y = xf * jax.lax.rsqrt(
                    jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
                return (y * scale).astype(dt)

            w_head = self.w_head
            final_norm = self.final_norm

            @jax.jit
            def fwd(fpw, ids):
                m = b * s
                x = fpw["embed"][ids].astype(dt)

                def layer(x, w):
                    xin = norm(x, w["ln1"])
                    qkv = mm(xin.reshape(m, -1), w["qkv_w"], w["qkv_s"])
                    q = qkv[:, :h * d].reshape(b, s, h, d)
                    k = qkv[:, h * d:(h + hkv) * d].reshape(b, s, hkv, d)
                    v = qkv[:, (h + hkv) * d:].reshape(b, s, hkv, d)
                    # k-rope in XLA (hkv/h of q's bytes; the table
                    # formulation is bit-equal to models/llama.py rope)
                    kf = k.astype(jnp.float32)
                    k = (kf * cos[None, :, None, :]
                         + jnp.roll(kf, d // 2, axis=-1)
                         * sin[None, :, None, :]).astype(dt)
                    kd = k.transpose(0, 2, 3, 1)       # (b, hkv, d, s)
                    vd = v.transpose(0, 2, 3, 1)
                    cache = jnp.pad(
                        jnp.concatenate([kd, vd], axis=1).astype(self.dtype),
                        ((0, 0),) * 3 + ((0, tp - s),))
                    of = attn(q.transpose(0, 2, 1, 3),
                              k.transpose(0, 2, 1, 3),
                              v.transpose(0, 2, 1, 3))
                    o = mm(of.transpose(0, 2, 1, 3).reshape(m, h * d)
                           .astype(dt), w["o_w"], w["o_s"])
                    x = (x.astype(jnp.float32)
                         + o.reshape(b, s, -1)).astype(dt)
                    xin2 = norm(x, w["ln2"])
                    mid = glu(xin2.reshape(m, -1), w["ug_w"], w["ug_s"])
                    dn = mm(mid.astype(dt), w["dn_w"], w["dn_s"])
                    x = (x.astype(jnp.float32)
                         + dn.reshape(b, s, -1)).astype(dt)
                    return x, cache

                x, cache_stack = jax.lax.scan(layer, x, fpw["layers"])
                xl = norm(x[:, -1], final_norm)
                logits = (xl.astype(w_head.dtype) @ w_head) \
                    .astype(jnp.float32)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return tok, logits, cache_stack

            self._run_cache[key] = fn = fwd
        tok, logits, cache_stack = fn(self._fp_weights, jnp.asarray(ids))
        self._last_prefill_logits = logits
        caches = [(cache_stack[l],)
                  for l in range(self.cfg.num_hidden_layers)]
        return tok, caches

    def prefill(self, ids, max_len: int):
        """Module-path prefill writing the engine's combined [K|V]
        depth-major cache layout DIRECTLY (the llama attention's
        len-1-tuple cache branch) — no post-prefill transpose+concat
        conversion.  Only the int8-KV quantization and the tp>1
        shard-major head permutation remain as post-passes.  Returns
        (first generated token, engine caches)."""
        b, s = ids.shape
        if self.prefill_fused and s % 128 == 0 and s >= 256:
            return self._prefill_fused_run(ids, max_len)
        if self.spmd and b % self.dp:
            raise ValueError(f"batch {b} must divide dp={self.dp}")
        if self.multihost:
            # each process prefills only ITS dp rows — the full-batch
            # forward would be (nprocs-1)/nprocs redundant work
            shd = NamedSharding(self.mesh, P("data"))
            lo, hi = _local_row_range(shd, (b,))
            ids = np.asarray(ids)[lo:hi]
            b = hi - lo
        # the module prefill runs on a round_up(s, 128)-length cache so
        # its (S, T) attention has S == T: XLA only flash-fuses the
        # square aligned pattern — at ctx 4096 x batch 16 the T=4224
        # cache materialized f32 (B, hkv, g, S, T) logits = 35 GB
        # (measured OOM, r3l).  The caches are padded to the full
        # serving length inside the jit afterwards (one cheap copy).
        sp = _round_up(s, 128)
        tp = _round_up(max_len, 128)
        # sliding-window serving: once the serving length exceeds the
        # window, windowed layers' engine caches are window-slot
        # ROLLING buffers — the finalize caps them at the window and
        # re-lays a longer prompt's last-window positions into slot
        # order (roll_s); global layers (gemma2/3 alternation) keep
        # the full tp-length cache
        roll = self.window is not None and max_len > self.window
        roll_s = s if (roll and sp > self.window) else None
        assert tp >= sp, (max_len, s)
        model, params = self._prefill_model, self._prefill_params
        cfg = self.cfg
        if getattr(self, "mla", False):
            # module-native latent caches; finalize pads T to tp
            width = cfg.kv_lora_rank + cfg.qk_rope_head_dim
            caches = [(jnp.zeros((b, sp, width), self.dtype),)
                      for _ in range(cfg.num_hidden_layers)]
        else:
            caches = [(jnp.zeros((b, 2 * cfg.num_key_value_heads,
                                  cfg.head_dim, sp), self.dtype),)
                      for _ in range(cfg.num_hidden_layers)]

        if self._prefill_fn is None:
            finalize = self._kv_finalize

            @functools.partial(jax.jit,
                               static_argnames=("pad", "roll_s", "roll"))
            def fwd(params, ids, caches, pad, roll_s=None, roll=False):
                logits, caches = model.apply({"params": params}, ids,
                                             kv_caches=caches, cache_index=0,
                                             last_logits_only=True)
                logits = logits[:, -1]
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return tok, logits, finalize(caches, pad, roll_s, roll)

            self._prefill_fn = fwd
        tok, logits, eng = self._prefill_fn(params, jnp.asarray(ids), caches,
                                            tp - sp, roll_s=roll_s,
                                            roll=roll)
        # last-position logits stay on device; the sampling path picks
        # its first token from them (greedy ignores them)
        self._last_prefill_logits = logits
        if self.spmd:
            kv_sp = P("data", "model", None, None)
            eng = [tuple(self._put(c, kv_sp, local=self.multihost)
                         for c in entry) for entry in eng]
            tok = self._put(tok, P("data"), local=self.multihost)
        return tok, eng

    def prefill_embeds(self, embeds, max_len: int):
        """VLM prefill: the prompt arrives as LM-space EMBEDDINGS
        (image patch embeds + token embeds concatenated by the caller,
        the LLaVA protocol) instead of token ids — the engine-path
        counterpart of the reference's fused VLM generation
        (models/llava.py:103-148 LlavaFuser.fuse_transformer: vision
        tower stays eager, the LLM backbone decodes through the fused
        stack).  Decode steps after this are ordinary token steps
        through the megakernels.  Returns (first generated token,
        engine caches)."""
        self._mla_guard("prefill_embeds (VLM-embeds serving)")
        self._window_guard(max_len, "prefill_embeds (VLM serving)")
        b, s, _ = embeds.shape
        if self.spmd:
            raise NotImplementedError("embeds prefill is single-device")
        sp = _round_up(s, 128)
        tp = _round_up(max_len, 128)
        assert tp >= sp, (max_len, s)
        model, params = self._prefill_model, self._prefill_params
        cfg = self.cfg
        caches = [(jnp.zeros((b, 2 * cfg.num_key_value_heads,
                              cfg.head_dim, sp), self.dtype),)
                  for _ in range(cfg.num_hidden_layers)]
        key = ("prefill_embeds", b, s, sp, tp)
        fwd = self._run_cache.get(key)
        if fwd is None:
            finalize = self._kv_finalize

            @functools.partial(jax.jit, static_argnames=("pad",))
            def fwd(params, embeds, caches, pad):
                logits, caches = model.apply(
                    {"params": params}, input_embeds=embeds,
                    kv_caches=caches, cache_index=0,
                    last_logits_only=True)
                logits = logits[:, -1]
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return tok, logits, finalize(caches, pad)

            self._run_cache[key] = fwd
        tok, logits, eng = fwd(params, jnp.asarray(embeds), caches,
                               tp - sp)
        self._last_prefill_logits = logits
        return tok, eng

    def generate_embeds(self, embeds, max_new_tokens: int = 32,
                        temperature: float = 0.0, top_k: int = 0,
                        top_p: float = 0.0, seed: int = 0,
                        eos_token_id: Optional[int] = None) -> np.ndarray:
        """Decode from an embeddings prompt (see prefill_embeds).
        Returns ONLY the generated tokens (B, max_new_tokens) — the
        prompt has no token-id representation to echo."""
        if temperature <= 0.0 and (top_k or top_p):
            raise ValueError("top_k/top_p need temperature > 0")
        sampler = ((float(temperature), int(top_k), float(top_p))
                   if temperature > 0.0 else ())
        b, s, _ = np.asarray(embeds).shape
        max_len = s + max_new_tokens
        tok0, caches = self.prefill_embeds(embeds, max_len)
        run = self._make_run(max_new_tokens - 1, sampler)
        key = None
        if sampler:
            key = jax.random.PRNGKey(seed)
            from qdm_tpu.api.causal_lm import fold_key

            tok0 = self._pick0(sampler)(
                self._last_prefill_logits,
                fold_key(key, 2**32 - 1)).astype(tok0.dtype)
        self._last_prefill_logits = None
        toks = run(self.layers, self.embed, self.final_norm, self._head,
                   tok0, caches, jnp.int32(s), key)
        out = np.concatenate([np.asarray(tok0)[:, None], np.asarray(toks)],
                             axis=1)[:, :max_new_tokens]
        if eos_token_id is not None:
            from qdm_tpu.api.causal_lm import mask_after_eos

            out = mask_after_eos(out, eos_token_id)
        return out

    def prefill_chunked(self, ids, max_len: int, chunk: int = 512):
        """Bounded-memory prefill: the prompt forwards in fixed-size
        chunks under ONE jitted lax.scan, cache_index advancing — each
        chunk's attention is (C, T) instead of (S, S), so the peak
        attention-logits block is C/S of the square prefill's and ANY
        context length prefills in O(C * T) memory, including shapes
        where the flash path cannot engage (unaligned, non-TPU, int8
        per-token module caches).  This is the TPU answer to chunked/
        incremental prefill in production serving stacks: fixed shapes,
        one compile, no host round-trips between chunks.

        Tokens beyond the prompt (the pad tail of the last chunk)
        write garbage K/V above position S; decode appends overwrite
        slot S first and every attention masks positions beyond the
        current one, so the garbage is never visible (same invariant
        the continuous batcher relies on).  Channel-static KV scales
        mask the garbage columns out.  Returns (first generated token,
        engine caches).

        Sliding-window models: this is THE long-prompt prefill path —
        the banded mask keeps the flash kernel out of the square
        prefill, so an S x S einsum would materialize f32 logits; the
        chunked scan bounds that at C x S, and the finalize re-lays the
        last-window positions into the rolling cache."""
        self._mla_guard("prefill_chunked")
        b, s = ids.shape
        if self.spmd:
            raise NotImplementedError("chunked prefill is single-device")
        chunk = min(int(chunk), _round_up(s, 128))
        n = -(-s // chunk)
        sp = n * chunk
        tp = _round_up(max_len, 128)
        rolling = self.window is not None and max_len > self.window
        if rolling:
            # scan over a LINEAR cache wide enough for the whole
            # prompt; the finalize re-lays windowed layers to their
            # window and pads/clips global layers (gemma2/3) to tp.
            # All-windowed models (mistral) keep the prompt-width scan
            # cache — the window bounds their decode length anyway.
            has_global = any(w is None for w in self._layer_windows)
            scw = max(_round_up(sp, 128), tp if has_global else 0)
            use_roll = scw > self.window
        else:
            scw, use_roll = tp, False
            assert tp >= sp, (max_len, s, chunk)
        pad_f = tp - scw            # <=0: finalize clips global layers
        model, params = self._prefill_model, self._prefill_params
        cfg = self.cfg
        ids_p = np.zeros((b, sp), np.int32)
        ids_p[:, :s] = np.asarray(ids)
        caches = [(jnp.zeros((b, 2 * cfg.num_key_value_heads,
                              cfg.head_dim, scw), self.dtype),)
                  for _ in range(cfg.num_hidden_layers)]
        key = ("prefill_chunked", chunk, n, sp, scw, b, use_roll, pad_f,
               rolling)
        fwd = self._run_cache.get(key)
        if fwd is None:
            finalize = self._kv_finalize

            @jax.jit
            def fwd(params, ids_c, caches, s_real):
                # ids_c (n, B, C); scan chunks, caches as carry
                def body(carry, inp):
                    caches, i = carry
                    idx_last = jnp.clip(s_real - 1 - i * chunk,
                                        0, chunk - 1)
                    logits, caches = model.apply(
                        {"params": params}, inp, kv_caches=caches,
                        cache_index=i * chunk,
                        last_logits_only=idx_last)
                    return (caches, i + 1), logits[:, -1]

                (caches, _), all_logits = jax.lax.scan(
                    body, (caches, jnp.int32(0)), ids_c)
                logits = all_logits[(s_real - 1) // chunk]
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                # mask the pad-tail garbage out of the quantization
                # scales (positions >= s_real); the codes there are
                # junk but invisible (see docstring)
                masked = []
                tpos = jnp.arange(caches[0][0].shape[-1])
                keep = (tpos < s_real).reshape(1, 1, 1, -1)
                for (kvdm,) in caches:
                    masked.append((jnp.where(keep, kvdm, 0),))
                return tok, logits, finalize(
                    masked, pad_f, s_real if use_roll else None,
                    roll=use_roll or rolling)

            self._run_cache[key] = fwd
        ids_c = jnp.asarray(ids_p.reshape(b, n, chunk)
                            .transpose(1, 0, 2))
        tok, logits, eng = fwd(params, ids_c, caches, jnp.int32(s))
        self._last_prefill_logits = logits
        return tok, eng

    def generate(self, input_ids, max_new_tokens: int = 32,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 0.0, seed: int = 0,
                 per_row_seeds=None,
                 eos_token_id: Optional[int] = None,
                 stop_early: bool = False,
                 prefix=None,
                 prefill_chunk: Optional[int] = None) -> np.ndarray:
        """Decode.  Greedy by default (works single-device, under any
        single-host dp x tp mesh, and on multi-host meshes); sampled
        when temperature > 0 — same knobs as CausalLM.generate / HF
        generate, on a single device or a single-host dp-only mesh
        (tp>1 splits the vocab; each dp shard samples its own stream).
        Every generated token including the first comes from the
        sampler when sampling is on (the first from the prefill's
        last-position logits), all seed-deterministic.

        stop_early=True (needs eos_token_id; single-device): the
        decode runs as a lax.while_loop that EXITS once every row has
        emitted EOS — the fixed-length scan keeps computing after all
        rows finish, which wastes up to (max_new_tokens - longest
        completion) steps per batch in real serving.  Finished rows
        emit EOS from then on (pad-after-eos built in)."""
        # validate BEFORE the expensive prefill (a late reject would
        # burn the full prompt forward + its remote kernel compiles)
        if temperature <= 0.0 and (top_k or top_p):
            raise ValueError(
                "top_k/top_p need temperature > 0 (HF do_sample uses "
                "temperature=1.0 by default); temperature<=0 is greedy")
        sampler = ((float(temperature), int(top_k), float(top_p))
                   if temperature > 0.0 else ())
        if sampler and (self.tp > 1 or self.multihost):
            raise NotImplementedError(
                "sampling needs the full vocab on one host (dp-only "
                "single-host meshes or a single device)")
        if stop_early:
            if eos_token_id is None:
                raise ValueError("stop_early needs eos_token_id")
            if self.spmd:
                raise NotImplementedError(
                    "stop_early is a single-device option (the while "
                    "predicate is a cross-shard reduction)")
        ids = np.asarray(input_ids)
        b, s = ids.shape
        if prefix is not None:
            # shared-prompt serving: input_ids are the SUFFIX rows on
            # top of a precompute_prefix handle (see prefill_prefixed)
            p0 = prefix[0]
            max_len = p0 + s + max_new_tokens
            tok0, caches = self.prefill_prefixed(prefix, ids, max_len)
            s = p0 + s
        elif prefill_chunk:
            max_len = s + max_new_tokens
            tok0, caches = self.prefill_chunked(ids, max_len,
                                                chunk=prefill_chunk)
        else:
            max_len = s + max_new_tokens
            tok0, caches = self.prefill(ids, max_len)
        if stop_early:
            run = self._make_run_while(max_new_tokens - 1, sampler,
                                       int(eos_token_id))
        else:
            run = self._make_run(max_new_tokens - 1, sampler)
        weights = self.layers
        key = None
        if sampler:
            if per_row_seeds is not None:
                seeds = jnp.asarray(per_row_seeds, jnp.uint32)
                assert seeds.shape == (b,), (seeds.shape, b)
                key = jax.vmap(jax.random.PRNGKey)(seeds)      # (B, 2)
            else:
                key = jax.random.PRNGKey(seed)
            from qdm_tpu.api.causal_lm import fold_key

            # pick the first token with the sampler too, from the
            # prefill's last-position logits (module-path logits —
            # logit_scale is ALREADY applied there, llama.py).  One
            # memoized jitted launch, not eager per-op dispatches.
            tok0 = self._pick0(sampler)(
                self._last_prefill_logits,
                fold_key(key, 2**32 - 1)).astype(tok0.dtype)
        self._last_prefill_logits = None
        toks = run(weights, self.embed, self.final_norm, self._head,
                   tok0, caches, jnp.int32(s), key)
        if self.multihost:
            # global dp-sharded tokens -> full value on every host
            from jax.experimental import multihost_utils as mhu

            tok0 = mhu.process_allgather(tok0, tiled=True)
            toks = mhu.process_allgather(toks, tiled=True)
        out = np.concatenate([np.asarray(tok0)[:, None], np.asarray(toks)],
                             axis=1)[:, :max_new_tokens]
        if eos_token_id is not None:
            from qdm_tpu.api.causal_lm import mask_after_eos

            out = mask_after_eos(out, eos_token_id)
        return np.concatenate([ids, out], axis=1)

    # ----------------------------------------------------------- prefix cache
    #
    # Shared-prompt KV reuse (the vLLM-style system-prompt lever,
    # expressed TPU-first with fixed shapes): compute the common
    # prefix's KV ONCE with a single-row module prefill, then every
    # batch prefill broadcasts those columns into the batch cache and
    # runs the forward over the SUFFIX tokens only (cache_index=P
    # multi-token append — the llama attention's causal mask
    # `k_pos <= cache_index + arange(s)` already covers it).  Because
    # attention is causal and the prefix is row-independent, the
    # result is mathematically identical to prefilling the full
    # [prefix|suffix] prompt; greedy continuations are bit-equal on
    # the f32 CPU path (tested).  The reference has no serving layer
    # at all — the closest ancestor is its rolling KV cache in fused
    # modules (utils/fused_utils.py:45-142), which never shares
    # prefixes across requests.

    def precompute_prefix(self, prefix_ids):
        """One-time KV computation for a shared prompt prefix.

        Returns an opaque ``(P, kv)`` handle for ``generate(...,
        prefix=)`` / ``prefill_prefixed``: P is the prefix token count
        and kv a per-layer list of raw-dtype (1, 2hkv, d,
        round_up(P, 128)) combined depth-major caches (UNquantized —
        quantization happens after the suffix prefill so the
        channel-static scales span prefix+suffix exactly like a full
        prefill's would)."""
        self._mla_guard("precompute_prefix (prefix caching)")
        if self.spmd:
            raise NotImplementedError("prefix caching is single-device")
        ids = np.asarray(prefix_ids)
        if ids.ndim == 1:
            ids = ids[None]
        if ids.shape[0] != 1:
            raise ValueError("a prefix is one shared row; got "
                             f"batch {ids.shape[0]}")
        p = ids.shape[1]
        pp = _round_up(p, 128)
        model, params = self._prefill_model, self._prefill_params
        cfg = self.cfg
        caches = [(jnp.zeros((1, 2 * cfg.num_key_value_heads,
                              cfg.head_dim, pp), self.dtype),)
                  for _ in range(cfg.num_hidden_layers)]
        if self._prefix_fn is None:

            @jax.jit
            def fwd(params, ids, caches):
                _, caches = model.apply({"params": params}, ids,
                                        kv_caches=caches, cache_index=0,
                                        last_logits_only=True)
                return [c for (c,) in caches]

            self._prefix_fn = fwd
        return p, self._prefix_fn(params, jnp.asarray(ids), caches)

    def prefill_prefixed(self, prefix, ids, max_len: int):
        """Prefill suffix rows on top of a precomputed shared prefix:
        ids (B, S) holds ONLY each request's suffix tokens.  One
        forward over S tokens per row instead of P+S — at a typical
        system-prompt workload (P >> S) this removes nearly the whole
        per-request prefill cost.  Returns (first tokens, engine
        caches); decode then starts at position P+S."""
        self._window_guard(max_len, "prefix-cached serving")
        p, kv = prefix
        b, s = ids.shape
        if self.spmd:
            raise NotImplementedError("prefix caching is single-device")
        sp = _round_up(p + s, 128)
        tp = _round_up(max_len, 128)
        assert tp >= sp, (max_len, p, s)
        model, params = self._prefill_model, self._prefill_params
        cfg = self.cfg
        caches = [(jnp.zeros((b, 2 * cfg.num_key_value_heads,
                              cfg.head_dim, sp), self.dtype),)
                  for _ in range(cfg.num_hidden_layers)]
        if self._prefixed_fn is None:
            finalize = self._kv_finalize

            @functools.partial(jax.jit, static_argnames=("p", "pad"))
            def fwd(params, ids, kvpre, caches, p, pad):
                b2 = ids.shape[0]
                full = []
                for (c,), k in zip(caches, kvpre):
                    pre = jnp.broadcast_to(k[..., :p],
                                           (b2,) + k.shape[1:3] + (p,))
                    full.append((jax.lax.dynamic_update_slice(
                        c, pre.astype(c.dtype), (0, 0, 0, 0)),))
                logits, full = model.apply({"params": params}, ids,
                                           kv_caches=full, cache_index=p,
                                           last_logits_only=True)
                logits = logits[:, -1]
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return tok, logits, finalize(full, pad)

            self._prefixed_fn = fwd
        tok, logits, eng = self._prefixed_fn(params, jnp.asarray(ids), kv,
                                             caches, p, tp - sp)
        self._last_prefill_logits = logits
        return tok, eng

    def prefill_ragged_prefixed(self, prefix, ids, lens):
        """Ragged mini-prefill on top of a shared precomputed prefix —
        the continuous-batching admission primitive for prefix-cached
        serving.  ids (B, S) holds LEFT-padded suffix rows (row r's
        tokens in columns [S - lens[r], S)).  The mini cache is laid
        out [prefix | pad | suffix] of width P+S: the prefix KV is
        pasted below the pad region and stays visible to every real
        query through the model's ``attn_prefix`` mask, while pad
        slots stay invisible.  Suffix positions/rope start at P.
        Channel-static KV scales span prefix+suffix valid slots — the
        same scales a full [prefix|suffix] prefill would produce.
        Returns (first tokens, mini caches); ``admit_rows(prefix=)``
        re-packs the two pieces contiguously into the live caches."""
        p0, kvpre = prefix
        b, s = ids.shape
        if self.spmd:
            raise NotImplementedError("ragged serving is single-device")
        if self._pos_tab is not None:
            raise NotImplementedError(
                "ragged serving of learned-position (OPT-class) models "
                "needs per-row position-table adds in the ragged decode "
                "step; use generate()")
        if self.kv_dtype == jnp.int8 and self.kv_scale_mode != "channel":
            raise NotImplementedError(
                "ragged int8 KV runs with kv_scale_mode='channel'")
        model, params = self._prefill_model, self._prefill_params
        cfg = self.cfg
        caches = [(jnp.zeros((b, 2 * cfg.num_key_value_heads,
                              cfg.head_dim, p0 + s), self.dtype),)
                  for _ in range(cfg.num_hidden_layers)]
        if self._prefixed_ragged_fn is None:
            kv_channel = self.kv_dtype is not None
            kv_int4 = self.kv_dtype == "int4"
            qmax = self._kv_qmax
            kv_margin = self.kv_margin

            @functools.partial(jax.jit, static_argnames=("p0",))
            def fwd(params, ids, lens, kvpre, caches, p0):
                b2, s2 = ids.shape
                pads = s2 - lens                              # (B,)
                full = []
                for (c,), k in zip(caches, kvpre):
                    pre = jnp.broadcast_to(k[..., :p0],
                                           (b2,) + k.shape[1:3] + (p0,))
                    full.append((jax.lax.dynamic_update_slice(
                        c, pre.astype(c.dtype), (0, 0, 0, 0)),))
                positions = p0 + jnp.clip(
                    jnp.arange(s2)[None] - pads[:, None], 0, None)
                logits, full = model.apply(
                    {"params": params}, ids, positions=positions,
                    kv_caches=full, cache_index=p0,
                    attn_start=p0 + pads, attn_prefix=p0,
                    last_logits_only=True)
                logits = logits[:, -1]
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                eng = []
                for (kvdm,) in full:
                    if kv_channel:
                        # scales from the prefix + valid suffix slots
                        # (pad columns hold garbage K/V the masks hide)
                        tpos = jnp.arange(kvdm.shape[-1])
                        valid = ((tpos[None] < p0)
                                 | ((tpos[None] >= (p0 + pads)[:, None])
                                    & (tpos[None] < p0 + s2)))
                        kvf = kvdm.astype(jnp.float32)
                        mag = jnp.where(valid[:, None, None, :],
                                        jnp.abs(kvf), 0.0)
                        sc = jnp.clip(jnp.max(mag, axis=3, keepdims=True),
                                      1e-8, None) * (kv_margin / qmax)
                        codes = jnp.clip(jnp.round(kvf / sc), -qmax, qmax)
                        if kv_int4:
                            eng.append((dk.pack_kv_int4(
                                codes.astype(jnp.int32)), sc))
                        else:
                            eng.append((codes.astype(jnp.int8), sc))
                    else:
                        eng.append((kvdm,))
                return tok, logits, eng

            self._prefixed_ragged_fn = fwd
        lens = jnp.asarray(lens, jnp.int32)
        tok, logits, eng = self._prefixed_ragged_fn(
            params, jnp.asarray(ids), lens, kvpre, caches, p0)
        self._last_prefill_logits = logits
        return tok, eng

    # --------------------------------------------------------- ragged batches

    def prefill_ragged(self, ids, lens, max_len: int):
        """Prefill a LEFT-padded ragged batch: ids (B, S) with row r's
        real tokens in columns [S - lens[r], S).  Per-row rope
        positions start at 0 for each prompt, and pad slots are masked
        out of every attention (the model's ``attn_start``).  Returns
        (first tokens, engine caches, starts) — starts (B,) are the
        per-row first valid cache slots the decode attention needs."""
        self._mla_guard("prefill_ragged")
        b, s = ids.shape
        if self.tp > 1 or self.multihost:
            raise NotImplementedError(
                "ragged serving shards dp-only on a single-host mesh "
                "(the tp megakernel layers don't thread per-row start "
                "masks yet)")
        if self.spmd and b % self.dp:
            raise ValueError(f"ragged batch {b} must divide dp={self.dp}")
        if self._pos_tab is not None:
            raise NotImplementedError(
                "ragged serving of learned-position (OPT-class) models "
                "needs per-row position-table adds in the ragged decode "
                "step; use generate()")
        if self.kv_dtype == jnp.int8 and self.kv_scale_mode != "channel":
            raise NotImplementedError(
                "ragged int8 KV runs with the channel-static scales "
                "(kv_scale_mode='channel'); the per-token scale plane "
                "doesn't thread the ragged masks")
        # square-aligned prefill + post-pad (see prefill(): the (S, T)
        # T>S attention does not flash-fuse)
        sp = _round_up(s, 128)
        tp = _round_up(max_len, 128)
        assert tp >= sp, (max_len, s)
        model, params = self._prefill_model, self._prefill_params
        cfg = self.cfg
        caches = [(jnp.zeros((b, 2 * cfg.num_key_value_heads, cfg.head_dim,
                              sp), self.dtype),)
                  for _ in range(cfg.num_hidden_layers)]

        if self._prefill_ragged_fn is None:
            kv_channel = self.kv_dtype is not None
            kv_int4 = self.kv_dtype == "int4"
            qmax = self._kv_qmax
            kv_margin = self.kv_margin

            @functools.partial(jax.jit, static_argnames=("pad",))
            def fwd(params, ids, lens, caches, pad):
                b2, s2 = ids.shape
                pads = s2 - lens                              # (B,)
                positions = jnp.clip(jnp.arange(s2)[None] - pads[:, None],
                                     0, None)
                logits, caches = model.apply({"params": params}, ids,
                                             positions=positions,
                                             kv_caches=caches,
                                             cache_index=0,
                                             attn_start=pads,
                                             last_logits_only=True)
                logits = logits[:, -1]
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

                def widen(kv):
                    return (jnp.pad(kv, ((0, 0),) * 3 + ((0, pad),))
                            if pad else kv)

                eng = []
                for (kvdm,) in caches:
                    if kv_channel:
                        # channel-static scales from the VALID slots
                        # only (pad columns hold garbage K/V the masks
                        # hide; they must not inflate the scales)
                        tpos = jnp.arange(kvdm.shape[-1])
                        valid = ((tpos[None] >= pads[:, None])
                                 & (tpos[None] < s2))         # (B, T)
                        kvf = kvdm.astype(jnp.float32)
                        mag = jnp.where(valid[:, None, None, :],
                                        jnp.abs(kvf), 0.0)
                        sc = jnp.clip(jnp.max(mag, axis=3, keepdims=True),
                                      1e-8, None) * (kv_margin / qmax)
                        codes = jnp.clip(jnp.round(kvf / sc), -qmax, qmax)
                        if kv_int4:
                            eng.append((widen(dk.pack_kv_int4(
                                codes.astype(jnp.int32))), sc))
                        else:
                            eng.append((widen(codes.astype(jnp.int8)), sc))
                    else:
                        eng.append((widen(kvdm),))
                return tok, logits, eng

            self._prefill_ragged_fn = fwd
        lens = jnp.asarray(lens, jnp.int32)
        tok, logits, eng = self._prefill_ragged_fn(
            params, jnp.asarray(ids), lens, caches, tp - sp)
        self._last_prefill_logits = logits
        if self.spmd:
            # dp batch sharding, exactly like prefill(): caches shard
            # rows over 'data' (the size-1 'model' axis keeps the spec
            # uniform with the tp engine), decode inputs follow inside
            # the jitted ragged run via GSPMD propagation
            kv_sp = P("data", "model", None, None)
            eng = [tuple(self._put(c, kv_sp) for c in entry)
                   for entry in eng]
            tok = self._put(tok, P("data"))
            self._last_prefill_logits = self._put(logits, P("data"))
        return tok, eng, (s - lens)

    def _make_run_ragged(self, n_tokens: int, sampler=(), eos=None):
        """Decode step for ragged batches: per-row rope angles (the
        kernel trig vectors are shared, so rotation moves to XLA with
        the exact kernel formula) + per-row start masks in attention.
        Physical cache slots stay uniform (every row appends at
        start_pos + i); only the LOGICAL rope position differs
        (lens[r] + i).  eos set: while_loop early exit (the ragged
        counterpart of _make_run_while)."""
        memo = ("ragged", n_tokens, sampler, eos)
        if memo in self._run_cache:
            return self._run_cache[memo]
        cfg = self.cfg
        freqs, is_rope, sign, base_idx, partner = _rope_consts(cfg)
        if self._pos_scale != 1.0:
            # linear rope scaling on GLOBAL layers (folded into freqs
            # exactly as the module's rope() folds it)
            freqs = freqs * jnp.float32(self._pos_scale)
        pick = self._make_pick(sampler)

        @jax.jit
        def run(layers, embed, final_norm, w_head, tok0, caches, start_pos,
                lens, starts, key=None):
            b = tok0.shape[0]
            bp = max(_round_up(b, 8), 8)

            def step(tok, caches, i):
                pos = start_pos + i                      # physical slot
                pos_log = lens + i                       # (b,) logical
                angles = pos_log.astype(jnp.float32)[:, None] * freqs
                cosb = jnp.where(is_rope[None],
                                 jnp.cos(angles)[:, base_idx], 1.0)
                sinb = jnp.where(is_rope[None],
                                 sign[None] * jnp.sin(angles)[:, base_idx],
                                 0.0)
                trig_l = self._local_trig(pos_log, is_rope, sign,
                                          base_idx)
                if bp > b:
                    cosb = jnp.pad(cosb, ((0, bp - b), (0, 0)),
                                   constant_values=1.0)
                    sinb = jnp.pad(sinb, ((0, bp - b), (0, 0)))
                    if trig_l is not None:
                        trig_l = (jnp.pad(trig_l[0], ((0, bp - b), (0, 0)),
                                          constant_values=1.0),
                                  jnp.pad(trig_l[1], ((0, bp - b), (0, 0))))
                x = jnp.zeros((bp,), tok.dtype).at[:b].set(tok)
                x = embed[x]
                new_caches = []
                for l, w in enumerate(layers):
                    # sliding window on LINEAR ragged caches: a key is
                    # in row r's window iff k_slot > pos - W_l (the
                    # per-row physical offsets cancel: slot - start ==
                    # logical position) — a per-step, per-layer FLOOR
                    # on the start masks (gemma2/3 global layers keep
                    # the raw starts)
                    wl = self._layer_windows[l]
                    se = (jnp.maximum(starts, pos - (wl - 1)) if wl
                          else starts)
                    cb, sb = self._pick_trig(l, cosb, sinb, trig_l)
                    x, cache = self._layer(x, caches[l], w, pos, None,
                                           None,
                                           rope_xla=(cb, sb, partner),
                                           attn_starts=se)
                    new_caches.append(cache)
                logits = self._head_logits(x, w_head, final_norm)
                if pick is None:
                    nxt = jnp.argmax(logits[:b], axis=-1).astype(tok.dtype)
                else:
                    from qdm_tpu.api.causal_lm import fold_key

                    nxt = pick(logits[:b] * cfg.logit_scale,
                               fold_key(key, i)).astype(tok.dtype)
                return nxt, new_caches

            if eos is None:
                def body(carry, i):
                    tok, caches = carry
                    nxt, new_caches = step(tok, caches, i)
                    return (nxt, new_caches), nxt

                (_, _), toks = jax.lax.scan(body, (tok0, caches),
                                            jnp.arange(n_tokens))
                return toks.T

            def cond(st):
                i, _, done, _, _ = st
                return (i < n_tokens) & ~jnp.all(done)

            def wbody(st):
                i, tok, done, caches, buf = st
                nxt, new_caches = step(tok, caches, i)
                nxt = jnp.where(done, eos, nxt)
                return (i + 1, nxt, done | (nxt == eos), new_caches,
                        jax.lax.dynamic_update_slice(buf, nxt[:, None],
                                                     (0, i)))

            _, _, _, _, buf = jax.lax.while_loop(
                cond, wbody, (jnp.int32(0), tok0, tok0 == eos,
                              caches, jnp.full((b, n_tokens), eos,
                                               tok0.dtype)))
            return buf

        self._run_cache[memo] = run
        return run

    def _make_run_ragged_chunk(self, n_tokens: int, sampler=()):
        """Chunked ragged decode for continuous batching: the same
        per-row-rope / per-row-start step as ``_make_run_ragged`` but
        returns (tokens, final token, UPDATED caches) so the host
        scheduler (``ContinuousBatcher``) can admit new requests into
        finished rows between chunks.

        Sampling uses PER-ROW keys plus per-row fold OFFSETS (``offs``:
        how many decode draws the row's request consumed in earlier
        chunks) so each request's stream folds its own counter 0, 1,
        ... regardless of chunk boundaries or batch composition — the
        chunked analogue of generate_ragged's per_row_seeds contract."""
        memo = ("ragged_chunk", n_tokens, sampler)
        if memo in self._run_cache:
            return self._run_cache[memo]
        cfg = self.cfg
        freqs, is_rope, sign, base_idx, partner = _rope_consts(cfg)
        if self._pos_scale != 1.0:
            # linear rope scaling on GLOBAL layers (folded into freqs
            # exactly as the module's rope() folds it)
            freqs = freqs * jnp.float32(self._pos_scale)
        pick = self._make_pick(sampler)

        @jax.jit
        def run(layers, embed, final_norm, w_head, tok0, caches, start_pos,
                lens, starts, offs=None, key=None):
            b = tok0.shape[0]
            bp = max(_round_up(b, 8), 8)

            def body(carry, i):
                tok, caches = carry
                pos = start_pos + i
                pos_log = lens + i
                angles = pos_log.astype(jnp.float32)[:, None] * freqs
                cosb = jnp.where(is_rope[None],
                                 jnp.cos(angles)[:, base_idx], 1.0)
                sinb = jnp.where(is_rope[None],
                                 sign[None] * jnp.sin(angles)[:, base_idx],
                                 0.0)
                trig_l = self._local_trig(pos_log, is_rope, sign,
                                          base_idx)
                if bp > b:
                    cosb = jnp.pad(cosb, ((0, bp - b), (0, 0)),
                                   constant_values=1.0)
                    sinb = jnp.pad(sinb, ((0, bp - b), (0, 0)))
                    if trig_l is not None:
                        trig_l = (jnp.pad(trig_l[0], ((0, bp - b), (0, 0)),
                                          constant_values=1.0),
                                  jnp.pad(trig_l[1], ((0, bp - b), (0, 0))))
                x = jnp.zeros((bp,), tok.dtype).at[:b].set(tok)
                x = embed[x]
                new_caches = []
                for l, w in enumerate(layers):
                    # sliding window on LINEAR ragged caches: a key is
                    # in row r's window iff k_slot > pos - W_l (the
                    # per-row physical offsets cancel: slot - start ==
                    # logical position) — a per-step, per-layer FLOOR
                    # on the start masks (gemma2/3 global layers keep
                    # the raw starts)
                    wl = self._layer_windows[l]
                    se = (jnp.maximum(starts, pos - (wl - 1)) if wl
                          else starts)
                    cb, sb = self._pick_trig(l, cosb, sinb, trig_l)
                    x, cache = self._layer(x, caches[l], w, pos, None,
                                           None,
                                           rope_xla=(cb, sb, partner),
                                           attn_starts=se)
                    new_caches.append(cache)
                logits = self._head_logits(x, w_head, final_norm)
                if pick is None:
                    nxt = jnp.argmax(logits[:b], axis=-1).astype(tok.dtype)
                else:
                    keys = jax.vmap(jax.random.fold_in)(key, offs + i)
                    nxt = pick(logits[:b] * cfg.logit_scale,
                               keys).astype(tok.dtype)
                return (nxt, new_caches), nxt

            (last, caches), toks = jax.lax.scan(body, (tok0, caches),
                                                jnp.arange(n_tokens))
            return toks.T, last, caches

        self._run_cache[memo] = run
        return run

    # ------------------------------------------- chunked (interleaved) admission
    #
    # Splitting an admission's mini-prefill into fixed C-token chunks
    # lets the ContinuousBatcher INTERLEAVE admission work with decode
    # chunks: running requests never stall longer than one admission
    # chunk (the measured stall source is the full mini-prefill between
    # decode chunks).  Same math as prefill_ragged(_prefixed), same
    # scatter; only the schedule changes.

    def admission_chunk_step(self, mini, ids_c, pads, ci, p0, kvpre=None):
        """One C-token chunk of a ragged admission mini-prefill.
        mini: the admission caches ([prefix | pad | suffix] layout,
        width p0+s).  ids_c (m, C): columns [ci, ci+C) of the
        left-padded suffix batch.  On the first chunk (ci == 0) with a
        prefix, paste the prefix KV first.  Returns (last-position
        logits of this chunk, updated mini caches)."""
        self._mla_guard("the continuous batcher's admission path")
        model, params = self._prefill_model, self._prefill_params
        if kvpre is not None and ci == 0:
            paste = self._run_cache.get("admit_paste")
            if paste is None:
                @functools.partial(jax.jit, static_argnames=("p0",))
                def paste(mini, kvpre, p0):
                    out = []
                    for (c,), k in zip(mini, kvpre):
                        pre = jnp.broadcast_to(
                            k[..., :p0],
                            (c.shape[0],) + k.shape[1:3] + (p0,))
                        out.append((jax.lax.dynamic_update_slice(
                            c, pre.astype(c.dtype), (0, 0, 0, 0)),))
                    return out

                self._run_cache["admit_paste"] = paste
            mini = paste(mini, kvpre, p0)
        fwd = self._run_cache.get("admit_chunk_fwd")
        if fwd is None:

            @jax.jit
            def fwd(params, ids_c, pads, mini, ci, p0):
                m, c = ids_c.shape
                positions = p0 + jnp.clip(
                    ci + jnp.arange(c)[None] - pads[:, None], 0, None)
                logits, mini = model.apply(
                    {"params": params}, ids_c, positions=positions,
                    kv_caches=mini, cache_index=p0 + ci,
                    attn_start=p0 + pads, attn_prefix=p0,
                    last_logits_only=True)
                return logits[:, -1], mini

            self._run_cache["admit_chunk_fwd"] = fwd
        return fwd(params, jnp.asarray(ids_c), pads, mini,
                   jnp.int32(ci), jnp.int32(p0))

    def admission_finalize(self, mini, pads, s, p0):
        """Quantize/format a finished chunked admission's mini caches
        (valid slots = prefix + each row's real suffix columns) —
        the _kv_finalize counterpart for the ragged admission layout."""
        fin = self._run_cache.get("admit_finalize")
        if fin is None:
            kv_channel = self.kv_dtype is not None
            kv_int4 = self.kv_dtype == "int4"
            qmax = self._kv_qmax
            kv_margin = self.kv_margin

            @functools.partial(jax.jit, static_argnames=("s", "p0"))
            def fin(mini, pads, s, p0):
                eng = []
                for (kvdm,) in mini:
                    if kv_channel:
                        tpos = jnp.arange(kvdm.shape[-1])
                        valid = ((tpos[None] < p0)
                                 | ((tpos[None] >= (p0 + pads)[:, None])
                                    & (tpos[None] < p0 + s)))
                        kvf = kvdm.astype(jnp.float32)
                        mag = jnp.where(valid[:, None, None, :],
                                        jnp.abs(kvf), 0.0)
                        sc = jnp.clip(jnp.max(mag, axis=3, keepdims=True),
                                      1e-8, None) * (kv_margin / qmax)
                        codes = jnp.clip(jnp.round(kvf / sc), -qmax, qmax)
                        if kv_int4:
                            eng.append((dk.pack_kv_int4(
                                codes.astype(jnp.int32)), sc))
                        else:
                            eng.append((codes.astype(jnp.int8), sc))
                    else:
                        eng.append((kvdm,))
                return eng

            self._run_cache["admit_finalize"] = fin
        return fin(mini, pads, s, p0)

    def admit_scatter(self, caches, mini_eng, rows, phys_end, lens, p0):
        """Scatter a finished admission's engine-format mini caches
        into the live caches (the same two-piece contiguous re-pack
        admit_rows uses)."""
        self._ensure_scatter_fns()
        scatter, set_rows, scatter_prefix = self._admit_scatter_fn
        rw = jnp.asarray(np.asarray(rows, np.int32))
        pe, ln = jnp.int32(phys_end), jnp.asarray(lens)
        out = []
        for lay, mn in zip(caches, mini_eng):
            kv = scatter(lay[0], mn[0], rw, pe, ln)
            if p0:
                kv = scatter_prefix(kv, mn[0], rw, pe, ln, p0)
            if len(lay) > 1:
                out.append((kv, set_rows(lay[1], mn[1], rw)))
            else:
                out.append((kv,))
        return out

    def admit_row(self, caches, row: int, prompt, phys_end: int,
                  sampler=(), key=None):
        """Single-request admission — see :meth:`admit_rows`."""
        toks, caches, starts, lens = self.admit_rows(
            caches, [row], [prompt], phys_end, sampler=sampler,
            keys=None if key is None else [key])
        return toks[0], caches, starts[0], lens[0]

    def rebase_caches(self, caches, delta: int):
        """Shift every row's cache columns left by ``delta`` (the
        common dead prefix below all rows' attention starts): column
        t takes column t + delta, the tail zero-fills.  Keeps
        continuous batching inside a BOUNDED cache — when the shared
        append slot nears capacity the scheduler rebases instead of
        failing.  One jitted roll per layer, shapes unchanged (no
        retrace).  Codes/kv shift; per-channel scales are T-independent
        and per-token scale planes shift alongside."""
        if delta <= 0:
            return caches
        if self._rebase_fn is None:
            @functools.partial(jax.jit, static_argnames=())
            def shift(arr, d):
                t = arr.shape[-1]
                src = jnp.clip(jnp.arange(t) + d, 0, t - 1)
                out = jnp.take(arr, src, axis=-1)
                keep = (jnp.arange(t) < t - d)
                return jnp.where(keep.reshape((1,) * (arr.ndim - 1) + (-1,)),
                                 out, jnp.zeros_like(out))

            self._rebase_fn = shift
        shift = self._rebase_fn
        d = jnp.int32(delta)
        out = []
        for lay in caches:
            kv = shift(lay[0], d)
            if len(lay) > 1:
                sc = lay[1]
                # per-token scale planes carry a T axis; channel scales
                # ((..., 1) trailing) do not
                sc = shift(sc, d) if sc.shape[-1] == lay[0].shape[-1] else sc
                out.append((kv, sc))
            else:
                out.append((kv,))
        return out

    def _ensure_scatter_fns(self):
        if self._admit_scatter_fn is None:
            @jax.jit
            def scatter(big, mini, rows_, p, lens_):
                # big (B, C, *, T) / mini (m, C, *, S): batch row
                # rows_[j] takes mini row j, column t <- t - p + S
                # inside [p - lens_[j], p)
                bsz, t_big = big.shape[0], big.shape[-1]
                s_mini = mini.shape[-1]
                hit = rows_[None, :] == jnp.arange(bsz)[:, None]  # (B, m)
                sel = jnp.argmax(hit, axis=1)                     # (B,)
                has = jnp.any(hit, axis=1)                        # (B,)
                minib = mini[sel]                                 # (B,C,*,S)
                tpos = jnp.arange(t_big)
                src = jnp.clip(tpos - p + s_mini, 0, s_mini - 1)
                shifted = jnp.take(minib, src, axis=-1)
                maskc = ((tpos[None] >= p - lens_[sel][:, None])
                         & (tpos[None] < p))                      # (B, T)
                full = (has[:, None]
                        & maskc).reshape((bsz,) + (1,) * (big.ndim - 2)
                                         + (t_big,))
                return jnp.where(full, shifted, big)

            @jax.jit
            def set_rows(big, mini, rows_):
                bsz = big.shape[0]
                hit = rows_[None, :] == jnp.arange(bsz)[:, None]
                sel = jnp.argmax(hit, axis=1)
                has = jnp.any(hit, axis=1)
                return jnp.where(
                    has.reshape((-1,) + (1,) * (big.ndim - 1)),
                    mini[sel], big)

            @functools.partial(jax.jit, static_argnames=("p0",))
            def scatter_prefix(big, mini, rows_, p, lens_, p0):
                # the shared-prefix block: batch row rows_[j] takes
                # mini columns [0, p0) into [p - lens_[j] - p0,
                # p - lens_[j]) — right-adjacent to the suffix block
                # the plain scatter wrote, so the admitted window is
                # one contiguous [prefix | suffix] run ending at p
                bsz, t_big = big.shape[0], big.shape[-1]
                hit = rows_[None, :] == jnp.arange(bsz)[:, None]
                sel = jnp.argmax(hit, axis=1)
                has = jnp.any(hit, axis=1)
                minib = mini[sel]
                tpos = jnp.arange(t_big)
                d0 = (p - lens_[sel])[:, None]            # (B, 1) dest end
                src = jnp.clip(tpos[None] - d0 + p0, 0, p0 - 1)
                shifted = jnp.take_along_axis(
                    minib, src[:, None, None, :].astype(jnp.int32), axis=-1)
                maskc = ((tpos[None] >= d0 - p0) & (tpos[None] < d0)
                         & has[:, None])
                full = maskc.reshape((bsz,) + (1,) * (big.ndim - 2)
                                     + (t_big,))
                return jnp.where(full, shifted, big)

            self._admit_scatter_fn = (scatter, set_rows, scatter_prefix)

    def admit_rows(self, caches, rows, prompts, phys_end: int,
                   sampler=(), keys=None, pad_s: int = 0, prefix=None):
        """Write new requests' prefilled K/V into batch ``rows`` of
        live engine caches, each right-aligned so its prompt ENDS at
        the shared physical append position ``phys_end`` (the
        continuous-batching admission primitive; physical slots before
        a row's start belong to the evicted request and are masked
        out).  All admissions share ONE ragged mini-prefill and ONE
        masked scatter per layer — per-request device round-trips were
        the measured admission cost on the tunnel.

        Requires phys_end >= max prompt length.  Returns (first
        generated tokens [one per row], new caches, row starts, prompt
        lengths).

        Shape stability on the remote-compile tunnel: every distinct
        (m, padded-prompt-width) retraces the mini-prefill and scatter
        — callers admitting repeatedly (the ContinuousBatcher) should
        pad ``rows`` to a FIXED count with sentinel row -1 (dummy
        entries write nowhere) and pass a fixed ``pad_s`` width."""
        prompts = [np.asarray(pr).reshape(-1) for pr in prompts]
        lens = np.asarray([len(pr) for pr in prompts], np.int32)
        m = len(prompts)
        assert m == len(rows) >= 1
        real = [j for j, r in enumerate(rows) if r >= 0]
        assert real, "all rows are sentinels"
        p0 = prefix[0] if prefix is not None else 0
        assert phys_end >= int(lens[real].max()) + p0, (phys_end, p0, lens)
        s = max(_round_up(max(int(lens.max()), 1), 128),
                _round_up(pad_s, 128) if pad_s else 0)
        ids = np.zeros((m, s), np.int32)
        for j, pr in enumerate(prompts):
            ids[j, s - len(pr):] = pr
        if prefix is not None:
            # prompts are SUFFIX rows on a shared prefix: mini layout
            # [prefix | pad | suffix]; the scatter below re-packs each
            # admitted row contiguously as [prefix | suffix] ending at
            # phys_end
            tok0, mini = self.prefill_ragged_prefixed(prefix, ids, lens)
        else:
            tok0, mini, _ = self.prefill_ragged(ids, lens, max_len=s)
        if sampler:
            # first tokens drawn with each request's OWN key, folding
            # the same sentinel index as generate_ragged's pick0 — an
            # admitted request's sampled stream equals its single-run
            # stream
            from qdm_tpu.api.causal_lm import fold_key

            tok0 = self._pick0(sampler)(
                self._last_prefill_logits,
                fold_key(jnp.asarray(np.stack(keys)), 2 ** 32 - 1))
        self._last_prefill_logits = None
        self._ensure_scatter_fns()
        scatter, set_rows, scatter_prefix = self._admit_scatter_fn
        rw = jnp.asarray(np.asarray(rows, np.int32))
        pe, ln = jnp.int32(phys_end), jnp.asarray(lens)
        out = []
        for lay, mn in zip(caches, mini):
            kv = scatter(lay[0], mn[0], rw, pe, ln)
            if prefix is not None:
                kv = scatter_prefix(kv, mn[0], rw, pe, ln, p0)
            if len(lay) > 1:      # channel-static int8/int4 KV scales
                out.append((kv, set_rows(lay[1], mn[1], rw)))
            else:
                out.append((kv,))
        toks = [int(t) for t in np.asarray(tok0).reshape(-1)]
        return toks, out, [phys_end - int(n) - p0 for n in lens], \
            [int(n) + p0 for n in lens]

    def generate_ragged(self, prompts, max_new_tokens: int = 32,
                        temperature: float = 0.0, top_k: int = 0,
                        top_p: float = 0.0, seed: int = 0,
                        per_row_seeds=None,
                        eos_token_id: Optional[int] = None,
                        stop_early: bool = False, prefix=None):
        """Serve a RAGGED batch — prompts of different lengths in one
        engine batch (the production serving shape; the reference and
        HF generate handle this with left-padding + attention masks).
        Left-pads to the longest prompt, runs ONE batched prefill +
        decode, and returns a list of 1-D arrays (prompt + generated
        tokens, generated count == max_new_tokens for every row).
        GREEDY exactness contract: each row's tokens equal a
        single-prompt ``generate`` of that row (tested; holds for the
        bf16 AND channel-static int8 KV caches — the channel scales
        are per-row and pad-masked, so they equal the single-prompt
        scales exactly).  Sampled ragged decoding is
        seed-deterministic but draws batch-shaped noise, so rows
        differ from single-prompt sampled runs.  Shards dp over a
        single-host mesh's 'data' axis (caches/lens/starts follow the
        batch sharding; tp megakernels don't thread per-row start
        masks yet, so tp>1 raises); int8 KV needs
        kv_scale_mode='channel' (quantized weights fine; the int8 KV
        schemes keep per-slot state the ragged masks don't thread
        yet)."""
        self._mla_guard("generate_ragged")
        if temperature <= 0.0 and (top_k or top_p):
            raise ValueError("top_k/top_p need temperature > 0")
        prompts = [np.asarray(p).reshape(-1) for p in prompts]
        lens = np.asarray([len(p) for p in prompts], np.int32)
        assert (lens > 0).all()
        b, s = len(prompts), int(lens.max())
        sampler = ((float(temperature), int(top_k), float(top_p))
                   if temperature > 0.0 else ())
        if prefix is not None:
            # shared-prefix ragged batch: prompts are SUFFIX rows —
            # admit them into empty serving caches through the same
            # two-piece contiguous scatter the ContinuousBatcher uses
            # (each row's window is [prefix | suffix] ending at sp0)
            if sampler:
                raise NotImplementedError(
                    "sampled ragged decoding with a prefix: serve "
                    "through ContinuousBatcher.run(prefix=), which "
                    "threads per-request keys")
            p0 = prefix[0]
            sp0 = _round_up(p0 + s, 128)
            max_len = sp0 + max_new_tokens
            caches = self.init_cache(b, max_len)
            toks0, caches, starts, lens2 = self.admit_rows(
                caches, list(range(b)), prompts, sp0, prefix=prefix)
            tok0 = jnp.asarray(toks0, jnp.int32)
            if stop_early and eos_token_id is None:
                raise ValueError("stop_early needs eos_token_id")
            run = self._make_run_ragged(
                max_new_tokens - 1, (),
                eos=int(eos_token_id) if stop_early else None)
            toks = run(self.layers, self.embed, self.final_norm,
                       self._head, tok0, caches, jnp.int32(sp0),
                       jnp.asarray(lens2, jnp.int32),
                       jnp.asarray(starts, jnp.int32), None)
            gen = np.concatenate([np.asarray(tok0)[:, None],
                                  np.asarray(toks)],
                                 axis=1)[:, :max_new_tokens]
            if eos_token_id is not None:
                from qdm_tpu.api.causal_lm import mask_after_eos

                gen = mask_after_eos(gen, eos_token_id)
            return [np.concatenate([prompts[r], gen[r]])
                    for r in range(b)]
        ids = np.zeros((b, s), np.int32)
        for r, p in enumerate(prompts):
            ids[r, s - len(p):] = p
        max_len = s + max_new_tokens
        tok0, caches, starts = self.prefill_ragged(ids, lens, max_len)
        key = None
        if sampler:
            if per_row_seeds is not None:
                # PER-REQUEST reproducibility: each row's stream
                # depends only on its own seed, so a request's sampled
                # completion is identical whatever else shares the
                # batch (tested: row == the same prompt served alone
                # with the same seed)
                seeds = jnp.asarray(per_row_seeds, jnp.uint32)
                assert seeds.shape == (b,), (seeds.shape, b)
                key = jax.vmap(jax.random.PRNGKey)(seeds)      # (B, 2)
            else:
                key = jax.random.PRNGKey(seed)
            from qdm_tpu.api.causal_lm import fold_key

            tok0 = self._pick0(sampler)(
                self._last_prefill_logits,
                fold_key(key, 2**32 - 1)).astype(tok0.dtype)
        self._last_prefill_logits = None
        if stop_early and eos_token_id is None:
            raise ValueError("stop_early needs eos_token_id")
        run = self._make_run_ragged(
            max_new_tokens - 1, sampler,
            eos=int(eos_token_id) if stop_early else None)
        lens_d, starts_d = jnp.asarray(lens), jnp.asarray(starts, jnp.int32)
        if self.spmd:  # dp: per-row vectors follow the batch sharding
            lens_d = self._put(lens_d, P("data"))
            starts_d = self._put(starts_d, P("data"))
        toks = run(self.layers, self.embed, self.final_norm, self._head,
                   tok0, caches, jnp.int32(s), lens_d, starts_d, key)
        gen = np.concatenate([np.asarray(tok0)[:, None], np.asarray(toks)],
                             axis=1)[:, :max_new_tokens]
        if eos_token_id is not None:
            from qdm_tpu.api.causal_lm import mask_after_eos

            gen = mask_after_eos(gen, eos_token_id)
        return [np.concatenate([prompts[r], gen[r]]) for r in range(b)]

    def score(self, input_ids) -> jnp.ndarray:
        """Teacher-forced per-position logits (B, S, V) through the
        decode megakernels — the engine counterpart of the module
        path's ``logits``, so KL/perplexity evaluation can measure the
        engine's EXACT serving numerics (static act scales, int8/int4
        weight codes, kernel arithmetic).  Single-device only."""
        self._mla_guard("score")
        assert not self.spmd, "score() is a single-device eval path"
        ids = jnp.asarray(input_ids)
        b, s = ids.shape
        fn = self._score_cache.get(s)
        if fn is None:
            cfg = self.cfg
            freqs, is_rope, sign, base_idx, _ = _rope_consts(cfg)
            if self._pos_scale != 1.0:
                # linear rope scaling on GLOBAL layers (folded into freqs
                # exactly as the module's rope() folds it)
                freqs = freqs * jnp.float32(self._pos_scale)

            @jax.jit
            def run(layers, embed, final_norm, w_head, ids, caches):
                bp = max(_round_up(ids.shape[0], 8), 8)
                bq = ids.shape[0]

                def body(caches, xs):
                    i, tok = xs
                    pos = i
                    angles = pos.astype(jnp.float32) * freqs
                    cosv = jnp.where(is_rope, jnp.cos(angles)[base_idx],
                                     1.0)
                    sinv = jnp.where(is_rope,
                                     sign * jnp.sin(angles)[base_idx], 0.0)
                    trig_l = self._local_trig(pos, is_rope, sign,
                                              base_idx)
                    x = jnp.zeros((bp,), tok.dtype).at[:bq].set(tok)
                    x = embed[x]
                    if self._pos_tab is not None:
                        x = x + self._pos_tab[pos + self._pos_off]
                    new_caches = []
                    for l, w in enumerate(layers):
                        cv, sv = self._pick_trig(l, cosv, sinv, trig_l)
                        x, cache = self._layer(x, caches[l], w, pos, cv,
                                               sv)
                        new_caches.append(cache)
                    logits = self._head_logits(x, w_head, final_norm)
                    return new_caches, logits[:bq] * cfg.logit_scale

                caches, logits = jax.lax.scan(
                    body, caches, (jnp.arange(ids.shape[1]),
                                   ids.T.astype(jnp.int32)))
                return logits.transpose(1, 0, 2)        # (B, S, V)

            self._score_cache[s] = fn = run
        caches = self.init_cache(b, s)
        if self.kv_scale_mode == "channel" and self.kv_dtype is not None:
            # channel-static scales come from a prompt prefill in
            # serving; for teacher-forced scoring, derive them from
            # the scored sequence itself (same semantics: the scales
            # an engine serving this prompt would run with)
            _, pref = self.prefill(ids, s)
            caches = [(jnp.zeros_like(kv), sc) for kv, sc in pref]
        return fn(self.layers, self.embed, self.final_norm, self._head,
                  ids, caches)
