"""AWQ: activation-aware weight quantization (scale grid search + clip
search) as jitted pytree transforms.

Faithful to the reference math (quantize/quantizer.py):

* duo-scaling grid  s = x_mean^r / (w_mean^(1-r) + 1e-4), r = i/20,
  normalized by sqrt(s.max * s.min), loss = MSE of the scaled+quantized
  group output vs the fp output  (_search_best_scale/_compute_best_scale,
  quantizer.py:605-751);
* per-(out-channel, group) clip search over a 20-point max-val shrink
  grid to 0.5, on <=512 sampled tokens, skipping q/k layers
  (_search_best_clip/_compute_best_clip, quantizer.py:785-863).

Loss target: MLP (gate, up) groups use the reference's ENCLOSING-module
loss (module2inspect, quantizer.py:678-751) — MSE over
down(act(gate(x)) * up(x)) with gate/up scaled+quantized in the trial
and down fp (`search_best_scale_glu`, wired via ScalingGroup.block;
the r3 A/B had priced the old group-linear-outputs loss at +2.7% MSE,
tools/awq_ab.json).  MoE (w1, w3)-of-every-expert groups likewise run
the enclosing sparse block (`search_best_scale_moe`): routing is
per-token, so the token-sampled feats evaluate the reference's
block_sparse_moe module2inspect exactly — fp router + fp w2, every
expert's w1/w3 scaled+quantized per trial.

Attention qkv groups ALSO run the reference's enclosing-module loss
(`search_best_scale_attn`, r5): sequence-shaped calib blocks captured
via QuantPlan.capture_seq, each trial scoring the FULL attention
forward (rope, causal softmax, GQA, fp o_proj) — closing the last
loss-target deviation (tools/awq_attn_ab.json: prod_over_B = 1.0 vs a
hand-written reference-semantics search; the old group-linear loss was
0.8-6% worse final MSE per layer).  Architectures whose attention the
search does not model (qk-norm, partial rotary, alibi/learned
positions, soft-caps, dual rope, MLA) keep the group-linear loss —
shims.attn_geom_from_config gates this.  The 20-point grid runs as a
single `lax.map` scan instead of a Python loop with state_dict
save/restore.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from qdm_tpu.quant import pseudo, rtn
from qdm_tpu.quant.apply import _set_at
from qdm_tpu.quant.smooth import ScalingGroup, apply_smooth_scales, _get_at

AVOID_CLIPPING = ("q_", "k_", "query", "key", "Wqkv", "to_q", "to_k")


def _group_quantize_rows(w, n_bits, group_size, zero_point):
    """pseudo_quantize_tensor on the last axis of any-rank w."""
    shape = w.shape
    w2 = w.reshape(-1, shape[-1])
    wq, _, _ = pseudo.pseudo_quantize_tensor(
        w2, n_bits=n_bits, group_size=group_size, zero_point=zero_point)
    return wq.reshape(shape)


@functools.partial(jax.jit, static_argnames=("n_bits", "group_size", "zero_point",
                                             "n_grid", "duo_scaling"))
def search_best_scale(x, w_cat_oi, n_bits: int = 4, group_size: int = 128,
                      zero_point: bool = True, n_grid: int = 20,
                      duo_scaling: bool = True):
    """Grid-search the per-in-channel AWQ scale.

    x: (S, C) sampled inputs; w_cat_oi: (N_total, C) concatenated layer
    weights (out, in).  Returns (best_scales (C,), losses (n_grid,))."""
    C = x.shape[-1]
    xf = x.astype(jnp.float32)
    wf = w_cat_oi.astype(jnp.float32)

    # w_mean: per-group-normalized weight magnitude, mean per in-channel
    # (quantizer.py:627-638)
    gs = group_size if group_size > 0 else C
    wg = jnp.abs(wf).reshape(-1, gs)
    wg = wg / (jnp.max(wg, axis=1, keepdims=True) + 1e-6)
    w_mean = wg.reshape(wf.shape).mean(axis=0)

    # x_mean: per-channel mean abs input (quantizer.py:640-660)
    x_mean = jnp.abs(xf).mean(axis=0)

    fp_out = xf @ wf.T                      # (S, N_total)

    def loss_for(ratio):
        if duo_scaling:
            s = jnp.clip(x_mean ** ratio / (w_mean ** (1 - ratio) + 1e-4), 1e-4, None)
        else:
            s = jnp.clip(x_mean ** ratio, 1e-4, None)
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))
        s = jnp.where(jnp.isfinite(s), s, 1.0)
        wq = _group_quantize_rows(wf * s[None, :], n_bits, gs, zero_point) / s[None, :]
        out = xf @ wq.T
        return jnp.mean((out - fp_out) ** 2), s

    ratios = jnp.arange(n_grid, dtype=jnp.float32) / n_grid
    losses, scales = jax.lax.map(loss_for, ratios)
    best = jnp.argmin(losses)
    return scales[best], losses


@functools.partial(jax.jit, static_argnames=("act", "n_bits", "group_size",
                                             "zero_point", "n_grid",
                                             "duo_scaling"))
def search_best_scale_glu(x, w_gate_oi, w_up_oi, w_down_oi, act: str = "silu",
                          n_bits: int = 4, group_size: int = 128,
                          zero_point: bool = True, n_grid: int = 20,
                          duo_scaling: bool = True):
    """Enclosing-MLP AWQ scale search (the reference's module2inspect
    loss for gate/up groups, quantizer.py:678-751): same duo-scale
    grid as `search_best_scale`, loss = MSE of
    down(act(gate(x)) * up(x)) with gate/up scaled+quantized per trial
    and down left fp (the reference only swaps the group's own layers
    during the search).

    x (S, C) sampled inputs; w_gate_oi/w_up_oi (I, C); w_down_oi (H, I).
    Returns (best_scales (C,), losses (n_grid,))."""
    from qdm_tpu.models.llama import _mlp_act

    xf = x.astype(jnp.float32)
    wg = w_gate_oi.astype(jnp.float32)
    wu = w_up_oi.astype(jnp.float32)
    wd = w_down_oi.astype(jnp.float32)
    C = xf.shape[-1]
    gs = group_size if group_size > 0 else C

    w_cat = jnp.concatenate([wg, wu], axis=0)
    wgrp = jnp.abs(w_cat).reshape(-1, gs)
    wgrp = wgrp / (jnp.max(wgrp, axis=1, keepdims=True) + 1e-6)
    w_mean = wgrp.reshape(w_cat.shape).mean(axis=0)
    x_mean = jnp.abs(xf).mean(axis=0)

    def block(wg_, wu_):
        return (_mlp_act(act, xf @ wg_.T) * (xf @ wu_.T)) @ wd.T

    fp_out = block(wg, wu)

    def loss_for(ratio):
        if duo_scaling:
            s = jnp.clip(x_mean ** ratio / (w_mean ** (1 - ratio) + 1e-4),
                         1e-4, None)
        else:
            s = jnp.clip(x_mean ** ratio, 1e-4, None)
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))
        s = jnp.where(jnp.isfinite(s), s, 1.0)
        wg_q = _group_quantize_rows(wg * s[None, :], n_bits, gs,
                                    zero_point) / s[None, :]
        wu_q = _group_quantize_rows(wu * s[None, :], n_bits, gs,
                                    zero_point) / s[None, :]
        return jnp.mean((block(wg_q, wu_q) - fp_out) ** 2), s

    ratios = jnp.arange(n_grid, dtype=jnp.float32) / n_grid
    losses, scales = jax.lax.map(loss_for, ratios)
    best = jnp.argmin(losses)
    return scales[best], losses


@functools.partial(jax.jit, static_argnames=("h", "hkv", "d", "rope_theta",
                                             "attn_scale", "n_bits",
                                             "group_size", "zero_point",
                                             "n_grid", "duo_scaling"))
def search_best_scale_attn(x_seq, wq_oi, wk_oi, wv_oi, wo_oi,
                           h: int, hkv: int, d: int,
                           rope_theta: float, attn_scale: float,
                           bq=None, bk=None, bv=None, bo=None,
                           n_bits: int = 4, group_size: int = 128,
                           zero_point: bool = True, n_grid: int = 20,
                           duo_scaling: bool = True):
    """Whole-attention-module AWQ scale search — the reference's
    module2inspect loss for qkv groups (quantizer.py:605-676,678-751):
    each trial scales+quantizes q/k/v, runs the FULL attention forward
    (rope, causal softmax, GQA grouping, fp o_proj — the reference
    leaves non-group layers fp during the search) on SEQUENCE-shaped
    calib blocks, and scores MSE of the attention output.  Token
    -sampled feats cannot attend, hence the dedicated capture
    (QuantPlan.capture_seq -> 'calib_s').

    x_seq (NB, S, C); wq/wk/wv_oi (N, C) out-in; wo_oi (C, h*d) out-in.
    Biases optional (qwen2-class), fp and constant across trials like
    the reference's.  Returns (best_scales (C,), losses (n_grid,))."""
    from qdm_tpu.models.llama import rope

    nb, S, C = x_seq.shape
    xf = x_seq.astype(jnp.float32)
    wq = wq_oi.astype(jnp.float32)
    wk = wk_oi.astype(jnp.float32)
    wv = wv_oi.astype(jnp.float32)
    wo = wo_oi.astype(jnp.float32)
    gs = group_size if group_size > 0 else C

    w_cat = jnp.concatenate([wq, wk, wv], axis=0)
    wgrp = jnp.abs(w_cat).reshape(-1, gs)
    wgrp = wgrp / (jnp.max(wgrp, axis=1, keepdims=True) + 1e-6)
    w_mean = wgrp.reshape(w_cat.shape).mean(axis=0)
    x_mean = jnp.abs(xf).mean(axis=(0, 1))

    pos = jnp.broadcast_to(jnp.arange(S)[None], (nb, S))
    mask = jnp.tril(jnp.ones((S, S), bool))
    g = h // hkv

    def module_fwd(wq_, wk_, wv_):
        q = jnp.einsum("bsc,nc->bsn", xf, wq_)
        k = jnp.einsum("bsc,nc->bsn", xf, wk_)
        v = jnp.einsum("bsc,nc->bsn", xf, wv_)
        if bq is not None:
            q, k, v = q + bq, k + bk, v + bv
        q = rope(q.reshape(nb, S, h, d), pos, rope_theta)
        k = rope(k.reshape(nb, S, hkv, d), pos, rope_theta)
        v = v.reshape(nb, S, hkv, d)
        qg = q.reshape(nb, S, hkv, g, d)
        logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k) * attn_scale
        logits = jnp.where(mask[None, None, None], logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v).reshape(nb, S,
                                                                h * d)
        out = jnp.einsum("bsn,cn->bsc", out, wo)
        return out + bo if bo is not None else out

    fp_out = module_fwd(wq, wk, wv)

    def loss_for(ratio):
        if duo_scaling:
            s = jnp.clip(x_mean ** ratio / (w_mean ** (1 - ratio) + 1e-4),
                         1e-4, None)
        else:
            s = jnp.clip(x_mean ** ratio, 1e-4, None)
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))
        s = jnp.where(jnp.isfinite(s), s, 1.0)

        def q_(w):
            return _group_quantize_rows(w * s[None, :], n_bits, gs,
                                        zero_point) / s[None, :]

        out = module_fwd(q_(wq), q_(wk), q_(wv))
        return jnp.mean((out - fp_out) ** 2), s

    ratios = jnp.arange(n_grid, dtype=jnp.float32) / n_grid
    losses, scales = jax.lax.map(loss_for, ratios)
    best = jnp.argmin(losses)
    return scales[best], losses


@functools.partial(jax.jit, static_argnames=("act", "top_k", "renormalize",
                                             "n_bits", "group_size",
                                             "zero_point", "n_grid",
                                             "duo_scaling"))
def search_best_scale_moe(x, w1, w3, w2, w_router, act: str = "silu",
                          top_k: int = 2, renormalize: bool = True,
                          n_bits: int = 4, group_size: int = 128,
                          zero_point: bool = True, n_grid: int = 20,
                          duo_scaling: bool = True):
    """Enclosing-MoE-block AWQ scale search (the reference captures the
    whole ``block_sparse_moe`` input for this group,
    quantizer.py:1106-1111, and evaluates module2inspect = the sparse
    block): routing is PER-TOKEN, so the token-sampled calib feats are
    enough to evaluate the reference loss exactly — router and w2 stay
    fp during trials, every expert's w1/w3 is scaled+quantized.

    x (S, C); w1/w3 (E, C, I) stacked expert kernels; w2 (E, I, C);
    w_router (C, E).  Routing weights depend only on fp x/router, so
    they are computed once outside the ratio grid.
    Returns (best_scales (C,), losses (n_grid,))."""
    from qdm_tpu.models.llama import _mlp_act

    xf = x.astype(jnp.float32)
    W1 = w1.astype(jnp.float32)
    W3 = w3.astype(jnp.float32)
    W2 = w2.astype(jnp.float32)
    E, C, I = W1.shape
    gs = group_size if group_size > 0 else C

    # duo-scale statistics over the group's concatenated weights
    # (all experts' w1/w3), exactly like the dense search
    w_cat = jnp.concatenate([W1.transpose(0, 2, 1).reshape(-1, C),
                             W3.transpose(0, 2, 1).reshape(-1, C)], axis=0)
    wgrp = jnp.abs(w_cat).reshape(-1, gs)
    wgrp = wgrp / (jnp.max(wgrp, axis=1, keepdims=True) + 1e-6)
    w_mean = wgrp.reshape(w_cat.shape).mean(axis=0)
    x_mean = jnp.abs(xf).mean(axis=0)

    # fp routing (models/moe.py dense-exact combine): constant across
    # trials — the router is not in the group's layers
    logits = xf @ w_router.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top_w, top_i = jax.lax.top_k(probs, top_k)
    if renormalize:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    onehot = jnp.sum(jax.nn.one_hot(top_i, E, dtype=jnp.float32)
                     * top_w[..., None], axis=1)              # (S, E)

    def block(W1_, W3_):
        h = _mlp_act(act, jnp.einsum("sc,eci->esi", xf, W1_)) \
            * jnp.einsum("sc,eci->esi", xf, W3_)
        out = jnp.einsum("esi,eic->esc", h, W2)               # (E, S, C)
        return jnp.einsum("esc,se->sc", out, onehot)

    fp_out = block(W1, W3)

    def qexp(W, s):
        # (E, C, I) kernels quantized on rows of the (out, in) view
        flat = (W * s[None, :, None]).transpose(0, 2, 1).reshape(-1, C)
        q = _group_quantize_rows(flat, n_bits, gs, zero_point)
        return (q.reshape(E, I, C).transpose(0, 2, 1)
                / s[None, :, None])

    def loss_for(ratio):
        if duo_scaling:
            s = jnp.clip(x_mean ** ratio / (w_mean ** (1 - ratio) + 1e-4),
                         1e-4, None)
        else:
            s = jnp.clip(x_mean ** ratio, 1e-4, None)
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))
        s = jnp.where(jnp.isfinite(s), s, 1.0)
        return jnp.mean((block(qexp(W1, s), qexp(W3, s)) - fp_out) ** 2), s

    ratios = jnp.arange(n_grid, dtype=jnp.float32) / n_grid
    losses, scales = jax.lax.map(loss_for, ratios)
    best = jnp.argmin(losses)
    return scales[best], losses


@functools.partial(jax.jit, static_argnames=("n_bits", "group_size", "zero_point",
                                             "n_grid", "max_shrink", "n_sample_token"))
def compute_best_clip(w_oi, x, n_bits: int = 4, group_size: int = 128,
                      zero_point: bool = True, n_grid: int = 20,
                      max_shrink: float = 0.5, n_sample_token: int = 512):
    """Per-(out-channel, group) clip threshold search
    (quantizer.py:804-863).  w_oi (N, C); x (S, C).
    Returns best_max_val (N, n_groups)."""
    N, C = w_oi.shape
    gs = group_size if group_size > 0 else C
    n_g = C // gs
    step = max(1, x.shape[0] // n_sample_token)
    xs = x[::step].astype(jnp.float32)                 # (S', C)
    xs = xs.reshape(1, xs.shape[0], n_g, gs)           # (1, S', n_g, gs)
    w = w_oi.astype(jnp.float32).reshape(N, 1, n_g, gs)

    org_max = jnp.max(jnp.abs(w), axis=-1, keepdims=True)      # (N,1,n_g,1)
    org_out = jnp.sum(xs * w, axis=-1)                          # (N, S', n_g)

    def body(carry, i_s):
        best_max, min_err = carry
        max_val = org_max * (1 - i_s / n_grid)
        cur_w = jnp.clip(w, -max_val, max_val)
        qw = _group_quantize_rows(cur_w, n_bits, gs, zero_point)
        cur_out = jnp.sum(xs * qw, axis=-1)
        err = jnp.mean((cur_out - org_out) ** 2, axis=1).reshape(min_err.shape)
        better = err < min_err
        return (jnp.where(better, max_val, best_max),
                jnp.where(better, err, min_err)), None

    steps = jnp.arange(int(max_shrink * n_grid), dtype=jnp.float32)
    (best_max, _), _ = jax.lax.scan(body, (org_max, jnp.full_like(org_max, 1e9)), steps)
    return best_max.reshape(N, n_g)


def apply_clip_to_kernel(kernel, max_val):
    """kernel (C, N); max_val (N, n_groups) -> clamped kernel
    (apply_clip, scale.py:24-34)."""
    C, N = kernel.shape
    n_g = max_val.shape[1]
    gs = C // n_g
    w = kernel.astype(jnp.float32).T.reshape(N, n_g, gs)
    mv = max_val[:, :, None]
    w = jnp.clip(w, -mv, mv)
    return w.reshape(N, C).T.astype(kernel.dtype)


def awq_search_and_apply(params: dict, groups: Sequence[ScalingGroup],
                         input_feats: Dict[str, jnp.ndarray], cfg,
                         do_clip: bool = True) -> dict:
    """Full AWQ pass over scaling groups: scale search -> migrate ->
    clip search -> clamp.  Weight quantization itself happens afterwards
    in the shared fake/pack transform (pipeline.quantize)."""
    out = params
    for g in groups:
        key = "/".join(g.layer_paths[0])
        if key not in input_feats:
            continue
        x = input_feats[key]
        kernels = [_get_at(out, lp)["kernel"] for lp in g.layer_paths]
        w_cat = jnp.concatenate([k.T for k in kernels], axis=0)   # (N_tot, C)
        gs = rtn.resolve_group_size(w_cat.shape[-1], cfg.q_group_size) or w_cat.shape[-1]
        if (g.block is not None and g.block[0].startswith("glu:")
                and len(g.layer_paths) == 2):
            # reference enclosing-MLP loss (module2inspect): gate/up
            # trials evaluated through down(act(gate)*up), down fp
            w_down = _get_at(out, g.block[1])["kernel"]
            s, _ = search_best_scale_glu(
                x, kernels[0].T, kernels[1].T, w_down.T,
                act=g.block[0].split(":", 1)[1], n_bits=cfg.w_bit,
                group_size=gs, zero_point=cfg.zero_point)
        elif g.block is not None and g.block[0].startswith("moe:"):
            # reference enclosing-MoE loss: the block spec is
            # "moe:<act>:<top_k>:<renorm01>", paths alternate
            # (e0/w1, e0/w3, e1/w1, ...); router + every w2 stay fp
            _, act, k, rn = g.block[0].split(":")
            moe = _get_at(out, g.block[1])
            gk, uk = g.layer_paths[0][-1], g.layer_paths[1][-1]
            dk_name = {"w1": "w2", "gate_proj": "down_proj"}[gk]
            import re as _re

            # deepseek groups append shared_experts gate/up AFTER the
            # alternating experts_N pairs (they share the normed input
            # and must migrate with the group); only the experts_N
            # entries stack into the routed-MoE loss.  The shared
            # expert's own quantization sensitivity to the trial scale
            # is not measured — a documented approximation (its width
            # differs from the routed experts', so it cannot join the
            # stacked loss; its weights still migrate and clip).
            enames = [p[-2] for p in g.layer_paths[::2]
                      if _re.fullmatch(r"experts_\d+", p[-2])]
            # kernels are (in, out): w1/w3 (C, I), w2 (I, C) — exactly
            # the stacked layouts the search takes
            W1 = jnp.stack([moe[e][gk]["kernel"] for e in enames])
            W3 = jnp.stack([moe[e][uk]["kernel"] for e in enames])
            W2 = jnp.stack([moe[e][dk_name]["kernel"] for e in enames])
            s, _ = search_best_scale_moe(
                x, W1, W3, W2, moe["gate"]["kernel"],
                act=act, top_k=int(k), renormalize=bool(int(rn)),
                n_bits=cfg.w_bit, group_size=gs,
                zero_point=cfg.zero_point)
        elif (g.block is not None and g.block[0].startswith("attn:")
                and len(g.layer_paths) == 3
                and (key + "::seq") in input_feats):
            # reference enclosing-ATTENTION loss (module2inspect over
            # the whole self_attn module on sequence-shaped calib
            # blocks, quantizer.py:605-676): block spec
            # "attn:<h>:<hkv>:<d>:<rope_theta>:<attn_scale>", path =
            # the self_attn subtree (for the fp o_proj + biases)
            _, hh, hkvv, dd, theta, scl = g.block[0].split(":")
            at = _get_at(out, g.block[1])
            bqs = [_get_at(out, lp).get("bias") for lp in g.layer_paths]
            s, _ = search_best_scale_attn(
                input_feats[key + "::seq"],
                kernels[0].T, kernels[1].T, kernels[2].T,
                at["o_proj"]["kernel"].T,
                h=int(hh), hkv=int(hkvv), d=int(dd),
                rope_theta=float(theta), attn_scale=float(scl),
                bq=bqs[0], bk=bqs[1], bv=bqs[2],
                bo=at["o_proj"].get("bias"),
                n_bits=cfg.w_bit, group_size=gs,
                zero_point=cfg.zero_point)
        else:
            s, _ = search_best_scale(x, w_cat, n_bits=cfg.w_bit, group_size=gs,
                                     zero_point=cfg.zero_point)
        out = apply_smooth_scales(out, g, s)
        if do_clip:
            x_scaled = x / s[None, :]   # scale.py:74-79
            for lp in g.layer_paths:
                name = lp[-1]
                if any(a in name for a in AVOID_CLIPPING):
                    continue
                kernel = _get_at(out, lp)["kernel"]
                mv = compute_best_clip(kernel.T, x_scaled, n_bits=cfg.w_bit,
                                       group_size=gs, zero_point=cfg.zero_point)
                out = _set_at(out, lp + ("kernel",),
                              apply_clip_to_kernel(kernel, mv))
    return out
