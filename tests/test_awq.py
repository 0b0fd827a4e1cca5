"""AWQ engine unit tests: determinism, formula checks, clip behavior
(SURVEY.md §4 test plan: 'AWQ grid-search determinism on a fixed toy
layer')."""

import numpy as np
import jax.numpy as jnp

from qdm_tpu.quant.awq import (search_best_scale, compute_best_clip,
                               apply_clip_to_kernel, awq_search_and_apply)
from qdm_tpu.quant.smooth import ScalingGroup
from qdm_tpu.config import QuantConfig

RNG = np.random.default_rng(42)


def _toy():
    x = RNG.standard_normal((256, 64)).astype(np.float32)
    x[:, 7] *= 20.0   # channel outlier
    w = (RNG.standard_normal((48, 64)) * 0.1).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(w)


def test_scale_search_deterministic():
    x, w = _toy()
    s1, l1 = search_best_scale(x, w, n_bits=4, group_size=32)
    s2, l2 = search_best_scale(x, w, n_bits=4, group_size=32)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert np.asarray(l1).shape == (20,)


def test_scale_search_helps_outlier_channel():
    """The searched scale must reduce quantized-output MSE vs no scale."""
    from qdm_tpu.quant.pseudo import pseudo_quantize_tensor

    x, w = _toy()
    s, losses = search_best_scale(x, w, n_bits=4, group_size=32)
    fp = np.asarray(x @ w.T)
    wq0, _, _ = pseudo_quantize_tensor(w, n_bits=4, group_size=32)
    base_err = ((np.asarray(x @ wq0.T) - fp) ** 2).mean()
    # losses[0] is ratio=0 (pure weight-driven); best <= all grid points
    assert float(np.asarray(losses).min()) <= base_err * 1.001
    assert float(np.asarray(s).min()) > 0


def test_clip_search_shrinks_only_helpful():
    x, w = _toy()
    mv = compute_best_clip(w, x, n_bits=4, group_size=32)
    org = np.abs(np.asarray(w).reshape(48, 2, 32)).max(-1)
    assert mv.shape == (48, 2)
    assert (np.asarray(mv) <= org + 1e-6).all()
    clipped = apply_clip_to_kernel(w.T, mv)
    assert (np.abs(np.asarray(clipped)) <= np.repeat(np.asarray(mv).T, 32, 0) + 1e-5).all()


def test_glu_block_loss_search():
    """search_best_scale_glu evaluates the reference's enclosing-MLP
    loss (module2inspect): its best grid point must minimize the BLOCK
    MSE over the shared duo-scale grid, and awq_search_and_apply must
    route gate/up groups with a block spec through it (the migrated
    params differ from the group-linear-loss choice whenever the two
    losses pick different ratios)."""
    from qdm_tpu.quant.awq import search_best_scale_glu
    from qdm_tpu.quant.pseudo import pseudo_quantize_tensor

    C, I, H = 64, 96, 64
    x = jnp.asarray(RNG.standard_normal((256, C)).astype(np.float32))
    x = x.at[:, 3].mul(15.0)
    wg = jnp.asarray((RNG.standard_normal((C, I)) * 0.1).astype(np.float32))
    wu = jnp.asarray((RNG.standard_normal((C, I)) * 0.1).astype(np.float32))
    wd = jnp.asarray((RNG.standard_normal((I, H)) * 0.1).astype(np.float32))

    s, losses = search_best_scale_glu(x, wg.T, wu.T, wd.T, act="silu",
                                      n_bits=4, group_size=32)

    def block(wg_, wu_):
        import jax.nn
        return (jax.nn.silu(x @ wg_) * (x @ wu_)) @ wd

    fp = np.asarray(block(wg, wu))

    def block_mse(scales):
        sv = np.asarray(scales)[:, None]
        gq, _, _ = pseudo_quantize_tensor((wg * sv).T, n_bits=4,
                                          group_size=32)
        uq, _, _ = pseudo_quantize_tensor((wu * sv).T, n_bits=4,
                                          group_size=32)
        q = np.asarray(block(jnp.asarray(gq).T / sv, jnp.asarray(uq).T / sv))
        return float(((q - fp) ** 2).mean())

    # the returned best is the argmin over its own grid
    assert np.isclose(block_mse(s), float(np.asarray(losses).min()),
                      rtol=1e-4)
    # and awq_search_and_apply routes block groups through this search
    params = {
        "norm": {"scale": jnp.ones(C), "bias": jnp.zeros(C)},
        "gate_proj": {"kernel": wg},
        "up_proj": {"kernel": wu},
        "down_proj": {"kernel": wd},
    }
    g = ScalingGroup(prev_path=("norm",),
                     layer_paths=(("gate_proj",), ("up_proj",)),
                     block=("glu:silu", ("down_proj",)))
    cfg = QuantConfig(w_bit=4, q_group_size=32, zero_point=True)
    out = awq_search_and_apply(params, [g], {"gate_proj": x}, cfg,
                               do_clip=False)
    np.testing.assert_allclose(
        np.asarray(out["norm"]["scale"]),
        1.0 / np.asarray(s), rtol=1e-5,
        err_msg="block group did not migrate with the glu-loss scales")


def test_llama_groups_carry_glu_block_spec():
    """llama_scaling_groups marks the gate/up group with the enclosing
    MLP block spec (act from config) so AWQ uses the reference loss."""
    from qdm_tpu.models.shims import llama_scaling_groups

    k = jnp.zeros((8, 8))
    layer = {"self_attn": {f"{p}_proj": {"kernel": k}
                           for p in ("q", "k", "v", "o")},
             "mlp": {p: {"kernel": k}
                     for p in ("gate_proj", "up_proj", "down_proj")},
             "input_layernorm": {"scale": jnp.ones(8)},
             "post_attention_layernorm": {"scale": jnp.ones(8)}}
    groups = llama_scaling_groups({"layers_0": layer}, mlp_act="gelu")
    blocks = [g.block for g in groups if g.block is not None]
    assert blocks == [("glu:gelu", ("layers_0", "mlp", "down_proj"))]


def test_moe_block_loss_search():
    """search_best_scale_moe evaluates the reference's enclosing
    sparse-block loss: trials run every expert's scaled+quantized
    w1/w3 through the dense-exact MoE combine (fp router + fp w2),
    and the returned best is the argmin of that loss on its own grid."""
    import jax
    import jax.nn
    from qdm_tpu.quant.awq import search_best_scale_moe
    from qdm_tpu.quant.pseudo import pseudo_quantize_tensor

    E, C, I, S, K = 4, 64, 96, 200, 2
    x = jnp.asarray(RNG.standard_normal((S, C)).astype(np.float32))
    x = x.at[:, 5].mul(12.0)
    W1 = jnp.asarray((RNG.standard_normal((E, C, I)) * 0.1).astype(np.float32))
    W3 = jnp.asarray((RNG.standard_normal((E, C, I)) * 0.1).astype(np.float32))
    W2 = jnp.asarray((RNG.standard_normal((E, I, C)) * 0.1).astype(np.float32))
    Wr = jnp.asarray((RNG.standard_normal((C, E)) * 0.1).astype(np.float32))

    s, losses = search_best_scale_moe(x, W1, W3, W2, Wr, top_k=K,
                                      n_bits=4, group_size=32)

    probs = jax.nn.softmax(x @ Wr, axis=-1)
    top_w, top_i = jax.lax.top_k(probs, K)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    onehot = jnp.sum(jax.nn.one_hot(top_i, E) * top_w[..., None], axis=1)

    def block(W1_, W3_):
        h = jax.nn.silu(jnp.einsum("sc,eci->esi", x, W1_)) \
            * jnp.einsum("sc,eci->esi", x, W3_)
        return jnp.einsum("esi,eic,se->sc", h, W2, onehot)

    fp = np.asarray(block(W1, W3))

    def qexp(W, sv):
        flat = np.asarray((W * sv[None, :, None]).transpose(0, 2, 1)
                          ).reshape(-1, C)
        q, _, _ = pseudo_quantize_tensor(jnp.asarray(flat), n_bits=4,
                                         group_size=32)
        return (jnp.asarray(q).reshape(E, I, C).transpose(0, 2, 1)
                / sv[None, :, None])

    got = float(((np.asarray(block(qexp(W1, s), qexp(W3, s))) - fp) ** 2
                 ).mean())
    assert np.isclose(got, float(np.asarray(losses).min()), rtol=1e-4)
    # and the searched scale beats no-scale on the block loss
    ones = jnp.ones(C)
    base = float(((np.asarray(block(qexp(W1, ones), qexp(W3, ones))) - fp)
                  ** 2).mean())
    assert got <= base * 1.001


def test_awq_search_and_apply_end_to_end():
    x, w = _toy()
    params = {
        "norm": {"scale": jnp.ones(64), "bias": jnp.zeros(64)},
        "fc": {"kernel": w.T, "bias": jnp.zeros(48)},
    }
    g = ScalingGroup(prev_path=("norm",), layer_paths=(("fc",),))
    cfg = QuantConfig(w_bit=4, q_group_size=32, zero_point=True)
    out = awq_search_and_apply(params, [g], {"fc": x}, cfg)
    # norm absorbed 1/s, fc took s
    assert not np.allclose(np.asarray(out["norm"]["scale"]), 1.0)
    assert not np.array_equal(np.asarray(out["fc"]["kernel"]), np.asarray(w.T))
