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


def test_attn_module_loss_matches_reference_semantics():
    """search_best_scale_attn (the r5 closure of the LAST loss-target
    deviation) must pick exactly the scales of a hand-written
    reference-semantics search: duo-scale grid, each trial quantizing
    q/k/v as Q(w*s)/s, loss = MSE of the whole attention module's
    output (rope, causal softmax, GQA, fp o_proj) on sequence-shaped
    inputs — quantizer.py:605-676,678-751.  Full-scale version:
    tools/awq_attn_ab.py (prod_over_B = 1.0 on 4 outlier-injected
    layers)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from qdm_tpu.quant.awq import (_group_quantize_rows,
                                   search_best_scale_attn)

    h, hkv, d, C, S, nb = 2, 1, 8, 16, 24, 2
    gs, nbits = 8, 4
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((nb, S, C)), jnp.float32)
    x = x.at[:, :, 3].multiply(9.0)          # an outlier channel
    wq = jnp.asarray(rng.standard_normal((h * d, C)), jnp.float32) * 0.3
    wk = jnp.asarray(rng.standard_normal((hkv * d, C)), jnp.float32) * 0.3
    wv = jnp.asarray(rng.standard_normal((hkv * d, C)), jnp.float32) * 0.3
    wo = jnp.asarray(rng.standard_normal((C, h * d)), jnp.float32) * 0.3
    theta, scale = 10000.0, d ** -0.5

    def fwd(wq_, wk_, wv_):
        q = (x @ wq_.T).reshape(nb, S, h, d)
        k = (x @ wk_.T).reshape(nb, S, hkv, d)
        v = (x @ wv_.T).reshape(nb, S, hkv, d)
        inv = 1.0 / (theta ** (np.arange(0, d, 2, np.float32) / d))
        ang = np.arange(S, dtype=np.float32)[:, None] * inv
        cos = jnp.asarray(np.cos(ang))[None, :, None, :]
        sin = jnp.asarray(np.sin(ang))[None, :, None, :]

        def rope_(t):
            a, b = t[..., :d // 2], t[..., d // 2:]
            return jnp.concatenate([a * cos - b * sin,
                                    b * cos + a * sin], -1)

        q, k = rope_(q), rope_(k)
        k = jnp.repeat(k, h // hkv, 2)
        v = jnp.repeat(v, h // hkv, 2)
        lg = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        lg = jnp.where(jnp.asarray(np.tril(np.ones((S, S), bool)))[None,
                                                                   None],
                       lg, -1e9)
        o = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(lg, -1),
                       v).reshape(nb, S, h * d)
        return o @ wo.T

    w_cat = jnp.concatenate([wq, wk, wv], 0)
    wg = jnp.abs(w_cat).reshape(-1, gs)
    w_mean = (wg / (wg.max(1, keepdims=True) + 1e-6)).reshape(
        w_cat.shape).mean(0)
    x_mean = jnp.abs(x).mean((0, 1))
    fp = fwd(wq, wk, wv)
    best, best_loss = None, np.inf
    for i in range(20):
        r = i / 20
        s = jnp.clip(x_mean ** r / (w_mean ** (1 - r) + 1e-4), 1e-4, None)
        s = s / jnp.sqrt(s.max() * s.min())

        def q_(w):
            return _group_quantize_rows(w * s[None], nbits, gs,
                                        True) / s[None]

        loss = float(jnp.mean((fwd(q_(wq), q_(wk), q_(wv)) - fp) ** 2))
        if loss < best_loss:
            best, best_loss = s, loss

    got, _ = search_best_scale_attn(x, wq, wk, wv, wo.T, h=h, hkv=hkv,
                                    d=d, rope_theta=theta,
                                    attn_scale=scale, n_bits=nbits,
                                    group_size=gs, zero_point=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(best),
                               rtol=1e-5, atol=1e-6)


def test_awq_quantize_uses_attn_loss_end_to_end():
    """CausalLM.quantize('awq') wires the sequence capture + attention
    block spec: the qkv groups carry the attn geometry, '::seq' feats
    are captured, and the result still round-trips a forward."""
    import numpy as np
    import jax.numpy as jnp

    from qdm_tpu.api.causal_lm import CausalLM
    from qdm_tpu.config import QuantConfig
    from qdm_tpu.models import llama as llama_lib
    from qdm_tpu.models.shims import (attn_geom_from_config,
                                      llama_scaling_groups)

    lm = CausalLM.from_config(llama_lib.tiny_llama_config(),
                              dtype=jnp.float32, seed=3)
    geom = attn_geom_from_config(lm.config)
    assert geom and geom.startswith("attn:4:2:16:")
    groups = llama_scaling_groups(lm.params, attn_geom=geom)
    qkv = [g for g in groups if g.prev_path[-1] == "input_layernorm"]
    assert qkv and all(g.block and g.block[0] == geom for g in qkv)

    cfg = QuantConfig(w_bit=4, q_group_size=32, zero_point=True)
    _, feats = lm._calibrate(cfg, np.random.default_rng(0).integers(
        0, 256, (2, 16)).astype(np.int32), capture_inputs=True,
        capture_seq=2)
    assert "layers_0/self_attn/q_proj::seq" in feats
    assert feats["layers_0/self_attn/q_proj::seq"].ndim == 3

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, (2, 16)).astype(np.int32)
    lm.quantize(quant_config={"w_bit": 4, "q_group_size": 32,
                              "zero_point": True, "version": "fake"},
                quantType="awq", calib_data=ids)
    out = lm.generate(ids[:, :8], max_new_tokens=2)
    assert np.isfinite(np.asarray(lm.logits(ids[:1, :4]))).all()
    assert out.shape == (2, 10)
