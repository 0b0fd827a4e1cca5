"""Decode megakernel tests: interpret-mode kernels vs jnp references,
and the DecodeEngine vs the module-path greedy decode (the serving
counterpart of the reference's fused-module stack,
models/base.py:1494-1515 / utils/fused_utils.py:45-142)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.api.serve import DecodeEngine
from qdm_tpu.models import llama as llama_lib
from qdm_tpu.ops import decode_kernels as dk

RNG = np.random.default_rng(0)


def _arr(*shape, scale=1.0, dtype=jnp.float32):
    return jnp.asarray(RNG.standard_normal(shape) * scale, dtype)


# ------------------------------------------------------------------- kernels


def test_fused_dense_interpret_matches_ref():
    x = _arr(8, 256, scale=0.5)
    w = _arr(256, 512, scale=0.05)
    ns = jnp.abs(_arr(256)) + 0.5
    res = _arr(8, 512)
    for norm, r in ((None, None), (ns, None), (None, res), (ns, res)):
        out = dk.fused_dense_decode_pallas(x, w, norm_scale=norm, residual=r,
                                           interpret=True, block_n=128)
        ref = dk.fused_dense_decode_ref(x, w, norm_scale=norm, residual=r)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_fused_dense_i8_interpret_matches_ref():
    x = _arr(8, 256, scale=0.5)
    wf = _arr(256, 512, scale=0.05)
    from qdm_tpu.api.serve import _quant_w

    w_i8, ws = _quant_w(wf)
    a = jnp.asarray([0.01], jnp.float32)
    ns = jnp.abs(_arr(256)) + 0.5
    res = _arr(8, 512)
    for norm, r in ((None, None), (ns, res)):
        out = dk.fused_dense_decode_i8_pallas(
            x, w_i8, ws, a, norm_scale=norm, residual=r,
            interpret=True, block_n=128)
        ref = dk.fused_dense_decode_i8_ref(x, w_i8, ws, a, norm_scale=norm,
                                           residual=r)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_decode_attention_interpret_matches_ref():
    b, hkv, g, d, t = 4, 2, 4, 64, 256
    q = _arr(b, hkv, g, d, scale=0.5)
    kc = _arr(b, hkv, d, t, scale=0.5)
    vc = _arr(b, hkv, t, d, scale=0.5)
    for pos in (0, 7, t - 1):
        out = dk.decode_attention_pallas(q, kc, vc, pos, interpret=True)
        ref = dk.decode_attention_ref(q, kc, vc, pos)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_decode_attention_padded_batch_rows():
    """Bp > cache batch: only the first B rows are defined and must
    match; padded rows are never read downstream."""
    b, bp, hkv, g, d, t = 2, 8, 2, 4, 64, 128
    q = _arr(bp, hkv, g, d, scale=0.5)
    kc = _arr(b, hkv, d, t, scale=0.5)
    vc = _arr(b, hkv, t, d, scale=0.5)
    out = dk.decode_attention_pallas(q, kc, vc, 63, interpret=True)
    ref = dk.decode_attention_ref(q, kc, vc, 63)
    np.testing.assert_allclose(np.asarray(out[:b]), np.asarray(ref[:b]),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_interpret_matches_ref():
    x = _arr(8, 256, scale=0.5)
    wg = _arr(256, 512, scale=0.05)
    wu = _arr(256, 512, scale=0.05)
    wd = _arr(512, 256, scale=0.05)
    ns = jnp.abs(_arr(256)) + 0.5
    out = dk.fused_mlp_decode_pallas(x, wg, wu, wd, ns, interpret=True,
                                     block_j=128)
    ref = dk.fused_mlp_decode_ref(x, wg, wu, wd, ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_i8_interpret_matches_ref():
    from qdm_tpu.api.serve import _quant_w

    x = _arr(8, 256, scale=0.5)
    wgf, wuf = _arr(256, 512, scale=0.05), _arr(256, 512, scale=0.05)
    wdf = _arr(512, 256, scale=0.05)
    wg, sg = _quant_w(wgf)
    wu, su = _quant_w(wuf)
    wd, sd = _quant_w(wdf)
    ns = jnp.abs(_arr(256)) + 0.5
    scl = jnp.asarray([0.01, 0.005], jnp.float32)
    out = dk.fused_mlp_decode_i8_pallas(x, wg, wu, wd, (sg, su, sd), scl, ns,
                                        interpret=True, block_j=128)
    ref = dk.fused_mlp_decode_i8_ref(x, wg, wu, wd, (sg, su, sd), scl, ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# -------------------------------------------------------------------- engine


@pytest.fixture(scope="module")
def lm():
    return CausalLM.from_config(llama_lib.tiny_llama_config(),
                                dtype=jnp.float32, seed=0)


def test_engine_bf16_matches_module_greedy(lm):
    """The megakernel engine is a pure re-fusion of the module math:
    greedy tokens must match the module path exactly (f32 CPU)."""
    ids = RNG.integers(0, 256, (2, 7))
    ref = lm.generate(ids, max_new_tokens=12)
    eng = DecodeEngine(lm, mode="bf16")
    out = eng.generate(ids, max_new_tokens=12)
    np.testing.assert_array_equal(out, ref)


def test_engine_batch1(lm):
    """Batch 1 exercises the sublane-padded (Bp=8) decode rows."""
    ids = RNG.integers(0, 256, (1, 5))
    ref = lm.generate(ids, max_new_tokens=8)
    eng = DecodeEngine(lm, mode="bf16")
    out = eng.generate(ids, max_new_tokens=8)
    np.testing.assert_array_equal(out, ref)


def test_engine_w8a8_static(lm):
    """int8 static engine: calibrated scales, runs end to end, and the
    greedy tokens mostly survive int8 on a tiny random model."""
    ids = RNG.integers(0, 256, (2, 7))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    assert "layers_0/self_attn/q_proj" in stats
    eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats)
    out = eng.generate(ids, max_new_tokens=10)
    ref = lm.generate(ids, max_new_tokens=10)
    assert out.shape == ref.shape
    assert (out == ref).mean() > 0.6

    with pytest.raises(ValueError):
        DecodeEngine(lm, mode="w8a8_static")


def test_decode_attention_rows_interpret_matches_ref():
    b, hkv, g, d, t = 4, 2, 4, 64, 256
    q = _arr(b, hkv, g, d, scale=0.5)
    kc = _arr(b, hkv, d, t, scale=0.5)
    vc = _arr(b, hkv, t, d, scale=0.5)
    out = dk.decode_attention_rows_pallas(q, kc, vc, 100, interpret=True)
    ref = dk.decode_attention_ref(q, kc, vc, 100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_decode_attention_i8_interpret_matches_ref():
    b, hkv, g, d, t = 2, 2, 4, 64, 256
    q = _arr(b, hkv, g, d, scale=0.5)
    kf = _arr(b, hkv, d, t, scale=0.5)
    vf = _arr(b, hkv, t, d, scale=0.5)
    ks = jnp.max(jnp.abs(kf), axis=2, keepdims=True) / 127.0
    vs = jnp.max(jnp.abs(vf), axis=3)[:, :, None, :] / 127.0
    ki = jnp.round(kf / ks).astype(jnp.int8)
    vi = jnp.round(vf / vs.transpose(0, 1, 3, 2)).astype(jnp.int8)
    out = dk.decode_attention_i8_pallas(q, ki, ks, vi, vs, 200,
                                        interpret=True)
    ref = dk.decode_attention_i8_ref(q, ki, ks, vi, vs, 200)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # and the int8 path is close to exact attention
    exact = dk.decode_attention_ref(q, kf, vf, 200)
    rel = float(jnp.max(jnp.abs(out - exact)) / jnp.max(jnp.abs(exact)))
    assert rel < 0.05, rel


def test_engine_int8_kv_cache(lm):
    """int8-KV engine: tokens track the bf16-cache engine closely on a
    tiny model (per-token per-head scales, ~0.4% quant error)."""
    ids = RNG.integers(0, 256, (2, 7))
    eng = DecodeEngine(lm, mode="bf16", kv_dtype=jnp.int8)
    out = eng.generate(ids, max_new_tokens=10)
    ref = lm.generate(ids, max_new_tokens=10)
    assert out.shape == ref.shape
    assert (out == ref).mean() > 0.7, (out, ref)


def test_engine_int8_kv_channel_static(lm):
    """Channel-static int8 KV (kv_scale_mode='channel'): per-(head,
    depth-channel) scales set at prefill, folded into q / the output
    outside the kernel.  Tokens track the bf16-cache engine closely;
    score() derives the scales from the scored sequence."""
    ids = RNG.integers(0, 256, (2, 7))
    eng = DecodeEngine(lm, mode="bf16", kv_dtype=jnp.int8,
                       kv_scale_mode="channel")
    assert eng.kv_scale_mode == "channel"
    out = eng.generate(ids, max_new_tokens=10)
    ref = lm.generate(ids, max_new_tokens=10)
    assert out.shape == ref.shape
    assert (out == ref).mean() > 0.7, (out, ref)
    sc = np.asarray(eng.score(ids))
    assert np.isfinite(sc).all()
    # decode-time writes CLIP at the prefill-derived range: feeding a
    # token stream again must stay finite
    out2 = eng.generate(ids, max_new_tokens=10)
    np.testing.assert_array_equal(out, out2)


def test_kv_i8c_interpret_matches_ref():
    """The i8c pallas kernel body (in-kernel q/p int8 quantization,
    pos masking, block_b grid, bp>b padding) vs the scale-free f32
    ref, in interpret mode — in the realistic folded-scales regime
    (q carries the K channel scales, so logits are moderate; raw
    unit-scale q over ±127 codes would be a chaotic one-hot softmax)."""
    from qdm_tpu.ops import decode_kernels as dk

    rng = np.random.default_rng(5)
    b, hkv, g, d, t = 4, 2, 4, 64, 256
    pos = 130
    kvf = rng.normal(size=(b, 2 * hkv, d, t)).astype(np.float32)
    sc = np.abs(kvf).max(axis=3, keepdims=True).clip(1e-6) / 127.0
    kv = jnp.asarray(np.clip(np.round(kvf / sc), -127, 127), jnp.int8)
    kf = sc[:, :hkv].transpose(0, 1, 3, 2)                 # (b,hkv,1,d)
    for bp, bb in ((b, 1), (b, 2), (b + 4, 1)):
        q = rng.normal(size=(bp, hkv, g, d)).astype(np.float32)
        qf = jnp.asarray(q * np.pad(kf, ((0, bp - b),) + ((0, 0),) * 3,
                                    constant_values=1.0))
        out = dk.decode_attention_kv_i8c_pallas(qf, kv, pos, block_b=bb,
                                                interpret=True)
        ref = dk.decode_attention_kv_i8c_ref(qf, kv, pos)
        np.testing.assert_allclose(np.asarray(out)[:b], np.asarray(ref)[:b],
                                   rtol=0, atol=2.0,
                                   err_msg=f"bp={bp} bb={bb}")


def test_kv_attn_ragged_starts_interpret():
    """The combined-cache kernel's per-row start mask (ragged
    left-padded batches) vs the masked f32 reference."""
    rng = np.random.default_rng(13)
    b, hkv, g, d, t = 4, 2, 4, 64, 256
    pos = 140
    q = jnp.asarray(rng.normal(size=(b, hkv, g, d)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(b, 2 * hkv, d, t)) * 0.5, jnp.float32)
    starts = jnp.asarray([0, 17, 5, 100], jnp.int32)
    out = dk.decode_attention_kv_pallas(q, kv, pos, starts, block_b=2,
                                        interpret=True)
    ref = dk.decode_attention_ref(q, kv[:, :hkv],
                                  kv[:, hkv:].transpose(0, 1, 3, 2), pos,
                                  starts=starts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kv_i8c_ref_matches_token_scales():
    """The channel-scale folding identity: q'=q*ks outside +
    unit-scale int8 cache + o*vs outside == attention over the
    dequantized cache (exact in f32, up to softmax arithmetic)."""
    from qdm_tpu.ops import decode_kernels as dk

    rng = np.random.default_rng(3)
    b, hkv, g, d, t = 2, 2, 4, 64, 128
    pos = 65
    kv = rng.normal(size=(b, 2 * hkv, d, t)).astype(np.float32)
    q = rng.normal(size=(b, hkv, g, d)).astype(np.float32)
    sc = (np.abs(kv).max(axis=3, keepdims=True) + 1e-6) / 127.0
    kv_i8 = np.clip(np.round(kv / sc), -127, 127).astype(np.int8)
    kf = sc[:, :hkv].transpose(0, 1, 3, 2)            # (b,hkv,1,d)
    vf = sc[:, hkv:].transpose(0, 1, 3, 2)
    out = dk.decode_attention_kv_i8c(
        jnp.asarray(q * kf), jnp.asarray(kv_i8), pos)
    out = np.asarray(out) * vf
    # reference: attention over the dequantized depth-major cache
    deq = kv_i8.astype(np.float32) * sc
    ref = dk.decode_attention_ref(
        jnp.asarray(q), jnp.asarray(deq[:, :hkv]),
        jnp.asarray(deq[:, hkv:].transpose(0, 1, 3, 2)), pos)
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pack_kv_int4_bijection():
    """Depth-axis nibble packing round-trips every int4 code."""
    rng = np.random.default_rng(7)
    codes = rng.integers(-8, 8, (2, 4, 16, 64)).astype(np.int32)
    packed = dk.pack_kv_int4(jnp.asarray(codes))
    assert packed.shape == (2, 4, 8, 64) and packed.dtype == jnp.int8
    back = dk.unpack_kv_int4(packed)
    np.testing.assert_array_equal(np.asarray(back), codes)


def test_kv_i4c_interpret_matches_ref():
    """The i4c pallas kernel (in-kernel nibble unpack through int32
    shifts, sublane-stacked half planes, pos masking, block_b grid,
    bp>b padding, ragged starts) vs the unpacking f32 ref — in the
    folded-scales regime like the i8c test."""
    rng = np.random.default_rng(11)
    b, hkv, g, d, t = 4, 2, 4, 64, 256
    pos = 130
    kvf = rng.normal(size=(b, 2 * hkv, d, t)).astype(np.float32)
    sc = np.abs(kvf).max(axis=3, keepdims=True).clip(1e-6) / 7.0
    codes = np.clip(np.round(kvf / sc), -7, 7).astype(np.int32)
    kv_p = dk.pack_kv_int4(jnp.asarray(codes))
    kf = sc[:, :hkv].transpose(0, 1, 3, 2)                 # (b,hkv,1,d)
    starts = jnp.asarray([0, 9, 40, 100], jnp.int32)
    for bp, bb, st in ((b, 1, None), (b, 2, None), (b + 4, 1, None),
                       (b, 2, starts)):
        q = rng.normal(size=(bp, hkv, g, d)).astype(np.float32)
        qf = jnp.asarray(q * np.pad(kf, ((0, bp - b),) + ((0, 0),) * 3,
                                    constant_values=1.0))
        out = dk.decode_attention_kv_i4c_pallas(qf, kv_p, pos, starts=st,
                                                block_b=bb, interpret=True)
        ref = dk.decode_attention_kv_i4c_ref(qf, kv_p, pos, starts=st)
        np.testing.assert_allclose(np.asarray(out)[:b], np.asarray(ref)[:b],
                                   rtol=0, atol=2.0,
                                   err_msg=f"bp={bp} bb={bb}")


def test_engine_int4_kv_channel_static(lm):
    """int4 KV cache (kv_dtype='int4'): packed depth-channel pairs,
    channel-static scales forced (kv_scale_mode auto-set).  Tokens
    track the bf16-cache engine on a tiny model; repeat runs are
    deterministic (decode writes clip at the prefill-derived range)."""
    ids = RNG.integers(0, 256, (2, 7))
    eng = DecodeEngine(lm, mode="bf16", kv_dtype="int4")
    assert eng.kv_scale_mode == "channel"
    out = eng.generate(ids, max_new_tokens=10)
    ref = lm.generate(ids, max_new_tokens=10)
    assert out.shape == ref.shape
    assert (out == ref).mean() > 0.6, (out, ref)
    out2 = eng.generate(ids, max_new_tokens=10)
    np.testing.assert_array_equal(out, out2)
    sc = np.asarray(eng.score(ids))
    assert np.isfinite(sc).all()
    # the packed cache really is half the int8 cache's depth rows
    caches = eng.init_cache(2, 128)
    d = lm.config.head_dim
    assert caches[0][0].shape[2] == d // 2


def test_engine_int4_kv_ragged(lm):
    """Ragged x int4 KV: the per-row pad-masked channel scales follow
    the kv8c scheme, but the bit-identity contract does NOT transfer
    to 4 bits — XLA computes batch-3 and batch-1 forwards with
    different f32 reassociation (~1 ULP on the raw K/V, measured), and
    the int4 grid is coarse enough that a sub-ULP shift can flip a
    code where int8 absorbs it.  The honest contract: every ragged row
    tracks its single-prompt run closely."""
    rng = np.random.default_rng(23)
    prompts = [rng.integers(0, 256, (n,)) for n in (3, 7, 5)]
    eng = DecodeEngine(lm, mode="bf16", kv_dtype="int4")
    out = eng.generate_ragged(prompts, max_new_tokens=8)
    for r, p in enumerate(prompts):
        single = eng.generate(p[None], max_new_tokens=8)[0]
        match = (out[r] == single).mean()
        assert match > 0.75, (r, match, out[r], single)


def test_fused_dense_rope_interpret_matches_ref():
    """In-kernel rope epilogue (pltpu.roll partner trick) vs the jnp
    reference AND vs the canonical models/llama.py rope math."""
    from qdm_tpu.models.llama import rope as llama_rope

    b, k, h, hkv, d = 8, 128, 2, 1, 64
    n = (h + 2 * hkv) * d
    x = _arr(b, k, scale=0.5)
    w = _arr(k, n, scale=0.05)
    pos = 13
    half = d // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, d, 2) / d))
    ang = pos * freqs
    col = jnp.arange(n)
    cj = col % d
    w_rope = (h + hkv) * d
    cosv = jnp.where(col < w_rope, jnp.cos(ang)[cj % half], 1.0)
    sinv = jnp.where(col < w_rope,
                     jnp.where(cj < half, -1.0, 1.0) * jnp.sin(ang)[cj % half],
                     0.0)
    out = dk.fused_dense_decode_pallas(x, w, rope_cos=cosv, rope_sin=sinv,
                                       head_dim=d, interpret=True,
                                       block_n=128)
    ref = dk.fused_dense_decode_ref(x, w, rope_cos=cosv, rope_sin=sinv,
                                    head_dim=d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # ground truth: canonical rope on the q slice
    y = x @ w
    qh = y[:, : h * d].reshape(b, 1, h, d)
    positions = jnp.full((b, 1), pos)
    gt = llama_rope(qh, positions, 10000.0).reshape(b, h * d)
    np.testing.assert_allclose(np.asarray(out[:, : h * d]), np.asarray(gt),
                               rtol=2e-4, atol=2e-4)
    # v slice passes through untouched
    np.testing.assert_allclose(np.asarray(out[:, (h + hkv) * d:]),
                               np.asarray(y[:, (h + hkv) * d:]),
                               rtol=2e-5, atol=2e-5)


def test_decode_attention_dm_interpret_matches_ref():
    b, hkv, g, d, t = 4, 2, 4, 64, 256
    q = _arr(b, hkv, g, d, scale=0.5)
    kc = _arr(b, hkv, d, t, scale=0.5)
    vc = _arr(b, hkv, d, t, scale=0.5)
    out = dk.decode_attention_dm_pallas(q, kc, vc, 100, interpret=True)
    ref = dk.decode_attention_ref(q, kc, vc.transpose(0, 1, 3, 2), 100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_decode_attention_dm_i8_interpret_matches_ref():
    b, hkv, g, d, t = 2, 2, 4, 64, 256
    q = _arr(b, hkv, g, d, scale=0.5)
    kf = _arr(b, hkv, d, t, scale=0.5)
    vf = _arr(b, hkv, d, t, scale=0.5)
    ks = jnp.max(jnp.abs(kf), axis=2, keepdims=True) / 127.0
    vs = jnp.max(jnp.abs(vf), axis=2, keepdims=True) / 127.0
    ki = jnp.round(kf / ks).astype(jnp.int8)
    vi = jnp.round(vf / vs).astype(jnp.int8)
    out = dk.decode_attention_dm_i8_pallas(q, ki, ks, vi, vs, 200,
                                           interpret=True)
    ref = dk.decode_attention_dm_i8_ref(q, ki, ks, vi, vs, 200)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    exact = dk.decode_attention_ref(q, kf, vf.transpose(0, 1, 3, 2), 200)
    rel = float(jnp.max(jnp.abs(out - exact)) / jnp.max(jnp.abs(exact)))
    assert rel < 0.05, rel


def test_decode_attention_kv_interpret_matches_ref():
    """Combined [K|V] cache kernel, block_b 1 and 2."""
    b, hkv, g, d, t = 4, 2, 4, 64, 256
    q = _arr(b, hkv, g, d, scale=0.5)
    kv = _arr(b, 2 * hkv, d, t, scale=0.5)
    ref = dk.decode_attention_ref(q, kv[:, :hkv],
                                  kv[:, hkv:].transpose(0, 1, 3, 2), 100)
    for bb in (1, 2):
        out = dk.decode_attention_kv_pallas(q, kv, 100, block_b=bb,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_decode_attention_kv_i8_interpret_matches_ref():
    b, hkv, g, d, t = 2, 2, 4, 64, 256
    q = _arr(b, hkv, g, d, scale=0.5)
    kvf = _arr(b, 2 * hkv, d, t, scale=0.5)
    ss = jnp.max(jnp.abs(kvf), axis=2, keepdims=True) / 127.0
    kvi = jnp.round(kvf / ss).astype(jnp.int8)
    ref = dk.decode_attention_dm_i8_ref(q, kvi[:, :hkv], ss[:, :hkv],
                                        kvi[:, hkv:], ss[:, hkv:], 200)
    for bb in (1, 2):
        out = dk.decode_attention_kv_i8_pallas(q, kvi, ss, 200, block_b=bb,
                                               interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_int4_pack_unpack_bijection():
    rng = np.random.RandomState(0)
    wq = jnp.asarray(rng.randint(-7, 8, (256, 128)), jnp.int8)
    for block in (0, 64):
        p = dk.pack_int4_planar(wq, block=block)
        assert p.shape == (128, 128) and p.dtype == jnp.int8
        back = dk.unpack_int4_planar(p, block=block)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(wq))


def test_fused_dense_i4_interpret_matches_ref():
    rng = np.random.RandomState(1)
    b, k, n, group = 4, 256, 256, 64
    x = jnp.asarray(rng.randn(b, k), jnp.float32)
    w = jnp.asarray(rng.randn(k, n) / np.sqrt(k), jnp.float32)
    wq, ws = dk.quantize_int4_group(w, group)
    wp = dk.pack_int4_planar(wq)
    a_s = jnp.asarray([0.05], jnp.float32)
    norm = jnp.asarray(rng.rand(k) + 0.5, jnp.float32)
    res = jnp.asarray(rng.randn(b, n), jnp.float32)
    out = dk.fused_dense_decode_i4_pallas(
        x, wp, ws, a_s, norm_scale=norm, residual=res, group=group,
        block_n=128, interpret=True)
    ref = dk.fused_dense_decode_i4_ref(
        x, wp, ws, a_s, norm_scale=norm, residual=res, group=group)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # and the dequant path really is int4: error vs the fp product is
    # small but nonzero
    fp = dk.fused_dense_decode_ref(x, w, norm_scale=norm, residual=res)
    rel = float(jnp.linalg.norm(out - fp) / jnp.linalg.norm(fp))
    assert 1e-5 < rel < 0.2, rel


def test_fused_dense_i4_rope_interpret():
    rng = np.random.RandomState(2)
    b, k, n, group, hd = 2, 128, 256, 64, 64
    x = jnp.asarray(rng.randn(b, k), jnp.float32)
    w = jnp.asarray(rng.randn(k, n) / np.sqrt(k), jnp.float32)
    wq, ws = dk.quantize_int4_group(w, group)
    wp = dk.pack_int4_planar(wq)
    a_s = jnp.asarray([0.05], jnp.float32)
    ang = rng.rand(n) * 2 * np.pi
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)
    out = dk.fused_dense_decode_i4_pallas(
        x, wp, ws, a_s, rope_cos=cos, rope_sin=sin, head_dim=hd,
        group=group, block_n=128, interpret=True)
    ref = dk.fused_dense_decode_i4_ref(
        x, wp, ws, a_s, rope_cos=cos, rope_sin=sin, head_dim=hd,
        group=group)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_mlp_i4_interpret_matches_ref():
    rng = np.random.RandomState(3)
    b, k, inner, group, bj = 4, 256, 512, 64, 128
    x = jnp.asarray(rng.randn(b, k), jnp.float32)
    wg = jnp.asarray(rng.randn(k, inner) / np.sqrt(k), jnp.float32)
    wu = jnp.asarray(rng.randn(k, inner) / np.sqrt(k), jnp.float32)
    wd = jnp.asarray(rng.randn(inner, k) / np.sqrt(inner), jnp.float32)
    norm = jnp.asarray(rng.rand(k) + 0.5, jnp.float32)
    wgq, sg = dk.quantize_int4_group(wg, group)
    wuq, su = dk.quantize_int4_group(wu, group)
    wdq, sd = dk.quantize_int4_group(wd, group)
    blk = dk.mlp_i4_block(inner, bj)
    wgp = dk.pack_int4_planar(wgq)
    wup = dk.pack_int4_planar(wuq)
    wdp = dk.pack_int4_planar(wdq, block=blk)
    a_s = jnp.asarray([0.05, 0.1], jnp.float32)
    out = dk.fused_mlp_decode_i4_pallas(
        x, wgp, wup, wdp, (sg, su, sd), a_s, norm, block_j=bj,
        group=group, interpret=True)
    ref = dk.fused_mlp_decode_i4_ref(
        x, wgp, wup, wdp, (sg, su, sd), a_s, norm, block_j=bj, group=group)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    fp = dk.fused_mlp_decode_ref(x, wg, wu, wd, norm)
    rel = float(jnp.linalg.norm(out - fp) / jnp.linalg.norm(fp))
    assert 1e-5 < rel < 0.3, rel


def test_engine_w4a8_static(lm):
    """int4 group-quantized engine (planar-packed, int8 MXU): runs end
    to end; greedy tokens mostly survive w4 on a tiny random model."""
    ids = RNG.integers(0, 256, (2, 7))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    eng = DecodeEngine(lm, mode="w4a8_static", act_stats=stats)
    # group shrunk to divide the tiny planar half-contractions
    assert (lm.config.hidden_size // 2) % eng.i4_group == 0
    assert (eng.i4_mlp_block // 2) % eng.i4_group == 0
    out = eng.generate(ids, max_new_tokens=10)
    ref = lm.generate(ids, max_new_tokens=10)
    assert out.shape == ref.shape
    assert np.isfinite(out).all()
    assert (out == ref).mean() > 0.5


def test_fused_o_mlp_interpret_matches_ref():
    """Merged o_proj+residual+MLP kernel vs the composed references."""
    b, hd, kk, inner = 4, 256, 512, 1024
    rng = np.random.RandomState(5)
    attn = _arr(b, hd, scale=0.5)
    res = _arr(b, kk)
    wo_i8 = jnp.clip(jnp.round(
        jnp.asarray(rng.randn(hd, kk) / 16.0, jnp.float32) / 0.01),
        -127, 127).astype(jnp.int8)
    wos = jnp.full((1, kk), 0.01, jnp.float32)
    aos = jnp.asarray([0.02], jnp.float32)
    qw = lambda k2, n2: (jnp.asarray(  # noqa: E731
        rng.randint(-127, 128, (k2, n2)), jnp.int8),
        jnp.full((1, n2), 0.008, jnp.float32))
    wg, sg = qw(kk, inner)
    wu, su = qw(kk, inner)
    wd, sd = qw(inner, kk)
    scl = jnp.asarray([0.03, 0.05], jnp.float32)
    ln2 = jnp.abs(jnp.asarray(rng.randn(kk), jnp.float32)) + 0.5
    out = dk.fused_o_mlp_decode_i8_pallas(
        attn, wo_i8, wos, aos, res, wg, wu, wd, (sg, su, sd), scl, ln2,
        block_j=256, interpret=True)
    ref = dk.fused_o_mlp_decode_i8_ref(
        attn, wo_i8, wos, aos, res, wg, wu, wd, (sg, su, sd), scl, ln2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_engine_w8a8_merged_o_matches_split(lm):
    """merge_o folds o_proj+residual+MLP into one dense megakernel;
    same math, so tokens must match the split w8a8 engine exactly
    (CPU refs)."""
    ids = RNG.integers(0, 256, (8, 7))   # batch 8 = no sublane padding
    stats = DecodeEngine.calibrate_scales(lm, ids)
    split = DecodeEngine(lm, mode="w8a8_static", act_stats=stats)
    merged = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                          merge_o=True)
    assert merged.merge_o
    a = split.generate(ids, max_new_tokens=10)
    b = merged.generate(ids, max_new_tokens=10)
    np.testing.assert_array_equal(a, b)


def test_engine_tp_matches_single(lm):
    """Tensor-parallel engine (shard_map over the 'model' axis:
    column/row-split megakernels + per-layer psums + vocab-split
    argmax) must reproduce the single-device engine's greedy tokens."""
    from qdm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, 2)          # ('data', 'model') = (4, 2)
    ids = RNG.integers(0, 256, (4, 7))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    for mode, kw in (("bf16", {}),
                     ("w8a8_static", {"act_stats": stats})):
        single = DecodeEngine(lm, mode=mode, **kw)
        tp = DecodeEngine(lm, mode=mode, mesh=mesh, **kw)
        assert tp.tp == 2
        a = single.generate(ids, max_new_tokens=10)
        b = tp.generate(ids, max_new_tokens=10)
        # split-contraction f32 partial sums can differ from the
        # single-device accumulation by ulps; greedy tokens on a tiny
        # f32 model still match exactly in practice
        np.testing.assert_array_equal(a, b, err_msg=mode)


def test_engine_tp_rejects_unsupported(lm):
    from qdm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, 2)
    ids = RNG.integers(0, 256, (2, 5))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    with pytest.raises(NotImplementedError):
        DecodeEngine(lm, mode="w8a8_static", act_stats=stats, mesh=mesh,
                     merge_o=True)


def test_engine_dp_and_dpxtp(lm):
    """Data-parallel serving: the batch shards over the mesh's 'data'
    axis, weights replicate (specs name only 'model').  Tokens must
    match the single-device engine under dp-only (4x1), dp x tp (2x2),
    and dp x tp with channel-static int8 KV."""
    from qdm_tpu.parallel.mesh import make_mesh

    ids = np.random.default_rng(9).integers(0, 256, (4, 6))
    single = DecodeEngine(lm, mode="bf16")
    want = single.generate(ids, max_new_tokens=8)
    for dpn, tpn, kw in ((4, 1, {}), (2, 2, {}),
                         (2, 2, {"kv_dtype": jnp.int8,
                                 "kv_scale_mode": "channel"})):
        base = (DecodeEngine(lm, mode="bf16", **kw).generate(
            ids, max_new_tokens=8) if kw else want)
        eng = DecodeEngine(lm, mode="bf16", mesh=make_mesh(dpn, tpn), **kw)
        assert eng.dp == dpn and eng.tp == tpn
        got = eng.generate(ids, max_new_tokens=8)
        np.testing.assert_array_equal(got, base,
                                      err_msg=f"dp={dpn} tp={tpn} {kw}")
    with pytest.raises(ValueError, match="divide dp"):
        DecodeEngine(lm, mode="bf16", mesh=make_mesh(4, 1)).generate(
            np.zeros((3, 5), np.int32), max_new_tokens=4)


def test_engine_tp_int8_kv(lm):
    """int8 KV cache under tensor parallelism: both the per-token and
    the channel-static scale planes shard over the head axis.  Tokens
    must match the single-device engine with the same scheme."""
    from qdm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, 2)
    ids = RNG.integers(0, 256, (2, 6))
    for kw in ({"kv_dtype": jnp.int8},
               {"kv_dtype": jnp.int8, "kv_scale_mode": "channel"}):
        single = DecodeEngine(lm, mode="bf16", **kw)
        tp = DecodeEngine(lm, mode="bf16", mesh=mesh, **kw)
        a = single.generate(ids, max_new_tokens=8)
        b = tp.generate(ids, max_new_tokens=8)
        np.testing.assert_array_equal(a, b, err_msg=str(kw))


def test_engine_tp_w4a8_runs(lm):
    """Tensor-parallel w4a8: per-shard planar packs + row-split group
    scales.  On the tiny model the TP gcd shrinks the int4 group (the
    local h*d/2 term), so quantized values differ slightly from the
    single-device engine — tokens must still mostly agree."""
    from qdm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, 2)
    ids = RNG.integers(0, 256, (4, 7))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    single = DecodeEngine(lm, mode="w4a8_static", act_stats=stats)
    tp = DecodeEngine(lm, mode="w4a8_static", act_stats=stats, mesh=mesh)
    assert tp.tp == 2
    a = single.generate(ids, max_new_tokens=10)
    b = tp.generate(ids, max_new_tokens=10)
    assert np.isfinite(b).all()
    assert (a == b).mean() > 0.5


def test_engine_tp_w4a8_exact_when_groups_align():
    """With dims where the int4 group is 128 both single-device and
    under tp=2 (group | local h*d/2 and | local-inner block/2), the
    per-shard packs dequantize to the SAME values as the global pack,
    so greedy tokens match the single-device engine exactly."""
    from qdm_tpu.parallel.mesh import make_mesh

    lm2 = CausalLM.from_config(
        _tiny_cfg(hidden_size=512, intermediate_size=512,
                  num_attention_heads=16, num_key_value_heads=8),
        dtype=jnp.float32, seed=7)
    ids = RNG.integers(0, 256, (4, 6))
    stats = DecodeEngine.calibrate_scales(lm2, ids)
    single = DecodeEngine(lm2, mode="w4a8_static", act_stats=stats)
    tp = DecodeEngine(lm2, mode="w4a8_static", act_stats=stats,
                      mesh=make_mesh(4, 2))
    assert single.i4_group == tp.i4_group == 128
    a = single.generate(ids, max_new_tokens=8)
    b = tp.generate(ids, max_new_tokens=8)
    np.testing.assert_array_equal(a, b)


def test_engine_prefill_quant(lm):
    """prefill_quant=True runs the prompt forward through the packed
    STATIC-scale w8a8_xla module path (the engine's calibrated
    act_stats fill every act_scale — no 1.0 placeholders, asserted via
    warnings-as-errors); the decode tokens shift slightly (int8 KV
    from prefill) but stay mostly aligned on a tiny random model."""
    import warnings

    ids = RNG.integers(0, 256, (4, 7))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    base = DecodeEngine(lm, mode="w8a8_static", act_stats=stats)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        qp = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                          prefill_quant=True)
    assert qp.prefill_quant
    assert qp._prefill_model.plan.default.act_quant == "static"
    a = base.generate(ids, max_new_tokens=10)
    b = qp.generate(ids, max_new_tokens=10)
    assert b.shape == a.shape
    assert np.isfinite(b).all()
    assert (a == b).mean() > 0.5


def test_engine_prefill_quant_dynamic(lm):
    """prefill_quant='dynamic' keeps the per-token runtime act-quant
    path (no act_scale params in the prefill model's plan)."""
    ids = RNG.integers(0, 256, (2, 7))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    qp = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                      prefill_quant="dynamic")
    assert qp._prefill_model.plan.default.act_quant == "per_token"
    b = qp.generate(ids, max_new_tokens=6)
    assert np.isfinite(b).all()


def test_engine_merged_o_with_int8_kv(lm):
    """merge_o composes with the int8 KV cache (the merged kernel sits
    downstream of attention, so cache dtype is orthogonal)."""
    ids = RNG.integers(0, 256, (2, 7))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    base = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                        kv_dtype=jnp.int8)
    merged = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                          kv_dtype=jnp.int8, merge_o=True)
    a = base.generate(ids, max_new_tokens=10)
    b = merged.generate(ids, max_new_tokens=10)
    np.testing.assert_array_equal(a, b)


def test_fused_o_mlp_i4_interpret_matches_ref():
    """Merged o_proj+residual+MLP int4 kernel vs composed references."""
    rng = np.random.RandomState(11)
    b, hd, kk, inner, group, bj = 4, 128, 256, 512, 64, 256
    attn = jnp.asarray(rng.randn(b, hd), jnp.float32)
    res = jnp.asarray(rng.randn(b, kk), jnp.float32)
    wo = jnp.asarray(rng.randn(hd, kk) / np.sqrt(hd), jnp.float32)
    wg = jnp.asarray(rng.randn(kk, inner) / np.sqrt(kk), jnp.float32)
    wu = jnp.asarray(rng.randn(kk, inner) / np.sqrt(kk), jnp.float32)
    wd = jnp.asarray(rng.randn(inner, kk) / np.sqrt(inner), jnp.float32)
    ln2 = jnp.asarray(rng.rand(kk) + 0.5, jnp.float32)
    woq, wos = dk.quantize_int4_group(wo, group)
    wop = dk.pack_int4_planar(woq)
    wgq, sg = dk.quantize_int4_group(wg, group)
    wuq, su = dk.quantize_int4_group(wu, group)
    wdq, sd = dk.quantize_int4_group(wd, group)
    blk = dk.mlp_i4_block(inner, bj)
    wgp, wup = dk.pack_int4_planar(wgq), dk.pack_int4_planar(wuq)
    wdp = dk.pack_int4_planar(wdq, block=blk)
    aos = jnp.asarray([0.05], jnp.float32)
    scl = jnp.asarray([0.04, 0.08], jnp.float32)
    out = dk.fused_o_mlp_decode_i4_pallas(
        attn, wop, wos, aos, res, wgp, wup, wdp, (sg, su, sd), scl, ln2,
        block_j=bj, group=group, interpret=True)
    ref = dk.fused_o_mlp_decode_i4_ref(
        attn, wop, wos, aos, res, wgp, wup, wdp, (sg, su, sd), scl, ln2,
        block_j=bj, group=group)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_engine_w4a8_merged_o_matches_split(lm):
    """merge_o under w4a8: the merged int4 kernel is the same math as
    the split dense_i4 + mlp_i4 pair — tokens must match exactly."""
    ids = RNG.integers(0, 256, (8, 7))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    split = DecodeEngine(lm, mode="w4a8_static", act_stats=stats)
    merged = DecodeEngine(lm, mode="w4a8_static", act_stats=stats,
                          merge_o=True)
    assert merged.merge_o
    a = split.generate(ids, max_new_tokens=10)
    b = merged.generate(ids, max_new_tokens=10)
    np.testing.assert_array_equal(a, b)


def test_engine_head_quant_int8(lm):
    """head_quant='int8' swaps the bf16 lm_head for per-channel int8
    codes + the calibrated final-norm act scale.  Argmax is not
    invariant, so tokens may shift — they must stay mostly aligned on
    the tiny model, and score() must use the SAME quantized head."""
    ids = RNG.integers(0, 256, (4, 7))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    assert "lm_head" in stats
    base = DecodeEngine(lm, mode="w8a8_static", act_stats=stats)
    hq = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                      head_quant="int8")
    a = base.generate(ids, max_new_tokens=10)
    b = hq.generate(ids, max_new_tokens=10)
    assert b.shape == a.shape
    assert np.isfinite(b).all()
    assert (a == b).mean() > 0.5
    # score() reflects serving numerics: the quantized head's logits
    # differ from the bf16 head's
    sc_q = np.asarray(hq.score(ids))
    sc_b = np.asarray(base.score(ids))
    assert sc_q.shape == sc_b.shape
    assert not np.allclose(sc_q, sc_b)
    # and head_quant composes with the w4a8 merged config
    full = DecodeEngine(lm, mode="w4a8_static", act_stats=stats,
                        merge_o=True, head_quant="int8")
    c = full.generate(ids, max_new_tokens=10)
    assert np.isfinite(c).all()
    assert (a == c).mean() > 0.5


def test_engine_head_quant_int4(lm):
    """head_quant='int4' packs the lm_head as planar group int4 (the
    i4 dense kernel).  Same contract as int8: finite logits, tokens
    mostly aligned with the unquantized-head engine, score() runs
    through the same quantized head."""
    ids = RNG.integers(0, 256, (4, 7))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    base = DecodeEngine(lm, mode="w4a8_static", act_stats=stats)
    h4 = DecodeEngine(lm, mode="w4a8_static", act_stats=stats,
                      merge_o=True, head_quant="int4")
    a = base.generate(ids, max_new_tokens=10)
    b = h4.generate(ids, max_new_tokens=10)
    assert b.shape == a.shape
    assert np.isfinite(b).all()
    assert (a == b).mean() > 0.5
    sc = np.asarray(h4.score(ids))
    assert np.isfinite(sc).all()


def test_causal_lm_serve_entry(lm):
    """CausalLM.serve() is the one-call serving entry: calibrates and
    returns a DecodeEngine in the requested mode."""
    ids = RNG.integers(0, 256, (2, 7))
    eng = lm.serve(ids, mode="w4a8_static")
    assert isinstance(eng, DecodeEngine) and eng.mode == "w4a8_static"
    out = eng.generate(ids, max_new_tokens=6)
    assert out.shape == (2, 13) and np.isfinite(out).all()
    assert isinstance(lm.serve(mode="bf16"), DecodeEngine)
    with pytest.raises(ValueError, match="calib_ids"):
        lm.serve(mode="w8a8_static")


def test_engine_awq_lm():
    """awq_lm migrates scales+clips into lm.params ahead of engine
    construction (the activation-aware counterpart of smooth_lm).
    The migrated engine must serve finite tokens mostly agreeing with
    the unmigrated model, and the migration must actually change
    params.  (Fresh model — serve(awq=True) mutates params.)"""
    mylm = CausalLM.from_config(llama_lib.tiny_llama_config(),
                                dtype=jnp.float32, seed=0)
    ids = np.random.default_rng(11).integers(0, 256, (4, 9))
    ref = mylm.generate(ids, max_new_tokens=8)
    before = mylm.params["layers_0"]["self_attn"]["q_proj"]["kernel"]
    eng = mylm.serve(ids, mode="w4a8_static", awq=True)
    after = mylm.params["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    out = eng.generate(ids, max_new_tokens=8)
    assert np.isfinite(out).all()
    # w4 on the tiny random model sits near its noise floor; AWQ
    # migration must not make it worse than a sanity band (quality is
    # measured in the tables, where it wins under outliers)
    assert (out[:, ids.shape[1]:] == ref[:, ids.shape[1]:]).mean() > 0.25


def test_engine_from_quantized_checkpoint(tmp_path):
    """A packed (version='real') checkpoint loads through
    from_quantized and serves through the DecodeEngine: the engine
    dequantizes the packed buffers once (unpack_params) and
    re-quantizes into its planar layouts.  Tokens must mostly agree
    with the packed module path."""
    mylm = CausalLM.from_config(llama_lib.tiny_llama_config(),
                                dtype=jnp.float32, seed=0)
    ids = np.random.default_rng(7).integers(0, 256, (2, 7))
    mylm.quantize(quant_config={"w_bit": 4, "q_group_size": 32,
                                "version": "real", "quant_method": "rtn"},
                  quantType="rtn")
    mylm.save_quantized(str(tmp_path / "ckpt"))
    loaded = CausalLM.from_quantized(str(tmp_path / "ckpt"),
                                     dtype=jnp.float32)
    ref = loaded.generate(ids, max_new_tokens=8)          # packed module path
    # bf16 engine over the dequantized kernels == the packed module
    # path (unpack_params reconstructs the exact dequantized values)
    eng2 = DecodeEngine(loaded, mode="bf16")
    out2 = eng2.generate(ids, max_new_tokens=8)
    assert (out2[:, ids.shape[1]:] == ref[:, ids.shape[1]:]).mean() > 0.9
    # quantized serve modes re-quantize the dequantized kernels into
    # the engine's planar layouts — a second (lossy) rounding.  On the
    # tiny random model that lands at the checkpoint's own noise floor
    # (its w4 tokens vs fp agree no better), so only shape/finiteness
    # are contractual here; quality is measured in the quality tables.
    eng = loaded.serve(ids, mode="w4a8_static")
    out = eng.generate(ids, max_new_tokens=8)
    assert out.shape == ref.shape and np.isfinite(out).all()


def test_sampling_module_and_engine(lm):
    """temperature/top_k/top_p sampling (the decoding knobs the
    reference drives through HF generate): seed-deterministic,
    top_k=1 == greedy, high temperature diverges from greedy, EOS
    masking pads after the first EOS."""
    ids = np.random.default_rng(3).integers(0, 256, (2, 7))
    greedy = lm.generate(ids, max_new_tokens=10)
    # top_k=1 sampling IS greedy regardless of temperature
    t1 = lm.generate(ids, max_new_tokens=10, temperature=0.7, top_k=1)
    np.testing.assert_array_equal(t1, greedy)
    # seed-deterministic
    s1 = lm.generate(ids, max_new_tokens=10, temperature=3.0, seed=5)
    s2 = lm.generate(ids, max_new_tokens=10, temperature=3.0, seed=5)
    np.testing.assert_array_equal(s1, s2)
    # high temperature diverges from greedy (vocab 2048, 20 draws)
    assert (s1 != greedy).any()
    # top_p sanity: nucleus-truncated sampling stays in-vocab + finite
    p1 = lm.generate(ids, max_new_tokens=10, temperature=0.8, top_p=0.9)
    assert ((p1 >= 0) & (p1 < lm.config.vocab_size)).all()
    # engine path: same knobs
    eng = DecodeEngine(lm, mode="bf16")
    e1 = eng.generate(ids, max_new_tokens=10, temperature=0.7, top_k=1)
    np.testing.assert_array_equal(e1, eng.generate(ids, max_new_tokens=10))
    e2 = eng.generate(ids, max_new_tokens=10, temperature=3.0, seed=5)
    e3 = eng.generate(ids, max_new_tokens=10, temperature=3.0, seed=5)
    np.testing.assert_array_equal(e2, e3)
    assert (e2 != e1).any()
    # EOS masking: everything after the first EOS becomes EOS
    from qdm_tpu.api.causal_lm import mask_after_eos

    toks = np.array([[5, 9, 2, 7, 3], [1, 1, 1, 1, 1]])
    np.testing.assert_array_equal(
        mask_after_eos(toks, 2), [[5, 9, 2, 2, 2], [1, 1, 1, 1, 1]])


def test_engine_tp_rejects_sampling(lm):
    from qdm_tpu.parallel.mesh import make_mesh

    eng = DecodeEngine(lm, mode="bf16", mesh=make_mesh(1, 2))
    ids = np.random.default_rng(3).integers(0, 256, (2, 7))
    with pytest.raises(NotImplementedError, match="sampling"):
        eng.generate(ids, max_new_tokens=4, temperature=0.5)


def test_engine_dp_sampling(lm):
    """Sampling on a dp-only mesh (tp=1: full vocab per shard; each
    data shard folds its axis index into the key).  Seed-deterministic
    and in-vocab; diverges from greedy at high temperature."""
    from qdm_tpu.parallel.mesh import make_mesh

    eng = DecodeEngine(lm, mode="bf16", mesh=make_mesh(4, 1))
    ids = np.random.default_rng(4).integers(0, 256, (4, 6))
    a = eng.generate(ids, max_new_tokens=8, temperature=3.0, seed=2)
    b = eng.generate(ids, max_new_tokens=8, temperature=3.0, seed=2)
    np.testing.assert_array_equal(a, b)
    assert ((a >= 0) & (a < lm.config.vocab_size)).all()
    greedy = eng.generate(ids, max_new_tokens=8)
    assert (a != greedy).any()


def test_engine_ragged_matches_per_prompt(lm):
    """Ragged serving (left-padded different-length prompts in one
    batch): every row's tokens must EQUAL a single-prompt generate of
    that row — per-row rope positions and pad-slot attention masks
    make the padding invisible (f32 CPU: bit-identical math)."""
    rng = np.random.default_rng(21)
    prompts = [rng.integers(0, 256, (n,)).astype(np.int32)
               for n in (3, 7, 5, 7)]
    eng = DecodeEngine(lm, mode="bf16")
    outs = eng.generate_ragged(prompts, max_new_tokens=8)
    assert len(outs) == 4
    for r, p in enumerate(prompts):
        single = eng.generate(p[None], max_new_tokens=8)[0]
        np.testing.assert_array_equal(outs[r], single, err_msg=f"row {r}")
    # quantized weights ride the same ragged path
    stats = DecodeEngine.calibrate_scales(lm, prompts[1][None])
    e8 = DecodeEngine(lm, mode="w8a8_static", act_stats=stats)
    outs8 = e8.generate_ragged(prompts, max_new_tokens=8)
    for r, p in enumerate(prompts):
        single = e8.generate(p[None], max_new_tokens=8)[0]
        np.testing.assert_array_equal(outs8[r], single,
                                      err_msg=f"w8a8 row {r}")
    # sampled ragged: deterministic per seed, finite
    s1 = eng.generate_ragged(prompts, max_new_tokens=8, temperature=2.0,
                             seed=3)
    s2 = eng.generate_ragged(prompts, max_new_tokens=8, temperature=2.0,
                             seed=3)
    for a, b in zip(s1, s2):
        np.testing.assert_array_equal(a, b)
    # per-request seeds: a row's sampled completion is reproducible
    # REGARDLESS of batch composition (each row's stream depends only
    # on its own key)
    pr = eng.generate_ragged(prompts, max_new_tokens=8, temperature=2.0,
                             per_row_seeds=[7, 8, 9, 10])
    solo = eng.generate_ragged([prompts[1]], max_new_tokens=8,
                               temperature=2.0, per_row_seeds=[8])
    np.testing.assert_array_equal(pr[1], solo[0])
    # same property on the fixed-length generate()
    ids4 = np.tile(prompts[1][None], (2, 1))
    g2 = eng.generate(ids4, max_new_tokens=8, temperature=2.0,
                      per_row_seeds=[8, 9])
    g1 = eng.generate(prompts[1][None], max_new_tokens=8, temperature=2.0,
                      per_row_seeds=[8])
    np.testing.assert_array_equal(g2[0], g1[0])
    with pytest.raises(NotImplementedError, match="channel"):
        DecodeEngine(lm, mode="bf16", kv_dtype=jnp.int8).generate_ragged(
            prompts, max_new_tokens=4)
    # ragged + EOS early exit: token-identical to the ragged scan +
    # pad-after-eos
    base = eng.generate_ragged(prompts, max_new_tokens=8)
    eosr = int(base[0][-5])
    w1 = eng.generate_ragged(prompts, max_new_tokens=8, eos_token_id=eosr)
    w2 = eng.generate_ragged(prompts, max_new_tokens=8, eos_token_id=eosr,
                             stop_early=True)
    for a, b in zip(w1, w2):
        np.testing.assert_array_equal(a, b)
    # channel-static int8 KV: per-row pad-masked scales equal the
    # single-prompt scales exactly -> same greedy exactness contract
    kc = DecodeEngine(lm, mode="bf16", kv_dtype=jnp.int8,
                      kv_scale_mode="channel")
    outc = kc.generate_ragged(prompts, max_new_tokens=8)
    for r, p in enumerate(prompts):
        single = kc.generate(p[None], max_new_tokens=8)[0]
        np.testing.assert_array_equal(outc[r], single,
                                      err_msg=f"kv8c row {r}")


def test_engine_ragged_dp_matches_single_device(lm):
    """Ragged serving over a dp mesh (batch, caches, lens and starts
    shard over 'data'): rows must be bit-identical to the single-device
    ragged engine, for bf16 AND channel-static int8 KV caches; tp>1
    stays guarded (the megakernels don't thread per-row start masks)."""
    from qdm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(33)
    prompts = [rng.integers(0, 256, (n,)).astype(np.int32)
               for n in (3, 7, 5, 7, 2, 6, 4, 5)]
    mesh_dp = make_mesh(8, 1)
    for kw in (dict(mode="bf16"),
               dict(mode="bf16", kv_dtype=jnp.int8,
                    kv_scale_mode="channel")):
        e1 = DecodeEngine(lm, **kw)
        edp = DecodeEngine(lm, mesh=mesh_dp, **kw)
        r1 = e1.generate_ragged(prompts, max_new_tokens=6)
        rdp = edp.generate_ragged(prompts, max_new_tokens=6)
        for r, (a, b) in enumerate(zip(r1, rdp)):
            np.testing.assert_array_equal(a, b, err_msg=f"row {r} {kw}")
    with pytest.raises(NotImplementedError, match="dp-only"):
        DecodeEngine(lm, mode="bf16", mesh=make_mesh(4, 2)).generate_ragged(
            prompts, max_new_tokens=4)


def test_engine_stop_early_matches_scan(lm):
    """The while_loop early-exit decode must return the same tokens as
    the fixed-length scan + pad-after-eos (rows that finish keep
    emitting EOS; rows that never finish run the full budget)."""
    ids = np.random.default_rng(17).integers(0, 256, (3, 6))
    eng = DecodeEngine(lm, mode="bf16")
    base = eng.generate(ids, max_new_tokens=10)
    # pick an eos that actually fires mid-stream for at least one row
    eos = int(base[0, ids.shape[1] + 3])
    want = eng.generate(ids, max_new_tokens=10, eos_token_id=eos)
    got = eng.generate(ids, max_new_tokens=10, eos_token_id=eos,
                       stop_early=True)
    np.testing.assert_array_equal(got, want)
    # an eos that never fires: early exit must not trigger
    never = int(np.setdiff1d(np.arange(256), base)[0])
    got2 = eng.generate(ids, max_new_tokens=10, eos_token_id=never,
                        stop_early=True)
    np.testing.assert_array_equal(got2, base)
    with pytest.raises(ValueError, match="eos"):
        eng.generate(ids, max_new_tokens=4, stop_early=True)


def test_engine_head_quant_needs_stats(lm):
    ids = RNG.integers(0, 256, (2, 5))
    stats = {k: v for k, v in
             DecodeEngine.calibrate_scales(lm, ids).items()
             if k != "lm_head"}
    with pytest.raises(ValueError, match="lm_head"):
        DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                     head_quant="int8")


# ------------------------------------------------- registry arch coverage


def _tiny_cfg(**kw):
    import dataclasses
    return dataclasses.replace(llama_lib.tiny_llama_config(), **kw)


@pytest.mark.parametrize("name,cfg_kw", [
    ("qwen2-style (attention bias)", dict(attention_bias=True)),
    ("stablelm-style (layernorm)", dict(norm_type="layernorm")),
    ("cohere-style (parallel residual + tied + logit scale)",
     dict(parallel_residual=True, tie_word_embeddings=True,
          logit_scale=0.0625)),
    ("all-features", dict(attention_bias=True, norm_type="layernorm",
                          parallel_residual=True)),
])
def test_engine_registry_archs_bf16_exact(name, cfg_kw):
    """bf16 engine == module greedy for every registry arch variant
    (qkv bias / layernorm / parallel residual / logit scale)."""
    lm = CausalLM.from_config(_tiny_cfg(**cfg_kw), dtype=jnp.float32,
                              seed=3)
    ids = RNG.integers(0, 256, (2, 6))
    ref = lm.generate(ids, max_new_tokens=10)
    eng = DecodeEngine(lm, mode="bf16")
    out = eng.generate(ids, max_new_tokens=10)
    np.testing.assert_array_equal(out, ref, err_msg=name)


def test_engine_registry_archs_w8a8(lm):
    """w8a8 engine runs on the bias/layernorm/parallel variants and
    mostly tracks the fp module tokens on a tiny model."""
    for kw in (dict(attention_bias=True),
               dict(norm_type="layernorm", parallel_residual=True)):
        lm2 = CausalLM.from_config(_tiny_cfg(**kw), dtype=jnp.float32,
                                   seed=4)
        ids = RNG.integers(0, 256, (2, 6))
        stats = DecodeEngine.calibrate_scales(lm2, ids)
        eng = DecodeEngine(lm2, mode="w8a8_static", act_stats=stats)
        out = eng.generate(ids, max_new_tokens=10)
        ref = lm2.generate(ids, max_new_tokens=10)
        assert out.shape == ref.shape
        assert np.isfinite(out).all()
        assert (out == ref).mean() > 0.5, kw


def test_engine_tp_registry_arch():
    """tp engine == single-device engine on the all-features arch."""
    from qdm_tpu.parallel.mesh import make_mesh

    lm2 = CausalLM.from_config(
        _tiny_cfg(attention_bias=True, norm_type="layernorm",
                  parallel_residual=True),
        dtype=jnp.float32, seed=5)
    ids = RNG.integers(0, 256, (4, 6))
    stats = DecodeEngine.calibrate_scales(lm2, ids)
    single = DecodeEngine(lm2, mode="w8a8_static", act_stats=stats)
    tp = DecodeEngine(lm2, mode="w8a8_static", act_stats=stats,
                      mesh=make_mesh(4, 2))
    a = single.generate(ids, max_new_tokens=8)
    b = tp.generate(ids, max_new_tokens=8)
    np.testing.assert_array_equal(a, b)


def test_engine_score_matches_module_logits(lm):
    """engine.score (teacher-forced megakernel logits) == module
    logits for bf16 — the eval path measures real engine numerics."""
    ids = RNG.integers(0, 256, (2, 9))
    ref = lm.logits(ids)
    out = DecodeEngine(lm, mode="bf16").score(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_continuous_batching_matches_per_prompt(lm):
    """ContinuousBatcher: more requests than batch rows — finished rows
    are refilled mid-serve (admit_row scatters the new prompt's K/V
    right-aligned to the shared append slot).  Every request's output
    must EQUAL its single-prompt generate (f32 CPU bit-exact), whatever
    batch composition it decoded in."""
    from qdm_tpu.api.batcher import ContinuousBatcher

    rng = np.random.default_rng(31)
    prompts = [rng.integers(0, 256, (n,)).astype(np.int32)
               for n in (3, 7, 5, 9, 4, 6, 8)]
    eng = DecodeEngine(lm, mode="bf16")
    cb = ContinuousBatcher(eng, max_batch=3, chunk=4, capacity=256)
    outs = cb.run(prompts, max_new_tokens=10)
    assert len(outs) == len(prompts)
    for i, prm in enumerate(prompts):
        single = eng.generate(prm[None], max_new_tokens=10)[0]
        np.testing.assert_array_equal(outs[i], single, err_msg=f"req {i}")


def test_continuous_batching_kv8c_and_eos(lm):
    """Admission with channel-static int8 KV (per-row scales replaced
    at admit time) + EOS retirement mid-stream.

    Quantized-KV rows assert high AGREEMENT rather than bit-equality:
    left-padding changes XLA reduction shapes by ulps and int8
    rounding can amplify one ulp into a code flip (measured: a 1.9e-8
    layer-1 scale difference between the padded and single prefills —
    generate_ragged itself shows the same flips on this seed; the bf16
    batcher test above owns the bit-exactness proof)."""
    from qdm_tpu.api.batcher import ContinuousBatcher

    rng = np.random.default_rng(32)
    prompts = [rng.integers(0, 256, (n,)).astype(np.int32)
               for n in (5, 3, 8, 6, 4)]
    stats = DecodeEngine.calibrate_scales(lm, prompts[2][None])
    eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                       kv_dtype=jnp.int8, kv_scale_mode="channel")
    singles = [eng.generate(p[None], max_new_tokens=10)[0] for p in prompts]
    cb = ContinuousBatcher(eng, max_batch=2, chunk=4, capacity=256)
    outs = cb.run(prompts, max_new_tokens=10)
    agree = hits = 0
    for i, prm in enumerate(prompts):
        assert outs[i].shape == singles[i].shape
        np.testing.assert_array_equal(outs[i][: len(prm)], prm,
                                      err_msg=f"prompt echo req {i}")
        agree += int((outs[i] == singles[i]).sum())
        hits += outs[i].size
    assert agree / hits > 0.85, f"kv8c agreement {agree}/{hits}"

    # int4 KV rides the same admission scatter (packed (B,C,d/2,T)
    # codes + per-row channel scales).  The 4-bit grid flips codes at
    # sub-ULP batch-shape shifts (test_engine_int4_kv_ragged's
    # documented sensitivity) and one flip cascades, so the contract
    # is per-row tracking, not bit-equality; no admission-specific
    # divergence (admitted rows track as well as initial rows —
    # measured per-row [.87, .62, .56, 1.0, .43] on this seed).
    e4 = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                      kv_dtype="int4")
    singles4 = [e4.generate(p[None], max_new_tokens=10)[0] for p in prompts]
    outs4 = ContinuousBatcher(e4, max_batch=2, chunk=4,
                              capacity=256).run(prompts, max_new_tokens=10)
    per_row = []
    for i in range(len(prompts)):
        assert outs4[i].shape == singles4[i].shape
        np.testing.assert_array_equal(outs4[i][: len(prompts[i])],
                                      prompts[i])
        per_row.append(float((outs4[i] == singles4[i]).mean()))
    assert min(per_row) > 0.35 and np.mean(per_row) > 0.55, per_row

    from qdm_tpu.api.serve import recommended_kv
    assert recommended_kv(1024) == (None, "token")
    assert recommended_kv(4096) == ("int4", "channel")
    # sliding-window models operate at min(ctx, window) (r3s)
    assert recommended_kv(4096, sliding_window=1024) == (None, "token")

    # EOS retirement + refill, deterministic on the bf16 engine: pick a
    # token that appears mid-way in request 0's greedy continuation
    ebf = DecodeEngine(lm, mode="bf16")
    singles = [ebf.generate(p[None], max_new_tokens=10)[0] for p in prompts]
    gen0 = singles[0][len(prompts[0]):]
    eos = int(gen0[4])
    cb = ContinuousBatcher(ebf, max_batch=2, chunk=4, capacity=256)
    outs_eos = cb.run(prompts, max_new_tokens=10, eos_token_id=eos)
    cut = np.where(gen0 == eos)[0][0]
    np.testing.assert_array_equal(
        outs_eos[0], np.concatenate([prompts[0], gen0[: cut + 1]]))
    # rows that never emit EOS keep the budget-length output
    for i in range(1, len(prompts)):
        geni = singles[i][len(prompts[i]):]
        if eos not in geni:
            np.testing.assert_array_equal(outs_eos[i], singles[i],
                                          err_msg=f"eos req {i}")


def test_kv_flash_long_ctx_matches_refs():
    """T-blocked flash decode attention (long-context variant; the
    single-pass kernels bust VMEM past ~3 MB cache blocks — measured
    OOM at ctx 4096 x batch 16, r3l).  All four cache formats, plain
    and ragged starts, interpret mode vs the single-pass references."""
    rng = np.random.default_rng(5)
    b, hkv, g, d, t = 4, 2, 4, 64, 512
    bt = 128                                     # force several T blocks
    q = jnp.asarray(rng.standard_normal((b, hkv, g, d)) * 0.5, jnp.float32)
    kv = jnp.asarray(rng.standard_normal((b, 2 * hkv, d, t)) * 0.5,
                     jnp.float32)
    pos = 300                                    # blocks beyond pos all-masked
    starts = jnp.asarray([0, 5, 140, 260], jnp.int32)  # incl. start >= bt

    for st in (None, starts):
        out = dk.decode_attention_kv_flash_pallas(
            q, kv, pos, st, mode="bf16", block_t=bt, interpret=True)
        ref = dk.decode_attention_kv_pallas(q, kv, pos, st, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"bf16 ragged={st is not None}")

    # int8/int4 modes quantize p PER BLOCK (the single-pass kernels
    # quantize the normalized p once), so flash differs from them by
    # quantization-noise structure, not math: assert flash is at least
    # as close to the EXACT (quantization-free) reference
    def err(x, ref):
        return float(np.mean(np.abs(np.asarray(x) - np.asarray(ref))))

    codes = jnp.clip(jnp.round(kv * 20), -127, 127).astype(jnp.int8)
    for st in (None, starts):
        exact = dk.decode_attention_kv_i8c_ref(q, codes, pos, starts=st)
        out = dk.decode_attention_kv_flash_pallas(
            q, codes, pos, st, mode="i8c", block_t=bt, interpret=True)
        sp = dk.decode_attention_kv_i8c_pallas(q, codes, pos, st,
                                               interpret=True)
        assert err(out, exact) <= err(sp, exact) * 1.1, \
            f"i8c ragged={st is not None}"

    codes4 = jnp.clip(jnp.round(kv * 3), -7, 7).astype(jnp.int32)
    packed = dk.pack_kv_int4(codes4)
    for st in (None, starts):
        exact = dk.decode_attention_kv_i4c_ref(q, packed, pos, starts=st)
        out = dk.decode_attention_kv_flash_pallas(
            q, packed, pos, st, mode="i4c", block_t=bt, interpret=True)
        sp = dk.decode_attention_kv_i4c_pallas(q, packed, pos, st,
                                               interpret=True)
        assert err(out, exact) <= err(sp, exact) * 1.1, \
            f"i4c ragged={st is not None}"

    kvs = jnp.asarray(
        np.abs(rng.standard_normal((b, 2 * hkv, 1, t))) * 0.01 + 0.005,
        jnp.float32)
    exact = dk.decode_attention_dm_i8_ref(
        q, codes[:, :hkv], kvs[:, :hkv], codes[:, hkv:], kvs[:, hkv:], pos)
    out = dk.decode_attention_kv_flash_pallas(
        q, codes, pos, kv_scale=kvs, mode="i8", block_t=bt, interpret=True)
    sp = dk.decode_attention_kv_i8_pallas(q, codes, kvs, pos,
                                          interpret=True)
    # (this ref mimics the kernel's own q/p quantization bit-for-bit,
    # so the single-pass error is ~0; allow flash its per-block p-quant
    # noise, bounded relative to the output scale)
    assert err(out, exact) <= max(
        err(sp, exact) * 1.1,
        1e-2 * float(np.abs(np.asarray(exact)).mean())), "i8 per-token"

    # block_b > 1 and bp > b padding
    qp = jnp.pad(q, ((0, 4), (0, 0), (0, 0), (0, 0)))
    out = dk.decode_attention_kv_flash_pallas(
        qp, kv, pos, mode="bf16", block_b=2, block_t=bt, interpret=True)
    ref = dk.decode_attention_kv_pallas(qp, kv, pos, block_b=2,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out)[:b], np.asarray(ref)[:b],
                               rtol=2e-5, atol=2e-5, err_msg="block_b=2")


def test_continuous_batching_sampled_per_request(lm):
    """Sampled continuous batching: each request draws from its OWN key
    folding its OWN step counter, so a request's completion equals its
    single-prompt generate_ragged run with per_row_seeds — whatever
    batch it decoded in, including rows admitted mid-serve."""
    from qdm_tpu.api.batcher import ContinuousBatcher

    rng = np.random.default_rng(41)
    prompts = [rng.integers(0, 256, (n,)).astype(np.int32)
               for n in (4, 6, 3, 7, 5)]
    seeds = [11, 22, 33, 44, 55]
    eng = DecodeEngine(lm, mode="bf16")
    singles = [eng.generate_ragged([p], max_new_tokens=9, temperature=1.5,
                                   top_k=20, per_row_seeds=[s])[0]
               for p, s in zip(prompts, seeds)]
    cb = ContinuousBatcher(eng, max_batch=2, chunk=3, capacity=256)
    outs = cb.run(prompts, max_new_tokens=9, temperature=1.5, top_k=20,
                  per_request_seeds=seeds)
    for i in range(len(prompts)):
        np.testing.assert_array_equal(outs[i], singles[i],
                                      err_msg=f"sampled req {i}")


def test_continuous_batching_rebase(lm):
    """Bounded-cache serving: a capacity too small for the whole
    stream forces mid-serve rebases (live windows shifted to the cache
    start); greedy outputs stay bit-identical to single-prompt runs."""
    from qdm_tpu.api.batcher import ContinuousBatcher

    rng = np.random.default_rng(51)
    prompts = [rng.integers(0, 256, (n,)).astype(np.int32)
               for n in (6, 4, 7, 3, 5, 8)]
    eng = DecodeEngine(lm, mode="bf16")
    # capacity 192 with a 128-padded prompt width: the append slot
    # passes 192 mid-stream (6 requests x 12 tokens on 2 rows), so the
    # run MUST rebase to finish (the capacity assert fires otherwise)
    cb = ContinuousBatcher(eng, max_batch=2, chunk=4, capacity=192)
    outs = cb.run(prompts, max_new_tokens=12)
    for i, prm in enumerate(prompts):
        single = eng.generate(prm[None], max_new_tokens=12)[0]
        np.testing.assert_array_equal(outs[i], single,
                                      err_msg=f"rebase req {i}")

    # quantized KV through the same rebase (channel scales T-free,
    # codes shift)
    stats = DecodeEngine.calibrate_scales(lm, prompts[0][None])
    e8 = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                      kv_dtype=jnp.int8, kv_scale_mode="channel")
    outs8 = ContinuousBatcher(e8, max_batch=2, chunk=4,
                              capacity=192).run(prompts, max_new_tokens=12)
    assert all(len(o) == len(p) + 12 for o, p in zip(outs8, prompts))


# ------------------------------------------------------------- prefix caching


def test_prefix_cache_greedy_exact(lm):
    """Shared-prefix serving is a pure re-use of the causal math: the
    generated continuation with a precomputed prefix KV must equal the
    full [prefix|suffix] prefill's, bit-for-bit (f32 CPU)."""
    prefix = RNG.integers(0, 256, (11,))
    sufs = RNG.integers(0, 256, (3, 6))
    eng = DecodeEngine(lm, mode="bf16")
    pc = eng.precompute_prefix(prefix)
    assert pc[0] == 11
    got = eng.generate(sufs, max_new_tokens=10, prefix=pc)
    full = eng.generate(
        np.concatenate([np.tile(prefix[None], (3, 1)), sufs], axis=1),
        max_new_tokens=10)
    np.testing.assert_array_equal(got[:, 6:], full[:, 17:])


@pytest.mark.parametrize("kv", [("kv8c", jnp.int8, "channel"),
                                ("kv4", "int4", "channel")])
def test_prefix_cache_quantized_kv(lm, kv):
    """Prefix reuse composes with the quantized KV cache: the prefix
    KV is kept raw and quantized together with the suffix, so scales
    and codes match the full-prefill path exactly."""
    _, kv_dtype, mode = kv
    prefix = RNG.integers(0, 256, (9,))
    sufs = RNG.integers(0, 256, (2, 5))
    ids = RNG.integers(0, 256, (4, 7))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                       kv_dtype=kv_dtype, kv_scale_mode=mode)
    pc = eng.precompute_prefix(prefix)
    got = eng.generate(sufs, max_new_tokens=8, prefix=pc)
    full = eng.generate(
        np.concatenate([np.tile(prefix[None], (2, 1)), sufs], axis=1),
        max_new_tokens=8)
    np.testing.assert_array_equal(got[:, 5:], full[:, 14:])


def test_prefix_cache_sampled(lm):
    """Sampling picks the first token from the prefixed prefill's
    last-position logits; seed-deterministic and equal to the full
    prefill's sampled run."""
    prefix = RNG.integers(0, 256, (8,))
    sufs = RNG.integers(0, 256, (2, 4))
    eng = DecodeEngine(lm, mode="bf16")
    pc = eng.precompute_prefix(prefix)
    a = eng.generate(sufs, max_new_tokens=6, temperature=0.7, top_k=8,
                     seed=3, prefix=pc)
    b = eng.generate(
        np.concatenate([np.tile(prefix[None], (2, 1)), sufs], axis=1),
        max_new_tokens=6, temperature=0.7, top_k=8, seed=3)
    np.testing.assert_array_equal(a[:, 4:], b[:, 12:])


def test_continuous_batching_prefix(lm):
    """Prefix-cached continuous batching: every request decodes on a
    pasted copy of the shared prefix KV; greedy rows stay bit-identical
    to a single-prompt generate of [prefix|suffix] (f32 CPU)."""
    from qdm_tpu.api.batcher import ContinuousBatcher

    prefix = RNG.integers(0, 256, (10,))
    sufs = [RNG.integers(0, 256, (n,)) for n in (5, 3, 7, 4, 6)]
    eng = DecodeEngine(lm, mode="bf16")
    outs = ContinuousBatcher(eng, max_batch=2, chunk=4, capacity=256).run(
        sufs, max_new_tokens=9, prefix=prefix)
    for o, sfx in zip(outs, sufs):
        np.testing.assert_array_equal(o[:len(sfx)], sfx)
        full = eng.generate(np.concatenate([prefix, sfx])[None],
                            max_new_tokens=9)
        np.testing.assert_array_equal(o[len(sfx):],
                                      full[0, len(prefix) + len(sfx):])


def test_continuous_batching_prefix_rebase_exact(lm):
    """Prefix admissions compose with cache rebasing: capacity sized
    to force at least one rebase mid-stream (shifting pasted prefix
    windows with everything else); bf16 rows stay bit-identical to
    single-prompt [prefix|suffix] runs — the exactness proof for the
    prefix+rebase composition."""
    from qdm_tpu.api.batcher import ContinuousBatcher

    prefix = RNG.integers(0, 256, (9,))
    sufs = [RNG.integers(0, 256, (n,)) for n in (4, 6, 3, 5, 4, 6)]
    eng = DecodeEngine(lm, mode="bf16")
    outs = ContinuousBatcher(eng, max_batch=2, chunk=4, capacity=160).run(
        sufs, max_new_tokens=10, prefix=prefix)
    for o, sfx in zip(outs, sufs):
        full = eng.generate(np.concatenate([prefix, sfx])[None],
                            max_new_tokens=10)
        np.testing.assert_array_equal(o[len(sfx):],
                                      full[0, len(prefix) + len(sfx):])


def test_continuous_batching_prefix_quantized_kv_agreement(lm):
    """Prefix admissions with the quantized KV caches.  The prefixed
    mini-prefill reduces over a different softmax width than the
    single-prompt prefill, so sub-ULP differences flip codes at
    rounding boundaries and one flip cascades through greedy decode
    (the same documented sensitivity as
    test_continuous_batching_kv8c_and_eos — bit-level check: admitted
    prefix-region codes ARE exactly equal to prefill_prefixed's, and
    scales agree to ~1e-7 relative; only suffix codes flip by +/-1
    step).  Contract: per-row tracking/agreement on generated tokens;
    the bf16 tests above own the bit-exactness proof."""
    from qdm_tpu.api.batcher import ContinuousBatcher

    rng = np.random.default_rng(1234)   # local: agreement thresholds
    # must not depend on the shared module RNG's (order-dependent) state
    prefix = rng.integers(0, 256, (9,))
    sufs = [rng.integers(0, 256, (n,)) for n in (4, 6, 3, 5, 4, 6)]
    ids = rng.integers(0, 256, (4, 7))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    for kv_dtype, floor in ((jnp.int8, 0.5), ("int4", 0.2)):
        eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                           kv_dtype=kv_dtype, kv_scale_mode="channel")
        outs = ContinuousBatcher(eng, max_batch=2, chunk=4,
                                 capacity=192).run(
            sufs, max_new_tokens=10, prefix=prefix)
        agree = hits = 0
        for o, sfx in zip(outs, sufs):
            np.testing.assert_array_equal(o[: len(sfx)], sfx)
            assert len(o) == len(sfx) + 10
            full = eng.generate(np.concatenate([prefix, sfx])[None],
                                max_new_tokens=10)
            agree += int((o[len(sfx):]
                          == full[0, len(prefix) + len(sfx):]).sum())
            hits += 10
        # measured on this seed: int8 ~0.83, int4 ~0.35 (gen-only —
        # the int4 grid cascades from the first flip)
        assert agree / hits > floor, \
            f"{kv_dtype} prefix agreement {agree}/{hits}"


def test_generate_ragged_prefix(lm):
    """generate_ragged(prefix=): a ragged batch on a shared prefix —
    every row bit-identical to its single-prompt [prefix|suffix]
    generate (f32 CPU, bf16 engine)."""
    prefix = RNG.integers(0, 256, (12,))
    sufs = [RNG.integers(0, 256, (n,)) for n in (5, 3, 7)]
    eng = DecodeEngine(lm, mode="bf16")
    pc = eng.precompute_prefix(prefix)
    outs = eng.generate_ragged(sufs, max_new_tokens=9, prefix=pc)
    for o, sfx in zip(outs, sufs):
        np.testing.assert_array_equal(o[: len(sfx)], sfx)
        full = eng.generate(np.concatenate([prefix, sfx])[None],
                            max_new_tokens=9)
        np.testing.assert_array_equal(o[len(sfx):],
                                      full[0, len(prefix) + len(sfx):])


def test_prefill_chunked_exact(lm):
    """Chunked prefill is the same causal math in C-token slices:
    greedy generation after a chunked prefill equals the square
    prefill's, bit-for-bit (f32 CPU), including a prompt length that
    is not a chunk multiple (the last real token sits mid-chunk)."""
    for n_tok in (8, 11):
        ids = RNG.integers(0, 256, (3, n_tok))
        eng = DecodeEngine(lm, mode="bf16")
        ref = eng.generate(ids, max_new_tokens=10)
        got = eng.generate(ids, max_new_tokens=10, prefill_chunk=4)
        np.testing.assert_array_equal(got, ref)


def test_prefill_chunked_quantized_kv(lm):
    """Chunked prefill composes with the quantized KV caches: the
    pad-tail garbage is masked out of the channel scales, so scales
    and codes match the square prefill's on the valid region."""
    rng = np.random.default_rng(77)    # local (see agreement note above)
    ids = rng.integers(0, 256, (2, 9))
    cal = rng.integers(0, 256, (4, 7))
    stats = DecodeEngine.calibrate_scales(lm, cal)
    for kv in (jnp.int8, "int4"):
        eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                           kv_dtype=kv, kv_scale_mode="channel")
        ref = eng.generate(ids, max_new_tokens=8)
        got = eng.generate(ids, max_new_tokens=8, prefill_chunk=4)
        assert got.shape == ref.shape
        # program-shape ULP sensitivity (documented for the quantized
        # grids) — require strong agreement rather than bit-equality
        assert (got == ref).mean() > 0.75, (kv, (got == ref).mean())


def test_continuous_batching_interleaved_admissions(lm):
    """admit_chunk > 0 interleaves the admission mini-prefill with
    decode chunks (bounded per-chunk stall).  Same math, different
    schedule: greedy bf16 outputs stay bit-identical to single-prompt
    generates, with and without a shared prefix."""
    from qdm_tpu.api.batcher import ContinuousBatcher

    prompts = [RNG.integers(0, 256, (n,)) for n in (5, 3, 8, 6, 4)]
    eng = DecodeEngine(lm, mode="bf16")
    cb = ContinuousBatcher(eng, max_batch=2, chunk=4, capacity=256,
                           admit_chunk=64)
    outs = cb.run(prompts, max_new_tokens=10)
    for o, pr in zip(outs, prompts):
        full = eng.generate(pr[None], max_new_tokens=10)
        np.testing.assert_array_equal(o, full[0])
    assert cb.last_stats["p95_ttft"] is not None

    prefix = RNG.integers(0, 256, (9,))
    sufs = [RNG.integers(0, 256, (n,)) for n in (4, 6, 3)]
    cb2 = ContinuousBatcher(eng, max_batch=2, chunk=4, capacity=256,
                            admit_chunk=64)
    outs2 = cb2.run(sufs, max_new_tokens=8, prefix=prefix)
    for o, sfx in zip(outs2, sufs):
        full = eng.generate(np.concatenate([prefix, sfx])[None],
                            max_new_tokens=8)
        np.testing.assert_array_equal(o[len(sfx):],
                                      full[0, len(prefix) + len(sfx):])


def test_continuous_batching_interleaved_kv8c_smoke(lm):
    """Interleaved admissions compose with the channel-static int8 KV
    cache (admission_finalize quantizes prefix+suffix valid slots)."""
    from qdm_tpu.api.batcher import ContinuousBatcher

    rng = np.random.default_rng(9)
    prefix = rng.integers(0, 256, (9,))
    sufs = [rng.integers(0, 256, (n,)) for n in (4, 6, 3, 5)]
    stats = DecodeEngine.calibrate_scales(lm, rng.integers(0, 256, (4, 7)))
    eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                       kv_dtype=jnp.int8, kv_scale_mode="channel")
    cb = ContinuousBatcher(eng, max_batch=2, chunk=4, capacity=256,
                           admit_chunk=64)
    outs = cb.run(sufs, max_new_tokens=8, prefix=prefix)
    assert all(len(o) == len(s) + 8 for o, s in zip(outs, sufs))
    assert all(np.isfinite(o).all() for o in outs)


# --------------------------------------------------------------- engine gptq


def test_engine_gptq_identity_gram_is_rtn(lm):
    """With an identity Hessian the GPTQ recursion never propagates
    error (U is diagonal), so engine codes/scales/tokens must equal the
    plain RTN engine BIT-EXACTLY — the grid-compatibility contract of
    DecodeEngine(gptq_grams=...)."""
    ids = RNG.integers(0, 256, (2, 7))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    grams = DecodeEngine.gptq_grams(lm, ids)
    id_grams = {k: jnp.eye(v.shape[0], dtype=jnp.float32)
                for k, v in grams.items()}
    for mode in ("w8a8_static", "w4a8_static"):
        e_rtn = DecodeEngine(lm, mode=mode, act_stats=stats)
        e_id = DecodeEngine(lm, mode=mode, act_stats=stats,
                            gptq_grams=id_grams)
        for a, b in zip(e_rtn.layers, e_id.layers):
            for k in ("w_qkv", "w_o", "wg", "wu", "wd"):
                assert jnp.array_equal(a[k], b[k]), (mode, k)
            for k in ("s_qkv", "s_o", "sg", "su", "sd"):
                # scales agree to the last ULP only (XLA fuses the /127
                # differently inside the jitted GPTQ scan)
                np.testing.assert_allclose(np.asarray(a[k]),
                                           np.asarray(b[k]), rtol=1e-6)
        t_rtn = np.asarray(e_rtn.generate(ids[:1, :5], max_new_tokens=6))
        t_id = np.asarray(e_id.generate(ids[:1, :5], max_new_tokens=6))
        np.testing.assert_array_equal(t_rtn, t_id)


def test_engine_gptq_real_grams_serve(lm):
    """Real captured Hessians: the engine serves (generate + score
    finite), codes differ from RTN somewhere (the compensation actually
    moved placements), and ragged batching still works."""
    ids = RNG.integers(0, 256, (2, 16))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    grams = DecodeEngine.gptq_grams(lm, ids)
    assert "layers_0/mlp/down_proj" in grams
    e_rtn = DecodeEngine(lm, mode="w4a8_static", act_stats=stats)
    e_g = DecodeEngine(lm, mode="w4a8_static", act_stats=stats,
                       gptq_grams=grams)
    assert any(not jnp.array_equal(a["wd"], b["wd"])
               for a, b in zip(e_rtn.layers, e_g.layers))
    out = e_g.generate(ids[:, :6], max_new_tokens=6)
    assert out.shape == (2, 12)
    lg = np.asarray(e_g.score(jnp.asarray(ids)))
    assert np.isfinite(lg).all()
    ragged = e_g.generate_ragged([list(ids[0, :4]), list(ids[1, :9])],
                                 max_new_tokens=4)
    assert len(ragged) == 2


def test_engine_gptq_improves_outlier_quality():
    """On the outlier-injected model the composed smooth+gptq engine
    must beat plain RTN codes on teacher-forced logits error — the
    quality lever the integration exists for (quality-table rows)."""
    from qdm_tpu.utils.outliers import inject_norm_outliers

    def fresh():
        m = CausalLM.from_config(llama_lib.tiny_llama_config(),
                                 dtype=jnp.float32, seed=0)
        m.params = inject_norm_outliers(m.params, seed=11)
        return m

    ids = RNG.integers(0, 256, (4, 32))
    ref = fresh()
    ref_logits = np.asarray(ref.logits(jnp.asarray(ids)))

    e_rtn = DecodeEngine(ref, mode="w4a8_static",
                         act_stats=DecodeEngine.calibrate_scales(ref, ids))
    sm = fresh()
    DecodeEngine.smooth_lm(sm, ids)
    e_sg = DecodeEngine(sm, mode="w4a8_static",
                        act_stats=DecodeEngine.calibrate_scales(sm, ids),
                        gptq_grams=DecodeEngine.gptq_grams(sm, ids))
    err_rtn = float(np.abs(np.asarray(e_rtn.score(jnp.asarray(ids)))
                           - ref_logits).mean())
    err_sg = float(np.abs(np.asarray(e_sg.score(jnp.asarray(ids)))
                          - ref_logits).mean())
    assert np.isfinite(err_sg)
    assert err_sg < err_rtn, (err_sg, err_rtn)


def test_engine_gptq_bf16_guarded(lm):
    with pytest.raises(ValueError):
        DecodeEngine(lm, mode="bf16", gptq_grams={"x": jnp.eye(4)})


def test_serve_entry_gptq():
    """CausalLM.serve(gptq=True[, smooth=True]) one-call entry."""
    lm = CausalLM.from_config(llama_lib.tiny_llama_config(),
                              dtype=jnp.float32, seed=0)
    ids = RNG.integers(0, 256, (2, 16))
    eng = lm.serve(calib_ids=ids, mode="w4a8_static", smooth=True,
                   gptq=True)
    out = eng.generate(ids[:1, :6], max_new_tokens=4)
    assert out.shape == (1, 10)


# ------------------------------------------------- w4a8 on non-canonical archs


ARCH_KW = {
    "qwen2_bias": dict(attention_bias=True),
    "stablelm_layernorm": dict(norm_type="layernorm"),
    "cohere_parallel": dict(norm_type="layernorm", parallel_residual=True,
                            tie_word_embeddings=True, logit_scale=0.0625),
    "qwen3_qknorm": dict(qk_norm=True),
}


@pytest.mark.parametrize("arch", sorted(ARCH_KW))
def test_engine_w4a8_noncanonical_archs(arch):
    """w4a8 (the measured serve winner) on bias/layernorm/parallel/
    qk-norm models: the i4 kernels carry no bias/layernorm epilogues,
    so those pieces run XLA-side (prologue _xla_norm, post-kernel bias
    add pre-rotation, shared-norm parallel residual).  Greedy tokens
    mostly survive int4 on the tiny model, and ragged batching works."""
    import dataclasses as _dc

    cfg = _dc.replace(llama_lib.tiny_llama_config(), **ARCH_KW[arch])
    m = CausalLM.from_config(cfg, dtype=jnp.float32, seed=5)
    ids = RNG.integers(0, 256, (2, 16))
    stats = DecodeEngine.calibrate_scales(m, ids)
    eng = DecodeEngine(m, mode="w4a8_static", act_stats=stats)
    out = np.asarray(eng.generate(ids[:, :6], max_new_tokens=8))
    ref = np.asarray(m.generate(ids[:, :6], max_new_tokens=8))
    assert out.shape == ref.shape
    assert (out == ref).mean() > 0.4
    ragged = eng.generate_ragged([list(ids[0, :4]), list(ids[1, :9])],
                                 max_new_tokens=4)
    assert len(ragged) == 2


def test_engine_w4a8_bias_path_is_exact_at_zero_bias():
    """The XLA bias-add + XLA rope restructure must be BIT-equal to
    the in-kernel-rope path when the biases are zero (same weights):
    proves the reordering (proj -> +bias -> rope) introduces no
    numeric drift beyond the bias itself."""
    import dataclasses as _dc

    cfg_b = _dc.replace(llama_lib.tiny_llama_config(), attention_bias=True)
    cfg_p = llama_lib.tiny_llama_config()
    lm_b = CausalLM.from_config(cfg_b, dtype=jnp.float32, seed=7)
    for l in range(cfg_b.num_hidden_layers):
        at = lm_b.params[f"layers_{l}"]["self_attn"]
        for p in ("q_proj", "k_proj", "v_proj"):
            at[p]["bias"] = jnp.zeros_like(at[p]["bias"])
    lm_p = CausalLM.from_config(cfg_p, dtype=jnp.float32, seed=7)
    for l in range(cfg_b.num_hidden_layers):
        a = lm_b.params[f"layers_{l}"]["self_attn"]
        b = lm_p.params[f"layers_{l}"]["self_attn"]
        for p in ("q_proj", "k_proj", "v_proj", "o_proj"):
            b[p]["kernel"] = a[p]["kernel"]
    ids = RNG.integers(0, 256, (2, 16))
    s_b = DecodeEngine.calibrate_scales(lm_b, ids)
    s_p = DecodeEngine.calibrate_scales(lm_p, ids)
    t_b = DecodeEngine(lm_b, mode="w4a8_static", act_stats=s_b).generate(
        ids[:1, :6], max_new_tokens=8)
    t_p = DecodeEngine(lm_p, mode="w4a8_static", act_stats=s_p).generate(
        ids[:1, :6], max_new_tokens=8)
    np.testing.assert_array_equal(np.asarray(t_b), np.asarray(t_p))


def test_engine_w4a8_phi_class():
    """phi-class (ungated MLP + all-bias + parallel residual +
    layernorm) serves at w4a8 too: two i4 dense kernels with XLA
    bias/act glue for the MLP, biases on o_proj in XLA."""
    import dataclasses as _dc

    cfg = _dc.replace(llama_lib.tiny_llama_config(), mlp_gated=False,
                      all_bias=True, attention_bias=True,
                      norm_type="layernorm", parallel_residual=True,
                      partial_rotary_factor=0.5)
    m = CausalLM.from_config(cfg, dtype=jnp.float32, seed=5)
    ids = RNG.integers(0, 256, (2, 16))
    stats = DecodeEngine.calibrate_scales(m, ids)
    eng = DecodeEngine(m, mode="w4a8_static", act_stats=stats)
    out = np.asarray(eng.generate(ids[:, :6], max_new_tokens=8))
    ref = np.asarray(m.generate(ids[:, :6], max_new_tokens=8))
    assert out.shape == ref.shape
    assert (out == ref).mean() > 0.4


def test_gptq_grams_chunked_capture_is_exact(lm):
    """Chunked Gram capture (the 7B-scale memory path: each forward
    returns a key subset, XLA DCEs the rest) must reproduce the
    one-shot Grams and stats bit-exactly."""
    ids = RNG.integers(0, 256, (2, 32))
    s1, g1 = DecodeEngine.calibrate_with_grams(lm, ids)
    s2, g2 = DecodeEngine.calibrate_with_grams(lm, ids, gram_chunk=3)
    assert sorted(g1) == sorted(g2)
    for k in g1:
        assert jnp.array_equal(g1[k], g2[k]), k
    for k in s1:
        assert jnp.array_equal(s1[k], s2[k]), k


def test_fused_prefill_matches_dynamic_module_path(lm):
    """prefill_quant='fused' (engine-native fused-block prefill:
    in-kernel per-token act quant, fused [q|k|v]/[up|gate] projections,
    GQA flash attention) produces the same greedy tokens as the
    dynamic-int8 module prefill on f32 CPU — the concat projections
    share the per-token input scale, so the math is identical up to op
    order.  Unaligned prompts fall back to the module prefill."""
    ids = np.random.default_rng(9).integers(
        0, lm.config.vocab_size, (2, 256)).astype(np.int32)
    stats = DecodeEngine.calibrate_scales(lm, ids[:, :32])
    e_dyn = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                         prefill_quant="dynamic")
    e_fus = DecodeEngine(lm, mode="w8a8_static", act_stats=stats,
                         prefill_quant="fused")
    t1 = e_dyn.generate(ids, max_new_tokens=6)
    t2 = e_fus.generate(ids, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    # unaligned prompt: falls back to the snapshot module prefill
    t3 = e_fus.generate(ids[:, :100], max_new_tokens=4)
    assert t3.shape == (2, 104)
    # non-canonical configs refuse the fused path with guidance
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_gemma2 import tiny_gemma2_config
    from qdm_tpu.api.causal_lm import CausalLM

    g2 = CausalLM.from_config(tiny_gemma2_config(), dtype=jnp.float32,
                              seed=0)
    with pytest.raises(NotImplementedError, match="canonical"):
        DecodeEngine(g2, mode="w8a8_static",
                     act_stats=DecodeEngine.calibrate_scales(g2, ids[:, :16]),
                     prefill_quant="fused")


def test_engine_bf16_batch1_xla_variant_matches_module():
    """Batch-1 bf16 decode routes through the pure-XLA layer variant
    (_layer_xla_b1 — the r5 fix for the measured 0.88x per-launch
    overhead at B=1); greedy tokens must equal CausalLM.generate, and
    the variant must actually engage (and not at batch 2)."""
    import numpy as np
    import jax.numpy as jnp

    from qdm_tpu.api.causal_lm import CausalLM
    from qdm_tpu.api.serve import DecodeEngine
    from qdm_tpu.models import llama as llama_lib

    lm = CausalLM.from_config(llama_lib.tiny_llama_config(),
                              dtype=jnp.float32, seed=61)
    eng = DecodeEngine(lm, mode="bf16")
    assert eng._xla_ok_b1(1) and not eng._xla_ok_b1(2)
    rng = np.random.default_rng(3)
    for b in (1, 2):
        ids = rng.integers(0, 256, (b, 6))
        want = np.asarray(lm.generate(ids, max_new_tokens=6))
        got = np.asarray(eng.generate(ids, max_new_tokens=6))
        np.testing.assert_array_equal(got[:, 6:], want[:, 6:])
    # stop_early path takes the same variant
    g = np.asarray(eng.generate(rng.integers(0, 256, (1, 6)),
                                max_new_tokens=6))
    eos = int(g[0, 6])
    e = np.asarray(eng.generate(g[:, :6], max_new_tokens=6,
                                eos_token_id=eos, stop_early=True))
    assert (e[0, 6] == eos)


def test_continuous_batching_admit_batch_and_deferral(lm):
    """admit_batch caps the admission mini-prefill at a fixed small
    row count and admit_min_free coalesces waves (the r5 fix for
    variable-budget streams where full-width admissions dominated) —
    per-request outputs must stay bit-equal to single-prompt
    generates, with variable budgets forcing mid-stream waves."""
    from qdm_tpu.api.batcher import ContinuousBatcher

    rng = np.random.default_rng(37)
    prompts = [rng.integers(0, 256, (n,)).astype(np.int32)
               for n in (3, 7, 5, 9, 4, 6, 8, 5, 7)]
    budgets = [4, 9, 3, 7, 5, 8, 4, 6, 5]
    eng = DecodeEngine(lm, mode="bf16")
    for kw in (dict(admit_batch=2, admit_min_free=2),
               dict(admit_batch=1),
               dict(admit_batch=2, admit_min_free=2, admit_chunk=4)):
        cb = ContinuousBatcher(eng, max_batch=3, chunk=4, capacity=256,
                               **kw)
        outs = cb.run(prompts, max_new_tokens=budgets)
        for i, prm in enumerate(prompts):
            single = eng.generate(prm[None], max_new_tokens=budgets[i])[0]
            np.testing.assert_array_equal(outs[i], single,
                                          err_msg=f"req {i} {kw}")
