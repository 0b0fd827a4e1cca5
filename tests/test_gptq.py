"""GPTQ (quant/gptq.py): Hessian-aware error-compensated quantization.
Beyond-reference extension — grids match the repo's RTN/AWQ grids, so
the canonical checks are (a) outputs land on the per-(row, group)
integer grid and (b) GPTQ beats plain RTN on the calibration
objective ||X W_dq - X W||_F whenever inputs are correlated (the
whole point of the inverse-Hessian update)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.models import llama as llama_lib
from qdm_tpu.quant import pseudo
from qdm_tpu.quant.gptq import gptq_quantize_kernel

RNG = np.random.default_rng(29)


def _correlated_inputs(t, k, rho=0.95):
    """AR(1)-correlated channels: the regime where error compensation
    pays (independent channels make GPTQ collapse to RTN)."""
    base = RNG.standard_normal((t, k)).astype(np.float32)
    for j in range(1, k):
        base[:, j] = rho * base[:, j - 1] + np.sqrt(1 - rho**2) * base[:, j]
    return base


def _loss(x, w_ref, w_q):
    return float(np.linalg.norm(x @ np.asarray(w_q) - x @ np.asarray(w_ref)))


@pytest.mark.parametrize("zero_point", [True, False])
def test_gptq_beats_rtn_on_correlated_inputs(zero_point):
    k, n, g = 64, 48, 16
    w = RNG.standard_normal((k, n)).astype(np.float32) * 0.1
    x = _correlated_inputs(256, k)
    wq_gptq = gptq_quantize_kernel(jnp.asarray(w), jnp.asarray(x), n_bits=4,
                                   group_size=g, zero_point=zero_point)
    wq_rtn, _, _ = pseudo.pseudo_quantize_tensor(
        jnp.asarray(w.T), n_bits=4, group_size=g, zero_point=zero_point)
    l_gptq = _loss(x, w, wq_gptq)
    l_rtn = _loss(x, w, np.asarray(wq_rtn).T)
    assert l_gptq < 0.9 * l_rtn, (l_gptq, l_rtn)


def test_gptq_lands_on_the_group_grid():
    k, n, g, bits = 32, 8, 8, 4
    w = RNG.standard_normal((k, n)).astype(np.float32)
    x = _correlated_inputs(128, k)
    wq = np.asarray(gptq_quantize_kernel(jnp.asarray(w), jnp.asarray(x),
                                         n_bits=bits, group_size=g,
                                         zero_point=True)).T  # (N, K)
    def approx_gcd(steps, rel=1e-3):
        tol = rel * steps.max()
        gg = steps[0]
        for s in steps[1:]:
            a, b = max(gg, s), min(gg, s)
            while b > tol:
                a, b = b, a % b
            gg = a
        return gg

    # each (row, group) slice must hold <= 2^bits distinct values laid
    # out on ONE uniform grid (values may skip levels, so check against
    # the float-gcd of the steps, not the smallest step)
    for r in range(wq.shape[0]):
        for j0 in range(0, k, g):
            vals = np.unique(wq[r, j0:j0 + g])
            assert len(vals) <= 2 ** bits
            if len(vals) > 2:
                steps = np.diff(vals)
                delta = approx_gcd(steps)
                units = steps / delta
                np.testing.assert_allclose(units, np.round(units),
                                           rtol=1e-3, atol=1e-3)
                assert (vals[-1] - vals[0]) / delta <= 2 ** bits - 1 + 1e-3


def test_act_order_runs_and_compensates():
    k, n, g = 64, 32, 16
    w = RNG.standard_normal((k, n)).astype(np.float32)
    # heavily anisotropic inputs: a few dominant channels
    x = _correlated_inputs(256, k)
    x[:, : k // 4] *= 8.0
    ao = gptq_quantize_kernel(jnp.asarray(w), jnp.asarray(x), n_bits=3,
                              group_size=g, act_order=True)
    assert np.isfinite(np.asarray(ao)).all()
    # the GPTQ property must survive the permutation: still beats RTN
    # (with groups, permuted grids can trade against compensation, so
    # unordered-vs-ordered is seed luck — RTN is the stable baseline)
    wq_rtn, _, _ = pseudo.pseudo_quantize_tensor(
        jnp.asarray(w.T), n_bits=3, group_size=g, zero_point=True)
    assert _loss(x, w, ao) < _loss(x, w, np.asarray(wq_rtn).T)


def test_dead_columns_are_safe():
    k, n, g = 32, 16, 8
    w = RNG.standard_normal((k, n)).astype(np.float32)
    x = _correlated_inputs(64, k)
    x[:, 5] = 0.0                         # never-activated input channel
    wq = gptq_quantize_kernel(jnp.asarray(w), jnp.asarray(x), n_bits=4,
                              group_size=g)
    assert np.isfinite(np.asarray(wq)).all()


def test_causal_lm_gptq_end_to_end():
    lm = CausalLM.from_config(llama_lib.tiny_llama_config(),
                              dtype=jnp.float32, seed=3)
    before = np.asarray(lm.params["layers_0"]["self_attn"]["q_proj"]["kernel"])
    ids = np.asarray(RNG.integers(0, 256, (2, 16)))
    lm.quantize(quant_config={"w_bit": 4, "q_group_size": 16,
                              "version": "fake"},
                quantType="gptq", calib_data=ids)
    path = lm.params["layers_0"]["self_attn"]
    key = "qkv_proj" if "qkv_proj" in path else "q_proj"
    after = np.asarray(path[key]["kernel"])
    assert after.shape[0] == before.shape[0]
    assert not np.allclose(after[:, :before.shape[1]], before)
    out = lm.generate(ids[:1, :8], max_new_tokens=4)
    assert out.shape == (1, 12)


@pytest.mark.parametrize("mode,zero_point", [("w4a16", True),
                                             ("w4a16", False),
                                             ("w4a8", True),
                                             ("w8a8_xla", False),
                                             ("w8a8", False)])
def test_gptq_pack_is_bit_exact_vs_fake(mode, zero_point):
    """The packed buffers must dequantize to EXACTLY the fake-gptq
    values — the whole point of packing the search's own codes/scales
    instead of re-deriving an RTN grid."""
    from qdm_tpu.quant import gptq
    from qdm_tpu.quant.apply import unpack_dense_layer
    from qdm_tpu.quant.plan import LayerQuantSpec

    k, n, g = 64, 48, 16
    w = jnp.asarray(RNG.standard_normal((k, n)).astype(np.float32))
    x = jnp.asarray(_correlated_inputs(256, k))
    h = x.T @ x
    bits = 8 if mode.startswith("w8") else 4
    gs = 0 if mode.startswith("w8") else g
    fake = gptq.gptq_quantize_kernel_h(w, h, n_bits=bits, group_size=gs,
                                       zero_point=zero_point)
    spec = LayerQuantSpec(mode=mode, w_bits=bits, group_size=gs,
                          zero_point=zero_point)
    packed = gptq.gptq_pack_dense_layer({"kernel": w}, spec, h)
    un = unpack_dense_layer(packed, spec, (k, n))
    assert jnp.array_equal(un["kernel"], fake)


def test_causal_lm_gptq_real_end_to_end():
    """version='real': packed buffers replace kernels; greedy tokens
    match the fake-gptq run (same dequantized values through the _ref
    kernels on CPU)."""
    cfg = {"w_bit": 4, "q_group_size": 16, "version": "real"}
    ids = np.asarray(RNG.integers(0, 256, (2, 16)))

    lm_fake = CausalLM.from_config(llama_lib.tiny_llama_config(),
                                   dtype=jnp.float32, seed=3)
    lm_fake.quantize(quant_config={**cfg, "version": "fake"},
                     quantType="gptq", calib_data=ids)
    lm_real = CausalLM.from_config(llama_lib.tiny_llama_config(),
                                   dtype=jnp.float32, seed=3)
    lm_real.quantize(quant_config=cfg, quantType="gptq", calib_data=ids)

    layer0 = lm_real.params["layers_0"]["self_attn"]
    key = "qkv_proj" if "qkv_proj" in layer0 else "q_proj"
    assert "qweight" in layer0[key] and "kernel" not in layer0[key]
    out_fake = np.asarray(lm_fake.generate(ids[:1, :8], max_new_tokens=6))
    out_real = np.asarray(lm_real.generate(ids[:1, :8], max_new_tokens=6))
    np.testing.assert_array_equal(out_fake, out_real)


def test_gptq_real_save_load_roundtrip(tmp_path):
    lm = CausalLM.from_config(llama_lib.tiny_llama_config(),
                              dtype=jnp.float32, seed=3)
    ids = np.asarray(RNG.integers(0, 256, (2, 16)))
    lm.quantize(quant_config={"w_bit": 4, "q_group_size": 16,
                              "version": "real"},
                quantType="gptq", calib_data=ids)
    out = np.asarray(lm.generate(ids[:1, :8], max_new_tokens=4))
    lm.save_quantized(str(tmp_path))
    lm2 = CausalLM.from_quantized(str(tmp_path), dtype=jnp.float32)
    out2 = np.asarray(lm2.generate(ids[:1, :8], max_new_tokens=4))
    np.testing.assert_array_equal(out, out2)


def test_gptq_smooth_compose():
    """smooth=True migrates outliers first, then GPTQ compensates on
    the migrated weights; on an outlier-injected model the composition
    must beat plain GPTQ on calibration-set logits error."""
    import jax

    base = CausalLM.from_config(llama_lib.tiny_llama_config(),
                                dtype=jnp.float32, seed=3)
    # heavy-tailed per-channel activation outliers: scale up a few
    # input channels of every mlp/attn input by scaling the embedding
    # columns (propagates through the residual stream)
    emb = np.asarray(base.params["embed_tokens"]["embedding"]).copy()
    outlier_cols = RNG.choice(emb.shape[1], emb.shape[1] // 8,
                              replace=False)
    emb[:, outlier_cols] *= 8.0
    base.params["embed_tokens"]["embedding"] = jnp.asarray(emb)
    ids = np.asarray(RNG.integers(0, 256, (2, 16)))
    ref_logits = np.asarray(base.logits(ids))

    def quantize_with(smooth):
        lm = CausalLM.from_config(llama_lib.tiny_llama_config(),
                                  dtype=jnp.float32, seed=3)
        lm.params["embed_tokens"]["embedding"] = jnp.asarray(emb)
        lm.quantize(quant_config={"w_bit": 4, "q_group_size": 16,
                                  "version": "fake"},
                    quantType="gptq", calib_data=ids, smooth=smooth)
        return float(np.abs(np.asarray(lm.logits(ids)) - ref_logits).mean())

    err_plain = quantize_with(False)
    err_smooth = quantize_with(True)
    assert np.isfinite(err_smooth)
    assert err_smooth < err_plain, (err_smooth, err_plain)


def test_smooth_kwarg_guarded_to_gptq():
    lm = CausalLM.from_config(llama_lib.tiny_llama_config(),
                              dtype=jnp.float32, seed=3)
    ids = np.asarray(RNG.integers(0, 256, (2, 16)))
    with pytest.raises(ValueError):
        lm.quantize(quant_config={"w_bit": 4, "q_group_size": 16},
                    quantType="rtn", calib_data=ids, smooth=True)
