"""Codebook quantizer tests (reference genCodeBook.py semantics)."""

import numpy as np
import jax.numpy as jnp

from qdm_tpu.quant.codebook import kmeans, codebook_quantize, codebook_quantize_weight

RNG = np.random.default_rng(0)


def test_kmeans_converges():
    pts = np.concatenate([RNG.normal(-5, 0.1, (50, 1)),
                          RNG.normal(5, 0.1, (50, 1))]).astype(np.float32)
    init = jnp.asarray([[-1.0], [1.0]])
    cents, assign = kmeans(jnp.asarray(pts), init, 2, iters=20)
    c = np.sort(np.asarray(cents).reshape(-1))
    np.testing.assert_allclose(c, [-5, 5], atol=0.2)
    assert len(np.unique(np.asarray(assign))) == 2


def test_codebook_quantize_maps_to_centroids():
    w = RNG.standard_normal((16, 64)).astype(np.float32) * 100
    wq, kl = codebook_quantize(jnp.asarray(w), num_codebooks=2, num_centroids=8)
    uq = np.unique(np.asarray(wq))
    # at most num_codebooks * num_centroids distinct values
    assert len(uq) <= 2 * 8
    assert float(kl) >= 0
    # quantized values stay within data range
    assert uq.min() >= w.min() - 1e-3 and uq.max() <= w.max() + 1e-3


def test_codebook_weight_roundtrip_better_than_nothing():
    w = RNG.standard_normal((8, 64)).astype(np.float32)
    wq, kl = codebook_quantize_weight(jnp.asarray(w), n_bits=8, group_size=0,
                                      num_codebooks=2, num_centroids=8)
    assert wq.shape == w.shape
    err = np.abs(np.asarray(wq) - w).mean() / np.abs(w).mean()
    assert err < 0.6, err


def test_codebook_via_pipeline_plan():
    from qdm_tpu.quant.plan import spec_from_config
    from qdm_tpu.config import QuantConfig

    cfg = QuantConfig(quant_method="codebook", w_bit=8)
    spec = spec_from_config(cfg)
    assert spec.weight_quant == "codebook"
