"""SmoothQuant invariance + behavior tests.

Invariant (scale.py:87-113 semantics): migrating scales from a norm into
the following linears must not change the (unquantized) model output.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qdm_tpu.models import UNet2DCondition, tiny_unet_config
from qdm_tpu.models.shims import sd_unet_scaling_groups, find_transformer_blocks
from qdm_tpu.quant.smooth import smooth_params, compute_smooth_scales, ScalingGroup
from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan
from qdm_tpu.quant.apply import fake_quantize_params
from qdm_tpu.calib.stats import flatten_calib, RunningMeanMax

KEY = jax.random.PRNGKey(0)


def _setup():
    cfg = tiny_unet_config()
    m = UNet2DCondition(config=cfg, dtype=jnp.float32)
    x = jax.random.normal(KEY, (2, 8, 8, 4))
    t = jnp.array([500, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32))
    params = m.init(jax.random.PRNGKey(2), x, t, ctx)["params"]
    return m, params, (x, t, ctx)


def _calib_stats(m, params, args):
    mcap = UNet2DCondition(config=m.config, dtype=jnp.float32,
                           plan=QuantPlan(capture_stats=True))
    run = RunningMeanMax()
    for t_val in (100, 500, 900):
        x, _, ctx = args
        _, mut = mcap.apply({"params": params}, x,
                            jnp.full((x.shape[0],), t_val), ctx,
                            mutable=["calib"])
        run.update(flatten_calib(mut["calib"]))
    return run.mean()


def test_scaling_groups_found():
    _, params, _ = _setup()
    blocks = find_transformer_blocks(params)
    # tiny config: 1 down attn + mid + 2 up attns
    assert len(blocks) == 4
    groups = sd_unet_scaling_groups(params)
    assert len(groups) == 8  # 2 per block


def test_smooth_invariance_fp32():
    m, params, args = _setup()
    x, t, ctx = args
    base = np.asarray(m.apply({"params": params}, x, t, ctx))

    stats = _calib_stats(m, params, args)
    groups = sd_unet_scaling_groups(params)
    smoothed = smooth_params(params, groups, stats, alpha=0.80)
    out = np.asarray(m.apply({"params": smoothed}, x, t, ctx))
    np.testing.assert_allclose(out, base, rtol=2e-4, atol=2e-4)

    # and the params actually changed
    b = find_transformer_blocks(params)[0]
    k0 = params
    k1 = smoothed
    for p in b + ("attn1", "to_q", "kernel"):
        k0, k1 = k0[p], k1[p]
    assert np.abs(np.asarray(k0) - np.asarray(k1)).max() > 1e-6


def test_smooth_reduces_act_weight_mismatch():
    """After migration, W4 group fake-quant should hurt less than
    without smoothing when activations have channel outliers."""
    m, params, args = _setup()
    x, t, ctx = args

    # inject strong channel outliers into attn1 inputs by scaling norm1
    b = find_transformer_blocks(params)[0]
    outlier = jnp.ones(32).at[3].set(50.0).at[17].set(30.0)
    pp = params
    sub = pp
    for p in b[:-1]:
        sub = sub[p]
    blk = sub[b[-1]]
    blk["norm1"]["scale"] = blk["norm1"]["scale"] * outlier

    base = np.asarray(m.apply({"params": params}, x, t, ctx))
    stats = _calib_stats(m, params, args)
    groups = sd_unet_scaling_groups(params)

    qplan = QuantPlan(default=LayerQuantSpec(mode="fake", w_bits=4, group_size=0,
                                             weight_quant="per_channel"))
    q_plain = np.asarray(m.apply({"params": fake_quantize_params(params, qplan)}, x, t, ctx))
    smoothed = smooth_params(params, groups, stats, alpha=0.80)
    q_smooth = np.asarray(m.apply({"params": fake_quantize_params(smoothed, qplan)}, x, t, ctx))

    err_plain = np.abs(q_plain - base).mean()
    err_smooth = np.abs(q_smooth - base).mean()
    # smoothing shouldn't be catastrophically worse; typically better
    assert err_smooth < err_plain * 1.5, (err_smooth, err_plain)


def test_smooth_returns_migration_scales():
    """return_scales=True exposes s per migrated layer, and the
    post-smooth activation absmax really is stats/s (so static int8
    act scales must be calibrated on the adjusted stats)."""
    m, params, args = _setup()
    x, t, ctx = args
    stats = _calib_stats(m, params, args)
    groups = sd_unet_scaling_groups(params)
    smoothed, mig = smooth_params(params, groups, stats, alpha=0.80,
                                  return_scales=True)
    assert mig, "no migration scales returned"
    for g in groups:
        for lp in g.layer_paths:
            assert "/".join(lp) in mig

    # recapture stats on the smoothed params: for migrated layers the
    # new absmax ~ old/s
    stats2 = _calib_stats(m, smoothed, args)
    key = next(iter(mig))
    adj = np.asarray(stats[key] / mig[key])
    fresh = np.asarray(stats2[key])
    np.testing.assert_allclose(fresh, adj, rtol=5e-2, atol=1e-4)


def test_compute_scales_formula():
    params = {"norm": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
              "fc": {"kernel": jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3)),
                     "bias": jnp.zeros(3)}}
    g = ScalingGroup(prev_path=("norm",), layer_paths=(("fc",),))
    act = jnp.array([1.0, 2.0, 4.0, 8.0])
    s = np.asarray(compute_smooth_scales(params, g, act, alpha=0.5))
    wmax = np.abs(np.arange(12).reshape(4, 3)).max(1)
    want = np.clip(np.asarray(act) ** 0.5 / np.clip(wmax, 1e-5, None) ** 0.5, 1e-5, None)
    np.testing.assert_allclose(s, want, rtol=1e-6)
