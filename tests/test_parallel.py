"""Multi-chip sharding tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from qdm_tpu.parallel.mesh import make_mesh, param_pspec, shard_params, batch_sharding


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_param_pspec_rules():
    assert param_pspec("layers_0/self_attn/q_proj", "kernel", 2, True) == P(None, "model")
    assert param_pspec("layers_0/self_attn/o_proj", "kernel", 2, True) == P("model", None)
    assert param_pspec("blocks/attn1/to_q", "kernel", 2, True) == P(None, "model")
    assert param_pspec("blocks/ff/net_2", "kernel", 2, True) == P("model", None)
    assert param_pspec("norm1", "scale", 1, True) == P()
    assert param_pspec("anything", "kernel", 2, False) == P()


def test_sharded_dense_matches_single():
    """Column+row TP split of an MLP must reproduce the single-device
    result (collectives inserted by GSPMD)."""
    mesh = make_mesh(2, 4)
    params = {
        "mlp": {
            "gate_proj": {"kernel": jnp.asarray(np.random.default_rng(0)
                                                .standard_normal((64, 128), np.float32))},
            "down_proj": {"kernel": jnp.asarray(np.random.default_rng(1)
                                                .standard_normal((128, 64), np.float32))},
        }
    }

    def f(p, x):
        h = jax.nn.silu(x @ p["mlp"]["gate_proj"]["kernel"])
        return h @ p["mlp"]["down_proj"]["kernel"]

    x = jnp.asarray(np.random.default_rng(2).standard_normal((16, 64), np.float32))
    want = f(params, x)

    sp = shard_params(params, mesh, tp=True)
    xs = jax.device_put(x, batch_sharding(mesh))
    got = jax.jit(f)(sp, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_tp_sharded_quantized_unet_matches_single():
    """Full packed-int8 UNet (the serving plan, dynamic act scales)
    under dp x tp sharding == single-device output."""
    from qdm_tpu.models.unet import UNet2DCondition, tiny_unet_config
    from qdm_tpu.quant.apply import pack_params
    from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan

    w8x = LayerQuantSpec(mode="w8a8_xla", w_bits=8, a_bits=8,
                         quantize_act=True, act_quant="per_token")
    conv8 = LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8, quantize_act=True)
    plan = QuantPlan(default=w8x, rules=(
        ("conv", conv8), ("time_emb", LayerQuantSpec(mode="none"))))
    cfg = tiny_unet_config()
    model = UNet2DCondition(config=cfg, dtype=jnp.float32, plan=plan)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 8, 8, 4)), jnp.float32)
    t = jnp.zeros((4,), jnp.int32)
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal(
        (4, 7, cfg.cross_attention_dim)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    qp = pack_params(params, plan)
    want = np.asarray(model.apply({"params": qp}, x, t, ctx))

    mesh = make_mesh(4, 2)
    sp = shard_params(qp, mesh, tp=True)
    xs = jax.device_put(x, batch_sharding(mesh))
    got = jax.jit(lambda p, x, t, c: model.apply({"params": p}, x, t, c))(
        sp, xs, t, jax.device_put(ctx, batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_pipeline_data_parallel_generate():
    """Mesh-sharded generation must match single-device output."""
    import jax.numpy as jnp
    from qdm_tpu.api import StableDiffusion1_x

    p = StableDiffusion1_x.from_config(tiny=True, dtype=jnp.float32)
    prompts = ["a"] * 8
    img_single = p.generate(prompts, num_inference_steps=2, seed=0)
    p.with_mesh(make_mesh(8, 1))
    img_sharded = p.generate(prompts, num_inference_steps=2, seed=0)
    np.testing.assert_allclose(img_sharded, img_single, rtol=5e-4, atol=5e-4)


def test_tp_sharded_w8a8_xla_layer_matches_single():
    """The packed int8 (w8a8_xla) dense layer under a tensor-parallel
    column split must reproduce the single-device result: qweight
    col-sharded, scales col-sharded, act_scale replicated."""
    from qdm_tpu.models.layers import QDense
    from qdm_tpu.quant.apply import pack_dense_layer
    from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan

    spec = LayerQuantSpec(mode="w8a8_xla", w_bits=8, a_bits=8,
                          quantize_act=True, act_quant="static")
    plan = QuantPlan(default=spec)
    rng = np.random.default_rng(0)
    kern = jnp.asarray(rng.standard_normal((64, 128), np.float32))
    layer = pack_dense_layer({"kernel": kern}, spec)
    layer["act_scale"] = jnp.asarray([0.03], jnp.float32)
    # wrap in a to_q-named tree so the col-split rule matches
    params = {"to_q": layer}
    model = QDense(128, use_bias=False, dtype=jnp.float32, plan=plan)
    x = jnp.asarray(rng.standard_normal((16, 64), np.float32))
    want = model.apply({"params": layer}, x)

    mesh = make_mesh(2, 4)
    sp = shard_params(params, mesh, tp=True)["to_q"]
    assert sp["qweight"].sharding.spec == P(None, "model")
    xs = jax.device_put(x, batch_sharding(mesh))
    got = jax.jit(lambda p, x: model.apply({"params": p}, x))(sp, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_multihost_dryrun():
    """2-process x 4-device jax.distributed dryrun (DCN-style: dp
    across processes, tp within) — SURVEY §5 multi-host design under
    real process isolation.  Subprocesses force their own CPU backend,
    so this is safe inside the single-process test session."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multihost(2, 2)"],
        capture_output=True, text=True, timeout=240,
        cwd=__import__("os").path.dirname(
            __import__("os").path.dirname(__file__)))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multihost OK" in r.stdout


def test_dp_serving_non_canonical_families():
    """Every family the engine used to guard single-device now serves
    dp over a mesh's 'data' axis token-exactly vs the single-device
    engine: the shard_map body routes tp==1 through the single-device
    layer path, which carries sandwich norms (gemma2), dual rope
    (gemma3), ungated-MLP/bias/XLA-rope (phi), and learned positions
    (OPT).  tp>1 for these families stays guarded."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_gemma3 import tiny_gemma3_config
    from test_phi import tiny_phi_config
    from test_zoo_families import tiny_opt
    from qdm_tpu.api.causal_lm import CausalLM
    from qdm_tpu.api.serve import DecodeEngine

    mesh_dp = make_mesh(8, 1)
    cases = [("gemma3", tiny_gemma3_config(), "bf16"),
             ("phi", tiny_phi_config(), "w4a8_static"),
             ("opt", tiny_opt(), "w8a8_static")]
    for name, cfg, mode in cases:
        lm = CausalLM.from_config(cfg, dtype=jnp.float32, seed=0)
        ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (8, 7))
        kw = {}
        if mode != "bf16":
            kw["act_stats"] = DecodeEngine.calibrate_scales(lm, ids)
        t1 = DecodeEngine(lm, mode=mode, **kw).generate(ids, max_new_tokens=6)
        tdp = DecodeEngine(lm, mode=mode, mesh=mesh_dp, **kw).generate(
            ids, max_new_tokens=6)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(tdp),
                                      err_msg=f"{name} {mode}")
    import pytest

    with pytest.raises(NotImplementedError, match="dp-only"):
        DecodeEngine(CausalLM.from_config(tiny_gemma3_config(),
                                          dtype=jnp.float32, seed=0),
                     mode="bf16", mesh=make_mesh(4, 2))
