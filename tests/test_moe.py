"""Mixtral-class sparse MoE family: routing semantics, dispatch-vs-dense
equivalence, KV-cache decode consistency, quantize lifecycle (router
excluded, smoothing bit-invariant incl. routing), loader key mapping,
and expert parallelism on the CPU mesh.

Reference surface: quantize/quantizer.py:1106-1116 (block_sparse_moe
input capture), AutoAWQ's mixtral shim semantics (gate excluded,
norm -> all experts' w1/w3 shared scale, w3 -> w2 per expert).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.config import QuantConfig
from qdm_tpu.models import llama as llama_lib
from qdm_tpu.models.shims import llama_scaling_groups
from qdm_tpu.quant.smooth import smooth_params

CFG = llama_lib.tiny_mixtral_config()


def _lm(cfg=CFG):
    return CausalLM.from_config(cfg, dtype=jnp.float32, seed=3)


def test_forward_and_weights_shape():
    lm = _lm()
    moe = lm.params["layers_0"]["block_sparse_moe"]
    assert set(k for k in moe if k.startswith("experts_")) == {
        f"experts_{e}" for e in range(CFG.num_experts)}
    assert moe["gate"]["kernel"].shape == (CFG.hidden_size, CFG.num_experts)
    ids = np.arange(12, dtype=np.int32).reshape(2, 6)
    logits, _ = lm.model.apply({"params": lm.params}, jnp.asarray(ids))
    assert logits.shape == (2, 6, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_dispatch_matches_dense_when_capacity_ample():
    lm = _lm()
    ids = jnp.asarray(np.arange(32, dtype=np.int32).reshape(2, 16))
    dense, _ = lm.model.apply({"params": lm.params}, ids)
    # cf = E / top_k  =>  capacity = n_tokens: no token can drop
    cfg2 = dataclasses.replace(
        CFG, moe_capacity_factor=CFG.num_experts / CFG.num_experts_per_tok)
    m2 = llama_lib.LlamaForCausalLM(config=cfg2, dtype=jnp.float32)
    disp, _ = m2.apply({"params": lm.params}, ids)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(disp),
                               rtol=2e-5, atol=2e-5)


def test_dispatch_tight_capacity_drops_but_finite():
    lm = _lm()
    ids = jnp.asarray(np.arange(32, dtype=np.int32).reshape(2, 16))
    cfg2 = dataclasses.replace(CFG, moe_capacity_factor=0.5)
    m2 = llama_lib.LlamaForCausalLM(config=cfg2, dtype=jnp.float32)
    out, _ = m2.apply({"params": lm.params}, ids)
    assert np.isfinite(np.asarray(out)).all()


def test_cached_decode_matches_full_forward():
    lm = _lm()
    ids = np.arange(10, dtype=np.int32).reshape(1, 10)
    full, _ = lm.model.apply({"params": lm.params}, jnp.asarray(ids))
    caches = lm.model.init_cache(1, 16)
    # prefill first 6, then decode one token at a time
    logits, caches = lm.model.apply({"params": lm.params},
                                    jnp.asarray(ids[:, :6]),
                                    kv_caches=caches, cache_index=0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :6]),
                               rtol=1e-4, atol=1e-4)
    for t in range(6, 10):
        logits, caches = lm.model.apply({"params": lm.params},
                                        jnp.asarray(ids[:, t:t + 1]),
                                        kv_caches=caches, cache_index=t)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full[:, t]),
                                   rtol=1e-4, atol=1e-4)


def test_generate_runs():
    lm = _lm()
    out = lm.generate(np.arange(8, dtype=np.int32).reshape(1, 8),
                      max_new_tokens=4)
    assert out.shape == (1, 12)


def test_scaling_groups_topology():
    lm = _lm()
    groups = llama_scaling_groups(lm.params)
    per_layer = [g for g in groups if g.prev_path[0] == "layers_0"]
    # qkv group + moe group + E expert w3->w2 groups + v->o group
    moe_groups = [g for g in per_layer
                  if g.prev_path[-1] == "post_attention_layernorm"]
    assert len(moe_groups) == 1
    g = moe_groups[0]
    assert len(g.layer_paths) == 2 * CFG.num_experts          # w1+w3 each
    assert g.extra_scaled == (("layers_0", "block_sparse_moe", "gate"),)
    w32 = [g for g in per_layer
           if g.prev_path[-1] == "w3" and g.prev_path[1] == "block_sparse_moe"]
    assert len(w32) == CFG.num_experts


def test_smooth_invariance_including_routing():
    """Migration must leave outputs bit-invariant — including the
    router's decisions (extra_scaled multiplies the gate kernel)."""
    lm = _lm()
    ids = jnp.asarray(np.arange(24, dtype=np.int32).reshape(2, 12))
    base, _ = lm.model.apply({"params": lm.params}, ids)
    stats, _ = lm._calibrate(QuantConfig.from_dict({}),
                             np.asarray(ids), capture_inputs=False)
    groups = llama_scaling_groups(lm.params)
    smoothed = smooth_params(lm.params, groups, stats, alpha=0.5)
    after, _ = lm.model.apply({"params": smoothed}, ids)
    np.testing.assert_allclose(np.asarray(base), np.asarray(after),
                               rtol=2e-4, atol=2e-4)


def test_quantize_sq_excludes_router_and_serves():
    lm = _lm()
    ids = np.arange(32, dtype=np.int32).reshape(2, 16)
    lm.quantize(quant_config={"w_bit": 8, "q_group_size": 32,
                              "quantize_act": False},
                quantType="sq", calib_data=ids)
    assert lm.is_quantized
    spec = lm.plan.spec_for("layers_0/block_sparse_moe/gate")
    assert spec.mode == "none"
    assert lm.plan.spec_for("layers_0/block_sparse_moe/experts_0/w1").mode \
        != "none" or lm.plan.default.mode != "none"
    out = lm.generate(ids[:1, :8], max_new_tokens=3)
    assert out.shape == (1, 11)


def test_quantize_awq_runs_on_moe_groups():
    lm = _lm()
    ids = np.arange(32, dtype=np.int32).reshape(2, 16)
    lm.quantize(quant_config={"w_bit": 4, "q_group_size": 32,
                              "zero_point": True},
                quantType="awq", calib_data=ids)
    assert lm.is_quantized
    out = lm.generate(ids[:1, :8], max_new_tokens=2)
    assert out.shape == (1, 10)


def test_loader_maps_hf_mixtral_keys():
    from qdm_tpu.api import loader

    lm = _lm()
    shapes = jax.eval_shape(
        lambda: lm.model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8), jnp.int32)))["params"]

    def torchify(tree, prefix):
        out = {}
        for k, v in tree.items():
            kk = k.replace("_", ".") if k.split("_")[-1].isdigit() else k
            path = f"{prefix}.{kk}" if prefix else kk
            if isinstance(v, dict):
                out.update(torchify(v, path))
            else:
                arr = np.asarray(np.random.default_rng(0).standard_normal(
                    v.shape), np.float32)
                if path.endswith(".kernel"):
                    path = path[:-7] + ".weight"
                    arr = arr.T if arr.ndim == 2 else arr
                elif path.endswith(".embedding"):
                    path = path[:-10] + ".weight"
                elif path.endswith(".scale"):
                    path = path[:-6] + ".weight"
                out["model." + path if not path.startswith("lm_head")
                    else path] = arr
        return out

    sd = torchify(shapes, "")
    assert any("block_sparse_moe.experts.0.w1.weight" in k for k in sd)
    params, missing, unused = loader.convert_torch_state_dict(
        sd, shapes, strip_prefixes=("model.",))
    assert not missing, missing[:5]


def test_expert_parallel_matches_dense():
    from qdm_tpu.parallel.mesh import (make_mesh, moe_ep_forward,
                                       stack_moe_experts)
    from qdm_tpu.models.moe import MoeMLP

    lm = _lm()
    moe_params = lm.params["layers_0"]["block_sparse_moe"]
    x = jax.random.normal(jax.random.PRNGKey(7), (16, CFG.hidden_size))
    dense = MoeMLP(CFG, dtype=jnp.float32).apply(
        {"params": moe_params}, x[None])[0]
    mesh = make_mesh(2, 4)          # 4-way expert/model axis
    ep = moe_ep_forward(x, stack_moe_experts(moe_params), mesh,
                        top_k=CFG.num_experts_per_tok)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(ep),
                               rtol=2e-5, atol=2e-5)


def test_save_load_roundtrip():
    import tempfile

    lm = _lm()
    ids = np.arange(32, dtype=np.int32).reshape(2, 16)
    lm.quantize(quant_config={"w_bit": 8, "q_group_size": 32},
                quantType="sq", calib_data=ids)
    ref = lm.generate(ids[:1, :8], max_new_tokens=3)
    with tempfile.TemporaryDirectory() as d:
        lm.save_quantized(d)
        lm2 = CausalLM.from_quantized(d)
        out = lm2.generate(ids[:1, :8], max_new_tokens=3)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


# ---------------------------------------------------------------- engine


def test_engine_bf16_moe_matches_module():
    """DecodeEngine MoE serving (stacked-expert einsums) is token-exact
    vs the module dense-exact path."""
    from qdm_tpu.api.serve import DecodeEngine

    lm = CausalLM.from_config(llama_lib.tiny_mixtral_config(),
                              dtype=jnp.float32, seed=4)
    ids = np.random.default_rng(5).integers(0, lm.config.vocab_size, (2, 9))
    ref = lm.generate(ids, max_new_tokens=8)
    out = DecodeEngine(lm, mode="bf16").generate(ids, max_new_tokens=8)
    np.testing.assert_array_equal(out, ref)


def test_engine_w8a8_moe_and_guards():
    from qdm_tpu.api.serve import DecodeEngine

    lm = CausalLM.from_config(llama_lib.tiny_mixtral_config(),
                              dtype=jnp.float32, seed=4)
    ids = np.random.default_rng(5).integers(0, lm.config.vocab_size, (2, 9))
    stats = DecodeEngine.calibrate_scales(lm, np.asarray(ids))
    out = DecodeEngine(lm, mode="w8a8_static",
                       act_stats=stats).generate(ids, max_new_tokens=6)
    assert out.shape == (2, 15)
    # int8 KV composes with the MoE step (attention is expert-free)
    out = DecodeEngine(lm, kv_dtype=jnp.int8,
                       kv_scale_mode="channel").generate(
        ids, max_new_tokens=6)
    assert out.shape == (2, 15)
    # w4a8 serves now too (stacked-expert int4 kernel,
    # test_engine_moe_w4a8); merge_o stays guarded
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        DecodeEngine(lm, mode="bf16", merge_o=True)


def test_engine_moe_w4a8():
    """Stacked-expert int4 MoE serving: one pallas call for all
    experts' MLP + routing combine (half the int8 expert weight
    stream); tokens mostly survive int4 on the tiny model, ragged
    works."""
    import numpy as _np

    from qdm_tpu.api.serve import DecodeEngine

    lm = CausalLM.from_config(llama_lib.tiny_mixtral_config(),
                              dtype=jnp.float32, seed=6)
    rng = _np.random.default_rng(3)
    ids = rng.integers(0, 256, (2, 16))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    eng = DecodeEngine(lm, mode="w4a8_static", act_stats=stats)
    out = _np.asarray(eng.generate(ids[:, :6], max_new_tokens=8))
    ref = _np.asarray(lm.generate(ids[:, :6], max_new_tokens=8))
    assert out.shape == ref.shape
    assert (out == ref).mean() > 0.4
    ragged = eng.generate_ragged([list(ids[0, :4]), list(ids[1, :9])],
                                 max_new_tokens=4)
    assert len(ragged) == 2


def test_moe_i4_kernel_interpret_matches_ref():
    import numpy as _np

    from qdm_tpu.ops import decode_kernels as dk

    rng = _np.random.default_rng(0)
    B, K, I, E, g = 8, 256, 512, 4, 64
    xn = jnp.asarray(rng.standard_normal((B, K)).astype(_np.float32) * 0.5)
    rw = jnp.asarray(_np.abs(rng.standard_normal((B, E))
                             ).astype(_np.float32))
    rw = rw * (rw > 0.8)
    bj = dk.mlp_i4_block(I)
    packs = []
    for shape, blk in (((E, K, I), 0), ((E, K, I), 0), ((E, I, K), bj)):
        W = jnp.asarray(rng.standard_normal(shape).astype(_np.float32)
                        / 30)
        packs.append(dk.pack_moe_expert_i4(W, g, block=blk))
    (w1p, s1), (w3p, s3), (w2p, s2) = packs
    scl = jnp.asarray([0.03] + [0.05] * E, jnp.float32)
    out = dk.fused_moe_mlp_decode_i4_pallas(xn, rw, w1p, w3p, w2p,
                                            s1, s3, s2, scl, group=g,
                                            interpret=True)
    ref = dk.fused_moe_mlp_decode_i4_ref(xn, rw, w1p, w3p, w2p,
                                         s1, s3, s2, scl, group=g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_moe_gptq_quantizes_experts_not_router():
    """GPTQ on mixtral: every expert's dense kernels get their own
    Hessian-compensated placement (the sown Grams are per-QDense,
    experts included); the router stays fp (plan exclusion —
    reference modules_to_not_convert=['gate'])."""
    import numpy as _np

    lm = CausalLM.from_config(llama_lib.tiny_mixtral_config(),
                              dtype=jnp.float32, seed=2)
    rng = _np.random.default_rng(4)
    ids = rng.integers(0, 256, (2, 16))
    moe = lm.params["layers_0"]["block_sparse_moe"]
    before = _np.asarray(moe["experts_0"]["w1"]["kernel"])
    router_before = _np.asarray(moe["gate"]["kernel"])
    lm.quantize(quant_config={"w_bit": 4, "q_group_size": 16,
                              "version": "fake"},
                quantType="gptq", calib_data=ids)
    moe = lm.params["layers_0"]["block_sparse_moe"]
    assert not _np.allclose(_np.asarray(moe["experts_0"]["w1"]["kernel"]),
                            before)
    _np.testing.assert_array_equal(_np.asarray(moe["gate"]["kernel"]),
                                   router_before)
    out = lm.generate(ids[:1, :6], max_new_tokens=4)
    assert out.shape == (1, 10)
