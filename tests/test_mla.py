"""DeepSeek-V2 family: MLA (multi-head latent attention, models/mla.py)
+ deepseek MoE layout (shared experts, first-k dense, un-renormalized
top-k) — the one architecture the reference's quantizer names
explicitly (/root/reference/quantize/quantizer.py:1106-1116)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.models import llama as llama_lib

RNG = np.random.default_rng(31)


def _lm(seed=7, **kw):
    return CausalLM.from_config(llama_lib.tiny_deepseek_config(**kw),
                                dtype=jnp.float32, seed=seed)


def test_structure():
    """HF deepseek_v2 param topology: low-rank q (a/norm/b), shared
    latent kv projection, per-head expansion, deepseek MoE naming
    (mlp.gate router, mlp.experts_N.{gate,up,down}_proj,
    mlp.shared_experts) with the first layer dense."""
    lm = _lm()
    cfg = lm.config
    at = lm.params["layers_0"]["self_attn"]
    assert set(at) >= {"q_a_proj", "q_a_layernorm", "q_b_proj",
                       "kv_a_proj_with_mqa", "kv_a_layernorm",
                       "kv_b_proj", "o_proj"}
    h, qd = cfg.num_attention_heads, cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
    assert at["q_a_proj"]["kernel"].shape == (64, cfg.q_lora_rank)
    assert at["q_b_proj"]["kernel"].shape == (cfg.q_lora_rank, h * qd)
    assert at["kv_a_proj_with_mqa"]["kernel"].shape == (
        64, cfg.kv_lora_rank + cfg.qk_rope_head_dim)
    assert at["kv_b_proj"]["kernel"].shape == (
        cfg.kv_lora_rank,
        h * (cfg.qk_nope_head_dim + cfg.v_head_dim))
    # layer 0 dense (first_k_dense_replace=1), layers 1+ MoE
    assert "gate_proj" in lm.params["layers_0"]["mlp"]
    l1 = lm.params["layers_1"]["mlp"]
    assert "gate" in l1 and "experts_0" in l1 and "shared_experts" in l1
    assert "gate_proj" in l1["experts_0"]

    # MLA latent cache: (B, T, r + dr), ONE tensor per layer
    caches = lm.model.init_cache(2, 16)
    assert len(caches[0]) == 1
    assert caches[0][0].shape == (2, 16, cfg.kv_lora_rank
                                  + cfg.qk_rope_head_dim)
    with pytest.raises(NotImplementedError):
        lm.model.init_cache(2, 16, jnp.int8)


def test_cached_decode_matches_full_forward():
    """Greedy decode through the latent cache must agree token-exactly
    with a fresh full forward (the qwen3/gemma3 closure pattern)."""
    lm = _lm()
    ids = RNG.integers(0, 256, (2, 6))
    out = lm.generate(ids, max_new_tokens=8)
    full = np.asarray(lm.logits(np.asarray(out)[:, :-1]))
    nxt = full[:, -1].argmax(-1)
    np.testing.assert_array_equal(nxt, np.asarray(out)[:, -1])


def test_no_q_lora_variant():
    """deepseek-v2-lite layout: plain q_proj when q_lora_rank is None."""
    lm = _lm(q_lora_rank=None)
    at = lm.params["layers_0"]["self_attn"]
    assert "q_proj" in at and "q_a_proj" not in at
    ids = RNG.integers(0, 256, (2, 5))
    out = lm.generate(ids, max_new_tokens=4)
    full = np.asarray(lm.logits(np.asarray(out)[:, :-1]))
    np.testing.assert_array_equal(full[:, -1].argmax(-1),
                                  np.asarray(out)[:, -1])


def test_absorbed_form_matches_explicit():
    """The DecodeEngine's absorbed MLA decode (fold W_UK into the
    query, attend directly against the latent cache, fold W_UV after)
    must equal the module's explicit kv_b expansion."""
    lm = _lm()
    cfg = lm.config
    h = cfg.num_attention_heads
    dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    dv, r = cfg.v_head_dim, cfg.kv_lora_rank
    b, t = 2, 5

    p = lm.params["layers_0"]["self_attn"]
    x = jnp.asarray(RNG.standard_normal((b, t, 64)), jnp.float32)
    from qdm_tpu.models.mla import MLAAttention

    mod = MLAAttention(cfg, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    out_explicit, _ = mod.apply({"params": p}, x, positions)

    # absorbed re-computation from the same params
    from qdm_tpu.models.llama import rope

    def dense(name, v):
        y = v @ p[name]["kernel"]
        return y + p[name].get("bias", 0.0)

    def rms(name, v, eps=cfg.rms_norm_eps):
        s = p[name]["scale"]
        return v * jax.lax.rsqrt(jnp.mean(v * v, -1, keepdims=True) + eps) * s

    q = dense("q_b_proj", rms("q_a_layernorm", dense("q_a_proj", x)))
    q = q.reshape(b, t, h, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    q_pe = rope(q_pe, positions, cfg.rope_theta)
    lat = dense("kv_a_proj_with_mqa", x)
    c_kv = rms("kv_a_layernorm", lat[..., :r])
    k_pe = rope(lat[..., r:][:, :, None, :], positions,
                cfg.rope_theta)[:, :, 0]
    w_kv = p["kv_b_proj"]["kernel"].reshape(r, h, dn + dv)
    w_uk, w_uv = w_kv[..., :dn], w_kv[..., dn:]
    # absorb: q_lat[b,s,h,r] = q_nope . W_UK^T ; scores vs the latent
    q_lat = jnp.einsum("bqhd,rhd->bqhr", q_nope, w_uk)
    logits = (jnp.einsum("bqhr,bkr->bhqk", q_lat, c_kv)
              + jnp.einsum("bqhd,bkd->bhqk", q_pe, k_pe)) * cfg.attn_scale
    mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
    probs = jax.nn.softmax(jnp.where(mask, logits, -1e9), axis=-1)
    o_lat = jnp.einsum("bhqk,bkr->bqhr", probs, c_kv)
    o = jnp.einsum("bqhr,rhd->bqhd", o_lat, w_uv).reshape(b, t, h * dv)
    out_absorbed = dense("o_proj", o)
    np.testing.assert_allclose(np.asarray(out_absorbed),
                               np.asarray(out_explicit),
                               rtol=2e-4, atol=2e-4)


def test_moe_semantics():
    """Shared experts are always-on; routed output obeys the
    un-renormalized routed_scaling_factor semantics."""
    lm = _lm()
    ids = RNG.integers(0, 256, (2, 8))
    base = np.asarray(lm.logits(ids))

    # doubling routed_scaling_factor moves the logits (no renorm), and
    # zeroing every routed expert's down_proj leaves only shared+dense
    lm2 = _lm()
    object.__setattr__(lm2, "config",
                       llama_lib.tiny_deepseek_config(
                           routed_scaling_factor=2.0))
    lm2.params = lm.params
    assert np.abs(np.asarray(lm2.logits(ids)) - base).max() > 1e-5

    import copy

    lm3 = _lm()
    lm3.params = copy.deepcopy(lm.params)
    for lay in ("layers_1", "layers_2"):
        for e in range(4):
            exp = lm3.params[lay]["mlp"][f"experts_{e}"]
            exp["down_proj"]["kernel"] = exp["down_proj"]["kernel"] * 0.0
    zeroed = np.asarray(lm3.logits(ids))
    # shared experts still contribute: zeroing them too changes output
    lm4 = _lm()
    lm4.params = copy.deepcopy(lm3.params)
    for lay in ("layers_1", "layers_2"):
        sh = lm4.params[lay]["mlp"]["shared_experts"]
        sh["down_proj"]["kernel"] = sh["down_proj"]["kernel"] * 0.0
    assert np.abs(np.asarray(lm4.logits(ids)) - zeroed).max() > 1e-5


def test_quantize_and_generate():
    """RTN lifecycle runs on every MLA projection + expert and the
    quantized model still decodes token-consistently."""
    lm = _lm()
    ids = RNG.integers(0, 256, (2, 8))
    lm.quantize(quant_config={"w_bit": 8, "a_bit": 16, "version": "fake"},
                quantType="rtn", calib_data=ids)
    out = lm.generate(ids[:, :5], max_new_tokens=4)
    assert np.asarray(out).shape == (2, 9)
    full = np.asarray(lm.logits(np.asarray(out)[:, :-1]))
    np.testing.assert_array_equal(full[:, -1].argmax(-1),
                                  np.asarray(out)[:, -1])


def test_loader_deinterleave_roundtrip():
    """deepseek_deinterleave_rope undoes HF's interleaved rope storage:
    interleave the rope rows of a weight (HF layout), run the loader
    fold, recover the half-split original."""
    from qdm_tpu.api.loader import deepseek_deinterleave_rope

    dn, dr, h = 16, 8, 4
    qd = dn + dr
    w = RNG.standard_normal((h * qd, 64)).astype(np.float32)

    # simulate HF storage: within each head's rope rows, interleave
    # (x0..x3, y0..y3) -> (x0,y0,x1,y1,...)
    inter = np.empty(dr, np.int64)
    inter[0::2] = np.arange(dr // 2)
    inter[1::2] = np.arange(dr // 2) + dr // 2
    wh = w.reshape(h, qd, 64)
    w_hf = np.concatenate([wh[:, :dn], wh[:, dn:][:, inter]], axis=1)
    w_hf = w_hf.reshape(h * qd, 64)

    kv = RNG.standard_normal((32 + dr, 64)).astype(np.float32)
    kv_hf = np.concatenate([kv[:-dr], kv[-dr:][inter]], axis=0)

    sd = {"model.layers.0.self_attn.q_b_proj.weight": w_hf,
          "model.layers.0.self_attn.kv_a_proj_with_mqa.weight": kv_hf}
    out = deepseek_deinterleave_rope(sd, dn, dr)
    np.testing.assert_array_equal(
        out["model.layers.0.self_attn.q_b_proj.weight"], w)
    np.testing.assert_array_equal(
        out["model.layers.0.self_attn.kv_a_proj_with_mqa.weight"], kv)


def test_loader_maps_hf_deepseek_keys(tmp_path):
    """A fake HF deepseek_v2 checkpoint dir loads through
    CausalLM.from_pretrained with zero missing params and reproduces
    the module's logits."""
    import json

    from safetensors.numpy import save_file

    lm = _lm()
    cfg = lm.config

    def t(x):                     # flax (in, out) -> torch (out, in)
        return np.ascontiguousarray(np.asarray(x, np.float32).T)

    sd = {"model.embed_tokens.weight": np.asarray(
        lm.params["embed_tokens"]["embedding"], np.float32),
        "model.norm.weight": np.asarray(lm.params["norm"]["scale"],
                                        np.float32),
        "lm_head.weight": t(lm.params["lm_head"]["kernel"])}
    for i in range(cfg.num_hidden_layers):
        lp = lm.params[f"layers_{i}"]
        base = f"model.layers.{i}."
        sd[base + "input_layernorm.weight"] = np.asarray(
            lp["input_layernorm"]["scale"], np.float32)
        sd[base + "post_attention_layernorm.weight"] = np.asarray(
            lp["post_attention_layernorm"]["scale"], np.float32)
        at = lp["self_attn"]
        for name in ("q_a_proj", "q_b_proj", "kv_a_proj_with_mqa",
                     "kv_b_proj", "o_proj"):
            sd[base + f"self_attn.{name}.weight"] = t(at[name]["kernel"])
        for name in ("q_a_layernorm", "kv_a_layernorm"):
            sd[base + f"self_attn.{name}.weight"] = np.asarray(
                at[name]["scale"], np.float32)
        mlp = lp["mlp"]
        if i < cfg.first_k_dense_replace:
            for name in ("gate_proj", "up_proj", "down_proj"):
                sd[base + f"mlp.{name}.weight"] = t(mlp[name]["kernel"])
        else:
            sd[base + "mlp.gate.weight"] = t(mlp["gate"]["kernel"])
            for e in range(cfg.num_experts):
                for name in ("gate_proj", "up_proj", "down_proj"):
                    sd[base + f"mlp.experts.{e}.{name}.weight"] = \
                        t(mlp[f"experts_{e}"][name]["kernel"])
            for name in ("gate_proj", "up_proj", "down_proj"):
                sd[base + f"mlp.shared_experts.{name}.weight"] = \
                    t(mlp["shared_experts"][name]["kernel"])

    # undo the loader's de-interleave so the roundtrip includes it
    dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    inter = np.empty(dr, np.int64)
    inter[0::2] = np.arange(dr // 2)
    inter[1::2] = np.arange(dr // 2) + dr // 2
    for i in range(cfg.num_hidden_layers):
        kq = f"model.layers.{i}.self_attn.q_b_proj.weight"
        w = sd[kq]
        qd = dn + dr
        h = w.shape[0] // qd
        wh = w.reshape(h, qd, -1)
        sd[kq] = np.concatenate([wh[:, :dn], wh[:, dn:][:, inter]],
                                axis=1).reshape(w.shape)
        kk = f"model.layers.{i}.self_attn.kv_a_proj_with_mqa.weight"
        kv = sd[kk]
        sd[kk] = np.concatenate([kv[:-dr], kv[-dr:][inter]], axis=0)

    d = tmp_path / "ckpt"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    hf_cfg = {"model_type": "deepseek_v2", "vocab_size": cfg.vocab_size,
              "hidden_size": cfg.hidden_size,
              "intermediate_size": cfg.intermediate_size,
              "moe_intermediate_size": cfg.moe_intermediate_size,
              "num_hidden_layers": cfg.num_hidden_layers,
              "num_attention_heads": cfg.num_attention_heads,
              "num_key_value_heads": cfg.num_key_value_heads,
              "q_lora_rank": cfg.q_lora_rank,
              "kv_lora_rank": cfg.kv_lora_rank,
              "qk_nope_head_dim": cfg.qk_nope_head_dim,
              "qk_rope_head_dim": cfg.qk_rope_head_dim,
              "v_head_dim": cfg.v_head_dim,
              "n_routed_experts": cfg.num_experts,
              "n_shared_experts": cfg.n_shared_experts,
              "num_experts_per_tok": cfg.num_experts_per_tok,
              "first_k_dense_replace": cfg.first_k_dense_replace,
              "routed_scaling_factor": cfg.routed_scaling_factor,
              "norm_topk_prob": False,
              "max_position_embeddings": 128,
              "rms_norm_eps": cfg.rms_norm_eps,
              "rope_theta": cfg.rope_theta,
              "tie_word_embeddings": False,
              "hidden_act": "silu"}
    with open(d / "config.json", "w") as f:
        json.dump(hf_cfg, f)

    lm2 = CausalLM.from_pretrained(str(d), dtype=jnp.float32)
    assert lm2.config.kv_lora_rank == cfg.kv_lora_rank
    assert lm2.config.moe_layout == "deepseek"
    ids = RNG.integers(0, 256, (2, 7))
    np.testing.assert_allclose(np.asarray(lm2.logits(ids)),
                               np.asarray(lm.logits(ids)),
                               rtol=2e-4, atol=2e-4)


def test_registry_presets():
    from qdm_tpu.models.registry import LLM_CONFIG_PRESETS

    lite = LLM_CONFIG_PRESETS["deepseek-v2-lite"]
    assert lite.kv_lora_rank == 512 and lite.q_lora_rank is None
    full = LLM_CONFIG_PRESETS["deepseek-v2"]
    assert full.q_lora_rank == 1536 and full.routed_scaling_factor == 16.0
    assert full.head_dim == 192          # qk_nope 128 + qk_rope 64


# ----------------------------------------------------------- engine serving

def test_engine_bf16_matches_module():
    """The DecodeEngine serves MLA in the ABSORBED form against the
    (B, T, r+dr) latent cache; greedy tokens must equal the module's
    explicit-form CausalLM.generate (the zoo-family pattern).  Covers
    q-lora + deepseek MoE (shared experts, first-k dense, no renorm)
    AND the v2-lite plain-q variant."""
    from qdm_tpu.api.serve import DecodeEngine

    for kw in ({}, {"q_lora_rank": None}):
        lm = _lm(seed=41, **kw)
        ids = RNG.integers(0, 256, (2, 6))
        want = np.asarray(lm.generate(ids, max_new_tokens=6))
        eng = DecodeEngine(lm, mode="bf16")
        got = np.asarray(eng.generate(ids, max_new_tokens=6))
        np.testing.assert_array_equal(got[:, 6:], want[:, 6:])


def test_engine_w8a8_consistent_and_close():
    """w8a8_static MLA serving: greedy tokens may legitimately diverge
    from bf16 under quantization — pin the engine's OWN determinism and
    first-token top-5 agreement with the module (the zoo pattern)."""
    from qdm_tpu.api.serve import DecodeEngine

    lm = _lm(seed=43)
    ids = RNG.integers(0, 256, (2, 6))
    stats = DecodeEngine.calibrate_scales(lm, ids)
    eng = DecodeEngine(lm, mode="w8a8_static", act_stats=stats)
    a = np.asarray(eng.generate(ids, max_new_tokens=4))
    b = np.asarray(eng.generate(ids, max_new_tokens=4))
    np.testing.assert_array_equal(a, b)
    full = np.asarray(lm.logits(ids))
    top5 = np.argsort(full[:, -1])[:, -5:]
    first = a[:, ids.shape[1]]
    assert all(first[i] in top5[i] for i in range(2))


def test_engine_sampling_and_stop_early():
    """The mode-independent decode features run on the MLA path too:
    seed-deterministic sampling and the EOS while_loop exit."""
    from qdm_tpu.api.serve import DecodeEngine

    lm = _lm(seed=47)
    ids = RNG.integers(0, 256, (2, 5))
    eng = DecodeEngine(lm, mode="bf16")
    s1 = np.asarray(eng.generate(ids, max_new_tokens=6, temperature=0.8,
                                 top_k=20, seed=3))
    s2 = np.asarray(eng.generate(ids, max_new_tokens=6, temperature=0.8,
                                 top_k=20, seed=3))
    np.testing.assert_array_equal(s1, s2)
    g = np.asarray(eng.generate(ids, max_new_tokens=6))
    eos = int(g[0, ids.shape[1]])      # force an immediate row-0 EOS
    e = np.asarray(eng.generate(ids, max_new_tokens=6, eos_token_id=eos,
                                stop_early=True))
    assert (e[0, ids.shape[1]:] == eos).all() or e.shape == g.shape


def test_engine_guards_are_actionable():
    """Unsupported MLA engine surfaces raise NotImplementedError with
    the supported envelope named — NOT a bare KeyError (the r4 verdict's
    one broken promise)."""
    from qdm_tpu.api.serve import DecodeEngine

    lm = _lm(seed=49)
    ids = RNG.integers(0, 256, (2, 6)).astype(np.int32)
    stats = DecodeEngine.calibrate_scales(lm, ids)
    for kw in (dict(mode="w4a8_static", act_stats=stats),
               dict(mode="bf16", kv_dtype=jnp.int8),
               dict(mode="bf16", merge_o=True),
               dict(mode="w8a8_static", act_stats=stats,
                    prefill_quant=True)):
        with pytest.raises(NotImplementedError):
            DecodeEngine(lm, **kw)
    eng = DecodeEngine(lm, mode="bf16")
    with pytest.raises(NotImplementedError):
        eng.prefill_ragged(jnp.zeros((2, 8), jnp.int32),
                           jnp.asarray([4, 8]), 16)
    with pytest.raises(NotImplementedError):
        eng.generate_ragged([np.arange(4), np.arange(6)], 4)
    with pytest.raises(NotImplementedError):
        eng.score(ids)
    with pytest.raises(NotImplementedError):
        eng.precompute_prefix(ids[:1])
    with pytest.raises(NotImplementedError):
        eng.generate(ids, max_new_tokens=4, prefill_chunk=4)


def test_smooth_migration_invariance_mla():
    """llama_scaling_groups on MLA params (ADVICE r4: used to KeyError
    on 'v_proj'): the deepseek groups must exist and SmoothQuant
    migration through them must be output-invariant in fp32 —
    input_layernorm -> q_a/kv_a, q_a_layernorm -> q_b, kv_a_layernorm
    -> kv_b, post_attention_layernorm -> every expert's + shared
    expert's gate/up with the router in extra_scaled."""
    from qdm_tpu.api.serve import DecodeEngine
    from qdm_tpu.models.shims import llama_scaling_groups

    lm = _lm(seed=51)
    groups = llama_scaling_groups(lm.params)
    prevs = {g.prev_path[-1] for g in groups}
    assert {"input_layernorm", "q_a_layernorm", "kv_a_layernorm",
            "post_attention_layernorm"} <= prevs
    moe_groups = [g for g in groups if g.extra_scaled]
    assert moe_groups and all(
        g.extra_scaled[0][-1] == "gate" for g in moe_groups)
    # shared experts join the norm group (same normed input stream)
    assert any(any("shared_experts" in p for p in g.layer_paths)
               for g in moe_groups)

    ids = RNG.integers(0, 256, (2, 8))
    base = np.asarray(lm.logits(ids))
    DecodeEngine.smooth_lm(lm, ids, alpha=0.5)
    after = np.asarray(lm.logits(ids))
    np.testing.assert_allclose(after, base, rtol=2e-4, atol=2e-4)


def test_serve_smooth_and_awq_mla():
    """CausalLM.serve(smooth=True / awq=True) runs the full migration +
    calibration + engine flow on a deepseek config (the r4 advisor
    crash path) and still decodes deterministically."""
    lm = _lm(seed=53)
    ids = RNG.integers(0, 256, (2, 8)).astype(np.int32)
    eng = lm.serve(ids, mode="w8a8_static", smooth=True)
    a = np.asarray(eng.generate(ids[:, :6], max_new_tokens=3))
    b = np.asarray(eng.generate(ids[:, :6], max_new_tokens=3))
    np.testing.assert_array_equal(a, b)

    lm2 = _lm(seed=53)
    eng2 = lm2.serve(ids, mode="w8a8_static", awq=True)
    c = np.asarray(eng2.generate(ids[:, :6], max_new_tokens=3))
    assert c.shape == (2, 9)


def test_mla_combined_layout_kernel_parity():
    """The engine's MLA attention rides the combined-cache decode
    kernels as one MQA head (hkv=1, d=dpad=640, zero pad lanes —
    serve.py::_mla_layer).  Pin that kernel shape against the
    reference attention in interpret mode (single-pass AND T-blocked
    flash variants), so a Mosaic block-rule regression surfaces here
    instead of as a chip compile error."""
    from qdm_tpu.ops import decode_kernels as dk

    rng = np.random.default_rng(5)
    b, h, dpad, T, r, dr = 2, 4, 640, 256, 512, 64
    q = jnp.asarray(rng.standard_normal((b, 1, h, dpad)), jnp.float32)
    q = q.at[..., r + dr:].set(0.0)
    kv = jnp.asarray(rng.standard_normal((b, 2, dpad, T)), jnp.float32)
    kv = kv.at[:, 0, r + dr:].set(0.0).at[:, 1, r:].set(0.0)
    pos = jnp.int32(100)
    sc = (128 + 64) ** -0.5
    want = dk.decode_attention_ref(
        q, kv[:, :1], kv[:, 1:].transpose(0, 1, 3, 2), pos, sm_scale=sc)
    got = dk.decode_attention_kv_pallas(q, kv, pos, block_b=1,
                                        interpret=True, sm_scale=sc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-3, atol=3e-3)
    got2 = dk.decode_attention_kv_flash_pallas(q, kv, pos, block_t=128,
                                               interpret=True, sm_scale=sc)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=3e-3, atol=3e-3)
