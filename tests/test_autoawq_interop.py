"""Load a synthetic AutoAWQ-format checkpoint (the reference
ecosystem's on-disk layout) and verify logits match direct packing."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from qdm_tpu.api.causal_lm import CausalLM
from qdm_tpu.models.llama import tiny_llama_config
from qdm_tpu.quant import quantize_tensor
from qdm_tpu.quant.packing import AWQ_ORDER

RNG = np.random.default_rng(3)


def np_pack_awq(icodes, bits=4):
    k, n = icodes.shape
    epw = 32 // bits
    blocks = icodes.reshape(k, n // epw, epw)[:, :, list(AWQ_ORDER)]
    out = np.zeros((k, n // epw), dtype=np.int64)
    for j in range(epw):
        out |= blocks[:, :, j].astype(np.int64) << (bits * j)
    return out.astype(np.uint32).view(np.int32)


def test_autoawq_checkpoint_roundtrip(tmp_path):
    from safetensors.numpy import save_file
    import dataclasses

    cfg = tiny_llama_config()
    gs = 32
    lm = CausalLM.from_config(cfg, dtype=jnp.float32)

    # build the AutoAWQ-style state dict from lm's fp params
    sd = {}

    def emit_fp(prefix, tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                emit_fp(f"{prefix}{k}.", v)
            else:
                name = {"kernel": "weight", "scale": "weight",
                        "embedding": "weight", "bias": "bias"}[k]
                val = np.asarray(v)
                if k == "kernel":
                    val = val.T
                sd[f"{prefix}{name}"] = np.ascontiguousarray(val)

    packed_layers = []
    for lname, layer in lm.params.items():
        if lname.startswith("layers_"):
            idx = lname.split("_")[1]
            for mod in ("self_attn", "mlp"):
                for pname, p in layer[mod].items():
                    kernel = p["kernel"]               # (in, out)
                    q = quantize_tensor(kernel.T, n_bits=4, group_size=gs,
                                        zero_point=True)
                    base = f"model.layers.{idx}.{mod}.{pname}"
                    sd[base + ".qweight"] = np_pack_awq(np.asarray(q.iweight).T)
                    sd[base + ".qzeros"] = np_pack_awq(
                        np.asarray(q.zeros).T.astype(np.int32))
                    sd[base + ".scales"] = np.ascontiguousarray(
                        np.asarray(q.scales).T.astype(np.float32))
                    packed_layers.append(base)
            for nname in ("input_layernorm", "post_attention_layernorm"):
                sd[f"model.layers.{idx}.{nname}.weight"] = \
                    np.asarray(layer[nname]["scale"])
        elif lname == "embed_tokens":
            sd["model.embed_tokens.weight"] = np.asarray(layer["embedding"])
        elif lname == "norm":
            sd["model.norm.weight"] = np.asarray(layer["scale"])
        elif lname == "lm_head":
            sd["lm_head.weight"] = np.ascontiguousarray(np.asarray(layer["kernel"]).T)

    d = str(tmp_path / "awq_ckpt")
    os.makedirs(d)
    save_file(sd, os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({**dataclasses.asdict(cfg),
                   "quantization_config": {"quant_method": "awq", "bits": 4,
                                           "group_size": gs, "zero_point": True,
                                           "version": "gemm"}}, f)

    lm2 = CausalLM.from_quantized_autoawq(d, dtype=jnp.float32)
    assert len(packed_layers) == 2 * 7  # 2 layers x (q,k,v,o,gate,up,down)

    ids = RNG.integers(0, cfg.vocab_size, (1, 8)).astype(np.int32)
    got = np.asarray(lm2.logits(ids))
    assert np.isfinite(got).all()

    # compare against directly pack_params'd model
    from qdm_tpu.quant.apply import pack_params
    lm.params = pack_params(lm.params, lm2.plan)
    lm.plan = lm2.plan
    want = np.asarray(lm.logits(ids))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
