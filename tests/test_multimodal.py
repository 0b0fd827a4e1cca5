"""CLIP dual-encoder + LLaVA VLM pipeline tests (reference
models/clip.py + models/llava.py parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qdm_tpu.api.multimodal import CLIPModel, LlavaModel
from qdm_tpu.config import QuantConfig

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def clip():
    return CLIPModel.from_config(dtype=jnp.float32)


def _inputs(clip):
    ids = RNG.integers(0, 128, (2, clip.text_config.max_position_embeddings)).astype(np.int32)
    px = RNG.standard_normal((2, clip.vision_config.image_size,
                              clip.vision_config.image_size, 3)).astype(np.float32)
    return ids, px


def test_clip_similarity(clip):
    ids, px = _inputs(clip)
    sim = np.asarray(clip(ids, px))
    assert sim.shape == (2, 2)
    assert np.isfinite(sim).all() and np.abs(sim).max() <= 1.001


def test_clip_quantize_sections(clip):
    m = CLIPModel.from_config(dtype=jnp.float32)
    ids, px = _inputs(m)
    base = np.asarray(m(ids, px))
    m.quantize({"w_bit": 8, "q_group_size": 0, "weight_quant_type": "per_channel",
                "version": "fake"}, quantType="sq", quantText=True, quantVision=True,
               calib_ids=ids, calib_pixels=px)
    assert set(m.quantized_sections) == {"text", "vision"}
    sim = np.asarray(m(ids, px))
    assert np.isfinite(sim).all()
    assert np.abs(sim - base).max() < 0.2


def test_clip_projection_exclusion(clip):
    m = CLIPModel.from_config(dtype=jnp.float32)
    proj_before = np.asarray(m.params["text"]["text_projection"]["kernel"])
    m.quantize({"w_bit": 4, "q_group_size": 0, "weight_quant_type": "per_channel",
                "version": "fake"}, quantType="rtn", quantText=True,
               quantTextProjection=False)
    np.testing.assert_array_equal(
        np.asarray(m.params["text"]["text_projection"]["kernel"]), proj_before)


def test_llava_joint_forward_and_quant():
    m = LlavaModel.from_config(dtype=jnp.float32)
    ids = RNG.integers(0, 256, (1, 6)).astype(np.int32)
    px = RNG.standard_normal((1, 16, 16, 3)).astype(np.float32)
    logits = np.asarray(m.logits(ids, px))
    n_img_tokens = (16 // 8) ** 2 - 0  # penultimate drops CLS -> 4 patches
    assert logits.shape == (1, 4 + 6, 256)
    assert np.isfinite(logits).all()

    m.quantize({"w_bit": 8, "q_group_size": 32, "version": "fake"},
               quantType="rtn", quantVision=True, quantText=True)
    q = np.asarray(m.logits(ids, px))
    assert np.isfinite(q).all()


def test_qwen2vl_consumes_vl_preprocess():
    """Qwen2-VL model consumes process_vision_info output end-to-end
    (the reference ships qwen_vl_utils.py for exactly this calibration
    path)."""
    import numpy as np
    from PIL import Image

    from qdm_tpu.api.multimodal import Qwen2VLModel

    m = Qwen2VLModel.from_config(dtype=jnp.float32)
    img = Image.fromarray(
        (np.random.default_rng(0).random((40, 52, 3)) * 255).astype(np.uint8))
    messages = [{"role": "user",
                 "content": [{"type": "image", "image": img},
                             {"type": "text", "text": "describe"}]}]
    px = m.preprocess(messages)
    s = m.vision_config.image_size
    assert px.shape[1:] == (s, s, 3)
    ids = np.zeros((1, 6), np.int32)
    out = m.logits(ids, messages=messages)
    n_img_tokens = ((s // m.vision_config.patch_size) // 2) ** 2
    assert out.shape == (1, n_img_tokens + 6, m.lm.config.vocab_size)
    assert np.isfinite(np.asarray(out)).all()

    # quantized text side still works jointly
    m.quantize({"w_bit": 8, "a_bit": 16, "q_group_size": 0,
                "weight_quant_type": "per_channel", "version": "fake"},
               quantType="rtn")
    out2 = m.logits(ids, messages=messages)
    assert np.isfinite(np.asarray(out2)).all()


def test_llava_engine_generation_matches_naive():
    """VLM serving through the DecodeEngine (prefill_embeds): greedy
    generation on an image+text prompt equals a naive per-step full
    forward through LlavaModel.logits — the engine-path counterpart of
    the reference's LlavaFuser (models/llava.py:103-148)."""
    import numpy as np

    m = LlavaModel.from_config(dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, m.lm.config.vocab_size, (2, 5))
    px = rng.normal(size=(2, m.vision_config.image_size,
                          m.vision_config.image_size, 3)).astype(np.float32)
    got = m.generate(ids, px, max_new_tokens=6)
    assert got.shape == (2, 6)

    # naive reference: re-run the joint forward per step, append argmax
    cur = jnp.asarray(ids)
    out = []
    for _ in range(6):
        lg = m.logits(cur, px)
        nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        out.append(np.asarray(nxt))
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(got, np.stack(out, axis=1))


def test_llava_serve_quantized_engine():
    """LlavaModel.serve builds a quantized megakernel engine over the
    LM backbone; image+text generation runs through it end-to-end."""
    import numpy as np

    m = LlavaModel.from_config(dtype=jnp.float32)
    rng = np.random.default_rng(4)
    ids = rng.integers(0, m.lm.config.vocab_size, (2, 5))
    px = rng.normal(size=(2, m.vision_config.image_size,
                          m.vision_config.image_size, 3)).astype(np.float32)
    eng = m.serve(mode="w8a8_static", calib_ids=ids)
    out = eng.generate_embeds(m._joint_embeds(jnp.asarray(ids), px),
                              max_new_tokens=5)
    assert out.shape == (2, 5)
    assert np.isfinite(out).all()
    # the convenience wrapper routes through the same engine
    out2 = m.generate(ids, px, max_new_tokens=5, engine=eng)
    np.testing.assert_array_equal(out, out2)
