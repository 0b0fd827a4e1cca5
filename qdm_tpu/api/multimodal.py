"""Multimodal model pipelines: CLIP dual-encoder and LLaVA-style VLM.

Parity with the reference's richest shims:

* CLIP — 4 quantizable sections (text, vision, text_projection,
  vision_projection) with independent quantVision/quantText/
  quant*Projection switches (models/clip.py:13-299, base.py:216-404).
* LLaVA — vision tower + mm projector + LLaMA LM, quantized through the
  same scaling-group machinery (models/llava.py:42-90).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qdm_tpu.config import QuantConfig
from qdm_tpu.models import clip_text, llama as llama_lib, vit as vit_lib
from qdm_tpu.models.shims import clip_text_scaling_groups, llama_scaling_groups
from qdm_tpu.quant import apply as qapply
from qdm_tpu.quant import smooth as smooth_lib
from qdm_tpu.quant.plan import QuantPlan, spec_from_config


def _random_init_params(model, args, seed=0):
    rng = np.random.default_rng(seed)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *args))["params"]

    def init_leaf(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("kernel", "embedding") or name.endswith("class_embedding"):
            fan_in = int(np.prod(leaf.shape[:-1])) or 1
            return jnp.asarray(rng.standard_normal(leaf.shape, np.float32)
                               / np.sqrt(fan_in), leaf.dtype)
        if name == "scale":
            return jnp.ones(leaf.shape, leaf.dtype)
        return jnp.zeros(leaf.shape, leaf.dtype)

    return jax.tree_util.tree_map_with_path(init_leaf, shapes)


class CLIPModel:
    """Dual-encoder CLIP with section-wise quantization
    (reference CLIPAWQForCausalLM, models/clip.py)."""

    def __init__(self):
        self.text_config = None
        self.vision_config = None
        self.params: Dict[str, dict] = {}
        self.plans = {"text": QuantPlan(), "vision": QuantPlan(),
                      "text_projection": QuantPlan(), "vision_projection": QuantPlan()}
        self.dtype = jnp.float32
        self.quant_config: Optional[QuantConfig] = None
        self.quantized_sections = []

    @property
    def text_model(self):
        return clip_text.CLIPTextModel(config=self.text_config, dtype=self.dtype,
                                       plan=self.plans["text"], with_projection=True)

    @property
    def vision_model(self):
        return vit_lib.CLIPVisionModel(config=self.vision_config, dtype=self.dtype,
                                       plan=self.plans["vision"], with_projection=True)

    @classmethod
    def from_config(cls, text_config=None, vision_config=None, dtype=jnp.float32,
                    seed: int = 0):
        self = cls()
        self.dtype = dtype
        self.text_config = text_config or clip_text.tiny_clip_config()
        self.vision_config = vision_config or vit_lib.tiny_vit_config()
        ids = jnp.zeros((1, self.text_config.max_position_embeddings), jnp.int32)
        px = jnp.zeros((1, self.vision_config.image_size,
                        self.vision_config.image_size, 3))
        self.params["text"] = _random_init_params(self.text_model, (ids,), seed)
        self.params["vision"] = _random_init_params(self.vision_model, (px,), seed + 1)
        return self

    def get_scalingStates(self, quantVision=False, quantText=True,
                          quantVisionProjection=False, quantTextProjection=False):
        """Which sections get scale migration (projections never do —
        models/clip.py:41-51)."""
        out = []
        if quantText:
            out.append("text")
        if quantVision:
            out.append("vision")
        return out

    def quantize(self, quant_config=None, quantType: str = "sq",
                 quantVision: bool = False, quantText: bool = True,
                 quantVisionProjection: bool = False,
                 quantTextProjection: bool = False,
                 calib_ids=None, calib_pixels=None):
        cfg = quant_config if isinstance(quant_config, QuantConfig) \
            else QuantConfig.from_dict(quant_config)
        cfg.quant_method = quantType.lower()
        self.quant_config = cfg
        method = cfg.quant_method

        sections = []
        if quantText:
            sections.append("text")
        if quantVision:
            sections.append("vision")

        for sec in sections:
            plan = QuantPlan(default=spec_from_config(cfg))
            if not (quantTextProjection if sec == "text" else quantVisionProjection):
                # projections stay fp (models/clip.py:54-64)
                plan = plan.with_rule("projection", None)
            if method in ("sq", "smooth", "smoothquant") and sec in \
                    self.get_scalingStates(quantVision, quantText):
                stats = self._calibrate(sec, calib_ids, calib_pixels)
                groups = clip_text_scaling_groups(self.params[sec])
                alpha = cfg.alpha if cfg.alpha != 0.80 else 0.5
                self.params[sec] = smooth_lib.smooth_params(
                    self.params[sec], groups, stats, alpha=alpha)
            if cfg.version == "real":
                self.params[sec] = qapply.pack_params(self.params[sec], plan)
            else:
                self.params[sec] = qapply.fake_quantize_params(self.params[sec], plan)
            self.plans[sec] = plan
            self.quantized_sections.append(sec)
        return self

    def _calibrate(self, sec: str, calib_ids, calib_pixels):
        from qdm_tpu.calib.stats import RunningMeanMax, flatten_calib

        run = RunningMeanMax()
        if sec == "text":
            model = dataclasses.replace(self.text_model,
                                        plan=self.plans["text"].with_capture(True))
            if calib_ids is None:
                calib_ids = np.zeros((2, self.text_config.max_position_embeddings),
                                     np.int32)
            _, mut = model.apply({"params": self.params["text"]},
                                 jnp.asarray(calib_ids), mutable=["calib"])
        else:
            model = dataclasses.replace(self.vision_model,
                                        plan=self.plans["vision"].with_capture(True))
            if calib_pixels is None:
                calib_pixels = np.zeros((2, self.vision_config.image_size,
                                         self.vision_config.image_size, 3), np.float32)
            _, mut = model.apply({"params": self.params["vision"]},
                                 jnp.asarray(calib_pixels), mutable=["calib"])
        run.update(flatten_calib(mut["calib"]))
        return run.mean()

    def __call__(self, input_ids, pixel_values):
        _, _, t = self.text_model.apply({"params": self.params["text"]},
                                        jnp.asarray(input_ids))
        _, _, v = self.vision_model.apply({"params": self.params["vision"]},
                                          jnp.asarray(pixel_values))
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        return t @ v.T


class LlavaModel:
    """Vision tower + mm projector + LLaMA LM (models/llava.py parity)."""

    def __init__(self):
        self.vision_config = None
        self.lm = None
        self.projector_params = None
        self.vision_params = None
        self.vision_plan = QuantPlan()
        self.dtype = jnp.float32

    @classmethod
    def from_config(cls, vision_config=None, lm_config=None, dtype=jnp.float32,
                    seed: int = 0):
        from qdm_tpu.api.causal_lm import CausalLM

        self = cls()
        self.dtype = dtype
        self.vision_config = vision_config or vit_lib.tiny_vit_config()
        self.lm = CausalLM.from_config(lm_config, dtype=dtype, seed=seed)
        px = jnp.zeros((1, self.vision_config.image_size,
                        self.vision_config.image_size, 3))
        self.vision_params = _random_init_params(self.vision_tower, (px,), seed + 1)
        feat = jnp.zeros((1, 4, self.vision_config.hidden_size))
        self.projector_params = _random_init_params(self.projector, (feat,), seed + 2)
        return self

    @property
    def vision_tower(self):
        return vit_lib.CLIPVisionModel(config=self.vision_config, dtype=self.dtype,
                                       plan=self.vision_plan)

    @property
    def projector(self):
        return vit_lib.LlavaMultiModalProjector(
            text_hidden=self.lm.config.hidden_size, dtype=self.dtype)

    def encode_image(self, pixel_values):
        """Penultimate patch features -> projector -> LM embedding space
        (LLaVA protocol: drop CLS, use penultimate layer)."""
        _, penult, _ = self.vision_tower.apply({"params": self.vision_params},
                                               jnp.asarray(pixel_values))
        feats = penult[:, 1:]
        return self.projector.apply({"params": self.projector_params}, feats)

    def quantize(self, quant_config=None, quantType: str = "awq",
                 quantVision: bool = False, quantText: bool = True,
                 calib_data=None):
        cfg = quant_config if isinstance(quant_config, QuantConfig) \
            else QuantConfig.from_dict(quant_config)
        if quantText:
            self.lm.quantize(quant_config=cfg, quantType=quantType,
                             calib_data=calib_data)
        if quantVision:
            plan = QuantPlan(default=spec_from_config(cfg))
            self.vision_params = qapply.fake_quantize_params(self.vision_params, plan) \
                if cfg.version != "real" else qapply.pack_params(self.vision_params, plan)
            self.vision_plan = plan
        return self

    def logits(self, input_ids, pixel_values=None):
        """Prefix image tokens (if given) before the text tokens
        (LLaVA joint forward)."""
        ids = jnp.asarray(input_ids)
        if pixel_values is None:
            return self.lm.logits(ids)
        embeds = self._joint_embeds(ids, pixel_values)
        out, _ = self.lm.model.apply({"params": self.lm.params},
                                     input_embeds=embeds)
        return out

    def _joint_embeds(self, ids, pixel_values):
        img_emb = self.encode_image(pixel_values)
        tok_emb = self.lm.params["embed_tokens"]["embedding"][jnp.asarray(ids)]
        return jnp.concatenate([img_emb, tok_emb.astype(img_emb.dtype)],
                               axis=1)

    def serve(self, **kw):
        """Megakernel serving engine over the LM backbone — the
        engine-path counterpart of the reference's LlavaFuser
        (models/llava.py:103-148): the vision tower + projector run
        once per request (jitted module path), the LLM decodes through
        the DecodeEngine.  Accepts CausalLM.serve kwargs (mode,
        calib_ids, kv_dtype, ...)."""
        return self.lm.serve(**kw)

    def generate(self, input_ids, pixel_values=None, max_new_tokens=32,
                 engine=None, **kw):
        """Greedy/sampled generation for image+text prompts: image
        patch embeds prefix the token embeds (LLaVA protocol), the
        joint prompt prefills through ``engine.prefill_embeds`` and
        decodes through the megakernels.  Returns the generated
        tokens (B, max_new_tokens).  ``engine`` defaults to a bf16
        DecodeEngine over the LM (built once and cached)."""
        if pixel_values is None:
            out = (engine or self._engine()).generate(
                np.asarray(input_ids), max_new_tokens=max_new_tokens, **kw)
            return out[:, np.asarray(input_ids).shape[1]:]
        embeds = self._joint_embeds(jnp.asarray(input_ids), pixel_values)
        return (engine or self._engine()).generate_embeds(
            embeds, max_new_tokens=max_new_tokens, **kw)

    def _engine(self):
        if getattr(self, "_cached_engine", None) is None:
            from qdm_tpu.api.serve import DecodeEngine

            self._cached_engine = DecodeEngine(self.lm, mode="bf16")
        return self._cached_engine


class LlavaNextModel(LlavaModel):
    """LLaVA-Next (1.6) — AnyRes image-grid tiling over the LLaVA
    stack.  This is the model behind every number in the reference's
    performance curves (/root/reference/performanceCurves.py:4,22-62):
    the image is tiled at one of ``image_grid_pinpoints`` resolutions,
    each tile runs the vision tower + projector, the tile features are
    reassembled spatially, unpadded, and terminated per-row with a
    learned ``image_newline`` embedding, prefixed by a square-resized
    base-image encoding (utils/anyres.py)."""

    def __init__(self):
        super().__init__()
        self.image_newline = None
        self.image_grid_pinpoints = None

    @classmethod
    def from_config(cls, vision_config=None, lm_config=None,
                    dtype=jnp.float32, seed: int = 0,
                    image_grid_pinpoints=None):
        self = super().from_config(vision_config=vision_config,
                                   lm_config=lm_config, dtype=dtype,
                                   seed=seed)
        t = self.vision_config.image_size
        # default pinpoints scale with the tower tile (LLaVA-1.6 uses
        # {1x2, 2x1, 2x2, 3x1, 1x3} of 336px tiles)
        self.image_grid_pinpoints = image_grid_pinpoints or [
            (t, 2 * t), (2 * t, t), (2 * t, 2 * t), (3 * t, t), (t, 3 * t)]
        rng = np.random.default_rng(seed + 3)
        d = self.lm.config.hidden_size
        self.image_newline = jnp.asarray(
            rng.standard_normal(d, np.float32) / np.sqrt(d))
        return self

    def encode_image_anyres(self, image: np.ndarray):
        """One (H, W, 3) image -> (1, n_tokens, text_hidden) AnyRes
        features: [base tile | unpadded grid w/ per-row newline]."""
        from qdm_tpu.utils import anyres

        t = self.vision_config.image_size
        ppt = t // self.vision_config.patch_size
        patches, grid, orig = anyres.anyres_preprocess(
            np.asarray(image, np.float32), t, self.image_grid_pinpoints)
        feats = self.encode_image(patches)         # (1+gh*gw, ppt*ppt, d)
        base = feats[0]
        packed = anyres.pack_grid_features(feats[1:], grid, ppt, orig,
                                           self.image_newline)
        return jnp.concatenate([base, packed], axis=0)[None]

    def logits(self, input_ids, pixel_values=None, image=None):
        """``image``: one raw (H, W, 3) image routed through AnyRes;
        ``pixel_values``: pre-tiled batch (plain-LLaVA path)."""
        if image is None:
            return super().logits(input_ids, pixel_values)
        ids = jnp.asarray(input_ids)
        img_emb = self.encode_image_anyres(image)
        tok_emb = self.lm.params["embed_tokens"]["embedding"][ids]
        embeds = jnp.concatenate(
            [jnp.broadcast_to(img_emb, (ids.shape[0],) + img_emb.shape[1:]),
             tok_emb.astype(img_emb.dtype)], axis=1)
        out, _ = self.lm.model.apply({"params": self.lm.params},
                                     input_embeds=embeds)
        return out

    def generate(self, input_ids, pixel_values=None, image=None,
                 max_new_tokens=32, engine=None, **kw):
        if image is None:
            return super().generate(input_ids, pixel_values,
                                    max_new_tokens=max_new_tokens,
                                    engine=engine, **kw)
        ids = jnp.asarray(input_ids)
        img_emb = self.encode_image_anyres(image)
        tok_emb = self.lm.params["embed_tokens"]["embedding"][ids]
        embeds = jnp.concatenate(
            [jnp.broadcast_to(img_emb, (ids.shape[0],) + img_emb.shape[1:]),
             tok_emb.astype(img_emb.dtype)], axis=1)
        return (engine or self._engine()).generate_embeds(
            embeds, max_new_tokens=max_new_tokens, **kw)


class Qwen2VLModel:
    """Qwen2-VL-style VLM: smart-resized images (utils/vl_preprocess ==
    reference utils/qwen_vl_utils.py) -> ViT patch grid -> 2x2 patch
    merger -> Qwen2 LM.  This is the in-tree consumer of the VL
    preprocessing utilities the reference ships for Qwen2-VL
    calibration (qwen_vl_utils.py:321-338)."""

    def __init__(self):
        self.vision_config = None
        self.lm = None
        self.vision_params = None
        self.merger_params = None
        self.vision_plan = QuantPlan()
        self.dtype = jnp.float32

    @classmethod
    def from_config(cls, vision_config=None, lm_config=None,
                    dtype=jnp.float32, seed: int = 0):
        from qdm_tpu.api.causal_lm import CausalLM
        from qdm_tpu.models.registry import LLM_CONFIG_PRESETS

        self = cls()
        self.dtype = dtype
        self.vision_config = vision_config or vit_lib.tiny_vit_config()
        self.lm = CausalLM.from_config(
            lm_config or dataclasses.replace(LLM_CONFIG_PRESETS["tiny"],
                                             attention_bias=True),
            dtype=dtype, seed=seed)
        px = jnp.zeros((1, self.vision_config.image_size,
                        self.vision_config.image_size, 3))
        self.vision_params = _random_init_params(self.vision_tower, (px,),
                                                 seed + 1)
        g = self.vision_config.image_size // self.vision_config.patch_size
        grid = jnp.zeros((1, g, g, self.vision_config.hidden_size))
        self.merger_params = _random_init_params(self.merger, (grid,), seed + 2)
        return self

    @property
    def vision_tower(self):
        return vit_lib.CLIPVisionModel(config=self.vision_config,
                                       dtype=self.dtype, plan=self.vision_plan)

    @property
    def merger(self):
        return vit_lib.Qwen2VLPatchMerger(
            text_hidden=self.lm.config.hidden_size, dtype=self.dtype)

    def preprocess(self, messages):
        """Chat-format messages -> normalized image batch via the
        reference's vision-info pipeline (process_vision_info)."""
        from qdm_tpu.utils.vl_preprocess import process_vision_info

        images, _videos = process_vision_info(messages)
        if not images:
            return None
        s = self.vision_config.image_size
        out = []
        for im in images:
            arr = np.asarray(im, np.float32)
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, -1)
            # smart_resize aligned the dims; adapt to the tower's fixed
            # square input with a center crop / pad
            h, w = arr.shape[:2]
            if h < s or w < s:
                arr = np.pad(arr, ((0, max(0, s - h)), (0, max(0, s - w)),
                                   (0, 0)))
                h, w = arr.shape[:2]
            y0, x0 = (h - s) // 2, (w - s) // 2
            out.append(arr[y0:y0 + s, x0:x0 + s])
        return np.stack(out)

    def encode_image(self, pixel_values):
        _, penult, _ = self.vision_tower.apply({"params": self.vision_params},
                                               jnp.asarray(pixel_values))
        feats = penult[:, 1:]                       # drop CLS
        b, n, h = feats.shape
        g = int(np.sqrt(n))
        grid = feats.reshape(b, g, g, h)
        return self.merger.apply({"params": self.merger_params}, grid)

    def quantize(self, quant_config=None, quantType: str = "awq",
                 quantVision: bool = False, quantText: bool = True,
                 calib_data=None):
        cfg = quant_config if isinstance(quant_config, QuantConfig) \
            else QuantConfig.from_dict(quant_config)
        if quantText:
            self.lm.quantize(quant_config=cfg, quantType=quantType,
                             calib_data=calib_data)
        if quantVision:
            plan = QuantPlan(default=spec_from_config(cfg))
            self.vision_params = (
                qapply.fake_quantize_params(self.vision_params, plan)
                if cfg.version != "real"
                else qapply.pack_params(self.vision_params, plan))
            self.vision_plan = plan
        return self

    def logits(self, input_ids, messages=None, pixel_values=None):
        """Joint forward: merged image tokens prefix the text tokens."""
        ids = jnp.asarray(input_ids)
        if pixel_values is None and messages is not None:
            pixel_values = self.preprocess(messages)
        if pixel_values is None:
            return self.lm.logits(ids)
        img_emb = self.encode_image(pixel_values)
        tok_emb = self.lm.params["embed_tokens"]["embedding"][ids]
        embeds = jnp.concatenate([img_emb, tok_emb.astype(img_emb.dtype)],
                                 axis=1)
        out, _ = self.lm.model.apply({"params": self.lm.params},
                                     input_embeds=embeds)
        return out
