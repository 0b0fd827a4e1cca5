"""Diffusion pipeline with the reference's public lifecycle:

    pipe = StableDiffusion1_x.from_pretrained(path)       (base.py:143-212)
    pipe.quantize(quant_config, quantType='sq'|'awq'|'rtn')  (base.py:215-528)
    images = pipe.generate(prompts, ...)                  (base.py:828-850)
    pipe.save_quantized(dir)                              (base.py:530-582)
    pipe = StableDiffusion1_x.from_quantized(dir)         (base.py:736-826)

TPU-native restructuring: components are (module_def, params) pairs; the
whole CFG denoising loop is one jitted ``lax.fori_loop``; quantization
transforms the params pytree and rebuilds the module tree with a new
QuantPlan; sampling shards the batch across a ``jax.sharding.Mesh``.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import pickle
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qdm_tpu.api import loader
from qdm_tpu.calib.stats import RunningMeanMax, flatten_calib
from qdm_tpu.config import QuantConfig
from qdm_tpu.models import clip_text, schedulers, unet as unet_lib, vae as vae_lib
from qdm_tpu.models.shims import sd_unet_scaling_groups, clip_text_scaling_groups
from qdm_tpu.quant import apply as qapply
from qdm_tpu.quant import awq as awq_lib
from qdm_tpu.quant import smooth as smooth_lib
from qdm_tpu.quant.plan import LayerQuantSpec, QuantPlan, spec_from_config
from qdm_tpu.utils.tokenizer import SimpleTokenizer, load_tokenizer


QUANTIZABLE_COMPONENTS = ("unet", "text_encoder", "vae", "transformer")


class BaseDiffusionPipeline:
    """Shared lifecycle for SD1.x / SDXL / SD3.x (reference
    BaseAWQForDiffusion, models/base.py:106-850)."""

    model_type = "base"
    has_unet = True
    has_transformer = False

    def __init__(self):
        self.components: Dict[str, Any] = {}      # name -> module def
        self.params: Dict[str, dict] = {}         # name -> params tree
        self.configs: Dict[str, Any] = {}         # name -> config dataclass
        self.plans: Dict[str, QuantPlan] = {n: QuantPlan() for n in QUANTIZABLE_COMPONENTS}
        self.tokenizer = None
        self.scheduler_config = schedulers.SD15_SCHED
        self.quant_config: Optional[QuantConfig] = None
        self.quantized_components: List[str] = []
        self.is_quantized = False
        self.dtype = jnp.bfloat16
        self.mesh = None  # set via with_mesh() for multi-chip sampling
        self.refiner = None  # SDXL only (StableDiffusionXL.py:13-17)
        # per-denoise-step static act-scale LUTs (QuantConfig.
        # act_per_step_scales): component -> {layer_path: (n_steps,)}
        self.act_scale_luts: Dict[str, dict] = {}
        self._pending_per_step = None
        # diffusers enable_vae_slicing parity: decode the VAE in
        # sub-batches of this size (None = whole batch).  At 1024px the
        # decoder's conv activations are the HBM peak — batch-4 SD3.5
        # OOMs on the 16 GB chip with the transformer resident
        self._vae_chunk: Optional[int] = None

    def with_mesh(self, mesh=None, tp: bool = False):
        """Shard sampling/calibration over a device mesh: batch over
        'data', optional tensor-parallel params over 'model'
        (SURVEY.md §2c: the reference has no data parallelism; this is
        the images/sec/chip scaling axis)."""
        from qdm_tpu.parallel.mesh import make_mesh, shard_params

        self.mesh = mesh if mesh is not None else make_mesh()
        for name in self.params:
            self.params[name] = shard_params(self.params[name], self.mesh, tp=tp)
        return self

    def _shard_batch(self, *arrays):
        if self.mesh is None:
            return arrays
        from qdm_tpu.parallel.mesh import batch_sharding

        return tuple(jax.device_put(a, batch_sharding(self.mesh))
                     if a is not None and a.ndim >= 1 else a for a in arrays)

    # ------------------------------------------------------------------ load

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16,
                        refiner_path: Optional[str] = None):
        """Load a local diffusers-format checkpoint directory.
        refiner_path: optional SDXL refiner checkpoint (reference
        base.py:181-183 / StableDiffusionXL.py:13-17); other families
        reject it (StableDiffusion1_x.py:9-10)."""
        self = cls()
        self.dtype = dtype
        self._load_components(path)
        if refiner_path is not None:
            self._load_refiner(refiner_path)
        return self

    def _load_refiner(self, path: str):
        raise ValueError(
            f"{self.model_type} has no refiner model (only SDXL does)")

    @classmethod
    def from_config(cls, overrides: Optional[dict] = None, dtype=jnp.bfloat16,
                    seed: int = 0, tiny: bool = False):
        """Random-init pipeline from architecture configs (tests/bench —
        throughput is weight-independent)."""
        self = cls()
        self.dtype = dtype
        self._build_default_configs(tiny=tiny, overrides=overrides or {})
        self._random_init(seed)
        self.tokenizer = SimpleTokenizer(
            vocab_size=self.configs["text_encoder"].vocab_size,
            max_len=self.configs["text_encoder"].max_position_embeddings)
        return self

    # hooks that subclasses specialize -----------------------------------

    def _build_default_configs(self, tiny: bool, overrides: dict):
        raise NotImplementedError

    def _encode_prompts(self, prompts: Sequence[str], negative: Optional[Sequence[str]]):
        raise NotImplementedError

    # shared machinery -----------------------------------------------------

    def _module(self, name: str):
        """(Re)build a component's module def with its current plan."""
        cfg = self.configs[name]
        if name == "unet":
            return unet_lib.UNet2DCondition(config=cfg, dtype=self.dtype,
                                            plan=self.plans["unet"])
        if name == "text_encoder" or name == "text_encoder_2":
            return clip_text.CLIPTextModel(
                config=cfg, dtype=self.dtype, plan=self.plans["text_encoder"],
                with_projection=(name == "text_encoder_2"))
        if name == "vae":
            return vae_lib.AutoencoderKL(config=cfg, dtype=self.dtype,
                                         plan=self.plans["vae"])
        raise KeyError(name)

    def _random_init(self, seed: int):
        rng = np.random.default_rng(seed)
        for name in self.components:
            m = self._module(name)
            args = self._init_args(name)
            shapes = jax.eval_shape(
                lambda m=m, args=args: m.init(jax.random.PRNGKey(0), *args))["params"]

            def init_leaf(path, leaf):
                # store float params in the PIPELINE dtype (bf16 by
                # default) — the Flax param_dtype default of f32 put
                # SD3.5-medium at 9.7 GB / the SDXL UNet at 10.4 GB of
                # weights alone, which is what ran the 16 GB chip out
                # of HBM at 1024px (the reference's fp16 pipelines hold
                # half-precision weights the same way); compute paths
                # already cast per-module
                name_ = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
                tgt = (self.dtype if jnp.issubdtype(leaf.dtype, jnp.floating)
                       else leaf.dtype)
                if name_ in ("kernel", "embedding"):
                    fan_in = int(np.prod(leaf.shape[:-1])) or 1
                    v = rng.standard_normal(leaf.shape, np.float32) / np.sqrt(fan_in)
                    return jnp.asarray(v, tgt)
                if name_ == "scale":
                    return jnp.ones(leaf.shape, tgt)
                return jnp.zeros(leaf.shape, tgt)

            self.params[name] = jax.tree_util.tree_map_with_path(init_leaf, shapes)
            self.components[name] = m

    def _init_args(self, name: str):
        if name == "unet":
            cfg = self.configs["unet"]
            s = max(cfg.sample_size, 8)
            added = None
            if cfg.addition_embed_type == "text_time":
                if "text_encoder_2" in self.configs:
                    te_dim = self.configs["text_encoder_2"].projection_dim
                    n_ids = ((cfg.projection_class_embeddings_input_dim - te_dim)
                             // cfg.addition_time_embed_dim)
                else:
                    n_ids = 6
                    te_dim = (cfg.projection_class_embeddings_input_dim
                              - n_ids * cfg.addition_time_embed_dim)
                added = {"text_embeds": jnp.zeros((1, te_dim)),
                         "time_ids": jnp.zeros((1, n_ids))}
            ctx_len = 16
            args = (jnp.zeros((1, s, s, cfg.in_channels)), jnp.zeros((1,), jnp.int32),
                    jnp.zeros((1, ctx_len, cfg.cross_attention_dim)))
            return args if added is None else args + (added,)
        if name in ("text_encoder", "text_encoder_2"):
            return (jnp.zeros((1, self.configs[name].max_position_embeddings),
                              jnp.int32),)
        if name == "vae":
            cfg = self.configs[name]
            return (jnp.zeros((1, 8, 8, cfg.latent_channels)),)
        raise KeyError(name)

    def _load_components(self, path: str):
        self._build_configs_from_dir(path)
        for name in list(self.components):
            sub = os.path.join(path, name)
            m = self._module(name)
            args = self._init_args(name)
            shapes = jax.eval_shape(
                lambda m=m, args=args: m.init(jax.random.PRNGKey(0), *args))["params"]
            sd = loader.load_safetensors_dir(sub)
            if name == "text_encoder_3":
                prefixes = ("encoder.",)       # T5EncoderModel keys
            elif "text_encoder" in name:
                prefixes = ("text_model.",)
            else:
                prefixes = ()
            params, missing, unused = loader.convert_torch_state_dict(
                sd, shapes, strip_prefixes=prefixes)
            if missing:
                raise ValueError(f"{name}: missing {len(missing)} params, e.g. {missing[:5]}")
            self.params[name] = params
            self.components[name] = m
        tok_dir = os.path.join(path, "tokenizer")
        self.tokenizer = load_tokenizer(tok_dir, self.configs["text_encoder"])

    def _build_configs_from_dir(self, path: str):
        raise NotImplementedError

    # -------------------------------------------------------------- quantize

    def checkQuantStatus(self, quantUnet=True, quantTextEncoder=False,
                         quantVAE=False, quantTransformer=False):
        """Reject component choices the family doesn't have
        (StableDiffusion1_x.py:35-37 / StableDiffusion3_5.py:33-35)."""
        if quantTransformer and not self.has_transformer:
            raise ValueError("this diffusion model has no transformer")
        if quantUnet and not self.has_unet:
            raise ValueError("this diffusion model has no unet")

    def quantize(self, quant_config: Optional[dict] = None, quantType: str = "sq",
                 quantUnet: bool = True, quantTextEncoder: bool = False,
                 quantVAE: bool = False, quantTransformer: bool = False,
                 quant_act: Optional[bool] = None,
                 calib_prompts: Optional[Sequence[str]] = None,
                 calib_cache: Optional[str] = None,
                 debugSavePath: Optional[str] = None,
                 debugPlot: bool = False,
                 smooth: bool = False):
        """Quantize selected components (reference base.py:215-528).
        smooth=True (quantType='gptq' only) runs the SmoothQuant
        migration before the Hessian capture — the composed
        smooth+gptq quantizer (the measured best w4 on the LLM
        outlier tables; Grams MUST be captured after migration, the
        layer inputs change by 1/s)."""
        self.checkQuantStatus(quantUnet, quantTextEncoder, quantVAE, quantTransformer)
        cfg = quant_config if isinstance(quant_config, QuantConfig) \
            else QuantConfig.from_dict(quant_config)
        cfg.quant_method = quantType.lower()
        if quant_act is not None:
            cfg.quantize_act = quant_act
        if cfg.quantize_act and cfg.version == "fake":
            cfg.version = "fake_act"   # base.py:424-426
        self.quant_config = cfg

        targets = []
        if quantUnet and self.has_unet:
            targets.append("unet")
        if quantTransformer and self.has_transformer:
            targets.append("transformer")
        if quantTextEncoder:
            targets += [n for n in self.components if n.startswith("text_encoder")]
        if quantVAE:
            targets.append("vae")

        method = cfg.quant_method
        if smooth and method != "gptq":
            raise ValueError("smooth=True composes with quantType='gptq' "
                             "only; plain smoothing is quantType='sq'")
        for name in targets:
            comp_key = "text_encoder" if name.startswith("text_encoder") else name
            plan = self._make_plan(cfg, comp_key)
            pre_params = self.params[name] if debugSavePath else None
            act_stats = None
            gptq_grams = None
            self._pending_per_step = None
            if method in ("sq", "smooth", "smoothquant"):
                act_stats = self._smoothquant_component(
                    name, cfg, calib_cache=calib_cache,
                    calib_prompts=calib_prompts)
            elif method == "awq":
                self._awq_component(name, cfg, calib_prompts=calib_prompts)
            elif method == "gptq" and name in ("unet", "transformer"):
                # beyond-reference (quant/gptq.py): Hessian-aware
                # error-compensated placement for the denoiser's dense
                # layers (convs fall back to the shared RTN grids).
                # GPTQ's output IS the quantized weight, so this
                # component skips the fake-quant transform below; for
                # version='real' the packs carry the search's own
                # codes/scales (gptq_pack_params in the real block).
                if smooth:
                    # SmoothQuant migration FIRST (mutates weights);
                    # the Gram capture below then sees the migrated
                    # inputs — the composed smooth+gptq quantizer
                    self._smoothquant_component(
                        name, cfg, calib_cache=calib_cache,
                        calib_prompts=calib_prompts)
                act_stats, gptq_grams = self._gptq_component(
                    name, cfg, plan, calib_prompts=calib_prompts)
            elif method == "rtn" and cfg.version == "real" \
                    and cfg.quantize_act and "static" in (
                        cfg.act_quant_type, cfg.act_quant_conv_type):
                # capture-only calibration (no scale migration): static
                # int8 act scales need real ranges even without
                # smoothing — this is also the smoothing ABLATION path
                # (quality_table's W8A8-static RTN row)
                act_stats = self._calibrate_component_stats(
                    name, cfg, calib_prompts=calib_prompts)
            if cfg.version == "real":
                if plan.fuse_qkv:
                    # after scale migration (its groups address unfused
                    # paths), before packing — fuse_qkv_params contract
                    self.params[name] = qapply.fuse_qkv_params(
                        self.params[name])
                if method == "gptq" and gptq_grams:
                    from qdm_tpu.quant import gptq as gptq_lib

                    if plan.fuse_qkv:
                        gptq_grams = gptq_lib.remap_fused_grams(gptq_grams)
                    self.params[name] = gptq_lib.gptq_pack_params(
                        self.params[name], plan, gptq_grams,
                        act_stats=act_stats,
                        act_margin=getattr(cfg, "static_act_margin", 1.0))
                else:
                    self.params[name] = qapply.pack_params(
                        self.params[name], plan, act_stats=act_stats,
                        act_margin=getattr(cfg, "static_act_margin", 1.0))
                if act_stats:
                    # calibrated static act scales for int8 convs
                    self.params[name] = qapply.fill_static_act_scales(
                        self.params[name], act_stats,
                        margin=getattr(cfg, "static_act_margin", 1.0))
                if self._pending_per_step and getattr(
                        cfg, "act_per_step_scales", False):
                    lut = qapply.build_act_scale_lut(
                        self.params[name], self._pending_per_step,
                        margin=getattr(cfg, "static_act_margin", 1.0))
                    if lut:
                        self.act_scale_luts[name] = lut
                self._pending_per_step = None
            elif not (method == "gptq" and name in ("unet", "transformer")):
                self.params[name] = qapply.fake_quantize_params(self.params[name], plan)
            self.plans[comp_key] = plan
            self.components[name] = self._module(name)
            self.quantized_components.append(name)
            if debugSavePath:
                # debug artifacts (reference debugPlot/debugSavePath,
                # quantizer.py:277-384) — arrays/JSON first, PNGs optional
                from qdm_tpu.utils import diagnostics as diag

                os.makedirs(debugSavePath, exist_ok=True)
                hists = diag.weight_histograms(self.params[name], max_layers=64)
                diag.save_report(hists, os.path.join(debugSavePath,
                                                     f"{name}_hists.json"))
                if cfg.version != "real":
                    rep = diag.quantization_error_report(pre_params,
                                                         self.params[name])
                    diag.save_report(rep, os.path.join(
                        debugSavePath, f"{name}_quant_error.json"))
                if debugPlot:
                    diag.plot_histograms(hists, os.path.join(debugSavePath,
                                                             f"{name}_hists"))
        self.is_quantized = True
        return self

    def _make_plan(self, cfg: QuantConfig, component: str) -> QuantPlan:
        dense_spec = spec_from_config(cfg, conv=False)
        conv_spec = spec_from_config(cfg, conv=True)
        if component == "vae" and conv_spec.mode == "w8a8" \
                and conv_spec.act_quant == "static" \
                and getattr(cfg, "vae_per_channel_acts", True):
            # the VAE decoder's per-channel dynamic range breaks
            # per-tensor int8 acts (PSNR 30.6 -> 15.1, BENCH_NOTES
            # round 2); use the per-input-channel static scheme (scales
            # folded into the weights at pack time — same runtime cost,
            # reference per-channel conv act quant fake_quant.py:123-131)
            conv_spec = dataclasses.replace(conv_spec,
                                            act_quant="static_channel")
        rules = [("conv", conv_spec), ("kernel4d", conv_spec)]
        # conv layers are distinguished by module name ('conv' substring
        # covers conv_in/conv1/conv2/conv_shortcut/conv_out/downsamplers/
        # upsamplers convs and proj_in/out convs are 1x1 -> treated dense-like)
        if cfg.quantize_act and cfg.a_bit < 16 and cfg.version == "fake_act":
            # q/k/v outputs feed the attention bmm: the reference fake-
            # quantizes them (quantize_bmm_input, quantizer_SQ.py:463)
            qkv_spec = dataclasses.replace(dense_spec, quantize_output=True)
            for pat in ("to_q", "to_k", "to_v", "q_proj", "k_proj", "v_proj"):
                rules.append((pat, qkv_spec))
        # int8 self-attention BMMs (the real-kernel counterpart of
        # quantize_bmm_input) run via the fused Pallas int8 flash
        # kernel behind QuantPlan.int8_bmm, but stay OFF by default:
        # bf16 attention is faster at batch-8 CFG (the D=40/80 heads
        # pad the 128-lane MXU, so bf16 already sits at the padding
        # roofline — bench_attn_int8.py) and skipping the attention-
        # input quantization is also more accurate
        fuse = False
        if component == "unet" and cfg.version == "real":
            # Serving-path plan shape, selected by measurement
            # (/tmp/plan_bisect on v5e, BENCH_NOTES.md):
            # * fused QKV is worth 2.2x on the int8 path — three
            #   narrow (N=320-1280) int8 matmuls each pay their own
            #   act-quant prologue + dequant epilogue, one 3x-wide
            #   matmul amortizes them (bf16 barely cares)
            # * time embeddings stay fp (negligible FLOPs, feeds every
            #   AdaGN/resnet)
            fuse = True
            noq = LayerQuantSpec(mode="none")
            rules += [("time_emb", noq), ("time_embedding", noq),
                      ("add_embedding", noq)]
            rules += list(self._arch_plan_rules(cfg))
        plan = QuantPlan(default=dense_spec, rules=tuple(rules), fuse_qkv=fuse)
        for pat in (cfg.modules_to_not_convert or []):
            plan = plan.with_rule(pat, None)
        return plan

    def _arch_plan_rules(self, cfg: QuantConfig):
        """Architecture-specific measured plan extras (none by default)."""
        return ()

    # --- calibration (diffusion): run the denoising loop with stats capture

    def _calibrate_unet(self, cfg: QuantConfig,
                        calib_prompts: Optional[Sequence[str]] = None):
        """Per-channel absmax of every linear input, mean over denoise
        steps (quantizer_SQ.py:323-356 + calib_data.py:174-245)."""
        from qdm_tpu.calib.data import get_calib_prompts

        calib = cfg.calib
        prompts = list(calib_prompts) if calib_prompts else get_calib_prompts(
            calib.dataset, calib.n_samples)
        plan = self.plans["unet"].with_capture(True)
        capture_unet = dataclasses.replace(self._unet_module(), plan=plan)

        run = RunningMeanMax()
        per_step = bool(getattr(cfg, "act_per_step_scales", False))
        bs = calib.batch_size
        steps = max(1, min(calib.n_steps, 50))
        runs = [RunningMeanMax() for _ in range(steps)] if per_step else None
        tables = schedulers.make_ddim(self.scheduler_config, steps)
        h = w = self.default_sample_size()
        for i in range(0, len(prompts), bs):
            batch = prompts[i:i + bs]
            ctx, uctx, added = self._encode_prompts(batch, None)
            latents = jax.random.normal(
                # per-batch noise: fold the batch index into the seed so
                # calibration sees diverse initial latents (the reference
                # draws fresh noise per sample, calib_data.py:139-172)
                jax.random.fold_in(jax.random.PRNGKey(calib.seed), i // bs),
                (len(batch), h, w, self.latent_channels()), jnp.float32)
            step_fn = self._make_calib_step(capture_unet, tables, steps,
                                            cfg.calib.guidance_scale)
            lat = latents
            for s in range(steps):
                lat, stats = step_fn(self.params["unet"], lat, ctx, uctx, added, s)
                run.update(stats)
                if runs is not None:
                    runs[s].update(stats)
        mean = run.mean()
        if runs is not None:
            # DiTAS-style extension: keep the per-step absmax (the
            # reference collapses it, StableDiffusion1_x.py:104-112)
            self._pending_per_step = {
                k: jnp.stack([r.mean()[k] for r in runs]) for k in mean}
        return mean

    def _unet_module(self):
        return self.components["unet"]

    def _make_calib_step(self, capture_unet, tables, steps, guidance):
        @jax.jit
        def step_fn(params, lat, ctx, uctx, added, s):
            t = tables.timesteps[s]
            lat_in = jnp.concatenate([lat, lat], axis=0)
            ctx_in = jnp.concatenate([uctx, ctx], axis=0)
            tt = jnp.broadcast_to(t, (lat_in.shape[0],))
            args = (lat_in, tt, ctx_in) + ((added,) if added is not None else ())
            out, mut = capture_unet.apply({"params": params}, *args,
                                          mutable=["calib"])
            eps_u, eps_c = jnp.split(out, 2, axis=0)
            eps = eps_u + guidance * (eps_c - eps_u)
            new_lat = schedulers.ddim_step(tables, eps, lat, s, steps)
            return new_lat, flatten_calib(mut["calib"])
        return step_fn

    def _smoothquant_component(self, name: str, cfg: QuantConfig,
                               calib_cache: Optional[str] = None,
                               calib_prompts: Optional[Sequence[str]] = None):
        if name in ("unet", "transformer"):
            from qdm_tpu.calib.stats import load_stats, save_stats

            per_step = bool(getattr(cfg, "act_per_step_scales", False))
            if calib_cache and os.path.exists(calib_cache) and (
                    not per_step
                    or os.path.exists(calib_cache + ".per_step")):
                stats = load_stats(calib_cache)
                if per_step:
                    self._pending_per_step = load_stats(
                        calib_cache + ".per_step")
            else:
                stats = self._calibrate_unet(cfg, calib_prompts=calib_prompts)
                if calib_cache:
                    save_stats(stats, calib_cache)
                    if per_step and self._pending_per_step:
                        save_stats(self._pending_per_step,
                                   calib_cache + ".per_step")
            groups = sd_unet_scaling_groups(self.params[name])
            alpha = cfg.alpha  # 0.80 for diffusion (quantizer_SQ.py:349)
        elif name == "vae":
            # no smoothing groups (not in the reference either), but
            # int8-conv VAE decode still needs calibrated static act
            # scales — without them every act_scale is the 1.0
            # placeholder and the decoder saturates (measured: PSNR
            # 30.6 -> 17.5)
            return self._calibrate_vae(cfg)
        else:
            return None  # text encoder smoothing: not in reference either
        self.params[name], mig = smooth_lib.smooth_params(
            self.params[name], groups, stats, alpha=alpha,
            return_scales=True)
        # post-smooth activations entering a migrated layer are act/s:
        # adjust the stats so the static int8 scales reflect the
        # smoothed (outlier-free) range, not the raw one
        stats = {k: (v / mig[k] if k in mig else v) for k, v in stats.items()}
        if self._pending_per_step:
            self._pending_per_step = {
                k: (v / mig[k] if k in mig else v)
                for k, v in self._pending_per_step.items()}
        return stats

    def _calibrate_component_stats(self, name: str, cfg: QuantConfig,
                                   calib_prompts=None):
        """Capture-only calibration: activation absmax stats with NO
        scale migration applied."""
        if name in ("unet", "transformer"):
            return self._calibrate_unet(cfg, calib_prompts=calib_prompts)
        if name == "vae":
            return self._calibrate_vae(cfg)
        return None

    def _calibrate_vae(self, cfg: QuantConfig):
        """Per-channel input absmax for every VAE-decoder conv: decode
        a small batch of synthetic latents with 'calib' capture."""
        vae = self.components["vae"]
        plan = self.plans.get("vae", QuantPlan()).with_capture(True)
        cap = dataclasses.replace(vae, plan=plan)
        h = w = self.default_sample_size()
        lat = jax.random.normal(jax.random.PRNGKey(cfg.calib.seed),
                                (2, h, w, self.latent_channels()), jnp.float32)

        @jax.jit
        def capture(params, lat):
            _, mut = cap.apply({"params": params}, lat.astype(self.dtype),
                               method=cap.decode, mutable=["calib"])
            return mut

        return flatten_calib(jax.device_get(
            capture(self.params["vae"], lat))["calib"])

    def _awq_component(self, name: str, cfg: QuantConfig,
                       calib_prompts: Optional[Sequence[str]] = None):
        if name not in ("unet", "transformer"):
            return
        stats, input_feats = self._calibrate_unet_with_inputs(
            cfg, calib_prompts=calib_prompts)
        groups = sd_unet_scaling_groups(self.params[name])
        self.params[name] = awq_lib.awq_search_and_apply(
            self.params[name], groups, input_feats, cfg)

    def _gptq_component(self, name: str, cfg: QuantConfig, plan,
                        calib_prompts: Optional[Sequence[str]] = None):
        """GPTQ the component's dense layers from Gram-matrix Hessians
        captured over denoise steps (convs fall back to RTN inside
        gptq_quantize_params).  SD3.5 overrides with its MMDiT
        capture.  Returns (act_stats, grams); grams is None when the
        fake transform already applied (version != 'real' — the real
        block packs from the Grams instead)."""
        from qdm_tpu.quant import gptq as gptq_lib

        stats, grams = self._calibrate_unet_with_inputs(
            cfg, name=name, calib_prompts=calib_prompts, gram=True)
        if cfg.version == "real":
            return stats, grams
        self.params[name] = gptq_lib.gptq_quantize_params(
            self.params[name], plan, grams)
        return stats, None

    def _calibrate_unet_with_inputs(self, cfg: QuantConfig, name: str = "unet",
                                    calib_prompts: Optional[Sequence[str]] = None,
                                    gram: bool = False):
        """AWQ needs sampled layer inputs, not just absmax: run a few
        denoise steps with 'calib_x' capture and concat the sampled rows
        (the jnp analogue of _get_input_feat, quantizer.py:1093-1141).
        gram=True captures per-layer X^T X Gram matrices instead (GPTQ
        Hessians — full-data over every denoise step/token, bounded
        (C, C) memory)."""
        from qdm_tpu.calib.data import get_calib_prompts

        calib = cfg.calib
        prompts = (list(calib_prompts)[: max(2, min(calib.n_samples, 8))]
                   if calib_prompts
                   else get_calib_prompts(calib.dataset, min(calib.n_samples, 8)))
        plan = self.plans[name].with_capture(True, inputs=not gram,
                                             gram=gram)
        capture_unet = dataclasses.replace(self.components[name], plan=plan)
        steps = max(1, min(calib.n_steps, 4))
        tables = schedulers.make_ddim(self.scheduler_config, steps)
        h = w = self.default_sample_size()
        run = RunningMeanMax()
        ctx, uctx, added = self._encode_prompts(prompts, None)
        latents = jax.random.normal(jax.random.PRNGKey(calib.seed),
                                    (len(prompts), h, w, self.latent_channels()),
                                    jnp.float32)

        mutable = ["calib", "calib_h" if gram else "calib_x"]

        @jax.jit
        def step_fn(params, lat, ctx, uctx, added, s):
            t = tables.timesteps[s]
            lat_in = jnp.concatenate([lat, lat], axis=0)
            ctx_in = jnp.concatenate([uctx, ctx], axis=0)
            tt = jnp.broadcast_to(t, (lat_in.shape[0],))
            args = (lat_in, tt, ctx_in) + ((added,) if added is not None else ())
            out, mut = capture_unet.apply({"params": params}, *args,
                                          mutable=mutable)
            eps_u, eps_c = jnp.split(out, 2, axis=0)
            eps = eps_u + calib.guidance_scale * (eps_c - eps_u)
            new_lat = schedulers.ddim_step(tables, eps, lat, s, steps)
            feats = (flatten_calib(mut["calib_h"], leaf="h") if gram
                     else flatten_calib(mut["calib_x"], leaf="x"))
            return new_lat, flatten_calib(mut["calib"]), feats

        lat = latents
        feat_lists: Dict[str, list] = {}
        grams: Dict[str, jnp.ndarray] = {}
        for s in range(steps):
            lat, stats, feats = step_fn(self.params[name], lat, ctx, uctx, added, s)
            run.update(stats)
            for k, v in feats.items():
                if gram:
                    grams[k] = grams[k] + v if k in grams else v
                else:
                    feat_lists.setdefault(k, []).append(v)
        if gram:
            return run.mean(), grams
        input_feats = {k: jnp.concatenate(v, axis=0) for k, v in feat_lists.items()}
        return run.mean(), input_feats

    # -------------------------------------------------------------- generate

    def default_sample_size(self) -> int:
        return self.configs["unet"].sample_size

    def latent_channels(self) -> int:
        return self.configs["unet"].in_channels

    def generate(self, prompt, negative_prompt=None, num_inference_steps: int = 50,
                 guidance_scale: float = 7.5, seed: int = 0,
                 height: Optional[int] = None, width: Optional[int] = None,
                 latents: Optional[jnp.ndarray] = None, decode: bool = True,
                 num_images_per_prompt: int = 1, output_type: str = "np"):
        """Text -> images (reference base.py:828-850; unlike the
        reference, steps/size/guidance args are honored).

        output_type: 'np' (N,H,W,3 float [0,1]), 'latent', or 'pil'."""
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        negatives = None
        if negative_prompt is not None:
            negatives = [negative_prompt] if isinstance(negative_prompt, str) \
                else list(negative_prompt)
        if num_images_per_prompt > 1:
            prompts = [p for p in prompts for _ in range(num_images_per_prompt)]
            if negatives is not None:
                negatives = [n for n in negatives
                             for _ in range(num_images_per_prompt)]
        ctx, uctx, added = self._encode_prompts(prompts, negatives)
        h = (height or self.default_sample_size() * 8) // 8
        w = (width or self.default_sample_size() * 8) // 8
        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed),
                (len(prompts), h, w, self.latent_channels()), jnp.float32)
        lat = self.denoise(latents, ctx, uctx, added, num_inference_steps,
                           guidance_scale)
        if output_type == "latent" or not decode or "vae" not in self.components:
            return lat
        if output_type in ("u8", "pil"):
            # uint8 leaves the device (6 MB vs 25 MB f32 through the
            # ~34 MB/s tunnel — see decode_latents); 'pil' quantizes
            # to u8 anyway so nothing is lost
            images = self.decode_latents(lat, as_uint8=True)
            if output_type == "pil":
                from PIL import Image

                return [Image.fromarray(np.asarray(im)) for im in images]
            return images
        images = self.decode_latents(lat)
        if output_type == "pil":
            from PIL import Image

            return [Image.fromarray((np.asarray(im) * 255).astype(np.uint8))
                    for im in images]
        return images

    def generate_batches(self, prompt_batches, output_type: str = "u8",
                         **kw):
        """Pipelined multi-batch generation: batch k+1's denoise is
        dispatched BEFORE batch k's images are fetched, so the ~0.2 s
        device->host image transfer rides under the next batch's
        ~2.2 s compute (the tunnel moves data while the chip works).
        Returns a list of (N, H, W, 3) arrays (uint8 by default —
        output_type 'np' fetches f32).  Throughput-mode counterpart of
        generate() (reference base.py:828-850 loops generate per
        prompt list; this is the batched serving shape)."""
        as_u8 = output_type != "np"
        pending, out = None, []
        for prompts in prompt_batches:
            lat = self.generate(prompts, decode=False,
                                output_type="latent", **kw)
            flat, shape = self.decode_latents_async(lat, as_uint8=as_u8)
            if pending is not None:
                pf, (h, w_, c) = pending
                out.append(np.asarray(pf).reshape(-1, h, w_, c))
            pending = (flat, shape)
        if pending is not None:
            pf, (h, w_, c) = pending
            out.append(np.asarray(pf).reshape(-1, h, w_, c))
        return out

    @staticmethod
    def save_images(images, prefix: str = "out"):
        """Write (N, H, W, 3) float [0,1] or uint8 images as PNGs."""
        from PIL import Image

        paths = []
        arr = np.asarray(images)
        if arr.dtype != np.uint8:
            arr = (arr * 255).astype(np.uint8)
        for i, im in enumerate(arr):
            p = f"{prefix}_{i:03d}.png"
            Image.fromarray(im).save(p)
            paths.append(p)
        return paths

    def denoise(self, latents, ctx, uctx, added, steps: int, guidance: float,
                step_range: Optional[Tuple[int, int]] = None):
        """Run DDIM steps [lo, hi) of a `steps`-step schedule (the full
        schedule by default; a sub-range for base->refiner handoff)."""
        unet = self.components["unet"]
        params = self.params["unet"]
        latents, ctx, uctx = self._shard_batch(latents, ctx, uctx)
        lo, hi = step_range if step_range is not None else (0, steps)
        lut = getattr(self, "act_scale_luts", {}).get("unet") or None

        def build():
            tables = schedulers.make_ddim(self.scheduler_config, steps)

            def loop(params, latents, ctx, uctx, added, lut):
                def body(s, lat):
                    p = params
                    if lut:
                        # per-step static act scales: map schedule
                        # position onto the calib LUT's step axis and
                        # gather one scalar per layer (free under XLA)
                        n_lut = next(iter(lut.values())).shape[0]
                        idx = ((s * (n_lut - 1)) // (steps - 1)
                               if steps > 1 else 0)
                        p = qapply.select_step_act_scales(params, lut, idx)
                    t = tables.timesteps[s]
                    lat_in = jnp.concatenate([lat, lat], axis=0).astype(self.dtype)
                    ctx_in = jnp.concatenate([uctx, ctx], axis=0)
                    tt = jnp.broadcast_to(t, (lat_in.shape[0],))
                    args = (lat_in, tt, ctx_in) + ((added,) if added is not None else ())
                    eps = unet.apply({"params": p}, *args)
                    eps_u, eps_c = jnp.split(eps, 2, axis=0)
                    eps = eps_u + guidance * (eps_c - eps_u)
                    return schedulers.ddim_step(tables, eps, lat, s, steps)

                return jax.lax.fori_loop(lo, hi, body, latents)

            return jax.jit(loop)

        loop = self._cached_jit(
            ("denoise", steps, float(guidance), lo, hi, id(unet),
             id(lut) if lut else 0), build)
        return loop(params, latents, ctx, uctx, added, lut)

    def _cached_jit(self, key, build):
        """Per-pipeline cache of jitted closures.  Rebuilding a jitted
        closure per call (a fresh function object) defeats jax's jit
        cache and re-traces every generate(); unjitted component
        applies are even worse on the remote-TPU path (op-by-op
        dispatch at ~2-3 ms RTT each)."""
        cache = self.__dict__.setdefault("_jit_cache", {})
        if key not in cache:
            cache[key] = build()
        return cache[key]

    def _jitted_apply(self, name: str, method: Optional[str] = None):
        """Memoized jitted `component.apply` for the named component."""
        comp = self.components[name]

        def build():
            if method is None:
                return jax.jit(
                    lambda params, *a: comp.apply({"params": params}, *a))
            m = getattr(type(comp), method)
            return jax.jit(
                lambda params, *a: comp.apply({"params": params}, *a, method=m))

        return self._cached_jit(("apply", name, id(comp), method), build)

    def decode_latents(self, latents, as_uint8: bool = False):
        """VAE decode -> host images (N, H, W, 3).

        The device->host fetch dominates without care: the axon tunnel
        moves ~34 MB/s, and the NHWC image's 3-wide trailing dim is
        lane-padded 3->128 in TPU tiled layout, so fetching the raw
        (N,512,512,3) f32 output costs ~1.05 s/batch-8 (measured,
        tools/bench_layout_fetch_tpu.py).  The jitted decode therefore
        FLATTENS on device (relayout at HBM speed, the flat row is
        lane-aligned: 0.75 s) and optionally converts to uint8 (6 MB:
        0.23 s); the host reshapes back."""
        vae = self.components["vae"]

        def build():
            def fn(params, lat):
                img = ((vae.apply({"params": params},
                                  lat.astype(self.dtype),
                                  method=vae.decode)
                        .astype(jnp.float32) + 1) / 2).clip(0, 1)
                n, h, w_, c = img.shape
                if as_uint8:
                    img = jnp.round(img * 255).astype(jnp.uint8)
                return img.reshape(n, h * w_ * c), (h, w_, c)

            return jax.jit(fn)

        fn = self._cached_jit(("vae_decode", id(vae), as_uint8), build)
        if self._vae_chunk and latents.shape[0] > self._vae_chunk:
            outs = []
            for i in range(0, latents.shape[0], self._vae_chunk):
                flat, (h, w_, c) = fn(self.params["vae"],
                                      latents[i:i + self._vae_chunk])
                outs.append(np.asarray(flat))
            return np.concatenate(outs).reshape(-1, h, w_, c)
        flat, (h, w_, c) = fn(self.params["vae"], latents)
        return np.asarray(flat).reshape(-1, h, w_, c)

    def enable_vae_slicing(self, chunk: int = 1):
        """Decode the VAE in sub-batches of `chunk` samples (diffusers
        ``enable_vae_slicing`` parity) — bounds the decoder's conv
        activation peak, which at 1024px exceeds a 16 GB chip for
        batch >= 4 with the denoiser resident."""
        self._vae_chunk = int(chunk)

    def disable_vae_slicing(self):
        self._vae_chunk = None

    def decode_latents_async(self, latents, as_uint8: bool = True):
        """Dispatch the flattened VAE decode and return (device_array,
        shape) WITHOUT fetching — generate_batches overlaps the ~0.2 s
        tunnel fetch of batch k with batch k+1's denoise compute."""
        vae = self.components["vae"]

        def build():
            def fn(params, lat):
                img = ((vae.apply({"params": params},
                                  lat.astype(self.dtype),
                                  method=vae.decode)
                        .astype(jnp.float32) + 1) / 2).clip(0, 1)
                n, h, w_, c = img.shape
                if as_uint8:
                    img = jnp.round(img * 255).astype(jnp.uint8)
                return img.reshape(n, h * w_ * c), (h, w_, c)

            return jax.jit(fn)

        fn = self._cached_jit(("vae_decode", id(vae), as_uint8), build)
        if self._vae_chunk and latents.shape[0] > self._vae_chunk:
            # sliced decode: chunks run sequentially, the (small) flat
            # outputs concatenate on device so the caller still gets
            # ONE array to overlap-fetch
            flats = []
            for i in range(0, latents.shape[0], self._vae_chunk):
                flat, shp = fn(self.params["vae"],
                               latents[i:i + self._vae_chunk])
                flats.append(flat)
            return jnp.concatenate(flats), shp
        return fn(self.params["vae"], latents)

    # ------------------------------------------------------------ save/load

    def save_quantized(self, save_dir: str):
        """Artifact contract parity (base.py:530-582): per-component
        params + quant manifest `quant_components.json`."""
        os.makedirs(save_dir, exist_ok=True)
        manifest = {
            "model_type": self.model_type,
            "quantized_components": self.quantized_components,
            "quantization_config": self.quant_config.to_transformers_dict()
            if self.quant_config else None,
        }
        with open(os.path.join(save_dir, "quant_components.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        if self.quant_config:
            self.quant_config.save(os.path.join(save_dir, "quant_config.json"))
        for name, params in self.params.items():
            d = os.path.join(save_dir, name)
            os.makedirs(d, exist_ok=True)
            self._save_component(d, name, params)
            lut = getattr(self, "act_scale_luts", {}).get(name)
            if lut:
                qapply.save_act_scale_lut(
                    lut, os.path.join(d, "act_scale_lut.safetensors"))
        with open(os.path.join(save_dir, "pipeline_config.json"), "w") as f:
            json.dump({n: dataclasses.asdict(c) for n, c in self.configs.items()},
                      f, indent=2, default=str)

    def _save_component(self, d: str, name: str, params):
        from qdm_tpu.utils.serialization import save_params

        save_params(params, os.path.join(d, "params.safetensors"))

    @classmethod
    def from_quantized(cls, save_dir: str, dtype=jnp.bfloat16):
        """Rebuild a quantized pipeline (base.py:736-826)."""
        self = cls()
        self.dtype = dtype
        with open(os.path.join(save_dir, "quant_components.json")) as f:
            manifest = json.load(f)
        self.quant_config = QuantConfig.from_pretrained(save_dir)
        self.quantized_components = manifest["quantized_components"]
        with open(os.path.join(save_dir, "pipeline_config.json")) as f:
            cfgs = json.load(f)
        self._restore_configs(cfgs)
        for name in self.configs:
            comp_key = "text_encoder" if name.startswith("text_encoder") else name
            if name in self.quantized_components:
                self.plans[comp_key] = self._make_plan(self.quant_config, comp_key)
            self.params[name] = self._load_component(os.path.join(save_dir, name))
            self.components[name] = self._module(name)
            lp = os.path.join(save_dir, name, "act_scale_lut.safetensors")
            if os.path.exists(lp):
                self.act_scale_luts[name] = qapply.load_act_scale_lut(lp)
        self.tokenizer = SimpleTokenizer(
            vocab_size=self.configs["text_encoder"].vocab_size,
            max_len=self.configs["text_encoder"].max_position_embeddings)
        self.is_quantized = True
        return self

    def _restore_configs(self, cfgs: dict):
        raise NotImplementedError

    @staticmethod
    def _load_component(d: str):
        from qdm_tpu.utils.serialization import load_params

        return load_params(os.path.join(d, "params.safetensors"))


class StableDiffusion1_x(BaseDiffusionPipeline):
    """SD1.x family (reference models/StableDiffusion1_x.py)."""

    model_type = "StableDiffusionPipeline"

    def _build_default_configs(self, tiny: bool, overrides: dict):
        if tiny:
            self.configs = {"unet": unet_lib.tiny_unet_config(),
                            "text_encoder": dataclasses.replace(
                                clip_text.tiny_clip_config(), hidden_size=32),
                            "vae": vae_lib.tiny_vae_config()}
            # tiny text encoder must match unet cross_attention_dim
        else:
            self.configs = {"unet": unet_lib.SD15_UNET,
                            "text_encoder": clip_text.SD15_TEXT,
                            "vae": vae_lib.SD_VAE}
        for k, v in overrides.items():
            self.configs[k] = v
        self.components = {n: None for n in self.configs}

    def _build_configs_from_dir(self, path: str):
        self.configs = {
            "unet": loader.unet_config_from_diffusers(
                loader.load_json(os.path.join(path, "unet", "config.json"))),
            "text_encoder": loader.clip_config_from_hf(
                loader.load_json(os.path.join(path, "text_encoder", "config.json"))),
            "vae": loader.vae_config_from_diffusers(
                loader.load_json(os.path.join(path, "vae", "config.json"))),
        }
        sched = os.path.join(path, "scheduler", "scheduler_config.json")
        if os.path.exists(sched):
            sc = loader.load_json(sched)
            self.scheduler_config = schedulers.SchedulerConfig(
                num_train_timesteps=sc.get("num_train_timesteps", 1000),
                beta_start=sc.get("beta_start", 0.00085),
                beta_end=sc.get("beta_end", 0.012),
                beta_schedule=sc.get("beta_schedule", "scaled_linear"),
                steps_offset=sc.get("steps_offset", 1),
                prediction_type=sc.get("prediction_type", "epsilon"),
            )
        self.components = {n: None for n in self.configs}

    def _restore_configs(self, cfgs: dict):
        self.configs = {
            "unet": unet_lib.UNetConfig(**{k: tuple(v) if isinstance(v, list) else v
                                           for k, v in cfgs["unet"].items()}),
            "text_encoder": clip_text.CLIPTextConfig(**cfgs["text_encoder"]),
            "vae": vae_lib.VAEConfig(**{k: tuple(v) if isinstance(v, list) else v
                                        for k, v in cfgs["vae"].items()}),
        }

    def _arch_plan_rules(self, cfg: QuantConfig):
        # the fused int8 GEGLU Pallas kernel wins on SD1.5's narrow FF
        # (inner 1280: kills a (M, 2*inner) bf16 HBM round trip,
        # bench_hybrid.py +6%) but LOSES on SDXL's wide FF (bench_sdxl
        # 2026-08-17) — so it is an SD1.x-only rule
        if cfg.quantize_act and cfg.a_bit <= 8 and cfg.w_bit == 8:
            return (("net_0/proj",
                     LayerQuantSpec(mode="w8a8", w_bits=8, a_bits=8,
                                    quantize_act=True)),)
        return ()

    def _encode_prompts(self, prompts, negatives):
        te = self._jitted_apply("text_encoder")
        te_params = self.params["text_encoder"]
        ids = self.tokenizer(prompts)
        last, _, _ = te(te_params, ids)
        ctx = last
        neg = negatives if negatives is not None else [""] * len(prompts)
        uids = self.tokenizer(neg)
        ulast, _, _ = te(te_params, uids)
        return ctx, ulast, None


class StableDiffusionXL(BaseDiffusionPipeline):
    """SDXL (reference models/StableDiffusionXL.py): dual text encoders,
    text_time addition embeddings, optional refiner pipeline
    (StableDiffusionXL.py:13-17; unlike the reference, the refiner is
    also *used*: generate(use_refiner=True) runs the standard SDXL
    base->refiner denoising handoff)."""

    model_type = "StableDiffusionXLPipeline"

    def _load_refiner(self, path: str):
        self.refiner = StableDiffusionXL.from_pretrained(path, dtype=self.dtype)

    @classmethod
    def tiny_refiner(cls, dtype=jnp.float32, seed: int = 1):
        """Random-init tiny refiner-architecture pipeline (img2img SDXL:
        single text encoder (te2), 5 addition time-ids incl. aesthetic
        score)."""
        self = cls()
        self.dtype = dtype
        tiny2 = clip_text.tiny_clip_config()
        ucfg = dataclasses.replace(
            unet_lib.tiny_unet_config(),
            addition_embed_type="text_time",
            cross_attention_dim=tiny2.hidden_size,
            projection_class_embeddings_input_dim=tiny2.projection_dim + 5 * 256)
        self.configs = {"unet": ucfg, "text_encoder_2": tiny2,
                        "vae": vae_lib.tiny_vae_config()}
        self.components = {n: None for n in self.configs}
        self._random_init(seed)
        self.tokenizer = SimpleTokenizer(vocab_size=tiny2.vocab_size,
                                         max_len=tiny2.max_position_embeddings)
        return self

    def generate(self, prompt, *args, use_refiner: bool = False,
                 high_noise_frac: float = 0.8, **kw):
        """SDXL generate; with use_refiner=True run the base UNet on
        steps [0, frac*steps) and the refiner UNet on the rest (the
        diffusers denoising_end/denoising_start handoff)."""
        if not use_refiner or self.refiner is None:
            return super().generate(prompt, *args, **kw)
        steps = kw.pop("num_inference_steps", 50)
        guidance = kw.pop("guidance_scale", 7.5)
        seed = kw.pop("seed", 0)
        output_type = kw.pop("output_type", "np")
        negative_prompt = kw.pop("negative_prompt", None)
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        negatives = ([negative_prompt] if isinstance(negative_prompt, str)
                     else negative_prompt)
        split = max(1, min(steps - 1, int(round(steps * high_noise_frac))))
        ctx, uctx, added = self._encode_prompts(prompts, negatives)
        h = w = self.default_sample_size()
        latents = kw.pop("latents", None)
        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed),
                (len(prompts), h, w, self.latent_channels()), jnp.float32)
        lat = self.denoise(latents, ctx, uctx, added, steps, guidance,
                           step_range=(0, split))
        rctx, ructx, radded = self.refiner._encode_prompts(prompts, negatives)
        lat = self.refiner.denoise(lat, rctx, ructx, radded, steps, guidance,
                                   step_range=(split, steps))
        if output_type == "latent":
            return lat
        images = self.decode_latents(lat)
        if output_type == "pil":
            from PIL import Image

            return [Image.fromarray((np.asarray(im) * 255).astype(np.uint8))
                    for im in images]
        return images

    def _build_default_configs(self, tiny: bool, overrides: dict):
        if tiny:
            ucfg = dataclasses.replace(unet_lib.tiny_unet_config(),
                                       addition_embed_type="text_time",
                                       cross_attention_dim=64,
                                       projection_class_embeddings_input_dim=32 + 6 * 256)
            self.configs = {
                "unet": ucfg,
                "text_encoder": clip_text.tiny_clip_config(),
                "text_encoder_2": clip_text.tiny_clip_config(),
                "vae": vae_lib.tiny_vae_config(),
            }
        else:
            self.configs = {"unet": unet_lib.SDXL_UNET,
                            "text_encoder": clip_text.SD15_TEXT,
                            "text_encoder_2": clip_text.SDXL_TEXT2,
                            "vae": vae_lib.SDXL_VAE}
        for k, v in overrides.items():
            self.configs[k] = v
        self.components = {n: None for n in self.configs}

    def _build_configs_from_dir(self, path: str):
        self.configs = {
            "unet": loader.unet_config_from_diffusers(
                loader.load_json(os.path.join(path, "unet", "config.json"))),
            "text_encoder_2": loader.clip_config_from_hf(
                loader.load_json(os.path.join(path, "text_encoder_2", "config.json"))),
            "vae": loader.vae_config_from_diffusers(
                loader.load_json(os.path.join(path, "vae", "config.json"))),
        }
        # the refiner checkpoint layout has no first text encoder
        te1 = os.path.join(path, "text_encoder", "config.json")
        if os.path.exists(te1):
            self.configs["text_encoder"] = loader.clip_config_from_hf(
                loader.load_json(te1))
        self.components = {n: None for n in self.configs}

    def _restore_configs(self, cfgs: dict):
        self.configs = {
            "unet": unet_lib.UNetConfig(**{k: tuple(v) if isinstance(v, list) else v
                                           for k, v in cfgs["unet"].items()}),
            "text_encoder_2": clip_text.CLIPTextConfig(**cfgs["text_encoder_2"]),
            "vae": vae_lib.VAEConfig(**{k: tuple(v) if isinstance(v, list) else v
                                        for k, v in cfgs["vae"].items()}),
        }
        if "text_encoder" in cfgs:  # absent for refiner-arch saves
            self.configs["text_encoder"] = clip_text.CLIPTextConfig(
                **cfgs["text_encoder"])

    def _encode_prompts(self, prompts, negatives):
        ids = self.tokenizer(prompts)
        te2 = self._jitted_apply("text_encoder_2")
        te2_params = self.params["text_encoder_2"]
        _, pen2, pooled = te2(te2_params, ids)
        neg = negatives if negatives is not None else [""] * len(prompts)
        uids = self.tokenizer(neg)
        _, upen2, upooled = te2(te2_params, uids)
        if "text_encoder" in self.components:
            te1 = self._jitted_apply("text_encoder")
            te1_params = self.params["text_encoder"]
            _, pen1, _ = te1(te1_params, ids)
            _, upen1, _ = te1(te1_params, uids)
            ctx = jnp.concatenate([pen1, pen2], axis=-1)
            uctx = jnp.concatenate([upen1, upen2], axis=-1)
        else:  # refiner: te2 only
            ctx, uctx = pen2, upen2
        size = self.default_sample_size() * 8
        ucfg = self.configs["unet"]
        n_ids = ((ucfg.projection_class_embeddings_input_dim - pooled.shape[-1])
                 // ucfg.addition_time_embed_dim)
        if n_ids == 5:
            # refiner conditioning: (h, w, crop_h, crop_w, aesthetic_score)
            row = [size, size, 0, 0, 6.0]
        else:
            row = [size, size, 0, 0, size, size]
        time_ids = jnp.tile(jnp.array([row], jnp.float32),
                            (len(prompts) * 2, 1))
        added = {"text_embeds": jnp.concatenate([upooled, pooled], axis=0),
                 "time_ids": time_ids}
        return ctx, uctx, added

    def denoise(self, latents, ctx, uctx, added, steps, guidance,
                step_range=None):
        # added conds are pre-concatenated (uncond; cond) — reuse base loop
        return super().denoise(latents, ctx, uctx, added, steps, guidance,
                               step_range=step_range)


class StableDiffusion3_5(BaseDiffusionPipeline):
    """SD3.x MMDiT family (reference models/StableDiffusion3_5.py):
    transformer instead of unet (checkQuantStatus rejects unet,
    StableDiffusion3_5.py:33-35); rectified-flow Euler sampling.

    The T5-XXL context slot is zero-padded when no T5 encoder is present
    (the CLIP-only operating mode diffusers also supports)."""

    model_type = "StableDiffusion3Pipeline"
    has_unet = False
    has_transformer = True

    def _build_default_configs(self, tiny: bool, overrides: dict):
        from qdm_tpu.models import mmdit as mmdit_lib

        if tiny:
            tcfg = dataclasses.replace(clip_text.tiny_clip_config(),
                                       projection_dim=8)
            self.configs = {
                "transformer": mmdit_lib.tiny_mmdit_config(),
                "text_encoder": tcfg,
                "text_encoder_2": tcfg,
                "vae": dataclasses.replace(vae_lib.tiny_vae_config(),
                                           latent_channels=4,
                                           use_quant_conv=False),
            }
        else:
            self.configs = {
                "transformer": mmdit_lib.SD35_MEDIUM,
                "text_encoder": dataclasses.replace(clip_text.SD15_TEXT,
                                                    projection_dim=768),
                "text_encoder_2": clip_text.SDXL_TEXT2,
                "vae": vae_lib.SD3_VAE,
            }
        for k, v in overrides.items():
            self.configs[k] = v
        self.components = {n: None for n in self.configs}

    def _init_args(self, name: str):
        if name == "transformer":
            cfg = self.configs["transformer"]
            s = cfg.sample_size
            return (jnp.zeros((1, s, s, cfg.in_channels)),
                    jnp.zeros((1,), jnp.float32),
                    jnp.zeros((1, 16, cfg.joint_attention_dim)),
                    jnp.zeros((1, cfg.pooled_projection_dim)))
        if name == "text_encoder_3":
            return (jnp.zeros((1, 16), jnp.int32),)
        return super()._init_args(name)

    def _build_configs_from_dir(self, path: str):
        from qdm_tpu.models import mmdit as mmdit_lib

        tcfg = loader.load_json(os.path.join(path, "transformer", "config.json"))
        self.configs = {
            "transformer": mmdit_lib.MMDiTConfig(
                sample_size=tcfg.get("sample_size", 128),
                patch_size=tcfg.get("patch_size", 2),
                in_channels=tcfg.get("in_channels", 16),
                num_layers=tcfg.get("num_layers", 24),
                attention_head_dim=tcfg.get("attention_head_dim", 64),
                num_attention_heads=tcfg.get("num_attention_heads", 24),
                joint_attention_dim=tcfg.get("joint_attention_dim", 4096),
                caption_projection_dim=tcfg.get("caption_projection_dim", 1536),
                pooled_projection_dim=tcfg.get("pooled_projection_dim", 2048),
                pos_embed_max_size=tcfg.get("pos_embed_max_size", 192),
                out_channels=tcfg.get("out_channels", 16),
            ),
            "text_encoder": loader.clip_config_from_hf(
                loader.load_json(os.path.join(path, "text_encoder", "config.json"))),
            "text_encoder_2": loader.clip_config_from_hf(
                loader.load_json(os.path.join(path, "text_encoder_2", "config.json"))),
            "vae": loader.vae_config_from_diffusers(
                loader.load_json(os.path.join(path, "vae", "config.json"))),
        }
        te3 = os.path.join(path, "text_encoder_3", "config.json")
        if os.path.exists(te3):
            from qdm_tpu.models import t5 as t5_lib

            t5cfg = loader.load_json(te3)
            self.configs["text_encoder_3"] = t5_lib.T5Config(
                vocab_size=t5cfg.get("vocab_size", 32128),
                d_model=t5cfg.get("d_model", 4096),
                d_kv=t5cfg.get("d_kv", 64),
                d_ff=t5cfg.get("d_ff", 10240),
                num_layers=t5cfg.get("num_layers", 24),
                num_heads=t5cfg.get("num_heads", 64),
            )
        self.components = {n: None for n in self.configs}

    def _module(self, name: str):
        if name == "text_encoder_3":
            from qdm_tpu.models.t5 import T5Encoder

            return T5Encoder(config=self.configs[name], dtype=self.dtype,
                             plan=self.plans["text_encoder"])
        return StableDiffusion3_5._module_base(self, name)

    def _module_base(self, name: str):
        # (separated so text_encoder_3 dispatch stays override-safe)
        if name == "transformer":
            from qdm_tpu.models.mmdit import MMDiT

            return MMDiT(config=self.configs["transformer"], dtype=self.dtype,
                         plan=self.plans["transformer"])
        if name.startswith("text_encoder"):
            return clip_text.CLIPTextModel(
                config=self.configs[name], dtype=self.dtype,
                plan=self.plans["text_encoder"], with_projection=True)
        return BaseDiffusionPipeline._module(self, name)

    def _restore_configs(self, cfgs: dict):
        from qdm_tpu.models import mmdit as mmdit_lib

        self.configs = {
            "transformer": mmdit_lib.MMDiTConfig(**cfgs["transformer"]),
            "text_encoder": clip_text.CLIPTextConfig(**cfgs["text_encoder"]),
            "text_encoder_2": clip_text.CLIPTextConfig(**cfgs["text_encoder_2"]),
            "vae": vae_lib.VAEConfig(**{k: tuple(v) if isinstance(v, list) else v
                                        for k, v in cfgs["vae"].items()}),
        }
        if "text_encoder_3" in cfgs:
            from qdm_tpu.models.t5 import T5Config

            self.configs["text_encoder_3"] = T5Config(**cfgs["text_encoder_3"])

    def default_sample_size(self) -> int:
        return self.configs["transformer"].sample_size

    def latent_channels(self) -> int:
        return self.configs["transformer"].in_channels

    def _encode_prompts(self, prompts, negatives):
        cfg = self.configs["transformer"]
        ids = self.tokenizer(prompts)
        te1 = self._jitted_apply("text_encoder")
        te2 = self._jitted_apply("text_encoder_2")
        p1, p2 = self.params["text_encoder"], self.params["text_encoder_2"]
        _, pen1, pooled1 = te1(p1, ids)
        _, pen2, pooled2 = te2(p2, ids)
        clip_ctx = jnp.concatenate([pen1, pen2], axis=-1)
        pad = cfg.joint_attention_dim - clip_ctx.shape[-1]
        ctx = jnp.pad(clip_ctx, ((0, 0), (0, 0), (0, pad)))
        has_t5 = ("text_encoder_3" in self.components and
                  self.components["text_encoder_3"] is not None)
        if has_t5:
            # append T5 sequence to the joint context (SD3 protocol)
            t5 = self._jitted_apply("text_encoder_3")
            t5_out = t5(self.params["text_encoder_3"], ids)
            ctx = jnp.concatenate([ctx, t5_out.astype(ctx.dtype)], axis=1)
        pooled = jnp.concatenate([pooled1, pooled2], axis=-1)

        neg = negatives if negatives is not None else [""] * len(prompts)
        uids = self.tokenizer(neg)
        _, upen1, upooled1 = te1(p1, uids)
        _, upen2, upooled2 = te2(p2, uids)
        uctx = jnp.pad(jnp.concatenate([upen1, upen2], axis=-1),
                       ((0, 0), (0, 0), (0, pad)))
        if has_t5:
            ut5 = t5(self.params["text_encoder_3"], uids)
            uctx = jnp.concatenate([uctx, ut5.astype(uctx.dtype)], axis=1)
        upooled = jnp.concatenate([upooled1, upooled2], axis=-1)
        added = {"pooled": jnp.concatenate([upooled, pooled], axis=0)}
        return ctx, uctx, added

    def denoise(self, latents, ctx, uctx, added, steps: int, guidance: float):
        """Rectified-flow Euler loop (FlowMatchEulerDiscrete parity)."""
        model = self.components["transformer"]
        params = self.params["transformer"]
        pooled = added["pooled"]
        lut = getattr(self, "act_scale_luts", {}).get("transformer") or None

        def build():
            tables = schedulers.make_flow_match(steps)

            def loop(params, latents, ctx, uctx, pooled, lut):
                def body(s, lat):
                    p = params
                    if lut:
                        n_lut = next(iter(lut.values())).shape[0]
                        idx = ((s * (n_lut - 1)) // (steps - 1)
                               if steps > 1 else 0)
                        p = qapply.select_step_act_scales(params, lut, idx)
                    t = tables.timesteps[s]
                    lat_in = jnp.concatenate([lat, lat], axis=0).astype(self.dtype)
                    ctx_in = jnp.concatenate([uctx, ctx], axis=0)
                    tt = jnp.broadcast_to(t, (lat_in.shape[0],))
                    v = model.apply({"params": p}, lat_in, tt, ctx_in, pooled)
                    v_u, v_c = jnp.split(v, 2, axis=0)
                    v = v_u + guidance * (v_c - v_u)
                    return schedulers.flow_match_step(tables, v, lat, s)

                return jax.lax.fori_loop(0, steps, body, latents)

            return jax.jit(loop)

        loop = self._cached_jit(
            ("denoise", steps, float(guidance), id(model),
             id(lut) if lut else 0), build)
        return loop(params, latents, ctx, uctx, pooled, lut)

    def _smoothquant_component(self, name: str, cfg: QuantConfig,
                               calib_cache: Optional[str] = None,
                               calib_prompts: Optional[Sequence[str]] = None):
        if name != "transformer":
            return None
        from qdm_tpu.models.shims import sd3_scaling_groups

        stats = self._calibrate_transformer(cfg, calib_prompts=calib_prompts)
        groups = sd3_scaling_groups(self.params["transformer"])
        self.params["transformer"], mig = smooth_lib.smooth_params(
            self.params["transformer"], groups, stats, alpha=cfg.alpha,
            return_scales=True)
        # see the UNet variant: static int8 scales must reflect the
        # post-migration (act/s) range
        stats = {k: (v / mig[k] if k in mig else v) for k, v in stats.items()}
        if self._pending_per_step:
            self._pending_per_step = {
                k: (v / mig[k] if k in mig else v)
                for k, v in self._pending_per_step.items()}
        return stats

    def _calibrate_transformer(self, cfg: QuantConfig,
                               calib_prompts: Optional[Sequence[str]] = None):
        from qdm_tpu.calib.data import get_calib_prompts

        calib = cfg.calib
        prompts = (list(calib_prompts)[: max(2, min(calib.n_samples, 8))]
                   if calib_prompts
                   else get_calib_prompts(calib.dataset, min(calib.n_samples, 8)))
        plan = self.plans["transformer"].with_capture(True)
        capture = dataclasses.replace(self.components["transformer"], plan=plan)
        steps = max(1, min(calib.n_steps, 8))
        tables = schedulers.make_flow_match(steps)
        ctx, uctx, added = self._encode_prompts(prompts, None)
        s = self.default_sample_size()
        lat = jax.random.normal(jax.random.PRNGKey(calib.seed),
                                (len(prompts), s, s, self.latent_channels()),
                                jnp.float32)
        run = RunningMeanMax()

        @jax.jit
        def step_fn(params, lat, s_idx):
            t = tables.timesteps[s_idx]
            lat_in = jnp.concatenate([lat, lat], axis=0).astype(self.dtype)
            ctx_in = jnp.concatenate([uctx, ctx], axis=0)
            tt = jnp.broadcast_to(t, (lat_in.shape[0],))
            v, mut = capture.apply({"params": params}, lat_in, tt, ctx_in,
                                   added["pooled"], mutable=["calib"])
            v_u, v_c = jnp.split(v, 2, axis=0)
            v = v_u + cfg.calib.guidance_scale * (v_c - v_u)
            return schedulers.flow_match_step(tables, v, lat, s_idx), \
                flatten_calib(mut["calib"])

        per_step = bool(getattr(cfg, "act_per_step_scales", False))
        runs = [RunningMeanMax() for _ in range(steps)] if per_step else None
        for si in range(steps):
            lat, stats = step_fn(self.params["transformer"], lat, si)
            run.update(stats)
            if runs is not None:
                runs[si].update(stats)
        mean = run.mean()
        if runs is not None:
            self._pending_per_step = {
                k: jnp.stack([r.mean()[k] for r in runs]) for k in mean}
        return mean

    def _awq_component(self, name: str, cfg: QuantConfig,
                       calib_prompts: Optional[Sequence[str]] = None):
        """AWQ scale+clip search on the MMDiT scaling groups using
        sampled layer inputs captured over flow-match denoise steps."""
        if name != "transformer":
            return
        from qdm_tpu.calib.data import get_calib_prompts
        from qdm_tpu.models.shims import sd3_scaling_groups

        calib = cfg.calib
        prompts = (list(calib_prompts)[: max(2, min(calib.n_samples, 8))]
                   if calib_prompts
                   else get_calib_prompts(calib.dataset, min(calib.n_samples, 8)))
        plan = self.plans["transformer"].with_capture(True, inputs=True)
        capture = dataclasses.replace(self.components["transformer"], plan=plan)
        steps = max(1, min(calib.n_steps, 4))
        tables = schedulers.make_flow_match(steps)
        ctx, uctx, added = self._encode_prompts(prompts, None)
        s = self.default_sample_size()
        lat = jax.random.normal(jax.random.PRNGKey(calib.seed),
                                (len(prompts), s, s, self.latent_channels()),
                                jnp.float32)

        @jax.jit
        def step_fn(params, lat, s_idx):
            t = tables.timesteps[s_idx]
            lat_in = jnp.concatenate([lat, lat], axis=0).astype(self.dtype)
            ctx_in = jnp.concatenate([uctx, ctx], axis=0)
            tt = jnp.broadcast_to(t, (lat_in.shape[0],))
            v, mut = capture.apply({"params": params}, lat_in, tt, ctx_in,
                                   added["pooled"], mutable=["calib", "calib_x"])
            v_u, v_c = jnp.split(v, 2, axis=0)
            v = v_u + cfg.calib.guidance_scale * (v_c - v_u)
            return schedulers.flow_match_step(tables, v, lat, s_idx), \
                flatten_calib(mut["calib_x"], leaf="x")

        feat_lists: Dict[str, list] = {}
        for si in range(steps):
            lat, feats = step_fn(self.params["transformer"], lat, si)
            for k, v in feats.items():
                feat_lists.setdefault(k, []).append(v)
        input_feats = {k: jnp.concatenate(v, axis=0) for k, v in feat_lists.items()}
        groups = sd3_scaling_groups(self.params["transformer"])
        self.params["transformer"] = awq_lib.awq_search_and_apply(
            self.params["transformer"], groups, input_feats, cfg)

    def _gptq_component(self, name: str, cfg: QuantConfig, plan,
                        calib_prompts: Optional[Sequence[str]] = None):
        """MMDiT GPTQ: Gram-matrix Hessians captured over flow-match
        denoise steps (the base override uses the unet apply
        signature)."""
        from qdm_tpu.calib.data import get_calib_prompts
        from qdm_tpu.quant import gptq as gptq_lib

        calib = cfg.calib
        prompts = (list(calib_prompts)[: max(2, min(calib.n_samples, 8))]
                   if calib_prompts
                   else get_calib_prompts(calib.dataset, min(calib.n_samples, 8)))
        cplan = self.plans["transformer"].with_capture(True, gram=True)
        capture = dataclasses.replace(self.components["transformer"],
                                      plan=cplan)
        steps = max(1, min(calib.n_steps, 4))
        tables = schedulers.make_flow_match(steps)
        ctx, uctx, added = self._encode_prompts(prompts, None)
        s = self.default_sample_size()
        lat = jax.random.normal(jax.random.PRNGKey(calib.seed),
                                (len(prompts), s, s, self.latent_channels()),
                                jnp.float32)

        @jax.jit
        def step_fn(params, lat, s_idx):
            t = tables.timesteps[s_idx]
            lat_in = jnp.concatenate([lat, lat], axis=0).astype(self.dtype)
            ctx_in = jnp.concatenate([uctx, ctx], axis=0)
            tt = jnp.broadcast_to(t, (lat_in.shape[0],))
            v, mut = capture.apply({"params": params}, lat_in, tt, ctx_in,
                                   added["pooled"],
                                   mutable=["calib", "calib_h"])
            v_u, v_c = jnp.split(v, 2, axis=0)
            v = v_u + cfg.calib.guidance_scale * (v_c - v_u)
            return schedulers.flow_match_step(tables, v, lat, s_idx), \
                flatten_calib(mut["calib"]), \
                flatten_calib(mut["calib_h"], leaf="h")

        run = RunningMeanMax()
        grams: Dict[str, jnp.ndarray] = {}
        for si in range(steps):
            lat, stats, hs = step_fn(self.params["transformer"], lat, si)
            run.update(stats)
            for k, v in hs.items():
                grams[k] = grams[k] + v if k in grams else v
        if cfg.version == "real":
            return run.mean(), grams
        self.params["transformer"] = gptq_lib.gptq_quantize_params(
            self.params["transformer"], plan, grams)
        return run.mean(), None
