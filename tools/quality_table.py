#!/usr/bin/env python
"""Relative quality-parity table at real SD1.5 scale.

The reference's headline quality evidence is its LPIPS table
(README.md:24-42): quantized pipelines scored against fp16 generations
on identical prompts/seeds, ordered W8 (best) ... W4-RTN (worst).  Real
SD1.5 checkpoints are not available in this environment (zero egress),
so this reproduces the *relative* table on a real-architecture
(860M-param UNet) pipeline with shared deterministic random weights:
identical prompts, latents, and weights between the bf16 reference and
every quant mode — the ordering and the error gaps are the verifiable
quantities.  Metrics: MSE / PSNR / SSIM (+LPIPS when converted AlexNet
weights are present at tools/lpips_weights.npz; see tools/convert_lpips.py).

Writes tools/quality_table.json and QUALITY.md.

Run (TPU, ~30-60 min first time): python tools/quality_table.py
Quick CPU smoke:                  python tools/quality_table.py --tiny
"""

import argparse
import gc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# decide the backend BEFORE jax initializes: --tiny is the CPU smoke mode
if "--tiny" in sys.argv:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if "--tiny" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np

PROMPTS = [
    "a photo of an astronaut riding a horse on mars",
    "a watercolor painting of a fox in a forest",
    "a city skyline at night, neon lights",
    "a bowl of fruit on a wooden table",
]

CALIB_PROMPTS = [
    "a dog playing in the park", "a red sports car", "a mountain landscape",
    "portrait of an old man", "a sailboat on the ocean", "a cup of coffee",
    "a bird on a branch", "city street in the rain",
]


OUTLIERS = "--outliers" in sys.argv
_MAX_FACTOR = 64.0


def build_pipe(tiny, dtype, seed=0):
    from qdm_tpu.api.pipeline import StableDiffusion1_x

    pipe = StableDiffusion1_x.from_config(tiny=tiny, dtype=dtype, seed=seed)
    if OUTLIERS:
        # trained-network regime: persistent per-channel activation
        # outliers from heavy-tailed norm gains (identical injection in
        # the reference pipe and every quant pipe — same seed); see
        # qdm_tpu/utils/outliers.py
        from qdm_tpu.utils.outliers import inject_norm_outliers

        pipe.params["unet"] = inject_norm_outliers(
            pipe.params["unet"], seed=11,
            min_factor=min(8.0, _MAX_FACTOR), max_factor=_MAX_FACTOR)
    return pipe


def gen(pipe, steps, px):
    return np.asarray(pipe.generate(
        PROMPTS, num_inference_steps=steps, seed=123,
        height=px, width=px, output_type="np"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--outliers", action="store_true")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--px", type=int, default=512)
    ap.add_argument("--max-factor", type=float, default=None,
                    help="outlier gain cap (outliers mode); the 64x "
                         "default saturates a random-weight UNet — its "
                         "attention runs chaotic (softmax-saturated) and "
                         "even weight-only int8 decorrelates in one step")
    args = ap.parse_args()
    global _MAX_FACTOR
    if args.max_factor:
        _MAX_FACTOR = args.max_factor

    from qdm_tpu.config import QuantConfig
    from qdm_tpu.evaluation.lpips import (load_lpips_weights, lpips_distance,
                                          mse, psnr, ssim)

    tiny = args.tiny or jax.default_backend() != "tpu"
    steps = 2 if tiny else args.steps
    px = 64 if tiny else args.px
    dtype = jnp.float32 if tiny else jnp.bfloat16

    def calib(cfg):
        cfg.calib.n_samples = 4
        cfg.calib.batch_size = 2
        cfg.calib.n_steps = 2 if tiny else 4
        return cfg

    # order follows the reference LPIPS table (README.md:24-42)
    modes = {
        "W8A16 (weight-only int8)": ("rtn", calib(QuantConfig(
            w_bit=8, a_bit=16, version="real", quantize_act=False,
            weight_quant_type="per_channel", q_group_size=0))),
        "W8A8-static SmoothQuant (real XLA int8)": ("sq", calib(QuantConfig(
            w_bit=8, a_bit=8, version="real", quantize_act=True,
            act_quant_type="static", act_quant_conv_type="static",
            weight_quant_type="per_channel", q_group_size=0))),
        # per-step static scales (DiTAS-style extension,
        # QuantConfig.act_per_step_scales): one act scale per denoise
        # step instead of the reference's mean-over-steps collapse —
        # early high-sigma steps stop clipping, late steps stop
        # wasting resolution.  The one-step eps column matches the SQ
        # row by construction (the LUT only engages in the sampler);
        # the generation metrics are the discriminator.
        "W8A8-static SQ + per-step scales": ("sq", calib(QuantConfig(
            w_bit=8, a_bit=8, version="real", quantize_act=True,
            act_quant_type="static", act_quant_conv_type="static",
            weight_quant_type="per_channel", q_group_size=0,
            act_per_step_scales=True))),
        # the smoothing ablation: same int8 act path, no outlier
        # migration — per-channel act outliers land on the per-tensor
        # static scales directly (the regime SmoothQuant exists for)
        "W8A8-static RTN (no smoothing)": ("rtn", calib(QuantConfig(
            w_bit=8, a_bit=8, version="real", quantize_act=True,
            act_quant_type="static", act_quant_conv_type="static",
            weight_quant_type="per_channel", q_group_size=0))),
        "W4A16 Smooth (group-128 int4)": ("sq", calib(QuantConfig(
            w_bit=4, a_bit=16, version="fake", zero_point=True,
            q_group_size=128))),
        # GPTQ on the same grid: denoise-step Gram Hessians, dense
        # layers error-compensated, convs on the shared RTN pack
        "W4 GPTQ (Hessian error-comp)": ("gptq", calib(QuantConfig(
            w_bit=4, a_bit=16, version="fake", zero_point=True,
            q_group_size=128))),
        # the composed quantizer: smoothing moves the outliers, GPTQ
        # compensates the rounding on the migrated weights
        "W4 Smooth+GPTQ": ("gptq+smooth", calib(QuantConfig(
            w_bit=4, a_bit=16, version="fake", zero_point=True,
            q_group_size=128))),
        "W4 RTN (no smoothing)": ("rtn", calib(QuantConfig(
            w_bit=4, a_bit=16, version="fake", zero_point=True,
            q_group_size=128))),
    }

    print(f"[quality] reference bf16 run: tiny={tiny} steps={steps} px={px}",
          file=sys.stderr, flush=True)
    ref_pipe = build_pipe(tiny, dtype)
    ref = gen(ref_pipe, steps, px)

    # single-step eps-prediction error: full-generation metrics saturate
    # once every low-bit mode has drifted (errors compound over steps
    # and CFG), hiding the smooth-vs-rtn gap; the one-step UNet output
    # error is the compounding-free discriminator
    def eps_fn(pipe):
        unet = pipe.components["unet"]
        lat = jax.random.normal(jax.random.PRNGKey(5),
                                (2, px // 8, px // 8, 4), jnp.float32)
        t = jnp.full((2,), 401, jnp.int32)
        ctx = jax.random.normal(jax.random.PRNGKey(6),
                                (2, 77, pipe.configs["unet"].cross_attention_dim),
                                jnp.float32).astype(pipe.dtype)
        return np.asarray(jax.jit(lambda p: unet.apply(
            {"params": p}, lat.astype(pipe.dtype), t, ctx))(
            pipe.params["unet"]).astype(jnp.float32))

    ref_eps = eps_fn(ref_pipe)
    del ref_pipe
    gc.collect()

    lpips_w = load_lpips_weights()
    rows = []
    for name, (method, cfg) in modes.items():
        print(f"[quality] {name}", file=sys.stderr, flush=True)
        pipe = build_pipe(tiny, dtype)   # same seed => identical weights
        kw = {}
        if method.endswith("+smooth"):
            method, kw = method[: -len("+smooth")], {"smooth": True}
        pipe.quantize(cfg, quantType=method, calib_prompts=CALIB_PROMPTS,
                      **kw)
        img = gen(pipe, steps, px)
        q_eps = eps_fn(pipe)
        row = {
            "config": name,
            "mse": float(np.mean(np.asarray(mse(ref, img)))),
            "psnr": float(np.mean(np.asarray(psnr(ref, img)))),
            "ssim": float(np.mean(np.asarray(ssim(ref, img)))),
            "eps_rel_l2": float(np.linalg.norm(q_eps - ref_eps)
                                / (np.linalg.norm(ref_eps) + 1e-9)),
        }
        if lpips_w is not None:
            row["lpips"] = float(np.mean(np.asarray(
                lpips_distance(ref, img, lpips_w))))
        rows.append(row)
        print(json.dumps(row), flush=True)
        del pipe
        gc.collect()

    artifact = {
        "setup": {"tiny": tiny, "steps": steps, "px": px,
                  "prompts": PROMPTS, "seed": 123,
                  "weights": "deterministic random"
                             + (f" + norm-gain outliers (max {_MAX_FACTOR}x)" if OUTLIERS else " (no real checkpoints in env)"),
                  "lpips": lpips_w is not None},
        "rows": rows,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    artifact_name = "quality_table_outliers.json" if OUTLIERS else "quality_table.json"
    with open(os.path.join(here, artifact_name), "w") as f:
        json.dump(artifact, f, indent=2)

    if not tiny:
        if OUTLIERS:
            lines = [
                "# QUALITY under outliers — the regime SmoothQuant/AWQ"
                " exist for",
                "",
                "With purely random weights nothing clips: rounding noise",
                "dominates and every quant mode looks alike (QUALITY.md's",
                "margin-sweep note; the reference's W4A16-Smooth vs W4-RTN",
                "LPIPS gap is 0.34 vs 0.57).  This table injects the",
                "heavy-tailed per-channel structure trained networks have",
                "(`qdm_tpu/utils/outliers.py::inject_norm_outliers`: ~4% of",
                f"every norm gain vector's channels scaled up to {_MAX_FACTOR:g}x,",
                "reproducing the persistent activation outliers SmoothQuant",
                "is built on — reference quantizer_SQ.py:272-295).  The bf16",
                "reference row shares the SAME injected weights, so each row",
                "isolates quantization error.  64x injection sends the",
                "random-weight UNet chaotic (softmax saturation; every mode",
                f"collapses to ~8.8 PSNR) — the {_MAX_FACTOR:g}x cap keeps the fp",
                "trajectory stable so modes separate.",
                "",
                f"`python tools/quality_table.py --outliers --max-factor"
                f" {_MAX_FACTOR:g}`",
                "(artifact: tools/quality_table_outliers.json;",
                f"{px}px, {steps} DDIM steps, CFG 7.5):",
                "",
            ]
        else:
            lines = [
                "# QUALITY — relative quality-parity table (SD1.5 architecture)",
                "",
                "Reference evidence: LPIPS tables in the reference README"
                " (README.md:24-42), fp16 vs quantized on identical prompts/seeds.",
                "Real checkpoints are unavailable in this environment (zero egress),",
                "so this table reproduces the *relative* ordering on the real",
                f"SD1.5 architecture ({px}px, {steps} DDIM steps, CFG 7.5) with",
                "shared deterministic random weights and latents — identical",
                "between the bf16 reference row and every quant mode.",
                "Reproduce: `python tools/quality_table.py` (artifact:",
                "tools/quality_table.json).",
                "",
            ]
        lines += [
            "| Config | MSE ↓ | PSNR ↑ | SSIM ↑ | eps rel-L2 ↓ |" +
            (" LPIPS ↓ |" if lpips_w is not None else ""),
            "|---|---|---|---|---|" + ("---|" if lpips_w is not None else ""),
        ]
        for r in rows:
            line = (f"| {r['config']} | {r['mse']:.5f} | {r['psnr']:.2f} | "
                    f"{r['ssim']:.4f} | {r['eps_rel_l2']:.4f} |")
            if "lpips" in r:
                line += f" {r['lpips']:.4f} |"
            lines.append(line)
        lines += [
            "",
            "Expected ordering (reference README): W8 modes degrade least;",
            "W4A16-Smooth recovers much of the W4 error; W4-RTN is worst.",
        ]
        if not OUTLIERS:
            lines += [
                "",
                "The W8A8-static row reflects the full measured serving plan",
                "(fused QKV, post-migration static scales, and the Pallas",
                "GEGLU point fusion whose tanh-approx gelu — Mosaic has no",
                "erf lowering — contributes a small drift vs exact gelu; the",
                "+6% throughput trade is documented in BENCH_NOTES.md).",
                "Static-scale margin sweep (same harness, real scale, TPU):",
                "margin 1.0 is best here (MSE 0.00086 vs 0.00107 @1.15,",
                "0.00133 @1.3) — with random weights rounding noise dominates",
                "and nothing clips; `QuantConfig.static_act_margin` exists",
                "for trained checkpoints where unseen-activation clipping",
                "matters.  The per-step-scales row (DiTAS-style",
                "`act_per_step_scales`) is within noise of the collapsed",
                "scale HERE for the same reason — random-weight activations",
                "barely vary across steps; the outlier regime and the tiny",
                "table (+1.1 dB) are where it separates.",
                "",
                "Companion tables: `QUALITY_OUTLIERS.md` (the heavy-tailed",
                "injection regime where SmoothQuant/AWQ separate —",
                "reproduces the reference's W4 Smooth-vs-RTN ordering) and",
                "the LLM KL tables (tools/llm_quality_table.json + the",
                "outlier variant).",
            ]
        if OUTLIERS:
            lines += [
                "",
                "The W8A8 SmoothQuant-vs-RTN pair runs the identical int8",
                "pipeline with identical calibrated static scales — only the",
                "scale migration differs — so its gap is pure smoothing",
                "benefit.  The LLM counterpart (tools/llm_quality_table.py",
                "--outliers, artifact tools/llm_quality_table_outliers.json)",
                "reproduces the reference ordering too: W4-RTN KL 6.63 >",
                "W4-GPTQ 5.33 > W4-Smooth 4.57 ~ W4-AWQ 4.52 >",
                "W4-Smooth+GPTQ 3.61 (the composed quantizer — smoothing",
                "moves the outliers, GPTQ compensates the rounding — is the",
                "best w4, best top-1/5 too), with W8 modes an order of",
                "magnitude closer to fp.  tools/awq_ab.json bounds the",
                "documented AWQ loss-target deviation at 2.7% mean MSE.",
            ]
        qmd = "QUALITY_OUTLIERS.md" if OUTLIERS else "QUALITY.md"
        path_md = os.path.join(os.path.dirname(here), qmd)
        # preserve hand-curated sections: everything at/after the
        # marker survives regeneration
        marker = "<!-- curated-below: preserved across regens -->"
        tail = ""
        if os.path.exists(path_md):
            old = open(path_md).read()
            if marker in old:
                tail = old[old.index(marker):]
        with open(path_md, "w") as f:
            f.write("\n".join(lines) + "\n")
            if tail:
                f.write("\n" + tail)
    print(json.dumps({"done": True, "rows": len(rows)}))


if __name__ == "__main__":
    main()
