"""Functional, jittable noise schedulers.

The reference delegates scheduling to diffusers (PNDM default for SD1.5,
50 steps at models/base.py:848).  Here schedulers are pure pytrees: a
`make_*` builds static tables, `step` is jit-friendly (no Python state),
so the whole denoising loop compiles as one `lax.fori_loop`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp


@dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 1
    prediction_type: str = "epsilon"   # "epsilon" | "v_prediction"
    timestep_spacing: str = "leading"
    # SD1.x/SDXL scheduler configs ship set_alpha_to_one=False: the final
    # DDIM step uses alphas_cumprod[0] rather than 1.0 (diffusers parity)
    set_alpha_to_one: bool = False


SD15_SCHED = SchedulerConfig()
SDXL_SCHED = SchedulerConfig()
SD21_SCHED = SchedulerConfig(prediction_type="v_prediction")


class DDIMTables(NamedTuple):
    timesteps: jnp.ndarray       # (S,) int32, descending
    alphas_cumprod: jnp.ndarray  # (T,) f32
    final_alpha_cumprod: jnp.ndarray
    prediction_type: str


def _betas(cfg: SchedulerConfig):
    if cfg.beta_schedule == "scaled_linear":
        return jnp.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5,
                            cfg.num_train_timesteps, dtype=jnp.float64) ** 2
    return jnp.linspace(cfg.beta_start, cfg.beta_end,
                        cfg.num_train_timesteps, dtype=jnp.float64)


def make_ddim(cfg: SchedulerConfig, num_inference_steps: int) -> DDIMTables:
    betas = _betas(cfg)
    alphas_cumprod = jnp.cumprod(1.0 - betas).astype(jnp.float32)
    if cfg.timestep_spacing == "leading":
        ratio = cfg.num_train_timesteps // num_inference_steps
        ts = (jnp.arange(num_inference_steps) * ratio).round().astype(jnp.int32)
        ts = ts[::-1] + cfg.steps_offset
    else:  # trailing
        ts = jnp.round(jnp.arange(cfg.num_train_timesteps, 0,
                                  -cfg.num_train_timesteps / num_inference_steps)
                       ).astype(jnp.int32) - 1
    final_alpha = (jnp.asarray(1.0, jnp.float32) if cfg.set_alpha_to_one
                   else alphas_cumprod[0])
    return DDIMTables(ts, alphas_cumprod, final_alpha, cfg.prediction_type)


def ddim_step(tables: DDIMTables, model_output, sample, step_index,
              num_inference_steps: int, eta: float = 0.0):
    """One deterministic DDIM update (eta=0).  All f32."""
    t = tables.timesteps[step_index]
    prev_t = t - tables.alphas_cumprod.shape[0] // num_inference_steps
    a_t = tables.alphas_cumprod[t]
    a_prev = jnp.where(prev_t >= 0, tables.alphas_cumprod[jnp.maximum(prev_t, 0)],
                       tables.final_alpha_cumprod)
    sample = sample.astype(jnp.float32)
    model_output = model_output.astype(jnp.float32)
    if tables.prediction_type == "v_prediction":
        pred_x0 = (a_t ** 0.5) * sample - ((1 - a_t) ** 0.5) * model_output
        eps = (a_t ** 0.5) * model_output + ((1 - a_t) ** 0.5) * sample
    else:
        pred_x0 = (sample - ((1 - a_t) ** 0.5) * model_output) / (a_t ** 0.5)
        eps = model_output
    prev = (a_prev ** 0.5) * pred_x0 + ((1 - a_prev) ** 0.5) * eps
    return prev


class EulerTables(NamedTuple):
    timesteps: jnp.ndarray   # (S,) f32
    sigmas: jnp.ndarray      # (S+1,) f32
    init_noise_sigma: jnp.ndarray


def make_euler(cfg: SchedulerConfig, num_inference_steps: int) -> EulerTables:
    betas = _betas(cfg)
    alphas_cumprod = jnp.cumprod(1.0 - betas).astype(jnp.float32)
    sigmas_all = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
    if cfg.timestep_spacing == "leading":
        ratio = cfg.num_train_timesteps // num_inference_steps
        ts = (jnp.arange(num_inference_steps) * ratio).round()[::-1] + cfg.steps_offset
    else:
        ts = jnp.linspace(0, cfg.num_train_timesteps - 1, num_inference_steps)[::-1]
    sigmas = jnp.interp(ts, jnp.arange(cfg.num_train_timesteps), sigmas_all)
    sigmas = jnp.concatenate([sigmas, jnp.zeros(1)])
    return EulerTables(ts.astype(jnp.float32), sigmas.astype(jnp.float32),
                       (sigmas.max() ** 2 + 1) ** 0.5)


def euler_scale_input(tables: EulerTables, sample, step_index):
    sigma = tables.sigmas[step_index]
    return sample / ((sigma**2 + 1) ** 0.5)


def euler_step(tables: EulerTables, model_output, sample, step_index):
    sigma = tables.sigmas[step_index]
    sample = sample.astype(jnp.float32)
    pred_x0 = sample - sigma * model_output.astype(jnp.float32)
    d = (sample - pred_x0) / sigma
    dt = tables.sigmas[step_index + 1] - sigma
    return sample + d * dt


class FlowMatchTables(NamedTuple):
    """SD3.x rectified-flow Euler scheduler."""

    timesteps: jnp.ndarray  # (S,) f32 in (0, 1000]
    sigmas: jnp.ndarray     # (S+1,) f32 in [0, 1]


def make_flow_match(num_inference_steps: int, shift: float = 3.0,
                    num_train_timesteps: int = 1000) -> FlowMatchTables:
    sigmas = jnp.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    timesteps = sigmas * num_train_timesteps
    sigmas = jnp.concatenate([sigmas, jnp.zeros(1)])
    return FlowMatchTables(timesteps.astype(jnp.float32), sigmas.astype(jnp.float32))


def flow_match_step(tables: FlowMatchTables, model_output, sample, step_index):
    dt = tables.sigmas[step_index + 1] - tables.sigmas[step_index]
    return sample.astype(jnp.float32) + dt * model_output.astype(jnp.float32)
