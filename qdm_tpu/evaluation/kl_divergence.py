"""KL-divergence / top-k agreement eval between a reference and a
quantized model (reference: evaluation/kl_divergence.py:24-159).

Model-agnostic: takes two callables `logits_fn(input_ids) -> logits`
(B, S, V) so it works with any JAX LM (or wrapped HF torch model on
CPU).  Math parity:

* per-token KL(ref || quant) of the softmax distributions
  (rel_entr, kl_divergence.py:24-29);
* top-1/5/10 agreement of argmax sets;
* confidence intervals: student-t on the token KL mean and binomial
  normal-approx on agreement rates (bin_conf, kl_divergence.py:32-39).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _rel_entr(p, q):
    p = jnp.clip(p, 1e-12, None)
    q = jnp.clip(q, 1e-12, None)
    return jnp.sum(p * (jnp.log(p) - jnp.log(q)), axis=-1)


@jax.jit
def kl_and_topk(ref_logits, q_logits):
    """Returns (kl (B,S), top1 (B,S), top5 (B,S), top10 (B,S))."""
    p = jax.nn.softmax(ref_logits.astype(jnp.float32), axis=-1)
    q = jax.nn.softmax(q_logits.astype(jnp.float32), axis=-1)
    kl = _rel_entr(p, q)

    def topk_agree(k):
        _, ri = jax.lax.top_k(ref_logits, k)
        _, qi = jax.lax.top_k(q_logits, k)
        inter = (ri[..., :, None] == qi[..., None, :]).any(-1).sum(-1)
        return inter.astype(jnp.float32) / k

    return kl, topk_agree(1), topk_agree(5), topk_agree(10)


def bin_conf(p_hat: float, n: int, z: float = 1.96):
    """Binomial normal-approx CI (kl_divergence.py:32-39)."""
    if n == 0:
        return 0.0
    return z * float(np.sqrt(p_hat * (1 - p_hat) / n))


def eval_kl_divergence(ref_logits_fn: Callable, quant_logits_fn: Callable,
                       input_chunks: Iterable[np.ndarray]) -> Dict[str, float]:
    """Aggregate KL + agreement over tokenized chunks (each (B, S))."""
    kls: List[np.ndarray] = []
    aggs = {1: [], 5: [], 10: []}
    for ids in input_chunks:
        ids = jnp.asarray(ids)
        kl, t1, t5, t10 = kl_and_topk(ref_logits_fn(ids), quant_logits_fn(ids))
        kls.append(np.asarray(kl).reshape(-1))
        for k, v in ((1, t1), (5, t5), (10, t10)):
            aggs[k].append(np.asarray(v).reshape(-1))
    kl_all = np.concatenate(kls)
    n = kl_all.size
    mean_kl = float(kl_all.mean())
    sem = float(kl_all.std(ddof=1) / np.sqrt(n)) if n > 1 else 0.0
    out = {
        "kl_mean": mean_kl,
        "kl_ci95": 1.96 * sem,
        "kl_median": float(np.median(kl_all)),
        "n_tokens": int(n),
    }
    for k in (1, 5, 10):
        a = np.concatenate(aggs[k])
        out[f"top{k}_agreement"] = float(a.mean())
        out[f"top{k}_ci95"] = bin_conf(float(a.mean()), a.size)
    return out


def evaluate_perplexity(logits_fn: Callable, input_ids: np.ndarray,
                        seqlen: int = 2048) -> float:
    """Sliding-window wikitext-style perplexity
    (evaluation/eval_utils.py:22-58): chunk a long token stream into
    seqlen blocks, next-token NLL."""
    ids = np.asarray(input_ids).reshape(-1)
    n_chunks = len(ids) // seqlen
    nlls = []
    for i in range(n_chunks):
        chunk = jnp.asarray(ids[i * seqlen:(i + 1) * seqlen][None, :])
        logits = logits_fn(chunk)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = chunk[:, 1:]
        tok_logp = jnp.take_along_axis(logp[:, :-1], tgt[..., None], axis=-1)
        nlls.append(float(-tok_logp.mean()) * (seqlen - 1))
    return float(np.exp(np.sum(nlls) / (n_chunks * (seqlen - 1))))
