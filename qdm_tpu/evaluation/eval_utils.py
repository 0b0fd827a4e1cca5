"""LLM task-eval harnesses (reference: evaluation/eval_utils.py).

* evaluate_perplexity lives in qdm_tpu.evaluation.kl_divergence (same
  sliding 2048-token semantics as eval_utils.py:22-58).
* eval_mmlu: local MCQ scoring given a logits_fn — the reference shells
  out to lm_eval (+vllm) (eval_utils.py:117-164), which needs network;
  this implementation scores A/B/C/D by summed answer-token logprob.
* eval_librispeech (WER) requires a speech model + audio data; exposed
  with the reference signature but gated on local availability of the
  `evaluate`/`datasets` assets (eval_utils.py:61-115).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Sequence

import numpy as np


def _levenshtein(a: List[str], b: List[str]) -> int:
    dp = list(range(len(b) + 1))
    for i, wa in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, wb in enumerate(b, 1):
            cur = min(dp[j] + 1, dp[j - 1] + 1, prev + (wa != wb))
            prev, dp[j] = dp[j], cur
    return dp[-1]


def word_error_rate(refs: Sequence[str], hyps: Sequence[str]) -> float:
    """WER over a corpus (the metric inside eval_librispeech,
    eval_utils.py:61-115; the whisper transcription loop is supplied by
    the caller as `hyps`)."""
    errs, words = 0, 0
    for r, h in zip(refs, hyps):
        rw, hw = r.lower().split(), h.lower().split()
        errs += _levenshtein(rw, hw)
        words += len(rw)
    return errs / max(words, 1)


def eval_mmlu(logits_fn: Callable, tokenizer, items: Iterable[Dict],
              choices: Sequence[str] = ("A", "B", "C", "D")) -> Dict[str, float]:
    """items: {'question': str, 'choices': [4 x str], 'answer': int}.
    Scores each choice by the logprob of its letter token appended to
    the prompt; reports accuracy (the lm_eval 'mmlu' protocol distilled
    to its logprob core)."""
    import jax
    import jax.numpy as jnp

    correct = total = 0
    for item in items:
        prompt = item["question"].strip() + "\n"
        for i, c in enumerate(item["choices"]):
            prompt += f"{choices[i]}. {c}\n"
        prompt += "Answer:"
        scores = []
        for letter in choices[: len(item["choices"])]:
            ids = np.asarray(tokenizer(prompt + " " + letter)).reshape(1, -1)
            logits = np.asarray(logits_fn(jnp.asarray(ids)))
            logp = jax.nn.log_softmax(jnp.asarray(logits[0, -2]))
            scores.append(float(logp[ids[0, -1]]))
        correct += int(np.argmax(scores) == item["answer"])
        total += 1
    return {"accuracy": correct / max(total, 1), "n": total}


def eval_librispeech(transcribe_fn: Callable[[np.ndarray], str],
                     dataset=None, n_samples: int = 100) -> Dict[str, float]:
    """WER over librispeech-style (audio, text) pairs; dataset defaults
    to the local HF cache if available (eval_utils.py:61-115)."""
    if dataset is None:
        try:
            from datasets import load_dataset

            dataset = load_dataset("librispeech_asr", "clean",
                                   split="test", streaming=True)
        except Exception as e:
            raise RuntimeError(
                "librispeech not available locally; pass `dataset`") from e
    refs, hyps = [], []
    for i, ex in enumerate(dataset):
        if i >= n_samples:
            break
        refs.append(ex["text"])
        hyps.append(transcribe_fn(ex["audio"]["array"]))
    return {"wer": word_error_rate(refs, hyps), "n": len(refs)}
