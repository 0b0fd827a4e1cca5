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


def format_mmlu_prompt(item: Dict, choices: Sequence[str] = ("A", "B", "C", "D"),
                       fewshot: Sequence[Dict] = (),
                       subject: str = "") -> str:
    """The lm_eval 'mmlu' prompt format (hendrycks-test style): an
    optional subject header, k answered exemplars, then the question
    with an unanswered 'Answer:' cue (eval_utils.py:117-164 shells
    this protocol out to lm_eval; reproduced locally)."""

    def one(it, with_answer):
        p = it["question"].strip() + "\n"
        for i, c in enumerate(it["choices"]):
            p += f"{choices[i]}. {c}\n"
        p += "Answer:"
        if with_answer:
            p += f" {choices[it['answer']]}\n\n"
        return p

    header = ""
    if subject:
        pretty = subject.replace("_", " ")
        header = (f"The following are multiple choice questions "
                  f"(with answers) about {pretty}.\n\n")
    return header + "".join(one(f, True) for f in fewshot) + one(item, False)


def eval_mmlu(logits_fn: Callable, tokenizer, items: Iterable[Dict],
              choices: Sequence[str] = ("A", "B", "C", "D"),
              fewshot: Sequence[Dict] = (),
              n_shot: int = 0) -> Dict[str, float]:
    """items: {'question': str, 'choices': [4 x str], 'answer': int,
    'subject'?: str}.  Scores each choice by the logprob of its letter
    token appended to the prompt (the lm_eval 'mmlu' protocol's
    loglikelihood core), with optional k-shot exemplars (MMLU standard
    is 5-shot) and per-subject accuracy aggregation."""
    import jax
    import jax.numpy as jnp

    correct = total = 0
    by_subject: Dict[str, List[int]] = {}
    for item in items:
        shots = tuple(fewshot)[:n_shot] if n_shot else ()
        prompt = format_mmlu_prompt(item, choices, shots,
                                    item.get("subject", ""))
        base = np.asarray(tokenizer([prompt])).reshape(1, -1)
        scores = []
        for letter in choices[: len(item["choices"])]:
            ids = np.asarray(tokenizer([prompt + " " + letter])).reshape(1, -1)
            # letter-token position: first index where the tokenization
            # diverges from the bare prompt's (robust to tokenizers
            # that right-pad — scoring the last position would read a
            # pad token there)
            m = min(ids.shape[1], base.shape[1])
            diff = np.nonzero(ids[0, :m] != base[0, :m])[0]
            pos = (int(diff[0]) if len(diff)
                   else m if ids.shape[1] > m else ids.shape[1] - 1)
            logits = np.asarray(logits_fn(jnp.asarray(ids)))
            logp = jax.nn.log_softmax(jnp.asarray(logits[0, pos - 1]))
            scores.append(float(logp[ids[0, pos]]))
        hit = int(np.argmax(scores) == item["answer"])
        correct += hit
        total += 1
        by_subject.setdefault(item.get("subject", "all"), []).append(hit)
    out = {"accuracy": correct / max(total, 1), "n": total}
    if len(by_subject) > 1 or "all" not in by_subject:
        out["subjects"] = {k: float(np.mean(v))
                           for k, v in sorted(by_subject.items())}
    return out


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
