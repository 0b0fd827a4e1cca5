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


# The 57 hendrycks-test subjects grouped into lm_eval's four MMLU
# categories (the grouping `evaluator.make_table` reports when the
# reference runs tasks=["mmlu"], eval_utils.py:117-164).  Public
# protocol constants (hendrycks/test categories.py).
MMLU_CATEGORIES: Dict[str, Sequence[str]] = {
    "stem": (
        "abstract_algebra", "astronomy", "college_biology",
        "college_chemistry", "college_computer_science",
        "college_mathematics", "college_physics", "computer_security",
        "conceptual_physics", "electrical_engineering",
        "elementary_mathematics", "high_school_biology",
        "high_school_chemistry", "high_school_computer_science",
        "high_school_mathematics", "high_school_physics",
        "high_school_statistics", "machine_learning"),
    "humanities": (
        "formal_logic", "high_school_european_history",
        "high_school_us_history", "high_school_world_history",
        "international_law", "jurisprudence", "logical_fallacies",
        "moral_disputes", "moral_scenarios", "philosophy", "prehistory",
        "professional_law", "world_religions"),
    "social_sciences": (
        "econometrics", "high_school_geography",
        "high_school_government_and_politics",
        "high_school_macroeconomics", "high_school_microeconomics",
        "high_school_psychology", "human_sexuality",
        "professional_psychology", "public_relations",
        "security_studies", "sociology", "us_foreign_policy"),
    "other": (
        "anatomy", "business_ethics", "clinical_knowledge",
        "college_medicine", "global_facts", "human_aging", "management",
        "marketing", "medical_genetics", "miscellaneous", "nutrition",
        "professional_accounting", "professional_medicine", "virology"),
}

_SUBJECT_TO_CATEGORY = {s: c for c, subs in MMLU_CATEGORIES.items()
                        for s in subs}


def eval_mmlu(logits_fn: Callable, tokenizer, items: Iterable[Dict],
              choices: Sequence[str] = ("A", "B", "C", "D"),
              fewshot: Sequence[Dict] = (),
              n_shot: int = 0,
              dev_items: Sequence[Dict] = (),
              batch_size: int = 8) -> Dict[str, float]:
    """items: {'question': str, 'choices': [4 x str], 'answer': int,
    'subject'?: str}.  Scores each choice by the logprob of its letter
    token appended to the prompt (the lm_eval 'mmlu' protocol's
    loglikelihood core: the ' A'..' D' continuations are single
    tokens), with k-shot exemplars and per-subject + per-category
    accuracy aggregation (MMLU standard is 5-shot).

    Protocol fidelity vs lm_eval (which the reference shells out to,
    eval_utils.py:117-164):
    * exemplars come from the DEV split of the item's own subject
      (`dev_items`, first `n_shot` matching entries — lm_eval's
      fewshot sampler); a flat `fewshot` list is the subject-agnostic
      fallback.
    * all four letter logprobs read ONE forward of the shared prompt
      prefix — causally identical to four continuation forwards (the
      letter token's logit depends only on tokens before it) — and
      items are batched `batch_size` per dispatch, right-padded
      (causal masking makes right padding score-neutral).
    * aggregate accuracy is item-averaged ('acc' micro average);
      category rows average their subjects like make_table's groups.
    """
    import jax
    import jax.numpy as jnp

    items = list(items)
    prompts, letter_rows = [], []
    for item in items:
        if n_shot and dev_items:
            subj = item.get("subject", "")
            shots = [d for d in dev_items
                     if d.get("subject", "") == subj][:n_shot]
            if not shots:
                shots = list(dev_items)[:n_shot]
        else:
            shots = list(fewshot)[:n_shot] if n_shot else []
        prompts.append(format_mmlu_prompt(item, choices, shots,
                                          item.get("subject", "")))

    # tokenize once; find each letter's divergence position vs the
    # bare prompt (robust to right-padding tokenizers)
    rows = []                     # (base_ids, [(pos, letter_id), ...])
    for item, prompt in zip(items, prompts):
        base = np.asarray(tokenizer([prompt])).reshape(-1)
        per_letter = []
        for letter in choices[: len(item["choices"])]:
            ids = np.asarray(tokenizer([prompt + " " + letter])).reshape(-1)
            m = min(len(ids), len(base))
            diff = np.nonzero(ids[:m] != base[:m])[0]
            pos = (int(diff[0]) if len(diff)
                   else m if len(ids) > m else len(ids) - 1)
            per_letter.append((pos, int(ids[pos])))
        rows.append((base, per_letter))

    correct = total = 0
    by_subject: Dict[str, List[int]] = {}
    for i0 in range(0, len(rows), batch_size):
        chunk = rows[i0: i0 + batch_size]
        width = max(len(b) for b, _ in chunk)
        batch = np.zeros((len(chunk), width), np.int32)
        for r, (b, _) in enumerate(chunk):
            batch[r, : len(b)] = b
        logits = logits_fn(jnp.asarray(batch))
        logp = np.asarray(jax.nn.log_softmax(
            jnp.asarray(logits).astype(jnp.float32), axis=-1))
        for r, (item, (_, per_letter)) in enumerate(
                zip(items[i0: i0 + batch_size], chunk)):
            scores = [float(logp[r, pos - 1, tid]) for pos, tid in per_letter]
            hit = int(np.argmax(scores) == item["answer"])
            correct += hit
            total += 1
            by_subject.setdefault(item.get("subject", "all"), []).append(hit)

    out = {"accuracy": correct / max(total, 1), "n": total}
    if len(by_subject) > 1 or "all" not in by_subject:
        out["subjects"] = {k: float(np.mean(v))
                           for k, v in sorted(by_subject.items())}
        cats: Dict[str, List[float]] = {}
        for s, hits in by_subject.items():
            cat = _SUBJECT_TO_CATEGORY.get(s)
            if cat is not None:
                cats.setdefault(cat, []).append(float(np.mean(hits)))
        if cats:
            out["categories"] = {c: float(np.mean(v))
                                 for c, v in sorted(cats.items())}
    return out


def make_mmlu_table(results: Dict) -> str:
    """lm_eval `make_table`-style report for eval_mmlu results: the
    overall row, category groups, then per-subject rows."""
    lines = ["|{:<42}|{:>8}|{:>8}|".format("Task", "acc", "n"),
             "|" + "-" * 42 + "|" + "-" * 8 + "|" + "-" * 8 + "|",
             "|{:<42}|{:>8.4f}|{:>8}|".format(
                 "mmlu", results["accuracy"], results["n"])]
    for cat, acc in results.get("categories", {}).items():
        lines.append("|{:<42}|{:>8.4f}|{:>8}|".format(
            " - " + cat, acc, ""))
    for subj, acc in results.get("subjects", {}).items():
        lines.append("|{:<42}|{:>8.4f}|{:>8}|".format(
            "   - " + subj, acc, ""))
    return "\n".join(lines)


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
