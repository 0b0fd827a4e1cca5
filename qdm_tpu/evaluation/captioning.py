"""Caption / VQA metrics: CIDEr-D and VQAv2 accuracy — pure-python
n-gram arithmetic, no external deps.

The reference publishes its LLaVA-Next results exclusively in these
two metrics (/root/reference/performanceCurves.py:22-62: CIDEr and
VQAv2 sweeps) but ships only the hardcoded sweep tables; these are the
metric implementations so the curves can be reproduced end-to-end.

CIDEr-D (Vedantam et al., CVPR 2015, §8): tf-idf weighted n-gram
(n=1..4) cosine similarity between candidate and each reference,
clipped candidate counts (min(g_c, g_s) in the numerator), gaussian
length penalty exp(-(lc-ls)^2 / (2*6^2)), averaged over references and
over n, scaled x10.  IDF is corpus-level: log(N) - log(max(df, 1))
where df counts images whose reference set contains the n-gram.

VQAv2 accuracy (Antol et al.): each question has 10 human answers;
acc(ans) = mean over the 10 leave-one-out subsets of
min(1, #matches_in_subset / 3), after the official normalization
(lowercase, punctuation strip, article removal, number words,
contractions).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence

# --------------------------------------------------------------- CIDEr-D

_PUNCT = re.compile(r"[^\w\s]")


def tokenize(s: str) -> List[str]:
    """Lowercase, strip punctuation, whitespace split (stand-in for the
    PTB tokenizer the original harness shells out to)."""
    return _PUNCT.sub("", s.lower()).split()


def _ngrams(tokens: Sequence[str], max_n: int = 4) -> List[Counter]:
    out = []
    for n in range(1, max_n + 1):
        out.append(Counter(tuple(tokens[i:i + n])
                           for i in range(len(tokens) - n + 1)))
    return out


def _tfidf(counts: Counter, df: Dict[tuple, int], log_n: float):
    vec = {g: c * (log_n - math.log(max(df.get(g, 0), 1.0)))
           for g, c in counts.items()}
    norm = math.sqrt(sum(v * v for v in vec.values()))
    return vec, norm


def cider_d(candidates: Sequence[str],
            references: Sequence[Sequence[str]],
            max_n: int = 4, sigma: float = 6.0) -> Dict[str, object]:
    """candidates[i] is scored against references[i] (>=1 captions per
    image); the IDF corpus is the full reference set.  Returns
    {'CIDEr-D': mean score, 'scores': per-image list}."""
    if len(candidates) != len(references):
        raise ValueError("need one candidate per reference set")
    n_img = len(references)
    log_n = math.log(max(n_img, 1))

    # document frequency per n over the reference corpus
    dfs = [defaultdict(int) for _ in range(max_n)]
    ref_counts = []
    for refs in references:
        per_ref = [_ngrams(tokenize(r), max_n) for r in refs]
        ref_counts.append(per_ref)
        for n in range(max_n):
            seen = set()
            for counts in per_ref:
                seen.update(counts[n].keys())
            for g in seen:
                dfs[n][g] += 1

    scores = []
    for cand, per_ref in zip(candidates, ref_counts):
        ctoks = tokenize(cand)
        cgrams = _ngrams(ctoks, max_n)
        score_n = [0.0] * max_n
        for n in range(max_n):
            cvec, cnorm = _tfidf(cgrams[n], dfs[n], log_n)
            for rg in per_ref:
                rvec, rnorm = _tfidf(rg[n], dfs[n], log_n)
                # clipped dot product: min(candidate, reference) count
                num = sum(min(cvec[g], rvec[g]) * rvec[g]
                          for g in cvec if g in rvec and cvec[g] > 0)
                rlen = sum(rg[0].values())   # unigram count = token count
                delta = len(ctoks) - rlen
                pen = math.exp(-delta * delta / (2 * sigma * sigma))
                if cnorm > 0 and rnorm > 0:
                    score_n[n] += pen * num / (cnorm * rnorm)
            score_n[n] *= 10.0 / max(len(per_ref), 1)
        scores.append(sum(score_n) / max_n)
    return {"CIDEr-D": sum(scores) / max(len(scores), 1), "scores": scores}


# ----------------------------------------------------------- VQA accuracy

_CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't",
    "couldnt": "couldn't", "didnt": "didn't", "doesnt": "doesn't",
    "dont": "don't", "hadnt": "hadn't", "hasnt": "hasn't",
    "havent": "haven't", "hes": "he's", "im": "i'm", "isnt": "isn't",
    "itd": "it'd", "itll": "it'll", "lets": "let's",
    "shouldnt": "shouldn't", "thats": "that's", "theres": "there's",
    "theyd": "they'd", "theyre": "they're", "wasnt": "wasn't",
    "werent": "weren't", "whats": "what's", "wheres": "where's",
    "wont": "won't", "wouldnt": "wouldn't", "youd": "you'd",
    "youll": "you'll", "youre": "you're",
}
_NUMBERS = {"none": "0", "zero": "0", "one": "1", "two": "2",
            "three": "3", "four": "4", "five": "5", "six": "6",
            "seven": "7", "eight": "8", "nine": "9", "ten": "10"}
_ARTICLES = {"a", "an", "the"}
_PUNCT_VQA = re.compile(r"[;/\[\]\"{}()=+\\_\-><@`,?!]")


def normalize_answer(ans: str) -> str:
    """The official VQA eval processing: punctuation strip, number
    words -> digits, article removal, contraction restoration."""
    s = ans.lower().strip().replace("\n", " ").replace("\t", " ")
    s = _PUNCT_VQA.sub("", s)
    s = s.replace(".", "").replace(":", "")
    words = []
    for w in s.split():
        w = _NUMBERS.get(w, w)
        if w in _ARTICLES:
            continue
        words.append(_CONTRACTIONS.get(w, w))
    return " ".join(words)


def vqa_accuracy(answers: Sequence[str],
                 gt_answers: Sequence[Sequence[str]]) -> Dict[str, object]:
    """answers[i] vs gt_answers[i] (the 10 human answers).  Returns
    {'accuracy': mean, 'per_question': list}."""
    per = []
    for ans, gts in zip(answers, gt_answers):
        a = normalize_answer(ans)
        g = [normalize_answer(x) for x in gts]
        accs = []
        for i in range(len(g)):
            others = g[:i] + g[i + 1:]
            accs.append(min(1.0, sum(1 for o in others if o == a) / 3.0))
        per.append(sum(accs) / max(len(accs), 1))
    return {"accuracy": sum(per) / max(len(per), 1), "per_question": per}
