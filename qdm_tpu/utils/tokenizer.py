"""Tokenization for prompt encoding.

Uses the HF CLIP tokenizer when its vocab files exist locally in the
checkpoint dir (the reference gets this for free from diffusers,
models/base.py:199); falls back to a deterministic hash tokenizer for
random-weight pipelines (tests/benchmarks) where only shapes matter.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np


class SimpleTokenizer:
    """Deterministic stand-in tokenizer: words -> stable pseudo-ids.
    BOS=max-2, EOS=max-1 style ids chosen inside vocab."""

    def __init__(self, vocab_size: int = 49408, max_len: int = 77):
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.bos = vocab_size - 2
        self.eos = vocab_size - 1

    def _word_id(self, w: str) -> int:
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "little")
        return h % max(self.vocab_size - 2, 1)

    def __call__(self, prompts: Sequence[str]) -> jnp.ndarray:
        out = np.zeros((len(prompts), self.max_len), np.int32)
        for i, p in enumerate(prompts):
            ids = [self.bos] + [self._word_id(w) for w in p.split()][: self.max_len - 2]
            ids.append(self.eos)
            ids += [self.eos] * (self.max_len - len(ids))
            out[i] = ids[: self.max_len]
        return jnp.asarray(out)


class HFTokenizerWrapper:
    def __init__(self, tok, max_len: int):
        self.tok = tok
        self.max_len = max_len

    def __call__(self, prompts: Sequence[str]) -> jnp.ndarray:
        enc = self.tok(list(prompts), padding="max_length", truncation=True,
                       max_length=self.max_len, return_tensors="np")
        return jnp.asarray(enc["input_ids"].astype(np.int32))


def load_tokenizer(tok_dir: str, text_config):
    import os

    max_len = text_config.max_position_embeddings
    if os.path.isdir(tok_dir):
        try:
            from transformers import CLIPTokenizerFast

            return HFTokenizerWrapper(
                CLIPTokenizerFast.from_pretrained(tok_dir), max_len)
        except Exception:
            try:
                from transformers import CLIPTokenizer

                return HFTokenizerWrapper(
                    CLIPTokenizer.from_pretrained(tok_dir), max_len)
            except Exception:
                pass
    return SimpleTokenizer(text_config.vocab_size, max_len)
