"""Wikitext-2 (and OpenWebText) corpus pipeline for causal-LM KD.

Reference: `src/dataset/wikitext2.py:42-214` — tokenize the whole corpus
once into a flat token tensor, then serve strided windows where only the
last `stride` targets are supervised (`trg_len` masking) so sliding-window
perplexity matches the standard evaluation protocol.

Offline-friendly: when HF `datasets`/tokenizers are unavailable (no
network), `SyntheticCorpus` provides a deterministic Zipf-distributed token
stream with the same interface, so the full training/eval path runs in CI.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class WindowedCorpus:
    """Flat token array served as strided (input, target-mask) windows."""

    tokens: np.ndarray  # (total,) int32
    max_length: int
    stride: int

    def __post_init__(self):
        assert self.stride <= self.max_length

    def __len__(self) -> int:
        total = len(self.tokens)
        if total <= self.max_length:
            return 1
        return 1 + (total - self.max_length + self.stride - 1) // self.stride

    def window(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (input_ids (L,), labels (L,)) with labels = -100 outside
        the supervised tail (reference wikitext2.py:163-189)."""
        total = len(self.tokens)
        begin = min(idx * self.stride, max(total - self.max_length, 0))
        end = min(begin + self.max_length, total)
        prev_end = begin if idx == 0 else min((idx - 1) * self.stride + self.max_length, total)
        trg_len = end - prev_end if idx > 0 else end - begin
        ids = self.tokens[begin:end].astype(np.int32)
        labels = ids.astype(np.int64).copy()
        labels[: len(ids) - trg_len] = -100
        return ids, labels

    def batches(
        self, batch_size: int, shuffle: bool = False, seed: int = 0,
        shard_id: int = 0, num_shards: int = 1,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yields (input_ids, attention_mask, labels) batches, padded to
        max_length; sharded round-robin for data parallelism (the
        DistributedSampler analogue, reference wikitext2.py:196-207)."""
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        order = order[shard_id::num_shards]
        L = self.max_length
        from ..native import window_batch_native

        for i in range(0, len(order), batch_size):
            chunk = order[i : i + batch_size]
            if len(chunk) < batch_size:
                break
            native = window_batch_native(
                self.tokens, chunk.astype(np.int64), L, self.stride
            )
            if native is not None:
                yield native
                continue
            ids_b = np.full((batch_size, L), 1, np.int32)  # pad id 1
            mask_b = np.zeros((batch_size, L), np.int32)
            lab_b = np.full((batch_size, L), -100, np.int64)
            for j, idx in enumerate(chunk):
                ids, labels = self.window(int(idx))
                ids_b[j, : len(ids)] = ids
                mask_b[j, : len(ids)] = 1
                lab_b[j, : len(labels)] = labels
            yield ids_b, mask_b, lab_b


def synthetic_corpus(
    vocab_size: int = 50272, total_tokens: int = 200_000, seed: int = 0
) -> np.ndarray:
    """Deterministic Zipf-ish token stream with local repetition structure
    (so a language model has something to learn)."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab_size - 4)
    probs = 1.0 / ranks ** 1.1
    probs /= probs.sum()
    base = rng.choice(vocab_size - 5, size=total_tokens, p=probs) + 4
    # inject n-gram structure: repeat the previous token with p=0.15
    rep = rng.uniform(size=total_tokens) < 0.15
    out = base.copy()
    out[1:][rep[1:]] = out[:-1][rep[1:]]
    return out.astype(np.int32)


def load_wikitext2_tokens(
    tokenizer_name: str = "facebook/opt-125m",
    split: str = "train",
    cache_dir: Optional[str] = None,
    allow_download: bool = False,
) -> np.ndarray:
    """Tokenize wikitext-2-raw-v1 once (reference tokenize-and-cache,
    wikitext2.py:129-141). Raises if data is unavailable offline."""
    cache_dir = cache_dir or os.path.join(os.path.dirname(__file__), "..", "..", "saves", "data")
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir, f"wikitext2_{split}.npy")
    if os.path.exists(cache):
        return np.load(cache)
    if not allow_download:
        raise FileNotFoundError(f"no cached tokens at {cache} and downloads disabled")
    from datasets import load_dataset
    from transformers import AutoTokenizer

    ds = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
    tok = AutoTokenizer.from_pretrained(tokenizer_name)
    text = "\n\n".join(ds["text"])
    ids = np.asarray(tok(text).input_ids, dtype=np.int32)
    np.save(cache, ids)
    return ids


def load_openwebtext_tokens(
    tokenizer_name: str = "facebook/opt-125m",
    split: str = "train",
    cache_dir: Optional[str] = None,
    allow_download: bool = False,
    max_documents: int = 20000,
) -> np.ndarray:
    """OpenWebText variant (reference FORCE_OPENWEBTEXT=1 swap,
    wikitext2.py:55-75)."""
    cache_dir = cache_dir or os.path.join(os.path.dirname(__file__), "..", "..", "saves", "data")
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir, f"openwebtext_{split}.npy")
    if os.path.exists(cache):
        return np.load(cache)
    if not allow_download:
        raise FileNotFoundError(f"no cached tokens at {cache} and downloads disabled")
    from datasets import load_dataset
    from transformers import AutoTokenizer

    ds = load_dataset("openwebtext", split=split, streaming=True)
    tok = AutoTokenizer.from_pretrained(tokenizer_name)
    chunks = []
    for i, ex in enumerate(ds):
        if i >= max_documents:
            break
        chunks.extend(tok(ex["text"]).input_ids)
    ids = np.asarray(chunks, dtype=np.int32)
    np.save(cache, ids)
    return ids


def get_corpus(
    max_length: int,
    stride: int,
    split: str = "train",
    synthetic_fallback: bool = True,
    vocab_size: int = 50272,
    dataset: str = "wikitext2",
    cache_dir: Optional[str] = None,
) -> WindowedCorpus:
    """cache_dir: where `{dataset}_{split}.npy` token files live (default
    saves/data). REAL-DATA DROP-IN (docs/REAL_DATA.md): placing those .npy
    files there makes every trainer consume the real corpus with zero code
    edits — the cache check precedes any network access, and the
    synthetic fallback only triggers when the file is absent."""
    try:
        if dataset == "openwebtext":
            tokens = load_openwebtext_tokens(
                split=split, allow_download=True, cache_dir=cache_dir
            )
        else:
            tokens = load_wikitext2_tokens(
                split=split, allow_download=True, cache_dir=cache_dir
            )
    except Exception:
        if not synthetic_fallback:
            raise
        seed = 0 if split == "train" else 1
        tokens = synthetic_corpus(vocab_size=vocab_size, seed=seed)
    return WindowedCorpus(tokens=tokens, max_length=max_length, stride=stride)
