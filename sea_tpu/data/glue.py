"""GLUE loaders (reference `src/dataset/glue.py:30-63`): HF datasets +
tokenizer, padded to max length 256; per-task batch sizes from
`glue_trainer.py:37-48`. Offline fallback: deterministic synthetic
classification data with a learnable token->label signal so KD trainers can
be exercised end-to-end without network access.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import numpy as np

TASK_TO_KEYS = {
    "cola": ("sentence", None),
    "mnli": ("premise", "hypothesis"),
    "mrpc": ("sentence1", "sentence2"),
    "qnli": ("question", "sentence"),
    "qqp": ("question1", "question2"),
    "rte": ("sentence1", "sentence2"),
    "sst2": ("sentence", None),
    "stsb": ("sentence1", "sentence2"),
    "wnli": ("sentence1", "sentence2"),
}

TASK_NUM_LABELS = {
    "cola": 2, "mnli": 3, "mrpc": 2, "qnli": 2, "qqp": 2,
    "rte": 2, "sst2": 2, "stsb": 1, "wnli": 2,
}

# reference glue_trainer.py:37-48
TASK_BATCH_SIZE = {
    "cola": 64, "mnli": 4, "mrpc": 32, "qnli": 4, "qqp": 16,
    "rte": 8, "sst2": 16, "stsb": 16, "wnli": 32,
}


@dataclasses.dataclass
class ArrayDataset:
    input_ids: np.ndarray  # (n, T)
    attention_mask: np.ndarray
    token_type_ids: np.ndarray
    labels: np.ndarray  # (n,)

    def __len__(self):
        return len(self.input_ids)

    def batches(self, batch_size: int, shuffle=False, seed=0,
                shard_id=0, num_shards=1) -> Iterator[Tuple[np.ndarray, ...]]:
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        order = order[shard_id::num_shards]
        for i in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            yield (
                self.input_ids[idx],
                self.attention_mask[idx],
                self.token_type_ids[idx],
                self.labels[idx],
            )


def synthetic_glue(
    subset: str, split: str, n: int = 512, max_length: int = 64,
    vocab_size: int = 30522, seed: int = 0,
) -> ArrayDataset:
    """Classification data where the label is a (noisy) function of marker
    tokens, so distillation/accuracy improvements are observable."""
    num_labels = TASK_NUM_LABELS[subset]
    rng = np.random.default_rng(seed + (0 if split == "train" else 1))
    T = max_length
    ids = rng.integers(1000, vocab_size, (n, T)).astype(np.int32)
    lens = rng.integers(T // 4, T + 1, n)
    mask = np.zeros((n, T), np.int32)
    labels = rng.integers(0, max(num_labels, 2), n).astype(np.int32)
    for i in range(n):
        mask[i, : lens[i]] = 1
        ids[i, lens[i]:] = 0
        ids[i, 0] = 101  # [CLS]
        # plant label-correlated marker tokens
        marker = 500 + labels[i]
        pos = rng.integers(1, lens[i], size=max(lens[i] // 8, 1))
        ids[i, pos] = marker
    if num_labels == 1:
        labels = labels.astype(np.float32) + rng.uniform(0, 0.5, n).astype(np.float32)
    tt = np.zeros((n, T), np.int32)
    return ArrayDataset(ids, mask, tt, labels)


def get_glue(
    subset: str, split: str = "train", max_length: int = 256,
    synthetic_fallback: bool = True, n_synth: int = 512,
) -> ArrayDataset:
    try:
        from datasets import load_dataset
        from transformers import AutoTokenizer

        ds = load_dataset("glue", subset, split=split)
        tok = AutoTokenizer.from_pretrained("bert-base-uncased")
        k1, k2 = TASK_TO_KEYS[subset]
        texts = (ds[k1],) if k2 is None else (ds[k1], ds[k2])
        enc = tok(
            *texts, padding="max_length", truncation=True, max_length=max_length
        )
        return ArrayDataset(
            np.asarray(enc["input_ids"], np.int32),
            np.asarray(enc["attention_mask"], np.int32),
            np.asarray(enc.get("token_type_ids", np.zeros_like(enc["input_ids"])), np.int32),
            np.asarray(ds["label"]),
        )
    except Exception:
        if not synthetic_fallback:
            raise
        return synthetic_glue(subset, split, n=n_synth, max_length=min(max_length, 64))
