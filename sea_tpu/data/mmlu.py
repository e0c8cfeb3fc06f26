"""MMLU (hendrycks-test) loader + 4-way choice evaluation.

The reference's headline table includes MMLU (LLaMA-13B 54.87 vs SEA-13B
47.93, `/root/reference/README.md:38`) but ships no evaluation code — this
module supplies the harness. Offline-friendly like the other loaders:
`load_mmlu` reads the standard hendrycks CSV layout from a local directory
(`{subject}_test.csv` rows of question, A, B, C, D, answer-letter, no
header); with no directory a deterministic synthetic task is generated so
the pipeline stays testable under zero egress.

Scoring follows the original MMLU harness: greedily compare the model's
final-position logits over the four answer-letter tokens and take the
argmax.
"""

from __future__ import annotations

import csv
import dataclasses
import glob
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

CHOICES = ("A", "B", "C", "D")


@dataclasses.dataclass
class MMLUExample:
    subject: str
    question: str
    choices: Tuple[str, str, str, str]
    answer: int  # 0..3


def _read_csv(path: str, subject: str) -> List[MMLUExample]:
    out = []
    with open(path, newline="", encoding="utf-8") as fh:
        for row in csv.reader(fh):
            if len(row) < 6:
                continue
            q, a, b, c, d, ans = row[:6]
            ans = ans.strip().upper()
            if ans not in CHOICES:
                continue
            out.append(
                MMLUExample(subject, q, (a, b, c, d), CHOICES.index(ans))
            )
    return out


def load_mmlu(
    data_dir: Optional[str] = None,
    split: str = "test",
    subjects: Optional[Sequence[str]] = None,
    synthetic_examples: int = 64,
    seed: int = 0,
) -> List[MMLUExample]:
    """Read `{subject}_{split}.csv` files from data_dir (hendrycks layout,
    optionally under a `{split}/` subdirectory); fall back to a synthetic
    task when no directory/files are available."""
    if data_dir:
        paths = sorted(
            glob.glob(os.path.join(data_dir, f"*_{split}.csv"))
            + glob.glob(os.path.join(data_dir, split, f"*_{split}.csv"))
        )
        examples = []
        for p in paths:
            subject = os.path.basename(p)[: -len(f"_{split}.csv")]
            if subjects and subject not in subjects:
                continue
            examples.extend(_read_csv(p, subject))
        if examples:
            return examples
    # synthetic fallback: answer index is a deterministic function of the
    # question text, so a model cannot score above chance without reading it
    rng = np.random.default_rng(seed)
    examples = []
    for i in range(synthetic_examples):
        nums = rng.integers(0, 50, size=2)
        answer = int((nums[0] + nums[1]) % 4)
        choices = [str(int(nums[0] + nums[1] + (j - answer))) for j in range(4)]
        examples.append(
            MMLUExample(
                "synthetic_arithmetic",
                f"What is {nums[0]} + {nums[1]}?",
                tuple(choices),
                answer,
            )
        )
    return examples


def format_prompt(
    example: MMLUExample, fewshot: Sequence[MMLUExample] = ()
) -> str:
    """Standard MMLU prompt: optional k-shot examples then the question,
    ending in 'Answer:' so the next token is the answer letter."""

    def one(ex: MMLUExample, with_answer: bool) -> str:
        s = ex.question.strip() + "\n"
        for letter, choice in zip(CHOICES, ex.choices):
            s += f"{letter}. {choice}\n"
        s += "Answer:"
        if with_answer:
            s += f" {CHOICES[ex.answer]}\n\n"
        return s

    subject = example.subject.replace("_", " ")
    header = (
        "The following are multiple choice questions (with answers) "
        f"about {subject}.\n\n"
    )
    return header + "".join(one(f, True) for f in fewshot) + one(example, False)


def evaluate_mmlu(
    score_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    examples: Sequence[MMLUExample],
    tokenize: Callable[[str], List[int]],
    letter_ids: Sequence[int],
    max_len: int = 512,
    batch_size: int = 8,
    fewshot_by_subject: Optional[Dict[str, Sequence[MMLUExample]]] = None,
) -> Dict[str, float]:
    """Run the choice evaluation.

    score_fn(input_ids (B, T) int32, mask (B, T) int32) -> (B, V) final-
    position logits (e.g. `make_choice_score_fn(model, variables)`);
    letter_ids: token ids of the four answer letters in CHOICES order.
    Prompts are LEFT-truncated to max_len (keeping the question and
    'Answer:') and right-padded per batch. Returns {'accuracy': ...,
    'per_subject': {...}, 'n': ...}."""
    letter_ids = np.asarray(letter_ids, np.int64)
    assert letter_ids.shape == (4,)
    correct: Dict[str, List[bool]] = {}
    for start in range(0, len(examples), batch_size):
        batch = examples[start : start + batch_size]
        toks = []
        for ex in batch:
            shots = (
                fewshot_by_subject.get(ex.subject, ())
                if fewshot_by_subject
                else ()
            )
            t = tokenize(format_prompt(ex, shots))[-max_len:]
            toks.append(t)
        T = max(len(t) for t in toks)
        ids = np.zeros((len(batch), T), np.int32)
        mask = np.zeros((len(batch), T), np.int32)
        for i, t in enumerate(toks):
            # left-pad so the final position is the scoring position for
            # every row regardless of prompt length
            ids[i, T - len(t):] = t
            mask[i, T - len(t):] = 1
        logits = np.asarray(score_fn(jnp.asarray(ids), jnp.asarray(mask)))
        pred = logits[:, letter_ids].argmax(-1)
        for ex, p in zip(batch, pred):
            correct.setdefault(ex.subject, []).append(int(p) == ex.answer)
    per_subject = {s: float(np.mean(v)) for s, v in correct.items()}
    flat = [b for v in correct.values() for b in v]
    return {
        "accuracy": float(np.mean(flat)) if flat else 0.0,
        "per_subject": per_subject,
        "n": len(flat),
    }


def make_choice_score_fn(model, variables, benchmarking: bool = False):
    """Jitted (ids, mask) -> final-position logits for a ForCausalLM.

    Uses the last *valid* position per row (rows are left-padded by
    evaluate_mmlu, so that is simply the final column)."""

    @jax.jit
    def score(ids, mask):
        out = model.apply(variables, ids, mask, benchmarking=benchmarking)
        return out["logits"][:, -1, :]

    return score


def synthetic_tokenizer(vocab_size: int) -> Callable[[str], List[int]]:
    """Deterministic hash tokenizer for the synthetic task / smoke tests
    (one token per whitespace word; offline stand-in for a real HF
    tokenizer loaded from a checkpoint directory)."""

    import zlib

    def tok(text: str) -> List[int]:
        # crc32, not hash(): str hashing is salted per process
        return [
            (zlib.crc32(w.encode()) % (vocab_size - 4)) + 4 for w in text.split()
        ]

    return tok
