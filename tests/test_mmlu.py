"""MMLU harness (reference README.md:38 reports the metric with no code):
CSV reading, prompt format, bookkeeping, and an end-to-end tiny-model run."""

import csv
import os

import numpy as np
import jax
import jax.numpy as jnp

from sea_tpu.data.mmlu import (
    CHOICES,
    MMLUExample,
    evaluate_mmlu,
    format_prompt,
    load_mmlu,
    make_choice_score_fn,
    synthetic_tokenizer,
)


def test_synthetic_examples_well_formed():
    ex = load_mmlu(None, synthetic_examples=32)
    assert len(ex) == 32
    for e in ex:
        assert 0 <= e.answer < 4
        a, b = [int(x) for x in e.question.replace("?", "").split()[-3::2]]
        assert int(e.choices[e.answer]) == a + b  # right answer is correct
        assert len(set(e.choices)) == 4  # distractors distinct


def test_csv_reader(tmp_path):
    p = tmp_path / "abstract_algebra_test.csv"
    with open(p, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["What is 1+1?", "1", "2", "3", "4", "B"])
        w.writerow(["What is 2*3?", "5", "7", "6", "8", "C"])
    ex = load_mmlu(str(tmp_path), "test")
    assert len(ex) == 2
    assert ex[0].subject == "abstract_algebra"
    assert ex[0].answer == 1 and ex[1].answer == 2


def test_format_prompt_fewshot():
    ex = MMLUExample("law", "Q?", ("w", "x", "y", "z"), 3)
    shot = MMLUExample("law", "S?", ("a", "b", "c", "d"), 0)
    s = format_prompt(ex, [shot])
    assert s.endswith("Answer:")
    assert "Answer: A\n\n" in s  # the shot carries its answer
    assert "about law" in s
    assert s.index("S?") < s.index("Q?")


def test_evaluate_bookkeeping():
    """A constant predictor scores exactly the base rate of its letter."""
    ex = load_mmlu(None, synthetic_examples=40)
    tok = synthetic_tokenizer(256)
    letter_ids = [tok(c)[0] for c in CHOICES]

    def always_first(ids, mask):
        v = np.full((ids.shape[0], 256), -1.0, np.float32)
        v[:, letter_ids[0]] = 1.0
        return v

    res = evaluate_mmlu(always_first, ex, tok, letter_ids, batch_size=7)
    expected = np.mean([e.answer == 0 for e in ex])
    np.testing.assert_allclose(res["accuracy"], expected)
    assert res["n"] == 40


def test_evaluate_with_tiny_model():
    from sea_tpu.models.llama import LlamaForCausalLM, llama_tiny

    cfg = llama_tiny("perlin")
    model = LlamaForCausalLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, ids))()

    ex = load_mmlu(None, synthetic_examples=8)
    tok = synthetic_tokenizer(cfg.vocab_size)
    letter_ids = [tok(c)[0] for c in CHOICES]
    score = make_choice_score_fn(model, variables)
    res = evaluate_mmlu(score, ex, tok, letter_ids, batch_size=4, max_len=64)
    assert 0.0 <= res["accuracy"] <= 1.0
    assert res["n"] == 8
    assert "synthetic_arithmetic" in res["per_subject"]
