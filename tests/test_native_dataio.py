"""Native C++ data pipeline vs the numpy reference implementation."""

import numpy as np
import pytest

from sea_tpu.data.wikitext2 import WindowedCorpus
from sea_tpu.native import get_lib, window_batch_native, zipf_corpus_native


needs_native = pytest.mark.skipif(get_lib() is None, reason="no g++ available")


@needs_native
def test_window_batch_matches_python():
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 1000, 5000).astype(np.int32)
    corpus = WindowedCorpus(tokens, max_length=128, stride=64)
    idx = np.arange(min(len(corpus), 8))
    ids, mask, labels = window_batch_native(tokens, idx, 128, 64)
    for j, i in enumerate(idx):
        want_ids, want_labels = corpus.window(int(i))
        np.testing.assert_array_equal(ids[j, : len(want_ids)], want_ids)
        np.testing.assert_array_equal(labels[j, : len(want_labels)], want_labels)
        assert mask[j, : len(want_ids)].all()
        assert not mask[j, len(want_ids):].any()


@needs_native
def test_batches_use_native_and_agree():
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 1000, 4000).astype(np.int32)
    corpus = WindowedCorpus(tokens, max_length=64, stride=32)
    batches = list(corpus.batches(4))
    assert batches
    for ids, mask, labels in batches:
        assert ids.shape == (4, 64)
        assert ((labels == -100) | (labels == ids)).all()


@needs_native
def test_zipf_corpus_native():
    out = zipf_corpus_native(10000, 5000, seed=3)
    assert out is not None
    assert out.min() >= 4 and out.max() < 5000
    # Zipf-ish: low token ids dominate
    assert (out < 100).mean() > 0.3
