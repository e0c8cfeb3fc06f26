"""Visualization dumps: buffer capture -> npz (+png when matplotlib)."""

import os

import numpy as np
import jax

from sea_tpu.models.attention import SeaAttention
from sea_tpu.utils.profiler import get_bench
from sea_tpu.utils.visualize import collect_attention_maps, dump_attention_maps
from tests.test_attention import small_cfg, make_inputs


def test_dump_attention_maps(tmp_path):
    cfg = small_cfg(causal=True)
    inputs = make_inputs(cfg, N=1, T=32, seed=3)
    q, k, v, mask, truth, ctx_truth = inputs
    model = SeaAttention(cfg)
    params = model.init(jax.random.key(0), q, k, v, q, k, v, q, k, mask)

    bench = get_bench()
    bench.activate_temp_buffers(True)
    bench.reset()
    bench.disabled = False
    try:
        model.apply(params, q, k, v, q, k, v, q, k, mask)
        maps = collect_attention_maps()
        assert "estimated_attention_probs" in maps
        path = dump_attention_maps(str(tmp_path), tag="t", render_png=True)
    finally:
        bench.activate_temp_buffers(False)
        bench.reset()
    assert os.path.exists(path)
    loaded = np.load(path)
    assert "estimated_attention_probs" in loaded
