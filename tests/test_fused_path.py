"""Train-path vs fused-Pallas-path consistency inside the full SEA module
(the fused path shares the train path's exact mask semantics, so the match
should be tight — tighter than the CSR benchmark path)."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_attention import small_cfg, make_inputs, init_and_run


def test_fused_benchmark_matches_train_path():
    cfg = small_cfg(causal=True, use_pallas=True)
    inputs = make_inputs(cfg, N=1, T=128)
    params, out_train = init_and_run(cfg, benchmarking=False, inputs=inputs)
    _, out_fused = init_and_run(cfg, benchmarking=True, inputs=inputs, params=params)
    a = np.asarray(out_train.context_layer)
    b = np.asarray(out_fused.context_layer)
    err = np.abs(a - b).max()
    assert err < 2e-4, err


def test_fused_vs_csr_paths_agree():
    cfg_fused = small_cfg(causal=True, use_pallas=True)
    cfg_csr = small_cfg(causal=True, use_pallas=False)
    inputs = make_inputs(cfg_fused, N=1, T=128)
    params, out_fused = init_and_run(cfg_fused, benchmarking=True, inputs=inputs)
    _, out_csr = init_and_run(cfg_csr, benchmarking=True, inputs=inputs, params=params)
    a = np.asarray(out_fused.context_layer)
    b = np.asarray(out_csr.context_layer)
    # CSR expansion uses round() boundaries vs the dense-resize floor();
    # selections differ on a few boundary columns per row (the reference's
    # own train-vs-benchmark tolerance covers the same gap).
    err = np.abs(a - b).mean()
    assert err < 2e-2, err


def test_fused_noncausal_matches_train_path():
    cfg = small_cfg(causal=False, use_pallas=True)
    inputs = make_inputs(cfg, N=1, T=128)
    params, out_train = init_and_run(cfg, benchmarking=False, inputs=inputs)
    _, out_fused = init_and_run(cfg, benchmarking=True, inputs=inputs, params=params)
    a = np.asarray(out_train.context_layer)
    b = np.asarray(out_fused.context_layer)
    err = np.abs(a - b).max()
    assert err < 5e-4, err
