"""Scanned KD pair must reproduce the loop KD loss exactly (rng-free path)
and produce gradients only in the student subtree."""

import numpy as np
import jax
import jax.numpy as jnp

from sea_tpu.training.distill import SeaOptKD, SeaOptKDScan
from tests.test_opt_kd import tiny_opt, make_batch


def test_scan_kd_matches_loop_kd():
    t_cfg = tiny_opt("none")
    s_cfg = tiny_opt("perlin")
    ids, mask = make_batch(N=2, T=16, vocab=t_cfg.vocab_size)

    kd = SeaOptKD(t_cfg, s_cfg)
    t_vars = jax.jit(lambda: kd.teacher.init(jax.random.key(0), ids, mask))()
    s_vars = jax.jit(lambda: kd.student.init(jax.random.key(1), ids, mask))()
    loss_loop, det_loop = jax.jit(
        lambda tv, sv: kd.kd_loss(tv, sv, ids, mask, ids, use_remat=False)
    )(t_vars, s_vars)

    kds = SeaOptKDScan(t_cfg, s_cfg)
    combined = SeaOptKDScan.combine_params(t_vars, s_vars, t_cfg.num_layers)
    loss_scan, det_scan = jax.jit(
        lambda cv: kds.kd_loss(cv, ids, mask, ids)
    )(combined)

    np.testing.assert_allclose(
        float(loss_loop), float(loss_scan), rtol=1e-5
    )
    for k_ in det_loop:
        np.testing.assert_allclose(
            float(det_loop[k_]), float(det_scan[k_]), rtol=1e-4, err_msg=k_
        )


def test_scan_kd_teacher_grads_zero():
    t_cfg = tiny_opt("none")
    s_cfg = tiny_opt("perlin")
    ids, mask = make_batch(N=1, T=16, vocab=t_cfg.vocab_size)
    kd = SeaOptKD(t_cfg, s_cfg)
    t_vars = jax.jit(lambda: kd.teacher.init(jax.random.key(0), ids, mask))()
    s_vars = jax.jit(lambda: kd.student.init(jax.random.key(1), ids, mask))()
    kds = SeaOptKDScan(t_cfg, s_cfg)
    combined = SeaOptKDScan.combine_params(t_vars, s_vars, t_cfg.num_layers)

    g = jax.jit(
        jax.grad(lambda cv: kds.kd_loss(cv, ids, mask, ids)[0])
    )(combined)

    def total(tree):
        return sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(tree))

    t_grad = total(g["params"]["teacher"]) + total(g["params"]["pairs"]["teacher"])
    s_grad = total(g["params"]["student"]) + total(g["params"]["pairs"]["student"])
    assert t_grad == 0.0, t_grad
    assert s_grad > 0


def test_kd_loss_knobs_task_scale_and_ignore():
    """__TASK_LOSS / IGNORE_KD_LOSS analogues (reference
    opt_trainer.py:145-146,177-181)."""
    from tests.test_opt_kd import tiny_opt, make_batch
    from sea_tpu.training.distill import SeaOptKD

    kd = SeaOptKD(tiny_opt("none"), tiny_opt("perlin"))
    ids, mask = make_batch(N=1, T=16, vocab=128)
    t_vars = jax.jit(lambda: kd.teacher.init(jax.random.key(0), ids, mask))()
    s_vars = jax.jit(lambda: kd.student.init(jax.random.key(1), ids, mask))()

    loss_def, det_def = jax.jit(
        lambda: kd.kd_loss(t_vars, s_vars, ids, mask, ids)
    )()
    loss_ign, det_ign = jax.jit(
        lambda: kd.kd_loss(t_vars, s_vars, ids, mask, ids, ignore_kd=True)
    )()
    np.testing.assert_allclose(
        float(loss_ign), float(det_ign["student_task_loss"]), rtol=1e-6
    )
    loss_ts, det_ts = jax.jit(
        lambda: kd.kd_loss(t_vars, s_vars, ids, mask, ids, task_scale=1.0)
    )()
    np.testing.assert_allclose(
        float(det_ts["loss_model"]), float(det_ts["student_task_loss"]),
        rtol=1e-6,
    )
    assert float(loss_ts) > float(loss_def)


def test_logit_chunk_matches_unchunked():
    """Chunked logit CE/KL (the 1.3b/long-T memory plan) is mathematically
    identical to the unchunked form: loss terms and grads match."""
    t_cfg, s_cfg = tiny_opt("none"), tiny_opt("perlin")
    ids, mask = make_batch(N=2, T=16, vocab=t_cfg.vocab_size)
    labels = ids
    plain = SeaOptKDScan(t_cfg, s_cfg)
    chunked = SeaOptKDScan(t_cfg, s_cfg, logit_chunk=4)
    kd = SeaOptKD(t_cfg, s_cfg)
    t_vars = jax.jit(lambda: kd.teacher.init(jax.random.key(0), ids, mask))()
    s_vars = jax.jit(lambda: kd.student.init(jax.random.key(1), ids, mask))()
    comb = SeaOptKDScan.combine_params(t_vars, s_vars, t_cfg.num_layers)

    def loss(kds, c):
        return kds.kd_loss(c, ids, mask, labels)

    (l0, d0), g0 = jax.jit(
        jax.value_and_grad(lambda c: loss(plain, c), has_aux=True)
    )(comb)
    (l1, d1), g1 = jax.jit(
        jax.value_and_grad(lambda c: loss(chunked, c), has_aux=True)
    )(comb)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for k in d0:
        np.testing.assert_allclose(
            float(d0[k]), float(d1[k]), rtol=1e-5, atol=1e-7, err_msg=k
        )
    for (p0, a), (p1, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=jax.tree_util.keystr(p0),
        )


def test_logit_chunk_nondivisible_T():
    """T not divisible by logit_chunk falls back to a divisor (gcd)."""
    t_cfg, s_cfg = tiny_opt("none"), tiny_opt("perlin")
    ids, mask = make_batch(N=1, T=12, vocab=t_cfg.vocab_size)
    chunked = SeaOptKDScan(t_cfg, s_cfg, logit_chunk=8)  # gcd(8,12)=4
    kd = SeaOptKD(t_cfg, s_cfg)
    t_vars = jax.jit(lambda: kd.teacher.init(jax.random.key(0), ids, mask))()
    s_vars = jax.jit(lambda: kd.student.init(jax.random.key(1), ids, mask))()
    comb = SeaOptKDScan.combine_params(t_vars, s_vars, t_cfg.num_layers)
    loss, details = jax.jit(lambda c: chunked.kd_loss(c, ids, mask, ids))(comb)
    assert np.isfinite(float(loss))
