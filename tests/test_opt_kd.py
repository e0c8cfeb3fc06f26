"""End-to-end OPT KD slice (SURVEY §7 stage-4 gate, tiny dims):
teacher forward, student forward, interleaved KD loss, one optimizer step.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from sea_tpu.config import SeaConfig
from sea_tpu.models.opt import OptConfig, OptForCausalLM
from sea_tpu.training.distill import SeaOptKD
from sea_tpu.training.optimizer import make_optimizer, param_labels


def tiny_opt(method="perlin"):
    sea = SeaConfig(
        num_heads=2,
        head_dim=8,
        predictor_length=8,
        k=2,
        performer_nb_factor=1,
        causal=True,
        use_cache=True,
        max_position_embeddings=64,
    ).validate()
    return OptConfig(
        vocab_size=128,
        hidden_size=16,
        num_layers=2,
        num_heads=2,
        ffn_dim=32,
        max_position_embeddings=64,
        attention_method=method,
        sea=sea,
    )


def make_batch(N=2, T=16, vocab=128, seed=0):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(4, vocab, (N, T)), jnp.int32)
    mask = jnp.ones((N, T), jnp.int32)
    return ids, mask


@pytest.fixture(scope="module")
def setup():
    t_cfg = tiny_opt("none")
    s_cfg = tiny_opt("perlin")
    kd = SeaOptKD(t_cfg, s_cfg)
    ids, mask = make_batch()
    t_vars = jax.jit(lambda: kd.teacher.init(jax.random.key(0), ids, mask))()
    s_vars = jax.jit(lambda: kd.student.init(jax.random.key(1), ids, mask))()
    return kd, t_vars, s_vars, ids, mask


def test_teacher_forward_captures(setup):
    kd, t_vars, s_vars, ids, mask = setup
    out = jax.jit(
        lambda v: kd.teacher.apply(v, ids, mask, labels=ids)
    )(t_vars)
    assert out["logits"].shape == (2, 16, 128)
    assert len(out["teacher_captures"]) == 2
    assert out["teacher_captures"][0].attention_scores.shape == (2, 2, 16, 16)
    assert out["teacher_captures"][0].context_layer.shape == (2, 16, 16)
    assert np.isfinite(float(out["loss"]))


def test_student_forward(setup):
    kd, t_vars, s_vars, ids, mask = setup
    out = jax.jit(lambda v: kd.student.apply(v, ids, mask, labels=ids))(s_vars)
    assert out["logits"].shape == (2, 16, 128)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_kd_loss_and_step(setup):
    kd, t_vars, s_vars, ids, mask = setup

    def loss_fn(sv):
        loss, details = kd.kd_loss(t_vars, sv, ids, mask, ids, use_remat=True)
        return loss, details

    (loss, details), grads = jax.jit(
        lambda sv: jax.value_and_grad(loss_fn, has_aux=True)(sv)
    )(s_vars)
    assert np.isfinite(float(loss)) and float(loss) > 0
    for k_, v_ in details.items():
        assert np.isfinite(float(v_)), k_
    gsum = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(grads["params"]))
    assert np.isfinite(gsum) and gsum > 0

    # one optimizer step moves params
    tx = make_optimizer(lr=1e-3)
    opt_state = tx.init(s_vars["params"])
    updates, _ = tx.update(grads["params"], opt_state, s_vars["params"])
    new_params = optax.apply_updates(s_vars["params"], updates)
    moved = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(
            jax.tree_util.tree_leaves(s_vars["params"]),
            jax.tree_util.tree_leaves(new_params),
        )
    )
    assert moved > 0


def test_param_labels_group_perlin():
    t_cfg = tiny_opt("perlin")
    model = OptForCausalLM(t_cfg)
    ids, mask = make_batch()
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()
    labels = param_labels(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    groups = {}
    for path, label in flat:
        p = "/".join(str(getattr(x, "key", x)) for x in path)
        groups.setdefault(label, []).append(p)
    assert "high" in groups and "low" in groups
    assert all("perlin" in p for p in groups["high"] + groups.get("high_nd", []))
    assert not any("perlin" in p for p in groups["low"] + groups.get("low_nd", []))


def test_benchmark_forward(setup):
    """Student inference path with sparse kernels (uniform CSR)."""
    kd, t_vars, s_vars, ids, mask = setup
    out = jax.jit(
        lambda v: kd.student.apply(v, ids, mask, benchmarking=True)
    )(s_vars)
    assert np.isfinite(np.asarray(out["logits"])).all()


@pytest.mark.parametrize("builder_name", ["opt_1_3b", "opt_2_7b"])
def test_large_opt_kd_graph_builds(builder_name):
    """opt-1.3b/2.7b geometry traces at full size (eval_shape: no
    FLOPs/memory) and lands at the family's parameter count."""
    import sea_tpu.models.opt as opt_mod
    from sea_tpu.models.opt import OptForCausalLM

    builder = getattr(opt_mod, builder_name)
    t_cfg = builder("none")
    s_cfg = builder("perlin")
    N, T = 1, 256
    ids = jnp.ones((N, T), jnp.int32)
    mask = jnp.ones((N, T), jnp.int32)

    t_shapes = jax.eval_shape(
        lambda: OptForCausalLM(t_cfg).init(jax.random.key(0), ids, mask)
    )
    n_params = sum(
        int(np.prod(s.shape))
        for s in jax.tree_util.tree_leaves(t_shapes["params"])
    )
    want = {"opt_1_3b": 1.3e9, "opt_2_7b": 2.65e9}[builder_name]
    assert want * 0.85 < n_params < want * 1.35, n_params

    # the student (perlin) KD loss graph also traces at this geometry
    from sea_tpu.training.distill import SeaOptKD

    kd = SeaOptKD(t_cfg, s_cfg)
    t_v = jax.eval_shape(lambda: kd.teacher.init(jax.random.key(0), ids, mask))
    s_v = jax.eval_shape(lambda: kd.student.init(jax.random.key(1), ids, mask))
    out = jax.eval_shape(
        lambda tv, sv: kd.kd_loss(tv, sv, ids, mask, ids, use_remat=True)[0],
        t_v, s_v,
    )
    assert out.shape == ()
