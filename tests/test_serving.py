"""Serving subsystem: paged KV decode + continuous-batching engine.

The reference has no serving system (HF `generate`, one batch at a time —
`/root/reference/src/main/opt_generate.py`); these tests pin the TPU-native
engine's core guarantees instead: paged attention is bit-compatible with the
contiguous decode cache, and continuous batching with staggered admission
reproduces per-sequence greedy generation exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_opt_kd import tiny_opt, make_batch
from sea_tpu.models.opt import OptForCausalLM
from sea_tpu.serving import PageAllocator, ServingEngine


def _tiny_model(seed=0, N=1, T=12):
    cfg = tiny_opt("perlin")
    model = OptForCausalLM(cfg)
    ids, mask = make_batch(N=N, T=T, vocab=cfg.vocab_size, seed=seed)
    variables = jax.jit(lambda: model.init(jax.random.key(0), ids, mask))()
    return cfg, model, variables, ids


def test_paged_decode_matches_contiguous():
    """decode_step_paged == decode_step at every position (same mask, same
    probabilities; only the KV layout differs)."""
    cfg, model, variables, ids = _tiny_model(seed=11, N=2, T=10)
    N, T = ids.shape
    page_size, max_pages = 4, 4
    L = cfg.num_layers
    H, D = cfg.sea.num_heads, cfg.sea.head_dim

    states_c = model.apply(
        variables, N, T, method=lambda m, b, ml: m.init_decode_states(b, ml)
    )
    states_p = model.apply(
        variables, N, 0, method=lambda m, b, ml: m.init_decode_states(b, ml)
    )
    # page table: row n owns pages [1+n*max_pages, ...); shared by layers
    pages = jnp.asarray(
        [[1 + n * max_pages + i for i in range(max_pages)] for n in range(N)],
        jnp.int32,
    )
    num_pages = 1 + N * max_pages
    pool_k = jnp.zeros((L, num_pages, page_size, H, D), jnp.float32)
    pool_v = jnp.zeros_like(pool_k)

    step_c = jax.jit(
        lambda v, tok, pos, sts: model.apply(
            v, tok, pos, sts, method=lambda m, a, b, c: m.decode_step(a, b, c)
        )
    )
    step_p = jax.jit(
        lambda v, tok, pos, sts, pk, pv, pg: model.apply(
            v, tok, pos, sts, pk, pv, pg,
            method=lambda m, a, b, c, d, e, f: m.decode_step_paged(
                a, b, c, d, e, f
            ),
        )
    )
    for t in range(T):
        tok = ids[:, t : t + 1]
        lc, states_c = step_c(variables, tok, jnp.int32(t), states_c)
        lp, states_p, pool_k, pool_v = step_p(
            variables, tok, jnp.full((N,), t, jnp.int32), states_p,
            pool_k, pool_v, pages,
        )
        err = np.abs(np.asarray(lc) - np.asarray(lp)).max()
        assert err < 1e-5, (t, err)


def test_engine_matches_generate_greedy():
    """3 staggered variable-length requests through the engine == each
    prompt's generate_greedy run alone."""
    cfg, model, variables, _ = _tiny_model(seed=5)
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(4, cfg.vocab_size, size=p).tolist() for p in (3, 6, 4)
    ]
    steps = 5

    expected = []
    for p in prompts:
        ids = jnp.asarray([p], jnp.int32)
        toks = model.apply(
            variables, ids, 32, steps,
            method=lambda m, a, b, c: m.generate_greedy(a, b, c),
        )
        expected.append(np.asarray(toks)[0].tolist())

    eng = ServingEngine(
        model, variables, max_slots=2, page_size=4, num_pages=32,
        max_pages_per_slot=8,
    )
    rids = [eng.submit(prompts[0], steps), eng.submit(prompts[1], steps)]
    eng.step()
    eng.step()
    # third request arrives mid-flight (continuous batching)
    rids.append(eng.submit(prompts[2], steps))
    out = eng.run()
    for rid, exp in zip(rids, expected):
        assert out[rid].output == exp, (rid, out[rid].output, exp)


def test_engine_page_stall_and_recycling():
    """A pool too small for all slots at once: slots stall on allocation,
    finish anyway, and every page returns to the free list."""
    cfg, model, variables, _ = _tiny_model(seed=9)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(4, cfg.vocab_size, size=4).tolist() for _ in range(3)]

    # 5 usable pages, page_size 4 -> per-request need = ceil(9/4) = 3 pages;
    # two concurrent slots contend for pages and must stall/queue
    eng = ServingEngine(
        model, variables, max_slots=2, page_size=4, num_pages=6,
        max_pages_per_slot=3,
    )
    rids = [eng.submit(p, 5) for p in prompts]
    out = eng.run(max_steps=500)
    assert sorted(out) == sorted(rids)
    assert all(len(out[r].output) == 5 for r in rids)
    assert eng.allocator.available == 5  # all pages recycled

    # equality with solo runs still holds under stalls
    for rid, p in zip(rids, prompts):
        ids = jnp.asarray([p], jnp.int32)
        toks = model.apply(
            variables, ids, 16, 5,
            method=lambda m, a, b, c: m.generate_greedy(a, b, c),
        )
        assert out[rid].output == np.asarray(toks)[0].tolist()


def test_engine_eos_and_temperature():
    """EOS retires a slot early; temperature>0 samples (finite tokens,
    request terminates at max_new_tokens)."""
    cfg, model, variables, _ = _tiny_model(seed=3)
    prompt = [5, 6, 7]
    ids = jnp.asarray([prompt], jnp.int32)
    toks = model.apply(
        variables, ids, 32, 8,
        method=lambda m, a, b, c: m.generate_greedy(a, b, c),
    )
    greedy = np.asarray(toks)[0].tolist()
    eos = greedy[2]  # pretend the 3rd greedy token is EOS

    eng = ServingEngine(
        model, variables, max_slots=2, page_size=4, num_pages=16,
        max_pages_per_slot=4, eos_id=eos,
    )
    rid = eng.submit(prompt, 8)
    rid_t = eng.submit(prompt, 6, temperature=1.0)
    out = eng.run()
    assert out[rid].output == greedy[:3]  # stopped at EOS
    assert len(out[rid_t].output) <= 6
    assert all(0 <= t < cfg.vocab_size for t in out[rid_t].output)


def test_chunked_equals_stepwise():
    """chunk=4 multi-step scheduling produces the same greedy outputs as
    chunk=1 (and thus as solo generate_greedy), including mid-chunk EOS
    and prompt->decode transitions inside a chunk."""
    cfg, model, variables, _ = _tiny_model(seed=21)
    rng = np.random.default_rng(2)
    prompts = [
        rng.integers(4, cfg.vocab_size, size=p).tolist() for p in (3, 7, 5)
    ]

    def run_with(chunk):
        eng = ServingEngine(
            model, variables, max_slots=2, page_size=4, num_pages=32,
            max_pages_per_slot=8,
        )
        rids = [eng.submit(p, 6) for p in prompts]
        out = eng.run(chunk=chunk)
        return [out[r].output for r in rids]

    assert run_with(1) == run_with(4)

    # EOS inside a chunk stops at the right token
    solo = run_with(1)[0]
    eos = solo[1]
    eng = ServingEngine(
        model, variables, max_slots=1, page_size=4, num_pages=32,
        max_pages_per_slot=8, eos_id=eos,
    )
    rid = eng.submit(prompts[0], 6)
    out = eng.run(chunk=4)
    assert out[rid].output == solo[: solo.index(eos) + 1]


def test_chunked_stall_and_truncation():
    """Whole-chunk stalls on page exhaustion and capacity truncation under
    chunking preserve outputs and page accounting."""
    cfg, model, variables, _ = _tiny_model(seed=23)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(4, cfg.vocab_size, size=4).tolist() for _ in range(3)]

    eng = ServingEngine(
        model, variables, max_slots=2, page_size=4, num_pages=6,
        max_pages_per_slot=3,
    )
    rids = [eng.submit(p, 5) for p in prompts]
    out = eng.run(max_steps=500, chunk=3)
    assert sorted(out) == sorted(rids)
    assert eng.allocator.available == 5
    for rid, p in zip(rids, prompts):
        ids = jnp.asarray([p], jnp.int32)
        toks = model.apply(
            variables, ids, 16, 5,
            method=lambda m, a, b, c: m.generate_greedy(a, b, c),
        )
        assert out[rid].output == np.asarray(toks)[0].tolist()

    # truncation: capacity 8, prompt 4 -> 5 tokens, independent of chunking
    eng = ServingEngine(
        model, variables, max_slots=1, page_size=4, num_pages=8,
        max_pages_per_slot=2,
    )
    rid = eng.submit([3, 4, 5, 6], 32)
    out = eng.run(max_steps=100, chunk=4)
    assert out[rid].truncated and len(out[rid].output) == 5


def test_sharded_engine_matches_unsharded():
    """Multi-chip serving: pools/states sharded over heads (tp) produce
    the same tokens as the single-device engine (GSPMD partitioning of
    the chunked step)."""
    from jax.sharding import Mesh

    cfg, model, variables, _ = _tiny_model(seed=31)
    rng = np.random.default_rng(4)
    prompts = [
        rng.integers(4, cfg.vocab_size, size=p).tolist() for p in (3, 6)
    ]

    def run(mesh):
        eng = ServingEngine(
            model, variables, max_slots=2, page_size=4, num_pages=32,
            max_pages_per_slot=8, mesh=mesh,
        )
        rids = [eng.submit(p, 5) for p in prompts]
        out = eng.run(chunk=3)
        return [out[r].output for r in rids]

    want = run(None)
    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    assert run(mesh) == want


def test_page_allocator():
    a = PageAllocator(5)  # pages 1..4 usable
    got = [a.alloc() for _ in range(4)]
    assert sorted(got) == [1, 2, 3, 4]
    assert a.alloc() is None
    a.release([2, 4])
    assert a.available == 2
    assert a.alloc() in (2, 4)


def test_capacity_truncation():
    """A request longer than the slot capacity is finished as truncated."""
    cfg, model, variables, _ = _tiny_model(seed=7)
    eng = ServingEngine(
        model, variables, max_slots=1, page_size=4, num_pages=8,
        max_pages_per_slot=2,  # capacity 8 tokens
    )
    rid = eng.submit([3, 4, 5, 6], 32)  # wants 4 + 32 > 8
    out = eng.run(max_steps=100)
    assert out[rid].truncated
    # the step consuming cache position capacity-1 still emits one sampled
    # token, so output = capacity - prompt + 1
    assert len(out[rid].output) == 8 - 4 + 1
