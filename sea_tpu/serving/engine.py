"""Continuous-batching serving engine over a paged KV pool.

The reference repo decodes through HF `generate` one batch at a time
(`/root/reference/src/main/opt_generate.py`) — there is no serving system
to port, so this subsystem is designed TPU-first from scratch:

* **One jitted step, no prefill compile.** Every engine step feeds each
  active slot exactly one token: its next *prompt* token while prefilling,
  or its last *sampled* token once generating. Prompt processing is thereby
  continuous-batched with decode for free, and the engine compiles a single
  fixed-shape XLA program (max_slots lanes) that it reuses forever — the
  TPU answer to vLLM-style inflight batching without a second "prefill"
  executable. (SEA's decode state advances strictly token-by-token — the
  CNN window push in `state.py:cnn_window_push` — so token-at-a-time
  prefill is also the *exact* path, not an approximation.)
* **Paged KV.** K/V live in per-layer page pools (L, P, page_size, H, D);
  a sequence owns an ordered list of page ids (position-major, shared by
  all layers). Slot recycling returns pages to a host-side free list —
  many variable-length sequences share one fixed HBM footprint instead of
  each reserving max_len. Page 0 is a reserved dummy: unallocated tail
  pages and unscheduled slots point at it, and the length-derived row mask
  (attention.py `_decode_common` stage 7) keeps it out of every softmax.
* **Per-slot positions.** `SeaDecodeState.length` et al. are (N,)-shaped
  here; `SeaAttention._decode_common` is uniformly per-row so slots at
  different positions decode in one einsum. Slots that cannot be scheduled
  (waiting on a free page) are frozen by `select_state_rows`.

Scheduling policy: FCFS admission to free slots; a slot stalls (keeps its
state, burns one lane) when the pool has no free page at a page boundary,
and resumes as soon as another request completes. Sampling is per slot:
greedy (temperature 0) or temperature / top-k / top-p categorical
(`ops/sampling.py`) — mixed batches share the one compiled step.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.opt import OptForCausalLM
from ..models.state import SeaDecodeState, reset_state_rows, select_state_rows
from ..ops.sampling import sample_logits


@dataclasses.dataclass
class Request:
    """One generation request and its lifecycle bookkeeping."""

    prompt: List[int]
    max_new_tokens: int
    temperature: float = 0.0
    top_k: int = 0  # 0 disables
    top_p: float = 1.0  # 1.0 disables
    # --- engine-owned state ---
    rid: int = -1
    output: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    truncated: bool = False


class PageAllocator:
    """Host-side free-list over pool pages 1..num_pages-1 (0 is the dummy)."""

    def __init__(self, num_pages: int):
        self.free: List[int] = list(range(num_pages - 1, 0, -1))

    def alloc(self) -> Optional[int]:
        return self.free.pop() if self.free else None

    def release(self, pages: List[int]) -> None:
        self.free.extend(p for p in pages if p > 0)

    @property
    def available(self) -> int:
        return len(self.free)


class ServingEngine:
    """Continuous-batching generation over an OPT+SEA model.

    Parameters
    ----------
    model, variables : the flax model and its params (method='perlin'
        student or any config with use_cache=True).
    max_slots : concurrent sequences decoded per step (the XLA batch lane).
    page_size : tokens per KV page (multiples of 8 keep TPU tiling happy).
    num_pages : pool pages per layer, *including* the reserved dummy page 0.
        HBM cost = 2 pools * L * num_pages * page_size * H * D * 4 bytes.
    max_pages_per_slot : page-table width => per-sequence capacity
        max_pages_per_slot * page_size tokens.
    mesh / head_axis : optional multi-chip serving — KV pools and decode
        states are sharded over the head dimension of `mesh`'s `head_axis`
        (tensor-parallel style: per-head row attention is communication-
        free; GSPMD inserts the psum at the output projection). num_heads
        must be divisible by the axis size.
    """

    def __init__(
        self,
        model: OptForCausalLM,  # or any model with init_decode_states /
        # decode_step_paged (LlamaForCausalLM works unchanged)
        variables,
        *,
        max_slots: int = 4,
        page_size: int = 16,
        num_pages: int = 64,
        max_pages_per_slot: int = 8,
        eos_id: Optional[int] = None,
        seed: int = 0,
        dtype=jnp.float32,
        mesh=None,
        head_axis: str = "tp",
    ):
        cfg = model.cfg
        assert not cfg.scan_layers, (
            "serving drives per-layer decode; build the model with "
            "scan_layers=False (decode graphs are small — scanning buys "
            "nothing at T=1)"
        )
        self.model = model
        self.variables = variables
        self.max_slots = max_slots
        self.page_size = page_size
        self.max_pages = max_pages_per_slot
        self.max_len = page_size * max_pages_per_slot
        self.eos_id = eos_id
        S = max_slots
        L = cfg.num_layers
        H, D = cfg.sea.num_heads, cfg.sea.head_dim

        self.allocator = PageAllocator(num_pages)
        self.pages_np = np.zeros((S, self.max_pages), np.int32)
        self.pool_k = jnp.zeros((L, num_pages, page_size, H, D), dtype)
        self.pool_v = jnp.zeros((L, num_pages, page_size, H, D), dtype)

        # per-layer states with zero-width contiguous caches and (S,)-shaped
        # per-slot counters
        def _per_slot(st: SeaDecodeState) -> SeaDecodeState:
            z = jnp.zeros((S,), jnp.int32)
            return st._replace(length=z, cnn_filled=z, cumavg_len=z)

        base = model.apply(
            variables,
            S,
            0,
            method=lambda m, b, ml: m.init_decode_states(b, ml, dtype),
        )
        self.states = [_per_slot(st) for st in base]

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = head_axis
            assert H % mesh.shape[axis] == 0, (H, dict(mesh.shape))
            ns = lambda *spec: NamedSharding(mesh, P(*spec))
            # pools: (L, P, ps, H, D) — heads across the axis
            self.pool_k = jax.device_put(self.pool_k, ns(None, None, None, axis))
            self.pool_v = jax.device_put(self.pool_v, ns(None, None, None, axis))

            def _shard_state(st: SeaDecodeState) -> SeaDecodeState:
                return st._replace(
                    performer_S=jax.device_put(st.performer_S, ns(None, axis)),
                    performer_z=jax.device_put(st.performer_z, ns(None, axis)),
                    # cnn channels are head-major (splits*H): shard by head
                    cnn_window=jax.device_put(st.cnn_window, ns(None, axis)),
                    cumavg_sum=jax.device_put(st.cumavg_sum, ns(None, axis)),
                    k_cache=jax.device_put(st.k_cache, ns(None, axis)),
                    v_cache=jax.device_put(st.v_cache, ns(None, axis)),
                )

            self.states = [_shard_state(st) for st in self.states]

        self._base_key = jax.random.key(seed)
        self._step_count = 0
        self._rid = 0
        self.queue: List[Request] = []
        self.slots: List[Optional[Request]] = [None] * S
        self.slot_pos = np.zeros(S, np.int64)  # tokens fed so far
        self.slot_pages: List[List[int]] = [[] for _ in range(S)]
        self.finished: Dict[int, Request] = {}

        # use_filter is static: unfiltered workloads (every request at
        # top_k=0/top_p=1) compile a sort-free decode step. The first
        # top-k/top-p request of a session therefore triggers one extra
        # compile of the chunked step (as does each new chunk size) —
        # over a slow compile link, warm the filtered variant by running
        # one filtered request during deployment warm-up.
        self._chunk_jit = jax.jit(self._device_chunk, static_argnums=(13,))
        self._reset_jit = jax.jit(
            lambda states, rows: [reset_state_rows(st, rows) for st in states]
        )

    # ------------------------------------------------------------------
    def _device_chunk(
        self, variables, states, pool_k, pool_v, fed, use_fed, start_pos,
        sched, pages, temps, top_ks, top_ps, step0, use_filter,
    ):
        """Run C = fed.shape[0] decode steps on device between host syncs
        (multi-step scheduling): each inner step feeds either the next
        prompt token (use_fed) or the previous step's sample, so prefill
        streams through the same scan. One upload + one (C, S) token
        download per chunk — the host control loop (or a slow relay) is
        amortised over C tokens. Unscheduled slots are frozen row-wise and
        their KV writes land on the dummy page."""

        def body(carry, xs):
            states, pool_k, pool_v, last = carry
            fed_t, use_t, i = xs
            tok = jnp.where(use_t, fed_t, last)[:, None]
            logits, new_states, pool_k, pool_v = self.model.apply(
                variables,
                tok,
                start_pos + i,
                states,
                pool_k,
                pool_v,
                pages,
                method=lambda m, a, b, c, d, e, f: m.decode_step_paged(
                    a, b, c, d, e, f
                ),
            )
            last_logits = logits[:, 0].astype(jnp.float32)  # (S, V)
            key = jax.random.fold_in(self._base_key, step0 + i)
            if use_filter:
                nxt = sample_logits(key, last_logits, temps, top_ks, top_ps)
            else:  # statically disabled filters skip the (S, V) sort
                nxt = sample_logits(key, last_logits, temps, 0, 1.0)
            new_states = [
                select_state_rows(ns, os_, sched)
                for ns, os_ in zip(new_states, states)
            ]
            return (new_states, pool_k, pool_v, nxt), nxt

        C, S = fed.shape
        (states, pool_k, pool_v, _), toks = jax.lax.scan(
            body,
            (states, pool_k, pool_v, jnp.zeros((S,), jnp.int32)),
            (fed, use_fed, jnp.arange(C, dtype=jnp.int32)),
        )
        return toks, states, pool_k, pool_v

    # ------------------------------------------------------------------
    def submit(
        self,
        prompt: List[int],
        max_new_tokens: int = 16,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
    ) -> int:
        assert len(prompt) >= 1, "empty prompt"
        req = Request(list(prompt), max_new_tokens, temperature, top_k, top_p)
        req.rid = self._rid
        self._rid += 1
        self.queue.append(req)
        return req.rid

    def _admit(self) -> None:
        reset_rows = np.zeros(self.max_slots, bool)
        admitted = False
        for s in range(self.max_slots):
            if not self.queue:
                break
            if self.slots[s] is not None:
                continue
            if self.allocator.available == 0:
                break
            self.slots[s] = self.queue.pop(0)
            self.slot_pos[s] = 0
            self.slot_pages[s] = []
            self.pages_np[s] = 0
            reset_rows[s] = True
            admitted = True
        if admitted:
            self.states = self._reset_jit(self.states, jnp.asarray(reset_rows))

    def _finish(self, s: int, truncated: bool = False) -> None:
        req = self.slots[s]
        req.done = True
        req.truncated = truncated
        self.finished[req.rid] = req
        self.allocator.release(self.slot_pages[s])
        self.slot_pages[s] = []
        self.pages_np[s] = 0
        self.slots[s] = None

    # ------------------------------------------------------------------
    def step(self, chunk: int = 1) -> None:
        """One engine iteration = `chunk` decode steps on device between
        host syncs: admit, pre-allocate each scheduled slot's pages for the
        whole chunk, run the jitted scan, replay the (chunk, S) sampled
        tokens on the host, retire finished requests.

        Larger chunks amortise the host round trip (essential over a slow
        control link) at the cost of coarser admission/EOS granularity —
        a slot that hits EOS mid-chunk decodes garbage for the remainder,
        which the replay discards."""
        self._admit()
        S, C = self.max_slots, chunk
        fed = np.zeros((C, S), np.int32)
        use_fed = np.zeros((C, S), bool)
        start_pos = np.zeros(S, np.int32)
        sched = np.zeros(S, bool)
        temps = np.zeros(S, np.float32)
        top_ks = np.zeros(S, np.int32)
        top_ps = np.ones(S, np.float32)

        for s, req in enumerate(self.slots):
            if req is None:
                continue
            pos = int(self.slot_pos[s])
            if pos >= self.max_len:
                self._finish(s, truncated=True)
                continue
            # pages covering [pos, min(pos+C, max_len)) must exist up front
            last_needed = (min(pos + C, self.max_len) - 1) // self.page_size
            ok = True
            while len(self.slot_pages[s]) <= last_needed:
                pg = self.allocator.alloc()
                if pg is None:
                    ok = False  # stall the whole chunk; state stays frozen
                    break
                idx = len(self.slot_pages[s])
                self.slot_pages[s].append(pg)
                self.pages_np[s, idx] = pg
            if not ok:
                continue
            start_pos[s] = pos
            sched[s] = True
            temps[s] = req.temperature
            top_ks[s] = req.top_k
            top_ps[s] = req.top_p
            for i in range(C):
                p = pos + i
                if p < len(req.prompt):
                    fed[i, s] = req.prompt[p]
                    use_fed[i, s] = True
                elif i == 0:
                    # chunk opens mid-decode: the scan's sample carry is
                    # empty, feed the last token sampled in the prior chunk
                    fed[0, s] = req.output[-1]
                    use_fed[0, s] = True

        if not sched.any():
            return
        # dummy tail column: chunk positions past capacity (or any clamped
        # page index) land on reserved page 0 instead of real data
        pages_t = np.concatenate(
            [self.pages_np, np.zeros((S, 1), np.int32)], axis=1
        )
        toks, self.states, self.pool_k, self.pool_v = self._chunk_jit(
            self.variables,
            self.states,
            self.pool_k,
            self.pool_v,
            jnp.asarray(fed),
            jnp.asarray(use_fed),
            jnp.asarray(start_pos),
            jnp.asarray(sched),
            jnp.asarray(pages_t),
            jnp.asarray(temps),
            jnp.asarray(top_ks),
            jnp.asarray(top_ps),
            jnp.int32(self._step_count),
            bool(top_ks.any() or (top_ps < 1.0).any()),
        )
        self._step_count += C
        toks = np.asarray(toks)  # (C, S)

        for s in range(S):
            req = self.slots[s]
            if req is None or not sched[s]:
                continue
            finished = False
            for i in range(C):
                pos = int(start_pos[s]) + i
                # the step that consumed the last prompt token emits the
                # first generated token; earlier prefill logits discarded
                if pos >= len(req.prompt) - 1:
                    tok = int(toks[i, s])
                    req.output.append(tok)
                    if (
                        self.eos_id is not None and tok == self.eos_id
                    ) or len(req.output) >= req.max_new_tokens:
                        self._finish(s)
                        finished = True
                        break
                if pos + 1 >= self.max_len:
                    self._finish(s, truncated=True)
                    finished = True
                    break
            if not finished:
                self.slot_pos[s] = int(start_pos[s]) + C

    # ------------------------------------------------------------------
    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.slots)

    def run(self, max_steps: int = 10_000, chunk: int = 1) -> Dict[int, Request]:
        """Drive until all submitted requests finish (or max_steps)."""
        steps = 0
        while self.has_work and steps < max_steps:
            before = self.has_work
            self.step(chunk)
            steps += 1
            if before and not any(r is not None for r in self.slots) and (
                self.queue and self.allocator.available == 0
            ):
                raise RuntimeError(
                    "deadlock: queued requests but no pages free"
                )
        return dict(self.finished)
