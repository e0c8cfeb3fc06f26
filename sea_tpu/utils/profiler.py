"""Region profiler + named intermediate-buffer registry.

TPU-native analogue of the reference's global `Benchmark` singleton
(`src/utils/__init__.py:384-537`, `get_bench()`): nested timed regions
building a call tree, and a `register_temp_buffer` capture of ~30 named
intermediates that the causality/cache/consistency tests introspect instead
of mocking (SURVEY §4.4, §5.1).

Semantics on JAX: timing and capture only make sense in *eager* mode — under
`jit` the module body traces once, so regions would time tracing and buffers
would hold tracers. The registry is therefore disabled by default
(zero-overhead early returns, like the reference `utils/__init__.py:461`);
tests enable it and run the model un-jitted. When a traced array is
registered while tracing (disabled path untaken), it is ignored.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, List, Optional

import jax


class _Region:
    __slots__ = ("name", "total", "count", "children")

    def __init__(self, name: str):
        self.name = name
        self.total = 0.0
        self.count = 0
        self.children: Dict[str, "_Region"] = {}


class Benchmark:
    def __init__(self):
        self.disabled = True
        self.synchronize = True
        self.buffers: Dict[str, List[Any]] = {}
        self._root = _Region("root")
        self._stack: List[_Region] = [self._root]

    # --- activation -----------------------------------------------------
    def activate_temp_buffers(self, enabled: bool = True):
        self.disabled = not enabled
        if enabled:
            self.buffers = {}

    def reset(self):
        self.buffers = {}
        self._root = _Region("root")
        self._stack = [self._root]

    # --- buffer registry ------------------------------------------------
    def register_temp_buffer(self, name: str, value, lazy: Optional[Callable] = None):
        if self.disabled:
            return
        if value is None and lazy is not None:
            value = lazy()
        if value is None:
            return
        if isinstance(value, jax.core.Tracer):
            return  # inside jit; capture is eager-only
        self.buffers.setdefault(name, []).append(value)

    def get_temp_buffer(self, name: str, index: int = -1):
        return self.buffers[name][index]

    # --- timed regions --------------------------------------------------
    @contextlib.contextmanager
    def region(self, name: str):
        if self.disabled:
            yield
            return
        parent = self._stack[-1]
        node = parent.children.setdefault(name, _Region(name))
        self._stack.append(node)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            node.total += time.perf_counter() - t0
            node.count += 1
            self._stack.pop()

    def format_tracetree(self) -> str:
        lines: List[str] = []

        def walk(node: _Region, depth: int, parent_total: float):
            pct = 100.0 * node.total / parent_total if parent_total > 0 else 100.0
            lines.append(
                f"{'  ' * depth}{node.name}: {node.total * 1e3:.2f}ms "
                f"({pct:.1f}%, n={node.count})"
            )
            for c in node.children.values():
                walk(c, depth + 1, node.total)

        total = sum(c.total for c in self._root.children.values())
        for c in self._root.children.values():
            walk(c, 0, total)
        return "\n".join(lines)


_BENCH = Benchmark()


def get_bench() -> Benchmark:
    return _BENCH


@contextlib.contextmanager
def device_trace(log_dir: str, host_tracer_level: int = 2):
    """On-device profiling via jax.profiler (xprof/XPlane) — the device-side
    complement to the eager region tree above. Inside the scope, jitted
    computation is traced by the runtime itself (per-op device timings),
    answering questions the eager tree cannot (e.g. which kernel stage
    dominates inside one fused jit). View with tensorboard/xprof.

    Region names from `Benchmark.region` do not cross into the device
    timeline; annotate jit-internal stages with
    `jax.named_scope`/`jax.profiler.TraceAnnotation` where needed.
    Degrades to a no-op if the backend cannot trace (remote relays)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir, create_perfetto_link=False)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
