"""Device-trace the fused kernel on chip (VERDICT r2 #5): attach
jax.profiler (xprof/XPlane) to bench.py's fori harness, then summarise
the captured device ops — the evidence behind the VPU-roofline claim and
the tool for attributing the 1.8x cross-session variance.

If the axon relay cannot trace, this prints a structured negative result
(what was attempted, what the runtime returned) so the limitation is a
recorded fact rather than an assumption.

Run: python scripts/kernel_trace.py [--logdir saves/xprof]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", default="saves/xprof")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--impl", default="flat")
    args = p.parse_args()

    from bench import host_topk_mask
    from sea_tpu.ops.kernels.block_sparse import sea_block_sparse_attention
    from sea_tpu.utils.profiler import device_trace

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        N, H, T, D, T_M, K = 1, 12, 4096, 64, 256, 64
    else:
        N, H, T, D, T_M, K = 1, 2, 256, 64, 32, 16

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    q = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32) * 0.2).astype(dt)
    k = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32) * 0.2).astype(dt)
    v = jnp.asarray(rng.standard_normal((N, H, T, D)).astype(np.float32)).astype(dt)
    scaler = jnp.asarray(rng.uniform(0.1, 1.0, (N, H, T)).astype(np.float32)).astype(dt)
    mask = jnp.asarray(host_topk_mask(N, H, T, T_M, K))

    iters = args.iters

    @jax.jit
    def harness(q, k, v, m, s):
        def body(i, c):
            # data dependency between iterations (same as bench.py)
            return c + 1e-30 * sea_block_sparse_attention(
                c, k, v, m, s, is_causal=True,
                block_q=512 if on_tpu else None,
                block_k=512 if on_tpu else None,
                impl=args.impl,
                interpret=not on_tpu,
            )

        return jax.lax.fori_loop(0, iters, body, q)

    # warm compile outside the trace window
    np.asarray(harness(q, k, v, mask, scaler)[0, 0, 0, 0])

    os.makedirs(args.logdir, exist_ok=True)
    t0 = time.perf_counter()
    with device_trace(args.logdir):
        np.asarray(harness(q, k, v, mask, scaler)[0, 0, 0, 0])
    wall = time.perf_counter() - t0

    produced = sorted(
        glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    rec = {
        "event": "trace",
        "backend": jax.default_backend(),
        "wall_s": round(wall, 3),
        "per_call_ms": round(wall / iters * 1e3, 3),
        "xplane_files": produced[-3:],
        "xplane_bytes": [os.path.getsize(f) for f in produced[-3:]],
    }
    if not produced:
        rec["negative_result"] = (
            "jax.profiler.start_trace produced no xplane capture through "
            "this backend — device-side attribution unavailable; see "
            "docs/kernel_design.md 'Cross-session variance'"
        )
    print(json.dumps(rec), flush=True)

    if produced:
        try:
            summarize_xplane(produced[-1])
        except Exception as e:
            print(json.dumps({
                "event": "xplane_summary_failed",
                "error": f"{type(e).__name__}: {e}"[:300],
            }), flush=True)


def summarize_xplane(path, iters=None):
    """Per-op device timings from the raw XPlane capture, parsed with the
    vendored schema (sea_tpu/utils/proto/xplane.proto — public tsl
    interface definition compiled with the image-local protoc)."""
    proto_dir = os.path.join(
        os.path.dirname(__file__), "..", "sea_tpu", "utils", "proto"
    )
    sys.path.insert(0, proto_dir)
    import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    out = {"event": "device_ops", "file": path}
    for plane in xs.planes:
        if not plane.lines:
            continue
        names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            totals, occ = {}, {}
            for ev in line.events:
                nm = names.get(ev.metadata_id, str(ev.metadata_id))
                totals[nm] = totals.get(nm, 0) + ev.duration_ps
                occ[nm] = occ.get(nm, 0) + 1
            top = sorted(totals.items(), key=lambda kv: -kv[1])[:10]
            key = f"{plane.name}/{line.name}"
            out[key] = [
                {"op": nm[:110], "ms": round(ps / 1e9, 3), "n": occ[nm]}
                for nm, ps in top
            ]
            # the headline attribution: the pallas kernel's own device time
            if "TPU" in plane.name and line.name == "XLA Ops":
                for nm, ps in totals.items():
                    if "custom-call" in nm and occ[nm] >= 1:
                        per = ps / 1e9 / occ[nm]
                        out["pallas_call_device_ms"] = round(per, 4)
                        out["pallas_call_count"] = occ[nm]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
