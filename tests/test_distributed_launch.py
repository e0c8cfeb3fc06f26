"""True multi-process jax.distributed testing (SURVEY §4 item 5: the
reference validates its DeepSpeed/NCCL path only by full real launches —
'no fake backend, no multi-node simulation'; the TPU build does better).

Spawns a real 2-process CPU 'pod slice': each rank calls
`jax.distributed.initialize` against a local coordinator, forms a global
mesh spanning both processes, and runs cross-process collectives (the
same jit/GSPMD + shard_map/psum machinery scripts/launch.py and the
dp-sharded eval rely on). Skips when this jaxlib has no CPU
cross-process collective backend."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_pod_collectives():
    port = _free_port()
    child = os.path.join(os.path.dirname(__file__), "_distributed_child.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)  # child forces cpu via jax.config
    nprocs = 2
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(port), str(pid), str(nprocs)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed child timed out")
        outs.append((p.returncode, out))

    for rc, out in outs:
        if "SKIP:" in out:
            pytest.skip(f"no CPU cross-process collectives: {out.strip()[:200]}")
        assert rc == 0, out
        assert "OK" in out, out

    # both ranks computed the same global sum: 2 devices/process, rank r
    # contributes (r+1) * 2 * 4 -> total 1*8 + 2*8 = 24
    vals = [float(out.split("OK")[1].split()[0]) for _, out in outs]
    assert vals[0] == vals[1] == 24.0, vals
    # the cross-process KD train step produced identical finite losses and
    # bit-identical updated params on every rank (grad all-reduce ran)
    losses = [float(out.split("loss")[1].split()[0]) for _, out in outs]
    csums = [float(out.split("csum")[1].split()[0]) for _, out in outs]
    assert losses[0] == losses[1], losses
    assert csums[0] == csums[1], csums
