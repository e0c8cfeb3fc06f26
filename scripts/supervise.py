"""Process-level elastic supervisor (aux subsystem, SURVEY §5.3).

Wraps any trainer command (single-host or one rank of a jax.distributed
launch) with failure detection the in-process Supervisor cannot provide:
a hung device/relay never raises, it just stops making progress. This
watches the trainer's atomically-published `heartbeat.json` and

  * relaunches the child on non-zero exit (crash, device loss, NaN halt
    when the in-process Supervisor's restart budget is exhausted) with
    exponential backoff;
  * kills the EXACT child PID (never pattern-matching) when the
    heartbeat goes stale for longer than --stall-timeout, then
    relaunches — resume is the trainer's own job (`--resume latest` /
    rotating checkpoints restore the newest intact state).

Usage:
    python scripts/supervise.py --save-dir ./saves/opt_trainer \
        --stall-timeout 900 --max-restarts 5 -- \
        python -m sea_tpu.training.cli --dataset wikitext2 --model opt-125m

Exits with the child's exit code once it terminates cleanly (rc 0) or
the restart budget is spent.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def run_supervised(
    cmd,
    save_dir: str,
    stall_timeout: float = 900.0,
    max_restarts: int = 5,
    poll_s: float = 5.0,
    backoff_s: float = 10.0,
) -> int:
    hb_path = os.path.join(save_dir, "heartbeat.json")
    restarts = 0
    while True:
        start = time.time()
        child = subprocess.Popen(cmd, start_new_session=True)
        killed_stalled = False
        while True:
            rc = child.poll()
            if rc is not None:
                break
            alive_for = time.time() - start
            if os.path.exists(hb_path):
                age = time.time() - os.path.getmtime(hb_path)
                # a heartbeat left by the PREVIOUS incarnation is old by
                # mtime; every incarnation gets stall_timeout grace from
                # its own launch before a stale file can kill it
                ref = min(age, alive_for)
            else:
                ref = alive_for
            if ref > stall_timeout:
                # exact-PID process-group kill; never pkill-by-pattern
                print(
                    f"[supervise] heartbeat stale {ref:.0f}s > "
                    f"{stall_timeout:.0f}s; killing pid {child.pid}",
                    flush=True,
                )
                try:
                    os.killpg(os.getpgid(child.pid), signal.SIGTERM)
                    try:
                        child.wait(timeout=30)
                    except subprocess.TimeoutExpired:
                        os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                        child.wait(timeout=30)
                except ProcessLookupError:
                    pass
                killed_stalled = True
                rc = child.poll()
                break
            time.sleep(poll_s)
        if rc == 0 and not killed_stalled:
            return 0
        if restarts >= max_restarts:
            print(f"[supervise] restart budget spent (rc={rc})", flush=True)
            return rc if rc not in (None, 0) else 1
        restarts += 1
        delay = backoff_s * (2 ** (restarts - 1))
        print(
            f"[supervise] child exited rc={rc}"
            f"{' (stalled)' if killed_stalled else ''}; restart "
            f"{restarts}/{max_restarts} in {delay:.0f}s",
            flush=True,
        )
        time.sleep(delay)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save-dir", required=True)
    p.add_argument("--stall-timeout", type=float, default=900.0)
    p.add_argument("--max-restarts", type=int, default=5)
    p.add_argument("--poll", type=float, default=5.0)
    p.add_argument("--backoff", type=float, default=10.0)
    p.add_argument("cmd", nargs=argparse.REMAINDER)
    args = p.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no child command given (pass it after --)")
    sys.exit(
        run_supervised(
            cmd,
            args.save_dir,
            stall_timeout=args.stall_timeout,
            max_restarts=args.max_restarts,
            poll_s=args.poll,
            backoff_s=args.backoff,
        )
    )


if __name__ == "__main__":
    main()
