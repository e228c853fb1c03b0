"""Watchdogged accelerator probe: run one tiny matmul on the default
backend in a subprocess; exit 0 iff it completes within the timeout.

Usage: ``python tools/probe_device.py [timeout_s]`` (default 900 — long
enough to ride out the ~8 min grant stickiness after a killed process,
the tunnel behavior documented in docs/PERF.md round 3). Used by
benchmarks/targeted_r5/run_targeted_r5_adam.sh and handy interactively
whenever the tunnel looks wedged: device LISTING can succeed while the
first HBM transfer hangs, so only an executed op proves liveness.
"""

import multiprocessing as mp
import sys


def _probe(q):
    import jax.numpy as jnp

    x = jnp.ones((128, 128))
    q.put(float((x @ x).sum().block_until_ready()))


def main() -> int:
    timeout = float(sys.argv[1]) if len(sys.argv) > 1 else 900.0
    q = mp.Queue()
    p = mp.Process(target=_probe, args=(q,))
    p.start()
    p.join(timeout=timeout)
    if p.is_alive():
        p.terminate()
        p.join()
        print(f"probe TIMED OUT after {timeout:.0f}s")
        return 1
    try:
        print("probe ok:", q.get_nowait())
    except Exception:
        print(f"probe process exited rc={p.exitcode} without a result")
        return 1
    return 0


if __name__ == "__main__":
    mp.set_start_method("spawn")
    raise SystemExit(main())
