"""Profile the consolidated sweep step (see tools/bench_sweep.py for the
config) and print the top device ops — the tool behind the sweep entries
in docs/PERF.md.

Usage: python tools/profile_sweep.py [trace_dir]  (env knobs as bench_sweep)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/paa_sweep_profile"
    steps = 2

    from tools import bench_sweep as bs

    # the ONE fixture builder — the traced program is exactly the timed one
    sweep, ops = bs.build_fixture()

    import jax
    import jax.numpy as jnp

    p_s, opt_s, m = sweep(*ops)
    ops[1], ops[2] = p_s, opt_s
    _ = float(jnp.sum(m.ctc_loss))
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        p_s, opt_s, m = sweep(*ops)
        ops[1], ops[2] = p_s, opt_s
    _ = float(jnp.sum(m.ctc_loss))
    jax.profiler.stop_trace()

    from tools.profile_step import summarize

    summarize(trace_dir, top=40, steps=steps)


if __name__ == "__main__":
    main()
