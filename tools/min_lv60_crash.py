"""Minimize the lv60 accum=1 remote-compiler crash (VERDICT r3 weak #2).

Known since round 2: the monolithic (accum=1) B=64 × 10 s attack step on
wav2vec2-large-lv60 "crashes the remote compiler" (docs/PERF.md round-3
table), while accum=2 compiles and runs at 1.80 steps/s, and accum=1
with `remat_ffn=1` compiles. Until now there was no minimized repro —
a future unrelated compile failure could hide behind "that's the known
crash".

This tool bisects the trigger by compiling the SAME attack-step program
while shrinking one axis at a time, each attempt in a watchdogged
subprocess (a compiler crash or hang must not wedge the driver; the
single-tenant chip frees its grant ~8 min after a killed process, so
attempts run strictly sequentially with generous timeouts):

  * encoder depth: num_hidden_layers 24 → 16 → 12 → 8 → 4
  * batch: B 64 → 48 → 32 → 16 at full depth
  * the two compile-saving knobs held as in production (bf16 storage,
    remat save_cheap, fused attention)

Each attempt reports compile wall time and outcome: ok / crash
(exception fingerprint) / timeout. Results append to a JSONL so a
partial bisect survives; rerun skips finished points.

Usage: python tools/min_lv60_crash.py [--out docs/lv60_accum1_bisect.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from paa_tpu import runtime
runtime.configure()
import jax, jax.numpy as jnp, numpy as np
from paa_tpu.attack import optimizers, step as attack_step
from paa_tpu.config import AttackConfig, ConstraintParams
from paa_tpu.models import wav2vec2
from paa_tpu.ops import psycho, text

spec = json.loads(sys.argv[1])
B, T, layers = spec["B"], spec["T"], spec["layers"]
cfg = AttackConfig(
    norm_type="fletcher_munson", optimizer_type="pgd", lr=1e-4,
    batch_size=B, model_name="wav2vec2-large-lv60",
    compute_dtype="bfloat16", remat=True, accum_steps=1,
    use_pallas_fm=True,
)
mcfg = wav2vec2.get_config(
    "wav2vec2-large-lv60", compute_dtype="bfloat16", remat=True,
    remat_policy="save_cheap", attention_impl="auto",
    num_hidden_layers=layers,
)
params = wav2vec2.init_params(mcfg, seed=0, example_len=T)
params = wav2vec2.cast_param_storage(params, "bfloat16")
model = wav2vec2.Wav2Vec2ForCTC(mcfg)
apply_fn = lambda prm, audio: model.apply({{"params": prm}}, audio)
tables = psycho.build_tables(cfg)
cparams = ConstraintParams.create(fm_epsilon=2.0)
train = attack_step.make_train_step(cfg, apply_fn, tables)
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
labels, pads = text.encode_batch(["the quick brown fox jumps over it"] * B)
p = jnp.zeros((1, T), jnp.float32)
opt = optimizers.init_opt_state(cfg, p)
t0 = time.perf_counter()
p, opt, m = train(params, p, opt, audio, jnp.asarray(labels),
                  jnp.asarray(pads), jnp.ones((B,), jnp.float32), cparams,
                  jnp.float32(cfg.lr))
loss = float(m.ctc_loss)  # forces compile + execute + sync
print(json.dumps({{"ok": True, "compile_plus_step_sec":
                   round(time.perf_counter() - t0, 1),
                   "ctc": round(loss, 2)}}))
"""


def run_point(B: int, T: int, layers: int, timeout: float) -> dict:
    spec = json.dumps({"B": B, "T": T, "layers": layers})
    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=REPO), spec],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"B": B, "layers": layers, "outcome": "timeout",
                "wall_sec": round(time.perf_counter() - t0, 1)}
    wall = round(time.perf_counter() - t0, 1)
    out = (r.stdout or "").strip().splitlines()
    if r.returncode == 0 and out and out[-1].startswith("{"):
        d = json.loads(out[-1])
        return {"B": B, "layers": layers, "outcome": "ok",
                "wall_sec": wall, **d}
    # crash: keep a compact fingerprint (last traceback lines + signal)
    tail = (r.stderr or "").strip().splitlines()[-12:]
    return {"B": B, "layers": layers, "outcome": "crash",
            "returncode": r.returncode, "wall_sec": wall,
            "stderr_tail": tail}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/lv60_accum1_bisect.jsonl")
    ap.add_argument("--audio_len", type=int, default=160000)
    ap.add_argument("--timeout", type=float, default=1500.0,
                    help="per-attempt watchdog (compile alone can take "
                         "~5-10 min for lv60 programs)")
    ap.add_argument("--points", default=None,
                    help='JSON list of [B, layers] pairs overriding the '
                         'default bisection schedule')
    ap.add_argument("--probe_timeout", type=float, default=900.0)
    args = ap.parse_args()

    from paa_tpu import runtime

    runtime.maybe_probe(None, args.probe_timeout)

    done = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    d = json.loads(line)
                    # key includes audio_len: a rerun at a different T
                    # must re-measure, not skip on stale (B, layers)
                    done[(d["B"], d["layers"], d.get("audio_len"))] = d
                except json.JSONDecodeError:
                    pass

    if args.points:
        schedule = [tuple(p) for p in json.loads(args.points)]
    else:
        schedule = [
            (64, 24),            # the production crash point
            (64, 16), (64, 12), (64, 8), (64, 4),   # depth bisect
            (48, 24), (32, 24), (16, 24),           # batch bisect
        ]

    for B, layers in schedule:
        key = (B, layers, args.audio_len)
        if key in done:
            print(f"# skip B={B} layers={layers} T={args.audio_len}: "
                  f"{done[key]['outcome']}", file=sys.stderr)
            continue
        print(f"# attempt B={B} layers={layers} "
              f"(timeout {args.timeout:.0f}s)...", file=sys.stderr)
        rec = run_point(B, args.audio_len, layers, args.timeout)
        rec["audio_len"] = args.audio_len
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), file=sys.stderr)
        if rec["outcome"] != "ok":
            # a crashed/killed TPU process can keep the chip claimed for
            # ~8 min — wait it out before the next attempt
            print("# cooling down the chip grant (480 s)...", file=sys.stderr)
            time.sleep(480)
    print(json.dumps({"done": True, "out": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
