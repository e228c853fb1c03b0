"""Measure the reference's eager-PyTorch hot loop on THIS host's CPU.

The reference publishes no throughput numbers (SURVEY.md §6), and until
round 3 ``bench.py``'s denominator was a hand-derived 0.5 steps/s A40
estimate. torch + transformers are installed here, so the eager hot loop
can be *measured* instead: one full reference attack iteration
(reference: src/training_utils/train.py:126-180) —

  1. ``perturbed = (clean + p).clamp(-1, 1)``            (train.py:136)
  2. HF ``Wav2Vec2ForCTC(input_values, labels)`` → CTC 'sum' loss
     (loss_helpers.py:12-23; random-init base config — weights don't
     change FLOPs)
  3. ``loss.backward()`` to the perturbation only        (train.py:161)
  4. PGD sign step ``p += lr · sign(grad)``              (train.py:161)
  5. eager Fletcher-Munson projection of STFT(p) with the scipy
     ``RegularGridInterpolator`` device→host→device round-trip
     (train.py:38-66 → projections.py:83-133, query build at :104-109)

Omitted (GENEROUS to the baseline): the per-batch tokenize/greedy-decode/
WER the reference also runs inside the hot loop (train.py:149-153,
loss_helpers.py:25-32) — jiwer/evaluate are not installed here.

Methodology: the production shape is B=64 × 10 s. A single 1-CPU step at
B=64 is impractically slow, so the NN fwd+bwd is measured at a smaller
batch (default 4) and extrapolated LINEARLY in B — eager CPU wav2vec2 is
compute-bound, so per-sample time is ~constant in B (it only *improves*
with batching, again generous to the baseline). The FM projection cost
does not scale with B (it projects the universal p, shape (1, T)) and is
measured exactly. The linearity assumption was CHECKED at a second
batch point (2026-08-19, ``--nn_batch 16``): per-sample fwd+bwd time
*grew* from 3.74 s (B=4 best) to 14.7 s (B=16) on this 1-CPU host —
eager conv working sets fall out of cache — so the small-B linear
extrapolation overestimates the baseline's speed and the published
0.0084 steps/s denominator is conservative (see docs/PERF.md and
benchmarks/baseline_r4/baseline_b16.json). The reference's SLURM jobs had 2 CPUs
(submit_scan_range.py:53-55); this host has ``os.cpu_count()`` — the
reported ``steps_per_sec_2cpu`` assumes PERFECT 2-CPU scaling of the
measured 1-CPU number when cpu_count==1 (generous again).

Prints one JSON line with the measured numbers; ``bench.py`` cites
``steps_per_sec_2cpu`` as its baseline denominator (see PERF.md for the
full table including the retained A40 estimate row).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_reference_interpolator():
    """The reference's perceptual-weight interpolator: (phon, freq) grid
    → RegularGridInterpolator with fill value 1.0 out-of-domain
    (reference: src/core/iso.py:238-266). Grid values come from our
    ISO-226 module, which is anchor-tested against the standard."""
    from scipy.interpolate import RegularGridInterpolator

    from paa_tpu.ops import iso226

    freqs, phons, spl = iso226.compute_weight_matrix()
    weights = iso226.perceptual_weight(spl)
    return RegularGridInterpolator(
        (phons, freqs), weights, bounds_error=False, fill_value=1.0
    )


def fm_project_eager(p, interp, n_fft, hop, win, sr, fm_epsilon, target_len):
    """Eager FM projection of the (1, T) perturbation — the reference's
    STFT → scipy-interp round-trip → weighted norm → scale → iSTFT →
    realign chain (reference: train.py:38-66, projections.py:83-133)."""
    import numpy as np
    import torch

    window = torch.hann_window(win)
    stft_p = torch.stft(
        p, n_fft=n_fft, hop_length=hop, win_length=win, window=window,
        center=True, return_complex=True,
    )  # (1, F, Tf) complex
    B, F, T = stft_p.shape
    power = stft_p.abs() ** 2
    spl = 10 * torch.log10(power + 1e-10)
    bin_freqs = torch.fft.rfftfreq(n=n_fft, d=1.0 / sr)
    freqs_expanded = bin_freqs.view(1, F, 1).expand(B, F, T)
    # the reference's per-call device→host→device round-trip
    # (projections.py:104-109): stack, detach, numpy, query, re-tensor
    query = torch.stack([spl, freqs_expanded], dim=-1).reshape(-1, 2)
    weight_values = interp(query.detach().cpu().numpy()).reshape(B, F, T)
    weights = torch.tensor(weight_values, dtype=torch.float32)
    norm = torch.sqrt((power * weights).sum())
    if norm > fm_epsilon:
        stft_p = stft_p * (fm_epsilon / norm.clamp(min=1e-8))
    p_time = torch.istft(
        stft_p, n_fft=n_fft, hop_length=hop, win_length=win, window=window,
        center=True, length=None,
    )
    if p_time.shape[-1] < target_len:
        p_time = torch.nn.functional.pad(
            p_time, (0, target_len - p_time.shape[-1])
        )
    return p_time[..., :target_len]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4,
                    help="measured NN batch (extrapolated linearly to --full_batch)")
    ap.add_argument("--full_batch", type=int, default=64)
    ap.add_argument("--audio_len", type=int, default=160000)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--label_len", type=int, default=100)
    args = ap.parse_args()

    import numpy as np
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    torch.manual_seed(0)
    # base config == facebook/wav2vec2-base-960h geometry (the paper's
    # target, SURVEY.md §6); random init has identical step cost
    model = Wav2Vec2ForCTC(Wav2Vec2Config(ctc_loss_reduction="sum"))
    model.eval()
    for prm in model.parameters():
        prm.requires_grad_(False)

    B, T = args.batch, args.audio_len
    clean = torch.randn(B, T) * 0.1
    p = torch.randn(1, T) * 1e-3
    p.requires_grad_()
    labels = torch.randint(low=5, high=31, size=(B, args.label_len))
    lr = 1e-4
    interp = build_reference_interpolator()

    # warmup (allocator, thread pools, lazy kernels)
    out = model(input_values=(clean[:1] + p).clamp(-1, 1), labels=labels[:1])
    out.loss.backward()
    p.grad = None

    nn_times, fm_times = [], []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        perturbed = (clean + p).clamp(-1.0, 1.0)           # train.py:136
        out = model(input_values=perturbed, labels=labels)  # loss_helpers.py:21
        out.loss.backward()                                 # train.py:161
        with torch.no_grad():
            p += lr * p.grad.sign()                         # train.py:161
        p.grad = None
        t1 = time.perf_counter()
        with torch.no_grad():
            new_p = fm_project_eager(
                p.detach(), interp, 1024, 256, 1024, 16000,
                fm_epsilon=2.0, target_len=T,
            )                                               # train.py:162→38-66
            p.copy_(new_p)
        t2 = time.perf_counter()
        nn_times.append(t1 - t0)
        fm_times.append(t2 - t1)

    nn = min(nn_times)  # best-observed = most generous to the baseline
    fm = min(fm_times)
    per_sample = nn / B
    step_full = per_sample * args.full_batch + fm
    sps_1cpu = 1.0 / step_full
    ncpu = os.cpu_count() or 1
    # reference jobs had 2 CPUs; assume perfect scaling when we have fewer
    sps_2cpu = sps_1cpu * (2.0 / min(ncpu, 2))

    print(json.dumps({
        "metric": (
            f"reference eager hot loop, CPU (wav2vec2-base random-init, "
            f"measured B={B}, extrapolated to B={args.full_batch} x "
            f"{T/16000:.0f}s, fletcher_munson PGD, no WER)"
        ),
        "nn_fwd_bwd_sec_measured": round(nn, 3),
        "nn_batch_measured": B,
        "fm_projection_sec": round(fm, 3),
        "step_sec_extrapolated": round(step_full, 3),
        "steps_per_sec_1cpu": round(sps_1cpu, 5),
        "steps_per_sec_2cpu": round(sps_2cpu, 5),
        "host_cpus": ncpu,
        "torch": torch.__version__,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
