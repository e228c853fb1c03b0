"""Aggregate a targeted-attack matrix: emission tables + per-epoch curves.

Walks run dirs under a logs root (the layout cli/run_attack.make_save_dir
writes), reads each cell's results.json (final test emission metrics,
train/loop.py:560-569) and metrics.jsonl (per-epoch eval emission_rate /
wer_to_target, train/loop.py:471-481), and writes:

  * aggregate.json / aggregate.txt — one row per (norm, size, optimizer)
    with test emission rate, the clean-emission false-positive floor,
    wer_to_target, and perturbed/clean test WER;
  * curves/<norm>_emission.png, curves/<norm>_wer_to_target.png — the
    per-epoch trajectories, one line per (size, optimizer) cell.

This is the quantitative counterpart, across constraint families, to the
reference paper's §4.4 single targeted finding (reference targeted sweep:
submit_scan_range.py:48-49).

Usage: python tools/aggregate_targeted.py --root benchmarks/targeted_r5/logs \
           --out benchmarks/targeted_r5
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def collect(root: str) -> list[dict]:
    rows = []
    for dirpath, _dirs, files in os.walk(root):
        if "results.json" not in files:
            continue
        try:
            with open(os.path.join(dirpath, "results.json")) as f:
                r = json.load(f)
        except Exception:
            continue
        leaf = os.path.basename(dirpath)
        optimizer = leaf.rsplit("_", 1)[-1] if "_" in leaf else "?"
        tm = r.get("targeted_metrics") or {}
        curve: list[dict] = []
        mpath = os.path.join(dirpath, "metrics.jsonl")
        if os.path.exists(mpath):
            with open(mpath) as f:
                for line in f:
                    try:
                        e = json.loads(line)
                    except ValueError:
                        continue
                    if "eval_emission_rate" in e:
                        curve.append({
                            "epoch": e["epoch"],
                            "emission_rate": e["eval_emission_rate"],
                            "wer_to_target": e["eval_wer_to_target"],
                        })
        rows.append({
            "run": os.path.relpath(dirpath, root),
            "norm_type": r.get("norm_type"),
            "attack_size": r.get("attack_size"),
            "optimizer": optimizer,
            "finished": bool(r.get("finished_training", False)),
            "test_emission_rate": (tm.get("perturbed") or {}).get("emission_rate"),
            "clean_emission_floor": (tm.get("clean") or {}).get("emission_rate"),
            "test_wer_to_target": (tm.get("perturbed") or {}).get("wer_to_target"),
            "clean_wer": (r.get("final_test_clean") or {}).get("wer"),
            "pert_wer": (r.get("final_test_perturbed") or {}).get("wer"),
            "pert_ctc": (r.get("final_test_perturbed") or {}).get("ctc"),
            "error": r.get("error"),
            "curve": curve,
        })
    return rows


def render(rows: list[dict]) -> str:
    fmt = lambda v: "-" if v is None else (f"{v:.3f}" if isinstance(v, float) else str(v))
    gfmt = lambda v: "-" if v is None else (f"{v:g}" if isinstance(v, float) else str(v))
    header = (
        f"{'norm':<16} {'size':>8} {'opt':<5} {'emission':>9} {'floor':>6} "
        f"{'wer→tgt':>8} {'cleanWER':>9} {'pertWER':>8} {'done':>5}"
    )
    lines = [header, "-" * len(header)]
    for r in sorted(rows, key=lambda r: (str(r["norm_type"]),
                                         r["attack_size"] or 0, r["optimizer"])):
        lines.append(
            f"{fmt(r['norm_type']):<16} {gfmt(r['attack_size']):>8} "
            f"{r['optimizer']:<5} {fmt(r['test_emission_rate']):>9} "
            f"{fmt(r['clean_emission_floor']):>6} {fmt(r['test_wer_to_target']):>8} "
            f"{fmt(r['clean_wer']):>9} {fmt(r['pert_wer']):>8} "
            f"{str(r['finished']):>5}"
        )
    return "\n".join(lines)


def plot(rows: list[dict], out_dir: str) -> list[str]:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping curves", file=sys.stderr)
        return []
    os.makedirs(out_dir, exist_ok=True)
    written = []
    norms = sorted({r["norm_type"] for r in rows if r["curve"]})
    for norm in norms:
        cells = [r for r in rows if r["norm_type"] == norm and r["curve"]]
        for metric, ylabel in (("emission_rate", "test-target emission rate"),
                               ("wer_to_target", "WER vs repeated target")):
            plt.figure(figsize=(7, 4))
            for r in sorted(cells, key=lambda r: (r["attack_size"] or 0,
                                                  r["optimizer"])):
                xs = [c["epoch"] for c in r["curve"]]
                ys = [c[metric] for c in r["curve"]]
                plt.plot(xs, ys, marker="o",
                         label=f"{r['attack_size']:g} {r['optimizer']}")
            floors = [r["clean_emission_floor"] for r in cells
                      if r["clean_emission_floor"] is not None]
            if metric == "emission_rate" and floors:
                plt.axhline(sum(floors) / len(floors), linestyle="--",
                            color="gray", label="clean floor")
            plt.xlabel("epoch")
            plt.ylabel(ylabel)
            plt.title(f"targeted {norm}: {ylabel} per epoch")
            plt.grid(True)
            plt.legend(fontsize=8)
            plt.tight_layout()
            path = os.path.join(out_dir, f"{norm}_{metric}.png")
            plt.savefig(path)
            plt.close()
            written.append(path)
    return written


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    rows = collect(args.root)
    if not rows:
        print(f"no results.json under {args.root!r}")
        return 1
    table = render(rows)
    print(table)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "aggregate.txt"), "w") as f:
        f.write(table + "\n")
    with open(os.path.join(args.out, "aggregate.json"), "w") as f:
        json.dump([{k: v for k, v in r.items() if k != "curve"} for r in rows],
                  f, indent=2)
    for p in plot(rows, os.path.join(args.out, "curves")):
        print("wrote", p)
    return 0


if __name__ == "__main__":
    sys.exit(main())
