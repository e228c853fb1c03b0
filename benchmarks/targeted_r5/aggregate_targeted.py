"""Round-5 targeted-matrix aggregation: table + emission-rate curves.

The reference sweeps targeted mode across its norm grid
(submit_scan_range.py:48-49, 80-88) but records no success metric;
round 4 built emission_rate / wer_to_target (train/scoring.py) and ran
two cells. This script aggregates the 12-cell round-5 matrix (snr/linf/
fm × 2 sizes × PGD/Adam) from the run dirs' results.json +
metrics.jsonl into matrix.{txt,json} and plots/emission_curves.png.

Run from the repo root after run_targeted_r5.sh:
``python benchmarks/targeted_r5/aggregate_targeted.py``. Reads the live
``logs/`` tree when present, else the committed per-cell summaries
under ``cells/`` (same slim-artifact policy as quality_r4/r5).
"""

import glob
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = os.path.dirname(os.path.abspath(__file__))


def cell_dirs() -> list[str]:
    live = sorted(glob.glob(os.path.join(HERE, "logs", "targeted", "*", "*")))
    if live:
        return live
    return sorted(glob.glob(os.path.join(HERE, "cells", "*")))


def main() -> int:
    rows = []
    for d in cell_dirs():
        rf = os.path.join(d, "results.json")
        if not os.path.exists(rf):
            continue
        r = json.load(open(rf))
        if not r.get("finished_training"):
            print(f"skipping unfinished cell {os.path.basename(d)}")
            continue
        name = os.path.basename(d)
        opt = name.rsplit("_", 1)[-1]
        tm = r.get("targeted_metrics") or {}
        epochs = [json.loads(l) for l in open(os.path.join(d, "metrics.jsonl"))]
        rows.append({
            "cell": name,
            "norm_type": r["norm_type"],
            "attack_size": r["attack_size"],
            "optimizer": opt,
            "best_epoch": r.get("best_epoch"),
            "test_pert_wer": r["final_test_perturbed"]["wer"],
            "test_clean_wer": r["final_test_clean"]["wer"],
            "emission_rate": (tm.get("perturbed") or {}).get("emission_rate"),
            "emission_rate_clean": (tm.get("clean") or {}).get("emission_rate"),
            "wer_to_target": (tm.get("perturbed") or {}).get("wer_to_target"),
            "wer_to_target_clean": (tm.get("clean") or {}).get("wer_to_target"),
            "eval_emission_curve": [e.get("eval_emission_rate") for e in epochs],
            "eval_wer_to_target_curve": [e.get("eval_wer_to_target") for e in epochs],
        })
    if not rows:
        raise SystemExit("no cells found")
    rows.sort(key=lambda r: (r["norm_type"], r["optimizer"], float(r["attack_size"])))
    with open(os.path.join(HERE, "matrix.json"), "w") as f:
        json.dump(rows, f, indent=2)

    hdr = (f"{'norm':<16} {'size':>8} {'opt':<5} {'emit':>6} {'emit0':>6} "
           f"{'wer2tgt':>8} {'pertWER':>8} {'bestEp':>6}")
    lines = [hdr, "-" * len(hdr)]
    for r in rows:
        lines.append(
            f"{r['norm_type']:<16} {r['attack_size']:>8g} {r['optimizer']:<5} "
            f"{r['emission_rate']:>6.3f} {r['emission_rate_clean']:>6.3f} "
            f"{r['wer_to_target']:>8.3f} {r['test_pert_wer']:>8.3f} "
            f"{r['best_epoch']:>6.0f}"
        )
    table = "\n".join(lines)
    with open(os.path.join(HERE, "matrix.txt"), "w") as f:
        f.write(table + "\n")
    print(table)

    os.makedirs(os.path.join(HERE, "plots"), exist_ok=True)
    fams = sorted({r["norm_type"] for r in rows})
    fig, axes = plt.subplots(1, len(fams), figsize=(5 * len(fams), 4),
                             sharey=True)
    for ax, fam in zip(axes, fams):
        for r in (r for r in rows if r["norm_type"] == fam):
            curve = r["eval_emission_curve"]
            style = "-" if r["optimizer"] == "pgd" else "--"
            ax.plot(range(len(curve)), curve, style, marker=".",
                    label=f"{r['attack_size']:g} {r['optimizer']}")
        floor = [r["emission_rate_clean"] for r in rows if r["norm_type"] == fam]
        ax.axhline(sum(floor) / len(floor), color="gray", linestyle=":",
                   label="clean floor")
        ax.set_title(fam)
        ax.set_xlabel("epoch")
        ax.grid(True, alpha=0.4)
        ax.legend(fontsize=8)
    axes[0].set_ylabel('eval emission rate of target ("delete")')
    fig.suptitle("Targeted matrix — emission rate vs epoch (r5)")
    fig.tight_layout()
    out = os.path.join(HERE, "plots", "emission_curves.png")
    fig.savefig(out)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
