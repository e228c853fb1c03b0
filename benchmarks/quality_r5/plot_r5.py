"""Round-5 dose-response plots: merge the r4 grid with the r5 weak-end
cells so each saturated family's curve shows its knee (VERDICT r4 "Next
round #3"), plus the phon_reference_db curve — the knob analysis.md
shows is the one that actually binds max_phon.

Run from the repo root: ``python benchmarks/quality_r5/plot_r5.py``.
Inputs: benchmarks/quality_r4/aggregate.json (recorded r4 cells) and
the round-5 per-cell summaries under benchmarks/quality_r5/cells/
(results.json copied out of the run dirs; the heavy run trees —
wav/npy/per-cell loss plots — are not committed, same policy as
quality_r4). Outputs: combined.{json,txt} and plots/*.png.
"""

import glob
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from paa_tpu.cli.aggregate import render  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
R4_AGG = os.path.join(HERE, "..", "quality_r4", "aggregate.json")
FAMILIES = ("max_phon", "min_max_freqs", "tv")


def collect_cells() -> tuple[list[dict], list[dict]]:
    """Part-A rows (grid-axis cells) and part-B rows (refdb cells)."""
    part_a, part_b = [], []
    for f in sorted(glob.glob(os.path.join(HERE, "cells", "*", "results.json"))):
        name = os.path.basename(os.path.dirname(f))
        if name.endswith("_adam"):
            # the optimizer-A/B cells (README §optimizer-axis) are a
            # different experiment — keep them out of the PGD curves
            continue
        r = json.load(open(f))
        row = {
            "run": name,
            "attack_mode": "untargeted",
            "dataset": "synthetic",
            "optimizer": "pgd",
            "norm_type": r.get("norm_type"),
            "attack_size": r.get("attack_size"),
            "finished": bool(r.get("finished_training", False)),
            "clean_ctc": r["final_test_clean"]["ctc"],
            "clean_wer": r["final_test_clean"]["wer"],
            "pert_ctc": r["final_test_perturbed"]["ctc"],
            "pert_wer": r["final_test_perturbed"]["wer"],
            "efficiency_ctc": (r.get("perturbation_efficiency") or {}).get("ctc"),
            "round": 5,
        }
        if "_refdb_" in name:
            row["ref_db"] = float(name.rsplit("_", 1)[-1])
            part_b.append(row)
        else:
            part_a.append(row)
    return part_a, part_b


def main() -> int:
    r4 = [r for r in json.load(open(R4_AGG)) if r["norm_type"] in FAMILIES]
    for r in r4:
        r["round"] = 4
    r5, ref_cells = collect_cells()
    rows = r4 + r5
    with open(os.path.join(HERE, "combined.json"), "w") as f:
        json.dump(rows, f, indent=2)
    with open(os.path.join(HERE, "combined.txt"), "w") as f:
        f.write(render(rows) + "\n")

    plots = os.path.join(HERE, "plots")
    os.makedirs(plots, exist_ok=True)
    for fam in FAMILIES:
        rs = sorted((r for r in rows if r["norm_type"] == fam),
                    key=lambda r: float(r["attack_size"]))
        sizes = [float(r["attack_size"]) for r in rs]
        for metric in ("wer", "ctc"):
            vals = [r[f"pert_{metric}"] for r in rs]
            clean = sum(r[f"clean_{metric}"] for r in rs) / len(rs)
            plt.figure(figsize=(7, 4))
            for rnd, marker in ((4, "o"), (5, "s")):
                xs = [s for s, r in zip(sizes, rs) if r["round"] == rnd]
                ys = [v for v, r in zip(vals, rs) if r["round"] == rnd]
                plt.scatter(xs, ys, marker=marker, zorder=3,
                            label=f"round-{rnd} cells")
            plt.plot(sizes, vals, color="C0", alpha=0.5, zorder=2)
            plt.axhline(clean, linestyle="--", color="gray",
                        label=f"clean {metric.upper()}")
            plt.xscale("log")
            plt.xlabel(f"{fam} constraint size (log)")
            plt.ylabel(f"perturbed test {metric.upper()}")
            plt.title(f"{fam} dose-response — r4 grid + r5 weak end")
            plt.grid(True, which="both", alpha=0.4)
            plt.legend()
            plt.tight_layout()
            path = os.path.join(plots, f"{fam}_combined_{metric}.png")
            plt.savefig(path)
            plt.close()
            print("wrote", path)

    # phon_reference_db curve at fixed max_phon=25: r5 cells + the r4
    # ref_db=65 cell as the saturated endpoint.
    ref_rows = [
        {"ref_db": r["ref_db"], "pert_wer": r["pert_wer"],
         "pert_ctc": r["pert_ctc"], "clean_wer": r["clean_wer"],
         "clean_ctc": r["clean_ctc"]}
        for r in ref_cells
    ]
    r4_65 = next(r for r in r4
                 if r["norm_type"] == "max_phon" and r["attack_size"] == 25.0)
    ref_rows.append({"ref_db": 65.0, "pert_wer": r4_65["pert_wer"],
                     "pert_ctc": r4_65["pert_ctc"],
                     "clean_wer": r4_65["clean_wer"],
                     "clean_ctc": r4_65["clean_ctc"]})
    ref_rows.sort(key=lambda r: r["ref_db"])
    with open(os.path.join(HERE, "refdb_curve.json"), "w") as f:
        json.dump(ref_rows, f, indent=2)
    for metric in ("wer", "ctc"):
        plt.figure(figsize=(7, 4))
        plt.plot([r["ref_db"] for r in ref_rows],
                 [r[f"pert_{metric}"] for r in ref_rows],
                 marker="o", label=f"perturbed test {metric.upper()}")
        plt.axhline(sum(r[f"clean_{metric}"] for r in ref_rows) / len(ref_rows),
                    linestyle="--", color="gray", label=f"clean {metric.upper()}")
        plt.xlabel("phon_reference_db (max_phon fixed at 25)")
        plt.ylabel(f"perturbed test {metric.upper()}")
        plt.title("max_phon family: the binding knob is the dB reference")
        plt.grid(True, alpha=0.4)
        plt.legend()
        plt.tight_layout()
        path = os.path.join(plots, f"refdb_{metric}.png")
        plt.savefig(path)
        plt.close()
        print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
