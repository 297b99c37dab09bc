"""Summarize the round-4 experiment CSVs into EVAL_SYNTH-ready tables.

    python tools/summarize_r4.py [--flagship-csv eval_synth_r3c.csv]

Reads eval_ablation_synth.csv (ablation grid rows), eval_seeds_synth.csv
(3-seed protocol), eval_openvocab_sweep.csv (threshold/strength sweep) and
eval_walkers_synth.csv — whichever exist — and prints markdown tables with
deltas vs the flagship and per-shape-set seed mean +- std.
"""

import argparse
import csv
import os
import sys

KEYS = ["Objects F-measure", "Boundary F-measure", "obj_mIOU"]


def read(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return list(csv.DictReader(f))


def fmt(rows, key):
    return 100 * float(rows[key])


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--flagship-csv", default="eval_synth_r3c.csv")
    args = parser.parse_args()

    # flagship reference row (mixed set, refined stage)
    flag = None
    for r in read(args.flagship_csv):
        if r.get("stage") == "refined":
            flag = r  # last refined row = the shipped protocol run
    if flag:
        print("flagship (r3c mixed): "
              + ", ".join(f"{k}={fmt(flag, k):.2f}" for k in KEYS))

    ab = read("eval_ablation_synth.csv")
    if ab:
        print("\n## Ablation grid (mixed scenes, perturbed-gt, n=200)\n")
        print("| Config | Objects F (init→ref) | Boundary F (init→ref) | "
              "ΔBoundary vs flagship | mIoU |")
        print("|---|---|---|---|---|")
        by_tag = {}
        for r in ab:
            by_tag.setdefault(r["tag"], {})[r["stage"]] = r
        for tag, st in by_tag.items():
            if "refined" not in st:
                continue
            i, rr = st.get("initial"), st["refined"]
            d = (fmt(rr, "Boundary F-measure") - fmt(flag, "Boundary F-measure")
                 if flag else float("nan"))
            print(f"| {tag.split('|')[0]} | "
                  f"{fmt(i, 'Objects F-measure'):.2f} → {fmt(rr, 'Objects F-measure'):.2f} | "
                  f"{fmt(i, 'Boundary F-measure'):.2f} → {fmt(rr, 'Boundary F-measure'):.2f} | "
                  f"{d:+.2f} | {fmt(rr, 'obj_mIOU'):.2f} |")

    sd = read("eval_seeds_synth.csv")
    if sd:
        import numpy as np

        print("\n## 3-seed protocol (refined rows)\n")
        sets = {}
        for r in sd:
            if r["stage"] != "refined":
                continue
            seed, shape = r["tag"].split("|")[0], r["tag"].split("|")[1]
            sets.setdefault(shape, {})[seed] = r
        print("| Shape set | seeds | Objects F mean±std | Boundary F mean±std |")
        print("|---|---|---|---|")
        for shape, seeds in sets.items():
            of = [fmt(r, "Objects F-measure") for r in seeds.values()]
            bf = [fmt(r, "Boundary F-measure") for r in seeds.values()]
            print(f"| {shape} | {len(of)} | "
                  f"{np.mean(of):.2f} ± {np.std(of):.2f} | "
                  f"{np.mean(bf):.2f} ± {np.std(bf):.2f} |")
        print("\nper-seed Boundary F:")
        for shape, seeds in sets.items():
            vals = {s: f"{fmt(r, 'Boundary F-measure'):.2f}" for s, r in seeds.items()}
            print(f"  {shape}: {vals}")

    sw = read("eval_openvocab_sweep.csv")
    if sw:
        print("\n## Open-vocab detector-strength sweep\n")
        print("| Detector | thr | base Objects F | refined | base Boundary F | refined |")
        print("|---|---|---|---|---|---|")
        by_tag = {}
        for r in sw:
            by_tag.setdefault(r["tag"], {})[r["stage"]] = r
        for tag, st in by_tag.items():
            if "refined" not in st or "initial" not in st:
                continue
            det, thr = tag.split("|")[0], tag.split("|")[1]
            i, rr = st["initial"], st["refined"]
            print(f"| {det} | {thr} | {fmt(i, 'Objects F-measure'):.2f} | "
                  f"{fmt(rr, 'Objects F-measure'):.2f} | "
                  f"{fmt(i, 'Boundary F-measure'):.2f} | "
                  f"{fmt(rr, 'Boundary F-measure'):.2f} |")

    wk = read("eval_walkers_synth.csv")
    if wk:
        print("\n## Walker twins (trained flagship)\n")
        print("| Dataset | n | Objects F (init→ref) | Boundary F (init→ref) |")
        print("|---|---|---|---|")
        by_ds = {}
        for r in wk:
            by_ds.setdefault(r["dataset"], {})[r["stage"]] = r
        for ds, st in by_ds.items():
            if "refined" not in st:
                continue
            i, rr = st.get("initial"), st["refined"]
            print(f"| {ds} | {rr['n_images']} | "
                  f"{fmt(i, 'Objects F-measure'):.2f} → {fmt(rr, 'Objects F-measure'):.2f} | "
                  f"{fmt(i, 'Boundary F-measure'):.2f} → {fmt(rr, 'Boundary F-measure'):.2f} |")


if __name__ == "__main__":
    sys.exit(main())
