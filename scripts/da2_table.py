"""Assemble the da2 AP table from runs/da2/ap_*.json -> markdown rows."""
import glob
import json
import os
import sys

ROWS = [
    ("ap_raw_src.json", "raw", "src val (64-beam, raw)"),
    ("ap_raw_tgt.json", "raw", "tgt val (16-beam, raw)"),
    ("ap_see_src.json", "see (r4 VC/VC)", "src val (VC-completed)"),
    ("ap_see_tgt.json", "see (r4 VC/VC)", "tgt val (VC-completed)"),
    ("ap_raw_tgtcomp.json", "raw", "tgt val (r4 VC-completed) — ablation"),
    ("ap_see2_src.json", "see2 (r5 CN/VC)", "src val (CN-completed)"),
    ("ap_see2_tgt.json", "see2 (r5 CN/VC)", "tgt val (r5 VC-completed)"),
    ("ap_raw_tgtcomp2.json", "raw",
     "tgt val (r5 VC-completed) — rotation-fix ablation"),
]


def main(d="runs/da2"):
    print("| detector | eval set | 3D AP | BEV AP | frames |")
    print("|---|---|---|---|---|")
    for fname, det, desc in ROWS:
        p = os.path.join(d, fname)
        if not os.path.exists(p):
            print(f"| {det} | {desc} | — | — | — |")
            continue
        with open(p) as f:
            j = json.load(f)
        print(f"| {det} | {desc} | {j['ap_3d_07_r40']:.2f} | "
              f"{j['ap_bev_07_r40']:.2f} | {j['n_frames']} |")
    extra = sorted(set(glob.glob(os.path.join(d, "ap_*.json"))) -
                   {os.path.join(d, r[0]) for r in ROWS})
    for p in extra:
        print(f"(unlisted: {p})")


if __name__ == "__main__":
    main(*sys.argv[1:])
