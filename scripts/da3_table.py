"""Assemble the da3 AP table from runs/da3/ap_*.json -> markdown rows.

da3 = reference-protocol scale (4,096 source frames ~ nuScenes top-100 =
4,025, docs/DATASET_PREPARATION.md:21-22) x 10,000 steps, v2 protocol
(source completed by VCN_CN with GT boxes, target by the r5 VCN_VC).
The last four rows form the 2x2 in-domain attribution matrix
(train {raw, cn} x eval-src-val {raw, cn}).
"""
import glob
import json
import os
import sys

ROWS = [
    ("ap_raw3_tgt.json", "raw3", "tgt val (16-beam, raw)"),
    ("ap_see3_tgt.json", "see3 (CN src)", "tgt val (VC-completed) — protocol match"),
    ("ap_raw3_tgtcomp.json", "raw3", "tgt val (VC-completed) — test-time ablation"),
    ("ap_raw3_src.json", "raw3", "src val raw  [2x2: raw/raw]"),
    ("ap_raw3_srccomp.json", "raw3", "src val CN-completed  [2x2: raw/cn]"),
    ("ap_see3_src.json", "see3 (CN src)", "src val CN-completed  [2x2: cn/cn]"),
    ("ap_see3_srcraw.json", "see3 (CN src)", "src val raw  [2x2: cn/raw]"),
]


def main(d="runs/da3"):
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
