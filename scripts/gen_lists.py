#!/usr/bin/env python
"""Generate the scene-split list files (lists/) consumed by the recipes.

The split memberships are dataset facts (the standard MVSNet DTU splits, the
BDS synthetic scene ranges, the BlendedMVS low-res validation set) recorded
here so the tree is reproducible without shipping opaque data files.
"""

import os

DTU_TRAIN = [
    2, 6, 7, 8, 14, 16, 18, 19, 20, 22, 30, 31, 36, 39, 41, 42, 44, 45, 46,
    47, 50, 51, 52, 53, 55, 57, 58, 60, 61, 63, 64, 65, 68, 69, 70, 71, 72,
    74, 76, 83, 84, 85, 87, 88, 89, 90, 91, 92, 93, 94, 95, 96, 97, 98, 99,
    100, 101, 102, 103, 104, 105, 107, 108, 109, 111, 112, 113, 115, 116,
    119, 120, 121, 122, 123, 124, 125, 126, 127, 128,
]
DTU_VAL = [3, 5, 17, 21, 28, 35, 37, 38, 40, 43, 56, 59, 66, 67, 82, 86, 106, 117]
DTU_TEST = [
    1, 4, 9, 10, 11, 12, 13, 15, 23, 24, 29, 32, 33, 34, 48, 49, 62, 75, 77,
    110, 114, 118,
]

BLENDEDMVS_VAL = [
    "5b7a3890fc8fcf6781e2593a", "5c189f2326173c3a09ed7ef3",
    "5b950c71608de421b1e7318f", "5a6400933d809f1d8200af15",
    "59d2657f82ca7774b1ec081d", "5ba19a8a360c7c30c1c169df",
    "59817e4a1bd4b175e7038d19",
]


def write(path, names):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for n in names:
            f.write(f"{n}\n")


def main(root="lists"):
    scans = lambda ids: [f"scan{i}" for i in ids]
    write(f"{root}/dtu/train.txt", scans(DTU_TRAIN))
    write(f"{root}/dtu/val.txt", scans(DTU_VAL))
    write(f"{root}/dtu/test.txt", scans(DTU_TEST))
    write(f"{root}/dtu/trainval.txt", scans(DTU_TRAIN) + scans(DTU_VAL))
    # small fixture splits for fast smoke runs (reference lists/dtu/train10.txt
    # = first 10 train scans; test4.txt = first 4 test scans)
    write(f"{root}/dtu/train10.txt", scans(DTU_TRAIN[:10]))
    write(f"{root}/dtu/test4.txt", scans(DTU_TEST[:4]))
    for i in DTU_TEST + DTU_VAL[:4]:
        write(f"{root}/dtu/eval_scan{i}.txt", [f"scan{i}"])

    # BDS synthetic bin scenes: 0..129 train, 130..159 test
    bds = lambda ids: [f"scene{i}" for i in ids]
    write(f"{root}/BDS8/train.txt", bds(range(130)))
    write(f"{root}/BDS8/test.txt", bds(range(130, 160)))
    write(f"{root}/BDS8/train10.txt", bds(range(10)))
    write(f"{root}/BDS8/test4.txt", bds(range(130, 134)))
    for i in (160, 170, 175, 177, 180, 185, 191):
        write(f"{root}/BDS8/eval_scene{i}.txt", [f"scene{i}"])

    # Bin (real-capture bin picking rig) single-scene eval lists
    # (reference lists/Bin/*)
    for i in (1, 2, 3, 4, 5, 7):
        write(f"{root}/Bin/eval_scene{i}.txt", [f"scene{i}"])
    write(f"{root}/Bin/eval_scan7.txt", ["scan7"])
    write(f"{root}/BDS8/eval_scan7.txt", ["scan7"])

    write(f"{root}/blendedmvs/val.txt", BLENDEDMVS_VAL)


if __name__ == "__main__":
    main()
