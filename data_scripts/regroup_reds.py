"""Merge REDS train+val into the 270-clip layout — reference data_scripts
REDS regroup helper (SURVEY.md §2.4 [M]): val clips 000..029 are renamed
240..269 so train_sharp holds 270 clips (REDS4 000/011/015/020 stay for
eval and are excluded by the dataset at train time).

    python data_scripts/regroup_reds.py --train <train_sharp> --val <val_sharp>
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", required=True, help="train clip root (modified in place)")
    ap.add_argument("--val", required=True, help="val clip root (clips moved out)")
    ap.add_argument("--offset", type=int, default=240)
    args = ap.parse_args(argv)

    moved = 0
    for name in sorted(os.listdir(args.val)):
        src = osp.join(args.val, name)
        if not osp.isdir(src) or not name.isdigit():
            continue
        dst = osp.join(args.train, f"{int(name) + args.offset:03d}")
        if osp.exists(dst):
            raise FileExistsError(dst)
        shutil.move(src, dst)
        moved += 1
    print(f"moved {moved} val clips into {args.train} (offset {args.offset})")


if __name__ == "__main__":
    main()
