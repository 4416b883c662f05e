#!/usr/bin/env python
"""Generate a manual architecture JSON from the search space (reference
``gen_arch.py``: fixed_sample at a chosen resolution/width ratio).

  python tools/gen_arch.py --reso 256 --ratio 0.5 --out manual-S.json
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reso", type=int, default=256)
    p.add_argument("--ratio", type=float, default=0.5)
    p.add_argument("--deconv", type=int, nargs=3, default=[64, 48, 32])
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from litepose_tpu.arch import ArchManager
    from litepose_tpu.arch.schema import save_arch

    manager = ArchManager(deconv_setting=args.deconv)
    arch = manager.fixed_sample(reso=args.reso, ratio=args.ratio)
    save_arch(arch, args.out)
    print(f"wrote {args.out}: {arch.to_dict()}")


if __name__ == "__main__":
    main()
