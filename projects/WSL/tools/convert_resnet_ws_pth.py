#!/usr/bin/env python
"""Convert a torch WS-ResNet checkpoint (MMCls-style ``module.backbone.*`` /
``module.neck.*`` naming) to this framework's loadable format (reference
projects/WSL/tools/convert_resnet_ws_pth.py).

Usage: convert_resnet_ws_pth.py input.pth output.pkl
"""

import sys

from _weight_convert import load_source, report, save_d2_pkl


def rename(k: str) -> str:
    if k.startswith("module.neck.fc"):
        return k.replace("module.neck.fc", "roi_heads.box_head.fc")
    if k.startswith("module.backbone."):
        return k.replace("module.backbone.", "backbone.")
    if k.startswith("module.neck."):
        return k.replace("module.neck.", "roi_heads.box_head.")
    return k


def main(in_path: str, out_path: str) -> None:
    src = load_source(in_path)
    out = {rename(k): v for k, v in src.items()}
    report(zip(sorted(src), [rename(k) for k in sorted(src)]))
    save_d2_pkl(out, out_path, author="torch")
    print(f"wrote {out_path} ({len(out)} tensors)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
