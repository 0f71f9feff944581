#!/usr/bin/env python
"""Convert a DRN-WSOD WS-ResNet Caffe2 ImageNet .pkl to this framework's
loadable format (reference projects/WSL/tools/convert_resnet_ws_c2.py).

Renames the WS stem convs ``conv1_<i>_*`` -> ``stem_conv<i>_*`` and the
ImageNet FC head ``fc<n>`` -> ``fc<n-5>``; residual-block names pass through
(the checkpoint loader's Caffe2 rules handle them).

Usage: convert_resnet_ws_c2.py input.pkl output.pkl
"""

import re
import sys

from _weight_convert import load_source, report, save_d2_pkl


def rename(k: str) -> str:
    m = re.match(r"^conv1_(\d)(.*)$", k)
    if m and "res" not in k:
        return f"stem_conv{m.group(1)}{m.group(2)}"
    m = re.match(r"^fc(\d)(.*)$", k)
    if m:
        return f"fc{int(m.group(1)) - 5}{m.group(2)}"
    return k


def main(in_path: str, out_path: str) -> None:
    src = load_source(in_path)
    out = {rename(k): v for k, v in src.items()}
    report(zip(sorted(src), [rename(k) for k in sorted(src)]))
    save_d2_pkl(out, out_path)
    print(f"wrote {out_path} ({len(out)} tensors)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
