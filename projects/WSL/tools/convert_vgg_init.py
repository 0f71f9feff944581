#!/usr/bin/env python
"""Convert a Caffe2 VGG16 .pkl whose fc6/fc7 were duplicated into four
dilated branches (the MRRP/multi-dilation VGG init; reference
projects/WSL/tools/convert_vgg_init.py).

``fc6_<b>`` / ``fc7_<b>`` map to ``dilation<d>_conv<1|2>`` for
d in (6, 12, 18, 24); everything else follows convert_vgg.py.

Usage: convert_vgg_init.py input.pkl output.pkl
"""

import re
import sys

from _weight_convert import load_source, report, save_d2_pkl
from convert_vgg import rename as base_rename

_DILATIONS = {1: 6, 2: 12, 3: 18, 4: 24}


def rename(k: str) -> str:
    m = re.match(r"^fc([67])_(\d)_(w|b)$", k)
    if m:
        conv = 1 if m.group(1) == "6" else 2
        d = _DILATIONS[int(m.group(2))]
        return f"dilation{d}_conv{conv}_{m.group(3)}"
    return base_rename(k)


def main(in_path: str, out_path: str) -> None:
    src = load_source(in_path)
    out = {rename(k): v for k, v in src.items()}
    report(zip(sorted(src), [rename(k) for k in sorted(src)]))
    save_d2_pkl(out, out_path)
    print(f"wrote {out_path} ({len(out)} tensors)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
