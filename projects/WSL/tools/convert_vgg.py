#!/usr/bin/env python
"""Convert a Caffe2 VGG16 ImageNet .pkl to this framework's loadable format
(reference projects/WSL/tools/convert_vgg.py).

Renames ``conv<s>_<i>_*`` -> ``plain<s>_0_conv<i>_*`` (the VGG backbone's
stage naming) and the ImageNet FCs ``fc<n>`` -> ``fc<n-5>``.

Usage: convert_vgg.py input.pkl output.pkl
"""

import re
import sys

from _weight_convert import load_source, report, save_d2_pkl


def rename(k: str) -> str:
    m = re.match(r"^conv(\d)_(\d)(.*)$", k)
    if m:
        return f"plain{m.group(1)}_0_conv{m.group(2)}{m.group(3)}"
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
