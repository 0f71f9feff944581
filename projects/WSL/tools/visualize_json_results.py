#!/usr/bin/env python
"""Visualize WSL COCO-format prediction jsons (reference:
projects/WSL/tools/visualize_json_results.py). Identical to the core tool
but imports the WSL plane so the VOC_SBD / PGT / web datasets are
registered."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

import jtsm_tpu.wsl  # noqa: F401  (registers WSL builtin datasets)

# the core implementation is dataset-driven; reuse it verbatim
_core = os.path.join(os.path.dirname(__file__), "../../../tools/visualize_json_results.py")

if __name__ == "__main__":
    with open(_core) as f:
        code = f.read()
    exec(compile(code, _core, "exec"), {"__name__": "__main__", "__file__": _core})
