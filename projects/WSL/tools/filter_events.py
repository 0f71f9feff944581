#!/usr/bin/env python
"""Strip bulky non-scalar entries from training logs.

Reference: projects/WSL/tools/filter_events.py — rewrites TensorBoard event
files keeping only scalar summaries (images/histograms from the WSL PGT
visual-debug hooks dominate disk). This framework logs to
``metrics.json`` (one json object per line, see utils/events.JSONWriter)
and optionally TensorBoard; this tool filters either:

  filter_events.py --dir output/            # walk: metrics.json + tfevents
  filter_events.py --event output/metrics.json
"""

import argparse
import json
import os
import sys


def filter_metrics_json(path: str, out_path: str = None) -> int:
    """Keep scalar-valued fields only; returns #lines written."""
    out_path = out_path or path + ".filtered"
    n = 0
    with open(path) as f, open(out_path, "w") as out:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            rec = {
                k: v for k, v in rec.items() if isinstance(v, (int, float, bool))
            }
            if rec:
                out.write(json.dumps(rec) + "\n")
                n += 1
    return n


def filter_tfevents(path: str, out_dir: str) -> int:
    """Rewrite a tfevents file keeping scalar summaries (needs tensorflow)."""
    try:
        import tensorflow as tf
    except ImportError:
        print(f"[skip] {path}: tensorflow not available")
        return 0
    os.makedirs(out_dir, exist_ok=True)
    writer = tf.compat.v1.summary.FileWriter(out_dir)
    n = 0
    for event in tf.compat.v1.train.summary_iterator(path):
        if event.WhichOneof("what") != "summary":
            writer.add_event(event)
            continue
        values = [v for v in event.summary.value if v.HasField("simple_value")]
        writer.add_event(
            tf.compat.v1.summary.Event(
                summary=tf.compat.v1.Summary(value=values),
                wall_time=event.wall_time,
                step=event.step,
            )
        )
        n += 1
    writer.close()
    return n


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--event", default="", help="one metrics.json / tfevents file")
    ap.add_argument("--dir", default="", help="walk a directory tree")
    args = ap.parse_args()

    if args.event:
        if args.event.endswith(".json"):
            n = filter_metrics_json(args.event)
        else:
            n = filter_tfevents(args.event, os.path.join(os.path.dirname(args.event), "filtered_events"))
        print(f"kept {n} records")
        return 0

    if not args.dir:
        ap.error("pass --event or --dir")
    for root, _, files in os.walk(args.dir):
        for f in files:
            p = os.path.join(root, f)
            if f == "metrics.json":
                print(f"{p}: kept {filter_metrics_json(p)} records")
            elif f.startswith("events.out.tfevents."):
                n = filter_tfevents(p, root)
                if n:
                    os.remove(p)
                    print(f"{p}: kept {n} scalar events")
    return 0


if __name__ == "__main__":
    sys.exit(main())
