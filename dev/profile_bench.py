"""Profile the bench inference step on the real chip and print the top HLO
ops by self time (xprof op_profile). Shares bench.py's model, shapes, and
persistent compilation cache, so a run after bench.py starts quickly.

Usage: python dev/profile_bench.py   (writes /tmp/jtsm_profile, prints a table)
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jtsm_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.modeling import build_model

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(root, "configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml")
    )
    model = build_model(cfg)

    b = int(os.environ.get("BENCH_BATCH", "64"))
    h, w = 800, 1344
    batch0 = {
        "image": jnp.zeros((b, h, w, 3), jnp.float32),
        "image_sizes": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
    }
    rng = jax.random.key(0)
    t0 = time.time()
    variables = jax.jit(
        lambda r: model.init({"params": r, "sampling": r}, batch0, train=False)
    )(rng)
    jax.block_until_ready(variables)
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr)

    def step(v, seed):
        img = jax.random.uniform(jax.random.key(seed), (b, h, w, 3)) * 255.0
        out = model.apply(v, dict(batch0, image=img), train=False)
        return (
            out["scores"].sum()
            + out["boxes"].sum()
            + out["masks"].sum()
            + out["classes"].sum()
        )

    fwd = jax.jit(step)
    t0 = time.time()
    float(fwd(variables, 0))
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    float(fwd(variables, 1))

    logdir = "/tmp/jtsm_profile"
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        vals = [fwd(variables, 2 + i) for i in range(2)]
        jax.block_until_ready(vals)

    xplanes = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not xplanes:
        print("no xplane captured", file=sys.stderr)
        return
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "op_profile", {}
    )
    prof = json.loads(data)

    def walk(node, out):
        m = node.get("metrics", {})
        if node.get("name") and "children" not in node:
            out.append((node["name"], m.get("time", 0.0)))
        for c in node.get("children", []):
            walk(c, out)

    # byProgram/byCategory roots both work; prefer byCategory leaf ops
    root_node = prof.get("byCategory") or prof.get("byProgram") or {}
    leaves = []
    walk(root_node, leaves)
    leaves.sort(key=lambda t: -t[1])
    print("\ntop ops by self-time fraction:")
    for name, t in leaves[:30]:
        print(f"  {t*100:6.2f}%  {name}")


if __name__ == "__main__":
    main()
