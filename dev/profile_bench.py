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
    import bench

    fwd, variables, b = bench.build_fwd()
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
    print("profile dumped:", xplanes[-1])
    prog = prof["byProgramExcludeIdle"]["children"][0]
    total = prog["metrics"]["rawTime"]
    n_iters = 2  # traced fwd calls above
    print(f"== op profile ({prog['name']}, {total / 1e12 * 1e3 / n_iters:.1f} ms/iter) ==")
    for c in sorted(prog["children"], key=lambda n: -n["metrics"]["rawTime"]):
        m = c["metrics"]
        print(
            f'{m["rawTime"] / total * 100:5.1f}%  '
            f'{m["rawTime"] / 1e12 * 1e3 / n_iters:7.2f} ms  '
            f'{c["name"][:50]:50s} occ={m.get("occurrences", 0)}'
        )
        for leaf in sorted(
            c.get("children", []), key=lambda n: -n["metrics"]["rawTime"]
        )[:3]:
            lm = leaf["metrics"]
            print(
                f'        {lm["rawTime"] / 1e12 * 1e3 / n_iters:7.2f} ms'
                f'    - {leaf["name"][:70]}'
            )


if __name__ == "__main__":
    main()
