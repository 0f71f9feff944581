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

    # Run bench.py EXACTLY as the driver does (`python bench.py`): the
    # persistent-cache key differs between running bench as __main__ and
    # importing it as a module (observed: two stable jit_step keys 847a14
    # vs 98437b for byte-identical graphs), so priming via `import bench`
    # ships an entry the driver's invocation never hits.
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    # primary mitigation: serialize the compiled executable itself
    # (bench.py loads it with zero XLA compile, immune to cache-key drift)
    env["BENCH_SERIALIZE"] = os.path.join(root, "dev", "bench_exec.pkl.gz")
    env["BENCH_NO_AOT"] = "1"  # force a real compile for this priming run
    subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        check=True,
        env=env,
    )

    os.makedirs(ship_dir, exist_ok=True)
    after = set(os.listdir(cache_dir))
    # ship only the entry families the bench graph uses (init lambda, step,
    # and the small init helpers) — the cache dir may also hold entries from
    # test/dryrun runs that would bloat the repo. Large entries are gzipped
    # (bench.py's restore decompresses); a PRIMED_FOR marker records the
    # sha256 of bench.py whose keys these entries carry — the cache key
    # drifts with this file's bytes, so any later bench.py edit makes
    # bench.py fall back to the AOT executable instead.
    import gzip
    import hashlib

    keep_prefixes = ("jit_step-", "jit__lambda-", "jit__multi_slice", "jit__truncated_normal")
    for f in os.listdir(ship_dir):
        os.remove(os.path.join(ship_dir, f))
    shipped = 0
    for f in sorted(after):
        src = os.path.join(cache_dir, f)
        if f.startswith(keep_prefixes) and os.path.getsize(src) < 50 * 1024 * 1024:
            if os.path.getsize(src) > 1024 * 1024:
                with open(src, "rb") as s, gzip.open(
                    os.path.join(ship_dir, f + ".gz"), "wb"
                ) as d:
                    shutil.copyfileobj(s, d)
            else:
                shutil.copy(src, os.path.join(ship_dir, f))
            shipped += 1
    with open(os.path.join(root, "bench.py"), "rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    with open(os.path.join(ship_dir, "PRIMED_FOR"), "w") as f:
        f.write(sha + "\n")
    print(f"shipped {shipped} cache entries ({sum(os.path.getsize(os.path.join(ship_dir, f)) for f in os.listdir(ship_dir)) / 1e6:.1f} MB) to {ship_dir}")
    print(f"PRIMED_FOR {sha}")
    print("new entries this run:", sorted(after - before))


if __name__ == "__main__":
    main()
