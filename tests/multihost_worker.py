"""Worker for tests/test_multihost.py: a REAL 2-process jax.distributed run
on CPU exercising the world>1 branches of jtsm_tpu.utils.comm, the samplers'
rank sharding, and a sharded-eval merge.

Run as: python tests/multihost_worker.py <coordinator> <num_procs> <pid> <outdir>
"""

import json
import os
import sys


def main():
    coordinator, num_procs, pid, outdir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import numpy as np

    from jtsm_tpu.data.samplers import InferenceSampler, TrainingSampler
    from jtsm_tpu.utils import comm

    out = {"pid": pid}
    out["world"] = comm.get_world_size()
    out["rank"] = comm.get_rank()

    comm.synchronize()

    # object all_gather with rank-dependent payload sizes
    payload = {"rank": pid, "blob": "x" * (10 + 100 * pid), "v": [pid] * (pid + 1)}
    gathered = comm.all_gather(payload)
    out["all_gather"] = [g["rank"] for g in gathered]
    out["all_gather_blob_lens"] = [len(g["blob"]) for g in gathered]

    g0 = comm.gather({"r": pid}, dst=0)
    out["gather_dst0"] = [d["r"] for d in g0] if g0 else None

    out["shared_seed_equal"] = None
    np.random.seed(1234 + pid)  # deliberately different per process
    seed = comm.shared_random_seed()
    seeds = comm.all_gather(seed)
    out["shared_seed_equal"] = len(set(seeds)) == 1

    out["reduce_dict"] = comm.reduce_dict({"loss": float(pid + 1)}, average=True)

    # TrainingSampler rank sharding: the two ranks' index streams partition
    # the shuffled sequence
    ts = TrainingSampler(size=12, shuffle=True, seed=7)
    it = iter(ts)
    out["training_indices"] = [int(next(it)) for _ in range(12)]

    # InferenceSampler: exact, disjoint, order-preserving partition
    inf = InferenceSampler(size=11)
    out["inference_indices"] = [int(i) for i in inf]

    # sharded eval merge: each rank "evaluates" its partition and rank 0
    # merges — union must equal the full set
    preds = [{"image_id": int(i), "score": float(i) / 10} for i in out["inference_indices"]]
    merged = comm.gather(preds, dst=0)
    if comm.is_main_process():
        flat = sorted(p["image_id"] for chunk in merged for p in chunk)
        out["merged_ids"] = flat

    # ---- cross-process SHARDED TRAIN STEP: a 2-process x 2-local-device
    # global data mesh runs ONE pjit'd flagship train step — the
    # DDP-equivalent gradient path across a real process boundary
    # (reference analog: DDP sync in engine/defaults.py:288-291). The
    # pytest side asserts the loss equals a single-process 4-device run.
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(root, "__graft_entry__.py")
    )
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from jtsm_tpu.engine import make_train_step
    from jtsm_tpu.engine.train_loop import TrainState
    from jtsm_tpu.modeling import build_model
    from jtsm_tpu.solver import build_optimizer

    cfg = ge._flagship_cfg(tiny=True)
    model = build_model(cfg)
    n_global = jax.device_count()  # 4 = 2 processes x 2 local
    batch = ge._example_batch(n_global, 128, 128, 4, with_gt=True, mask_crop=28)
    batch_np = {k: np.asarray(v) for k, v in batch.items()}

    # legacy uint32 key: typed PRNG keys cannot cross np.asarray below,
    # and the threefry stream is identical to jax.random.key(0)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "sampling": rng}, batch, train=True)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=rng,
    )

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    # every process holds the SAME seeded host values; lift the local rows
    # to global arrays (state replicated, batch sharded along "data")
    n_local = n_global // num_procs
    lo = pid * n_local
    global_batch = {
        k: multihost_utils.host_local_array_to_global_array(
            v[lo : lo + n_local], mesh, P("data")
        )
        for k, v in batch_np.items()
    }
    state = jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P()
        ),
        state,
    )

    train_step = make_train_step(model, tx)
    with mesh:
        jitted = jax.jit(
            train_step, in_shardings=(repl, data_sh), out_shardings=(repl, repl)
        )
        # AOT-compile BEFORE the cross-process barrier: on a contended host
        # the two workers' local compiles can skew by minutes, and the gloo
        # context rendezvous at first collective EXECUTION times out at 30 s
        compiled = jitted.lower(state, global_batch).compile()
        comm.synchronize()
        new_state, metrics = compiled(state, global_batch)
        jax.block_until_ready(metrics)
    out["train_step_losses"] = {
        k: float(np.asarray(v.addressable_data(0))) for k, v in metrics.items()
    }

    comm.synchronize()
    with open(os.path.join(outdir, f"rank{pid}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
