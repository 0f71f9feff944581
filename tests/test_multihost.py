"""Multi-host (process_count > 1) integration: a REAL 2-process
``jax.distributed`` CPU run (subprocess-spawned, local coordinator) drives
the world>1 branches of ``jtsm_tpu.utils.comm`` (all_gather / gather /
synchronize / shared_random_seed / reduce_dict), TrainingSampler rank
sharding, InferenceSampler's exact partition, and a 2-process eval merge
that must equal the 1-process result.

Reference tier: dev/run_inference_tests.sh:19 runs its CI at --num-gpus 2.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def ranks(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mh"))
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid), outdir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    # the cross-process train-step compile dominates; generous on a
    # contended 1-core host
    outs = [p.communicate(timeout=2400)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    results = []
    for pid in range(2):
        with open(os.path.join(outdir, f"rank{pid}.json")) as f:
            results.append(json.load(f))
    return results


def test_world_and_ranks(ranks):
    assert [r["world"] for r in ranks] == [2, 2]
    assert sorted(r["rank"] for r in ranks) == [0, 1]


def test_object_all_gather(ranks):
    for r in ranks:
        assert r["all_gather"] == [0, 1]
        # size-varying pickled payloads survive the padded uint8 transport
        assert r["all_gather_blob_lens"] == [10, 110]


def test_gather_to_dst(ranks):
    by_rank = {r["rank"]: r for r in ranks}
    assert by_rank[0]["gather_dst0"] == [0, 1]
    assert by_rank[1]["gather_dst0"] is None  # non-dst ranks get []


def test_shared_seed_and_reduce(ranks):
    for r in ranks:
        assert r["shared_seed_equal"] is True
        assert r["reduce_dict"] == {"loss": 1.5}  # mean of 1.0, 2.0


def test_training_sampler_rank_sharding(ranks):
    by_rank = {r["rank"]: r for r in ranks}
    a = by_rank[0]["training_indices"]
    b = by_rank[1]["training_indices"]
    # both ranks see the same seeded shuffled stream, strided by rank:
    # interleaving them reconstructs the full stream (each epoch a
    # permutation of range(12))
    stream = [x for pair in zip(a, b) for x in pair]
    assert sorted(stream[:12]) == list(range(12))
    assert sorted(stream[12:24]) == list(range(12))
    assert a != b


def test_inference_sampler_exact_partition(ranks):
    by_rank = {r["rank"]: r for r in ranks}
    a = by_rank[0]["inference_indices"]
    b = by_rank[1]["inference_indices"]
    assert a == list(range(0, 6)) and b == list(range(6, 11))


def test_two_process_eval_merge_equals_single(ranks):
    by_rank = {r["rank"]: r for r in ranks}
    assert by_rank[0]["merged_ids"] == list(range(11))
    assert "merged_ids" not in by_rank[1]


def test_cross_process_sharded_train_step(ranks):
    """ONE pjit'd flagship train step over a 2-process x 2-local-device
    global data mesh (the DDP-equivalent gradient path across a real
    process boundary — reference engine/defaults.py:288-291): both ranks
    must report the identical replicated loss dict, and it must match a
    single-process 4-device run of the same seeded step."""
    import importlib.util

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    by_rank = {r["rank"]: r for r in ranks}
    l0, l1 = by_rank[0]["train_step_losses"], by_rank[1]["train_step_losses"]
    assert set(l0) == set(l1) and len(l0) >= 5, sorted(l0)
    for k in l0:
        assert abs(l0[k] - l1[k]) < 1e-6, (k, l0[k], l1[k])

    # single-process 4-device reference run (same helpers, same seeds)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(root, "__graft_entry__.py")
    )
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)

    from jtsm_tpu.engine import make_train_step
    from jtsm_tpu.engine.train_loop import TrainState
    from jtsm_tpu.modeling import build_model
    from jtsm_tpu.solver import build_optimizer

    cfg = ge._flagship_cfg(tiny=True)
    model = build_model(cfg)
    batch = ge._example_batch(4, 128, 128, 4, with_gt=True, mask_crop=28)
    rng = jax.random.key(0)
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
    mesh = Mesh(np.asarray(jax.devices("cpu")[:4]), ("data",))
    repl = NamedSharding(mesh, P())
    with mesh:
        jitted = jax.jit(
            make_train_step(model, tx),
            in_shardings=(repl, NamedSharding(mesh, P("data"))),
            out_shardings=(repl, repl),
        )
        _, metrics = jitted(state, batch)
        jax.block_until_ready(metrics)
    single = {k: float(v) for k, v in metrics.items()}
    assert set(single) == set(l0)
    for k in single:
        ref = single[k]
        # cross-process collectives may reassociate float reductions
        assert abs(l0[k] - ref) < max(1e-5, 1e-5 * abs(ref)), (k, l0[k], ref)
