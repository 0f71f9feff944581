"""TrainerBase + the jit-compiled simple trainer.

Reference: detectron2/engine/train_loop.py:78 (``TrainerBase`` hook
orchestration), :171 (``SimpleTrainer``), :289 (``AMPTrainer``).

TPU re-design: ``run_step`` is ONE jitted function (forward+backward+
all-reduce+update, see train_loop.make_train_step) executed over the device
mesh; AMP needs no GradScaler (bf16 keeps fp32 range). Metrics come back as
device scalars and are logged asynchronously.
"""

from __future__ import annotations

import logging
import math
import time
import weakref
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from ..utils.events import EventStorage
from .hooks import HookBase
from .train_loop import TrainState, make_train_step

logger = logging.getLogger(__name__)


class TrainerBase:
    def __init__(self):
        self._hooks: List[HookBase] = []
        self.iter: int = 0
        self.start_iter: int = 0
        self.max_iter: int = 0
        self.storage: Optional[EventStorage] = None

    def register_hooks(self, hooks) -> None:
        hooks = [h for h in hooks if h is not None]
        for h in hooks:
            assert isinstance(h, HookBase)
            h.trainer = weakref.proxy(self)
        self._hooks.extend(hooks)

    def train(self, start_iter: int, max_iter: int) -> None:
        logger.info(f"Starting training from iteration {start_iter}")
        self.iter = self.start_iter = start_iter
        self.max_iter = max_iter
        with EventStorage(start_iter) as self.storage:
            try:
                self.before_train()
                for self.iter in range(start_iter, max_iter):
                    self.before_step()
                    self.run_step()
                    self.after_step()
                self.iter += 1
            except Exception:
                logger.exception("Exception during training:")
                raise
            finally:
                self.after_train()

    def before_train(self):
        for h in self._hooks:
            h.before_train()

    def after_train(self):
        if self.storage is not None:
            self.storage.iter = self.iter
        for h in self._hooks:
            h.after_train()

    def before_step(self):
        if self.storage is not None:
            self.storage.iter = self.iter
        for h in self._hooks:
            h.before_step()

    def after_step(self):
        for h in self._hooks:
            h.after_step()

    def run_step(self):
        raise NotImplementedError


class SimpleTrainer(TrainerBase):
    """Drives the jitted train step over a data loader."""

    def __init__(self, model, data_loader, tx, state: TrainState, mesh=None, fsdp=False):
        super().__init__()
        self.model = model
        self.data_loader = data_loader
        self._data_loader_iter = iter(data_loader)
        self.tx = tx
        self.state = state
        self.mesh = mesh

        step = make_train_step(model, tx)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            if fsdp:
                # FSDP / ZeRO-3: big params and optimizer buffers sharded
                # over the data axis; XLA all-gathers at use sites and
                # reduce-scatters grads (SURVEY.md §2.4 stretch goal)
                from ..parallel.mesh import fsdp_shardings

                state_sh = fsdp_shardings(state, mesh)
                self.state = jax.device_put(state, state_sh)
            else:
                state_sh = repl
            self._train_step = jax.jit(
                step,
                in_shardings=(state_sh, data),
                out_shardings=(state_sh, repl),
                donate_argnums=(0,),  # old state buffers are reused in place
            )
        else:
            self._train_step = jax.jit(step, donate_argnums=(0,))
        self._pending_metrics = None
        # optional host-side hook: batch_transform(state, batch, iteration)
        # -> batch, applied before the jitted step (e.g. the WSL trainer
        # injects CPG maps for the CSC-family heads)
        self.batch_transform = None

    def run_step(self):
        start = time.perf_counter()
        batch = next(self._data_loader_iter)
        batch = {k: v for k, v in batch.items() if k != "image_ids"}
        if self.batch_transform is not None:
            batch = self.batch_transform(self.state, batch, self.iter)
        data_time = time.perf_counter() - start

        if self.mesh is not None:
            from ..parallel import shard_batch_pytree

            batch = shard_batch_pytree(batch, self.mesh)

        self.state, metrics = self._train_step(self.state, batch)
        self.last_batch = batch  # exposed for TrainingVisualizationHook
        self._write_metrics(metrics, data_time)

    def _write_metrics(self, metrics: Dict[str, Any], data_time: float):
        # log the PREVIOUS step's metrics (already materialized) to avoid a
        # device sync on the fresh ones — the reference logs synchronously,
        # which would stall the TPU pipeline.
        if self.storage is not None:
            self.storage.put_scalar("data_time", data_time)
            pending = self._pending_metrics
            if pending is not None:
                total = 0.0
                for k, v in pending.items():
                    v = float(v)
                    self.storage.put_scalar(k, v)
                    if k.startswith("loss"):
                        total += v
                # loss-finiteness guard (reference train_loop.py:278-282):
                # fail loudly instead of training on garbage
                if not math.isfinite(total):
                    raise FloatingPointError(
                        f"Loss became infinite or NaN at iteration={self.iter - 1}!\n"
                        f"loss_dict = {{ {', '.join(f'{k}: {float(v)}' for k, v in pending.items())} }}"
                    )
        self._pending_metrics = metrics

    def sync_checkpointer(self):
        """Expose the live state to the checkpointer before periodic saves.
        Optimizer state (momentum + schedule counters) and the sampling rng
        ride along as checkpointables so a resumed run continues the exact
        trajectory (reference saves optimizer/scheduler the same way)."""
        if hasattr(self, "checkpointer"):
            self.checkpointer.variables = self.state_variables()
            self.checkpointer.checkpointables["opt_state"] = self.state.opt_state
            self.checkpointer.checkpointables["rng"] = jax.random.key_data(
                self.state.rng
            )

    def update_precise_bn(self, num_iter: int = 200):
        """Recompute population BN statistics over ``num_iter`` batches
        (reference hooks.py:367 PreciseBN) — only meaningful when the model
        has a batch_stats collection."""
        if not jax.tree_util.tree_leaves(self.state.batch_stats):
            return
        import jax.numpy as jnp

        sums = jax.tree_util.tree_map(jnp.zeros_like, self.state.batch_stats)
        rng = self.state.rng

        @jax.jit
        def stats_step(params, frozen, batch_stats, batch, key):
            variables = {"params": params, "batch_stats": batch_stats}
            if jax.tree_util.tree_leaves(frozen):
                variables["frozen"] = frozen
            _, mutated = self.model.apply(
                variables,
                batch,
                train=True,
                rngs={"sampling": key, "dropout": key},
                mutable=["batch_stats"],
            )
            return mutated["batch_stats"]

        count = 0
        for _ in range(num_iter):
            batch = {
                k: v for k, v in next(self._data_loader_iter).items() if k != "image_ids"
            }
            rng, key = jax.random.split(rng)
            new_stats = stats_step(
                self.state.params, self.state.frozen, self.state.batch_stats, batch, key
            )
            sums = jax.tree_util.tree_map(lambda a, b: a + b, sums, new_stats)
            count += 1
        mean_stats = jax.tree_util.tree_map(lambda a: a / max(count, 1), sums)
        self.state = self.state.replace(batch_stats=mean_stats, rng=rng)

    def state_variables(self) -> Dict:
        out = {"params": self.state.params}
        if jax.tree_util.tree_leaves(self.state.frozen):
            out["frozen"] = self.state.frozen
        if jax.tree_util.tree_leaves(self.state.batch_stats):
            out["batch_stats"] = self.state.batch_stats
        return out
