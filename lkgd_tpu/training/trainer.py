"""Generic training loop: checkpointing, resume, EMA, logging, validation hooks.

The TPU-native replacement for the reference's accelerate/DeepSpeed trainer skeleton
(`/root/reference/train_models/train_svd_lora.py:957-1873` and
`CogVideo-main/finetune/trainer.py:91-816`):

  * one donated jitted train step (gradients all-reduce over the mesh's data axis)
  * orbax checkpointing with rotation + resume (reference save_state per N steps with
    checkpoints_total_limit, :1700-1748; CogVideo utils/checkpointing.py:15-43)
  * optional ZeRO-style sharding of optimizer state along the data axis
    (DeepSpeed zero2.yaml analog)
  * adapter/trainable-subset export in diffusers safetensors layout for interop
    (reference exports per-adapter safetensors, :1736-1747)
  * scalar metrics to a JSONL log (wandb/tensorboard stand-in; reference :1316,1696)
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lkgd_tpu.training.train_state import TrainState


@dataclasses.dataclass
class TrainerConfig:
    output_dir: str = "output"
    max_steps: int = 1000
    checkpoint_every: int = 500
    checkpoints_total_limit: Optional[int] = 3
    validation_every: Optional[int] = None
    log_every: int = 10
    seed: int = 42


def zero_shardings(mesh, state: TrainState, axis: str = "data"):
    """TrainState-shaped NamedSharding tree for pjit-native ZeRO (the DeepSpeed
    zero2.yaml analog, reference `CogVideo-main/finetune/configs/zero2.yaml:23-31`):
    params/EMA replicated, optimizer moments sharded over ``axis`` on their leading dim
    (non-divisible / scalar leaves stay replicated).

    With the batch sharded over ``axis`` and the moments pinned via ``out_shardings``,
    XLA's SPMD partitioner lowers the gradient all-reduce feeding the sharded Adam
    update into reduce-scatter + sharded elementwise + all-gather of the updates —
    the ZeRO-2 communication schedule, derived by the compiler instead of hand-written
    NCCL hooks."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape.get(axis, 1)
    rep = NamedSharding(mesh, P())

    def moment(x):
        if not hasattr(x, "shape") or getattr(x, "ndim", 0) < 1:
            return rep
        # shard the first evenly-divisible dim — conv kernels are HWIO (leading dims 3),
        # so a leading-dim-only rule would leave most of the moment bytes replicated
        for d, size in enumerate(x.shape):
            if size > 1 and size % n == 0:
                return NamedSharding(mesh, P(*([None] * d + [axis])))
        return rep

    return TrainState(
        step=rep,
        params=jax.tree.map(lambda _: rep, state.params),
        opt_state=jax.tree.map(moment, state.opt_state),
        ema_params=(None if state.ema_params is None
                    else jax.tree.map(lambda _: rep, state.ema_params)),
    )


def make_zero_train_step(train_step: Callable, mesh, state: TrainState,
                         axis: str = "data"):
    """Jit ``train_step`` with ZeRO out_shardings pinned and return
    ``(jitted_step, sharded_state)``. The returned state is device_put with the same
    shardings, so moments are sharded from step 0 and STAY sharded across updates
    (out_shardings forbids XLA from re-replicating them)."""
    sh = zero_shardings(mesh, state, axis)
    step = jax.jit(train_step, donate_argnums=(0,), out_shardings=(sh, None))
    return step, jax.device_put(state, sh)


def zero_shard_opt_state(mesh, opt_state, axis: str = "data"):
    """Shard optimizer-state leaves along the mesh data axis when divisible.
    Prefer make_zero_train_step, which also pins the jitted step's out_shardings."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape.get(axis, 1)

    def shard_leaf(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 1:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(shard_leaf, opt_state)


class Trainer:
    def __init__(self, train_step: Callable, state: TrainState, config: TrainerConfig,
                 rng: Optional[jax.Array] = None,
                 validation_fn: Optional[Callable[[TrainState, int], Dict[str, Any]]] = None,
                 jit_step: bool = True, tracker=None):
        """``jit_step=False``: the step is already jitted (or composes separately-jitted
        stages). Composed steps that close over frozen encoder params MUST use this —
        re-jitting the composition inlines those params as captured constants (GBs of
        jaxpr constants; see the params-as-args rule in cli/train_svd_lora.preprocess).

        ``tracker``: optional utils.trackers adapter (tensorboard/wandb — the reference's
        ``--report_to`` surface, train_svd_lora.py:1316); JSONL logging stays on always."""
        self.train_step = jax.jit(train_step, donate_argnums=(0,)) if jit_step else train_step
        self.state = state
        self.config = config
        self.rng = rng if rng is not None else jax.random.PRNGKey(config.seed)
        self.validation_fn = validation_fn
        self.tracker = tracker
        os.makedirs(config.output_dir, exist_ok=True)
        self._metrics_path = os.path.join(config.output_dir, "metrics.jsonl")
        self._ckpt_mgr = None

    # ---------------------------------------------------------------- checkpointing
    def _manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(os.path.join(self.config.output_dir, "checkpoints")),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.config.checkpoints_total_limit,
                    create=True,
                ),
            )
        return self._ckpt_mgr

    def save_checkpoint(self, step: int) -> None:
        import orbax.checkpoint as ocp

        mgr = self._manager()
        mgr.save(step, args=ocp.args.StandardSave(self.state))
        mgr.wait_until_finished()

    def restore_latest(self) -> int:
        """Resume from the newest checkpoint (reference --resume_from_checkpoint latest,
        :1364-1387). Returns the restored step (0 if none)."""
        mgr = self._manager()
        step = mgr.latest_step()
        if step is None:
            return 0
        self.state = mgr.restore(step, args=__import__("orbax.checkpoint", fromlist=["args"])
                                 .args.StandardRestore(self.state))
        return int(step)

    # ---------------------------------------------------------------- logging
    def _log(self, record: Dict[str, Any]) -> None:
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.tracker is not None:
            self.tracker.log(record, step=int(record.get("step", 0)))

    # ---------------------------------------------------------------- loop
    def fit(self, data: Iterable) -> TrainState:
        cfg = self.config
        start_step = int(self.state.step)
        t0 = time.time()
        losses = []
        for batch in data:
            step = int(self.state.step)
            if step >= cfg.max_steps:
                break
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, loss = self.train_step(self.state, batch, step_rng)
            losses.append(loss)
            step += 1
            if step % cfg.log_every == 0:
                loss_val = float(jnp.mean(jnp.stack([jnp.asarray(l) for l in losses])))
                losses.clear()
                dt = time.time() - t0
                t0 = time.time()
                self._log({"step": step, "train_loss": loss_val,
                           "steps_per_sec": cfg.log_every / max(dt, 1e-9)})
            if cfg.checkpoint_every and step % cfg.checkpoint_every == 0:
                self.save_checkpoint(step)
            if (self.validation_fn is not None and cfg.validation_every
                    and step % cfg.validation_every == 0):
                metrics = self.validation_fn(self.state, step) or {}
                self._log({"step": step, **{f"val_{k}": v for k, v in metrics.items()}})
        if int(self.state.step) > start_step:
            self.save_checkpoint(int(self.state.step))
        if self.tracker is not None:
            self.tracker.close()
        return self.state


def export_trainable_safetensors(params, predicate: Callable[[str], bool], path: str,
                                 key_map: Optional[Callable[[str], str]] = None) -> int:
    """Export the trainable subset (LoRA / quaternion / joint) as a diffusers-layout
    safetensors file (reference model.safetensors + per-adapter exports,
    train_svd_lora.py:1736-1747, loaded back at utils/util.py:585-593)."""
    from safetensors.numpy import save_file

    from lkgd_tpu.utils.porting import export_state_dict

    sd = export_state_dict(params, key_map=key_map, path_predicate=predicate)
    sd = {k: np.ascontiguousarray(np.asarray(v)) for k, v in sd.items()}
    save_file(sd, path)
    return len(sd)
