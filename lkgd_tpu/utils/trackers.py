"""Experiment trackers — the reference's ``--report_to`` adapter surface.

The reference initializes accelerate trackers (wandb/tensorboard) at
`/root/reference/train_models/train_svd_lora.py:1316` (``accelerator.init_trackers``)
and logs scalar dicts per step; CogVideo's trainer does the same
(`CogVideo-main/finetune/trainer.py` ``tracker_name``). Here the JSONL file the Trainer
already writes stays the always-on default (greppable, zero deps), and this module adds
optional mirrors:

  * ``tensorboard`` — torch.utils.tensorboard SummaryWriter (baked into the image)
  * ``wandb``       — gated on the package being installed; offline mode respected

Usage: ``tracker = make_tracker("tensorboard", out_dir)``; pass it to ``Trainer``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional


class NullTracker:
    """JSONL-only (the Trainer writes that itself)."""

    def log(self, record: Dict[str, Any], step: int) -> None:
        pass

    def close(self) -> None:
        pass


class TensorBoardTracker:
    def __init__(self, output_dir: str, run_name: str = "train"):
        from torch.utils.tensorboard import SummaryWriter

        self._writer = SummaryWriter(os.path.join(output_dir, "tb", run_name))

    def log(self, record: Dict[str, Any], step: int) -> None:
        for k, v in record.items():
            if isinstance(v, (int, float)) and k != "step":
                self._writer.add_scalar(k, float(v), global_step=step)

    def close(self) -> None:
        self._writer.flush()
        self._writer.close()


class WandbTracker:
    def __init__(self, output_dir: str, run_name: str = "train",
                 project: Optional[str] = None):
        try:
            import wandb
        except ImportError as e:  # pragma: no cover — wandb not baked into the image
            raise SystemExit(
                "--report-to wandb requires the wandb package (not installed); "
                "use --report-to tensorboard or jsonl") from e
        self._run = wandb.init(project=project or os.environ.get("WANDB_PROJECT", "lkgd_tpu"),
                               name=run_name, dir=output_dir)

    def log(self, record: Dict[str, Any], step: int) -> None:
        self._run.log({k: v for k, v in record.items() if k != "step"}, step=step)

    def close(self) -> None:
        self._run.finish()


def make_tracker(report_to: Optional[str], output_dir: str, run_name: str = "train"):
    """``report_to``: None/"jsonl" -> NullTracker (JSONL stays on regardless),
    "tensorboard" -> TensorBoardTracker, "wandb" -> WandbTracker."""
    if report_to in (None, "", "jsonl", "none"):
        return NullTracker()
    if report_to == "tensorboard":
        return TensorBoardTracker(output_dir, run_name)
    if report_to == "wandb":
        return WandbTracker(output_dir, run_name)
    raise ValueError(f"unknown report_to={report_to!r} (jsonl|tensorboard|wandb)")
