"""Tracker adapters (utils/trackers.py) — the reference ``--report_to`` surface
(train_svd_lora.py:1316 init_trackers): tensorboard events written alongside the
always-on JSONL, and the Trainer routing every logged record through the tracker."""

import glob
import json
import os

import jax
import jax.numpy as jnp
import optax

from lkgd_tpu.training.train_state import TrainState
from lkgd_tpu.training.trainer import Trainer, TrainerConfig
from lkgd_tpu.utils.trackers import NullTracker, TensorBoardTracker, make_tracker


def test_make_tracker_dispatch(tmp_path):
    assert isinstance(make_tracker(None, str(tmp_path)), NullTracker)
    assert isinstance(make_tracker("jsonl", str(tmp_path)), NullTracker)
    assert isinstance(make_tracker("tensorboard", str(tmp_path)), TensorBoardTracker)
    try:
        make_tracker("nope", str(tmp_path))
    except ValueError:
        pass
    else:
        raise AssertionError("unknown tracker name must raise")


def test_tensorboard_tracker_writes_events(tmp_path):
    tr = make_tracker("tensorboard", str(tmp_path), run_name="t")
    tr.log({"step": 1, "train_loss": 0.5, "note": "non-scalar ignored"}, step=1)
    tr.log({"step": 2, "train_loss": 0.25}, step=2)
    tr.close()
    events = glob.glob(os.path.join(str(tmp_path), "tb", "t", "events.*"))
    assert events, "no tensorboard event files written"
    assert os.path.getsize(events[0]) > 0


def test_trainer_routes_records_through_tracker(tmp_path):
    class Capture:
        def __init__(self):
            self.records = []
            self.closed = False

        def log(self, record, step):
            self.records.append((step, dict(record)))

        def close(self):
            self.closed = True

    params = {"w": jnp.zeros((2,))}
    opt = optax.sgd(0.1)
    state = TrainState(jnp.zeros((), jnp.int32), params, opt.init(params), None)

    def step_fn(state, batch, rng):
        return TrainState(state.step + 1, state.params, state.opt_state, None), jnp.float32(0.5)

    cap = Capture()
    tr = Trainer(step_fn, state,
                 TrainerConfig(output_dir=str(tmp_path), max_steps=4, log_every=2,
                               checkpoint_every=0), tracker=cap)
    tr.fit([{} for _ in range(4)])
    steps = [s for s, _ in cap.records]
    assert steps == [2, 4], steps
    assert all("train_loss" in r for _, r in cap.records)
    assert cap.closed
    # JSONL stays on regardless of the tracker
    with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert [l["step"] for l in lines] == [2, 4]
