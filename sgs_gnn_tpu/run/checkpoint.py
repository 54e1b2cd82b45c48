"""Checkpoint / resume.

The reference persists only the best-val `state_dict` + its temperature
(reference main.py:227-235) and loses in-progress runs on a crash. Here the
full training state (params, all three Adam group states, epoch, best-val
bookkeeping, temperature) round-trips through a single msgpack blob (flax
serialization), with optional orbax integration for async checkpointing of
long runs — the standard JAX persistence stack.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Any, Optional

from flax import serialization


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    epoch: int = 0
    best_val_f1: float = 0.0
    test_at_best_val: float = 0.0
    best_temperature: float = 0.0
    losses: list = field(default_factory=list)
    # serialized best-val params (flax bytes). Without this a resumed run
    # that never beats the restored best_val_f1 would report the final
    # "loaded best model" eval on the LAST-checkpoint params while claiming
    # reference best-val semantics (main.py:227-235 persists the best model).
    best_params_bytes: Optional[bytes] = None


def save_checkpoint(path: str, state: TrainState) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": serialization.to_bytes(state.params),
        "opt_state": serialization.to_bytes(state.opt_state),
        "epoch": state.epoch,
        "best_val_f1": state.best_val_f1,
        "test_at_best_val": state.test_at_best_val,
        "best_temperature": state.best_temperature,
        "losses": list(state.losses),
        "best_params_bytes": state.best_params_bytes,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)  # atomic: a crash never corrupts the checkpoint
    return path


def load_checkpoint(path: str, params_template, opt_state_template
                    ) -> Optional[TrainState]:
    """Restore into the given pytree templates; None if no checkpoint."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return TrainState(
        params=serialization.from_bytes(params_template, payload["params"]),
        opt_state=serialization.from_bytes(opt_state_template,
                                           payload["opt_state"]),
        epoch=int(payload["epoch"]),
        best_val_f1=float(payload["best_val_f1"]),
        test_at_best_val=float(payload["test_at_best_val"]),
        best_temperature=float(payload["best_temperature"]),
        losses=list(payload["losses"]),
        # absent in pre-r5 checkpoints -> None (caller falls back to the
        # restored last-checkpoint params, the old behavior)
        best_params_bytes=payload.get("best_params_bytes"),
    )


def save_checkpoint_orbax(directory: str, step: int, state: TrainState):
    """Orbax-backed checkpoint (async-capable) for long multi-host runs."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr.save(path, {"params": state.params, "opt_state": state.opt_state},
               force=True)
    ckptr.wait_until_finished()
    meta = {"epoch": state.epoch, "best_val_f1": state.best_val_f1,
            "test_at_best_val": state.test_at_best_val,
            "best_temperature": state.best_temperature,
            "losses": state.losses}
    with open(os.path.join(path, "meta.pkl"), "wb") as f:
        pickle.dump(meta, f)
    return path
