"""Minimal metrics logging and pytree checkpointing.

The reference has neither (SURVEY.md §5): its examples log tqdm strings
and never checkpoint. Here every example trainer writes JSONL metrics and
can checkpoint/restore its (params, opt_state, step) pytree.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Any, Dict, Optional

import jax

__all__ = ["MetricsLogger", "save_checkpoint", "load_checkpoint"]


class MetricsLogger:
    """Append-only JSONL metrics log with wall-clock stamps."""

    def __init__(self, log_dir: str, name: str = "metrics"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._t0 = time.time()

    def log(self, step: int, **metrics) -> None:
        rec = {"step": step, "time_s": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """Pickle a pytree of arrays (device arrays are pulled to host)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_state = jax.device_get(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_state, f)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Optional[Dict[str, Any]]:
    """Load a checkpoint if it exists, else None."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)
