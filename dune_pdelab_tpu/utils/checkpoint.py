"""Checkpoint / resume of solver and time-stepper state.

The reference has no checkpointing (SURVEY.md section 5: nearest mechanisms
are solution transfer across adaptation / load balancing); since all state
here is flat arrays + scalars, real restart support is cheap: an atomic
.npz container with a manifest, plus sequence management for periodic
checkpoints during time integration.
"""
from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import jax.numpy as jnp


def save_checkpoint(path: str, arrays: dict, meta: dict | None = None):
    """Atomically write arrays (+ JSON-serializable meta) to `path`.npz."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    payload = {k: np.asarray(v) for k, v in arrays.items()}
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load_checkpoint(path: str, dtype=None):
    """Returns (arrays dict of jnp arrays, meta dict)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
        arrays = {k: jnp.asarray(z[k], dtype) for k in z.files
                  if k != "__meta__"}
    return arrays, meta


class CheckpointManager:
    """Numbered checkpoint sequence with retention (orbax-style lite)."""

    def __init__(self, directory: str, prefix: str = "ckpt", keep: int = 3):
        self.dir = directory
        self.prefix = prefix
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.dir, f"{self.prefix}-{step:09d}.npz")

    def save(self, step: int, arrays: dict, meta: dict | None = None):
        meta = dict(meta or {})
        meta["step"] = step
        save_checkpoint(self._path(step), arrays, meta)
        self._prune()
        return self._path(step)

    def steps(self):
        out = []
        for f in os.listdir(self.dir):
            if f.startswith(self.prefix + "-") and f.endswith(".npz"):
                try:
                    out.append(int(f[len(self.prefix) + 1:-4]))
                except ValueError:
                    pass
        return sorted(out)

    def latest_step(self):
        s = self.steps()
        return s[-1] if s else None

    def restore(self, step: int | None = None, dtype=None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        return load_checkpoint(self._path(step), dtype)

    def _prune(self):
        s = self.steps()
        for old in s[: max(0, len(s) - self.keep)]:
            os.unlink(self._path(old))
