"""Small shared utilities: dtype policy, timers, integer helpers.

TPU-native replacement for dune-pdelab/dune/pdelab/common/{clock.hh,
benchmarkhelper.hh} (reference: common/clock.hh:17, common/benchmarkhelper.hh:51).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax.numpy as jnp

# Index dtype for all DOF / element index maps. int32 is enough for
# < 2.1e9 DOFs per shard and is the fast path on TPU.
INDEX_DTYPE = jnp.int32


def default_float():
    """Framework default real dtype.

    float64 when jax_enable_x64 is on (the fp64 parity mode used by tests),
    float32 otherwise (the TPU performance mode).
    """
    import jax

    return jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 \
        else jnp.dtype(jnp.float32)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class Timer:
    """Wall-clock span timer (Dune::Timer analog, common/clock.hh)."""

    _start: float = field(default_factory=time.perf_counter)

    def reset(self) -> None:
        self._start = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._start


@dataclass
class TimingReport:
    """Named start/stop timings with per-name accumulation.

    Analog of BenchmarkHelper (common/benchmarkhelper.hh:51-120): named
    phases, per-run statistics.
    """

    timings: dict = field(default_factory=dict)
    _open: dict = field(default_factory=dict)

    def start(self, name: str) -> None:
        self._open[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._open.pop(name)
        self.timings.setdefault(name, []).append(dt)
        return dt

    def total(self, name: str) -> float:
        return sum(self.timings.get(name, ()))

    def summary(self) -> dict:
        return {
            k: {"n": len(v), "total": sum(v), "min": min(v), "max": max(v)}
            for k, v in self.timings.items()
        }
