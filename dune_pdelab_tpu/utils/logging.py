"""Verbosity-tagged logging with process/host tags.

Reference analog: dune/pdelab/common/logtag.hh:62-172 (rank/host log
prefixes) + the rank-0-gated verbosity printing used across drivers
(e.g. instationary/implicitonestep.hh:79-81).
"""
from __future__ import annotations

import socket
import sys
import time


class Logger:
    """Leveled logger; messages at level > verbosity are dropped. In
    multi-process setups only process 0 prints unless all_ranks=True."""

    def __init__(self, verbosity: int = 1, tag: str | None = None,
                 stream=None, all_ranks: bool = False):
        self.verbosity = verbosity
        self.stream = stream or sys.stdout
        self.all_ranks = all_ranks
        self._t0 = time.perf_counter()
        if tag is None:
            try:
                import jax
                pid = jax.process_index()
            except Exception:
                pid = 0
            tag = f"{socket.gethostname()}:{pid}"
        self.tag = tag

    def _enabled(self, level: int) -> bool:
        if level > self.verbosity:
            return False
        if not self.all_ranks:
            try:
                import jax
                if jax.process_index() != 0:
                    return False
            except Exception:
                pass
        return True

    def log(self, level: int, msg: str):
        if self._enabled(level):
            dt = time.perf_counter() - self._t0
            self.stream.write(f"[{self.tag} {dt:9.3f}s] {msg}\n")

    def info(self, msg: str):
        self.log(1, msg)

    def detail(self, msg: str):
        self.log(2, msg)

    def debug(self, msg: str):
        self.log(3, msg)

    def phase(self, name: str, level: int = 1):
        """Context manager timing a named phase (Dune::Timer span analog)."""
        logger = self

        class _Phase:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                logger.log(level,
                           f"{name}: {time.perf_counter() - self.t0:.3f}s")

        return _Phase()
