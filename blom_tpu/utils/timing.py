"""Named hierarchical wall-clock timers.

TPU-native counterpart of the reference timing system
(/root/reference/phy/mod_timing.F90:39-494): named timer groups with
accumulated totals and per-interval statistics.  Device work is
asynchronous under JAX, so `stop` optionally blocks on a pytree to
charge the elapsed device time to the right phase; for kernel-level
attribution use `jax.profiler` traces (the reference's per-rank
min/mean/max reduction corresponds to profiling each host).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax


class Timers:
    """timer_init/start/stop/statistics (mod_timing.F90:107-326)."""

    def __init__(self):
        self.total: Dict[str, float] = {}
        self.count: Dict[str, int] = {}
        self.min: Dict[str, float] = {}
        self.max: Dict[str, float] = {}
        self._t0: Dict[str, float] = {}

    def start(self, name: str):
        self._t0[name] = time.perf_counter()

    def stop(self, name: str, block_on=None) -> float:
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._t0.pop(name)
        self.total[name] = self.total.get(name, 0.) + dt
        self.count[name] = self.count.get(name, 0) + 1
        self.min[name] = min(self.min.get(name, dt), dt)
        self.max[name] = max(self.max.get(name, dt), dt)
        return dt

    def statistics(self) -> str:
        """Per-timer total/mean/min/max report
        (timer_statistics, mod_timing.F90:329-494)."""
        lines = [f'{"timer":<24}{"count":>8}{"total[s]":>12}'
                 f'{"mean[s]":>12}{"min[s]":>12}{"max[s]":>12}']
        for name in sorted(self.total):
            n = self.count[name]
            tot = self.total[name]
            lines.append(f'{name:<24}{n:>8}{tot:>12.4f}'
                         f'{tot / n:>12.4f}{self.min[name]:>12.4f}'
                         f'{self.max[name]:>12.4f}')
        return '\n'.join(lines)

    def step_line(self, nstep: int, name: str = 'step') -> str:
        """The reference's per-step wall-time print
        (mod_blom_step.F90:311-313)."""
        return (f' {self.total.get(name, 0.) / max(self.count.get(name, 1), 1):9.4f}'
                f' sec for step {nstep}')
