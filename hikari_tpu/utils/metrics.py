"""Render observability: per-sample throughput + progress reporting.

The reference has no structured metrics (SURVEY.md section 5.1/5.5 — only
@time in examples and ProgressMeter in SPPM); this module adds the per-stage
ray counters and Mray/s reporting the TPU build uses for tuning.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field


@dataclass
class RenderMeter:
    """Accumulates per-sample wall clock + traced-ray counts."""

    samples: int = 0
    rays: float = 0.0
    seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def lap(self, rays_traced: float) -> dict:
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        self.samples += 1
        self.rays += float(rays_traced)
        self.seconds += dt
        return {
            "sample": self.samples,
            "sec": round(dt, 3),
            "mray_s": round(float(rays_traced) / max(dt, 1e-9) / 1e6, 3),
        }

    @property
    def mray_s(self) -> float:
        return self.rays / max(self.seconds, 1e-9) / 1e6

    def summary(self) -> dict:
        return {
            "samples": self.samples,
            "total_rays": int(self.rays),
            "seconds": round(self.seconds, 2),
            "mray_s": round(self.mray_s, 3),
        }

    def report(self) -> str:
        return json.dumps(self.summary())


def time_device_fn(fn, *args, iters: int = 5):
    """Honest TPU timing of a jittable fn: every output is reduced to one
    scalar on device and synced once after `iters` dispatches.

    Through the axon tunnel, `block_until_ready` can return before
    execution finishes and each host sync costs ~25 ms, so per-leaf or
    per-iteration syncing distorts measurements by 10-100x."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    g = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(lambda x: jnp.sum(x).astype(jnp.float32), fn(*a)),
    ))
    float(np.asarray(g(*args)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g(*args)
    float(np.asarray(r))
    return (time.perf_counter() - t0) / iters
