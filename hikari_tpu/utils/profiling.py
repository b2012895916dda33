"""Profiling helpers (SURVEY.md section 5.1: the reference ships no
profiler; the TPU build uses jax.profiler traces + per-stage wall clock).

All timing uses the one-scalar sync pattern: remote device plugins can
return from block_until_ready at dispatch time, so every measurement
reduces its outputs to one scalar and materializes it once.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto:

        with profiling.trace("/tmp/trace"):
            film = hk.render(vp, scene, cam)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 4, reps: int = 3):
    """Median seconds per call of a jittable fn over `iters` chained
    dispatches x `reps` repetitions (one device sync per repetition)."""
    f = jax.jit(fn)
    r = f(*args)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0].sum()))  # warm + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            r = f(*args)
            s = jax.tree_util.tree_leaves(r)[0].sum().astype(jnp.float32)
            acc = s if acc is None else acc + s
        float(np.asarray(acc))
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[len(ts) // 2]


def stage_timings(scene, camera, vp=None, filt=None):
    """Per-stage wall clock for a scene: full step, traversal-only closest
    and any-hit sweeps at primary scale. Returns a dict of seconds."""
    from ..camera.camera import CameraSample
    from ..film.filters import make_filter
    from ..integrators.volpath import VolPath, render_lanes, scene_any_hit, scene_closest_hit

    if vp is None:
        vp = VolPath(max_depth=5, samples_per_pixel=16)
    if filt is None:
        filt = make_filter()
    w, h = camera.resolution
    n = w * h
    lanes = jnp.arange(n, dtype=jnp.uint32)
    px = lanes % w
    py = lanes // w
    p_film = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + 0.5
    o, d = camera.generate_rays(CameraSample(
        p_film=p_film, lens=jnp.zeros((n, 2)), time=jnp.zeros((n,)),
        filter_weight=jnp.ones((n,))))
    t_max = jnp.full((n,), 3.0e37)

    out = {}
    out["step"] = time_fn(
        lambda si: render_lanes(vp, scene, camera, filt, si, px, py)[0],
        jnp.uint32(1))
    out["closest_primary"] = time_fn(
        lambda o, d, t: scene_closest_hit(scene, o, d, t).t, o, d, t_max)
    out["anyhit_primary"] = time_fn(
        lambda o, d, t: scene_any_hit(scene, o, d, t), o, d,
        jnp.full((n,), 4.0))
    return out
