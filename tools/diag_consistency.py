"""Diagnose compiled-vs-interpret hit flips in check_tpu_consistency.

For every lane where the compiled TPU sweep and the CPU interpret sweep
disagree on `hit`, intersect the ray against ALL triangles in exact
float64 and report the lane's margin to the accept boundary:

    margin = min over accepting-ish triangles of
             min(u, v, 1-u-v, (t_max - t)/t_max, t)

A tiny margin (~1e-3 or below at bf16-split precision) means the lane is
genuinely borderline -- a grazing edge hit or a t right at the distance
cap -- and the flip is MXU-vs-CPU rounding, not a traversal bug. A large
margin would indicate a real compiled-path defect (e.g. a pair dropped by
the cull or the input_output_aliases carry).

Run on the TPU:  python tools/diag_consistency.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/hikari_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")
from hikari_tpu.geometry import wavefront as wf  # noqa: E402
from tools.check_tpu_consistency import random_tris  # noqa: E402


def exact_margins(o, d, t_max, p0, p1, p2, scene_diag=1.0):
    """float64 Moller-Trumbore over all tris; per-triangle boundary margin.

    For distance-capped rays the margin includes the distance to both t
    boundaries normalized by t_max. For unbounded rays (t_max = inf) there
    is no far boundary; using tm=1e30 would collapse t/tm to ~1e-30 for
    every triangle and make all margins read as borderline (ADVICE r2), so
    positivity is normalized by the scene diameter instead.
    """
    o = o.astype(np.float64)
    d = d.astype(np.float64)
    e1 = (p1 - p0).astype(np.float64)
    e2 = (p2 - p0).astype(np.float64)
    n = np.cross(e1, e2)
    den = d @ n.T                                    # (T,)
    num = -((o[None, :] - p0.astype(np.float64)) * n).sum(-1)
    safe = np.where(np.abs(den) < 1e-30, 1e-30, den)
    t = num / safe
    p = o[None, :] + t[:, None] * d[None, :]
    q = p - p0.astype(np.float64)
    d00 = (e1 * e1).sum(-1)
    d01 = (e1 * e2).sum(-1)
    d11 = (e2 * e2).sum(-1)
    d20 = (q * e1).sum(-1)
    d21 = (q * e2).sum(-1)
    dd = d00 * d11 - d01 * d01
    dd = np.where(np.abs(dd) < 1e-30, 1e-30, dd)
    v = (d11 * d20 - d01 * d21) / dd
    w = (d00 * d21 - d01 * d20) / dd
    u = 1.0 - v - w
    # signed margins: positive inside the accept region
    terms = [u, v, w]
    if np.isfinite(t_max):
        tm = max(float(t_max), 1e-30)
        terms += [t / tm, (tm - t) / tm]
    else:
        terms.append(t / max(scene_diag, 1e-30))
    m = np.minimum.reduce(terms)
    return t, m


def main():
    print(jax.devices())
    p0, p1, p2 = random_tris(600, seed=3)
    tl = wf.build_treelets(p0, p1, p2)
    wl = jnp.asarray(p0.min(0))
    wh = jnp.asarray(p0.max(0))

    rng = np.random.RandomState(11)
    r = 4096
    o = (rng.rand(r, 3).astype(np.float32) * 8 - 4)
    d = rng.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.where(rng.rand(r) < 0.3, rng.rand(r) * 3 + 0.05,
                     np.inf).astype(np.float32)
    act = rng.rand(r) > 0.25

    args = (tl, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max), wl, wh)
    actj = jnp.asarray(act)

    cpu = jax.devices("cpu")[0]
    cpu_args = jax.device_put(args, cpu)
    cpu_act = jax.device_put(actj, cpu)
    with jax.default_device(cpu):
        ref = wf.closest_hit_packets(*cpu_args, interpret=True, active=cpu_act)
    ref = jax.tree.map(np.asarray, ref)
    got = wf.closest_hit_packets(*args, interpret=False, active=actj)
    got = jax.tree.map(np.asarray, got)

    verts = np.concatenate([p0, p1, p2], 0)
    scene_diag = float(np.linalg.norm(verts.max(0) - verts.min(0)))

    bad = np.where((ref.hit != got.hit) & act)[0]
    print(f"{len(bad)} hit-flip lanes")
    for i in bad:
        _, m = exact_margins(o[i], d[i], float(t_max[i]), p0, p1, p2,
                             scene_diag)
        # the closest margin among triangles that are anywhere near accepting
        near = m > -1e-2
        best = m[near].max() if near.any() else m.max()
        print(f"lane {i}: interp hit={bool(ref.hit[i])} t={ref.t[i]:.6f} "
              f"compiled hit={bool(got.hit[i])} t={got.t[i]:.6f} "
              f"t_max={t_max[i]:.4f} best_margin={best:+.3e}")

    # lanes where both hit but tri/t differ materially
    both = ref.hit & got.hit & act
    dt = np.abs(ref.t - got.t) / np.maximum(ref.t, 1e-6)
    difft = np.where(both & (dt > 1e-3))[0]
    print(f"{len(difft)} both-hit lanes with t rel-diff > 1e-3")
    for i in difft[:20]:
        print(f"lane {i}: interp t={ref.t[i]:.6f} tri={ref.tri[i]} "
              f"compiled t={got.t[i]:.6f} tri={got.tri[i]}")




def ground_truth_audit():
    """Compare EACH path (compiled TPU, CPU interpret) against exact f64
    Moller-Trumbore over all triangles: counts of missed-solid hits (exact
    margin > tol but path reports miss/farther) and phantom hits (path
    reports a hit where no triangle accepts within tol). Separates a
    traversal/cull defect (both paths wrong the same way) from MXU
    rounding (compiled-only, near-zero margins)."""
    print(jax.devices())
    p0, p1, p2 = random_tris(600, seed=3)
    tl = wf.build_treelets(p0, p1, p2)
    wl = jnp.asarray(p0.min(0))
    wh = jnp.asarray(p0.max(0))

    rng = np.random.RandomState(11)
    r = 4096
    o = (rng.rand(r, 3).astype(np.float32) * 8 - 4)
    d = rng.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.where(rng.rand(r) < 0.3, rng.rand(r) * 3 + 0.05,
                     np.inf).astype(np.float32)
    act = rng.rand(r) > 0.25

    args = (tl, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max), wl, wh)
    actj = jnp.asarray(act)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ref = wf.closest_hit_packets(*jax.device_put(args, cpu),
                                     interpret=True,
                                     active=jax.device_put(actj, cpu))
    ref = jax.tree.map(np.asarray, ref)
    got = wf.closest_hit_packets(*args, interpret=False, active=actj)
    got = jax.tree.map(np.asarray, got)

    verts = np.concatenate([p0, p1, p2], 0)
    scene_diag = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    tol = 2e-3  # solid-hit margin threshold (beyond fp-rounding scale)

    stats = {"interp": [0, 0, 0], "compiled": [0, 0, 0]}
    for i in range(r):
        if not act[i]:
            continue
        t_all, m = exact_margins(o[i], d[i], float(t_max[i]), p0, p1, p2,
                                 scene_diag)
        solid = m > tol
        t_true = t_all[solid].min() if solid.any() else np.inf
        for name, res in (("interp", ref), ("compiled", got)):
            t_got = res.t[i] if res.hit[i] else np.inf
            if np.isfinite(t_true) and t_got > t_true * (1 + 1e-3) + 1e-4:
                stats[name][0] += 1     # missed a solid closer hit
            elif res.hit[i] and not (m > -tol).any():
                stats[name][1] += 1     # phantom hit (no near-accepting tri)
            else:
                stats[name][2] += 1
    for name, (miss, phantom, ok) in stats.items():
        print(f"{name}: missed-solid={miss} phantom={phantom} ok={ok}")


if __name__ == "__main__":
    if sys.argv[-1] == "audit":
        ground_truth_audit()
    else:
        main()
