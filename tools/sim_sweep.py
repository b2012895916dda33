#!/usr/bin/env python
"""CPU-side sweep-cost simulator: estimates the pairs each ray tile will
ACTUALLY sweep under the tile-resident kernel's front-to-back early-out,
not just the pairs the cull pass lists.

The tile kernel (wavefront._closest_tiles_kernel) processes a tile's pair
list in conservative-entry order and BREAKS at the first pair whose entry
distance exceeds the tile's worst unresolved best-t. Listed-pair counts
(tools/prof_paircount.py) ignore that break, so they mispredict kernel
cost whenever early-out bites. This simulator replays the break logic per
tile using the exact per-lane first-hit distances from the skip-link
reference walk:

  - lane j's best-t starts at its world-exit-clamped t_max and drops to
    its true hit t once the pair containing its winning treelet is
    processed (intermediate partial hits are ignored, which makes the
    estimate an UPPER bound on swept pairs);
  - the tile's threshold is max over lanes of best-t; sweeping stops at
    the first pair with t_near > threshold.

Config via env (all read at import by wavefront): HIKARI_TREELET,
HIKARI_RAY_TILE, HIKARI_TREELET_MODE, plus BENCH_SCENE / SIM_DEPTH here.
Prints one summary line per sweep stage so configs can be diffed:

  swept/listed pairs, swept fraction, est. sweep share by stage.

Run with JAX_PLATFORMS=cpu on an idle host; ~1-2 min for the mesh scene.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def lane_winner_treelet(scene, tri):
    """Map leaf-order face index -> treelet id for the scene's layout."""
    base = np.asarray(scene.treelets.tri[:, 9].reshape(
        -1, int(os.environ.get("HIKARI_TREELET", "256"))))
    # tri rows carry the face id per slot; build face -> treelet
    from hikari_tpu.geometry import wavefront as wf

    faces = np.asarray(scene.treelets.tri[:, 9]).astype(np.int64)
    t_of_face = np.full(int(scene.n_faces), -1, np.int64)
    slots = np.arange(len(faces))
    ok = faces >= 0
    t_of_face[faces[ok]] = slots[ok] // wf.TREELET
    out = np.full(len(tri), -1, np.int64)
    h = tri >= 0
    out[h] = t_of_face[tri[h]]
    return out


def simulate(scene, o, d, t_max, label, results):
    """One closest-hit sweep: listed pairs vs simulated swept pairs."""
    from hikari_tpu.geometry import wavefront as wf
    from hikari_tpu.geometry.traverse import closest_hit

    tl = scene.treelets
    world_lo, world_hi = scene.world_lo, scene.world_hi
    t_max = jnp.where(jnp.isfinite(t_max), t_max, 3.0e37)
    t_max = wf._world_exit_clamp(o, d, t_max, world_lo, world_hi)
    o_p, d_p, tm_p, n, n_pad = wf._pad_rays(o, d, t_max)
    n_tiles = n_pad // wf.RAY_TILE
    keys = wf.ray_sort_keys(o_p, d_p, world_lo, world_hi)
    keys = jnp.minimum(keys, jnp.uint32(0xFFFFFFFE))
    keys = jnp.where(tm_p > 0.0, keys, jnp.uint32(0xFFFFFFFF))
    order, os_, ds, ts = wf._sort_wavefront(o_p, d_p, tm_p, keys)
    mask, tnear = wf.tile_treelet_mask(os_, ds, ts, tl, n_tiles)
    mask = np.asarray(mask)
    tnear = np.asarray(tnear)

    # exact winners from the reference walk (sorted lane order)
    rec = jax.jit(closest_hit)(scene.bvh, os_, ds, ts)
    win_t = np.asarray(rec.t)
    win_tri = np.asarray(rec.tri)
    hit = np.asarray(rec.hit)
    win_tl = lane_winner_treelet(scene, win_tri)

    ts_np = np.asarray(ts)
    listed = int(mask.sum())
    swept = 0
    RT = wf.RAY_TILE
    for i in range(n_tiles):
        tm = mask[i]
        if not tm.any():
            continue
        tn = tnear[i][tm]
        tre = np.nonzero(tm)[0]
        ordr = np.argsort(tn, kind="stable")
        tn = tn[ordr]
        tre = tre[ordr]
        lo_, hi_ = i * RT, (i + 1) * RT
        best = ts_np[lo_:hi_].copy()
        lw = win_tl[lo_:hi_]
        lt = np.where(hit[lo_:hi_], win_t[lo_:hi_], best)
        # pair index at which each lane resolves
        pos_of_tre = np.full(tl.lo.shape[0], len(tre), np.int64)
        pos_of_tre[tre] = np.arange(len(tre))
        resolve_at = np.where(lw >= 0, pos_of_tre[np.maximum(lw, 0)],
                              len(tre))
        k = 0
        thr = best.max()
        # process pairs in order; lanes resolve at their pair index
        event_order = np.argsort(resolve_at, kind="stable")
        # walk pairs; maintain thr cheaply: thr can only drop when a lane
        # resolves. Recompute max lazily per event batch.
        ev = 0
        n_lanes = len(best)
        while k < len(tre):
            if tn[k] > thr:
                break
            # apply all resolutions at pair k
            while ev < n_lanes and resolve_at[event_order[ev]] <= k:
                j = event_order[ev]
                best[j] = min(best[j], lt[j])
                ev += 1
            thr = best.max()
            k += 1
        swept += k
    results[label] = {"listed": listed, "swept": swept,
                      "tiles": int(n_tiles)}
    print(f"{label}: listed={listed} swept={swept} "
          f"frac={swept / max(listed, 1):.3f}", flush=True)
    return rec


def main():
    import bench
    from hikari_tpu.camera.camera import CameraSample, make_perspective_camera
    from hikari_tpu.geometry import wavefront as wf

    which = os.environ.get("BENCH_SCENE", "default")
    builders = {"default": bench.build_scene, "mesh": bench.build_mesh_scene,
                "fog": bench.build_fog_scene,
                "sphere": bench.build_sphere_scene}
    scene = builders[which]()
    res = int(os.environ.get("PAIR_RES", "256"))
    camera = make_perspective_camera((0.0, 1.6, -2.8), (0.0, 0.9, 2.0),
                                     (res, res), fov_deg=45.0)
    n = res * res
    lanes = jnp.arange(n, dtype=jnp.uint32)
    p_film = jnp.stack([(lanes % res).astype(jnp.float32),
                        (lanes // res).astype(jnp.float32)], -1) + 0.5
    o, d = camera.generate_rays(CameraSample(
        p_film=p_film, lens=jnp.zeros((n, 2)), time=jnp.zeros(n),
        filter_weight=jnp.ones(n)))
    t_max = jnp.full((n,), 3.0e37)
    T = scene.treelets.lo.shape[0]
    cfg = {"scene": which, "T": int(T), "TT": wf.TREELET,
           "RT": wf.RAY_TILE,
           "mode": os.environ.get("HIKARI_TREELET_MODE", "stride"),
           "rays": n}
    print(json.dumps(cfg), flush=True)

    results = {}
    rec = simulate(scene, o, d, t_max, "primary", results)

    # bounce-1 rays: cosine hemisphere at the primary hits
    p_hit = np.asarray(o + rec.t[:, None] * d)
    hitm = np.asarray(rec.hit)
    ng = -np.asarray(d)
    rng = np.random.RandomState(0)
    u = rng.rand(n, 2).astype(np.float32)
    r = np.sqrt(u[:, 0])
    phi = 2 * np.pi * u[:, 1]
    z = np.sqrt(np.maximum(1.0 - u[:, 0], 0.0))
    local = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)
    up = np.where(np.abs(ng[:, 2:3]) < 0.9, [[0.0, 0.0, 1.0]],
                  [[1.0, 0.0, 0.0]])
    tt_ = np.cross(up, ng)
    tt_ /= np.maximum(np.linalg.norm(tt_, axis=-1, keepdims=True), 1e-9)
    b = np.cross(ng, tt_)
    d1 = (local[:, 0:1] * tt_ + local[:, 1:2] * b + local[:, 2:3] * ng)
    d1 /= np.maximum(np.linalg.norm(d1, axis=-1, keepdims=True), 1e-9)
    o1 = p_hit + 1e-3 * ng
    t1 = jnp.where(jnp.asarray(hitm), 3.0e37, 0.0)
    rec1 = simulate(scene, jnp.asarray(o1.astype(np.float32)),
                    jnp.asarray(d1.astype(np.float32)), t1, "bounce1",
                    results)

    # bounce-2 from the bounce-1 hits (the profile says bounces 2-4
    # dominate; their coherence is what matters)
    p2 = o1 + np.asarray(rec1.t)[:, None] * d1
    h1 = np.asarray(rec1.hit) & hitm
    ng2 = -d1
    u = rng.rand(n, 2).astype(np.float32)
    r = np.sqrt(u[:, 0])
    phi = 2 * np.pi * u[:, 1]
    z = np.sqrt(np.maximum(1.0 - u[:, 0], 0.0))
    local = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)
    tt2 = np.cross(up, ng2)
    tt2 /= np.maximum(np.linalg.norm(tt2, axis=-1, keepdims=True), 1e-9)
    b2 = np.cross(ng2, tt2)
    d2 = (local[:, 0:1] * tt2 + local[:, 1:2] * b2 + local[:, 2:3] * ng2)
    d2 /= np.maximum(np.linalg.norm(d2, axis=-1, keepdims=True), 1e-9)
    o2 = p2 + 1e-3 * ng2
    t2 = jnp.where(jnp.asarray(h1), 3.0e37, 0.0)
    simulate(scene, jnp.asarray(o2.astype(np.float32)),
             jnp.asarray(d2.astype(np.float32)), t2, "bounce2", results)

    print(json.dumps({"cfg": cfg, "results": results}))


if __name__ == "__main__":
    main()
