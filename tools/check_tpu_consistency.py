"""Compiled-vs-interpret consistency check for the packet traversal on the
real chip.

The pair-sweep relies on pallas input_output_aliases passing carried hit
state through grid blocks that a chunk never visits (tiles with zero
pairs). Interpret mode is pinned by tests/test_wavefront.py; this script
pins the COMPILED Mosaic path on hardware, including the banded two-pass
sweep whose pass 2 deliberately produces zero-pair tiles for lanes that
resolved in pass 1.

Run on the TPU (no env overrides needed):  python tools/check_tpu_consistency.py
Exit code 0 = compiled results match interpret bit-for-bit on hits/tris
and to 1e-4 relative on t.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/hikari_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")
from hikari_tpu.geometry import wavefront as wf  # noqa: E402


def random_tris(n, seed, spread=3.0):
    rng = np.random.RandomState(seed)
    c = (rng.rand(n, 3).astype(np.float32) * 2 - 1) * spread
    e1 = rng.randn(n, 3).astype(np.float32) * 0.25
    e2 = rng.randn(n, 3).astype(np.float32) * 0.25
    return c, c + e1, c + e2


def compare(tag, a, b, act):
    ha, hb = np.asarray(a.hit), np.asarray(b.hit)
    if not (ha[act] == hb[act]).all():
        print(f"FAIL {tag}: hit mismatch on {np.sum(ha[act] != hb[act])} lanes")
        return False
    both = ha & hb & act
    ta, tb = np.asarray(a.t)[both], np.asarray(b.t)[both]
    ia, ib = np.asarray(a.tri)[both], np.asarray(b.tri)[both]
    if not (ia == ib).all():
        print(f"FAIL {tag}: tri mismatch on {np.sum(ia != ib)} lanes")
        return False
    if not np.allclose(ta, tb, rtol=1e-4, atol=1e-5):
        print(f"FAIL {tag}: t mismatch max rel "
              f"{np.max(np.abs(ta - tb) / np.maximum(np.abs(tb), 1e-6)):.2e}")
        return False
    print(f"ok {tag}  ({int(both.sum())} hit lanes)")
    return True


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
    # mix of unbounded, short-capped (zero-pair tiles for sure), and dead
    t_max = np.where(rng.rand(r) < 0.3, rng.rand(r) * 3 + 0.05,
                     np.inf).astype(np.float32)
    act = rng.rand(r) > 0.25

    args = (tl, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max), wl, wh)
    actj = jnp.asarray(act)

    # interpret-mode references run on the LOCAL CPU backend — interpret
    # pallas on the tunneled TPU device dispatches per-op and never finishes
    cpu = jax.devices("cpu")[0]
    cpu_args = jax.device_put(args, cpu)
    cpu_act = jax.device_put(actj, cpu)

    def ref_run(band=None):
        with jax.default_device(cpu):
            r = wf.closest_hit_packets(*cpu_args, interpret=True,
                                       active=cpu_act, band=band)
        return jax.tree.map(np.asarray, r)

    ok = True
    ref = ref_run()
    got = wf.closest_hit_packets(*args, interpret=False, active=actj)
    # force a real sync through the tunnel
    _ = float(np.asarray(got.t.sum()))
    ok &= compare("closest one-pass", got, ref, act)

    for band in (0.4, 2.0):
        refb = ref_run(band=jnp.float32(band))
        gotb = wf.closest_hit_packets(
            *args, interpret=False, active=actj, band=jnp.float32(band))
        _ = float(np.asarray(gotb.t.sum()))
        ok &= compare(f"closest banded b={band}", gotb, refb, act)
        ok &= compare(f"banded-vs-onepass b={band}", gotb, ref, act)

    # compaction cascade on hardware: ~12% live lanes -> small branch
    act_low = jnp.asarray(rng.rand(r) < 0.12)
    full = wf.closest_hit_packets(*args, interpret=False, active=act_low,
                                  compact=False)
    _ = float(np.asarray(full.t.sum()))
    casc = wf.closest_hit_packets(*args, interpret=False, active=act_low,
                                  compact=True)
    _ = float(np.asarray(casc.t.sum()))
    ok &= compare("compaction cascade", casc, full, np.asarray(act_low))

    with jax.default_device(cpu):
        occ_i = np.asarray(wf.any_hit_packets(
            *cpu_args, interpret=True, active=cpu_act))
    occ_c = np.asarray(wf.any_hit_packets(*args, interpret=False, active=actj))
    if (occ_i[act] == occ_c[act]).all():
        print("ok anyhit")
    else:
        print(f"FAIL anyhit: {np.sum(occ_i[act] != occ_c[act])} lanes")
        ok = False

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
