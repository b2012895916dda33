"""Multi-chip rendering: sample-parallel x spatial-parallel device meshes.

The reference is single-device (SURVEY.md section 2.11); its only
parallelism axis is one-GPU-thread-per-work-item. The TPU-native scaling
model implemented here:

- 'sp' (spatial): the film's rows are sharded across devices; each device
  traces the paths of its own pixel block. Scene/BVH are replicated (they
  are read-only). Zero communication during tracing.
- 'dp' (sample): devices along 'dp' trace *different sample indices* of the
  same pixels; their film contributions are combined with one psum over ICI
  per step — the TPU equivalent of the reference's progressive
  `render!`-per-spp accumulation loop (volpath.jl:445-636).

Everything runs under shard_map, so the BVH while_loops stay local per
device and XLA inserts exactly one all-reduce for the film.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera.camera import PerspectiveCamera
from ..film.film import Film
from ..film.filters import FilterSampler, make_filter
from ..integrators.volpath import VolPath, render_lanes
from ..scene.scene import SceneData


def make_render_mesh(devices=None, dp: int | None = None) -> Mesh:
    """Build a ('dp', 'sp') mesh over the given devices.

    dp defaults to 2 when the device count is even (sample parallelism),
    else 1 (pure spatial)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = 2 if n % 2 == 0 and n > 1 else 1
    sp = n // dp
    assert dp * sp == n, (dp, sp, n)
    import numpy as np

    return Mesh(np.asarray(devices).reshape(dp, sp), ("dp", "sp"))


@partial(jax.jit, static_argnums=(0, 5), donate_argnums=(3,))
def render_step_sharded(
    vp: VolPath,
    scene: SceneData,
    camera: PerspectiveCamera,
    film: Film,
    filt: FilterSampler,
    mesh: Mesh,
    sample_base: jnp.ndarray,
):
    """One sharded progressive step: each dp-rank traces sample
    sample_base + rank for its sp-shard of rows, then films psum over dp.

    Returns the updated film (rgb_sum/weight_sum sharded over rows).

    jit is mandatory, not a nicety: an eager shard_map executes the traced
    body op-by-op per shard — for a path tracer that is thousands of
    dispatches per bounce. Under jit the whole step is one XLA program.
    """
    w, h = camera.resolution
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    assert h % sp == 0, f"film height {h} must divide over sp={sp}"
    rows_per = h // sp

    def shard_fn(rgb_sum, weight_sum, sample_base):
        dp_i = jax.lax.axis_index("dp")
        sp_i = jax.lax.axis_index("sp")
        lanes = jnp.arange(rows_per * w, dtype=jnp.uint32)
        px = lanes % w
        py = lanes // w + (sp_i * rows_per).astype(jnp.uint32)
        s_idx = sample_base.astype(jnp.uint32) + dp_i.astype(jnp.uint32)
        rgb, wgt, _ = render_lanes(vp, scene, camera, filt, s_idx, px, py)
        wgt = wgt.reshape(rows_per, w)
        # filter-weighted accumulation, same contract as film_add_sample
        rgb = rgb.reshape(rows_per, w, 3) * wgt[..., None]
        # combine the dp ranks' samples: one all-reduce over ICI
        rgb = jax.lax.psum(rgb, "dp")
        wgt = jax.lax.psum(wgt, "dp")
        return rgb_sum + rgb, weight_sum + wgt

    # film arrays are (H, W, ...): shard over rows => spec on dim 0
    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("sp"), P("sp"), P()),
        out_specs=(P("sp"), P("sp")),
        # pallas_call out_shapes carry no vma metadata; without this the
        # packets traversal engine cannot run inside shard_map
        check_vma=False,
    )
    rgb_sum, weight_sum = shard(film.rgb_sum, film.weight_sum, sample_base)
    return film.replace(
        rgb_sum=rgb_sum, weight_sum=weight_sum, iteration=film.iteration + dp
    )


def render_sharded(
    vp: VolPath,
    scene: SceneData,
    camera: PerspectiveCamera,
    mesh: Mesh,
    filt: FilterSampler | None = None,
) -> Film:
    """Full multi-chip render: samples_per_pixel total samples distributed
    over the dp axis; rows distributed over sp."""
    from ..film.film import make_film

    if filt is None:
        filt = make_filter()
    w, h = camera.resolution
    sp = mesh.shape["sp"]
    assert h % sp == 0, (
        f"film height {h} must be divisible by the spatial mesh axis sp={sp}"
    )
    film = make_film(*camera.resolution)
    # place film shards on the mesh
    sharding = NamedSharding(mesh, P("sp"))
    film = film.replace(
        rgb_sum=jax.device_put(film.rgb_sum, sharding),
        weight_sum=jax.device_put(film.weight_sum, sharding),
    )
    dp = mesh.shape["dp"]
    n_steps = max(1, vp.samples_per_pixel // dp)
    for s in range(n_steps):
        film = render_step_sharded(
            vp, scene, camera, film, filt, mesh, jnp.uint32(s * dp)
        )
    return film
