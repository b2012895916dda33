"""Film: progressive per-pixel radiance accumulation + aux buffers.

Parity with /root/reference/src/film.jl. The reference accumulates with
atomic adds into Pixel structs; here each wavefront lane owns exactly one
pixel per sample pass (filter importance sampling puts the whole filter
into the sample position), so accumulation is a pure elementwise add —
no atomics, no scatter. Film state is a pytree; render steps return an
updated film (donated under jit for in-place accumulation on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.pytree import pytree_dataclass


@pytree_dataclass(static=("width", "height", "full_width", "full_height",
                          "crop_x0", "crop_y0"))
class Film:
    width: int                # crop-window width == buffer width
    height: int
    full_width: int           # full image resolution (== width uncropped)
    full_height: int
    crop_x0: int              # crop-window origin, full-image pixels
    crop_y0: int
    rgb_sum: jnp.ndarray      # (H, W, 3) weighted linear RGB sum
    weight_sum: jnp.ndarray   # (H, W) filter weight sum
    # aux buffers for denoising (film.jl:410-483)
    albedo: jnp.ndarray       # (H, W, 3)
    normal: jnp.ndarray       # (H, W, 3)
    depth: jnp.ndarray        # (H, W)
    aux_weight: jnp.ndarray   # (H, W)
    iteration: jnp.ndarray    # () int32 progressive sample counter


def make_film(width: int, height: int, crop_bounds=None) -> Film:
    """crop_bounds: optional normalized ((x0, y0), (x1, y1)) render window
    in [0, 1] (reference film.jl:61-183 `crop_bounds::Bounds2`): only the
    covered pixels are rendered and stored; `framebuffer` returns the
    crop-sized image. Pixel bounds use the pbrt convention
    [ceil(res*lo), ceil(res*hi)), so adjacent crops tile exactly."""
    import math

    cx0 = cy0 = 0
    cw, ch = width, height
    if crop_bounds is not None:
        (x0, y0), (x1, y1) = crop_bounds
        cx0 = min(int(math.ceil(width * float(x0))), width - 1)
        cy0 = min(int(math.ceil(height * float(y0))), height - 1)
        cw = max(int(math.ceil(width * float(x1))) - cx0, 1)
        ch = max(int(math.ceil(height * float(y1))) - cy0, 1)
        cw = min(cw, width - cx0)
        ch = min(ch, height - cy0)

    def z3():
        # distinct buffers per field: donation under jit requires each
        # donated argument to own its storage
        return jnp.zeros((ch, cw, 3), jnp.float32)

    def z1():
        return jnp.zeros((ch, cw), jnp.float32)

    return Film(
        width=cw, height=ch, full_width=width, full_height=height,
        crop_x0=cx0, crop_y0=cy0,
        rgb_sum=z3(), weight_sum=z1(),
        albedo=z3(), normal=z3(), depth=z1(), aux_weight=z1(),
        iteration=jnp.int32(0),
    )


def film_clear(film: Film) -> Film:
    zero = jax.tree_util.tree_map(jnp.zeros_like, film)
    return zero


def film_add_sample(film: Film, rgb: jnp.ndarray, weight: jnp.ndarray) -> Film:
    """Accumulate one sample per pixel. rgb: (H, W, 3), weight: (H, W)."""
    return film.replace(
        rgb_sum=film.rgb_sum + rgb * weight[..., None],
        weight_sum=film.weight_sum + weight,
        iteration=film.iteration + 1,
    )


def film_add_weighted(film: Film, rgb_weighted: jnp.ndarray,
                      weight: jnp.ndarray, n_samples: int = 1) -> Film:
    """Accumulate PRE-weighted contributions: rgb_weighted = Σ rgb_i·w_i
    over a batch of n_samples samples, weight = Σ w_i (used by VolPath's
    sample_batch path, which folds K samples into one dispatch; the
    progressive `iteration` counter advances by K so checkpoint/resume
    bookkeeping counts SAMPLES, not dispatches)."""
    return film.replace(
        rgb_sum=film.rgb_sum + rgb_weighted,
        weight_sum=film.weight_sum + weight,
        iteration=film.iteration + n_samples,
    )


def film_add_aux(film: Film, albedo, normal, depth, weight) -> Film:
    return film.replace(
        albedo=film.albedo + albedo * weight[..., None],
        normal=film.normal + normal * weight[..., None],
        depth=film.depth + depth * weight,
        aux_weight=film.aux_weight + weight,
    )


def framebuffer(film: Film) -> jnp.ndarray:
    """Weighted-average linear RGB image (H, W, 3) (film.jl:355-387)."""
    w = jnp.maximum(film.weight_sum, 1e-8)[..., None]
    return film.rgb_sum / w


def film_save(path: str, film: Film) -> None:
    """Checkpoint the film. Progressive accumulation IS the resume
    mechanism (reference volpath.jl:445-449 + film.iteration_index): a
    restored film continues exactly where it stopped (SURVEY.md section 5.4)."""
    import numpy as np

    np.savez(
        path,
        width=film.width, height=film.height,
        full_width=film.full_width, full_height=film.full_height,
        crop_x0=film.crop_x0, crop_y0=film.crop_y0,
        rgb_sum=np.asarray(film.rgb_sum),
        weight_sum=np.asarray(film.weight_sum),
        albedo=np.asarray(film.albedo),
        normal=np.asarray(film.normal),
        depth=np.asarray(film.depth),
        aux_weight=np.asarray(film.aux_weight),
        iteration=np.asarray(film.iteration),
    )


def film_load(path: str) -> Film:
    """Restore a checkpointed film to continue progressive rendering."""
    import numpy as np

    z = np.load(path)
    w, h = int(z["width"]), int(z["height"])
    return Film(
        width=w, height=h,
        # pre-crop checkpoints lack the window fields: uncropped
        full_width=int(z["full_width"]) if "full_width" in z else w,
        full_height=int(z["full_height"]) if "full_height" in z else h,
        crop_x0=int(z["crop_x0"]) if "crop_x0" in z else 0,
        crop_y0=int(z["crop_y0"]) if "crop_y0" in z else 0,
        rgb_sum=jnp.asarray(z["rgb_sum"]),
        weight_sum=jnp.asarray(z["weight_sum"]),
        albedo=jnp.asarray(z["albedo"]),
        normal=jnp.asarray(z["normal"]),
        depth=jnp.asarray(z["depth"]),
        aux_weight=jnp.asarray(z["aux_weight"]),
        iteration=jnp.asarray(z["iteration"]),
    )


def aux_buffers(film: Film):
    w = jnp.maximum(film.aux_weight, 1e-8)
    return (
        film.albedo / w[..., None],
        film.normal / w[..., None],
        film.depth / w,
    )
