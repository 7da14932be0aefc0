"""Feature frontend: multi-scale detect + orient + describe, one jit graph.

Reference parity: GPUDetector.hpp detectAndDescribe (:216-291) — the KORAL
pipeline (CUDALERP pyramid -> KFAST per level -> featureAngle -> CLATCH 512
bits, 4 host<->device hops per frame). TPU redesign keeps the whole frontend
on device in a single trace: pyramid + FAST + NMS + top-k + moment convs +
one flattened-pyramid gather for all descriptor samples. Keypoint coords are
rescaled to full resolution by scale_factor**level exactly like
GPUDetector.hpp:172-182 (coords *1.2^s).

Output is a fixed-capacity `Features` bank (max_keypoints entries + validity
mask), the device-friendly replacement for AKAZE_Binary_Regions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from coloc_tpu.config import DetectorOptions
from coloc_tpu.ops import descriptor as desc_ops
from coloc_tpu.ops import fast as fast_ops
from coloc_tpu.ops import orientation as orient_ops
from coloc_tpu.ops import pyramid as pyr_ops
from coloc_tpu.types import Features

_MIN_BORDER = 8  # floor: the 7x7 orientation window must fit


def detect_and_describe(image: jnp.ndarray, opts: DetectorOptions) -> Features:
    """image (H, W) uint8/float32 grayscale -> Features (fixed capacity).

    Backend dispatch (replacing the reference's #ifdef USE_CUDA template
    policy, FeatureDetector.hpp): "trip" = the KORAL-equivalent FAST+TRIP-512
    path below; "akaze" = the AKAZE-MLDB parity path (coloc_tpu/akaze.py).
    """
    if opts.backend == "akaze":
        from coloc_tpu.akaze import detect_and_describe_akaze

        return detect_and_describe_akaze(image, opts)
    return _detect_and_describe_trip(image, opts)


@functools.partial(jax.jit, static_argnames=("opts",))
def _detect_and_describe_trip(image: jnp.ndarray, opts: DetectorOptions) -> Features:
    image = image.astype(jnp.float32)
    k = opts.max_keypoints

    levels = pyr_ops.build_pyramid(image, opts.num_levels, opts.scale_factor)
    smoothed = [pyr_ops.box_blur(lvl, opts.smoothing_radius) for lvl in levels]

    # --- detection: per-level FAST -> candidates, then global top-k ---------
    # keep-out border: opts.border at full resolution, scaled down per level
    # (so the TRIP sample pool mostly stays in-bounds) with a floor of 8
    xs, ys, ss, vs, ls = [], [], [], [], []
    for l, lvl in enumerate(levels):
        border_l = max(_MIN_BORDER, int(round(opts.border / opts.scale_factor ** l)))
        x, y, s, v = fast_ops.detect(lvl, opts.fast_threshold, k, border_l)
        xs.append(x)
        ys.append(y)
        ss.append(jnp.where(v, s, 0.0))
        vs.append(v)
        ls.append(jnp.full_like(x, l, dtype=jnp.int32))
    cx = jnp.concatenate(xs)
    cy = jnp.concatenate(ys)
    cs = jnp.concatenate(ss)
    cl = jnp.concatenate(ls)

    top_s, top_i = jax.lax.top_k(cs, k)
    kp_x = cx[top_i]
    kp_y = cy[top_i]
    kp_l = cl[top_i]
    valid = top_s > 0

    # --- orientation: sparse weighted-centroid moments at keypoints ---------
    flat_raw, rb, rh, rw = pyr_ops.flatten_pyramid(levels)
    kp_angle = orient_ops.orientation_at_keypoints(
        flat_raw, rb, rh, rw, kp_x, kp_y, kp_l
    )

    # --- description: steered triplets on the smoothed pyramid --------------
    flat_s, sb, sh, sw = pyr_ops.flatten_pyramid(smoothed)
    desc = desc_ops.describe(flat_s, sb, sh, sw, kp_x, kp_y, kp_l, kp_angle)

    # --- full-resolution coordinates (GPUDetector.hpp:172-182 parity) -------
    scale = jnp.power(opts.scale_factor, kp_l.astype(jnp.float32))
    xy = jnp.stack([kp_x * scale, kp_y * scale], axis=-1)

    zero = jnp.zeros_like(top_s)
    return Features(
        xy=jnp.where(valid[:, None], xy, 0.0),
        score=jnp.where(valid, top_s, zero),
        scale=jnp.where(valid, kp_l, 0),
        angle=jnp.where(valid, kp_angle, 0.0),
        desc=desc,
        valid=valid,
    )


detect_and_describe_batch = jax.vmap(detect_and_describe, in_axes=(0, None))
