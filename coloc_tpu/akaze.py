"""AKAZE-MLDB frontend (the reference's CPU detector backend).

Reference parity: CPUDetector.hpp + AKAZE.hpp — OpenMVG AKAZE with the
MLDB binary describer (NORMAL preset): nonlinear diffusion scale space,
sigma^2-normalized Hessian-determinant detection with subpixel refinement,
dominant-gradient main orientation, 486-bit MLDB descriptor bit-packed into
the shared 64-byte binary bank. Downstream (matching with Lowe ratio 0.8,
RANSAC, mapping) is identical to the TRIP-512 path — both emit `Features`.

TPU-first: FED diffusion is fused stencil work (ops/diffusion.py); detection
is per-level NMS + fixed-capacity top-k; orientation and MLDB sampling are
flattened-pyramid gathers (ops/mldb.py). Deviations (documented):
  - scale-space extrema are spatial-only per level (no cross-level
    comparison); the global top-k over all levels plays the cross-scale
    selection role.
  - MLDB cell means use a fixed 2x2 point-sample pattern per cell rather
    than full-cell integration.
Select with DetectorOptions(backend="akaze").
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp

from coloc_tpu.config import DetectorOptions
from coloc_tpu.ops import diffusion, fast as fast_ops, mldb
from coloc_tpu.ops import pyramid as pyr_ops
from coloc_tpu.types import Features

_DETECT_BORDER = 10


@functools.partial(jax.jit, static_argnames=("opts",))
def detect_and_describe_akaze(image: jnp.ndarray, opts: DetectorOptions) -> Features:
    """image (H, W) grayscale -> Features (fixed capacity, packed MLDB)."""
    k = opts.max_keypoints
    num_octaves = min(opts.num_levels // 2, 4) if opts.num_levels >= 4 else 2
    num_sub = 4

    levels = diffusion.build_scale_space(
        image, num_octaves=num_octaves, num_sublevels=num_sub
    )

    # --- detection: per-level threshold + NMS + top-k, then global top-k ---
    xs, ys, ss, ls, sig = [], [], [], [], []
    thresh = 1e-4  # AKAZE default response threshold (normalized image)
    for li, ev in enumerate(levels):
        resp = jnp.where(ev.response > thresh, ev.response, 0.0)
        nms = fast_ops.nms3(resp)
        x, y, s, v = fast_ops.topk_keypoints(nms, k, _DETECT_BORDER)
        x, y = fast_ops.subpixel_refine(ev.response, x, y)
        xs.append(x)
        ys.append(y)
        ss.append(jnp.where(v, s, 0.0))
        ls.append(jnp.full_like(x, li, dtype=jnp.int32))
        sig.append(jnp.full_like(x, ev.sigma / (2.0 ** ev.octave)))
    cx = jnp.concatenate(xs)
    cy = jnp.concatenate(ys)
    cs = jnp.concatenate(ss)
    cl = jnp.concatenate(ls)
    csig = jnp.concatenate(sig)

    top_s, top_i = jax.lax.top_k(cs, k)
    kp_x = cx[top_i]
    kp_y = cy[top_i]
    kp_l = cl[top_i]
    kp_sig = csig[top_i]          # sigma in level-local pixels
    valid = top_s > 0

    # --- flattened per-channel pyramids over evolution levels -------------
    flat_l, b, hh, ww = pyr_ops.flatten_pyramid([ev.L for ev in levels])
    flat_lx, _, _, _ = pyr_ops.flatten_pyramid([ev.Lx for ev in levels])
    flat_ly, _, _, _ = pyr_ops.flatten_pyramid([ev.Ly for ev in levels])

    kp_angle = mldb.orientation(
        flat_lx, flat_ly, b, hh, ww, kp_x, kp_y, kp_l, kp_sig
    )
    desc = mldb.describe_mldb(
        flat_l, flat_lx, flat_ly, b, hh, ww,
        kp_x, kp_y, kp_l, kp_sig, kp_angle,
    )

    # --- base-resolution coordinates (octave upsampling) -------------------
    octave_of_level = jnp.asarray([ev.octave for ev in levels], jnp.int32)
    oct_k = octave_of_level[kp_l]
    up = jnp.power(2.0, oct_k.astype(jnp.float32))
    xy = jnp.stack([kp_x * up, kp_y * up], axis=-1)

    return Features(
        xy=jnp.where(valid[:, None], xy, 0.0),
        score=jnp.where(valid, top_s, 0.0),
        scale=jnp.where(valid, kp_l, 0),
        angle=jnp.where(valid, kp_angle, 0.0),
        desc=desc,
        valid=valid,
    )
