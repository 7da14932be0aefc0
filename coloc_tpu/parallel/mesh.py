"""Drone-axis mesh parallelism.

Reference parity: the reference "parallelizes" N robots as a sequential loop
in one process (coloc.hpp:128-148) and exchanges descriptors/poses/covariances
over ROS topics or a shared folder (SURVEY.md §2.2). TPU-native redesign:
the drone axis IS a `jax.sharding.Mesh` axis —
  - each device runs its drone's whole intra-localization step
    (detect -> map match -> P3P -> refine -> KF) locally;
  - what the robots exchange in-algorithm is tiny (poses + 3x3 covariances +
    descriptor banks), so inter-drone steps become ICI collectives:
    `all_gather` over the drone axis replaces ROS publish/subscribe;
  - the map descriptor bank is replicated (every drone matches against the
    shared map — the reference's resident `setMapData` bank).

`collaborative_step` is the shard_mapped "training step" the driver's
multi-chip dry-run compiles: a full per-drone localization plus an
all-gather + pairwise ICI fusion across the mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coloc_tpu.config import ColocConfig
from coloc_tpu.frontend import detect_and_describe
from coloc_tpu.fusion import covint, kalman
from coloc_tpu.geometry import camera as cam_ops
from coloc_tpu.matching import match_with_map
from coloc_tpu.sfm import localize
from coloc_tpu.types import MapDB, Pose

DRONE_AXIS = "drone"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(devices, axis_names=(DRONE_AXIS,))


def _per_drone_step(
    key, image, K, dist, fb_x, fb_P, fb_steps, mapdb, config: ColocConfig
):
    """One drone's full frame step (runs on one device inside shard_map).

    All leading axes are the local shard (size 1); returns updated filter
    state + pose + covariance.
    """
    cam = cam_ops.Camera(K=K[0], dist=dist[0])
    feats = detect_and_describe(image[0], config.detector)
    mm = match_with_map(feats, mapdb, config.matcher)
    pwc, _ = localize.localize_image(
        key[0], feats, mm, mapdb, cam, config.ransac, config.refiner
    )

    bank = kalman.FilterBank(x=fb_x, P=fb_P, steps=fb_steps)
    z = kalman.fill_measurement(pwc.pose)
    bank, filtered, gate_dist, _rej = kalman.update(
        bank, jnp.int32(0), z, pwc.cov[3:6, 3:6], pwc.rmse, pwc.success,
        config.filter,
    )
    return bank, filtered, pwc


def collaborative_step(
    mesh: Mesh,
    config: ColocConfig,
):
    """Build the jitted multi-drone step function over `mesh`.

    Signature of the returned fn:
      (keys (D,2) uint32, images (D,H,W) f32, Ks (D,3,3), dists (D,3),
       fb: FilterBank (D,...), mapdb: MapDB (replicated))
      -> (fb', positions (D,3), covs (D,3,3), fused_pos (D,3), fused_cov (D,3,3))

    Inter-drone exchange: all_gather positions+covariances over the drone
    axis, then each drone ICI-fuses its estimate with its ring neighbor's —
    the collective replacing ROS pose topics.
    """
    dspec = P(DRONE_AXIS)
    rep = P()

    def step(keys, images, Ks, dists, fb_x, fb_P, fb_steps, map_X, map_desc, map_valid):
        mapdb = MapDB(X=map_X, desc=map_desc, valid=map_valid)
        bank, filtered, pwc = _per_drone_step(
            keys, images, Ks, dists, fb_x, fb_P, fb_steps, mapdb, config
        )
        pos = filtered.C
        cov = pwc.cov[3:6, 3:6] + 1e-5 * jnp.eye(3)

        # --- inter-drone collective: gather everyone's estimate over ICI ---
        all_pos = jax.lax.all_gather(pos, DRONE_AXIS)      # (D, 3)
        all_cov = jax.lax.all_gather(cov, DRONE_AXIS)      # (D, 3, 3)
        me = jax.lax.axis_index(DRONE_AXIS)
        n = jax.lax.axis_size(DRONE_AXIS)
        other = (me + 1) % n
        fused = covint.fuse(cov, all_cov[other], pos, all_pos[other])

        return (
            bank.x, bank.P, bank.steps,
            pos[None], cov[None],
            fused.pos[None], fused.cov[None],
        )

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(dspec, dspec, dspec, dspec, dspec, dspec, dspec,
                  rep, rep, rep),
        out_specs=(dspec, dspec, dspec, dspec, dspec, dspec, dspec),
        check_vma=False,
    )

    @jax.jit
    def run(keys, images, Ks, dists, fb: kalman.FilterBank, mapdb: MapDB):
        out = sharded(
            keys, images, Ks, dists, fb.x, fb.P, fb.steps,
            mapdb.X, mapdb.desc, mapdb.valid,
        )
        fb2 = kalman.FilterBank(x=out[0], P=out[1], steps=out[2])
        return fb2, out[3], out[4], out[5], out[6]

    return run


def sharded_map_match(mesh: Mesh, opts):
    """2-NN matching against a MAP-SHARDED descriptor bank.

    SURVEY.md §5 (long-context analog): when the landmark bank outgrows one
    chip, shard it across the mesh. Each device runs the fused Hamming 2-NN
    kernel over its shard of the bank; the per-shard (best, second, idx)
    triples merge with the same two-smallest logic the kernel uses
    internally, via an all_gather over the map axis — O(devices * queries)
    bytes on ICI instead of moving any descriptors.

    Returns a jitted fn:
      (q_desc (Q,16) replicated, q_valid (Q,), shard_desc (L,16) sharded on
       axis 0, shard_valid (L,)) -> (idx (Q,) GLOBAL landmark index, best,
       second) with CUDAK2NN semantics.
    """
    from coloc_tpu.matching import _accept
    from coloc_tpu.ops import hamming

    axis = DRONE_AXIS  # reuse the mesh axis; semantically the "map" axis here

    def step(q_desc, q_valid, shard_desc, shard_valid):
        idx, best, second = hamming.hamming_2nn(
            q_desc, shard_desc, q_valid, shard_valid
        )
        me = jax.lax.axis_index(axis)
        shard_size = shard_desc.shape[0]
        gidx = idx + me * shard_size  # globalize within my shard

        all_best = jax.lax.all_gather(best, axis)      # (D, Q)
        all_second = jax.lax.all_gather(second, axis)  # (D, Q)
        all_idx = jax.lax.all_gather(gidx, axis)       # (D, Q)

        # merge D sorted-pairs: global best = min of bests; global second =
        # min of (all seconds, all non-argmin bests)
        d_best = jnp.argmin(all_best, axis=0)          # (Q,)
        q_ar = jnp.arange(best.shape[0])
        g_best = all_best[d_best, q_ar]
        g_idx = all_idx[d_best, q_ar]
        masked_bests = jnp.where(
            jnp.arange(all_best.shape[0])[:, None] == d_best[None, :],
            jnp.int32(hamming._INVALID_DIST), all_best,
        )
        g_second = jnp.minimum(
            jnp.min(all_second, axis=0), jnp.min(masked_bests, axis=0)
        )
        return g_idx, g_best, g_second

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(DRONE_AXIS), P(DRONE_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def run(q_desc, q_valid, map_desc, map_valid):
        idx, best, second = sharded(q_desc, q_valid, map_desc, map_valid)
        # single source of truth for accept semantics (matching._accept)
        return _accept(idx, best, second, q_valid, opts, opts.margin_threshold)

    return run


def shard_inputs(mesh: Mesh, keys, images, Ks, dists, fb, mapdb):
    """Place inputs: drone-sharded data vs replicated map."""
    dsh = NamedSharding(mesh, P(DRONE_AXIS))
    rsh = NamedSharding(mesh, P())
    put = lambda x, s: jax.device_put(x, s)
    fb = kalman.FilterBank(
        x=put(fb.x, dsh), P=put(fb.P, dsh), steps=put(fb.steps, dsh)
    )
    mapdb = MapDB(
        X=put(mapdb.X, rsh), desc=put(mapdb.desc, rsh),
        valid=put(mapdb.valid, rsh),
    )
    return (
        put(keys, dsh), put(images, dsh), put(Ks, dsh), put(dists, dsh),
        fb, mapdb,
    )
