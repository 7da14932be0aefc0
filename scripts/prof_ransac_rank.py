"""Batch-scaling probe of the vmapped P3P RANSAC + refine stages and the
fused ladder-rank kernel (ops/ransac_rank.py) — the round-4 serving-
regression investigation (VERDICT r3 item 4).

Measured on v5e (kp=1024, map-consistent correspondences, hyp=256):

  XLA ladder (pre-fix)        fused rank kernel
  B= 8: p3p 0.469 ms           0.487 ms   (parity)
  B=16: p3p 0.862 ms           0.853 ms   (parity)
  B=32: p3p 2.119 ms           1.631 ms   (-23%)
  B=64: p3p 4.038 ms           3.082 ms   (-24%)

Per-stream p3p cost is monotone DECREASING with the kernel (0.061 ->
0.048 ms, B=8->64) where the XLA ladder turned super-linear past B=16
(its (B, Hm, M) residual planes are pure HBM traffic). The refine stage
scales sub-linearly in both variants (0.016 -> 0.003 ms/stream). End to
end, batched serving is flat through B=64 (bench _bench_batched_serving).

Run: PYTHONPATH=/root/.axon_site:. python scripts/prof_ransac_rank.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from coloc_tpu import matching
from coloc_tpu.config import ColocConfig, DetectorOptions, MatcherOptions
from coloc_tpu.frontend import detect_and_describe
from coloc_tpu.geometry import camera as cam_ops
from coloc_tpu.io import synthetic
from coloc_tpu.matching import pack_map_bank
from coloc_tpu.robust import absolute_pose_p3p
from coloc_tpu.sfm.ba import refine_pose_only

h, w, kp, L = 480, 752, 1024, 4096
config = ColocConfig(
    detector=DetectorOptions(width=w, height=h, max_keypoints=kp,
                             num_levels=8, fast_threshold=12),
    matcher=MatcherOptions(), max_landmarks=L)
K = np.array([[0.6 * w, 0, w / 2], [0, 0.6 * w, h / 2], [0, 0, 1]],
             np.float32)
cam = cam_ops.Camera(K=jnp.asarray(K), dist=jnp.zeros(3, jnp.float32))
scene = synthetic.make_scene(h, w, K, seed=1)
img = jnp.asarray(synthetic.render(scene, np.eye(3, dtype=np.float32),
                                   np.zeros(3, np.float32)))
feats0 = detect_and_describe(img, config.detector)
rng = np.random.default_rng(0)
mapdb = synthetic.consistent_mapdb(feats0, K, L, rng)
bank = pack_map_bank(mapdb)
iters = 200
key = jax.random.PRNGKey(0)
mm0 = matching.match_with_map(feats0, mapdb, config.matcher, bank=bank)
X0 = mapdb.X[mm0.idx]
cm0 = mm0.mask & feats0.valid


def timeit(f, *a):
    jax.block_until_ready(f(*a))
    t0 = time.time()
    jax.block_until_ready(f(*a))
    return (time.time() - t0) / iters


for B in (8, 16, 32, 64):
    Xb = jnp.broadcast_to(X0, (B, kp, 3))
    cmb = jnp.broadcast_to(cm0, (B, kp))

    @jax.jit
    def p3p_only(key, B=B, Xb=Xb, cmb=cmb):
        def one(k, X, cm):
            return absolute_pose_p3p(k, X, feats0.xy, cm, cam, config.ransac)

        def body(i, carry):
            k, acc = carry
            k1, k2 = jax.random.split(k)
            pose0, inl, n, s = jax.vmap(one)(jax.random.split(k1, B), Xb, cmb)
            return (k2, acc + pose0.C[0, 0] * 1e-9)
        return jax.lax.fori_loop(0, iters, body, (key, 0.0))

    p0, inl0, n0, s0 = absolute_pose_p3p(
        key, X0, feats0.xy, cm0, cam, config.ransac)
    R0b = jnp.broadcast_to(p0.R, (B, 3, 3))
    C0b = jnp.broadcast_to(p0.C, (B, 3))
    inlb = jnp.broadcast_to(inl0, (B, kp))

    @jax.jit
    def refine_only(key, B=B, R0b=R0b, C0b=C0b, inlb=inlb, Xb=Xb):
        def one(R, C, X, inl):
            return refine_pose_only(R, C, X, feats0.xy, inl, cam.K, cam.dist,
                                    config.refiner)

        def body(i, carry):
            acc, = carry
            res = jax.vmap(one)(R0b + acc * 1e-12, C0b, Xb, inlb)
            return (acc * 0 + res.Cs[0, 1, 0] * 1e-9,)
        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0),))

    pdt = timeit(p3p_only, key)
    rdt = timeit(refine_only, key)
    print(f"B={B:3d}: p3p={pdt*1e3:7.3f}ms ({pdt/B*1e3:6.3f}/stream)  "
          f"refine={rdt*1e3:7.3f}ms ({rdt/B*1e3:6.3f}/stream)", flush=True)
