"""Bench: match + localize sub-stages (P3P RANSAC vs pose refinement)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from coloc_tpu.config import ColocConfig, DetectorOptions, MatcherOptions
from coloc_tpu.frontend import detect_and_describe
from coloc_tpu.geometry import camera as cam_ops
from coloc_tpu.io import synthetic
from coloc_tpu.matching import match_with_map, pack_map_bank
from coloc_tpu.robust import absolute_pose_p3p
from coloc_tpu.sfm import localize
from coloc_tpu.sfm.ba import refine_pose_only
from coloc_tpu.types import MapDB

H, W, KP, L, LEVELS = 480, 752, 1024, 4096, 8
ITERS = 600


def chain(name, fn, x0):
    @jax.jit
    def loop(x):
        def body(i, c):
            return fn(jax.random.fold_in(jax.random.PRNGKey(0), i), c)
        return jax.lax.fori_loop(0, ITERS, body, x0)
    jax.block_until_ready(loop(x0))
    t0 = time.time()
    jax.block_until_ready(loop(x0))
    dt = (time.time() - t0) / ITERS
    print(f"{name:48s} {dt*1e3:8.3f} ms")


def main():
    config = ColocConfig(
        detector=DetectorOptions(width=W, height=H, max_keypoints=KP,
                                 num_levels=LEVELS, fast_threshold=12),
        matcher=MatcherOptions(),
        max_landmarks=L,
    )
    K = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]],
                 np.float32)
    cam = cam_ops.Camera(K=jnp.asarray(K), dist=jnp.zeros(3, jnp.float32))
    scene = synthetic.make_scene(H, W, K, seed=1)
    img = jnp.asarray(synthetic.render(scene, np.eye(3, dtype=np.float32),
                                       np.zeros(3, np.float32)))
    feats0 = detect_and_describe(img, config.detector)
    rng = np.random.default_rng(0)
    pad = L - KP
    # consistent map geometry (see bench.py): landmarks on the frame's
    # bearings so P3P/LM run the convergent production path
    uv0 = np.asarray(feats0.xy)
    depths = rng.uniform(5.0, 14.0, (KP, 1)).astype(np.float32)
    dirs = (np.linalg.inv(K) @ np.c_[uv0, np.ones(KP)].T).T.astype(np.float32)
    mapdb = MapDB(
        X=jnp.asarray(np.concatenate(
            [dirs * depths, rng.uniform(-3, 3, (pad, 3))])[:L], jnp.float32),
        desc=jnp.concatenate([
            feats0.desc,
            jnp.asarray(rng.integers(0, 2 ** 32, (pad, 16), dtype=np.uint64)
                        .astype(np.uint32))])[:L],
        valid=jnp.ones(L, bool),
    )
    bank = pack_map_bank(mapdb)
    mm0 = match_with_map(feats0, mapdb, config.matcher, bank=bank)
    X0 = mapdb.X[mm0.idx]
    corr0 = mm0.mask & feats0.valid

    def s_match(k, c):
        mm = match_with_map(
            feats0._replace(desc=feats0.desc ^ (c[0] > 1e30).astype(jnp.uint32)),
            mapdb, config.matcher, bank=bank)
        return c + mm.best.sum().astype(jnp.float32) * 1e-12

    def s_p3p(k, c):
        pose0, inl, n, ok = absolute_pose_p3p(
            k, X0 + c[0] * 1e-12, feats0.xy, corr0, cam, config.ransac)
        return c + pose0.C[0] * 1e-12 + n.astype(jnp.float32) * 1e-12

    pose0, inl0, n0, ok0 = absolute_pose_p3p(
        jax.random.PRNGKey(0), X0, feats0.xy, corr0, cam, config.ransac)

    def s_refine(k, c):
        res = refine_pose_only(
            pose0.R, pose0.C + c * 1e-12, X0, feats0.xy, inl0,
            cam.K, cam.dist, config.refiner)
        return c + res.Cs[1] * 1e-12

    def s_localize(k, c):
        pwc, _ = localize.localize_image(
            k, feats0._replace(xy=feats0.xy + c[0] * 1e-12), mm0, mapdb, cam,
            config.ransac, config.refiner)
        return c + pwc.pose.C * 1e-12

    x0 = jnp.zeros(3, jnp.float32)
    chain("match_with_map (resident bank)", s_match, x0)
    chain("P3P RANSAC (absolute_pose_p3p)", s_p3p, x0)
    chain("refine_pose_only (LM)", s_refine, x0)
    chain("localize_image (P3P+refine)", s_localize, x0)


if __name__ == "__main__":
    main()
