"""Bench: P3P AC-RANSAC sub-stages (sample/solve vs scoring vs NFA).

Run: PYTHONPATH=/root/.axon_site:. python scripts/prof_p3p.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from coloc_tpu.config import RansacOptions
from coloc_tpu.geometry import camera as cam_ops
from coloc_tpu.geometry import p3p as p3p_ops
from coloc_tpu.ransac import (
    _NFA_CANDIDATES, nfa_scores, ransac, sample_indices,
)
from coloc_tpu.robust import absolute_pose_p3p, _mean_focal, _point_log_alpha0

M = 1024          # correspondences (matched keypoints)
B = 256           # hypothesis budget
ITERS = int(__import__('os').environ.get('COLOC_BENCH_ITERS', '600'))
W, H = 752, 480


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
    return dt


def main():
    rng = np.random.default_rng(0)
    K = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]],
                 np.float32)
    cam = cam_ops.Camera(K=jnp.asarray(K), dist=jnp.zeros(3, jnp.float32))

    X = jnp.asarray(rng.uniform(-3, 3, (M, 3)) + [0, 0, 8], jnp.float32)
    uvn = (np.asarray(X) / np.asarray(X)[:, 2:3]) @ K.T
    uv = jnp.asarray(uvn[:, :2] + rng.normal(0, 0.5, (M, 2)), jnp.float32)
    mask = jnp.ones(M, bool)
    b = cam_ops.bearing(cam, uv)
    opts = RansacOptions()

    def solver(Xs, bs):
        poses, valid = p3p_ops.p3p_grunert(Xs, bs)
        flat = jnp.concatenate(
            [poses.R.reshape(4, 9), poses.C.reshape(4, 3)], axis=1)
        return flat, valid

    def scorer(flat, Xw, bearings):
        R = flat[:9].reshape(3, 3)
        C = flat[9:]
        Xc = (Xw - C) @ R.T
        proj = Xc / jnp.maximum(Xc[:, 2:3], 1e-9)
        obs = bearings / jnp.maximum(bearings[:, 2:3], 1e-9)
        err = jnp.sum((proj[:, :2] - obs[:, :2]) ** 2, axis=-1)
        err = err * _mean_focal(cam) ** 2
        return jnp.where(Xc[:, 2] <= 0, 1e12, err)

    def feed(x, out):
        return x + out.reshape(-1)[0] * 1e-12

    def s_sample(k, c):
        idx = sample_indices(k, mask, B, 3)
        return feed(c, idx.astype(jnp.float32))
    chain("sample_indices (Floyd, 256x3)", s_sample, jnp.zeros(3))

    def s_solve(k, c):
        idx = sample_indices(k, mask, B, 3)
        models, valid = jax.vmap(solver)(X[idx], b[idx])
        return feed(c, models)
    chain("+ P3P solve (1024 models, Ferrari)", s_solve, jnp.zeros(3))

    def s_score(k, c):
        idx = sample_indices(k, mask, B, 3)
        models, valid = jax.vmap(solver)(X[idx], b[idx])
        flat = models.reshape(-1, 12)
        all_res = jax.vmap(lambda m: scorer(m, X, b))(flat)
        return feed(c, all_res)
    chain("+ scoring (1024 x 1024 residuals)", s_score, jnp.zeros(3))

    la = float(_point_log_alpha0(cam))

    def s_nfa(k, c):
        idx = sample_indices(k, mask, B, 3)
        models, valid = jax.vmap(solver)(X[idx], b[idx])
        flat = models.reshape(-1, 12)
        fv = valid.reshape(-1)
        all_res = jax.vmap(lambda m: scorer(m, X, b))(flat)
        v = jnp.log2(jnp.maximum(all_res, 1e-30)) - jnp.log2(jnp.float32(16.0))
        cnt = jnp.clip(2.0 - jnp.floor(v * 0.5), 0.0, 5.0)
        rank = jnp.sum(jnp.where(mask[None, :], cnt, 0.0), axis=1)
        rank = jnp.where(fv, rank, -1)
        _, cand = jax.lax.top_k(rank, _NFA_CANDIDATES)
        score, thr = nfa_scores(all_res[cand], mask, 3, la, 2.0)
        return feed(c, score)
    chain("+ pre-rank + exact NFA (top-32 sorts)", s_nfa, jnp.zeros(3))

    def s_full(k, c):
        pose, inl, n_inl, ok = absolute_pose_p3p(k, X, uv, mask, cam, opts)
        return feed(c, pose.C) + n_inl.astype(jnp.float32) * 1e-12
    chain("FULL absolute_pose_p3p", s_full, jnp.zeros(3))


if __name__ == "__main__":
    main()
