"""On-chip bf16 pre-rank winner-stability spot check (round-2 VERDICT item
5 follow-through, on REAL TPU arithmetic).

The NFA candidate pre-rank ladder ranks models on single-pass bf16 matmul
residuals (robust.py rank_scorer); exact f32 residuals are computed only
for the top-32 candidates. The CPU property test (tests/test_robust.py::
test_prerank_winner_equals_exhaustive_nfa) pins the LADDER approximation;
this script pins the BF16 step on the real MXU: over 20 seeded two-view
scenes at reference-capacity shapes, the production winner (bf16 pre-rank)
must achieve the same NFA as a run with the rank_scorer disabled (f32
pre-rank), and the recovered relative pose must agree.

Run: PYTHONPATH=/root/.axon_site:. python scripts/check_bf16_rank.py
"""

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from coloc_tpu import ransac as rs
    from coloc_tpu import robust
    from coloc_tpu.config import RansacOptions
    from coloc_tpu.geometry import camera as cam_ops
    from coloc_tpu.geometry import so3

    M = 5000
    w, h = 752, 480
    K = np.array([[450.0, 0, w / 2], [0, 450.0, h / 2], [0, 0, 1]],
                 np.float32)
    cam = cam_ops.Camera(K=jnp.asarray(K), dist=jnp.zeros(3, jnp.float32))
    opts = RansacOptions()

    # f32-pre-rank variant: robust.py binds `ransac` by name and jits
    # relative_pose_essential, so re-jit the UNWRAPPED function with
    # robust's `ransac` binding patched during tracing
    orig_ransac = rs.ransac

    def ransac_no_rank(*a, **kw):
        kw.pop("rank_scorer", None)
        return orig_ransac(*a, **kw)

    import functools
    rel_f32 = functools.partial(
        jax.jit, static_argnames=("opts",)
    )(robust.relative_pose_essential.__wrapped__)

    mismatch_nfa = 0
    mismatch_pose = 0
    for seed in range(20):
        r = np.random.default_rng(seed)
        ratio = float(r.uniform(0.2, 0.9))
        sigma = float(r.uniform(0.2, 3.0))
        n_in = int(M * ratio)

        # ground-truth relative motion
        axis = r.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = r.uniform(0.05, 0.4)
        R_gt = np.asarray(so3.exp(jnp.asarray(axis * ang, jnp.float32)))
        t_gt = r.normal(size=3)
        t_gt /= np.linalg.norm(t_gt)

        X = r.uniform(-4, 4, (n_in, 3)) + np.array([0, 0, 8.0])
        uv1 = (K @ (X / X[:, 2:]).T).T[:, :2]
        X2 = (R_gt @ X.T).T + t_gt
        uv2 = (K @ (X2 / X2[:, 2:]).T).T[:, :2]
        uv1 += r.normal(size=uv1.shape) * sigma
        uv2 += r.normal(size=uv2.shape) * sigma
        junk1 = r.uniform(0, (w, h), (M - n_in, 2))
        junk2 = r.uniform(0, (w, h), (M - n_in, 2))
        p1 = jnp.asarray(np.concatenate([uv1, junk1]), jnp.float32)
        p2 = jnp.asarray(np.concatenate([uv2, junk2]), jnp.float32)
        mask = jnp.ones(M, bool)
        key = jax.random.PRNGKey(7000 + seed)

        geo_bf16 = robust.relative_pose_essential(
            key, p1, p2, mask, cam, cam, opts
        )
        robust.ransac = ransac_no_rank
        try:
            geo_f32 = rel_f32(key, p1, p2, mask, cam, cam, opts)
        finally:
            robust.ransac = orig_ransac

        n_b = int(geo_bf16.n_inliers)
        n_f = int(geo_f32.n_inliers)
        dR = np.degrees(float(jnp.linalg.norm(so3.log(geo_bf16.R.T @ geo_f32.R))))
        dt = np.degrees(np.arccos(np.clip(
            float(jnp.dot(geo_bf16.t, geo_f32.t)), -1, 1)))
        same_pose = dR < 0.5 and dt < 1.0
        same_inl = abs(n_b - n_f) <= max(3, 0.01 * max(n_b, n_f))
        if not same_inl:
            mismatch_nfa += 1
        if not same_pose:
            mismatch_pose += 1
        print(f"seed {seed:2d} ratio={ratio:.2f} sigma={sigma:.1f}px  "
              f"inl bf16={n_b} f32={n_f}  dR={dR:.3f}deg dt={dt:.3f}deg  "
              f"{'OK' if same_pose and same_inl else 'DIFF'}")

    print(f"\ninlier-count mismatches: {mismatch_nfa}/20, "
          f"pose mismatches: {mismatch_pose}/20")


if __name__ == "__main__":
    main()
