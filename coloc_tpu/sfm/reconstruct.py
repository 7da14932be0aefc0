"""Scene reconstruction: two-view bootstrap, resection, map database.

Reference parity: Reconstructor.hpp —
  reconstructScene (:102-164): seed pair = argmax geometric matches, tracks,
    per-camera intrinsics, DLT triangulation with world origin at the seed
    view and the relative pose scaled by `scale` (:185-239; depth > 0 and
    |Z| < 100 gates :227-231), P3P resection of remaining views
    (resectionCamera :259-415: ray-angle > 2 deg, depth > 0, |Z| < 1000
    gates for newly triangulated points), final BA via PoseRefiner.
  interReconstruct (:80-100): seed-pair-only variant for the inter-drone
    temporary scene.
Plus colocData.hpp:89-121 setupMapDatabase: flat descriptor bank from the
FIRST observation of each landmark + landmark index.

TPU-first: the scene is a fixed-capacity pytree; triangulation gates become
validity-mask updates; landmark slots are keyed by seed-view feature index.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from coloc_tpu.config import ColocConfig, RefinerOptions
from coloc_tpu.geometry import camera as cam_ops
from coloc_tpu.geometry import se3
from coloc_tpu.geometry import triangulation as tri
from coloc_tpu.sfm.ba import BAProblem, BAResult, refine
from coloc_tpu.types import Features, MapDB, Matches, Pose

_MAX_Z_BOOTSTRAP = 100.0   # Reconstructor.hpp:227-231
_MAX_Z_RESECTION = 1000.0  # Reconstructor.hpp:383
_MIN_RAY_ANGLE_DEG = 2.0   # Reconstructor.hpp:380


class Scene(NamedTuple):
    """Fixed-capacity SfM scene (OpenMVG SfM_Data equivalent).

    V views, L landmark slots. Landmark slot l corresponds to seed-view
    feature l where valid.
    """

    Rs: jnp.ndarray        # (V, 3, 3)
    Cs: jnp.ndarray        # (V, 3)
    X: jnp.ndarray         # (L, 3)
    X_valid: jnp.ndarray   # (L,) bool
    obs: jnp.ndarray       # (V, L, 2) distorted pixel observations
    obs_mask: jnp.ndarray  # (V, L) bool
    desc: jnp.ndarray      # (L, 16) uint32 first-observation descriptors

    @property
    def num_views(self) -> int:
        return self.Rs.shape[0]

    @property
    def capacity(self) -> int:
        return self.X.shape[0]


@functools.partial(jax.jit, static_argnames=("num_landmarks",))
def two_view_scene(
    feats_i: Features,
    feats_j: Features,
    matches: Matches,         # query = view i, train = view j
    inliers: jnp.ndarray,     # (K,) bool from robust geometry
    rel_R: jnp.ndarray,       # relative motion i -> j (x_j = R (x_i - C_rel))
    rel_t: jnp.ndarray,       # unit translation of relative pose
    pose_i: Pose,             # world pose of view i (origin at bootstrap)
    scale: float,
    cam_i: cam_ops.Camera,
    cam_j: cam_ops.Camera,
    num_landmarks: int,
) -> Scene:
    """Bootstrap a two-view scene by DLT triangulation of the inlier matches.

    Landmark slot l = feature l of view i (first-observation convention, so
    the descriptor bank is just feats_i.desc masked to surviving landmarks).
    """
    K = feats_i.capacity
    L = num_landmarks

    rel = Pose(R=rel_R, C=-rel_R.T @ rel_t)
    pose_j = se3.relative_to_absolute(rel, pose_i, scale=scale)

    uv_i = feats_i.xy                              # (K, 2)
    uv_j = feats_j.xy[matches.idx]                 # (K, 2) (idx<0 garbage, masked)
    x_i = cam_ops.undistort(cam_i, cam_ops.normalize(cam_i, uv_i))
    x_j = cam_ops.undistort(cam_j, cam_ops.normalize(cam_j, uv_j))

    X = tri.triangulate_points(pose_i.R, pose_i.C, x_i, pose_j.R, pose_j.C, x_j)

    d_i = tri.depth_in_view(pose_i.R, pose_i.C, X)
    d_j = tri.depth_in_view(pose_j.R, pose_j.C, X)
    gates = (
        (d_i > 0.0) & (d_j > 0.0)
        & (jnp.abs(X[:, 2]) < _MAX_Z_BOOTSTRAP)
    )
    valid = matches.mask & inliers & feats_i.valid & gates

    # fixed capacity: slots beyond L dropped (K <= L in all default configs)
    def fit(a):
        return a[:L] if a.shape[0] >= L else jnp.pad(
            a, ((0, L - a.shape[0]),) + ((0, 0),) * (a.ndim - 1)
        )

    X_valid = fit(valid)
    Xl = jnp.where(X_valid[:, None], fit(X), 0.0)

    obs = jnp.stack([fit(uv_i), fit(uv_j)])        # (2, L, 2)
    obs_mask = jnp.stack([X_valid, X_valid])

    return Scene(
        Rs=jnp.stack([pose_i.R, pose_j.R]),
        Cs=jnp.stack([pose_i.C, pose_j.C]),
        X=Xl,
        X_valid=X_valid,
        obs=obs,
        obs_mask=obs_mask,
        desc=fit(feats_i.desc),
    )


def refine_scene(
    scene: Scene,
    cams_K: jnp.ndarray,     # (V, 3, 3)
    cams_dist: jnp.ndarray,  # (V, 3)
    opts: RefinerOptions,
    fix_pose: jnp.ndarray,
    cov_view: int = 1,
) -> Tuple[Scene, BAResult]:
    """Full BA over the scene (Reconstructor.hpp:150-161 pattern)."""
    problem = BAProblem(
        Rs=scene.Rs, Cs=scene.Cs, X=scene.X,
        obs=scene.obs,
        obs_mask=scene.obs_mask & scene.X_valid[None, :],
        Ks=cams_K, dists=cams_dist,
    )
    res = refine(problem, opts, fix_pose, optimize_structure=True,
                 cov_view=cov_view)
    out = scene._replace(Rs=res.Rs, Cs=res.Cs, X=res.X)
    return out, res


def scene_to_mapdb(scene: Scene) -> MapDB:
    """setupMapDatabase parity (colocData.hpp:89-121): descriptor bank =
    first observation of each landmark; here that is scene.desc by
    construction (slots keyed by seed-view features)."""
    return MapDB(X=scene.X, desc=scene.desc, valid=scene.X_valid)


@functools.partial(jax.jit, static_argnames=())
def resect_and_extend(
    scene: Scene,
    feats_new: Features,
    map_matches: Matches,     # new-frame features vs scene landmarks
    pose_new: Pose,           # P3P-estimated pose of the new view (from robust)
    pose_inliers: jnp.ndarray,
    cam_new: cam_ops.Camera,
    view_slot: jnp.ndarray,   # () int32 — which view row to fill
) -> Scene:
    """Add observations of an existing scene from a newly resected view
    (resectionCamera parity, observation part; new-landmark triangulation is
    handled by the session's update_map path)."""
    L = scene.capacity
    K = feats_new.capacity

    # scatter: landmark slot map_matches.idx[q] observed at feats_new.xy[q]
    lm = map_matches.idx                                  # (K,)
    ok = map_matches.mask & pose_inliers & feats_new.valid
    lm_safe = jnp.where(ok, lm, L - 1)
    obs_v = jnp.zeros((L, 2)).at[lm_safe].set(
        jnp.where(ok[:, None], feats_new.xy, 0.0)
    )
    mask_v = jnp.zeros((L,), bool).at[lm_safe].set(ok)

    obs = scene.obs.at[view_slot].set(obs_v)
    obs_mask = scene.obs_mask.at[view_slot].set(mask_v & scene.X_valid)
    Rs = scene.Rs.at[view_slot].set(pose_new.R)
    Cs = scene.Cs.at[view_slot].set(pose_new.C)
    return scene._replace(Rs=Rs, Cs=Cs, obs=obs, obs_mask=obs_mask)
