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


@functools.partial(jax.jit, static_argnames=("num_landmarks",))
def triangulate_new_landmarks(
    scene: Scene,
    feats_i: Features,        # seed view (landmark-slot keyed)
    feats_v: Features,        # newly posed view
    matches_iv: Matches,      # seed -> new view matches
    inliers: jnp.ndarray,     # robust inlier mask over matches
    view_i: int,
    view_slot: jnp.ndarray,   # () int32 row of the new view
    pose_v: Pose,
    cam_i: cam_ops.Camera,
    cam_v: cam_ops.Camera,
    num_landmarks: int,
) -> Scene:
    """Triangulate (seed, new-view) matches into currently-EMPTY landmark
    slots (resectionCamera's new-point triangulation, Reconstructor.hpp:
    354-412: ray angle > 2 deg, positive depths, |Z| < 1000 gates).

    Landmark slots are keyed by seed-view feature index, so a match at seed
    feature q fills slot q iff that slot is still invalid.
    """
    L = num_landmarks
    pose_i = Pose(R=scene.Rs[view_i], C=scene.Cs[view_i])

    uv_i = feats_i.xy
    uv_v = feats_v.xy[matches_iv.idx]
    x_i = cam_ops.undistort(cam_i, cam_ops.normalize(cam_i, uv_i))
    x_v = cam_ops.undistort(cam_v, cam_ops.normalize(cam_v, uv_v))
    X = tri.triangulate_points(pose_i.R, pose_i.C, x_i, pose_v.R, pose_v.C, x_v)

    d_i = tri.depth_in_view(pose_i.R, pose_i.C, X)
    d_v = tri.depth_in_view(pose_v.R, pose_v.C, X)
    ang = tri.ray_angle_deg(pose_i.C, pose_v.C, X)
    # reprojection guard (replaces a per-match robust-inlier prerequisite:
    # the P3P inlier mask only covers EXISTING landmarks, so new-point
    # candidates must be vetted geometrically here)
    reproj_i = jnp.sum(
        (cam_ops.project(cam_i, pose_i.R, pose_i.C, X) - uv_i) ** 2, axis=-1
    )
    reproj_v = jnp.sum(
        (cam_ops.project(cam_v, pose_v.R, pose_v.C, X) - uv_v) ** 2, axis=-1
    )
    gates = (
        (d_i > 0.0) & (d_v > 0.0)
        & (ang > _MIN_RAY_ANGLE_DEG)
        & (jnp.abs(X[:, 2]) < _MAX_Z_RESECTION)
        & (reproj_i < 16.0) & (reproj_v < 16.0)
    )
    ok = matches_iv.mask & inliers & feats_i.valid & gates

    def fit(a):
        return a[:L] if a.shape[0] >= L else jnp.pad(
            a, ((0, L - a.shape[0]),) + ((0, 0),) * (a.ndim - 1)
        )

    ok = fit(ok) & ~scene.X_valid  # only fill EMPTY slots
    Xl = jnp.where(ok[:, None], fit(X), scene.X)
    X_valid = scene.X_valid | ok

    obs_i = jnp.where(ok[:, None], fit(uv_i), scene.obs[view_i])
    obs_v_new = jnp.where(ok[:, None], fit(uv_v), scene.obs[view_slot])
    obs = scene.obs.at[view_i].set(obs_i).at[view_slot].set(obs_v_new)
    obs_mask = (
        scene.obs_mask
        .at[view_i].set(scene.obs_mask[view_i] | ok)
        .at[view_slot].set(scene.obs_mask[view_slot] | ok)
    )
    desc = jnp.where(ok[:, None], fit(feats_i.desc), scene.desc)
    return scene._replace(X=Xl, X_valid=X_valid, obs=obs, obs_mask=obs_mask,
                          desc=desc)


def invert_matches(m: Matches, capacity_train: int) -> Matches:
    """Flip match direction: train-indexed view of a query->train mapping.

    Masked entries scatter to a DUMMY slot one past the end (then sliced
    off) so they can never clobber a live train index. best/second stay
    query-indexed in the reference convention and are not meaningful after
    inversion; they are zeroed."""
    q = jnp.arange(m.idx.shape[0], dtype=jnp.int32)
    safe = jnp.where(m.mask, m.idx, capacity_train)  # dummy slot
    inv = jnp.full((capacity_train + 1,), -1, jnp.int32).at[safe].set(
        jnp.where(m.mask, q, -1)
    )[:capacity_train]
    zeros = jnp.zeros((capacity_train,), jnp.int32)
    return Matches(idx=inv, best=zeros, second=zeros)


def reconstruct_scene(
    key,
    features: list,            # V Features banks
    pair_matches: dict,        # (i, j) -> Matches
    pair_geo: dict,            # (i, j) -> TwoViewGeometry
    cams: list,                # V Camera
    Ks: jnp.ndarray,           # (V, 3, 3)
    dists: jnp.ndarray,        # (V, 3)
    scale: float,
    num_landmarks: int,
    refiner_opts,
    ransac_opts,
) -> Tuple[Scene, "BAResult"]:
    """Full multi-view incremental reconstruction (reconstructScene parity,
    Reconstructor.hpp:102-164).

    Host-orchestrated events over jitted device steps:
      1. seed pair = argmax geometric-inlier count (:112-118)
      2. two-view triangulation with world origin at the seed-first view and
         the relative translation scaled by `scale` (:185-239)
      3. every remaining view: P3P resection from seed-keyed 2D-3D
         correspondences + observation extension + new-landmark triangulation
         with the resection gates (:259-415)
      4. final bundle adjustment (:150-161)
    """
    import jax as _jax

    from coloc_tpu.robust import absolute_pose_p3p

    V = len(features)
    # 1. seed pair
    seed = max(pair_geo, key=lambda p: int(pair_geo[p].n_inliers))
    i, j = seed
    geo = pair_geo[seed]

    # 2. bootstrap (scene view rows: row 0 = view i, row 1 = view j, then
    # remaining views in index order)
    order = [i, j] + [v for v in range(V) if v not in (i, j)]
    row_of = {v: r for r, v in enumerate(order)}

    two = two_view_scene(
        features[i], features[j], pair_matches[seed], geo.inliers,
        geo.R, geo.t, Pose(R=jnp.eye(3), C=jnp.zeros(3)), scale,
        cams[i], cams[j], num_landmarks=num_landmarks,
    )
    # widen to V view rows
    scene = Scene(
        Rs=jnp.concatenate([two.Rs, jnp.tile(jnp.eye(3)[None], (V - 2, 1, 1))]),
        Cs=jnp.concatenate([two.Cs, jnp.zeros((V - 2, 3))]),
        X=two.X, X_valid=two.X_valid,
        obs=jnp.concatenate([two.obs, jnp.zeros((V - 2,) + two.obs.shape[1:])]),
        obs_mask=jnp.concatenate(
            [two.obs_mask, jnp.zeros((V - 2,) + two.obs_mask.shape[1:], bool)]
        ),
        desc=two.desc,
    )

    # 3. resect remaining views from seed-keyed correspondences
    for v in order[2:]:
        if (i, v) in pair_matches:
            m_iv = pair_matches[(i, v)]
        elif (v, i) in pair_matches:
            m_iv = invert_matches(pair_matches[(v, i)], features[i].capacity)
        else:
            continue
        # 2D-3D: landmark slot = seed feature index (track through the seed)
        lm_idx = jnp.arange(features[i].capacity)
        lm_ok = m_iv.mask & scene.X_valid[: features[i].capacity]
        X_corr = scene.X[lm_idx]
        uv_corr = features[v].xy[m_iv.idx]
        key, sub = _jax.random.split(key)
        pose_v, inl, n_inl, success = absolute_pose_p3p(
            sub, X_corr, uv_corr, lm_ok, cams[v], ransac_opts
        )
        if not bool(success):
            continue
        # matches_iv maps seed-q -> v-feature; build a Matches whose idx maps
        # landmark slot (= q) to the v feature for observation scatter
        obs_matches = Matches(
            idx=jnp.arange(features[i].capacity, dtype=jnp.int32),
            best=m_iv.best, second=m_iv.second,
        )
        scene = resect_and_extend(
            scene,
            feats_new=features[v]._replace(
                xy=features[v].xy[m_iv.idx],
                valid=features[v].valid[m_iv.idx] & m_iv.mask,
            ),
            map_matches=obs_matches._replace(
                idx=jnp.where(lm_ok & inl, obs_matches.idx, -1)
            ),
            pose_new=pose_v,
            pose_inliers=inl,
            cam_new=cams[v],
            view_slot=jnp.int32(row_of[v]),
        )
        scene = triangulate_new_landmarks(
            scene, features[i], features[v], m_iv,
            jnp.ones_like(m_iv.mask), 0,
            jnp.int32(row_of[v]), pose_v, cams[i], cams[v],
            num_landmarks=num_landmarks,
        )

    # 4. final BA (first pose fixed)
    order_idx = jnp.asarray(order)
    fix = jnp.asarray([True] + [False] * (V - 1))
    scene, res = refine_scene(
        scene, Ks[order_idx], dists[order_idx], refiner_opts, fix,
        cov_view=1,
    )
    return scene, res


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

    # scatter: landmark slot map_matches.idx[q] observed at feats_new.xy[q].
    # Masked rows scatter to a dummy slot L (sliced off) so duplicate-index
    # writes cannot clobber a live landmark's observation.
    lm = map_matches.idx                                  # (K,)
    ok = map_matches.mask & pose_inliers & feats_new.valid
    lm_safe = jnp.where(ok, lm, L)
    obs_v = jnp.zeros((L + 1, 2)).at[lm_safe].set(
        jnp.where(ok[:, None], feats_new.xy, 0.0)
    )[:L]
    mask_v = jnp.zeros((L + 1,), bool).at[lm_safe].set(ok)[:L]

    obs = scene.obs.at[view_slot].set(obs_v)
    obs_mask = scene.obs_mask.at[view_slot].set(mask_v & scene.X_valid)
    Rs = scene.Rs.at[view_slot].set(pose_new.R)
    Cs = scene.Cs.at[view_slot].set(pose_new.C)
    return scene._replace(Rs=Rs, Cs=Cs, obs=obs, obs_mask=obs_mask)
