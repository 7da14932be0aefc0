"""Two-drone collaborative localization session on a synthetic scene.

The library-API version of `python -m coloc_tpu.cli --synthetic`:
  1. render two drones' camera trajectories over one textured ground scene
  2. bootstrap the shared landmark map from the first frame pair (init_map)
  3. per frame: detect -> match against the resident map bank -> P3P
     localize -> pose-only refine -> Kalman filter   (intraPoseEstimator)
  4. every `inter_every` frames: pairwise relative pose + covariance
     intersection between the drones                 (interPoseEstimator)

Reference analog: ColoC::mainThread (coloc.hpp:96-148).
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root (no install needed)


import numpy as np

from coloc_tpu.config import ColocConfig, DetectorOptions
from coloc_tpu.io import synthetic
from coloc_tpu.session import ColocSession

H, W = 240, 320
K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32)
NUM_FRAMES = 8


def main():
    # --- synthetic dataset: one scene, two drone trajectories ------------
    scene = synthetic.make_scene(H, W, K, seed=3)
    frames, gt = {}, {}
    for d in range(2):
        Rs, Cs = synthetic.trajectory(NUM_FRAMES, d)
        frames[d] = [synthetic.render(scene, Rs[f], Cs[f])
                     for f in range(NUM_FRAMES)]
        gt[d] = (Rs, Cs)

    # --- session ----------------------------------------------------------
    config = ColocConfig(
        num_drones=2,
        detector=DetectorOptions(width=W, height=H, max_keypoints=512,
                                 num_levels=4, fast_threshold=10),
        max_landmarks=512,
    )
    Ks = np.stack([K, K])
    dists = np.zeros((2, 3), np.float32)

    with ColocSession(config, Ks, dists, out_dir="runs/example01") as session:
        results = session.run(frames, inter_every=3)

        print(f"map ready: {session.map_ready}  "
              f"landmarks: {int(np.asarray(session.mapdb.valid).sum())}")
        for d in (0, 1):
            ok = [bool(p.success) for p in results[d]]
            C_est = np.stack([np.asarray(p.pose.C) for p in results[d]])
            drift = np.linalg.norm(C_est[-1] - C_est[0])
            print(f"drone {d}: localized {sum(ok)}/{len(ok)} frames, "
                  f"traveled {drift:.2f} (map units)")

    print("pose logs written to runs/example01/poses*.txt "
          "(reference CSV schema, logUtils.hpp:69-100)")


if __name__ == "__main__":
    main()
