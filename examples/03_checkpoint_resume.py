"""Checkpoint / resume: persist a session's map database + Kalman bank +
RNG, then resume localization in a brand-new session (new process in real
deployments — the cross-process path is covered by tests/test_checkpoint.py).

The reference only ever SAVES artifacts (PLY / scene files,
Reconstructor.hpp:417-423) and never loads them back; here the saved map
is the live resident bank a resumed session localizes against immediately.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root (no install needed)


import numpy as np

from coloc_tpu import checkpoint
from coloc_tpu.config import ColocConfig, DetectorOptions
from coloc_tpu.io import synthetic
from coloc_tpu.session import ColocSession

H, W = 240, 320
K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32)


def make_session():
    config = ColocConfig(
        num_drones=2,
        detector=DetectorOptions(width=W, height=H, max_keypoints=512,
                                 num_levels=4, fast_threshold=10),
        max_landmarks=512,
    )
    return ColocSession(config, np.stack([K, K]), np.zeros((2, 3), np.float32))


def main():
    scene = synthetic.make_scene(H, W, K, seed=3)
    Rs0, Cs0 = synthetic.trajectory(4, 0)
    Rs1, Cs1 = synthetic.trajectory(4, 1)
    render = lambda d, f: synthetic.render(
        scene, (Rs0, Rs1)[d][f], (Cs0, Cs1)[d][f]
    )

    # --- session A: bootstrap a map, localize a frame, checkpoint ---------
    a = make_session()
    a.init_map({0: render(0, 0), 1: render(1, 0)})
    a.intra_pose(0, render(0, 1))
    checkpoint.save_session("runs/example03.ckpt", a)
    print(f"saved: {int(np.asarray(a.mapdb.valid).sum())} landmarks, "
          f"frame counter {a.frame}")

    # --- session B: fresh object, resume, localize against the saved map --
    b = make_session()
    checkpoint.load_session("runs/example03.ckpt", b)
    assert b.map_ready and b.frame == a.frame
    pwc = b.intra_pose(0, render(0, 2))
    err = np.linalg.norm(np.asarray(pwc.pose.C) - Cs0[2])
    print(f"resumed session localized frame 2: success={bool(pwc.success)} "
          f"center error={err:.3f}")


if __name__ == "__main__":
    main()
