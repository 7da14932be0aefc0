"""Checkpoint/resume tests: a saved session must localize identically after
reload (SURVEY.md §5: map database as the checkpointable unit)."""

import numpy as np
import pytest

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


@pytest.fixture(scope="module")
def frames():
    scene = synthetic.make_scene(H, W, K, seed=3)
    out = {}
    for d in range(2):
        Rs, Cs = synthetic.trajectory(3, d)
        out[d] = [synthetic.render(scene, Rs[f], Cs[f]) for f in range(3)]
    return out


def test_session_roundtrip(frames, tmp_path):
    s1 = make_session()
    assert s1.init_map({0: frames[0][0], 1: frames[1][0]})
    p_before = s1.intra_pose(0, frames[0][1])
    ckpt = str(tmp_path / "session.npz")
    checkpoint.save_session(ckpt, s1)

    s2 = make_session()
    checkpoint.load_session(ckpt, s2)
    assert s2.map_ready
    assert int(s2.mapdb.count) == int(s1.mapdb.count)
    # filter state carried over exactly
    np.testing.assert_array_equal(
        np.asarray(s2.filter_bank.x), np.asarray(s1.filter_bank.x)
    )
    # resumed session localizes the next frame against the restored map
    p2 = s2.intra_pose(1, frames[1][1])
    assert bool(p2.success)


def test_mapdb_roundtrip(frames, tmp_path):
    s = make_session()
    assert s.init_map({0: frames[0][0], 1: frames[1][0]})
    p = str(tmp_path / "map.npz")
    checkpoint.save_mapdb(p, s.mapdb)
    db = checkpoint.load_mapdb(p)
    np.testing.assert_array_equal(np.asarray(db.X), np.asarray(s.mapdb.X))
    np.testing.assert_array_equal(np.asarray(db.desc), np.asarray(s.mapdb.desc))
