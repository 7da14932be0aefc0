"""KITTI-odometry-layout ingest tests (mock sequence written in the
standard sequences/<NN>/{image_0,calib.txt,times.txt} + poses/<NN>.txt
form). Mirrors tests/test_euroc.py for the --kitti runpath."""

import os

import numpy as np
import pytest
from PIL import Image

from coloc_tpu.io import kitti, synthetic


H, W = 96, 128
K = np.array([[100.0, 0, 64], [0, 101.0, 48], [0, 0, 1]], np.float32)


def _write_sequence(root, nn, n, scene, drone, with_poses=True,
                    with_times=True, frame0=0):
    """Write sequences/<nn>/{image_0,calib.txt,times.txt} and (optionally)
    poses/<nn>.txt under `root`; returns the sequence directory."""
    seq = os.path.join(root, "sequences", nn)
    img_dir = os.path.join(seq, "image_0")
    os.makedirs(img_dir)
    # KITTI calib: P0..P3 rows of 12; rectified pinhole (zero distortion)
    P = np.hstack([K, np.zeros((3, 1), np.float32)])
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        for key in ("P0", "P1", "P2", "P3"):
            f.write(key + ": " + " ".join(f"{v:.6e}" for v in P.ravel())
                    + "\n")
        f.write("Tr: " + " ".join("0" for _ in range(12)) + "\n")
    if with_times:
        with open(os.path.join(seq, "times.txt"), "w") as f:
            for i in range(n):
                f.write(f"{0.1 * i:.6e}\n")

    from coloc_tpu.io.synthetic import trajectory, render

    Rs, Cs = trajectory(n, drone)
    for i in range(n):
        img = render(scene, Rs[i], Cs[i]).astype(np.uint8)
        Image.fromarray(img, mode="L").save(
            os.path.join(img_dir, f"{frame0 + i:06d}.png"))
    if with_poses:
        os.makedirs(os.path.join(root, "poses"), exist_ok=True)
        with open(os.path.join(root, "poses", nn + ".txt"), "w") as f:
            for i in range(n):
                M = np.hstack([Rs[i].T, Cs[i].reshape(3, 1)])
                f.write(" ".join(f"{v:.9e}" for v in M.ravel()) + "\n")
    return seq


class TestKittiIngest:
    def test_read_calib_and_frames(self, tmp_path):
        scene = synthetic.make_scene(H, W, K, seed=4)
        seq = _write_sequence(str(tmp_path), "00", 5, scene, 0)

        Kc, dist = kitti.read_calib(seq)
        np.testing.assert_allclose(Kc, K, atol=1e-4)
        np.testing.assert_allclose(dist, 0.0)  # rectified -> no distortion

        flist = kitti.list_frames(seq)
        assert [i for i, _ in flist] == list(range(5))
        t = kitti.read_times(seq)
        assert t.shape == (5,) and abs(t[3] - 0.3) < 1e-9

    def test_read_calib_other_camera(self, tmp_path):
        scene = synthetic.make_scene(H, W, K, seed=4)
        seq = _write_sequence(str(tmp_path), "00", 1, scene, 0)
        # P1 exists in calib.txt even though image_1/ wasn't written
        Kc, _ = kitti.read_calib(seq, cam="image_1")
        np.testing.assert_allclose(Kc, K, atol=1e-4)

    def test_not_a_sequence_dir(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            kitti.read_calib(str(tmp_path))

    def test_load_two_sequences_index_aligned(self, tmp_path):
        scene = synthetic.make_scene(H, W, K, seed=4)
        s0 = _write_sequence(str(tmp_path), "00", 5, scene, 0)
        s1 = _write_sequence(str(tmp_path), "01", 7, scene, 1)

        frames, Ks, dists, size, idx = kitti.load_dataset(
            [s0, s1], num_frames=4, with_indices=True)
        assert size == (W, H)
        assert Ks.shape == (2, 3, 3) and dists.shape == (2, 3)
        # truncated to min length then to num_frames; index alignment
        assert len(frames[0]) == len(frames[1]) == 4
        assert idx[0] == idx[1] == [0, 1, 2, 3]
        assert frames[0][0].shape == (H, W)
        # distinct trajectories -> distinct pixels
        assert not np.array_equal(frames[0][0], frames[1][0])

    def test_load_with_stride(self, tmp_path):
        scene = synthetic.make_scene(H, W, K, seed=4)
        seq = _write_sequence(str(tmp_path), "02", 6, scene, 0)
        frames, _, _, _, idx = kitti.load_dataset(
            [seq], stride=2, with_indices=True)
        assert idx[0] == [0, 2, 4] and len(frames[0]) == 3

    def test_groundtruth_load_and_association(self, tmp_path):
        scene = synthetic.make_scene(H, W, K, seed=4)
        seq = _write_sequence(str(tmp_path), "03", 4, scene, 0,
                              with_poses=False)
        assert kitti.load_groundtruth(seq) is None  # absent -> gated off

        seq = _write_sequence(str(tmp_path / "gt"), "03", 4, scene, 0)
        gt = kitti.load_groundtruth(seq)
        assert gt is not None
        idx_gt, pos_gt = gt
        assert idx_gt.shape == (4,) and pos_gt.shape == (4, 3)
        from coloc_tpu.io.synthetic import trajectory

        _, Cs = trajectory(4, 0)
        np.testing.assert_allclose(pos_gt, Cs, atol=1e-6)
        # direct row lookup + clamping of out-of-range indices
        at = kitti.groundtruth_at(idx_gt, pos_gt, [1, 3, 99])
        np.testing.assert_allclose(at[0], Cs[1], atol=1e-6)
        np.testing.assert_allclose(at[2], Cs[3], atol=1e-6)

    def test_groundtruth_poses_txt_inside_sequence(self, tmp_path):
        """A poses.txt directly inside the sequence dir (common for
        extracted single sequences) is accepted too."""
        scene = synthetic.make_scene(H, W, K, seed=4)
        seq = _write_sequence(str(tmp_path), "04", 3, scene, 0,
                              with_poses=False)
        from coloc_tpu.io.synthetic import trajectory

        Rs, Cs = trajectory(3, 0)
        with open(os.path.join(seq, "poses.txt"), "w") as f:
            for i in range(3):
                M = np.hstack([Rs[i].T, Cs[i].reshape(3, 1)])
                f.write(" ".join(f"{v:.9e}" for v in M.ravel()) + "\n")
        gt = kitti.load_groundtruth(seq)
        assert gt is not None and gt[1].shape == (3, 3)


class TestCliKittiRunpath:
    def test_cli_kitti_with_groundtruth_reports_ate(self, tmp_path, capsys):
        """End-to-end --kitti runpath: two mock odometry sequences with
        poses ground truth -> session runs -> per-drone ATE/RPE lines
        print (completes BASELINE's 'EuRoC/KITTI' accuracy surface)."""
        from coloc_tpu import cli

        scene = synthetic.make_scene(H, W, K, seed=4)
        seqs = [_write_sequence(str(tmp_path), f"{d:02d}", 6, scene, d)
                for d in range(2)]
        out = str(tmp_path / "run_out")
        cli.main(["--kitti", *seqs, "--out", out, "--maxkp", "256",
                  "--fast-threshold", "10", "--inter-every", "0"])
        text = capsys.readouterr().out
        assert "loaded 2 KITTI sequences" in text
        assert "ATE=" in text, text
        assert "drone 0:" in text and "drone 1:" in text

    def test_cli_euroc_kitti_mutually_exclusive(self, tmp_path):
        from coloc_tpu import cli

        with pytest.raises(SystemExit):
            cli.main(["--euroc", "a", "--kitti", "b"])
