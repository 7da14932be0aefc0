"""Multi-chip drone-axis sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: 'multi-chip tests using JAX's CPU multi-device simulation')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coloc_tpu.config import ColocConfig, DetectorOptions
from coloc_tpu.fusion import kalman
from coloc_tpu.parallel import mesh as pmesh
from coloc_tpu.types import empty_mapdb


def tiny_config(h=64, w=96, kp=64, landmarks=128):
    return ColocConfig(
        num_drones=8,
        detector=DetectorOptions(
            width=w, height=h, max_keypoints=kp, num_levels=2,
            fast_threshold=20,
        ),
        max_landmarks=landmarks,
    )


class TestMesh:
    def test_devices_available(self):
        assert len(jax.devices()) == 8, (
            "conftest must provide 8 virtual CPU devices"
        )

    def test_collaborative_step_compiles_and_runs(self, rng):
        D, H, W = 8, 64, 96
        config = tiny_config(H, W)
        m = pmesh.make_mesh()
        step = pmesh.collaborative_step(m, config)

        keys = jax.random.split(jax.random.PRNGKey(0), D)
        images = jnp.asarray(rng.uniform(0, 255, (D, H, W)), jnp.float32)
        K = jnp.asarray([[80.0, 0, 48], [0, 80.0, 32], [0, 0, 1]], jnp.float32)
        Ks = jnp.broadcast_to(K, (D, 3, 3))
        dists = jnp.zeros((D, 3))
        fb = kalman.init(D, config.filter)
        mapdb = empty_mapdb(config.max_landmarks)._replace(
            X=jnp.asarray(rng.uniform(-3, 3, (config.max_landmarks, 3)), jnp.float32),
            desc=jnp.asarray(
                rng.integers(0, 2**32, (config.max_landmarks, 16), dtype=np.uint64)
                .astype(np.uint32)
            ),
            valid=jnp.ones(config.max_landmarks, bool),
        )

        args = pmesh.shard_inputs(m, keys, images, Ks, dists, fb, mapdb)
        fb2, pos, cov, fused_pos, fused_cov = step(*args)
        jax.block_until_ready(fb2)

        assert pos.shape == (D, 3)
        assert cov.shape == (D, 3, 3)
        assert fused_pos.shape == (D, 3)
        assert np.isfinite(np.asarray(fused_pos)).all()
        assert np.isfinite(np.asarray(fused_cov)).all()
        # filter bank advanced independently per drone
        assert fb2.x.shape == (D, 6)

    def test_sharded_map_match_equals_single_device(self, rng):
        """Map-sharded 2-NN (bank split over 8 devices + collective merge)
        must reproduce the single-device matcher exactly."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from coloc_tpu.config import MatcherOptions
        from coloc_tpu.ops import hamming
        from coloc_tpu.types import Matches

        Q, L = 96, 1024  # L divisible by 8 devices
        qd = jnp.asarray(
            rng.integers(0, 2**32, (Q, 16), dtype=np.uint64).astype(np.uint32)
        )
        td = jnp.asarray(
            rng.integers(0, 2**32, (L, 16), dtype=np.uint64).astype(np.uint32)
        )
        # plant exact matches so accepts exist
        qd = qd.at[:32].set(td[100:132])
        qv = jnp.ones(Q, bool)
        tv = jnp.asarray(rng.random(L) > 0.1)

        opts = MatcherOptions(mode="margin", margin_threshold=60)
        m = pmesh.make_mesh()
        run = pmesh.sharded_map_match(m, opts)
        dsh = NamedSharding(m, P(pmesh.DRONE_AXIS))
        out = run(qd, qv, jax.device_put(td, dsh), jax.device_put(tv, dsh))

        ridx, rbest, rsecond = hamming.hamming_2nn_xla(qd, td, qv, tv)
        np.testing.assert_array_equal(np.asarray(out.best), np.asarray(rbest))
        np.testing.assert_array_equal(
            np.asarray(out.second), np.asarray(rsecond)
        )
        # accepted matches agree with the single-device accept logic
        ok_ref = ((rsecond - rbest) > 60) & qv & (rbest <= 512)
        np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ok_ref))
        # indices achieve the best distance
        for q in np.nonzero(np.asarray(out.mask))[0]:
            d = int(hamming.hamming_distance(qd[q], td[int(out.idx[q])]))
            assert d == int(rbest[q])
