"""Stage split of the batched-serving op at several batch sizes: one
resident-bank 2-NN over B*kp queries vs vmapped P3P localize+refine.
Explains the serving-throughput knee (bench _bench_batched_serving).

Run: PYTHONPATH=/root/.axon_site:. python scripts/prof_serving.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from coloc_tpu import matching
from coloc_tpu.config import ColocConfig, DetectorOptions, MatcherOptions
from coloc_tpu.frontend import detect_and_describe
from coloc_tpu.geometry import camera as cam_ops
from coloc_tpu.io import synthetic
from coloc_tpu.matching import pack_map_bank
from coloc_tpu.ops import hamming
from coloc_tpu.sfm import localize
from coloc_tpu.types import Matches

h, w, kp, L = 480, 752, 1024, 4096
config = ColocConfig(
    detector=DetectorOptions(width=w, height=h, max_keypoints=kp,
                             num_levels=8, fast_threshold=12),
    matcher=MatcherOptions(), max_landmarks=L)
K = np.array([[0.6 * w, 0, w / 2], [0, 0.6 * w, h / 2], [0, 0, 1]],
             np.float32)
cam = cam_ops.Camera(K=jnp.asarray(K), dist=jnp.zeros(3, jnp.float32))
scene = synthetic.make_scene(h, w, K, seed=1)
img = jnp.asarray(synthetic.render(scene, np.eye(3, dtype=np.float32),
                                   np.zeros(3, np.float32)))
feats0 = detect_and_describe(img, config.detector)
rng = np.random.default_rng(0)
mapdb = synthetic.consistent_mapdb(feats0, K, L, rng)
bank = pack_map_bank(mapdb)
iters = 300
key = jax.random.PRNGKey(0)

for B in (8, 16, 32):
    qv = jnp.tile(feats0.valid, B)

    @jax.jit
    def match_only(desc0, B=B, qv=qv):
        desc_b = jnp.broadcast_to(desc0, (B,) + desc0.shape)

        def body(i, db):
            q = db.reshape(B * kp, -1)
            idx, best, second = hamming.hamming_2nn_bank(q, qv, bank)
            z = (best[0] & 0).astype(jnp.uint32)
            return db ^ z
        return jax.lax.fori_loop(0, iters, body, desc_b)

    mm0 = matching.match_with_map(feats0, mapdb, config.matcher, bank=bank)
    mmb = Matches(idx=jnp.broadcast_to(mm0.idx, (B, kp)),
                  best=jnp.broadcast_to(mm0.best, (B, kp)),
                  second=jnp.broadcast_to(mm0.second, (B, kp)))

    @jax.jit
    def loc_only(key, B=B, mmb=mmb):
        def loc_one(k, m_row):
            pwc, _ = localize.localize_image(
                k, feats0, m_row, mapdb, cam, config.ransac, config.refiner)
            return pwc

        def body(i, carry):
            k, acc = carry
            k1, k2 = jax.random.split(k)
            pwcs = jax.vmap(loc_one)(jax.random.split(k1, B), mmb)
            return (k2, acc + pwcs.pose.C[0, 0] * 1e-9)
        return jax.lax.fori_loop(0, iters, body, (key, 0.0))

    jax.block_until_ready(match_only(feats0.desc))
    t0 = time.time(); jax.block_until_ready(match_only(feats0.desc))
    mdt = (time.time() - t0) / iters
    jax.block_until_ready(loc_only(key))
    t0 = time.time(); jax.block_until_ready(loc_only(key))
    ldt = (time.time() - t0) / iters
    print(f"B={B:3d}: 2nn={mdt*1e3:7.3f}ms ({mdt/B*1e3:6.3f}/stream)  "
          f"localize={ldt*1e3:7.3f}ms ({ldt/B*1e3:6.3f}/stream)")
