"""Benchmark: frame-pairs matched+localized per second per chip.

The driver runs this on real TPU hardware each round. Measures the north-star
metric from BASELINE.json: one "op" = full frame processing — detect+describe
a frame, 2-NN Hamming match against the resident map bank, P3P RANSAC + pose
refinement. Timing uses feedback chaining (each iteration's input depends on
the previous output) because the remote-execution path pipelines/dedups
repeated identical dispatches (see .claude/skills/verify/SKILL.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 500 (the >=500 ops/sec/chip north-star target).

Env knobs: COLOC_BENCH_SMALL=1 for a tiny CPU-friendly config;
COLOC_BENCH_ITERS to override the timing loop length.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    small = os.environ.get("COLOC_BENCH_SMALL", "0") == "1"
    iters = int(os.environ.get("COLOC_BENCH_ITERS", "4" if small else "50"))

    from coloc_tpu.config import ColocConfig, DetectorOptions, MatcherOptions
    from coloc_tpu.frontend import detect_and_describe
    from coloc_tpu.geometry import camera as cam_ops
    from coloc_tpu.io import synthetic
    from coloc_tpu.matching import match_with_map
    from coloc_tpu.sfm import localize
    from coloc_tpu.types import MapDB

    if small:
        h, w, kp, landmarks, levels = 96, 128, 128, 256, 2
    else:
        # reference workload: 752x480 frames, 8-level 1.2x pyramid
        # (coloc_node.cpp:73-85), map bank at full maxkp-class capacity
        h, w, kp, landmarks, levels = 480, 752, 1024, 4096, 8

    config = ColocConfig(
        detector=DetectorOptions(
            width=w, height=h, max_keypoints=kp, num_levels=levels,
            fast_threshold=12,
        ),
        matcher=MatcherOptions(),
        max_landmarks=landmarks,
    )

    K = np.array(
        [[0.6 * w, 0, w / 2], [0, 0.6 * w, h / 2], [0, 0, 1]], np.float32
    )
    cam = cam_ops.Camera(K=jnp.asarray(K), dist=jnp.zeros(3, jnp.float32))

    # realistic frame + map: rendered synthetic scene, map built from
    # detected features at ground-truth-triangulated positions
    scene = synthetic.make_scene(h, w, K, seed=1)
    img = jnp.asarray(synthetic.render(scene, np.eye(3, dtype=np.float32),
                                       np.zeros(3, np.float32)))

    feats0 = detect_and_describe(img, config.detector)
    rng = np.random.default_rng(0)
    L = landmarks
    pad = max(L - kp, 0)
    mapdb = MapDB(
        X=jnp.asarray(
            np.concatenate(
                [np.c_[rng.uniform(-3, 3, (kp, 2)), rng.uniform(5, 14, (kp, 1))],
                 rng.uniform(-3, 3, (pad, 3))], axis=0
            )[:L], jnp.float32,
        ),
        desc=jnp.concatenate([
            feats0.desc,
            jnp.asarray(rng.integers(0, 2**32, (pad, 16), dtype=np.uint64)
                        .astype(np.uint32)),
        ])[:L],
        valid=jnp.ones(L, bool),
    )

    def frame_op(key, image):
        feats = detect_and_describe(image, config.detector)
        mm = match_with_map(feats, mapdb, config.matcher)
        pwc, _ = localize.localize_image(
            key, feats, mm, mapdb, cam, config.ransac, config.refiner
        )
        return pwc

    @jax.jit
    def loop(key, image):
        def body(i, carry):
            k, img_c = carry
            k1, k2 = jax.random.split(k)
            pwc = frame_op(k1, img_c)
            # feedback: perturb the image with the output so iterations chain
            img_next = image + pwc.rmse * 1e-7 + pwc.pose.C[0] * 1e-9
            return (k2, img_next)
        return jax.lax.fori_loop(0, iters, body, (key, image))

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    out = jax.block_until_ready(loop(key, img))
    compile_s = time.time() - t0

    t0 = time.time()
    out = jax.block_until_ready(loop(key, img))
    dt = (time.time() - t0) / iters

    ops_per_sec = 1.0 / dt
    result = {
        "metric": "frame match+localize ops/sec/chip",
        "value": round(ops_per_sec, 2),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_sec / 500.0, 4),
    }
    print(json.dumps(result))
    # extra context on stderr-style line (driver reads only the JSON line)
    import sys
    print(
        f"# backend={jax.default_backend()} config={w}x{h} kp={kp} "
        f"map={landmarks} iters={iters} compile={compile_s:.1f}s "
        f"latency={dt * 1e3:.2f}ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
