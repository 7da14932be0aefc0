"""Micro-bench: per-keypoint patch extraction + einsum sampling on TPU."""

import time

import numpy as np
import jax
import jax.numpy as jnp

H, W, K, NS = 480, 752, 1024, 256
ITERS = 100


def chain(name, fn, x0):
    @jax.jit
    def loop(x):
        def body(i, c):
            return fn(c)
        return jax.lax.fori_loop(0, ITERS, body, x0)
    jax.block_until_ready(loop(x0))
    t0 = time.time()
    jax.block_until_ready(loop(x0))
    dt = (time.time() - t0) / ITERS
    print(f"{name:48s} {dt*1e3:8.3f} ms")


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    ky = jnp.asarray(rng.integers(30, H - 90, K), jnp.int32)
    kx = jnp.asarray(rng.integers(30, W - 90, K), jnp.int32)
    # per-kp sample offsets within patch (float, bilinear)
    sy = jnp.asarray(rng.uniform(2, 50, (K, NS)), jnp.float32)
    sx = jnp.asarray(rng.uniform(2, 50, (K, NS)), jnp.float32)

    def patches_52(c):
        d = (c[0] < 1e30).astype(jnp.int32) - 1
        p = jax.vmap(lambda y, x: jax.lax.dynamic_slice(img, (y + d, x), (52, 52)))(ky, kx)
        return c + p.sum() * 1e-12

    def patches_56x128(c):
        d = (c[0] < 1e30).astype(jnp.int32) - 1
        xa = (kx // 128) * 128
        p = jax.vmap(lambda y, x: jax.lax.dynamic_slice(img, (y + d, x), (56, 128)))(ky, xa)
        return c + p.sum() * 1e-12

    def full(c):
        # patches + two-stage bilinear einsum sampling (lane first, then row)
        d = (c[0] < 1e30).astype(jnp.int32) - 1
        P = jax.vmap(lambda y, x: jax.lax.dynamic_slice(img, (y + d, x), (52, 52)))(ky, kx)
        # col weights: (K, NS, 52) linear-interp one-hots
        ci = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 52), 2)
        Cw = jnp.clip(1.0 - jnp.abs(ci - sx[:, :, None]), 0.0, 1.0)
        Q = jnp.einsum("krc,kic->kir", P, Cw,
                       precision=jax.lax.Precision.DEFAULT)     # (K, NS, 52)
        ri = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 52), 2)
        Rw = jnp.clip(1.0 - jnp.abs(ri - sy[:, :, None]), 0.0, 1.0)
        v = jnp.sum(Q * Rw, axis=2)                              # (K, NS)
        return c + v.sum() * 1e-12

    def full_bf16(c):
        d = (c[0] < 1e30).astype(jnp.int32) - 1
        P = jax.vmap(lambda y, x: jax.lax.dynamic_slice(img, (y + d, x), (52, 52)))(ky, kx)
        P = P.astype(jnp.bfloat16)
        ci = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 52), 2)
        Cw = jnp.clip(1.0 - jnp.abs(ci - sx[:, :, None]), 0.0, 1.0).astype(jnp.bfloat16)
        Q = jnp.einsum("krc,kic->kir", P, Cw,
                       precision=jax.lax.Precision.DEFAULT)
        ri = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 52), 2)
        Rw = jnp.clip(1.0 - jnp.abs(ri - sy[:, :, None]), 0.0, 1.0).astype(jnp.bfloat16)
        v = jnp.sum((Q * Rw).astype(jnp.float32), axis=2)
        return c + v.sum() * 1e-12

    x0 = jnp.zeros(1, jnp.float32)
    chain("vmap dynamic_slice 52x52 (K=1024)", patches_52, x0)
    chain("vmap dynamic_slice 56x128 aligned", patches_56x128, x0)
    chain(f"patches + einsum sample (NS={NS}) f32", full, x0)
    chain(f"patches + einsum sample (NS={NS}) bf16", full_bf16, x0)


if __name__ == "__main__":
    main()
