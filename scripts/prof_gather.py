"""Micro-bench: scalar gather vs chunked row-gather + lane select on TPU."""

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1_200_000
S = 200_000
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
    print(f"{name:45s} {dt*1e3:8.3f} ms")


def main():
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.uniform(0, 255, N), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, S), jnp.int32)

    Np = ((N + 127) // 128) * 128
    flat2d = jnp.pad(flat, (0, Np - N)).reshape(-1, 128)
    flat2d_bf16 = flat2d.astype(jnp.bfloat16)

    def scalar_gather(c):
        v = flat[idx + (c[0] < 1e30).astype(jnp.int32) - 1]
        return c + v.sum() * 1e-12

    def chunked(c):
        i = idx + (c[0] < 1e30).astype(jnp.int32) - 1
        rows = i >> 7
        lanes = i & 127
        chunks = jnp.take(flat2d, rows, axis=0)            # (S, 128)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, chunks.shape, 1)
        v = jnp.sum(jnp.where(lane_iota == lanes[:, None], chunks, 0.0), axis=1)
        return c + v.sum() * 1e-12

    def chunked_bf16(c):
        i = idx + (c[0] < 1e30).astype(jnp.int32) - 1
        rows = i >> 7
        lanes = i & 127
        chunks = jnp.take(flat2d_bf16, rows, axis=0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, chunks.shape, 1)
        v = jnp.sum(jnp.where(lane_iota == lanes[:, None], chunks,
                              jnp.bfloat16(0)), axis=1).astype(jnp.float32)
        return c + v.sum() * 1e-12

    def chunked_ds(c):
        # vmapped dynamic_slice row fetch (alternative lowering)
        i = idx + (c[0] < 1e30).astype(jnp.int32) - 1
        rows = i >> 7
        lanes = i & 127
        chunks = jax.vmap(
            lambda r: jax.lax.dynamic_slice(flat2d, (r, 0), (1, 128))[0]
        )(rows)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, chunks.shape, 1)
        v = jnp.sum(jnp.where(lane_iota == lanes[:, None], chunks, 0.0), axis=1)
        return c + v.sum() * 1e-12

    x0 = jnp.zeros(1, jnp.float32)
    chain(f"scalar gather (S={S})", scalar_gather, x0)
    chain("chunk row-take + lane onehot f32", chunked, x0)
    chain("chunk row-take + lane onehot bf16", chunked_bf16, x0)
    chain("chunk vmap dynamic_slice + onehot", chunked_ds, x0)


if __name__ == "__main__":
    main()
