"""Dissect match_with_map cost: unpack vs kernel vs accept logic."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from coloc_tpu.config import MatcherOptions
from coloc_tpu.ops import hamming
from coloc_tpu.matching import match_with_map, pack_map_bank
from coloc_tpu.types import Features, MapDB

Q, T = 1024, 4096
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
    cmp_rate = Q * T / dt / 1e9
    print(f"{name:44s} {dt*1e3:8.3f} ms   {cmp_rate:8.1f} G cmp/s")


def main():
    rng = np.random.default_rng(0)
    qd = jnp.asarray(rng.integers(0, 2**32, (Q, 16), dtype=np.uint64)
                     .astype(np.uint32))
    td = jnp.asarray(rng.integers(0, 2**32, (T, 16), dtype=np.uint64)
                     .astype(np.uint32))
    qv = jnp.ones(Q, bool)
    tv = jnp.ones(T, bool)
    mapdb = MapDB(X=jnp.zeros((T, 3)), desc=td, valid=tv)
    bank = pack_map_bank(mapdb)
    opts = MatcherOptions()

    def s_unpack(c):
        s = hamming.unpack_bipolar(qd ^ (c[0] > 1e30).astype(jnp.uint32))
        return c + s.sum(dtype=jnp.int32).astype(jnp.float32) * 1e-12

    def s_kernel(c):
        idx, best, second = hamming.hamming_2nn_bank(
            qd ^ (c[0] > 1e30).astype(jnp.uint32), qv, bank)
        return c + best.sum().astype(jnp.float32) * 1e-12

    def s_full(c):
        feats = Features(xy=jnp.zeros((Q, 2)), score=jnp.zeros(Q),
                         scale=jnp.zeros(Q, jnp.int32), angle=jnp.zeros(Q),
                         desc=qd ^ (c[0] > 1e30).astype(jnp.uint32), valid=qv)
        m = match_with_map(feats, mapdb, opts, bank=bank)
        return c + m.best.sum().astype(jnp.float32) * 1e-12

    x0 = jnp.zeros(1, jnp.float32)
    chain("unpack query only", s_unpack, x0)
    chain("hamming_2nn_bank (kernel+unpack)", s_kernel, x0)
    chain("match_with_map (bank, full)", s_full, x0)

    # kernel with pre-unpacked query (isolate the pallas kernel)
    sq = hamming.unpack_bipolar(qd)
    sqp = jnp.pad(sq, ((0, 0), (0, 0)))

    def s_raw(c):
        sq2 = sq + (c[0] > 1e30).astype(jnp.int8)
        idx, best, second = hamming._k2nn_pallas_padded(sq2, bank[0], bank[1])
        return c + best.sum().astype(jnp.float32) * 1e-12
    chain("raw pallas kernel (pre-unpacked)", s_raw, x0)


if __name__ == "__main__":
    main()
