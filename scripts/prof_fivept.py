"""Micro-bench: 5-point solver internal stages, vmapped over the RANSAC
hypothesis batch."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from coloc_tpu.geometry import fivept

H = 256  # hypothesis batch (config.ransac.num_hypotheses)
ITERS = 300


def chain(name, fn, x0):
    @jax.jit
    def loop(x):
        def body(i, c):
            return fn(jax.random.fold_in(jax.random.PRNGKey(0), i), c)
        return jax.lax.fori_loop(0, ITERS, body, x0)
    jax.block_until_ready(loop(x0))
    t0 = time.time()
    jax.block_until_ready(loop(x0))
    print(f"{name:44s} {(time.time() - t0) / ITERS * 1e3:8.3f} ms")


def main():
    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, (H, 5, 3)) + np.array([0, 0, 6.0])
    x1 = (X[..., :2] / X[..., 2:3]).astype(np.float32)
    Xc = X - np.array([0.3, 0.05, 0.0])
    x2 = (Xc[..., :2] / Xc[..., 2:3]).astype(np.float32)
    a1, a2 = jnp.asarray(x1), jnp.asarray(x2)

    def jiggle(k, a):
        return a + jax.random.normal(k, a.shape) * 1e-9

    def s_null(k, c):
        b = jax.vmap(fivept._null_basis)(jiggle(k, a1), a2)
        return c + b[0, 0, 0, 0] * 1e-12
    chain("null basis (complete QR, vmapped)", s_null, jnp.float32(0))

    basis = jax.vmap(fivept._null_basis)(a1, a2)

    def s_cm(k, c):
        M = jax.vmap(fivept._constraint_matrix)(basis + c * 1e-12)
        return c + M[0, 0, 0] * 1e-12
    chain("constraint matrix (trace-time poly)", s_cm, jnp.float32(0))

    M = jax.vmap(fivept._constraint_matrix)(basis)

    def s_gj(k, c):
        t = jax.vmap(fivept._gj_tail)(M + c * 1e-12)
        return c + t[0, 0, 0] * 1e-12
    chain("Gauss-Jordan tail (10x10)", s_gj, jnp.float32(0))

    def s_front(k, c):
        # production front end via _reduced_system (GJ + polys + DK roots)
        _, _, _, _, roots, _ = jax.vmap(fivept._reduced_system)(
            jiggle(k, a1), a2
        )
        return c + jnp.real(roots[0, 0]) * 1e-12
    chain("front end incl. DK (_reduced_system)", s_front, jnp.float32(0))

    def s_full(k, c):
        Es, val = fivept.five_point_batch(jiggle(k, a1), a2)
        return c + Es[0, 0, 0, 0] * 1e-12
    chain("FULL five_point_batch", s_full, jnp.float32(0))


def tail_probe():
    """Chained probe of the UP-TO-ROOTS front end (null basis .. DK). The
    polish-tail cost is FULL five_point_batch minus this number; the Pallas
    polish kernel in fivept.py targets exactly that difference."""
    rng = np.random.default_rng(1)
    X = rng.uniform(-2, 2, (H, 5, 3)) + np.array([0, 0, 6.0])
    x1 = (X[..., :2] / X[..., 2:3]).astype(np.float32)
    Xc = X - np.array([0.3, 0.05, 0.0])
    x2 = (Xc[..., :2] / Xc[..., 2:3]).astype(np.float32)
    a1, a2 = jnp.asarray(x1), jnp.asarray(x2)

    @jax.jit
    def upto_roots(b1, b2):
        def one(s1, s2):
            _, _, _, _, roots, is_real = fivept._reduced_system(s1, s2)
            return roots, is_real
        return jax.vmap(one)(b1, b2)

    roots, is_real = upto_roots(a1, a2)

    def s_upto(k, c):
        r, _ = upto_roots(a1 + c * 1e-12, a2)
        return c + jnp.real(r[0, 0]) * 1e-12
    chain("up-to-roots (all stages chained)", s_upto, jnp.float32(0))


if __name__ == "__main__":
    main()
    tail_probe()
