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

    # degree-10 poly coefficients for DK
    def npoly_of(Mb):
        tail = fivept._gj_tail(Mb)

        def row_polys(r):
            P = jnp.stack([r[2], r[1], r[0]])
            Q = jnp.stack([r[5], r[4], r[3]])
            R = jnp.stack([r[9], r[8], r[7], r[6]])
            return P, Q, R

        def combine(ra, rb):
            Pa, Qa, Ra = row_polys(ra)
            Pb, Qb, Rb = row_polys(rb)
            P = jnp.pad(Pa, (0, 1)) - jnp.concatenate([jnp.zeros(1), Pb])
            Q = jnp.pad(Qa, (0, 1)) - jnp.concatenate([jnp.zeros(1), Qb])
            R = jnp.pad(Ra, (0, 1)) - jnp.concatenate([jnp.zeros(1), Rb])
            return P, Q, R

        Pk, Qk, Rk = combine(tail[4], tail[5])
        Pl, Ql, Rl = combine(tail[6], tail[7])
        Pm, Qm, Rm = combine(tail[8], tail[9])
        return fivept._det3_polys((Pk, Pl, Pm), (Qk, Ql, Qm), (Rk, Rl, Rm))

    npolys = jax.vmap(npoly_of)(M)

    def s_det(k, c):
        p = jax.vmap(npoly_of)(M + c * 1e-12)
        return c + p[0, 0] * 1e-12
    chain("GJ + det3 poly build", s_det, jnp.float32(0))

    def s_dk(k, c):
        r, isr = jax.vmap(fivept._durand_kerner)(npolys + c * 1e-12)
        return c + jnp.real(r[0, 0]) * 1e-12
    chain("Durand-Kerner roots (24 it)", s_dk, jnp.float32(0))

    def s_full(k, c):
        Es, val = fivept.five_point_batch(jiggle(k, a1), a2)
        return c + Es[0, 0, 0, 0] * 1e-12
    chain("FULL five_point_batch", s_full, jnp.float32(0))


def tail_probe():
    """Separate probe: roots -> E (2x2 solve + GN polish + certificate)."""
    import numpy as np
    rng = np.random.default_rng(1)
    X = rng.uniform(-2, 2, (H, 5, 3)) + np.array([0, 0, 6.0])
    x1 = (X[..., :2] / X[..., 2:3]).astype(np.float32)
    Xc = X - np.array([0.3, 0.05, 0.0])
    x2 = (Xc[..., :2] / Xc[..., 2:3]).astype(np.float32)
    a1, a2 = jnp.asarray(x1), jnp.asarray(x2)

    import functools

    @jax.jit
    def upto_roots(b1, b2):
        def one(s1, s2):
            basis = fivept._null_basis(s1, s2)
            M = fivept._constraint_matrix(basis)
            tail = fivept._gj_tail(M)

            def row_polys(r):
                P = jnp.stack([r[2], r[1], r[0]])
                Q = jnp.stack([r[5], r[4], r[3]])
                R = jnp.stack([r[9], r[8], r[7], r[6]])
                return P, Q, R

            def combine(ra, rb):
                Pa, Qa, Ra = row_polys(ra)
                Pb, Qb, Rb = row_polys(rb)
                P = jnp.pad(Pa, (0, 1)) - jnp.concatenate([jnp.zeros(1), Pb])
                Q = jnp.pad(Qa, (0, 1)) - jnp.concatenate([jnp.zeros(1), Qb])
                R = jnp.pad(Ra, (0, 1)) - jnp.concatenate([jnp.zeros(1), Rb])
                return P, Q, R

            Pk, Qk, Rk = combine(tail[4], tail[5])
            Pl, Ql, Rl = combine(tail[6], tail[7])
            Pm, Qm, Rm = combine(tail[8], tail[9])
            npoly = fivept._det3_polys((Pk, Pl, Pm), (Qk, Ql, Qm), (Rk, Rl, Rm))
            roots, is_real = fivept._durand_kerner(npoly)
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
