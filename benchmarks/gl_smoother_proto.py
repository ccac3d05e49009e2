"""Prototype smoother variants for the GL 3D system in scipy (fast
iteration): which block structure + Chebyshev config matches/beats the
reference's scalar GS 5+5 at the FGMRES(10)x4 budget?"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import numpy.linalg as npl
import scipy.sparse as sp

from benchmarks.ref_gs_replication import build_problem, fgmres40


def line_inverses(AtA, dims, n_mi, axis, ridge=1e-8):
    """Explicit inverses of the line-diagonal blocks along `axis`."""
    idx = np.arange(int(np.prod(dims)) * n_mi).reshape(tuple(dims) + (n_mi,))
    idx = np.moveaxis(idx, axis, -2).reshape(-1, dims[axis] * n_mi)
    M = AtA.tocsr()
    invs, lines = [], []
    for line in idx:
        B = M[np.ix_(line, line)].toarray()
        B = B + ridge * np.trace(B) / len(line) * np.eye(len(line))
        invs.append(npl.inv(B))
        lines.append(line)
    return lines, invs


def make_block_apply(lineset):
    def apply(r):
        out = np.zeros_like(r)
        for lines, invs in lineset:
            acc = np.zeros_like(r)
            for line, inv in zip(lines, invs):
                acc[line] = inv @ r[line]
            out += acc
        return out / len(lineset)
    return apply


def cheb(mv, Bapply, b, x, lmax, steps, ratio):
    lmin = lmax / ratio
    theta = (lmax + lmin) / 2
    delta = (lmax - lmin) / 2
    sigma = theta / delta
    rho = 1 / sigma
    r = b - mv(x)
    d = Bapply(r) / theta
    for _ in range(steps):
        x = x + d
        r = r - mv(d)
        rho_new = 1 / (2 * sigma - rho)
        d = rho_new * rho * d + (2 * rho_new / delta) * Bapply(r)
        rho = rho_new
    return x


def power_lmax(mv, Bapply, n, iters=15):
    x = np.sin(np.arange(n) + 1.0)
    x /= npl.norm(x)
    for _ in range(iters):
        y = Bapply(mv(x))
        x = y / npl.norm(y)
    return 1.1 * x @ Bapply(mv(x))


def main():
    layer, mgs, A_list, rhs_vec, ng, dims = build_problem("gl")
    AtA = [(A.T @ A).tocsr() for A in A_list]
    coarse = AtA[-1].toarray()
    b = A_list[0].T @ rhs_vec
    n_mi = 7

    def restrict(k, x):
        return np.asarray(mgs._restrict_vec(k, jnp.asarray(x)))

    def prolong(k, x):
        return np.asarray(mgs._prolong_vec(k, jnp.asarray(x)))

    for name, axes, steps, ratio in [
        ("t-line     s10 r16", (0,), 10, 16.0),
        ("x-line     s10 r16", (1,), 10, 16.0),
        ("xy-lines   s10 r16", (1, 2), 10, 16.0),
        ("txy-lines  s10 r16", (0, 1, 2), 10, 16.0),
        ("xy-lines   s16 r30", (1, 2), 16, 30.0),
    ]:
        # build per-level data
        Bapp, LMAX = [], []
        for k in range(ng - 1):
            dk = mgs.dim_list[k]
            lineset = [line_inverses(AtA[k], dk, n_mi, ax) for ax in axes]
            app = make_block_apply(lineset)
            Bapp.append(app)
            LMAX.append(power_lmax(lambda v, k=k: AtA[k] @ v, app, AtA[k].shape[0]))

        def vc(k, bb, x):
            mv = lambda v: AtA[k] @ v
            x = cheb(mv, Bapp[k], bb, x, LMAX[k], steps, ratio)
            rH = restrict(k, bb - mv(x))
            dH = npl.solve(coarse, rH) if k == ng - 2 else vc(k + 1, rH, np.zeros_like(rH))
            x = x + prolong(k, dH)
            return cheb(mv, Bapp[k], bb, x, LMAX[k], steps, ratio)

        rel = fgmres40(AtA[0], lambda v: vc(0, v, np.zeros_like(b)), b)
        print(f"[gl] {name}: relres@40 = {rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
