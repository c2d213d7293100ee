"""Smoothed-aggregation AMG preconditioner for the divergence-free projection.

The reference makes large pressure-Poisson solves cheap with pyamg
smoothed-aggregation + CG (/root/reference/dataset/GraphDataset.py:1852-1877);
the round-4 CGNR replacement squares the condition number and cost 864 s warm
at 500k nodes (BASELINE.md) — the one parity row where the rebuild was
plainly slower than what it replaced (round-4 VERDICT missing #1).

TPU-native split (round 5):

- HOST assembles the composite operator A = sum_d G_d G_d EXACTLY with
  scipy.sparse from the projection's own LSQ stencils (~60-150 nnz/row;
  verified 2e-7 against the matvec), forms the SPD normal operator
  N = A^T A (~300-700 nnz/row after a mild drop tolerance on A), and
  builds a smoothed-aggregation hierarchy ON N: strength-filtered MIS
  aggregation, Jacobi-smoothed prolongation P = (I - w D^{-1}N) P_tent,
  Galerkin coarse operators, dense pinv at the coarsest level.  Measured
  dead ends recorded here so they stay dead: the row-normalized graph
  Laplacian and the "continuum transpose" proxy sum_d G_d^T G_d are BOTH
  spectrally unrelated to A on these one-sided LSQ stencils
  (corr(A p, -L p) ~ 0) — hierarchies built on them barely help; plain
  (unsmoothed) aggregation and direct AMG on the indefinite A diverge.
- DEVICE applies the Chebyshev-smoothed V-cycle: COO matvecs
  (``segment_sum``), COO prolongation/restriction, elementwise polynomials
  — static shapes, no data-dependent control flow.  With zero initial
  guess the cycle is a fixed LINEAR operator V ~ L^{-1}.
- The projection's inner solver stays CG on the NORMAL equations (monotone
  by construction — the round-1 design decision); the preconditioner is
  the V-cycle on N directly (M ~ N^{-1}).  Measured on the 3.5k-node duct:
  ~5x fewer CG iterations for equal divergence reduction.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def assemble_composite(nbr, mask, weights):
    """The composite projection operator A = sum_d G_d G_d (scipy CSR)
    from the LSQ weight stencils: (G_d p)_i = sum_k w[i,d,k] (p_j - p_i).
    Exactly make_consistent_matvec's trace-mode operator (verified 2e-7
    against the matvec in tests)."""
    import scipy.sparse as sp

    W = np.asarray(weights, np.float64)      # [N, 3, K]
    nbr = np.asarray(nbr)
    mask = np.asarray(mask, bool)
    n, _, K = W.shape
    r = np.repeat(np.arange(n), K)[mask.ravel()]
    c = nbr[mask]
    A = None
    for d in range(3):
        wd = W[:, d, :]
        Gd = (sp.coo_matrix((wd[mask], (r, c)), shape=(n, n)).tocsr()
              + sp.diags(-wd.sum(1)))
        A = Gd @ Gd if A is None else A + Gd @ Gd
    return A.tocsr()


def drop_small(M, tol: float):
    """Row-relative drop tolerance (keep |m_ij| >= tol * row max and the
    diagonal) — bounds the normal operator's fill for the PRECONDITIONER
    build; the CG operator itself stays the exact composite matvec."""
    import scipy.sparse as sp

    M = M.tocoo()
    rmax = np.zeros(M.shape[0])
    np.maximum.at(rmax, M.row, np.abs(M.data))
    keep = (np.abs(M.data) >= tol * rmax[M.row]) | (M.row == M.col)
    return sp.coo_matrix((M.data[keep], (M.row[keep], M.col[keep])),
                         shape=M.shape).tocsr()


def assemble_normal(nbr, mask, weights, a_drop: float = 0.02):
    """N = A^T A (SPD, scipy CSR) — the operator CGNR actually inverts.
    Isolated/degenerate rows (zero diagonal) become identity rows so the
    hierarchy build stays nonsingular."""
    import scipy.sparse as sp

    A = drop_small(assemble_composite(nbr, mask, weights), a_drop)
    N = (A.T @ A).tocsr()
    d0 = np.asarray(N.diagonal())
    fix = d0 <= 1e-12
    if fix.any():
        N = N + sp.diags(np.where(fix, 1.0, 0.0))
    return N.tocsr()


def _aggregate_csr(S, rng: np.random.Generator) -> tuple[np.ndarray, int]:
    """Vectorized MIS-style aggregation on a strength graph (scipy CSR):
    random-priority seeds, two strongest-seed attachment sweeps, singleton
    stragglers.  Returns (agg [n], n_agg)."""
    n = S.shape[0]
    coo = S.tocoo()
    rows, cols, vals = coo.row, coo.col, np.abs(coo.data)
    keep = rows != cols
    rows, cols, vals = rows[keep], cols[keep], vals[keep]

    pri = rng.random(n)
    nb_max = np.zeros(n)
    np.maximum.at(nb_max, rows, pri[cols])
    seeds = pri >= nb_max          # no-neighbor nodes trivially seed
    agg = np.full(n, -1, np.int64)
    seed_ids = np.cumsum(seeds) - 1
    agg[seeds] = seed_ids[seeds]

    for _ in range(2):             # attach to strongest assigned neighbor
        open_e = (agg[rows] < 0) & (agg[cols] >= 0)
        if not open_e.any():
            break
        r_e, s_e = rows[open_e], vals[open_e]
        best = np.zeros(n)
        np.maximum.at(best, r_e, s_e)
        pick = open_e.copy()
        pick[open_e] = s_e >= best[r_e] - 1e-30
        # later writes win ties — any strongest-neighbor choice is fine
        agg[rows[pick]] = agg[cols[pick]]

    left = agg < 0
    if left.any():
        agg[left] = int(seeds.sum()) + np.arange(int(left.sum()))
    uniq, agg = np.unique(agg, return_inverse=True)
    return agg.astype(np.int64), len(uniq)


def _strength_filter(L, theta: float):
    """Symmetric strength-of-connection graph: keep |l_ij| >=
    theta * sqrt(|l_ii l_jj|) (pyamg's symmetric strength measure)."""
    import scipy.sparse as sp

    coo = L.tocoo()
    d = np.abs(np.asarray(L.diagonal()))
    s = np.abs(coo.data) / np.sqrt(np.maximum(d[coo.row] * d[coo.col],
                                              1e-30))
    keep = (s >= theta) & (coo.row != coo.col)
    return sp.coo_matrix((coo.data[keep], (coo.row[keep], coo.col[keep])),
                         shape=L.shape).tocsr()


def _lambda_max_csr(L, iters: int = 25) -> float:
    """Power-iteration estimate of lambda_max(D^{-1} L)."""
    n = L.shape[0]
    dinv = 1.0 / np.maximum(np.abs(np.asarray(L.diagonal())), 1e-30)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    lam = 1.0
    for _ in range(iters):
        y = dinv * (L @ x)
        lam = np.linalg.norm(y)
        x = y / max(lam, 1e-30)
    return float(max(lam * 1.05, 1e-12))  # 5% safety margin


def _to_ell(M, keep_frac: float = 0.999):
    """CSR -> padded ELL (cols [n, E], vals [n, E]) for scatter-free device
    matvecs: ``(M x)_i = sum_e vals[i, e] * x[cols[i, e]]`` is a regular
    gather + reduce — the COO segment_sum form was the entire wall cost of
    the first implementation (unsorted scatter is serialized on CPU and
    slow on TPU; measured 24x the unpreconditioned loop).  Rows beyond the
    ``keep_frac`` row-length quantile keep only their largest-magnitude
    entries — a preconditioner tolerance, not a solver one.  Padding slots
    point at the row itself with value 0."""
    M = M.tocsr()
    n = M.shape[0]
    lens = np.diff(M.indptr)
    E = max(int(np.quantile(lens, keep_frac)) if n else 1, 1)
    idx, dat = M.indices.copy(), M.data.copy()
    for i in np.nonzero(lens > E)[0]:   # few rows; reorder largest-first
        seg = slice(M.indptr[i], M.indptr[i + 1])
        order = np.argsort(-np.abs(dat[seg]))
        idx[seg], dat[seg] = idx[seg][order], dat[seg][order]
    take = np.minimum(lens, E)
    rr = np.repeat(np.arange(n), take)
    cc = np.arange(int(take.sum())) - np.repeat(
        np.concatenate([[0], np.cumsum(take)[:-1]]), take)
    src = np.repeat(M.indptr[:-1], take) + cc
    cols = np.tile(np.arange(n, dtype=np.int64)[:, None], (1, E))
    vals = np.zeros((n, E))
    cols[rr, cc] = idx[src]
    vals[rr, cc] = dat[src]
    return (jnp.asarray(cols, jnp.int32), jnp.asarray(vals, jnp.float32))


def _to_device_level(L, P, lam_max: float) -> dict:
    """Pack one level's operator + prolongation as device ELL arrays
    (scatter-free matvec/prolongation; restriction keeps one small
    segment_sum over P's entries)."""
    l_cols, l_vals = _to_ell(L)
    p_cols, p_vals = _to_ell(P, keep_frac=1.0)   # P is exact, never capped
    pc = P.tocoo()
    return {
        "cols": l_cols, "vals": l_vals,
        "diag": jnp.asarray(np.asarray(L.diagonal()), jnp.float32),
        "p_cols": p_cols, "p_vals": p_vals,
        "pt_rows": jnp.asarray(pc.row, jnp.int32),
        "pt_cols": jnp.asarray(pc.col, jnp.int32),
        "pt_vals": jnp.asarray(pc.data, jnp.float32),
        "n": int(L.shape[0]), "nc": int(P.shape[1]),
        "lam_max": float(lam_max),
    }


def build_hierarchy(L, max_levels: int = 12, coarse_size: int = 800,
                    theta: float = 0.08, seed: int = 0,
                    implicit_level0: bool = False):
    """Smoothed-aggregation setup (pyamg's algorithm, scipy implementation).

    Per level: strength filter -> MIS aggregation -> tentative P ->
    Jacobi-smoothed P = (I - (4/3 lam) D^{-1} L) P_tent -> Galerkin
    L_c = P^T L P.  Returns (levels, coarse_inv): device-array level dicts
    (see _to_device_level) + the dense pinv of the coarsest operator.

    ``implicit_level0=True`` stores NO finest-level matrix arrays: the
    level-0 operator is supplied at apply time as a matvec callable (the
    projection passes the exact composite pair), and the smoothed P is
    applied implicitly (P xc = t - w D^{-1} L t with t the tentative
    gather).  Why: TPU gathers run at ~100M elem/s on the relay, so the
    ELL matvec at the normal operator's ~400 nnz/row costs ~2 s per
    V-cycle at 100k nodes (measured) — 35x the composite matvec form of
    the SAME operator (the stencils gather [n, K] with K~16).  The
    Galerkin coarse operators stay explicit (tiny).
    """
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    L = L.tocsr()
    levels = []
    while L.shape[0] > coarse_size and len(levels) < max_levels:
        n = L.shape[0]
        S = _strength_filter(L, theta)
        agg, nc = _aggregate_csr(S, rng)
        if nc >= n:    # aggregation stalled (pathological graph)
            break
        lam = _lambda_max_csr(L)
        P_tent = sp.coo_matrix((np.ones(n), (np.arange(n), agg)),
                               shape=(n, nc)).tocsr()
        dinv = sp.diags(1.0 / np.maximum(np.abs(np.asarray(L.diagonal())),
                                         1e-30))
        w = 4.0 / (3.0 * lam)
        P = P_tent - w * (dinv @ (L @ P_tent))
        if implicit_level0 and not levels:
            levels.append({
                "agg": jnp.asarray(agg, jnp.int32),
                "diag": jnp.asarray(np.asarray(L.diagonal()), jnp.float32),
                "n": int(n), "nc": int(nc),
                "lam_max": float(lam), "w": float(w),
            })
        else:
            levels.append(_to_device_level(L, P, lam))
        L = (P.T @ L @ P).tocsr()
        L.eliminate_zeros()
    # rcond 1e-6: the operator is applied in f32 and N is singular
    # (constant null space) — the default 1e-15 cutoff inverts f64
    # assembly noise into ~1e10-scale directions the f32 matvec cannot
    # represent, and CG diverges against the inconsistent pair (measured:
    # coarse-only M with default pinv made the solve WORSE than
    # unpreconditioned)
    coarse_inv = jnp.asarray(np.linalg.pinv(L.toarray(), rcond=1e-6),
                             jnp.float32)
    return levels, coarse_inv


def split_levels(levels):
    """(arrays_pytree, static_meta) split so the level arrays can ride as
    JIT ARGUMENTS: closed-over device arrays embed as HLO constants, and
    at production scale the hierarchy is hundreds of MB — the remote
    compile rejects the request with HTTP 413 (measured at 100k nodes;
    the round-3 lesson strikes again)."""
    arrays = [{k: v for k, v in lv.items() if isinstance(v, jnp.ndarray)}
              for lv in levels]
    meta = tuple({k: v for k, v in lv.items()
                  if not isinstance(v, jnp.ndarray)} for lv in levels)
    return arrays, meta


def make_vcycle_fn(meta, cheb_degree: int = 2, smooth_band: float = 8.0):
    """Device V-cycle as ``f(level_arrays, coarse_inv, r[, matvec0]) -> x``
    — the arrays-as-arguments form (see split_levels).  ``matvec0`` is the
    finest-level operator callable, required when the hierarchy was built
    with ``implicit_level0=True``.  Same math as make_vcycle."""
    def vcycle(arrays, coarse_inv, r, matvec0=None):
        levels = [dict(a, **m) for a, m in zip(arrays, meta)]
        return _cycle_impl(levels, coarse_inv, r, cheb_degree, smooth_band,
                           matvec0=matvec0)

    return vcycle


def make_vcycle(levels, coarse_inv, cheb_degree: int = 2,
                smooth_band: float = 8.0):
    """Device V-cycle V ~ L^{-1} as a fixed linear operator (closure form —
    fine on local backends / small meshes; use make_vcycle_fn +
    split_levels when the cycle is traced inside a remote-compiled jit).

    Chebyshev smoothing on D^{-1}L over [lam_max/smooth_band, lam_max]
    (zero initial guess -> linear in the input), COO-smoothed
    restriction/prolongation, dense solve at the coarsest level.  Jit at
    the call site (or trace inside a larger jit).
    """
    return lambda r: _cycle_impl(levels, coarse_inv, r, cheb_degree,
                                 smooth_band)


def _cycle_impl(levels, coarse_inv, r0, cheb_degree: int,
                smooth_band: float, matvec0=None):
    def matvec(lv, x):
        if "agg" in lv:    # implicit finest level: exact operator callable
            return matvec0(x)
        return jnp.sum(lv["vals"] * x[lv["cols"]], axis=1)  # ELL gather

    def restrict(lv, r):   # P^T r
        if "agg" in lv:
            # P^T = P_tent^T (I - w L D^{-1})  (L symmetric)
            t = r - lv["w"] * matvec0(r / lv["diag"])
            return jax.ops.segment_sum(t, lv["agg"],
                                       num_segments=lv["nc"])
        return jax.ops.segment_sum(lv["pt_vals"] * r[lv["pt_rows"]],
                                   lv["pt_cols"], num_segments=lv["nc"])

    def prolong(lv, xc):   # P xc
        if "agg" in lv:
            t = xc[lv["agg"]]
            return t - lv["w"] * (matvec0(t) / lv["diag"])
        return jnp.sum(lv["p_vals"] * xc[lv["p_cols"]], axis=1)

    def chebyshev(lv, b):
        # Saad Alg. 12.1 on the D^{-1}-preconditioned operator, x0 = 0
        lmax = lv["lam_max"]
        lmin = lmax / smooth_band
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        dinv = 1.0 / lv["diag"]
        sigma1 = theta / delta
        rho = 1.0 / sigma1
        x = (dinv * b) / theta
        d = x
        for _ in range(cheb_degree - 1):
            r = b - matvec(lv, x)
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * (dinv * r)
            x = x + d
            rho = rho_new
        return x

    def cycle(li, r):
        if li == len(levels):
            return coarse_inv @ r
        lv = levels[li]
        x = chebyshev(lv, r)
        rc = restrict(lv, r - matvec(lv, x))
        x = x + prolong(lv, cycle(li + 1, rc))
        x = x + chebyshev(lv, r - matvec(lv, x))
        return x

    return cycle(0, r0)


def symmetrize(vcycle):
    """M = (V + V^T)/2 via jax.linear_transpose — an exactly-symmetric
    wrapper for CG when the Chebyshev pre/post smoothing leaves the cycle
    only approximately self-adjoint.  Doubles the per-application cost;
    measured equivalent to plain V on the duct workloads, so the
    projection uses V directly and keeps this as the fallback knob."""
    def M(r):
        vt = jax.linear_transpose(vcycle, r)
        return 0.5 * (vcycle(r) + vt(r)[0])

    return M
