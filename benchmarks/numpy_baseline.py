"""Vectorized NumPy baseline for archetypal analysis.

The reference accelerates its per-row QP solves with Numba
(``@guvectorize(target='parallel')``; numba is not installed in this
image), so a pure per-row Python loop would inflate our speedups
dishonestly.  This baseline is therefore the *strongest practical CPU
implementation* of the same algorithm: the identical alternating scheme
(batched simplex-QP weights with exact line search + projected spectral
gradient dictionary updates) fully vectorized over rows in NumPy float64
— every inner operation is a BLAS matmul, which is at least competitive
with the reference's threaded Numba kernels.  Speedups reported against
it are a lower bound on speedups against the reference.
"""

import numpy as np

__all__ = ["simplex_project_rows_np", "aa_fit_numpy", "aa_multi_restart_numpy"]


def simplex_project_rows_np(x):
    """Row-wise Euclidean projection onto the simplex (sort-threshold)."""
    n = x.shape[-1]
    u = np.sort(x, axis=-1)[..., ::-1]
    css = np.cumsum(u, axis=-1)
    j = np.arange(1, n + 1, dtype=x.dtype)
    rho = np.sum(u - (css - 1.0) / j > 0, axis=-1, keepdims=True)
    tau = (np.take_along_axis(css, rho - 1, axis=-1) - 1.0) / rho
    return np.maximum(x - tau, 0.0)


def _qp_rows(A, B, X, max_iterations=1000, eps2=1e-6):
    """Lockstep batched simplex QPs: min 1/2 x'Ax + b'x per row."""
    X = simplex_project_rows_np(X)
    AX = X @ A
    G = AX + B
    d0 = simplex_project_rows_np(X - G) - X
    ainv = np.abs(d0).max(axis=1)
    ainv[np.abs(ainv) < 1e-12] = 1.0
    alpha = np.clip(1.0 / ainv, 1e-5, 1e3)
    active = np.ones(X.shape[0], dtype=bool)

    for _ in range(max_iterations):
        G = AX + B
        D = simplex_project_rows_np(X - alpha[:, None] * G) - X
        AD = D @ A
        delta = np.sum(D * G, axis=1)
        q = np.sum(D * AD, axis=1)
        lam = np.where(q > 0, np.clip(-delta / np.where(q > 0, q, 1.0),
                                      0.0, 1.0), 1.0)
        lam = np.where(active, lam, 0.0)
        X = X + lam[:, None] * D
        AX = AX + lam[:, None] * AD
        sksk = np.sum(D * D, axis=1)
        alpha = np.where(q > 0, np.clip(sksk / np.where(q > 0, q, 1.0),
                                        1e-5, 1e3), 1e3)
        res = simplex_project_rows_np(X - (AX + B)) - X
        active = np.sqrt(np.sum(res * res, axis=1)) >= eps2
        if not active.any():
            break
    return X


def _dictionary_spg(K, C, KZD, DZtZD, n, max_iterations=10):
    """Projected spectral gradient on the dictionary QP."""
    B = KZD.T / n

    def matvec(C):
        return DZtZD @ (C @ K) / n

    HC = matvec(C)
    G = HC - B
    d0 = simplex_project_rows_np(C - G) - C
    ainv = max(np.abs(d0).max(), 1e-12)
    alpha = np.clip(1.0 / ainv, 1e-5, 1e3)

    for _ in range(max_iterations):
        G = HC - B
        D = simplex_project_rows_np(C - alpha * G) - C
        HD = matvec(D)
        delta = np.sum(D * G)
        q = np.sum(D * HD)
        lam = np.clip(-delta / q, 0.0, 1.0) if q > 0 else 1.0
        C = C + lam * D
        HC = HC + lam * HD
        alpha = np.clip(np.sum(D * D) / q, 1e-5, 1e3) if q > 0 else 1e3
        res = simplex_project_rows_np(C - (HC - B)) - C
        if np.sqrt(np.sum(res * res)) < 1e-6:
            break
    return C


def aa_fit_numpy(X, n_components, rng, tolerance=1e-4, max_iterations=500,
                 dict_iterations=10, weights_iterations=1000,
                 stopping_criterion='abs_delta_f'):
    """One archetypal-analysis fit (random init) in NumPy float64."""
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    K = X @ X.T

    C = rng.uniform(size=(n_components, n))
    C /= C.sum(axis=1, keepdims=True)
    Z = rng.uniform(size=(n, n_components))
    Z /= Z.sum(axis=1, keepdims=True)

    CX = C @ X
    resid = Z @ CX - X
    new_cost = 0.5 * np.sum(resid * resid) / n

    n_iter = 0
    for n_iter in range(1, max_iterations + 1):
        old_cost = new_cost

        ZtZ = Z.T @ Z
        KZ = K @ Z
        C = _dictionary_spg(K, C, KZ, ZtZ, n,
                            max_iterations=dict_iterations)

        CK = C @ K
        CKCt = CK @ C.T
        Z = _qp_rows(CKCt, -CK.T, Z, max_iterations=weights_iterations)

        CX = C @ X
        resid = Z @ CX - X
        new_cost = 0.5 * np.sum(resid * resid) / n

        delta = abs(new_cost - old_cost)
        if stopping_criterion == 'rel_delta_f':
            delta = delta / max(abs(new_cost), abs(old_cost))
        if delta < tolerance:
            break

    return Z, C, new_cost, n_iter


def aa_multi_restart_numpy(X, n_components, n_init, seed=0, **kwargs):
    """Serial keep-best restarts, as the reference drivers run them
    (bin/run_hadisst_aa.py:149-174)."""
    rng = np.random.RandomState(seed)
    best = None
    for _ in range(n_init):
        Z, C, cost, n_iter = aa_fit_numpy(X, n_components, rng, **kwargs)
        if best is None or cost < best[2]:
            best = (Z, C, cost, n_iter)
    return best
