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

__all__ = ["simplex_project_rows_np", "aa_fit_numpy",
           "aa_multi_restart_numpy", "furthest_sum_np",
           "aa_fit_numpy_init", "kmeans_fit_numpy", "gap_statistic_numpy",
           "gpnh_fit_numpy", "gpnh_multi_restart_numpy", "pca_numpy"]


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
                 stopping_criterion='abs_delta_f', init='random',
                 iter_times=None):
    """One archetypal-analysis fit in NumPy float64.

    ``iter_times``: optional list; when given, the wall-clock seconds of
    each outer iteration are appended to it (baseline-measurement hook,
    mirrors the reference's per-iteration ``iter_times`` bookkeeping,
    reference archetypal_analysis.py:515-518).
    """
    import time as _time
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    K = X @ X.T

    C, Z = aa_fit_numpy_init(X, K, n_components, rng, init=init)

    CX = C @ X
    resid = Z @ CX - X
    new_cost = 0.5 * np.sum(resid * resid) / n

    n_iter = 0
    for n_iter in range(1, max_iterations + 1):
        t_iter = _time.perf_counter()
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
        if iter_times is not None:
            iter_times.append(_time.perf_counter() - t_iter)
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


# ---------------------------------------------------------------------------
# FurthestSum init (reference furthest_sum.py:23-127, numpy greedy)
# ---------------------------------------------------------------------------


def furthest_sum_np(diss, n_components, start, extra_steps=10):
    """Greedy max-dissimilarity-sum selection with drop-and-reselect
    refinement, matching the reference algorithm's structure."""
    selected = [int(start)]
    q = diss[start].copy()
    for _ in range(n_components - 1):
        cand = q.copy()
        cand[selected] = -np.inf
        nxt = int(np.argmax(cand))
        selected.append(nxt)
        q += diss[nxt]
    for _ in range(extra_steps * n_components):
        oldest = selected.pop(0)
        q -= diss[oldest]
        cand = q.copy()
        cand[selected] = -np.inf
        nxt = int(np.argmax(cand))
        selected.append(nxt)
        q += diss[nxt]
    return np.asarray(selected)


def aa_fit_numpy_init(X, K, n_components, rng, init='random',
                      extra_steps=10):
    """Draw the (C, Z) initialization for :func:`aa_fit_numpy`."""
    n = X.shape[0]
    if init == 'furthest_sum':
        kd = np.diag(K)
        diss = np.sqrt(np.maximum(kd[:, None] - 2 * K + kd[None, :], 0))
        start = rng.randint(n)
        sel = furthest_sum_np(diss, n_components, start, extra_steps)
        C = np.zeros((n_components, n))
        C[np.arange(n_components), sel] = 1.0
    else:
        C = rng.uniform(size=(n_components, n))
        C /= C.sum(axis=1, keepdims=True)
    Z = rng.uniform(size=(n, n_components))
    Z /= Z.sum(axis=1, keepdims=True)
    return C, Z


# ---------------------------------------------------------------------------
# K-means + gap statistic (baseline for models/kmeans.py)
# ---------------------------------------------------------------------------


def _kmeans_plusplus_np(X, k, rng):
    n = X.shape[0]
    centroids = np.empty((k, X.shape[1]), dtype=X.dtype)
    centroids[0] = X[rng.randint(n)]
    d2 = np.full(n, np.inf)
    for i in range(1, k):
        d_new = np.sum((X - centroids[i - 1]) ** 2, axis=1)
        d2 = np.minimum(d2, d_new)
        p = d2 / d2.sum()
        centroids[i] = X[rng.choice(n, p=p)]
    return centroids


def kmeans_fit_numpy(X, k, rng, n_init=10, max_iter=300, tol=1e-4,
                     init='k-means++'):
    """Best-of-``n_init`` Lloyd k-means, fully vectorized numpy
    (the same algorithm as models/kmeans.py: sklearn tol semantics,
    empty clusters keep their centroid)."""
    X = np.asarray(X, dtype=np.float64)
    tol_abs = tol * np.mean(np.var(X, axis=0))
    x_sq = np.sum(X * X, axis=1)[:, None]   # loop-invariant, hoisted
    best = None
    for _ in range(n_init):
        if init == 'k-means++':
            centroids = _kmeans_plusplus_np(X, k, rng)
        else:
            centroids = X[rng.choice(X.shape[0], k, replace=False)]
        for _ in range(max_iter):
            d2 = (x_sq - 2.0 * X @ centroids.T
                  + np.sum(centroids * centroids, axis=1)[None, :])
            labels = np.argmin(d2, axis=1)
            new_c = centroids.copy()
            for j in range(k):
                members = labels == j
                if members.any():
                    new_c[j] = X[members].mean(axis=0)
            shift = np.sum((new_c - centroids) ** 2)
            centroids = new_c
            if shift < tol_abs:
                break
        d2 = (x_sq - 2.0 * X @ centroids.T
              + np.sum(centroids * centroids, axis=1)[None, :])
        inertia = float(np.maximum(d2, 0).min(axis=1).sum())
        if best is None or inertia < best[1]:
            best = (centroids, inertia)
    return best


def gap_statistic_numpy(X, Wk, k, n_trials, rng, n_init=10):
    """Uniform-reference gap statistic with numpy k-means trials
    (the reference's joblib trial loop, kmeans.py:81-108, run
    serially on the host)."""
    X = np.asarray(X)
    fmin = X.min(axis=0)
    fmax = X.max(axis=0)
    ln_wks = np.empty(n_trials)
    for t in range(n_trials):
        draw = fmin + (fmax - fmin) * rng.uniform(size=X.shape)
        _, inertia = kmeans_fit_numpy(draw, k, rng, n_init=n_init)
        ln_wks[t] = np.log(inertia)
    sk = float(np.std(ln_wks) * np.sqrt(1.0 + 1.0 / n_trials))
    gap = float(np.mean(ln_wks) - np.log(Wk))
    return gap, sk


# ---------------------------------------------------------------------------
# GPNH convex coding + PCA (baseline for models/gpnh_convex_coding.py)
# ---------------------------------------------------------------------------


def gpnh_fit_numpy(X, n_components, rng, lambda_W=0.0, tolerance=1e-6,
                   max_iterations=500, weights_iterations=1000,
                   stopping_criterion='abs_delta_f'):
    """One GPNH convex-coding fit (random init) in NumPy float64:
    exact lstsq dictionary solve + batched simplex-QP weights, the
    same alternating scheme as models/gpnh_convex_coding.py."""
    X = np.asarray(X, dtype=np.float64)
    n, d = X.shape
    k = n_components

    if k > 1:
        pre = 4.0 / (d * k * (k - 1))
        GW = pre * (k * np.eye(k) - np.ones((k, k)))
    else:
        GW = np.zeros((1, 1))

    avg = np.sqrt(np.mean(np.abs(X)) / k)
    W = avg * rng.standard_normal((d, k))
    Z = rng.uniform(size=(n, k))
    Z /= Z.sum(axis=1, keepdims=True)

    def cost(Z, W):
        resid = X - Z @ W.T
        c = 0.5 * np.sum(resid * resid) / n
        if lambda_W != 0 and k > 1:
            pref = 2.0 / (k * d * (k - 1.0))
            tot = k * np.sum(W * W) - np.sum(W.sum(axis=1) ** 2)
            c += lambda_W * pref * tot
        return c

    new_cost = cost(Z, W)
    n_iter = 0
    for n_iter in range(1, max_iterations + 1):
        old_cost = new_cost
        lhs = Z.T @ Z / n + lambda_W * GW
        rhs = Z.T @ X / n
        W = np.linalg.lstsq(lhs, rhs, rcond=None)[0].T
        Z = _qp_rows(W.T @ W, -(X @ W), Z,
                     max_iterations=weights_iterations)
        new_cost = cost(Z, W)
        delta = abs(new_cost - old_cost)
        if stopping_criterion == 'rel_delta_f':
            delta = delta / max(abs(new_cost), abs(old_cost))
        if delta < tolerance:
            break
    return Z, W, new_cost, n_iter


def gpnh_multi_restart_numpy(X, n_components, n_init, seed=0, **kwargs):
    rng = np.random.RandomState(seed)
    best = None
    for _ in range(n_init):
        Z, W, cost, n_iter = gpnh_fit_numpy(X, n_components, rng,
                                            **kwargs)
        if best is None or cost < best[2]:
            best = (Z, W, cost, n_iter)
    return best


def pca_numpy(X, n_components):
    """Centered economy-SVD PCA returning the principal components."""
    X = np.asarray(X, dtype=np.float64)
    Xc = X - X.mean(axis=0)
    U, S, _ = np.linalg.svd(Xc, full_matrices=False)
    return (U[:, :n_components] * S[:n_components],
            S ** 2 / (X.shape[0] - 1))
