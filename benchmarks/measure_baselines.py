#!/usr/bin/env python
"""Measure the NumPy baselines END-TO-END for the feasible configs.

Round-1 verdict: the headline speedup rested on a reconstructed
(extrapolated) baseline.  This script runs the full NumPy algorithm to
convergence — the same workloads, tolerances, and restart counts as
benchmarks/run_all.py's configs 1, 2, and 4 — and records measured
wall-clock seconds in ``benchmarks/baselines_measured.json``;
run_all.py then reports ``vs_baseline_measured`` columns from it.

The baselines must be measured on an idle host (single CPU core;
concurrent work inflates the numbers — see CLAUDE.md).

Usage: ``python benchmarks/measure_baselines.py [config1 config2 ...]``
(defaults to all three).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from benchmarks.numpy_baseline import (  # noqa: E402
    aa_multi_restart_numpy, gap_statistic_numpy, gpnh_multi_restart_numpy,
    kmeans_fit_numpy, pca_numpy)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "baselines_measured.json")


def _hadisst_scale_data(n=1788, d=16384):
    rng = np.random.RandomState(42)
    U = rng.standard_normal((n, 8))
    V = rng.standard_normal((8, d))
    X = U @ V + 0.3 * rng.standard_normal((n, d))
    X -= X.mean(axis=0)
    X /= X.std(axis=0) + 1e-12
    return X


def config1():
    """Synthetic k=3 AA, 200x50, best-of-10, furthest_sum init,
    abs tol 1e-8 (mirror of run_all.config1_synthetic_aa)."""
    rng = np.random.RandomState(0)
    X = rng.standard_normal((200, 50))
    t0 = time.perf_counter()
    _, _, cost, n_iter = aa_multi_restart_numpy(
        X, 3, n_init=10, seed=0, init='furthest_sum', tolerance=1e-8,
        max_iterations=500, dict_iterations=10000,
        weights_iterations=1000)
    return {"seconds": time.perf_counter() - t0, "cost": cost,
            "n_iter_best": n_iter,
            "workload": "synthetic_k3_aa_200x50_best10"}


def config2():
    """HadISST-scale k-means k=4 best-of-10 + 20-trial uniform gap
    (mirror of run_all.config2_kmeans)."""
    X = _hadisst_scale_data()
    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    _, inertia = kmeans_fit_numpy(X, 4, rng, n_init=10)
    gap, sk = gap_statistic_numpy(X, inertia, 4, n_trials=20, rng=rng,
                                  n_init=10)
    return {"seconds": time.perf_counter() - t0, "inertia": inertia,
            "gap": gap, "gap_sk": sk,
            "workload": "hadisst_scale_kmeans_k4_gap20"}


def config4():
    """JRA-55 protocol: PCA to 167 modes then GPNH k=4 best-of-16
    (mirror of run_all.config4_pca_gpnh)."""
    X = _hadisst_scale_data(n=732, d=8192)
    t0 = time.perf_counter()
    pcs, _ = pca_numpy(X, 167)
    _, _, cost, n_iter = gpnh_multi_restart_numpy(
        pcs, 4, n_init=16, seed=0, lambda_W=1e-3, tolerance=1e-5,
        stopping_criterion='rel_delta_f', max_iterations=300,
        weights_iterations=1000)
    return {"seconds": time.perf_counter() - t0, "cost": cost,
            "n_iter_best": n_iter,
            "workload": "jra55_scale_pca167_gpnh_k4_best16"}


def config2_ref():
    """NumPy denominator for the reference frozen gap scale
    (N_TRIALS=100, reference bin/run_hadisst_kmeans_wrapper.sh:40-44):
    the k-means fit is measured end-to-end; the gap trials are measured
    on a 5-trial subset and scaled linearly over the independent trial
    axis (x20) — trials are independent reference draws (reference
    kmeans.py:97-100 runs them as independent joblib tasks), so the
    scaling is exact in expectation.  Labeled as scaled."""
    X = _hadisst_scale_data()
    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    _, inertia = kmeans_fit_numpy(X, 4, rng, n_init=10)
    fit_seconds = time.perf_counter() - t0
    n_sub = 5
    t0 = time.perf_counter()
    gap, sk = gap_statistic_numpy(X, inertia, 4, n_trials=n_sub,
                                  rng=rng, n_init=10)
    sub_seconds = time.perf_counter() - t0
    scaled = fit_seconds + sub_seconds * (100.0 / n_sub)
    return {"seconds": scaled,
            "method": "measured kmeans fit + %d-trial gap subset "
                      "scaled x%g over the independent trial axis"
                      % (n_sub, 100.0 / n_sub),
            "fit_seconds": fit_seconds,
            "gap_subset_seconds": sub_seconds,
            "n_trials_measured": n_sub,
            "workload": "hadisst_scale_kmeans_k4_gap100_scaled"}


def config4_ref():
    """NumPy denominator for the reference frozen restart scale
    (N_INIT=100, reference bin/run_jra55_pca_gpnh_wrapper.sh:40-44):
    PCA measured end-to-end; GPNH restarts measured as a best-of-4
    subset and scaled linearly over the independent restart axis
    (x25).  Labeled as scaled."""
    X = _hadisst_scale_data(n=732, d=8192)
    n_sub = 4
    t0 = time.perf_counter()
    pcs, _ = pca_numpy(X, 167)
    pca_seconds = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, _, cost, n_iter = gpnh_multi_restart_numpy(
        pcs, 4, n_init=n_sub, seed=0, lambda_W=1e-3, tolerance=1e-5,
        stopping_criterion='rel_delta_f', max_iterations=300,
        weights_iterations=1000)
    sub_seconds = time.perf_counter() - t0
    scaled = pca_seconds + sub_seconds * (100.0 / n_sub)
    return {"seconds": scaled,
            "method": "measured PCA + best-of-%d GPNH subset scaled "
                      "x%g over the independent restart axis"
                      % (n_sub, 100.0 / n_sub),
            "pca_seconds": pca_seconds,
            "restart_subset_seconds": sub_seconds,
            "n_init_measured": n_sub,
            "workload": "jra55_scale_pca167_gpnh_k4_best100_scaled"}


def main():
    which = sys.argv[1:] or ["config1", "config2", "config4",
                             "config2_ref", "config4_ref"]
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    results.setdefault(
        "method",
        "full end-to-end numpy runs to convergence (not reconstructed); "
        "vectorized float64 baseline (benchmarks/numpy_baseline.py), "
        "measured on an idle 1-core host")
    for name in which:
        print("measuring %s ..." % name, file=sys.stderr, flush=True)
        results[name] = globals()[name]()
        print(json.dumps({name: results[name]}), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
