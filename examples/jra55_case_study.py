#!/usr/bin/env python
"""End-to-end JRA-55 hgt500 case study on synthetic data.

The reference's combined JRA-55 analysis notebook
(`notebooks/jra55_hgt500_pca_combined.ipynb`) is a stripped large blob
upstream (reference .MISSING_LARGE_BLOBS:1); this script is its
runnable reconstruction from the surviving drivers' contracts
(reference bin/run_jra55_{kmeans,pca_aa,pca_gpnh,pca_kmeans}.py): the
full gridded-data -> EOF/PC -> PC-space-factorization -> grid-pattern
analysis chain in one zero-egress script:

    python examples/jra55_case_study.py /tmp/jra55_case_study

Steps:
  1. synthesize a JRA-55-schema hgt500 anomaly grid
     (bin/make_synthetic_jra55.py)
  2. jra55_pca driver: EOFs + PCs netCDF product
  3. PC-space drivers: jra55_pca_aa, jra55_pca_gpnh, jra55_pca_kmeans
     (gap statistic, PCA reference), plus gridded jra55_kmeans
  4. notebook-analog analysis: project PC-space states back to grid
     patterns through the EOFs, sort every method's states by pattern
     correlation against the leading EOFs, cross-match AA archetypes
     with k-means centroids, and write the AA model-selection CSV

Pass ``--platform cpu`` to force the CPU backend (threaded through to
every driver; useful for quick validation off-TPU).
"""

import argparse
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 4        # states per method
N_MODES = 6  # EOF truncation


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('out_dir', nargs='?',
                        default='/tmp/jra55_case_study')
    parser.add_argument('--platform', default=None,
                        choices=['cpu', 'tpu', 'axon'])
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    platform = (['--platform', args.platform] if args.platform else [])

    def sh(*cmd):
        print("+", " ".join(cmd))
        subprocess.run(list(cmd), check=True, cwd=REPO)

    def driver(name, in_path, *extra):
        out = os.path.join(args.out_dir, f"{name}.nc")
        sh(sys.executable, "-m", "convex_dim_red_tpu.cli.drivers", name,
           in_path, out, "--random-seed", "0", *extra, *platform)
        return out

    py = sys.executable
    grid = os.path.join(args.out_dir, "hgt500_anom.nc")
    sh(py, "bin/make_synthetic_jra55.py", grid, "--kind", "grid",
       "--n-years", "20")

    # EOF/PC product (the input to all three PC-space drivers).
    pca = driver("jra55_pca", grid, "--n-components", str(N_MODES))

    k = str(K)
    aa = driver("jra55_pca_aa", pca, "--n-components", k,
                "--n-init", "8", "--tolerance", "1e-6",
                "--max-iterations", "300")
    gpnh = driver("jra55_pca_gpnh", pca, "--n-components", k,
                  "--n-init", "4", "--lambda-W", "1e-3",
                  "--tolerance", "1e-6", "--max-iterations", "300")
    pc_km = driver("jra55_pca_kmeans", pca, "--n-components", k,
                   "--n-init", "10", "--n-trials", "20",
                   "--reference", "pca")
    grid_km = driver("jra55_kmeans", grid, "--n-components", k,
                     "--n-init", "10", "--n-trials", "20")

    # ---- combined analysis (the missing notebook's content) -------------
    from convex_dim_red_tpu.pipelines.analysis import (
        pattern_correlation, sort_states, write_model_selection_csv)
    from convex_dim_red_tpu.pipelines.dataset import open_dataset

    pca_ds = open_dataset(pca)
    eof_grids = pca_ds['EOFs'].data.reshape(N_MODES, -1)
    missing = ~np.isfinite(eof_grids).all(axis=0)
    eofs_valid = eof_grids[:, ~missing]          # (modes, valid cells)
    print("EOF variance ratios:",
          np.round(pca_ds['explained_variance_ratio'].data, 3))

    # PC-space states -> grid patterns through the EOF basis.
    states = {
        'aa': open_dataset(aa)['archetypes'].data,          # (k, modes)
        'gpnh': open_dataset(gpnh)['dictionary'].data,      # (k, modes)
        'pc_kmeans': open_dataset(pc_km)['centroids'].data, # (k, modes)
    }
    grid_states = {name: s @ eofs_valid for name, s in states.items()}
    # The gridded k-means analyzed the same lat band with the same
    # weighting, so its (NaN-refilled) centroid grids share the mask.
    grid_states['grid_kmeans'] = open_dataset(grid_km)[
        'centroids'].data.reshape(K, -1)[:, ~missing]

    # Sort every method's states against the leading EOF patterns.
    ref_patterns = eofs_valid[:K]
    for name, patterns in grid_states.items():
        order, signs, corr = sort_states(patterns, ref_patterns)
        best = corr[order, np.arange(K)] * signs
        print(f"{name:12s} state order vs EOFs: {order.tolist()} "
              f"signs {signs.tolist()} |corr| "
              f"{np.round(np.abs(best), 3).tolist()}")

    # Cross-method correspondence: AA archetypes vs k-means centroids.
    cross = pattern_correlation(grid_states['aa'],
                                grid_states['grid_kmeans'])
    match = np.argmax(np.abs(cross), axis=1)
    print("AA archetype -> closest grid-kmeans centroid:",
          match.tolist(),
          "corr", np.round(np.abs(cross[np.arange(K), match]), 3).tolist())
    print("gap statistic (grid kmeans):",
          open_dataset(grid_km).attrs.get('gap_statistic'))

    # AA model-selection curve over k in PC space.
    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    from convex_dim_red_tpu.parallel.sweep import aa_model_selection_sweep
    pcs = pca_ds['PCs'].data.astype(np.float32)
    sweep = aa_model_selection_sweep(
        pcs, ks=[2, 3, 4, 5], key=jax.random.PRNGKey(0), n_init=8,
        tolerance=1e-6, max_iterations=200, init='random')
    csv_path = os.path.join(args.out_dir, "model_selection.csv")
    write_model_selection_csv(csv_path, sweep)
    print("wrote", csv_path)
    print("done; outputs in", args.out_dir)


if __name__ == "__main__":
    main()
