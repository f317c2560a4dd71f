#!/usr/bin/env python
"""End-to-end HadISST case study on synthetic data.

Reproduces the reference's full workflow (get data → anomalies → AA /
GPNH / k-means drivers → notebook analysis) in one script, runnable in
a zero-egress environment:

    python examples/hadisst_case_study.py /tmp/case_study

Steps:
  1. synthesize a HadISST-schema SST dataset (bin/make_synthetic_hadisst)
  2. compute monthly anomalies + standardized anomalies (cli.anomalies)
  3. run the AA, GPNH, and k-means case-study drivers
  4. run the notebook-analog analysis: PCA/EOFs, pattern correlation,
     state sorting, model-selection CSV
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sh(*args):
    print("+", " ".join(args))
    subprocess.run(list(args), check=True, cwd=REPO)


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hadisst_case_study"
    os.makedirs(out_dir, exist_ok=True)
    raw = os.path.join(out_dir, "raw.nc")
    anom = os.path.join(out_dir, "anom.nc")

    py = sys.executable
    sh(py, "bin/make_synthetic_hadisst.py", raw,
       "--n-years", "40", "--n-lat", "36", "--n-lon", "72",
       "--start-year", "1979")
    sh(py, "-m", "convex_dim_red_tpu.cli.anomalies", raw, anom,
       "--var-name", "sst",
       "--base-period-start-year", "1981",
       "--base-period-end-year", "2010")

    for name, extra in [
        ("hadisst_pca", ["--n-components", "4"]),
        ("hadisst_aa", ["--n-components", "4", "--n-init", "20",
                        "--delta", "0.0", "--tolerance", "1e-5",
                        "--max-iterations", "300"]),
        ("hadisst_gpnh", ["--n-components", "4", "--n-init", "8",
                          "--lambda-W", "1e-3", "--tolerance", "1e-5",
                          "--max-iterations", "200"]),
        ("hadisst_kmeans", ["--n-components", "4", "--n-init", "10",
                            "--n-trials", "20"]),
    ]:
        sh(py, "-m", "convex_dim_red_tpu.cli.drivers", name, anom,
           os.path.join(out_dir, f"{name}.nc"),
           "--random-seed", "0", *extra)

    # ---- notebook-analog analysis --------------------------------------
    from convex_dim_red_tpu.pipelines.analysis import (
        sort_states, write_model_selection_csv)
    from convex_dim_red_tpu.pipelines.dataset import open_dataset
    from convex_dim_red_tpu.pipelines.preprocess import (
        missing_feature_mask, weight_and_flatten)

    # EOFs from the hadisst_pca driver product (the reference's
    # hadisst_pca notebook writes the same EOFs+PCs netCDF).
    eofs_ds = open_dataset(os.path.join(out_dir, "hadisst_pca.nc"))
    print("EOF variance ratios:",
          np.round(eofs_ds['explained_variance_ratio'].data, 3))
    eof_grids = eofs_ds['EOFs'].data.reshape(4, -1)
    eof_missing = ~np.isfinite(eof_grids).all(axis=0)
    eof_patterns = eof_grids[:, ~eof_missing]

    # Pattern-correlation state sorting of the AA archetypes vs EOFs.
    # The AA driver analyzed the same latitude band with the same scos
    # weighting, so the valid-cell masks coincide.
    aa = open_dataset(os.path.join(out_dir, "hadisst_aa.nc"))
    arch = aa['archetypes'].data.reshape(4, -1)[:, ~eof_missing]
    order, signs, corr = sort_states(arch, eof_patterns)
    print("state order vs EOFs:", order.tolist(),
          "signs:", signs.tolist())

    # Model-selection table over k (cost from quick extra fits) on the
    # same weighted/masked matrix the drivers analyze (reference
    # bin/run_hadisst_aa.py:32-34, :112-146).
    from convex_dim_red_tpu.pipelines.preprocess import latitude_weights
    ds = open_dataset(anom).sel_range('latitude', -45.5, 45.5)
    weights = latitude_weights(ds.coords['latitude'].data, 'scos')
    flat = weight_and_flatten(ds['sst_anom'].data, weights[None, :, None])
    valid = flat[:, ~missing_feature_mask(flat)]

    from convex_dim_red_tpu.parallel.sweep import aa_model_selection_sweep
    import jax
    sweep = aa_model_selection_sweep(
        valid.astype(np.float32), ks=[2, 3, 4, 5],
        key=jax.random.PRNGKey(0), n_init=8, tolerance=1e-5,
        max_iterations=150, init='random')
    csv_path = os.path.join(out_dir, "model_selection.csv")
    write_model_selection_csv(csv_path, sweep)
    print("wrote", csv_path)
    print("done; outputs in", out_dir)


if __name__ == "__main__":
    main()
