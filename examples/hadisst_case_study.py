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
    argv = [a for a in sys.argv[1:]]
    quick = "--quick" in argv
    if quick:
        argv.remove("--quick")
    platform = None
    if "--platform" in argv:
        i = argv.index("--platform")
        platform = argv[i + 1]
        del argv[i:i + 2]
        # The in-process analysis stage below obeys it too.
        import jax
        jax.config.update("jax_platforms", platform)
    out_dir = argv[0] if argv else "/tmp/hadisst_case_study"
    os.makedirs(out_dir, exist_ok=True)
    raw = os.path.join(out_dir, "raw.nc")
    anom = os.path.join(out_dir, "anom.nc")

    # --quick shrinks every knob for CI smoke tests of the full chain
    # (same steps, same artifacts, minutes -> tens of seconds).
    years, nlat, nlon = ("16", "18", "36") if quick else ("40", "36", "72")
    n_init = "4" if quick else "20"
    n_trials = "6" if quick else "20"

    py = sys.executable
    sh(py, "bin/make_synthetic_hadisst.py", raw,
       "--n-years", years, "--n-lat", nlat, "--n-lon", nlon,
       "--start-year", "1979")
    sh(py, "-m", "convex_dim_red_tpu.cli.anomalies", raw, anom,
       "--var-name", "sst",
       "--base-period-start-year", "1981",
       "--base-period-end-year", "2010" if not quick else "1994")

    for name, extra in [
        ("hadisst_pca", ["--n-components", "4"]),
        ("hadisst_aa", ["--n-components", "4", "--n-init", n_init,
                        "--delta", "0.0", "--tolerance", "1e-5",
                        "--max-iterations", "100" if quick else "300"]),
        ("hadisst_gpnh", ["--n-components", "4", "--n-init",
                          "2" if quick else "8",
                          "--lambda-W", "1e-3", "--tolerance", "1e-5",
                          "--max-iterations", "60" if quick else "200"]),
        ("hadisst_kmeans", ["--n-components", "4", "--n-init",
                            "3" if quick else "10",
                            "--n-trials", n_trials]),
    ]:
        plat = ["--platform", platform] if platform else []
        sh(py, "-m", "convex_dim_red_tpu.cli.drivers", name, anom,
           os.path.join(out_dir, f"{name}.nc"),
           "--random-seed", "0", *extra, *plat)

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
        valid.astype(np.float32), ks=[2, 3] if quick else [2, 3, 4, 5],
        key=jax.random.PRNGKey(0), n_init=3 if quick else 8,
        tolerance=1e-5, max_iterations=40 if quick else 150,
        init='random')
    csv_path = os.path.join(out_dir, "model_selection.csv")
    write_model_selection_csv(csv_path, sweep)
    print("wrote", csv_path)

    write_figures(out_dir)
    print("done; outputs in", out_dir)


def write_figures(out_dir):
    """Render the combined-plots figure inventory from driver outputs.

    Mirrors /root/reference/notebooks/hadisst_combined_plots.ipynb
    (plain-matplotlib maps — cartopy is not in this image): archetype /
    centroid / EOF pattern maps, the MDS convex-hull embedding of the
    AA weights, and the model-selection curves from the sweep CSV.
    """
    import csv

    import matplotlib
    matplotlib.use("Agg")

    from convex_dim_red_tpu.pipelines.dataset import open_dataset
    from convex_dim_red_tpu.pipelines.plotting import (
        plot_model_selection, plot_patterns, plot_state_embedding)

    def save(fig, name):
        path = os.path.join(out_dir, name)
        fig.savefig(path, dpi=110)
        import matplotlib.pyplot as plt
        plt.close(fig)
        print("wrote", path)

    for product, var, title in [
            ("hadisst_aa.nc", "archetypes", "Archetype"),
            ("hadisst_gpnh.nc", "dictionary", "GPNH state"),
            ("hadisst_kmeans.nc", "centroids", "Centroid"),
            ("hadisst_pca.nc", "EOFs", "EOF")]:
        ds = open_dataset(os.path.join(out_dir, product))
        pats = np.asarray(ds[var].data)
        lat_name = [d for d in ds[var].dims if 'lat' in d][0]
        lon_name = [d for d in ds[var].dims if 'lon' in d][0]
        fig = plot_patterns(
            pats, ds.coords[lat_name].data, ds.coords[lon_name].data,
            titles=[f"{title} {i}" for i in range(pats.shape[0])])
        save(fig, product.replace(".nc", "_patterns.png"))

    aa = open_dataset(os.path.join(out_dir, "hadisst_aa.nc"))
    fig = plot_state_embedding(np.asarray(aa['weights'].data),
                               method="mds")
    save(fig, "mds_hull.png")

    with open(os.path.join(out_dir, "model_selection.csv")) as f:
        rows = list(csv.DictReader(f))
    results = {int(r['k']): {m: float(r[m]) for m in r if m != 'k'}
               for r in rows}
    fig = plot_model_selection(results, metrics=("cost", "rmse"))
    save(fig, "model_selection.png")


if __name__ == "__main__":
    main()
