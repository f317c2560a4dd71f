"""Smoke test: the case-study example renders the combined-plots
artifact inventory (round-2 verdict item 4).

Runs examples/hadisst_case_study.py --quick end to end (synthetic data
-> anomalies -> AA/GPNH/k-means/PCA drivers -> analysis) and asserts
the figure/CSV outputs of the reference's combined-plots notebook
(/root/reference/notebooks/hadisst_combined_plots.ipynb) exist and
carry real content.
"""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPECTED_FIGURES = [
    "hadisst_aa_patterns.png",
    "hadisst_gpnh_patterns.png",
    "hadisst_kmeans_patterns.png",
    "hadisst_pca_patterns.png",
    "mds_hull.png",
    "model_selection.png",
]


def test_case_study_writes_figures_and_csv(tmp_path):
    out = str(tmp_path / "case_study")
    subprocess.run(
        [sys.executable, "examples/hadisst_case_study.py", out,
         "--quick", "--platform", "cpu"],
        check=True, cwd=REPO, timeout=1500)

    for name in EXPECTED_FIGURES:
        path = os.path.join(out, name)
        assert os.path.exists(path), name
        # A rendered multi-panel PNG is tens of kB; an empty canvas is
        # not.
        assert os.path.getsize(path) > 5000, name

    with open(os.path.join(out, "model_selection.csv")) as f:
        rows = list(csv.DictReader(f))
    ks = [int(r["k"]) for r in rows]
    assert ks == sorted(ks) and len(ks) >= 2
    costs = [float(r["cost"]) for r in rows]
    assert all(np.isfinite(costs))
    # More components never fit worse on the same data.
    assert costs[-1] <= costs[0] + 1e-9

    # Driver products behind the figures exist with the full schema.
    from convex_dim_red_tpu.pipelines.dataset import open_dataset
    aa = open_dataset(os.path.join(out, "hadisst_aa.nc"))
    assert 'archetypes' in aa.data_vars and 'weights' in aa.data_vars
    assert np.isfinite(float(aa.attrs['training_set_cost']))
