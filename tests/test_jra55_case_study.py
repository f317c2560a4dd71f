"""Smoke tests: the JRA-55 case-study reconstruction and the
distributed-scaling tour run end to end (round-3 verdict items 1/4).

``examples/jra55_case_study.py`` is the runnable reconstruction of the
reference's stripped ``notebooks/jra55_hgt500_pca_combined.ipynb``
(/root/reference/.MISSING_LARGE_BLOBS:1) — the only end-to-end path
covering the gridded -> EOF/PC -> PC-space factorization -> grid-state
chain of the four JRA-55 drivers
(/root/reference/bin/run_jra55_pca_aa.py:119-133 etc.).  This asserts
its artifact inventory on the CPU backend so the chain cannot rot
silently.
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
    "jra55_aa_grid_states.png",
    "jra55_gpnh_grid_states.png",
    "jra55_pc_kmeans_grid_states.png",
    "jra55_grid_kmeans_grid_states.png",
    "jra55_eof_patterns.png",
    "model_selection.png",
]

METHODS = ("aa", "gpnh", "pc_kmeans", "grid_kmeans")


def test_jra55_case_study_quick_artifacts(tmp_path):
    out = str(tmp_path / "jra55_case_study")
    subprocess.run(
        [sys.executable, "examples/jra55_case_study.py", out,
         "--quick", "--platform", "cpu"],
        check=True, cwd=REPO, timeout=1500)

    for name in EXPECTED_FIGURES:
        path = os.path.join(out, name)
        assert os.path.exists(path), name
        # A rendered multi-panel PNG is tens of kB; an empty canvas
        # is not.
        assert os.path.getsize(path) > 5000, name

    # State-sorting table: every method's 4 states ordered vs the
    # leading EOFs with finite correlations.
    with open(os.path.join(out, "state_sort.csv")) as f:
        rows = list(csv.DictReader(f))
    by_method = {m: [r for r in rows if r["method"] == m]
                 for m in METHODS}
    for m in METHODS:
        assert len(by_method[m]) == 4, m
        corrs = [float(r["abs_corr"]) for r in by_method[m]]
        assert all(np.isfinite(corrs)) and all(0 <= c <= 1.000001
                                               for c in corrs)

    # Cross-method match table: each AA archetype matched to a
    # grid-kmeans centroid.
    with open(os.path.join(out, "cross_method_match.csv")) as f:
        match = list(csv.DictReader(f))
    assert [int(r["aa_state"]) for r in match] == [0, 1, 2, 3]
    assert all(0 <= int(r["grid_kmeans_centroid"]) < 4 for r in match)

    # Model-selection CSV: ascending k, finite, non-increasing cost.
    with open(os.path.join(out, "model_selection.csv")) as f:
        sel = list(csv.DictReader(f))
    ks = [int(r["k"]) for r in sel]
    assert ks == sorted(ks) and len(ks) >= 2
    costs = [float(r["cost"]) for r in sel]
    assert all(np.isfinite(costs))
    assert costs[-1] <= costs[0] + 1e-9

    # Driver products behind the figures carry the full attr schema.
    from convex_dim_red_tpu.pipelines.dataset import open_dataset
    aa = open_dataset(os.path.join(out, "jra55_pca_aa.nc"))
    assert 'archetypes' in aa.data_vars and 'weights' in aa.data_vars
    assert np.isfinite(float(aa.attrs['training_set_cost']))


def test_distributed_scaling_tour_cpu8():
    """examples/distributed_scaling.py --cpu8 walks every estimator's
    mesh= surface on the virtual 8-device mesh; assert it completes and
    prints its terminal OK line (the only other committed example — no
    silent rot)."""
    res = subprocess.run(
        [sys.executable, "examples/distributed_scaling.py", "--cpu8"],
        check=True, cwd=REPO, timeout=1500, capture_output=True,
        text=True)
    assert "distributed scaling tour OK" in res.stdout
