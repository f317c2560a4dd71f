"""End-to-end pipeline tests: synthetic raw data -> anomalies -> drivers.

Exercises the netCDF(HDF5) IO layer, the notebook-derived preprocessing,
and the case-study driver template on a small synthetic HadISST-schema
dataset.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from convex_dim_red_tpu.pipelines.dataset import (Dataset, Variable,
                                                  decode_cf_time,
                                                  open_dataset)
from convex_dim_red_tpu.pipelines import preprocess as pp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# Dataset IO
# ---------------------------------------------------------------------------


def test_dataset_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    path = str(tmp_path / "rt.nc")
    ds = Dataset(
        data_vars={'x': Variable(('time', 'lat'), rng.standard_normal(
            (5, 3)), {'units': 'K'})},
        coords={'time': Variable(('time',), np.arange(5.0),
                                 {'units': 'days since 2000-1-1'}),
                'lat': Variable(('lat',), np.array([0.0, 10.0, 20.0]))},
        attrs={'title': 'test', 'base_period_start_year': '1981'})
    ds.to_netcdf(path)

    back = open_dataset(path)
    assert np.allclose(back['x'].data, ds['x'].data)
    assert back['x'].dims == ('time', 'lat')
    assert back.attrs['title'] == 'test'
    assert np.allclose(back.coords['lat'].data, [0, 10, 20])


def test_decode_cf_time_days():
    t = Variable(('time',), np.array([0.0, 31.0, 59.0, 365.0]),
                 {'units': 'days since 2000-1-1'})
    years, months = decode_cf_time(t)
    assert years.tolist() == [2000, 2000, 2000, 2000]
    assert months.tolist() == [1, 2, 2, 12]


def test_decode_cf_time_hours_and_months():
    t = Variable(('time',), np.array([0.0, 24.0 * 40]),
                 {'units': 'hours since 1958-1-1'})
    years, months = decode_cf_time(t)
    assert years.tolist() == [1958, 1958]
    assert months.tolist() == [1, 2]

    t = Variable(('time',), np.array([0, 13]),
                 {'units': 'months since 1870-1-1'})
    years, months = decode_cf_time(t)
    assert years.tolist() == [1870, 1871]
    assert months.tolist() == [1, 2]


def test_sel_time_years_and_range(tmp_path):
    n = 48
    ds = Dataset(
        data_vars={'x': Variable(('time', 'lat'),
                                 np.arange(n * 3.0).reshape(n, 3))},
        coords={'time': Variable(('time',),
                                 np.arange(n) * 30.4375,
                                 {'units': 'days since 2000-1-1'}),
                'lat': Variable(('lat',), np.array([-50.0, 0.0, 50.0]))})
    sub = ds.sel_time_years('time', 2001, 2001)
    assert sub.dims['time'] == 12
    sub2 = ds.sel_range('lat', -45.5, 45.5)
    assert sub2.dims['lat'] == 1


# ---------------------------------------------------------------------------
# Preprocessing
# ---------------------------------------------------------------------------


def test_latitude_weights():
    lats = np.array([0.0, 60.0, 90.0])
    assert np.allclose(pp.latitude_weights(lats, 'cos'),
                       [1.0, 0.5, 0.0], atol=1e-12)
    # cos(pi/2) rounds to ~6e-17, so its sqrt is ~8e-9 (same in the
    # reference's implementation).
    assert np.allclose(pp.latitude_weights(lats, 'scos'),
                       [1.0, np.sqrt(0.5), 0.0], atol=1e-8)
    assert np.allclose(pp.latitude_weights(lats, 'none'), 1.0)
    with pytest.raises(ValueError):
        pp.latitude_weights(lats, 'bogus')


def test_moving_average_trend_recovers_linear_trend():
    n = 120
    t = np.arange(n, dtype=float)
    data = (2.0 + 0.05 * t)[:, None] + np.cos(
        2 * np.pi * t / 12)[:, None] * np.ones((1, 4))
    ma = pp.moving_average_trend(data, period=12)
    # Away from boundaries the 13-point half-weight window kills the
    # period-12 cycle exactly and returns the linear trend.
    interior = slice(6, n - 6)
    assert np.allclose(ma[interior], (2.0 + 0.05 * t)[interior, None],
                       atol=1e-10)
    assert np.isnan(ma[:6]).all() and np.isnan(ma[-6:]).all()


def test_monthly_anomalies_remove_cycle_and_trend():
    rng = np.random.RandomState(0)
    n = 240
    t = np.arange(n, dtype=float)
    years = 1981 + (t // 12).astype(int)
    cycle = 3.0 * np.sin(2 * np.pi * t / 12)
    trend = 0.01 * t
    signal = rng.standard_normal(n) * 0.1
    data = (10.0 + cycle + trend + signal)[:, None] * np.ones((1, 5))

    anom, trend_fit, seasonal, base = pp.calculate_monthly_anomalies(
        data, years, period=12, trend_order=1)

    # Anomalies should be small relative to the removed structure.
    assert np.nanstd(anom) < 0.3
    assert base == (1981, 2000)
    # Seasonal cycle should match the planted sinusoid closely.
    assert np.corrcoef(seasonal[:, 0], cycle)[0, 1] > 0.99


def test_standardize_by_month():
    rng = np.random.RandomState(1)
    n = 120
    months = np.arange(n) % 12 + 1
    years = 2000 + np.arange(n) // 12
    data = rng.standard_normal((n, 3)) * (months[:, None] + 1.0)
    out = pp.standardize_by_month(data, months, years, (2000, 2009))
    for m in range(1, 13):
        sel = months == m
        assert np.allclose(out[sel].std(axis=0), 1.0, atol=1e-10)
        assert np.allclose(out[sel].mean(axis=0), 0.0, atol=1e-10)


def test_polynomial_trend_vectorized_matches_polyfit():
    rng = np.random.RandomState(2)
    data = rng.standard_normal((50, 4)).cumsum(axis=0)
    data[:, 2] = np.nan  # missing feature stays missing
    trend = pp.calculate_polynomial_trend(data, trend_order=2)
    for j in (0, 1, 3):
        coeffs = np.polyfit(np.arange(50.0), data[:, j], 2)
        fitted = np.polyval(coeffs, np.arange(50.0))
        assert np.allclose(trend['fitted_value'][:, j], fitted, atol=1e-8)
    assert np.isnan(trend['fitted_value'][:, 2]).all()


# ---------------------------------------------------------------------------
# End-to-end driver run on synthetic data
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def synthetic_anomalies(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hadisst")
    raw = str(tmp / "raw.nc")
    anom = str(tmp / "anom.nc")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bin",
                                      "make_synthetic_hadisst.py"),
         raw, "--n-years", "30", "--n-lat", "24", "--n-lon", "36",
         "--start-year", "1989"],
        check=True, env=env, cwd=REPO)
    subprocess.run(
        [sys.executable, "-m", "convex_dim_red_tpu.cli.anomalies",
         raw, anom, "--var-name", "sst",
         "--base-period-start-year", "1994",
         "--base-period-end-year", "2013"],
        check=True, env=env, cwd=REPO)
    return anom


def test_anomaly_pipeline_output(synthetic_anomalies):
    ds = open_dataset(synthetic_anomalies)
    assert 'sst_anom' in ds and 'sst_std_anom' in ds
    assert ds.attrs['base_period_start_year'] == '1994'
    anom = ds['sst_anom'].data
    # Ocean cells are finite; land stays NaN; anomalies are centered.
    finite = np.isfinite(anom).any(axis=0)
    assert finite.any() and (~finite).any()
    assert abs(np.nanmean(anom)) < 0.1


def _run_driver(name, synthetic_anomalies, tmpdir, extra):
    out = str(tmpdir / f"{name}.nc")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "convex_dim_red_tpu.cli.drivers", name,
         synthetic_anomalies, out, "--platform", "cpu"] + extra,
        check=True, env=env, cwd=REPO)
    return open_dataset(out)


@pytest.mark.slow
def test_hadisst_aa_driver_end_to_end(synthetic_anomalies, tmp_path):
    ds = _run_driver("hadisst_aa", synthetic_anomalies, tmp_path,
                     ["--n-components", "3", "--n-init", "4",
                      "--tolerance", "1e-4", "--max-iterations", "100",
                      "--random-seed", "0"])
    for var in ("weights", "dictionary", "archetypes", "cost_deltas"):
        assert var in ds, var
    W = ds['weights'].data
    assert np.allclose(W.sum(axis=1), 1.0, atol=1e-6)
    arch = ds['archetypes'].data
    assert arch.shape[0] == 3 and arch.ndim == 3
    # NaN-refilled land cells present in patterns.
    assert np.isnan(arch).any() and np.isfinite(arch).any()
    for attr in ('training_set_cost', 'training_set_rmse', 'test_set_cost',
                 'test_set_rmse', 'n_iter', 'avg_time_per_iter',
                 'elapsed_time', 'n_init', 'tolerance', 'lat_weights',
                 'random_seed'):
        assert attr in ds.attrs, attr


@pytest.mark.slow
def test_hadisst_kmeans_driver_end_to_end(synthetic_anomalies, tmp_path):
    ds = _run_driver("hadisst_kmeans", synthetic_anomalies, tmp_path,
                     ["--n-components", "2", "--n-init", "3",
                      "--n-trials", "5", "--random-seed", "0"])
    assert 'weights' in ds and 'centroids' in ds
    W = ds['weights'].data
    assert set(np.unique(W)).issubset({0.0, 1.0})
    assert np.allclose(W.sum(axis=1), 1.0)
    for attr in ('gap_statistic', 'gap_sk', 'training_set_inertia',
                 'elapsed_time'):
        assert attr in ds.attrs


@pytest.mark.slow
def test_hadisst_kmeans_driver_cross_validate(synthetic_anomalies,
                                              tmp_path):
    # CV branch + init/tolerance flag parity (reference
    # run_hadisst_kmeans.py:48-71, :203-268).
    ds = _run_driver("hadisst_kmeans", synthetic_anomalies, tmp_path,
                     ["--n-components", "2", "--n-init", "2",
                      "--n-trials", "3", "--init", "random",
                      "--tolerance", "1e-3", "--cross-validate",
                      "--n-folds", "3", "--random-seed", "0"])
    for attr in ('training_set_cost', 'training_set_cost_std',
                 'training_set_rmse', 'training_set_rmse_std',
                 'training_set_gap', 'training_set_gap_std',
                 'training_set_sk', 'training_set_sk_std', 'n_folds',
                 'gap_statistic', 'gap_sk', 'init', 'tolerance'):
        assert attr in ds.attrs, attr
    assert ds.attrs['init'] == 'random'
    assert ds.attrs['n_folds'] == '3'


@pytest.mark.slow
def test_hadisst_gpnh_driver_end_to_end(synthetic_anomalies, tmp_path):
    ds = _run_driver("hadisst_gpnh", synthetic_anomalies, tmp_path,
                     ["--n-components", "2", "--n-init", "2",
                      "--lambda-W", "1e-3", "--tolerance", "1e-4",
                      "--max-iterations", "50", "--random-seed", "0"])
    assert 'weights' in ds and 'dictionary' in ds
    assert np.allclose(ds['weights'].data.sum(axis=1), 1.0, atol=1e-6)
    assert 'lambda_W' in ds.attrs


# ---------------------------------------------------------------------------
# JRA-55 drivers on synthetic data
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def synthetic_jra55(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("jra55")
    grid = str(tmp / "hgt.nc")
    pcs = str(tmp / "pcs.nc")
    env = dict(os.environ)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bin",
                                      "make_synthetic_jra55.py"),
         grid, "--kind", "grid", "--n-years", "15"],
        check=True, env=env, cwd=REPO)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bin",
                                      "make_synthetic_jra55.py"),
         pcs, "--kind", "pcs", "--n-years", "15"],
        check=True, env=env, cwd=REPO)
    return grid, pcs


@pytest.mark.slow
def test_jra55_kmeans_driver_end_to_end(synthetic_jra55, tmp_path):
    grid, _ = synthetic_jra55
    ds = _run_driver("jra55_kmeans", grid, tmp_path,
                     ["--n-components", "2", "--n-init", "3",
                      "--n-trials", "4", "--random-seed", "0"])
    assert 'weights' in ds and 'centroids' in ds
    # Latitude band [20, 90] retained only.
    assert 'gap_statistic' in ds.attrs


def test_jra55_pca_aa_driver_end_to_end(synthetic_jra55, tmp_path):
    _, pcs = synthetic_jra55
    ds = _run_driver("jra55_pca_aa", pcs, tmp_path,
                     ["--n-components", "3", "--n-init", "3",
                      "--tolerance", "1e-5", "--max-iterations", "100",
                      "--random-seed", "0", "--standardize"])
    W = ds['weights'].data
    assert np.allclose(W.sum(axis=1), 1.0, atol=1e-6)
    assert ds['archetypes'].data.shape[0] == 3


@pytest.mark.slow
def test_jra55_pca_gpnh_driver_end_to_end(synthetic_jra55, tmp_path):
    _, pcs = synthetic_jra55
    ds = _run_driver("jra55_pca_gpnh", pcs, tmp_path,
                     ["--n-components", "2", "--n-init", "2",
                      "--lambda-W", "1e-4", "--tolerance", "1e-5",
                      "--max-iterations", "60", "--random-seed", "0"])
    assert np.allclose(ds['weights'].data.sum(axis=1), 1.0, atol=1e-6)


def test_hadisst_pca_driver_end_to_end(synthetic_anomalies, tmp_path):
    # The run_pca product (reference notebooks/hadisst_pca.ipynb):
    # EOFs + PCs + means + residuals + variance spectra + cost attrs.
    ds = _run_driver("hadisst_pca", synthetic_anomalies, tmp_path,
                     ["--n-components", "4", "--random-seed", "0"])
    for var in ("PCs", "EOFs", "means", "residuals",
                "explained_variance", "explained_variance_ratio",
                "singular_values"):
        assert var in ds, var
    for attr in ('training_set_cost', 'training_set_size',
                 'training_set_rmse', 'test_set_cost', 'test_set_size',
                 'test_set_rmse', 'noise_variance', 'tolerance',
                 'lat_weights', 'elapsed_time'):
        assert attr in ds.attrs, attr
    pcs = ds['PCs'].data
    eofs = ds['EOFs'].data
    assert pcs.shape[1] == 4 and eofs.shape[0] == 4
    # PCs cover the full sample axis (validation rows via transform).
    assert np.isfinite(pcs).all()
    # EOF grid patterns: land NaN-refilled, ocean finite; valid-cell
    # rows are orthonormal.
    assert np.isnan(eofs).any() and np.isfinite(eofs).any()
    flat = eofs.reshape(4, -1)
    valid = flat[:, np.isfinite(flat).all(axis=0)]
    assert np.allclose(valid @ valid.T, np.eye(4), atol=1e-6)
    # Variance spectrum is sorted and the ratio is a fraction.
    ev = ds['explained_variance'].data
    assert (np.diff(ev) <= 1e-12).all()
    assert 0 < ds['explained_variance_ratio'].data.sum() <= 1.0 + 1e-9


@pytest.mark.slow
def test_jra55_pca_feeds_pc_drivers(synthetic_jra55, tmp_path):
    # End-to-end EOF path from gridded data: jra55_pca produces the PCs
    # netCDF, jra55_pca_aa consumes it (the chain the reference runs
    # through its jra55 PCA notebook + run_jra55_pca_aa.py).
    grid, _ = synthetic_jra55
    pcs_ds = _run_driver("jra55_pca", grid, tmp_path,
                         ["--n-components", "6", "--random-seed", "0"])
    assert 'PCs' in pcs_ds
    assert pcs_ds['PCs'].dims[0] == 'initial_time0_hours'
    pcs_path = str(tmp_path / "jra55_pca.nc")  # written by _run_driver
    ds = _run_driver("jra55_pca_aa", pcs_path, tmp_path,
                     ["--n-components", "2", "--n-init", "2",
                      "--tolerance", "1e-4", "--max-iterations", "50",
                      "--random-seed", "0"])
    W = ds['weights'].data
    assert np.allclose(W.sum(axis=1), 1.0, atol=1e-6)
    assert ds['archetypes'].data.shape == (2, 6)


@pytest.mark.slow
def test_jra55_pca_kmeans_driver_end_to_end(synthetic_jra55, tmp_path):
    _, pcs = synthetic_jra55
    ds = _run_driver("jra55_pca_kmeans", pcs, tmp_path,
                     ["--n-components", "2", "--n-init", "2",
                      "--n-trials", "4", "--reference", "pca",
                      "--random-seed", "0"])
    assert 'gap_statistic' in ds.attrs


@pytest.mark.slow
def test_pc_driver_restrict_to_base_period(synthetic_jra55, tmp_path):
    # Reference PC drivers restrict the PCs to the EOFs' climatology
    # period via the eofs_{start,end}_year attrs and echo it as
    # base_period_* on the output (run_jra55_pca_aa.py:247-269).
    _, pcs = synthetic_jra55  # 15 years from 1958, eofs attrs 1958-1972
    ds = open_dataset(pcs)
    ds.attrs['eofs_start_year'] = '1958'
    ds.attrs['eofs_end_year'] = '1964'
    short = str(tmp_path / "pcs_short.nc")
    ds.to_netcdf(short)

    from convex_dim_red_tpu.pipelines.dataset import decode_cf_time
    years, _ = decode_cf_time(ds.coords['initial_time0_hours'])
    n_base = int(((years >= 1958) & (years <= 1964)).sum())
    assert abs(n_base - 7 * 12) <= 1  # synthetic axis is ~monthly

    out = _run_driver("jra55_pca_aa", short, tmp_path,
                      ["--n-components", "2", "--n-init", "2",
                       "--tolerance", "1e-4", "--max-iterations", "30",
                       "--random-seed", "0",
                       "--restrict-to-base-period"])
    assert out['weights'].data.shape[0] == n_base
    assert out.attrs['base_period_start_year'] == '1958'
    assert out.attrs['base_period_end_year'] == '1964'

    full = _run_driver("jra55_pca_aa", short, tmp_path,
                       ["--n-components", "2", "--n-init", "2",
                        "--tolerance", "1e-4", "--max-iterations", "30",
                        "--random-seed", "0"])
    assert full['weights'].data.shape[0] == 15 * 12


def test_pca_product_carries_eofs_period_attrs(synthetic_jra55, tmp_path):
    # The jra55_pca product must be consumable by the reference PC
    # drivers, which read eofs_{start,end}_year unconditionally.
    grid, _ = synthetic_jra55  # 15 years from 1958
    ds = _run_driver("jra55_pca", grid, tmp_path,
                     ["--n-components", "3", "--random-seed", "0"])
    assert ds.attrs['eofs_start_year'] == '1958'
    assert ds.attrs['eofs_end_year'] == '1972'


# ---------------------------------------------------------------------------
# Driver-side transform backend threading + AA cross-validation branch
# ---------------------------------------------------------------------------


def test_aa_transform_threads_configured_backend(monkeypatch):
    """The driver/CV transform must dispatch the CONFIGURED weights-QP
    backend (default 'auto' -> oneshot resolution inside
    quad_simplex_spg_batch), not silently fall back to the 'xla'
    call-site default — the regression this pins: QPSolverConfig.kwargs()
    excludes ``backend`` (reference transform protocol:
    archetypal_analysis.py:1151-1199)."""
    import jax
    from convex_dim_red_tpu.cli import common as cli_common
    from convex_dim_red_tpu.models._common import (QPSolverConfig,
                                                   make_config)

    captured = {}
    real = cli_common.quad_simplex_spg_batch

    def spy(A, B, X0, backend="xla", **kw):
        captured['backend'] = backend
        return real(A, B, X0, backend='xla', **kw)

    monkeypatch.setattr(cli_common, 'quad_simplex_spg_batch', spy)

    rng = np.random.RandomState(0)
    arch = rng.uniform(size=(3, 6))
    data = rng.uniform(size=(10, 6))

    cfg = make_config(QPSolverConfig, None)  # library default: 'auto'
    Z, cost = cli_common._aa_transform(arch, data, jax.random.PRNGKey(0),
                                       cfg, max_iterations=50)
    assert captured['backend'] == cfg.backend == 'auto'
    assert np.allclose(np.asarray(Z).sum(axis=1), 1.0, atol=1e-10)

    captured.clear()
    cli_common._aa_transform(arch, data, jax.random.PRNGKey(0),
                             make_config(QPSolverConfig,
                                         {'backend': 'xla'}),
                             max_iterations=50)
    assert captured['backend'] == 'xla'


@pytest.mark.slow
def test_aa_analysis_cross_validate_attrs():
    """AA CV branch: held-out-fold stats recorded under the reference's
    'training_set_*' attr names (deliberate quirk; see cli/common.py) and
    the transform path exercised per fold."""
    rng = np.random.RandomState(1)
    basis = rng.uniform(size=(3, 8))
    Z = rng.uniform(size=(40, 3))
    Z /= Z.sum(axis=1, keepdims=True)
    X = Z @ basis

    from convex_dim_red_tpu.cli.common import aa_analysis
    best, attrs = aa_analysis(
        X, None, n_components=3, delta=0.0, init='random', n_init=2,
        tolerance=1e-6, max_iterations=50, random_seed=0,
        cross_validate=True, n_folds=3)
    for attr in ('training_set_cost', 'training_set_cost_std',
                 'training_set_rmse', 'training_set_rmse_std', 'n_folds'):
        assert attr in attrs, attr
    assert attrs['n_folds'] == '3'
    assert np.isfinite(float(attrs['training_set_cost']))


def test_decode_cf_time_fixed_calendars():
    """CF model calendars (360_day / noleap / all_leap) decode month
    labels correctly, including where they diverge from the Gregorian
    calendar (reference products are CF files; CF conventions §4.4.1)."""
    # 360_day: every month is exactly 30 days.
    t = Variable(('time',), np.array([0.0, 30.0, 359.0, 360.0, 719.0]),
                 {'units': 'days since 1850-1-1', 'calendar': '360_day'})
    years, months = decode_cf_time(t)
    assert years.tolist() == [1850, 1850, 1850, 1851, 1851]
    assert months.tolist() == [1, 2, 12, 1, 12]

    # A Feb-30 base date is legal in the 360_day calendar and must not
    # crash the (Gregorian) datetime constructor.
    t = Variable(('time',), np.array([1.0]),
                 {'units': 'days since 1850-2-30', 'calendar': '360_day'})
    years, months = decode_cf_time(t)
    assert (years.tolist(), months.tolist()) == ([1850], [3])

    # noleap: Gregorian month lengths, never a Feb 29.  90 days after
    # 1999-12-01 is Mar 1 2000 in noleap (the real calendar says
    # Feb 29 2000 — 2000 IS a Gregorian leap year).
    t = Variable(('time',), np.array([0.0, 31.0, 59.0, 364.0, 365.0]),
                 {'units': 'days since 1850-1-1', 'calendar': 'noleap'})
    years, months = decode_cf_time(t)
    assert years.tolist() == [1850, 1850, 1850, 1850, 1851]
    assert months.tolist() == [1, 2, 3, 12, 1]
    t = Variable(('time',), np.array([90.0]),
                 {'units': 'days since 1999-12-1', 'calendar': '365_day'})
    years, months = decode_cf_time(t)
    assert (years.tolist(), months.tolist()) == ([2000], [3])

    # all_leap: every February has 29 days.
    t = Variable(('time',), np.array([59.0, 60.0]),
                 {'units': 'days since 2001-1-1', 'calendar': 'all_leap'})
    years, months = decode_cf_time(t)
    assert (years.tolist(), months.tolist()) == ([2001, 2001], [2, 3])

    # An explicit standard calendar attribute keeps the Gregorian path.
    t = Variable(('time',), np.array([59.0]),
                 {'units': 'days since 2000-1-1', 'calendar': 'standard'})
    years, months = decode_cf_time(t)
    assert (years.tolist(), months.tolist()) == ([2000], [2])


def test_decode_cf_time_julian_calendar():
    """CF julian calendar: leap every 4th year with NO century
    exception, so 1900 has a Feb 29 (the proleptic-Gregorian datetime64
    path would mislabel day 59 as March; CF conventions §4.4.1)."""
    t = Variable(('time',), np.array([0.0, 58.0, 59.0, 60.0, 365.0,
                                      366.0]),
                 {'units': 'days since 1900-1-1', 'calendar': 'julian'})
    years, months = decode_cf_time(t)
    assert years.tolist() == [1900, 1900, 1900, 1900, 1900, 1901]
    assert months.tolist() == [1, 2, 2, 3, 12, 1]

    # Non-leap julian year and an hours-unit base mid-month.
    t = Variable(('time',), np.array([59.0]),
                 {'units': 'days since 1901-1-1', 'calendar': 'julian'})
    years, months = decode_cf_time(t)
    assert (years.tolist(), months.tolist()) == ([1901], [3])
    t = Variable(('time',), np.array([0.0, 24.0 * 16]),
                 {'units': 'hours since 1870-1-16', 'calendar': 'julian'})
    years, months = decode_cf_time(t)
    assert years.tolist() == [1870, 1870]
    assert months.tolist() == [1, 2]


def test_hadisst_conventions_fixture(tmp_path):
    """End-to-end ingest of a HadISST-conventions-faithful synthetic
    file: ice-flag sentinel -1000.0 (reference run_hadisst_aa.py:22-34),
    netCDF _FillValue, DESCENDING latitudes, and days-since-1870 time
    (reference get_hadisst.sh:13-16) — through the anomalies CLI and
    cli.common.load_field."""
    from convex_dim_red_tpu.cli.anomalies import anomalies_main
    from convex_dim_red_tpu.cli.common import load_field

    nt, nlat, nlon = 48, 4, 3
    rng = np.random.RandomState(0)
    lat = np.array([30.0, 10.0, -10.0, -30.0])   # HadISST: descending
    lon = np.array([0.5, 120.5, 240.5])
    base = np.datetime64('1870-01-01')
    stamps = np.arange('1870-01', '1880-01', dtype='datetime64[M]')[:nt]
    days = (stamps.astype('datetime64[D]') - base).astype(int).astype(float)

    sst = 20.0 + rng.standard_normal((nt, nlat, nlon))
    sst[:, 3, :] = -1000.0          # ice-flagged row
    fill = -1.0e30
    sst_store = sst.copy()
    sst_store[:, 0, 0] = fill       # land cell as _FillValue

    ds = Dataset(
        data_vars={'sst': Variable(('time', 'latitude', 'longitude'),
                                   sst_store, {'_FillValue': fill})},
        coords={
            'time': Variable(('time',), days,
                             {'units': 'days since 1870-1-1',
                              'calendar': 'standard'}),
            'latitude': Variable(('latitude',), lat,
                                 {'units': 'degrees_north'}),
            'longitude': Variable(('longitude',), lon,
                                  {'units': 'degrees_east'}),
        })
    src = str(tmp_path / 'hadisst.nc')
    out = str(tmp_path / 'hadisst_anom.nc')
    ds.to_netcdf(src)

    # _FillValue decodes to NaN on read.
    back = open_dataset(src)
    assert np.isnan(back['sst'].data[:, 0, 0]).all()
    assert np.isfinite(back['sst'].data[:, 1, :]).all()

    anomalies_main([src, out,
                    '--base-period-start-year', '1870',
                    '--base-period-end-year', '1873'])

    anom_ds = open_dataset(out)
    anom = anom_ds['sst_anom'].data
    # Ice sentinel and fill cells are missing all the way through...
    assert np.isnan(anom[:, 3, :]).all()
    assert np.isnan(anom[:, 0, 0]).all()
    # ...while ocean cells carry finite centered anomalies.
    assert np.isfinite(anom[:, 1, :]).all()
    assert abs(np.nanmean(anom[:, 1, :])) < 1.0

    years, months = decode_cf_time(anom_ds.coords['time'])
    assert years.min() == 1870 and years.max() == 1873
    assert months[:3].tolist() == [1, 2, 3]

    # load_field keeps the descending latitude order and aligns the
    # scos weights with it.
    f = load_field(out, 'sst_anom', 'time', lat_name='latitude',
                   lat_weights='scos')
    assert f['data'].shape == (nt, nlat, nlon)
    w = np.asarray(f['weights']).reshape(nlat)
    expected = np.sqrt(np.cos(np.deg2rad(lat)))
    assert np.allclose(w, expected)
    # Latitude-range subsetting works on the descending axis.
    f2 = load_field(out, 'sst_anom', 'time', lat_name='latitude',
                    min_latitude=0.0, max_latitude=90.0,
                    lat_weights='scos')
    assert f2['data'].shape == (nt, 2, nlon)
