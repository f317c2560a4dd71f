"""Tests for analysis utilities, sweeps, checkpointing, profiling."""

import numpy as np
import jax
import pytest

from convex_dim_red_tpu.pipelines.analysis import (
    embed_states, model_selection_table, pattern_correlation,
    reconstruction_rmse, sort_states, write_model_selection_csv)
from convex_dim_red_tpu.parallel.sweep import (
    aa_model_selection_sweep, kmeans_model_selection_sweep)
from convex_dim_red_tpu.utils.checkpoint import (
    load_checkpoint, resume_kernel_aa, save_checkpoint)
from convex_dim_red_tpu.utils.profiling import Timer, block_and_time


def test_pattern_correlation_identity_and_sign():
    rng = np.random.RandomState(0)
    R = rng.standard_normal((3, 40))
    corr = pattern_correlation(R, R)
    assert np.allclose(np.diag(corr), 1.0, atol=1e-12)
    corr = pattern_correlation(-R, R)
    assert np.allclose(np.diag(corr), -1.0, atol=1e-12)


def test_pattern_correlation_ignores_nan_cells():
    rng = np.random.RandomState(1)
    R = rng.standard_normal((2, 30))
    P = R.copy()
    P[:, :5] = np.nan
    corr = pattern_correlation(P, R)
    assert np.allclose(np.diag(corr), 1.0, atol=1e-12)


def test_sort_states_recovers_permutation():
    rng = np.random.RandomState(2)
    R = rng.standard_normal((4, 60))
    perm = np.array([2, 0, 3, 1])
    signs_true = np.array([1, -1, 1, -1])
    P = signs_true[:, None] * R[perm] + 0.01 * rng.standard_normal((4, 60))

    # P[i] matches R[perm[i]]; sorting P against R should invert that.
    order, signs, corr = sort_states(P, R)
    for j in range(4):
        assert perm[order[j]] == j
        assert signs[j] == signs_true[order[j]]


def test_model_selection_table_and_csv(tmp_path):
    results = {3: {'cost': 1.0, 'gap': 0.5},
               2: {'cost': 2.0, 'gap': 0.3, 'gap_sk': 0.01}}
    header, rows = model_selection_table(results)
    assert header[0] == 'k'
    assert rows[0][0] == 2 and rows[1][0] == 3
    path = str(tmp_path / "ms.csv")
    write_model_selection_csv(path, results)
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 3 and lines[0].startswith('k,')


def test_reconstruction_rmse_zero_for_exact():
    rng = np.random.RandomState(3)
    W = rng.rand(20, 3)
    P = rng.standard_normal((3, 15))
    assert reconstruction_rmse(W @ P, W, P) < 1e-12


@pytest.mark.slow
def test_embed_states_shapes():
    rng = np.random.RandomState(4)
    W = rng.rand(30, 3)
    W /= W.sum(axis=1, keepdims=True)
    emb = embed_states(W, method='mds')
    assert emb.shape == (30, 2)
    with pytest.raises(ValueError):
        embed_states(W, method='umap')


@pytest.mark.slow
def test_aa_sweep_costs_decrease_with_k():
    rng = np.random.RandomState(5)
    basis = rng.standard_normal((4, 8))
    Z = rng.rand(80, 4)
    Z /= Z.sum(axis=1, keepdims=True)
    # Plant exact hull vertices so the k=4 optimum is near-zero cost.
    for comp, idx in enumerate([3, 20, 45, 71]):
        Z[idx] = 0.0
        Z[idx, comp] = 1.0
    X = Z @ basis + 0.001 * rng.standard_normal((80, 8))

    results = aa_model_selection_sweep(
        X, ks=[2, 3, 4], key=jax.random.PRNGKey(0), n_init=8,
        tolerance=1e-10, max_iterations=300)
    costs = [results[k]['cost'] for k in (2, 3, 4)]
    assert costs[0] > costs[1] > costs[2]
    # With the true k=4 the planted structure is essentially recovered.
    assert costs[2] < 0.01


@pytest.mark.slow
def test_kmeans_sweep_gap_columns():
    rng = np.random.RandomState(6)
    X = np.concatenate([c + 0.3 * rng.standard_normal((30, 2))
                        for c in [(0, 0), (8, 8)]])
    results = kmeans_model_selection_sweep(
        X, ks=[1, 2, 3], key=jax.random.PRNGKey(0), n_init=3, n_trials=5)
    assert set(results) == {1, 2, 3}
    assert results[2]['gap'] > results[1]['gap']


@pytest.mark.slow
def test_kmeans_sweep_on_mesh_matches_single_device():
    from convex_dim_red_tpu.parallel.mesh import create_mesh

    rng = np.random.RandomState(16)
    X = np.concatenate([c + 0.3 * rng.standard_normal((30, 2))
                        for c in [(0, 0), (8, 8)]])
    mesh = create_mesh(shape=(2, 4), axis_names=("restarts", "samples"))

    kw = dict(ks=[2, 3], key=jax.random.PRNGKey(0), n_init=4, n_trials=4)
    plain = kmeans_model_selection_sweep(X, **kw)
    sharded = kmeans_model_selection_sweep(X, mesh=mesh, **kw)

    for k in (2, 3):
        # Same fit keys and same per-trial gap keys: identical results
        # up to reduction order.
        assert sharded[k]['cost'] == pytest.approx(plain[k]['cost'],
                                                   rel=1e-10)
        assert sharded[k]['gap'] == pytest.approx(plain[k]['gap'],
                                                  rel=1e-8)
        assert sharded[k]['gap_sk'] == pytest.approx(plain[k]['gap_sk'],
                                                     rel=1e-8)


@pytest.mark.slow
def test_sweep_checkpoint_resume(tmp_path):
    """checkpoint_dir makes sweeps resumable: completed ks load from
    disk, new ks compute with the same PRNG threading as an
    uninterrupted sweep."""
    rng = np.random.RandomState(15)
    basis = rng.standard_normal((3, 6))
    Z = rng.rand(40, 3)
    Z /= Z.sum(axis=1, keepdims=True)
    X = Z @ basis

    ckpt = str(tmp_path / "sweep")
    kw = dict(key=jax.random.PRNGKey(3), n_init=4, tolerance=1e-8,
              max_iterations=100)
    first = aa_model_selection_sweep(X, ks=[2, 3], checkpoint_dir=ckpt,
                                     **kw)
    # Resume with one more k: 2 and 3 load from disk, 4 computes.
    resumed = aa_model_selection_sweep(X, ks=[2, 3, 4],
                                       checkpoint_dir=ckpt, **kw)
    fresh = aa_model_selection_sweep(X, ks=[2, 3, 4], **kw)

    for k in (2, 3):
        assert resumed[k]['cost'] == pytest.approx(first[k]['cost'])
        assert np.allclose(resumed[k]['costs'], first[k]['costs'])
    # PRNG threading preserved across the skip: the resumed k=4 equals
    # the uninterrupted sweep's.
    assert resumed[4]['cost'] == pytest.approx(fresh[4]['cost'],
                                               rel=1e-10)
    assert np.allclose(resumed[4]['costs'], fresh[4]['costs'],
                       rtol=1e-10)
    assert resumed[4]['n_iter'] == fresh[4]['n_iter']

    # A changed configuration must NOT reuse the checkpoints: the
    # stored fingerprint mismatches, a warning fires, and the point
    # recomputes under the new settings.
    with pytest.warns(UserWarning, match="different sweep"):
        changed = aa_model_selection_sweep(
            X, ks=[2], checkpoint_dir=ckpt, key=jax.random.PRNGKey(3),
            n_init=2, tolerance=1e-8, max_iterations=100)
    assert changed[2]['costs'].shape == (2,)  # recomputed, not loaded


@pytest.mark.slow
def test_checkpoint_roundtrip_and_resume(tmp_path):
    from convex_dim_red_tpu import KernelAA

    rng = np.random.RandomState(7)
    basis = rng.standard_normal((3, 6))
    Z = rng.rand(50, 3)
    Z /= Z.sum(axis=1, keepdims=True)
    X = Z @ basis
    K = X @ X.T

    model = KernelAA(n_components=3, init='random', random_state=0,
                     tolerance=1e-8, max_iterations=20)
    model.fit(K)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {
        'weights': model.weights, 'dictionary': model.dictionary,
        'alpha': model.alpha, 'cost': model.cost, 'n_iter': model.n_iter})
    state = load_checkpoint(path)
    assert np.allclose(state['weights'], np.asarray(model.weights))
    assert float(state['cost']) == pytest.approx(model.cost)

    # Resume from the checkpoint: cost must not regress.
    model2 = KernelAA(n_components=3, random_state=1, tolerance=1e-10,
                      max_iterations=100)
    resume_kernel_aa(model2, K, state)
    assert model2.cost <= float(state['cost']) + 1e-10


def test_timer_and_block_and_time():
    with Timer() as t:
        pass
    assert t.total >= 0 and len(t.laps) == 1

    import jax.numpy as jnp
    f = jax.jit(lambda x: x * 2)
    result, sec = block_and_time(f, jnp.ones(8), repeats=3)
    assert sec >= 0 and np.allclose(np.asarray(result), 2.0)


def test_profiler_trace_produces_trace_files(tmp_path):
    """utils.profiling.trace must actually capture a device trace
    (round-1 weakness: the context manager was never exercised)."""
    from convex_dim_red_tpu.utils.profiling import trace

    import jax.numpy as jnp
    log_dir = tmp_path / "jax_trace"
    with trace(str(log_dir)):
        jax.block_until_ready(jax.jit(lambda x: x @ x.T)(
            jnp.ones((32, 16))))
    produced = [p for p in log_dir.rglob("*") if p.is_file()]
    assert produced, "no trace files written by jax.profiler"
    # The xplane protobuf is the artifact TensorBoard/xprof consumes.
    assert any(p.name.endswith(".xplane.pb") for p in produced)


def test_plotting_helpers_produce_figures(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from convex_dim_red_tpu.pipelines.plotting import (
        plot_model_selection, plot_patterns, plot_state_embedding)

    rng = np.random.RandomState(0)
    patterns = rng.standard_normal((3, 8, 12))
    patterns[:, 2:4, 5] = np.nan
    fig = plot_patterns(patterns, np.linspace(-40, 40, 8),
                        np.linspace(0, 330, 12))
    fig.savefig(str(tmp_path / "patterns.png"))

    W = rng.rand(40, 3)
    W /= W.sum(axis=1, keepdims=True)
    fig = plot_state_embedding(W, method="mds")
    fig.savefig(str(tmp_path / "embedding.png"))

    results = {2: {"cost": 2.0, "gap": 0.3, "gap_sk": 0.01},
               3: {"cost": 1.0, "gap": 0.5, "gap_sk": 0.02}}
    fig = plot_model_selection(results)
    fig.savefig(str(tmp_path / "selection.png"))
    assert (tmp_path / "patterns.png").exists()


def test_gpnh_model_selection_sweep():
    from convex_dim_red_tpu.parallel.sweep import gpnh_model_selection_sweep
    rng = np.random.RandomState(13)
    Z = rng.dirichlet(np.ones(3), 30)
    X = Z @ rng.standard_normal((3, 6))
    res = gpnh_model_selection_sweep(
        X, [2, 3], jax.random.PRNGKey(0), n_init=4, lambda_W=1e-4,
        tolerance=1e-8, max_iterations=200)
    assert set(res) == {2, 3}
    for k, entry in res.items():
        assert entry['costs'].shape == (4,)
        assert np.isfinite(entry['cost']) and entry['rmse'] >= 0
    # k=3 planted: better reconstruction than k=2.
    assert res[3]['cost'] < res[2]['cost']
