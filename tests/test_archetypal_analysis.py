"""Property tests for archetypal analysis.

Ports the reference contract (reference tests/test_archetypal_analysis.py):
single updates never increase cost and preserve row-stochasticity, planted
exact factorizations are fixed points to 1e-12, repeated single-factor
iterations converge below max_iterations, and full KernelAA recovers
planted convex-hull vertices.
"""

import numpy as np
import pytest

from convex_dim_red_tpu.models.archetypal_analysis import (
    KernelAA,
    iterate_kernel_aa,
    kernel_aa_cost,
    update_kernel_aa_dictionary,
    update_kernel_aa_weights,
)


def _right_stochastic(rng, shape):
    m = rng.uniform(size=shape)
    return m / m.sum(axis=1, keepdims=True)


def _planted_problem(rng, n_samples, n_components, n_features):
    """Data whose convex hull is spanned by planted archetype samples."""
    basis = rng.uniform(size=(n_components, n_features))
    Z = _right_stochastic(rng, (n_samples, n_components))

    idx = rng.choice(n_samples, size=n_components, replace=False)
    C = np.zeros((n_components, n_samples))
    for comp, i in enumerate(idx):
        C[comp, i] = 1.0
        Z[i] = 0.0
        Z[i, comp] = 1.0

    X = Z @ basis
    return X, Z, C, idx


def test_single_dictionary_update_reduces_cost_with_zero_delta():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 10, 5, 400

    X = rng.uniform(size=(n_samples, n_features))
    K = X @ X.T
    C = _right_stochastic(rng, (n_components, n_samples))
    Z = _right_stochastic(rng, (n_samples, n_components))
    alpha = np.ones(n_components)

    initial = float(kernel_aa_cost(K, Z, C, alpha))
    C_new = np.asarray(update_kernel_aa_dictionary(
        K, C, alpha, np.trace(K), K @ Z, Z.T @ Z))
    final = float(kernel_aa_cost(K, Z, C_new, alpha))

    assert final <= initial
    assert np.allclose(C_new.sum(axis=1), 1, atol=1e-12)


def test_single_dictionary_update_reduces_cost_with_nonzero_delta():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 10, 5, 400
    delta = 0.1

    X = rng.uniform(size=(n_samples, n_features))
    K = X @ X.T
    C = _right_stochastic(rng, (n_components, n_samples))
    Z = _right_stochastic(rng, (n_samples, n_components))
    alpha = rng.uniform(1 - delta, 1 + delta, size=n_components)

    initial = float(kernel_aa_cost(K, Z, C, alpha))
    C_new = np.asarray(update_kernel_aa_dictionary(
        K, C, alpha, np.trace(K), K @ Z, Z.T @ Z))
    final = float(kernel_aa_cost(K, Z, C_new, alpha))

    assert final <= initial
    assert np.allclose(C_new.sum(axis=1), 1, atol=1e-12)


def test_exact_solution_is_dictionary_update_fixed_point():
    rng = np.random.RandomState(0)
    tolerance = 1e-12
    X, Z, C, _ = _planted_problem(rng, 100, 6, 10)
    assert np.linalg.norm(X - Z @ (C @ X)) < tolerance

    K = X @ X.T
    alpha = np.ones(6)

    initial = float(kernel_aa_cost(K, Z, C, alpha))
    C_new = np.asarray(update_kernel_aa_dictionary(
        K, C, alpha, np.trace(K), K @ Z, Z.T @ Z))
    final = float(kernel_aa_cost(K, Z, C_new, alpha))

    assert abs(final - initial) < tolerance
    assert np.allclose(C_new.sum(axis=1), 1, atol=1e-12)
    assert np.allclose(C_new, C, atol=tolerance)


@pytest.mark.slow
def test_repeated_dictionary_updates_converge_with_zero_delta():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 20, 15, 600
    max_iterations, tolerance = 1000, 1e-6

    X = rng.uniform(size=(n_samples, n_features))
    K = X @ X.T
    C = _right_stochastic(rng, (n_components, n_samples))
    Z = _right_stochastic(rng, (n_samples, n_components))
    alpha = np.ones(n_components)

    initial = float(kernel_aa_cost(K, Z, C, alpha))
    Z_new, C_new, alpha_new, cost, n_iter = iterate_kernel_aa(
        K, Z, C, alpha, delta=0,
        update_weights=False, update_dictionary=True,
        update_scale_factors=False,
        tolerance=tolerance, max_iterations=max_iterations,
        require_monotonic_cost_decrease=True)[:5]

    final = float(kernel_aa_cost(K, Z_new, C_new, alpha_new))
    assert final <= initial
    assert n_iter < max_iterations
    assert np.allclose(np.asarray(Z_new), Z, atol=1e-12)
    assert np.allclose(np.asarray(alpha_new), alpha, atol=1e-12)
    assert np.allclose(np.asarray(C_new).sum(axis=1), 1, atol=1e-12)


@pytest.mark.slow
def test_repeated_dictionary_updates_converge_with_nonzero_delta():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 20, 15, 600
    max_iterations, tolerance = 1000, 1e-6
    delta = 0.2

    X = rng.uniform(size=(n_samples, n_features))
    K = X @ X.T
    C = _right_stochastic(rng, (n_components, n_samples))
    Z = _right_stochastic(rng, (n_samples, n_components))
    alpha = rng.uniform(1 - delta, 1 + delta, size=n_components)

    initial = float(kernel_aa_cost(K, Z, C, alpha))
    Z_new, C_new, alpha_new, cost, n_iter = iterate_kernel_aa(
        K, Z, C, alpha, delta=delta,
        update_weights=False, update_dictionary=True,
        update_scale_factors=False,
        tolerance=tolerance, max_iterations=max_iterations,
        require_monotonic_cost_decrease=True)[:5]

    final = float(kernel_aa_cost(K, Z_new, C_new, alpha_new))
    assert final <= initial
    assert n_iter < max_iterations
    assert np.allclose(np.asarray(Z_new), Z, atol=1e-12)
    assert np.allclose(np.asarray(alpha_new), alpha, atol=1e-12)
    assert np.allclose(np.asarray(C_new).sum(axis=1), 1, atol=1e-12)


def test_single_weights_update_reduces_cost_with_zero_delta():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 13, 7, 100

    X = rng.uniform(size=(n_samples, n_features))
    K = X @ X.T
    C = _right_stochastic(rng, (n_components, n_samples))
    Z = _right_stochastic(rng, (n_samples, n_components))
    alpha = np.ones(n_components)

    CK = C @ K
    CKCt = C @ (K @ C.T)

    initial = float(kernel_aa_cost(K, Z, C, alpha))
    Z_new = np.asarray(update_kernel_aa_weights(Z, alpha, CK, CKCt))
    final = float(kernel_aa_cost(K, Z_new, C, alpha))

    assert final <= initial
    assert np.allclose(Z_new.sum(axis=1), 1, atol=1e-12)


def test_single_weights_update_reduces_cost_with_nonzero_delta():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 50, 5, 400
    delta = 0.5

    X = rng.uniform(size=(n_samples, n_features))
    K = X @ X.T
    C = _right_stochastic(rng, (n_components, n_samples))
    Z = _right_stochastic(rng, (n_samples, n_components))
    alpha = rng.uniform(1 - delta, 1 + delta, size=n_components)

    CK = C @ K
    CKCt = C @ (K @ C.T)

    initial = float(kernel_aa_cost(K, Z, C, alpha))
    Z_new = np.asarray(update_kernel_aa_weights(Z, alpha, CK, CKCt))
    final = float(kernel_aa_cost(K, Z_new, C, alpha))

    assert final <= initial
    assert np.allclose(Z_new.sum(axis=1), 1, atol=1e-12)


def test_exact_solution_is_weights_update_fixed_point():
    rng = np.random.RandomState(0)
    tolerance = 1e-12
    X, Z, C, _ = _planted_problem(rng, 130, 10, 30)
    assert np.linalg.norm(X - Z @ (C @ X)) < tolerance

    K = X @ X.T
    alpha = np.ones(10)
    CK = C @ K
    CKCt = C @ (K @ C.T)

    initial = float(kernel_aa_cost(K, Z, C, alpha))
    Z_new = np.asarray(update_kernel_aa_weights(Z, alpha, CK, CKCt))
    final = float(kernel_aa_cost(K, Z_new, C, alpha))

    assert abs(final - initial) < tolerance
    assert np.allclose(Z_new.sum(axis=1), 1, atol=1e-12)
    assert np.allclose(Z_new, Z, atol=tolerance)


def test_repeated_weights_updates_converge_with_zero_delta():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 10, 3, 600
    max_iterations, tolerance = 100, 1e-6

    X = rng.uniform(size=(n_samples, n_features))
    K = X @ X.T
    C = _right_stochastic(rng, (n_components, n_samples))
    Z = _right_stochastic(rng, (n_samples, n_components))
    alpha = np.ones(n_components)

    initial = float(kernel_aa_cost(K, Z, C, alpha))
    Z_new, C_new, alpha_new, cost, n_iter = iterate_kernel_aa(
        K, Z, C, alpha, delta=0,
        update_weights=True, update_dictionary=False,
        update_scale_factors=False,
        tolerance=tolerance, max_iterations=max_iterations,
        require_monotonic_cost_decrease=True)[:5]

    final = float(kernel_aa_cost(K, Z_new, C_new, alpha_new))
    assert final <= initial
    assert n_iter < max_iterations
    assert np.allclose(np.asarray(C_new), C, atol=1e-12)
    assert np.allclose(np.asarray(alpha_new), alpha, atol=1e-12)
    assert np.allclose(np.asarray(Z_new).sum(axis=1), 1, atol=1e-12)


def test_repeated_weights_updates_converge_with_nonzero_delta():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 30, 11, 320
    max_iterations, tolerance = 100, 1e-6
    delta = 0.3

    X = rng.uniform(size=(n_samples, n_features))
    K = X @ X.T
    C = _right_stochastic(rng, (n_components, n_samples))
    Z = _right_stochastic(rng, (n_samples, n_components))
    alpha = rng.uniform(1 - delta, 1 + delta, size=n_components)

    initial = float(kernel_aa_cost(K, Z, C, alpha))
    Z_new, C_new, alpha_new, cost, n_iter = iterate_kernel_aa(
        K, Z, C, alpha, delta=delta,
        update_weights=True, update_dictionary=False,
        update_scale_factors=False,
        tolerance=tolerance, max_iterations=max_iterations,
        require_monotonic_cost_decrease=True)[:5]

    final = float(kernel_aa_cost(K, Z_new, C_new, alpha_new))
    assert final <= initial
    assert n_iter < max_iterations
    assert np.allclose(np.asarray(C_new), C, atol=1e-12)
    assert np.allclose(np.asarray(alpha_new), alpha, atol=1e-12)
    assert np.allclose(np.asarray(Z_new).sum(axis=1), 1, atol=1e-12)


def test_finds_elements_of_3_point_convex_hull():
    rng = np.random.RandomState(0)
    n_samples, n_components = 50, 3
    max_iterations, tolerance = 500, 1e-6

    basis = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    expected_Z = _right_stochastic(rng, (n_samples, n_components))
    assignments = np.array([5, 27, 32])
    for i in range(n_components):
        expected_Z[assignments[i]] = 0.0
        expected_Z[assignments[i], i] = 1.0

    X = expected_Z @ basis
    K = X @ X.T

    C = _right_stochastic(rng, (n_components, n_samples))
    Z = _right_stochastic(rng, (n_samples, n_components))
    alpha = np.ones(n_components)

    aa = KernelAA(n_components=n_components, delta=0, init='custom',
                  max_iterations=max_iterations, tolerance=tolerance)
    solution_Z = np.asarray(
        aa.fit_transform(K, dictionary=C, weights=Z, alpha=alpha))
    solution_C = np.asarray(aa.dictionary)

    assert aa.n_iter < max_iterations
    assert np.allclose(solution_C.sum(axis=1), 1, atol=1e-12)
    assert np.allclose(solution_Z.sum(axis=1), 1, atol=1e-12)

    main_components = sorted(solution_C.argmax(axis=1))
    assert main_components == sorted(assignments.tolist())


@pytest.mark.slow
def test_finds_elements_of_4_point_convex_hull():
    rng = np.random.RandomState(0)
    n_samples, n_components = 123, 4
    max_iterations, tolerance = 500, 1e-12

    basis = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                     dtype=float)
    expected_Z = _right_stochastic(rng, (n_samples, n_components))
    assignments = np.array([8, 9, 56, 90])
    for i in range(n_components):
        expected_Z[assignments[i]] = 0.0
        expected_Z[assignments[i], i] = 1.0

    X = expected_Z @ basis
    K = X @ X.T

    C = _right_stochastic(rng, (n_components, n_samples))
    Z = _right_stochastic(rng, (n_samples, n_components))
    alpha = np.ones(n_components)

    aa = KernelAA(n_components=n_components, delta=0, init='custom',
                  max_iterations=max_iterations, tolerance=tolerance)
    solution_Z = np.asarray(
        aa.fit_transform(K, dictionary=C, weights=Z, alpha=alpha))
    solution_C = np.asarray(aa.dictionary)

    assert aa.n_iter < max_iterations
    assert np.allclose(solution_C.sum(axis=1), 1, atol=1e-12)
    assert np.allclose(solution_Z.sum(axis=1), 1, atol=1e-12)

    main_components = sorted(solution_C.argmax(axis=1))
    assert main_components == sorted(assignments.tolist())


@pytest.mark.slow
def test_full_fit_with_furthest_sum_init_and_scale_relaxation():
    """End-to-end data-space AA with delta != 0 and furthest-sum init."""
    from convex_dim_red_tpu.models.archetypal_analysis import (
        ArchetypalAnalysis)

    rng = np.random.RandomState(1)
    X, _, _, idx = _planted_problem(rng, 80, 3, 5)

    aa = ArchetypalAnalysis(n_components=3, delta=0.1, init='furthest_sum',
                            max_iterations=300, tolerance=1e-8,
                            random_state=0)
    Z = np.asarray(aa.fit_transform(X))

    assert Z.shape == (80, 3)
    assert np.allclose(Z.sum(axis=1), 1, atol=1e-10)
    assert aa.archetypes.shape == (3, 5)
    # Reconstruction should be decent on planted data.
    recon = np.asarray(aa.inverse_transform(Z))
    rel = np.linalg.norm(recon - X) / np.linalg.norm(X)
    assert rel < 0.05

    # transform() returns feasible weights and a finite cost.
    Zt, cost = aa.transform(X)
    assert np.allclose(np.asarray(Zt).sum(axis=1), 1, atol=1e-10)
    assert np.isfinite(cost)


@pytest.mark.slow
def test_iterate_kernel_aa_verbose_chunked_table(capsys):
    """verbose=1 must render the reference-format table (Iteration |
    Cost | Cost delta | Time, archetypal_analysis.py:442-447) WITHOUT
    host callbacks — the chunked driver prints host-side between
    bounded device executions — and the chunked trajectory must be
    identical to the single-program non-verbose fit."""
    rng = np.random.RandomState(3)
    X = rng.uniform(size=(40, 6))
    K = X @ X.T
    C = _right_stochastic(rng, (3, 40))
    Z = _right_stochastic(rng, (40, 3))
    alpha = np.ones(3)

    quiet = iterate_kernel_aa(K, Z, C, alpha, delta=0,
                              update_scale_factors=False,
                              tolerance=1e-9, max_iterations=200)
    capsys.readouterr()
    loud = iterate_kernel_aa(K, Z, C, alpha, delta=0,
                             update_scale_factors=False,
                             tolerance=1e-9, max_iterations=200,
                             verbose=1)
    out = capsys.readouterr().out
    lines = out.splitlines()

    assert lines[0] == '*** Kernel AA: n_components = 3 ***'
    header = [c.strip() for c in lines[1].split('|')]
    assert header == ['Iteration', 'Cost', 'Cost delta', 'Time']

    n_iter = loud[4]
    assert n_iter == quiet[4]
    assert float(loud[3]) == pytest.approx(float(quiet[3]), rel=1e-12)
    np.testing.assert_allclose(np.asarray(loud[0]), np.asarray(quiet[0]),
                               rtol=1e-12, atol=1e-14)
    # One table row per iteration, then the converged footer.
    rows = [ln for ln in lines if ln.count('|') == 3 and 'Cost' not in ln]
    assert len(rows) == n_iter
    assert any('*** Converged at iteration {:d} ***'.format(n_iter)
               in ln for ln in lines)
    # The final row's cost column equals the returned cost.
    last_cost = float(rows[-1].split('|')[1])
    assert last_cost == pytest.approx(float(loud[3]), rel=1e-6)
    # cost_deltas concatenated across chunks match the quiet fit's.
    np.testing.assert_allclose(loud[6], quiet[6], rtol=1e-10, atol=1e-14)


def test_iterate_kernel_aa_verbose_zero_iterations(capsys):
    """max_iterations=0 must return the initial cost (not None) on the
    verbose path, matching the quiet path — downstream consumers call
    float(cost) unconditionally."""
    rng = np.random.RandomState(7)
    X = rng.uniform(size=(20, 4))
    K = X @ X.T
    C = _right_stochastic(rng, (2, 20))
    Z = _right_stochastic(rng, (20, 2))
    alpha = np.ones(2)

    quiet = iterate_kernel_aa(K, Z, C, alpha, delta=0,
                              update_scale_factors=False,
                              tolerance=1e-9, max_iterations=0)
    loud = iterate_kernel_aa(K, Z, C, alpha, delta=0,
                             update_scale_factors=False,
                             tolerance=1e-9, max_iterations=0, verbose=1)
    capsys.readouterr()
    assert quiet[3] is not None and loud[3] is not None
    assert float(loud[3]) == pytest.approx(float(quiet[3]), rel=1e-12)
    assert loud[4] == quiet[4] == 0
    assert len(loud[6]) == 0
