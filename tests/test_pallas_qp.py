"""Correctness tests for the fused Pallas QP kernel (interpret mode on
the CPU test mesh; the real-TPU path is exercised by bench/verify
runs)."""

import numpy as np
import pytest

from convex_dim_red_tpu.ops.pallas_qp import quad_simplex_qp_pallas
from convex_dim_red_tpu.ops.simplex_projection import simplex_project_rows
from convex_dim_red_tpu.solvers.spg import quad_simplex_spg_batch


def _problem(rng, n, k, scale=1.0):
    M = rng.standard_normal((k, k))
    A = M @ M.T + np.eye(k)
    B = scale * rng.standard_normal((n, k))
    X0 = np.full((n, k), 1.0 / k)
    return A, B, X0


def _obj(X, A, B):
    return (0.5 * np.einsum('ij,jk,ik->i', X, A, X)
            + np.sum(X * B, axis=1))


@pytest.mark.parametrize("n,k", [
    pytest.param(32, 3, marks=pytest.mark.slow),
    pytest.param(70, 6, marks=pytest.mark.slow),
    (16, 11),
])
def test_pallas_matches_xla_objective(n, k):
    rng = np.random.RandomState(0)
    A, B, X0 = _problem(rng, n, k)

    Xp = np.asarray(quad_simplex_qp_pallas(
        A, B, X0, max_iterations=500, interpret=True))
    Xx = np.asarray(quad_simplex_spg_batch(A, B, X0, max_iterations=500))

    # Feasibility.
    assert np.allclose(Xp.sum(axis=1), 1.0, atol=1e-6)
    assert (Xp >= -1e-9).all()
    # Same objective quality as the XLA solver.
    gap = _obj(Xp, A, B) - _obj(Xx, A, B)
    assert np.abs(gap).max() < 1e-6


def test_pallas_kkt_residual():
    rng = np.random.RandomState(1)
    A, B, X0 = _problem(rng, 48, 5)
    Xp = np.asarray(quad_simplex_qp_pallas(
        A, B, X0, max_iterations=1000, interpret=True))
    G = Xp @ A + B
    res = np.asarray(simplex_project_rows(Xp - G)) - Xp
    assert np.abs(res).max() < 1e-5


def test_pallas_padding_does_not_leak():
    # Padded lanes / rows must not affect real outputs: compare a batch
    # against solving a subset.
    rng = np.random.RandomState(2)
    A, B, X0 = _problem(rng, 21, 4)  # odd n -> row padding exercised
    X_full = np.asarray(quad_simplex_qp_pallas(
        A, B, X0, max_iterations=300, interpret=True))
    X_sub = np.asarray(quad_simplex_qp_pallas(
        A, B[:8], X0[:8], max_iterations=300, interpret=True))
    assert np.allclose(X_full[:8], X_sub, atol=1e-7)


def test_pallas_rejects_oversized_k():
    with pytest.raises(ValueError):
        quad_simplex_qp_pallas(np.eye(130), np.zeros((4, 130)),
                               np.full((4, 130), 1 / 130.), interpret=True)


@pytest.mark.parametrize("R,n,k", [(3, 32, 4), (5, 21, 6)])
@pytest.mark.slow
def test_grouped_matches_per_group_solves(R, n, k):
    """The grouped kernel (one Hessian per grid group) must match
    solving each group separately with the single-Hessian kernel and
    the XLA solver."""
    from convex_dim_red_tpu.ops.pallas_qp import (
        quad_simplex_qp_pallas_grouped)
    rng = np.random.RandomState(5)
    As, Bs, X0s = [], [], []
    for _ in range(R):
        A, B, X0 = _problem(rng, n, k)
        As.append(A), Bs.append(B), X0s.append(X0)
    As, Bs, X0s = map(np.asarray, (As, Bs, X0s))

    Xg = np.asarray(quad_simplex_qp_pallas_grouped(
        As, Bs, X0s, max_iterations=500, interpret=True))
    assert Xg.shape == (R, n, k)
    for r in range(R):
        X1 = np.asarray(quad_simplex_qp_pallas(
            As[r], Bs[r], X0s[r], max_iterations=500, interpret=True))
        assert np.allclose(Xg[r], X1, atol=1e-10)
        Xx = np.asarray(quad_simplex_spg_batch(
            As[r], Bs[r], X0s[r], max_iterations=500))
        gap = _obj(Xg[r], As[r], Bs[r]) - _obj(Xx, As[r], Bs[r])
        assert np.abs(gap).max() < 1e-6
        assert np.allclose(Xg[r].sum(axis=1), 1.0, atol=1e-6)


@pytest.mark.slow
def test_grouped_masked_matches_masked_xla():
    from convex_dim_red_tpu.ops.pallas_qp import (
        quad_simplex_qp_pallas_grouped)
    rng = np.random.RandomState(6)
    k, m, R, n = 7, 4, 3, 19
    As, Bs, X0s = [], [], []
    for _ in range(R):
        A, B, X0 = _problem(rng, n, k)
        As.append(A), Bs.append(B), X0s.append(X0)
    As, Bs, X0s = map(np.asarray, (As, Bs, X0s))
    mask = np.arange(k) < m

    Xg = np.asarray(quad_simplex_qp_pallas_grouped(
        As, Bs, X0s, max_iterations=800, interpret=True, mask=mask))
    assert np.all(Xg[:, :, m:] == 0.0)
    for r in range(R):
        Xx = np.asarray(quad_simplex_spg_batch(
            As[r], Bs[r], X0s[r], backend='xla', max_iterations=800,
            mask=np.asarray(mask)))
        gap = _obj(Xg[r], As[r], Bs[r]) - _obj(Xx, As[r], Bs[r])
        assert np.abs(gap).max() < 1e-6


@pytest.mark.parametrize("R,n,k", [(3, 33, 4), (4, 21, 6), (2, 18, 11)])
@pytest.mark.slow
def test_grouped_packed_matches_per_group_solves(R, n, k):
    """The grouped lane-packed kernel must match the single-group
    packed kernel per group and the XLA objective."""
    from convex_dim_red_tpu.ops.pallas_qp import (
        quad_simplex_qp_pallas_packed,
        quad_simplex_qp_pallas_packed_grouped)
    rng = np.random.RandomState(9)
    As, Bs, X0s = [], [], []
    for _ in range(R):
        A, B, X0 = _problem(rng, n, k)
        As.append(A), Bs.append(B), X0s.append(X0)
    As, Bs, X0s = map(np.asarray, (As, Bs, X0s))

    Xg = np.asarray(quad_simplex_qp_pallas_packed_grouped(
        As, Bs, X0s, max_iterations=500, interpret=True))
    assert Xg.shape == (R, n, k)
    for r in range(R):
        X1 = np.asarray(quad_simplex_qp_pallas_packed(
            As[r], Bs[r], X0s[r], max_iterations=500, interpret=True))
        assert np.allclose(Xg[r], X1, atol=1e-10)
        Xx = np.asarray(quad_simplex_spg_batch(
            As[r], Bs[r], X0s[r], max_iterations=500))
        gap = _obj(Xg[r], As[r], Bs[r]) - _obj(Xx, As[r], Bs[r])
        assert np.abs(gap).max() < 1e-6


def test_grouped_dispatch_picks_packed_for_small_k(monkeypatch):
    """quad_simplex_spg_batch_grouped(backend='pallas') mirrors the
    single-Hessian dispatch: packed for k <= 64, unpacked above."""
    from convex_dim_red_tpu.solvers import spg as spg_mod
    from convex_dim_red_tpu.ops import pallas_qp as pq

    seen = []
    monkeypatch.setattr(
        pq, "quad_simplex_qp_pallas_packed_grouped",
        lambda *a, **kw: (seen.append("packed"),
                          pq.quad_simplex_qp_pallas_grouped(
                              *a, **dict(kw, interpret=True)))[1])
    rng = np.random.RandomState(10)
    A, B, X0 = _problem(rng, 16, 4)
    out = spg_mod.quad_simplex_spg_batch_grouped(
        A[None], B[None], X0[None], backend='pallas', interpret=True)
    assert seen == ["packed"]
    assert np.asarray(out).shape == (1, 16, 4)


@pytest.mark.parametrize("n,k", [
    (33, 3),
    pytest.param(70, 6, marks=pytest.mark.slow),
    pytest.param(20, 11, marks=pytest.mark.slow),
    pytest.param(16, 33, marks=pytest.mark.slow),
])
def test_packed_matches_xla_objective(n, k):
    from convex_dim_red_tpu.ops.pallas_qp import quad_simplex_qp_pallas_packed
    rng = np.random.RandomState(3)
    A, B, X0 = _problem(rng, n, k)

    Xp = np.asarray(quad_simplex_qp_pallas_packed(
        A, B, X0, max_iterations=500, interpret=True))
    Xx = np.asarray(quad_simplex_spg_batch(A, B, X0, max_iterations=500))

    assert np.allclose(Xp.sum(axis=1), 1.0, atol=1e-6)
    assert (Xp >= -1e-9).all()
    gap = _obj(Xp, A, B) - _obj(Xx, A, B)
    assert np.abs(gap).max() < 1e-6


@pytest.mark.slow
def test_packed_padding_does_not_leak():
    from convex_dim_red_tpu.ops.pallas_qp import quad_simplex_qp_pallas_packed
    rng = np.random.RandomState(4)
    A, B, X0 = _problem(rng, 37, 5)  # 37 % 16 != 0: slot padding hit
    X_full = np.asarray(quad_simplex_qp_pallas_packed(
        A, B, X0, max_iterations=300, interpret=True))
    X_sub = np.asarray(quad_simplex_qp_pallas_packed(
        A, B[:9], X0[:9], max_iterations=300, interpret=True))
    assert np.allclose(X_full[:9], X_sub, atol=1e-7)


@pytest.mark.parametrize("packed", [
    pytest.param(False, marks=pytest.mark.slow),
    True,
])
def test_pallas_masked_matches_masked_xla(packed):
    """Runtime component masks (padded-k bucketing) in both kernel
    variants: masked lanes pinned to exact zero, active block matching
    the masked XLA solve."""
    from convex_dim_red_tpu.ops.pallas_qp import (
        quad_simplex_qp_pallas_packed)
    rng = np.random.RandomState(7)
    k, m, n = (6, 4, 33) if packed else (70, 50, 17)
    A, B, X0 = _problem(rng, n, k)
    mask = np.arange(k) < m

    kern = quad_simplex_qp_pallas_packed if packed \
        else quad_simplex_qp_pallas
    Xp = np.asarray(kern(A, B, X0, max_iterations=800, interpret=True,
                         mask=mask))
    Xx = np.asarray(quad_simplex_spg_batch(A, B, X0, backend='xla',
                                           max_iterations=800,
                                           mask=np.asarray(mask)))
    assert np.all(Xp[:, m:] == 0.0)
    assert np.allclose(Xp.sum(axis=1), 1.0, atol=1e-6)
    gap = _obj(Xp, A, B) - _obj(Xx, A, B)
    assert np.abs(gap).max() < 1e-6


def test_pallas_all_true_mask_equals_no_mask():
    """An all-true mask must be exactly the unmasked solve (the
    exact-multiple-k bucketing path)."""
    rng = np.random.RandomState(8)
    A, B, X0 = _problem(rng, 24, 5)
    X_plain = np.asarray(quad_simplex_qp_pallas(
        A, B, X0, max_iterations=400, interpret=True))
    X_mask = np.asarray(quad_simplex_qp_pallas(
        A, B, X0, max_iterations=400, interpret=True,
        mask=np.ones(5, bool)))
    assert np.allclose(X_plain, X_mask, atol=1e-12)


def test_packed_michelot_projection_matches_bisect():
    """The Michelot active-set projection (the packed kernels' default;
    exact threshold, ~2x fewer MXU matmuls per iteration) must agree
    with the legacy bisection projection and with the XLA solver, and
    produce exactly feasible rows."""
    from convex_dim_red_tpu.ops.pallas_qp import (
        quad_simplex_qp_pallas_packed)
    rng = np.random.RandomState(21)
    A, B, X0 = _problem(rng, 23, 6, scale=10.0)
    Xm = np.asarray(quad_simplex_qp_pallas_packed(
        A, B, X0, max_iterations=500, interpret=True,
        projection='michelot'))
    Xb = np.asarray(quad_simplex_qp_pallas_packed(
        A, B, X0, max_iterations=500, interpret=True,
        projection='bisect'))
    Xx = np.asarray(quad_simplex_spg_batch(
        A, B, X0, backend='xla', max_iterations=500))
    assert np.abs(_obj(Xm, A, B) - _obj(Xb, A, B)).max() < 1e-8
    assert np.abs(_obj(Xm, A, B) - _obj(Xx, A, B)).max() < 1e-6
    assert np.allclose(Xm.sum(axis=1), 1.0, atol=1e-12)
    assert Xm.min() >= 0.0


@pytest.mark.slow
def test_packed_michelot_masked_pins_padded_lanes():
    from convex_dim_red_tpu.ops.pallas_qp import (
        quad_simplex_qp_pallas_packed)
    rng = np.random.RandomState(22)
    A, B, X0 = _problem(rng, 17, 7, scale=5.0)
    X0 = np.where(np.arange(7) < 4, X0, 0.0)
    X0 = X0 / X0.sum(axis=1, keepdims=True)
    mask = np.arange(7) < 4
    Xm = np.asarray(quad_simplex_qp_pallas_packed(
        A, B, X0, max_iterations=500, interpret=True, mask=mask,
        projection='michelot'))
    Xx = np.asarray(quad_simplex_spg_batch(
        A, B, X0, backend='xla', max_iterations=500,
        mask=np.asarray(mask)))
    assert np.all(Xm[:, 4:] == 0.0)
    assert np.abs(_obj(Xm, A, B) - _obj(Xx, A, B)).max() < 1e-6
