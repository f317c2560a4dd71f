"""Shared model plumbing: solver configs and stopping criteria.

The reference threads nested ``**kwargs`` dicts from estimator
constructors into the inner solvers with per-key ``.get`` defaults
(reference archetypal_analysis.py:369-396).  Here those become frozen
(hashable) dataclasses so they can be jit static arguments.
"""

from dataclasses import dataclass, fields

__all__ = [
    "QPSolverConfig",
    "SPGSolverConfig",
    "make_config",
    "STOPPING_CRITERIA",
    "has_converged",
]


@dataclass(frozen=True)
class QPSolverConfig:
    """Parameters of the simplex-QP SPG solver (reference spg.py:286-291).

    ``backend='pallas'`` routes batched solves to the fused TPU kernel
    (ops/pallas_qp.py); 'xla' is the portable default.
    """
    backend: str = 'xla'
    gamma: float = 1e-4
    memory: int = 1
    sigma_one: float = 0.1
    sigma_two: float = 0.9
    lambda_min: float = 1e-10
    alpha0: float = -1.0
    alpha_min: float = 1e-5
    alpha_max: float = 1e3
    epsilon_one: float = 1e-10
    epsilon_two: float = 1e-6
    max_iterations: int = 1000
    max_feval: int = 2000

    def kwargs(self):
        return {f.name: getattr(self, f.name) for f in fields(self)
                if f.name != 'backend'}


@dataclass(frozen=True)
class SPGSolverConfig:
    """Parameters of the generic SPG solver (reference spg.py:46-51)."""
    gamma: float = 1e-4
    memory: int = 1
    sigma_one: float = 0.1
    sigma_two: float = 0.9
    lambda_min: float = 1e-10
    alpha0: float = None
    alpha_min: float = 1e-5
    alpha_max: float = 1e3
    epsilon_one: float = 1e-10
    epsilon_two: float = 1e-6
    use_infinity_norm: bool = True
    max_iterations: int = 10000
    max_feval: int = 1000000

    def kwargs(self):
        return {f.name: getattr(self, f.name) for f in fields(self)}


def make_config(cls, kwargs):
    """Build a solver config from a reference-style kwargs dict.

    Unknown keys are rejected so typos surface instead of silently
    falling back to defaults.
    """
    if kwargs is None:
        return cls()
    if isinstance(kwargs, cls):
        return kwargs
    valid = {f.name for f in fields(cls)}
    unknown = set(kwargs) - valid
    if unknown:
        raise ValueError(
            'Unknown solver parameters %r; valid keys: %r'
            % (sorted(unknown), sorted(valid)))
    return cls(**kwargs)


STOPPING_CRITERIA = ('abs_delta_f', 'rel_delta_f')


def has_converged(old_cost, new_cost, tolerance, criterion):
    """Stopping test; parity with reference ``_get_stopping_criteria``
    (archetypal_analysis.py:177-197).  ``criterion`` must be static."""
    import jax.numpy as jnp

    if criterion == 'abs_delta_f':
        return jnp.abs(new_cost - old_cost) < tolerance
    if criterion == 'rel_delta_f':
        max_cost = jnp.maximum(jnp.abs(new_cost), jnp.abs(old_cost))
        return jnp.abs((new_cost - old_cost) / max_cost) < tolerance
    raise ValueError("unsupported stopping criterion '%s'" % criterion)
