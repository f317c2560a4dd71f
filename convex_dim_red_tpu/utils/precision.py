"""Library-wide matmul precision policy.

On TPU, JAX's DEFAULT matmul precision runs float32 matmuls as a
single MXU pass with the *inputs truncated to bfloat16* (~8 mantissa
bits).  For this library that is not a harmless speed default: the
alternating solvers drive sub-problems to tolerances of 1e-4..1e-12
(reference wrappers: run_hadisst_aa_wrapper.sh:40-44), and every
Hessian, gradient contraction, and cost evaluation flows through a
matmul.  Measured on a planted k=3 archetypal-analysis problem on one
v5e chip (float32 data):

====================  ==========  ===========  ==================
matmul precision      cost floor  iterations   monotone decrease?
====================  ==========  ===========  ==================
DEFAULT (bfloat16)    ~1e-3       cap (120+)   no (+2e-3 swings)
'float32' (6-pass)    ~6e-7       53           yes
====================  ==========  ===========  ==================

The bfloat16 truncation noise both floors the reachable cost three
decades early and makes the alternating steps oscillate, burning the
iteration budget.  The extra passes of the 'float32' mode cost ~6x on
the matmul units, but these workloads' per-iteration matmuls are small
(k x n x n with k <= ~20) and latency/HBM-bound, so wall-clock is
dominated by iteration *count* — which 'float32' halves.

The middle tier, 'tensorfloat32' (3-pass bfloat16 on TPU), behaves
differently at PROTOCOL scale (n=1788 Gram-sized matmuls, which are
MXU-throughput-bound): measured at the headline workload it converges
in the same number of outer iterations as 'float32', runs 1.31x
faster, and its winner's float64-audited cost is as good or better
(benchmarks/precision_ab.json — bench.py opts down to it per-run and
re-costs the returned factors in float64 as a guard).  The library
default stays 'float32' because the small-problem regime above and the
reference-tolerance test paths do need the full six passes.

Accuracy is therefore the library default: every public entry point
traces its matmuls under ``jax.default_matmul_precision('float32')``.
Speed-hungry users can opt down globally::

    import convex_dim_red_tpu as cdr
    cdr.set_matmul_precision('tensorfloat32')   # or 'bfloat16'

(Changing the policy clears JAX's compilation caches: the policy is
captured at trace time and is deliberately not part of the jit cache
key.)
"""

import functools

import jax

__all__ = [
    "get_matmul_precision",
    "set_matmul_precision",
    "matmul_precision_scope",
    "apply_matmul_precision",
]

_ALLOWED = ("bfloat16", "tensorfloat32", "float32", "fastest", "highest")

_matmul_precision = "float32"


def get_matmul_precision():
    """The library's current matmul precision policy string."""
    return _matmul_precision


def set_matmul_precision(precision):
    """Set the matmul precision used by all library entry points.

    One of ``'bfloat16'``, ``'tensorfloat32'``, ``'float32'``
    (aliases ``'fastest'``/``'highest'``).  Clears JAX's compilation
    caches so already-compiled library functions re-trace under the
    new policy.
    """
    global _matmul_precision
    if precision not in _ALLOWED:
        raise ValueError(
            "matmul precision must be one of %s, got %r"
            % (", ".join(_ALLOWED), precision))
    if precision != _matmul_precision:
        _matmul_precision = precision
        jax.clear_caches()


def matmul_precision_scope():
    """Context manager applying the library policy at trace time."""
    return jax.default_matmul_precision(_matmul_precision)


def apply_matmul_precision(fn):
    """Decorator: run ``fn`` (typically a jitted entry point) under the
    library matmul precision policy.  The scope is active during
    tracing, so every matmul the function (and its callees) stages is
    emitted at the policy precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with matmul_precision_scope():
            return fn(*args, **kwargs)

    if hasattr(fn, "lower"):
        # Preserve the jit inspection surface (AOT lowering happens at
        # trace time, so it must run under the scope too).
        def lower(*args, **kwargs):
            with matmul_precision_scope():
                return fn.lower(*args, **kwargs)

        wrapper.lower = lower

    return wrapper
