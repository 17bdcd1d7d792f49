"""Debug-mode numerical validation (SURVEY.md §5 sanitizers).

The reference has no sanitizers; in JAX, data-dependent validation under
jit requires ``checkify``. This module wraps an effect (or any jittable
function) so NaN/Inf in its output and out-of-range normalized parameters
become collectable errors instead of silent garbage.

Also documents the one-liner global option:
``jax.config.update("jax_debug_nans", True)`` (eager NaN tracing).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify

__all__ = ["checked", "assert_finite", "assert_normalized"]


def assert_finite(x: jnp.ndarray, name: str = "output") -> None:
    """checkify-able finiteness assertion (usable inside jit)."""
    checkify.check(jnp.isfinite(x).all(), f"{name} contains NaN/Inf")


def assert_normalized(p: jnp.ndarray, name: str = "params") -> None:
    """checkify-able (0, 1) range assertion for normalized parameters."""
    checkify.check(
        jnp.logical_and(p.min() >= 0.0, p.max() <= 1.0),
        f"{name} outside [0, 1]",
    )


def checked(fn: Callable, check_inputs: bool = True) -> Callable:
    """Wrap ``fn(x, *args, **kwargs)`` with NaN/Inf validation.

    Returns a function with the same signature; call ``.throw()`` style:
    the wrapper raises ``checkify.JaxRuntimeError`` on violation, even
    under jit.

    Example:
        safe_eq = checked(partial(parametric_eq, filter_method="fsm"))
        y = safe_eq(x, sr, *params)   # raises if the output went non-finite
    """

    def inner(x, *args, **kwargs):
        if check_inputs:
            assert_finite(x, "input")
        y = fn(x, *args, **kwargs)
        assert_finite(y, "output")
        return y

    # user_checks enables the explicit checkify.check assertions above
    # (float_checks alone only instruments NaN-*producing* primitives, so a
    # NaN already present in the input would sail through).
    checked_fn = checkify.checkify(
        inner, errors=checkify.float_checks | checkify.user_checks
    )

    def wrapper(x, *args, **kwargs):
        err, y = checked_fn(x, *args, **kwargs)
        err.throw()
        return y

    return wrapper
