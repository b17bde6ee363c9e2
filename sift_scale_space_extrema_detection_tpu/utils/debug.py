"""Numerical-safety checks (SURVEY.md §5.2).

The reference has no sanitizers; its single-worker design avoids data
races by construction, and a singular Hessian simply crashed the worker.
Here JAX's functional purity eliminates races, and this module supplies
the numerical-safety layer:

- :func:`checked` — wrap a jittable function with ``jax.experimental
  .checkify`` so NaN/Inf production and out-of-bounds indexing inside
  the computation surface as Python errors instead of silent garbage.
- :func:`assert_finite` — eager guard for host-side pipeline stages.

These are debugging tools, not production defaults: checkify
instrumentation costs real throughput, so the production kernels handle
their own edge cases in-band (reject-on-singular in refinement, damped
LM solves, masked buffers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


def checked(fn, errors=None):
    """Wrap ``fn`` so float and index errors raise instead of propagating.

    Returns a function with the same signature; call it normally. Under
    jit, checks are woven into the compiled program.
    """
    sets = errors if errors is not None else (
        checkify.float_checks | checkify.index_checks
    )
    checked_fn = checkify.checkify(fn, errors=sets)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite(tree, name: str = "value") -> None:
    """Raise ``FloatingPointError`` if any leaf contains NaN/Inf."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        # Convert FIRST: a bare Python float('nan') has no .dtype and
        # must not slip through the floating-point check.
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        if not np.isfinite(arr).all():
            where = "/".join(str(k) for k in path)
            n_bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{'/' + where if where else ''}: {n_bad} non-finite "
                f"element(s) of {arr.size}"
            )
