"""Debug modes (SURVEY §5.2 build requirement).

The model has no races to detect (pure functional, single jitted step);
nondeterminism is a bug by construction since every random draw comes
from an explicit key. What remains useful:

  * ``check_finite(tree)`` — raise on NaN/Inf anywhere in a pytree.
    Product call sites: the Trainer checks the logged loss scalars at
    epoch cadence and (``--finite_check params``) the full state pytree
    before every checkpoint write (train/trainer.py);
  * ``nan_debug_mode()`` — context manager enabling
    ``jax_debug_nans`` + disabling jit so the failing op is localized
    (the remedy the Trainer's epoch-cadence error message points at).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


def check_finite(tree, name: str = "tree") -> None:
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            bad.append(key)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")


@contextlib.contextmanager
def nan_debug_mode():
    """debug_nans + eager execution: the first NaN-producing primitive
    raises with a usable traceback."""
    with jax.debug_nans(True), jax.disable_jit():
        yield
