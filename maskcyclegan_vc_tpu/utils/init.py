"""Fast host-side parameter initialization.

``flax.Module.init`` dispatches one XLA computation per parameter, which
costs a compile each on a cold cache (~100s for the generator on a small
host). ``fast_init`` instead shapes the param tree with ``jax.eval_shape``
(zero compiles) and fills it with numpy, reproducing the same
distributions the in-graph initializers declare:

  * conv kernels (HWIO): U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — torch's
    kaiming_uniform(a=sqrt(5)) default (reference torch init semantics);
  * conv biases: same bound as their sibling kernel;
  * norm ``scale`` -> 1, norm ``bias`` -> 0.

The exact RNG stream differs from ``Module.init`` (numpy vs threefry) but
the distribution matches for the CycleGAN models (whose declared
initializers ARE the torch defaults). Known, intentional substitution:
MelGAN flat-style ``*_kernel`` leaves declare normal(0.02) in
models/melgan.py but are filled here with the torch-default
kaiming-uniform (and for its transpose-conv (I,O,K)-layout kernels the
fan_in below computes O*I rather than the true fan-in). That is
harmless by construction — production MelGAN weights always come from
the published torch checkpoint via ``melgan_params_from_torch``, and
parity tests set identical params on both sides; ``fast_init`` is only
ever the *shape* source for MelGAN. If randomly-initialized MelGAN
training is ever added, special-case those leaves first.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _fill(tree_def_leaf_path, shape_dtype, rs, sibling_kernel_shape=None):
    shape = shape_dtype.shape
    dtype = shape_dtype.dtype
    name = tree_def_leaf_path[-1]
    if name == "scale" or name.endswith("_scale"):
        return np.ones(shape, dtype)
    # Any *_kernel leaf (flax nested convs use the bare name; flat param
    # styles like MelGAN use up0_kernel / res0_0_conv1_kernel / ...).
    if name == "kernel" or name.endswith("_kernel"):
        fan_in = int(shape[-2]) * int(math.prod(shape[:-2]))
        bound = 1.0 / math.sqrt(fan_in)
        return rs.uniform(-bound, bound, size=shape).astype(dtype)
    if name == "bias" or name.endswith("_bias"):
        if sibling_kernel_shape is not None:
            ks = sibling_kernel_shape
            fan_in = int(ks[-2]) * int(math.prod(ks[:-2]))
            bound = 1.0 / math.sqrt(fan_in)
            return rs.uniform(-bound, bound, size=shape).astype(dtype)
        return np.zeros(shape, dtype)
    return np.zeros(shape, dtype)


def fast_init(model, seed: int, *args, **kwargs) -> Any:
    """Initialize ``model`` host-side; returns the same pytree ``init`` would."""
    shapes = jax.eval_shape(
        lambda *a: model.init(jax.random.PRNGKey(0), *a, **kwargs), *args
    )
    rs = np.random.RandomState(seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    # Map each bias leaf to its sibling kernel's shape for fan_in.
    by_parent = {}
    for path, sd in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        by_parent.setdefault(keys[:-1], {})[keys[-1]] = sd.shape

    out = []
    for path, sd in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        name = keys[-1]
        sibling = None
        parent = by_parent.get(keys[:-1], {})
        if name == "bias" and "kernel" in parent:
            sibling = parent["kernel"]
        elif name.endswith("_bias"):
            kname = name[: -len("bias")] + "kernel"
            if kname in parent:
                sibling = parent[kname]
        out.append(jnp.asarray(_fill(keys, sd, rs, sibling)))
    return jax.tree_util.tree_unflatten(treedef, out)
