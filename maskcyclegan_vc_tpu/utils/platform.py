"""Honor JAX_PLATFORMS in CLI entry points.

The deployment image's ``sitecustomize`` registers the axon TPU plugin
and force-pins ``JAX_PLATFORMS`` at interpreter start, so exporting
``JAX_PLATFORMS=cpu`` before a CLI has no effect by itself — the jax
*config* (which wins over the env var) must be updated before the
backend initializes. Every CLI calls :func:`apply_platform_env` first
thing, which makes ``JAX_PLATFORMS=cpu python -m ...cli.train`` behave
as documented (needed for CPU smoke runs and for job-level launchers
that spawn CLI subprocesses on hosts whose one TPU is busy).
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """If the caller exported JAX_PLATFORMS, make it stick."""
    plat = os.environ.get("JAX_PLATFORMS", "").strip()
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already initialized — too late to switch
