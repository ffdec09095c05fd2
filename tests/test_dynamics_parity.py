"""Training-dynamics parity vs the reference (slow; RUN_SLOW=1 to enable).

Builds the reference torch models with seeded weights, imports them into
our TrainState, then runs the SAME batches through (a) a literal torch
re-execution of the reference's iteration (train.py:195-299 semantics —
tests/_torch_ref.py) and (b) our fused jitted train step at highest
precision, and pins three things:

  1. **Step-0 gradients, per leaf** — d(g_loss)/d(G params) for both
     generators and d(d_loss)/d(D params) for all four discriminators
     (the D step evaluated with the updated G, reference ordering),
     allclose at float-accumulation tolerance. This is the sharp check:
     any real math bug in the loss graph or a layer's backward shows up
     here at O(1) relative error, while legitimate accumulation-order
     differences (e.g. the h-major flatten's reordered 5120-term
     contraction, models/generator.py:216-255) stay at ~1e-5 relative.
  2. **Loss trajectory** over three full-size steps (rtol 2e-3).
  3. **Post-trajectory weights** — bounded by outlier COUNT and by the
     Adam step quantum rather than a bare max: with beta1=0.5, a
     coordinate whose tiny gradient flips sign between frameworks moves
     by up to ~2*lr per step, so a handful of near-zero-gradient
     coordinates at ~1-2*lr divergence is expected accumulation-order
     noise, not a bug (the round-3 regression that motivated this
     oracle: 20/417k coords at 1-2*lr with losses matching to 5e-5).

The fast small-R trajectory variant (with the schedule boundaries) runs
in the default suite: tests/test_trajectory_parity.py.
"""

import os
import sys

import numpy as np
import pytest

if not os.environ.get("RUN_SLOW"):
    pytest.skip("slow full-size dynamics parity (set RUN_SLOW=1)",
                allow_module_level=True)

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maskcyclegan_vc_tpu.io.torch_import import (  # noqa: E402
    discriminator_params_from_torch,
    generator_params_from_torch,
)
from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig  # noqa: E402
from maskcyclegan_vc_tpu.train.state import (  # noqa: E402
    TrainConfig,
    create_train_state,
    make_optimizers,
)
from maskcyclegan_vc_tpu.train.step import make_loss_fns, make_train_step  # noqa: E402
from tests._torch_ref import torch_reference_step  # noqa: E402

GEN_LR = 2e-4
DISC_LR = 1e-4
N_STEPS = 3


def _leaf_items(tree, prefix=""):
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out.append((prefix + jax.tree_util.keystr(path), np.asarray(leaf)))
    return out


def _assert_grads_close(ours, ref, label, rel_floor=5e-4):
    """Per-leaf gradient comparison at float-accumulation tolerance.

    Each leaf must match within ``rel_floor`` of ITS OWN gradient scale
    (max |ref| over the leaf): accumulation-order noise is ~1e-5 of the
    leaf scale, a wrong backward is O(1) of it. Leaves whose gradient is
    mathematically ~0 (conv biases feeding an InstanceNorm — the mean
    subtraction kills them) carry only float noise, so the tolerance has
    a small absolute floor.
    """
    ref_leaves = dict(_leaf_items(ref))
    our_leaves = dict(_leaf_items(ours))
    for name, r in ref_leaves.items():
        o = our_leaves[name]
        scale = max(float(np.abs(r).max()), 1e-8)
        diff = float(np.abs(o - r).max())
        assert diff <= max(rel_floor * scale, 1e-6), (
            f"{label}{name}: grad diff {diff:.3e} vs scale {scale:.3e} "
            f"(rel {diff / scale:.3e} > {rel_floor})")


def _noise_leaves(ref_grads, floor=1e-6):
    """Leaf names whose reference gradient is structurally ~0 (conv biases
    feeding an InstanceNorm: the mean subtraction makes them functionally
    inert). Adam updates such coordinates by ~±lr of pure float noise,
    uncorrelated across frameworks, so only the step-quantum bound is
    meaningful for them."""
    return {name for name, g in _leaf_items(ref_grads)
            if float(np.abs(g).max()) < floor}


def _assert_weights_close(ours, ref, label, lr, exempt=frozenset(),
                          n_steps=N_STEPS, outlier_frac=2e-3):
    """Post-trajectory weight comparison bounded by outlier count and the
    Adam step quantum (|update| <= ~lr per step at beta1=0.5 after bias
    correction; a sign-flipped coordinate drifts <= 2*lr*n_steps)."""
    thresh = 0.5 * lr
    quantum_bound = 2.5 * lr * n_steps
    ref_leaves = dict(_leaf_items(ref))
    our_leaves = dict(_leaf_items(ours))
    for name, r in ref_leaves.items():
        o = our_leaves[name]
        d = np.abs(o - r)
        n_out = int((d > thresh).sum())
        max_d = float(d.max())
        assert max_d <= quantum_bound, (
            f"{label}{name}: weight diff {max_d:.3e} exceeds the Adam "
            f"quantum bound {quantum_bound:.3e} — beyond sign-flip noise")
        if name in exempt:
            continue
        allowed = max(4, int(outlier_frac * d.size))
        assert n_out <= allowed, (
            f"{label}{name}: {n_out}/{d.size} coords beyond {thresh:.1e} "
            f"(allowed {allowed}) — more than accumulation-order noise")


def test_three_step_dynamics_match():
    from mask_cyclegan_vc.model import Discriminator as RefD
    from mask_cyclegan_vc.model import Generator as RefG

    torch.manual_seed(0)
    gA2B, gB2A = RefG(), RefG()
    dA, dB, dA2, dB2 = RefD(), RefD(), RefD(), RefD()
    g_opt = torch.optim.Adam(
        list(gA2B.parameters()) + list(gB2A.parameters()), lr=GEN_LR,
        betas=(0.5, 0.999))
    d_opt = torch.optim.Adam(
        list(dA.parameters()) + list(dB.parameters())
        + list(dA2.parameters()) + list(dB2.parameters()), lr=DISC_LR,
        betas=(0.5, 0.999))

    cfg = TrainConfig(
        schedule=ScheduleConfig(num_epochs=100, n_samples=81, batch_size=1,
                                decay_after=10**9, stop_identity_after=10**9),
        precision="highest",
    )
    state = create_train_state(cfg, seed=0)
    state = state.replace(
        g_params={
            "A2B": jax.tree.map(jnp.asarray,
                                generator_params_from_torch(gA2B.state_dict())),
            "B2A": jax.tree.map(jnp.asarray,
                                generator_params_from_torch(gB2A.state_dict())),
        },
        d_params={
            k: jax.tree.map(jnp.asarray,
                            discriminator_params_from_torch(m.state_dict()))
            for k, m in (("A", dA), ("B", dB), ("A2", dA2), ("B2", dB2))
        },
    )

    rs = np.random.RandomState(11)
    batches = []
    for i in range(N_STEPS):
        b = {
            "real_A": rs.randn(1, 80, 64).astype(np.float32),
            "mask_A": np.ones((1, 80, 64), np.float32),
            "real_B": rs.randn(1, 80, 64).astype(np.float32),
            "mask_B": np.ones((1, 80, 64), np.float32),
        }
        b["mask_A"][:, :, 30 - i:40] = 0.0
        b["mask_B"][:, :, 5:12 + i] = 0.0
        batches.append(b)

    # ---- 1. Step-0 per-leaf gradient parity (the sharp math-bug check) ----
    gen, disc, g_loss_fn, d_loss_fn = make_loss_fns(cfg)
    b0 = {k: jnp.asarray(v) for k, v in batches[0].items()}
    grad_g = jax.jit(jax.grad(g_loss_fn, has_aux=True))
    our_g_grads, _ = grad_g(state.g_params, state.d_params, b0,
                            jnp.float32(5.0))

    # Replicate the step ordering for the D grads: G update first, then
    # the D loss evaluated against the UPDATED generators (train.py:240-299).
    g_tx, _ = make_optimizers(cfg)
    g_upd, _ = g_tx.update(our_g_grads, state.g_opt, state.g_params)
    g_params_1 = jax.tree.map(lambda p, u: p + u, state.g_params, g_upd)

    def d_grads_fn(d_params, g_params, batch):
        generated_A = gen.apply(g_params["B2A"], batch["real_B"],
                                batch["mask_B"])
        cycled_B = gen.apply(g_params["A2B"], generated_A,
                             jnp.ones_like(generated_A))
        generated_B = gen.apply(g_params["A2B"], batch["real_A"],
                                batch["mask_A"])
        cycled_A = gen.apply(g_params["B2A"], generated_B,
                             jnp.ones_like(generated_B))
        fakes = jax.lax.stop_gradient({
            "generated_A": generated_A, "generated_B": generated_B,
            "cycled_A": cycled_A, "cycled_B": cycled_B,
        })
        return jax.grad(d_loss_fn, has_aux=True)(d_params, fakes, batch)

    our_d_grads, _ = jax.jit(d_grads_fn)(state.d_params, g_params_1, b0)

    # ---- 2. Loss trajectory over three full-size steps ----
    step = jax.jit(make_train_step(cfg))
    jstate = state
    ref_grads = {}
    for i, b in enumerate(batches):
        jstate, metrics = step(jstate,
                               {k: jnp.asarray(v) for k, v in b.items()})
        g_loss_ref, d_loss_ref = torch_reference_step(
            (gA2B, gB2A, dA, dB, dA2, dB2), (g_opt, d_opt), b,
            grad_sink=ref_grads if i == 0 else None)
        np.testing.assert_allclose(
            float(metrics["g_loss"]), g_loss_ref, rtol=2e-3,
            err_msg=f"g_loss diverged at step {i}")
        np.testing.assert_allclose(
            float(metrics["d_loss"]), d_loss_ref, rtol=2e-3,
            err_msg=f"d_loss diverged at step {i}")

    # Gradient trees compare in our layout: the state_dict->flax mapping
    # is a fixed permutation/transpose, under which gradients transform
    # exactly like the weights.
    for key, sink_key in (("A2B", "gA2B"), ("B2A", "gB2A")):
        ref_tree = generator_params_from_torch(ref_grads[sink_key])
        _assert_grads_close(our_g_grads[key], ref_tree, f"G[{key}]")
    for key, sink_key in (("A", "dA"), ("B", "dB"), ("A2", "dA2"),
                          ("B2", "dB2")):
        # include_dead=False: the dead downSample4 gets no torch grads
        # (never in forward); ours are structural zeros.
        ref_tree = discriminator_params_from_torch(ref_grads[sink_key],
                                                   include_dead=False)
        _assert_grads_close(our_d_grads[key], ref_tree, f"D[{key}]")

    # ---- 3. Post-trajectory weights: outlier count + Adam quantum ----
    for key, model in (("A2B", gA2B), ("B2A", gB2A)):
        ref_tree = generator_params_from_torch(model.state_dict())
        exempt = _noise_leaves(
            generator_params_from_torch(ref_grads[f"g{key}"]))
        _assert_weights_close(jstate.g_params[key], ref_tree, f"G[{key}]",
                              lr=GEN_LR, exempt=exempt)
    for key, model in (("A", dA), ("B", dB), ("A2", dA2), ("B2", dB2)):
        ref_tree = discriminator_params_from_torch(model.state_dict(),
                                                   include_dead=True)
        exempt = _noise_leaves(
            discriminator_params_from_torch(ref_grads[f"d{key}"],
                                            include_dead=False))
        _assert_weights_close(jstate.d_params[key], ref_tree, f"D[{key}]",
                              lr=DISC_LR, exempt=exempt)
