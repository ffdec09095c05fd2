"""Shared torch oracle: literal re-execution of the reference iteration.

Used by test_dynamics_parity.py (full size, RUN_SLOW) and
test_trajectory_parity.py (small-R, default suite). The loss graph and
update ordering re-execute /root/reference/mask_cyclegan_vc/train.py:195-299
against the reference's own nn.Modules; the post-iteration schedule
mutations re-execute train.py:306-315 (including the Appendix-A LR-decay
bug when ``ref_compat=True``).
"""

import torch


def ref_generator_forward(g, x, mask):
    """Reference Generator.forward (model.py:239-280) driven module-by-module,
    with the hardcoded ``view(B, 256, 20, -1)`` (model.py:271) generalized to
    the model's own channel count so small-R oracles run. At R=256 this is
    bit-identical to ``g(x, mask)``."""
    h = torch.stack((x * mask, mask), dim=1)
    h = g.conv1(h) * torch.sigmoid(g.conv1_gates(h))
    h = g.downSample2(g.downSample1(h))
    h = h.view(h.size(0), g.flattened_channels, 1, -1).squeeze(2)
    h = g.conv2dto1dLayer_tfan(g.conv2dto1dLayer(h))
    for i in range(1, 7):
        h = getattr(g, f"residualLayer{i}")(h)
    h = g.conv1dto2dLayer_tfan(g.conv1dto2dLayer(h))
    R = g.downSample2.convLayer[0].out_channels
    h = h.unsqueeze(2).view(h.size(0), R, g.flattened_channels // R, -1)
    h = g.upSample2(g.upSample1(h))
    return g.lastConvLayer(h).squeeze(1)


def _grad_state_dict(module):
    """{param_name: grad ndarray} in state_dict key layout (grads transform
    under the torch->flax layout mapping exactly like the weights, so the
    io.torch_import mapping functions apply verbatim)."""
    # remove_duplicate=False: the reference Generator registers upSample2's
    # Sequential under TWO names (upsample() helper also assigns
    # self.convLayer, model.py:225-237); dedup would drop the upSample2.*
    # aliases that the state_dict (and our importer) use.
    return {n: p.grad.detach().clone().numpy()
            for n, p in module.named_parameters(remove_duplicate=False)
            if p.grad is not None}


def torch_reference_step(models, opts, batch, lam_cycle=10.0, lam_id=5.0,
                         gen_forward=None, grad_sink=None):
    """Literal re-execution of reference train.py:195-299 (detached D step
    — detachment does not change final weights, SURVEY Appendix A.2).

    When ``grad_sink`` (a dict) is given, the post-backward gradients of
    every model are stashed into it as state_dict-keyed numpy dicts under
    keys gA2B/gB2A/dA/dB/dA2/dB2 — captured before the optimizer steps,
    i.e. the exact d(loss)/d(params) of this iteration."""
    if gen_forward is None:
        gen_forward = lambda g, x, m: g(x, m)  # noqa: E731
    gA2B, gB2A, dA, dB, dA2, dB2 = models
    g_opt, d_opt = opts
    real_A = torch.from_numpy(batch["real_A"])
    mask_A = torch.from_numpy(batch["mask_A"])
    real_B = torch.from_numpy(batch["real_B"])
    mask_B = torch.from_numpy(batch["mask_B"])
    ones_A = torch.ones_like(real_A)

    fake_B = gen_forward(gA2B, real_A, mask_A)
    cycle_A = gen_forward(gB2A, fake_B, torch.ones_like(fake_B))
    fake_A = gen_forward(gB2A, real_B, mask_B)
    cycle_B = gen_forward(gA2B, fake_A, torch.ones_like(fake_A))
    identity_A = gen_forward(gB2A, real_A, ones_A)
    identity_B = gen_forward(gA2B, real_B, torch.ones_like(real_B))
    d_fake_A = dA(fake_A)
    d_fake_B = dB(fake_B)
    d_fake_cycle_A = dA2(cycle_A)
    d_fake_cycle_B = dB2(cycle_B)

    cycleLoss = torch.mean(torch.abs(real_A - cycle_A)) + torch.mean(
        torch.abs(real_B - cycle_B))
    identityLoss = torch.mean(torch.abs(real_A - identity_A)) + torch.mean(
        torch.abs(real_B - identity_B))
    g_loss = (
        torch.mean((1 - d_fake_B) ** 2) + torch.mean((1 - d_fake_A) ** 2)
        + torch.mean((1 - d_fake_cycle_B) ** 2)
        + torch.mean((1 - d_fake_cycle_A) ** 2)
        + lam_cycle * cycleLoss + lam_id * identityLoss
    )
    g_opt.zero_grad(); d_opt.zero_grad()
    g_loss.backward()
    if grad_sink is not None:
        grad_sink["gA2B"] = _grad_state_dict(gA2B)
        grad_sink["gB2A"] = _grad_state_dict(gB2A)
    g_opt.step()

    with torch.no_grad():
        generated_A = gen_forward(gB2A, real_B, mask_B)
        cycled_B = gen_forward(gA2B, generated_A, torch.ones_like(generated_A))
        generated_B = gen_forward(gA2B, real_A, mask_A)
        cycled_A = gen_forward(gB2A, generated_B, torch.ones_like(generated_B))
    d_real_A = dA(real_A); d_real_B = dB(real_B)
    d_real_A2 = dA2(real_A); d_real_B2 = dB2(real_B)
    d_fake_A = dA(generated_A); d_fake_B = dB(generated_B)
    d_cycled_A = dA2(cycled_A); d_cycled_B = dB2(cycled_B)
    d_loss_A = (torch.mean((1 - d_real_A) ** 2) + torch.mean(d_fake_A ** 2)) / 2
    d_loss_B = (torch.mean((1 - d_real_B) ** 2) + torch.mean(d_fake_B ** 2)) / 2
    d_loss_A2 = (torch.mean((1 - d_real_A2) ** 2) + torch.mean(d_cycled_A ** 2)) / 2
    d_loss_B2 = (torch.mean((1 - d_real_B2) ** 2) + torch.mean(d_cycled_B ** 2)) / 2
    d_loss = (d_loss_A + d_loss_B) / 2 + (d_loss_A2 + d_loss_B2) / 2
    g_opt.zero_grad(); d_opt.zero_grad()
    d_loss.backward()
    if grad_sink is not None:
        for k, m in (("dA", dA), ("dB", dB), ("dA2", dA2), ("dB2", dB2)):
            grad_sink[k] = _grad_state_dict(m)
    d_opt.step()
    return float(g_loss), float(d_loss)


def _set_lr(opt, lr):
    for pg in opt.param_groups:
        pg["lr"] = lr


def torch_reference_trajectory(models, opts, batches, *, generator_lr,
                               discriminator_lr, total_steps, decay_after,
                               stop_identity_after, batch_size=1,
                               lam_cycle=10.0, lam_id=5.0, ref_compat=True,
                               gen_forward=None):
    """N reference iterations incl. the post-iteration schedule mutations
    (train.py:306-315). ``ref_compat=True`` reproduces the Appendix-A bug:
    BOTH adjust_lr_rate calls receive the generator optimizer, so G ends
    up on the discriminator's decaying schedule and D is never decayed.
    ``ref_compat=False`` is the corrected semantics our default mode
    implements. Returns the per-step (g_loss, d_loss) list."""
    g_opt, d_opt = opts
    g_decay = generator_lr / float(total_steps)
    d_decay = discriminator_lr / float(total_steps)
    g_lr, d_lr = generator_lr, discriminator_lr
    losses = []
    for i, batch in enumerate(batches):
        losses.append(torch_reference_step(
            models, opts, batch, lam_cycle, lam_id, gen_forward))
        global_step = (i + 1) * batch_size
        if global_step > decay_after:  # train.py:306-311
            g_lr = max(0.0, g_lr - g_decay)
            _set_lr(g_opt, g_lr)
            d_lr = max(0.0, d_lr - d_decay)
            _set_lr(d_opt if not ref_compat else g_opt, d_lr)
        if global_step > stop_identity_after:  # train.py:313-315
            lam_id = 0.0
    return losses
