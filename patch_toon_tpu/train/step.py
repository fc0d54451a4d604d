"""The GAN train step: one pure jitted function per optimization step.

Replaces the reference's eager ``training_step`` (lightning_model.py:201-258)
with a single compiled program. Semantics preserved exactly:

1. discriminator phase first (lightning_model.py:224-236): the generator runs
   in train mode without gradient (its BatchNorm batch stats update, exactly
   like torch no_grad), D is trained on (real=post, fake=generated) with the
   configured adversarial criterion, total = 0.5 * (real + fake)
   (lightning_model.py:294-321);
2. generator phase second (lightning_model.py:239-250), with a *fresh*
   generator forward and the adversarial term computed against the
   just-updated discriminator: L = rec_criterion * reconstruction_weight +
   VGG-feature MSE * perception weight + adv_criterion(D(gen), 1) *
   adversarial_weight (lightning_model.py:260-292);
3. per-network global-norm clipping and torch-Adam updates are inside each
   optimizer chain (see patch_toon_tpu.train.optim).

Under a bf16 policy the network forwards run in bfloat16 on the MXU while all
losses, norm statistics, and optimizer math stay fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from patch_toon_tpu.models.perception import perceptual_mse
from patch_toon_tpu.train.losses import get_criterion
from patch_toon_tpu.train.state import GANTrainState

Metrics = Dict[str, jax.Array]


def make_train_step(
    model: "Any",  # StyleTransferModel
    donate: bool = True,
    sampler: Optional[Callable[[jax.Array], Dict[str, jax.Array]]] = None,
    batch_sharding: Optional[Any] = None,
    xla_options: Any = "auto",
    two_forward: bool = False,
) -> Callable[..., Tuple[GANTrainState, Metrics]]:
    """Build the jitted GAN step.

    Without ``sampler`` the step signature is (state, batch, rng). With
    ``sampler`` (the device-side patch gather), sampling fuses INTO the same
    compiled program — signature (state, rng) — so each optimization step is
    exactly one dispatch (one host->device round-trip through any transport).
    ``batch_sharding`` optionally pins the sampled batch's layout (the data
    mesh axis) via a sharding constraint.

    ``two_forward=True`` replaces the one-forward vjp restructure with the
    reference's literal two generator forwards (no_grad forward for the D
    phase, fresh grad forward for the G phase, BatchNorm stats advancing
    naturally in each) — an ablation/parity mode (training.two_forward) for
    isolating the restructure in quality studies; values should be
    bit-comparable, at ~20% more compute.
    """
    from patch_toon_tpu.utils.xla_options import resolve_xla_options

    compiler_options = resolve_xla_options(
        model.training_config.get("xla_options", xla_options)
        if xla_options == "auto" else xla_options)
    tc = model.training_config
    rec_crit = get_criterion(tc["reconstruction_criterion"])
    adv_crit = get_criterion(tc["adversarial_criterion"])
    rec_w = float(tc["reconstruction_weight"])
    adv_w = float(tc["adversarial_weight"])
    use_image_loss = bool(tc.get("use_image_loss", True))
    # guide dropout (training.guide_dropout_p): with probability p per
    # sample, the trailing guide_dropout_depth input channels are replaced
    # by the first `depth` RGB bands — exactly the serving-time chain-start
    # condition of the temporal mode (infer/engine.py: guide = frame RGB on
    # the first frame / after a chain break), so a temporal-channel model
    # learns to degrade gracefully when the warp chain (re)starts. No
    # reference equivalent (the reference has no temporal channels).
    gd_p = float(tc.get("guide_dropout_p", 0.0) or 0.0)
    gd_depth = int(tc.get("guide_dropout_depth", 3) or 3)
    dt = model.dtype or jnp.float32

    G = model.generator
    D = model.discriminator
    # without a discriminator there is no D phase, so the reference runs
    # exactly ONE generator forward per step (lightning_model.py:262) —
    # two_forward would add a wasted forward and a second BN-stats advance
    if D is None:
        two_forward = False
    P = model.perception
    pw = model.perception_weight
    tx_g, tx_d = model.tx_g, model.tx_d

    def g_forward(g_params, g_stats, x):
        out, updates = G.apply(
            {"params": g_params, "batch_stats": g_stats},
            x, train=True, mutable=["batch_stats"],
        )
        return out, updates.get("batch_stats", g_stats)

    def d_apply(d_params, x, noise_rng):
        return D.apply({"params": d_params}, x.astype(dt), train=True,
                       noise_rng=noise_rng)

    def p_features(vgg_params, x):
        return P.apply({"params": vgg_params}, x.astype(dt))

    def train_step(state: GANTrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array) -> Tuple[GANTrainState, Metrics]:
        rng_real, rng_fake_d, rng_fake_g = jax.random.split(rng, 3)

        # combined input: RGB + guide channels (lightning_model.py:211-221)
        x = batch["pre"]
        if "channels" in batch:
            x = jnp.concatenate([x, batch["channels"]], axis=-1)
        x = x.astype(dt)
        if gd_p > 0.0 and x.shape[-1] > gd_depth:
            # per-sample guide dropout: trailing guide channels -> RGB
            # bands (the chain-start input the serving engine feeds)
            rng_gd = jax.random.fold_in(rng, 0x6D)
            drop = jax.random.bernoulli(rng_gd, gd_p, (x.shape[0], 1, 1, 1))
            x = jnp.concatenate([
                x[..., :-gd_depth],
                jnp.where(drop, x[..., :gd_depth], x[..., -gd_depth:]),
            ], axis=-1)
        post = batch["post"]

        metrics: Metrics = {}

        # ---- ONE generator forward serves both phases ------------------
        # The reference runs the generator twice on the same input — once
        # under no_grad for the D phase (lightning_model.py:296-297), once
        # with grad for the G phase (lightning_model.py:262). Both forwards
        # see identical params/inputs, so their values are identical; here a
        # single jax.vjp forward provides the D phase's fake batch (via
        # stop_gradient) AND the linearization for the G backward —
        # mathematically the same update at ~20% less compute. The one
        # observable difference, BatchNorm running stats advancing twice per
        # step, is replicated arithmetically below.
        d_params, d_opt = state.d_params, state.d_opt

        if two_forward:
            # reference-literal mode: forward #1 under (emulated) no_grad
            # feeds the D phase and advances BN stats once; forward #2 in
            # the G phase (below) carries the gradient and advances again
            gen0, bs1 = g_forward(state.g_params, state.g_batch_stats, x)
            gen_value = jax.lax.stop_gradient(gen0)
            bs1 = jax.tree.map(jax.lax.stop_gradient, bs1)
            g_vjp = bs_new = None
        else:
            def g_fwd_only(p):
                return g_forward(p, state.g_batch_stats, x)

            (gen, bs_new), g_vjp = jax.vjp(g_fwd_only, state.g_params,
                                           has_aux=False)
            gen_value = jax.lax.stop_gradient(gen)

        if D is not None:
            # reference applies the BN momentum update in BOTH forwards:
            # m2 = 0.9*m1 + 0.1*b == m1 + 0.9*(m1 - m0)
            bs2 = None if two_forward else jax.tree.map(
                lambda new, old: new + 0.9 * (new - old),
                bs_new, state.g_batch_stats,
            )

            def d_loss_fn(p):
                real = d_apply(p, post, rng_real)
                fake = d_apply(p, gen_value, rng_fake_d)
                real_loss = adv_crit(real, jnp.ones_like(real))
                fake_loss = adv_crit(fake, jnp.zeros_like(fake))
                return (real_loss + fake_loss) * 0.5, (real_loss, fake_loss)

            (d_loss, (real_loss, fake_loss)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.d_params)
            d_updates, d_opt = tx_d.update(d_grads, state.d_opt, state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
            metrics.update(
                d_real_loss=real_loss, d_fake_loss=fake_loss, d_total_loss=d_loss
            )
        else:
            bs2 = None if two_forward else bs_new

        # ---- generator phase (adversarial term vs the UPDATED D) -------
        def loss_from_gen(g):
            losses: Metrics = {}
            if use_image_loss:
                losses["g_image_loss"] = rec_crit(g, post) * rec_w
            if P is not None:
                fake_feats = p_features(state.vgg_params, g)
                target_feats = p_features(
                    state.vgg_params, jax.lax.stop_gradient(post))
                losses["g_perception_loss"] = (
                    perceptual_mse(fake_feats, target_feats) * pw
                )
            if D is not None:
                fake_logits = d_apply(d_params, g, rng_fake_g)
                losses["g_adversarial_loss"] = (
                    adv_crit(fake_logits, jnp.ones_like(fake_logits)) * adv_w
                )
            return sum(losses.values()), losses

        if two_forward:
            # reference G phase (lightning_model.py:262): a FRESH forward
            # from the once-advanced stats; its own BN update is the final
            def g_loss_fn(p):
                g, bs2b = g_forward(p, bs1, x)
                total, losses = loss_from_gen(g)
                return total, (losses, bs2b)

            (g_total, (g_losses, bs2b)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.g_params)
            bs2 = jax.tree.map(jax.lax.stop_gradient, bs2b)
        else:
            (g_total, g_losses), dgen = jax.value_and_grad(
                loss_from_gen, has_aux=True)(gen)
            # pull d(loss)/d(gen) back through the generator; bs_new is a
            # non-differentiable aux output of the vjp'd function
            (g_grads,) = g_vjp((dgen, jax.tree.map(jnp.zeros_like, bs_new)))
        g_updates, g_opt = tx_g.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics.update(g_losses)
        metrics["g_total_loss"] = g_total

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params, g_batch_stats=bs2, g_opt=g_opt,
            d_params=d_params, d_opt=d_opt,
        )
        return new_state, metrics

    if sampler is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                       compiler_options=compiler_options)

    def fused_step(state: GANTrainState, rng: jax.Array):
        rng_sample, rng_step = jax.random.split(rng)
        batch = sampler(rng_sample)
        if batch_sharding is not None:
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, batch_sharding),
                batch)
        return train_step(state, batch, rng_step)

    return jax.jit(fused_step, donate_argnums=(0,) if donate else (),
                   compiler_options=compiler_options)
