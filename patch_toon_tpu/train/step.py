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
) -> Callable[[GANTrainState, Dict[str, jax.Array], jax.Array],
              Tuple[GANTrainState, Metrics]]:
    tc = model.training_config
    rec_crit = get_criterion(tc["reconstruction_criterion"])
    adv_crit = get_criterion(tc["adversarial_criterion"])
    rec_w = float(tc["reconstruction_weight"])
    adv_w = float(tc["adversarial_weight"])
    use_image_loss = bool(tc.get("use_image_loss", True))
    dt = model.dtype or jnp.float32

    G = model.generator
    D = model.discriminator
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
        post = batch["post"]

        metrics: Metrics = {}

        # ---- discriminator phase -------------------------------------
        # When no discriminator is configured the reference skips this phase
        # entirely (lightning_model.py:224), including the extra generator
        # forward — so BatchNorm stats update once per step, not twice.
        d_params, d_opt = state.d_params, state.d_opt
        bs1 = state.g_batch_stats
        if D is not None:
            gen_for_d, bs1 = g_forward(state.g_params, state.g_batch_stats, x)
            gen_for_d = jax.lax.stop_gradient(gen_for_d)

            def d_loss_fn(p):
                real = d_apply(p, post, rng_real)
                fake = d_apply(p, gen_for_d, rng_fake_d)
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

        # ---- generator phase (uses the UPDATED discriminator) ---------
        def g_loss_fn(p):
            gen, bs2 = g_forward(p, bs1, x)
            losses: Metrics = {}
            if use_image_loss:
                losses["g_image_loss"] = rec_crit(gen, post) * rec_w
            if P is not None:
                fake_feats = p_features(state.vgg_params, gen)
                target_feats = p_features(
                    state.vgg_params, jax.lax.stop_gradient(post))
                losses["g_perception_loss"] = (
                    perceptual_mse(fake_feats, target_feats) * pw
                )
            if D is not None:
                fake_logits = d_apply(d_params, gen, rng_fake_g)
                losses["g_adversarial_loss"] = (
                    adv_crit(fake_logits, jnp.ones_like(fake_logits)) * adv_w
                )
            total = sum(losses.values())
            return total, (losses, bs2)

        (g_total, (g_losses, bs2)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
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

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
