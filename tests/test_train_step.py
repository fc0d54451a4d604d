"""Train step tests: torch single-step parity + full GAN step functionality."""

import importlib.util
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patch_toon_tpu.train import StyleTransferModel, make_train_step
from patch_toon_tpu.utils.torch_compat import generator_params_from_torch

torch = pytest.importorskip("torch")

REF = pathlib.Path("/root/reference/src/models")


def _load_ref_module(name):
    path = REF / f"{name}.py"
    if not path.exists():
        pytest.skip("reference repo not available")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


GEN_ARGS = dict(
    use_bias=True, tanh=True, append_smoothers=True, resnet_blocks=2,
    filters=[8, 16, 32, 32, 32, 16], norm_layer="instance_norm",
    input_size=256, input_channels=3,
)


def _make_model(with_d=False, with_p=False, clip=True, batch_size=4,
                rec_criterion="L1Loss"):
    return StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(GEN_ARGS)},
        discriminator_config=(
            {"type": "DiscriminatorN_IN",
             "args": dict(num_filters=8, n_layers=2, use_noise=False,
                          norm_layer="instance_norm", use_bias=True,
                          input_channels=3)}
            if with_d else None
        ),
        training_config=dict(
            batch_size=batch_size, reconstruction_weight=4.0,
            adversarial_weight=0.5, use_image_loss=True,
            reconstruction_criterion=rec_criterion, adversarial_criterion="MSELoss",
            use_gradient_clipping=clip, gradient_clip_val=0.5, precision=32,
        ),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5),
            discriminator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5),
        ),
        data_config=dict(patch_size=32, additional_channels={}),
        perception_loss_config=(
            {"weight": 6.0,
             "perception_model": {"type": "PerceptualVGG19",
                                  "args": {"feature_layers": [0, 3, 5],
                                           "use_normalization": False,
                                           "path": None}}}
            if with_p else None
        ),
    )


def test_single_g_step_parity_vs_torch():
    """One full generator update (L1 loss, clip 0.5, torch-Adam wd) must land
    on the same parameters as torch within fp32 roundoff."""
    ref_gen = _load_ref_module("generator")
    torch.manual_seed(0)
    tg = ref_gen.GeneratorJ(**GEN_ARGS).train()

    x_t = torch.randn(4, 3, 32, 32)
    y_t = torch.rand(4, 3, 32, 32) * 2 - 1

    # MSE (smooth) for gradient parity: L1's sign() gradient is discontinuous
    # at zero, so fp32 forward noise flips contributions between frameworks.
    model = _make_model(with_d=False, with_p=False, rec_criterion="MSELoss")
    params0, stats0 = generator_params_from_torch(tg.state_dict(), resnet_blocks=2)
    state = model.init_state(jax.random.PRNGKey(0), patch_size=32)
    state = state.replace(
        g_params=jax.tree.map(jnp.asarray, params0),
        g_batch_stats=jax.tree.map(jnp.asarray, stats0),
        g_opt=model.tx_g.init(jax.tree.map(jnp.asarray, params0)),
    )

    step = make_train_step(model, donate=False)
    batch = {
        "pre": jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1))),
        "post": jnp.asarray(np.transpose(y_t.numpy(), (0, 2, 3, 1))),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))

    # torch side: same update
    opt = torch.optim.Adam(tg.parameters(), lr=4e-4, betas=(0.9, 0.999),
                           weight_decay=1e-5)
    out = tg(x_t)
    loss = torch.nn.MSELoss()(out, y_t) * 4.0
    opt.zero_grad()
    loss.backward()
    torch_grads = {name: p.grad.detach().numpy().copy()
                   for name, p in tg.named_parameters()}  # pre-clip
    torch.nn.utils.clip_grad_norm_(tg.parameters(), 0.5)
    opt.step()

    assert np.isclose(float(metrics["g_total_loss"]), float(loss.detach()), atol=1e-5)

    # --- gradient parity (tight): torch grads vs jax grads ---------------
    def jax_loss(p):
        out, _ = model.generator.apply(
            {"params": p, "batch_stats": jax.tree.map(jnp.asarray, stats0)},
            batch["pre"], train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.square(out - batch["post"])) * 4.0

    jax_grads = jax.grad(jax_loss)(jax.tree.map(jnp.asarray, params0))
    tg_grads_flax, _ = generator_params_from_torch(
        {k: torch.from_numpy(v) for k, v in torch_grads.items()}
        | {k: v for k, v in tg.state_dict().items() if "running" in k
           or "num_batches" in k or "smoothers.2" in k},
        resnet_blocks=2)
    flat_ours = jax.tree_util.tree_leaves_with_path(jax_grads)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree.map(jnp.asarray, tg_grads_flax)))
    for path, ours in flat_ours:
        if "smoother_bn" in jax.tree_util.keystr(path):
            continue  # grad-of-affine compared via params below
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(flat_ref[path]), atol=2e-6, rtol=1e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )

    # --- parameter parity (loose: Adam's eps-normalized first step
    # amplifies fp32 noise on near-zero grads up to ~lr) ------------------
    params_after, stats_after = generator_params_from_torch(
        tg.state_dict(), resnet_blocks=2)
    flat_ours = jax.tree_util.tree_leaves_with_path(new_state.g_params)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree.map(jnp.asarray, params_after)))
    for path, ours in flat_ours:
        ref = flat_ref[path]
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=1.2e-4,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )
    # BatchNorm running stats must advance identically
    np.testing.assert_allclose(
        np.asarray(new_state.g_batch_stats["smoother_bn"]["mean"]),
        stats_after["smoother_bn"]["mean"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.g_batch_stats["smoother_bn"]["var"]),
        stats_after["smoother_bn"]["var"], atol=1e-5)


def test_full_gan_step_runs_and_learns():
    model = _make_model(with_d=True, with_p=True)
    state = model.init_state(jax.random.PRNGKey(0), patch_size=32)
    step = make_train_step(model, donate=False)

    rng = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(rng)
    pre = jax.random.uniform(k1, (8, 32, 32, 3)) * 2 - 1
    post = jnp.clip(pre * 0.5 + 0.2, -1, 1)  # learnable mapping
    batch = {"pre": pre, "post": post}

    first_img_loss = None
    for i in range(30):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        for name in ("d_real_loss", "d_fake_loss", "d_total_loss",
                     "g_image_loss", "g_perception_loss",
                     "g_adversarial_loss", "g_total_loss"):
            assert name in metrics
            assert np.isfinite(float(metrics[name])), name
        if first_img_loss is None:
            first_img_loss = float(metrics["g_image_loss"])
    assert float(metrics["g_image_loss"]) < first_img_loss


def test_step_counter_and_no_d():
    model = _make_model(with_d=False)
    state = model.init_state(jax.random.PRNGKey(0), patch_size=32)
    assert state.d_params is None
    step = make_train_step(model, donate=False)
    batch = {"pre": jnp.zeros((2, 32, 32, 3)), "post": jnp.zeros((2, 32, 32, 3))}
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert int(state.step) == 1
    assert "d_total_loss" not in metrics


def test_full_gan_step_parity_vs_torch():
    """One complete reference training_step (D update, then G update with
    image + perceptual + adversarial losses against the updated D) must land
    on the same G and D parameters as torch."""
    ref_gen = _load_ref_module("generator")
    ref_disc = _load_ref_module("discriminator")
    torch.manual_seed(0)
    tg = ref_gen.GeneratorJ(**GEN_ARGS).train()
    td = ref_disc.DiscriminatorN_IN(
        input_channels=3, num_filters=8, n_layers=2, use_noise=False,
        norm_layer="instance_norm", use_bias=True).train()
    x_t = torch.randn(4, 3, 32, 32)
    y_t = torch.rand(4, 3, 32, 32) * 2 - 1

    model = _make_model(with_d=True, with_p=True, rec_criterion="MSELoss")
    g_params0, g_stats0 = generator_params_from_torch(tg.state_dict(),
                                                      resnet_blocks=2)
    from patch_toon_tpu.utils.torch_compat import (
        discriminator_params_from_torch,
    )

    d_params0 = discriminator_params_from_torch(td.state_dict(), n_layers=2)
    state = model.init_state(jax.random.PRNGKey(0), patch_size=32)
    state = state.replace(
        g_params=jax.tree.map(jnp.asarray, g_params0),
        g_batch_stats=jax.tree.map(jnp.asarray, g_stats0),
        g_opt=model.tx_g.init(jax.tree.map(jnp.asarray, g_params0)),
        d_params=jax.tree.map(jnp.asarray, d_params0),
        d_opt=model.tx_d.init(jax.tree.map(jnp.asarray, d_params0)),
    )

    # torch VGG prefix carrying OUR deterministic fallback weights
    vgg_params = state.vgg_params
    prefix = torch.nn.Sequential(
        torch.nn.Conv2d(3, 64, 3, 1, 1), torch.nn.ReLU(),
        torch.nn.Conv2d(64, 64, 3, 1, 1), torch.nn.ReLU(),
        torch.nn.MaxPool2d(2, 2), torch.nn.Conv2d(64, 128, 3, 1, 1),
    )
    with torch.no_grad():
        for idx in (0, 2, 5):
            k = np.asarray(vgg_params[f"features_{idx}"]["kernel"])  # HWIO
            b = np.asarray(vgg_params[f"features_{idx}"]["bias"])
            prefix[idx].weight.copy_(
                torch.from_numpy(np.transpose(k, (3, 2, 0, 1))))
            prefix[idx].bias.copy_(torch.from_numpy(b))
    prefix = prefix.eval()

    def torch_vgg_feats(img):
        feats, cur = [], img
        for i, layer in enumerate(prefix):
            cur = layer(cur)
            if i in (0, 3, 5):
                feats.append(cur.reshape(cur.size(0), -1))
        return torch.cat(feats, dim=1)

    # ---- our step -------------------------------------------------------
    step = make_train_step(model, donate=False)
    batch = {
        "pre": jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1))),
        "post": jnp.asarray(np.transpose(y_t.numpy(), (0, 2, 3, 1))),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))

    # ---- torch replica of reference training_step ------------------------
    opt_g = torch.optim.Adam(tg.parameters(), lr=4e-4, betas=(0.9, 0.999),
                             weight_decay=1e-5)
    opt_d = torch.optim.Adam(td.parameters(), lr=4e-4, betas=(0.9, 0.999),
                             weight_decay=1e-5)
    mse = torch.nn.MSELoss()

    # D phase (lightning_model.py:224-236,294-321)
    opt_d.zero_grad()
    with torch.no_grad():
        gen_d = tg(x_t)
    real, _ = td(y_t)
    fake, _ = td(gen_d)
    d_loss = (mse(real, torch.ones_like(real))
              + mse(fake, torch.zeros_like(fake))) * 0.5
    d_loss.backward()
    torch.nn.utils.clip_grad_norm_(td.parameters(), 0.5)
    opt_d.step()

    # G phase (lightning_model.py:239-250,260-292)
    opt_g.zero_grad()
    gen = tg(x_t)
    g_img = mse(gen, y_t) * 4.0
    g_perc = ((torch_vgg_feats(gen) - torch_vgg_feats(y_t.detach())) ** 2
              ).mean() * 6.0
    adv_logits, _ = td(gen)
    g_adv = mse(adv_logits, torch.ones_like(adv_logits)) * 0.5
    g_total = g_img + g_perc + g_adv
    g_total.backward()
    torch.nn.utils.clip_grad_norm_(tg.parameters(), 0.5)
    opt_g.step()

    assert np.isclose(float(metrics["d_total_loss"]),
                      float(d_loss.detach()), atol=1e-5)
    assert np.isclose(float(metrics["g_total_loss"]),
                      float(g_total.detach()), atol=1e-4)

    g_after, stats_after = generator_params_from_torch(tg.state_dict(),
                                                       resnet_blocks=2)
    d_after = discriminator_params_from_torch(td.state_dict(), n_layers=2)
    for ours_tree, ref_tree, tag in (
            (new_state.g_params, g_after, "G"),
            (new_state.d_params, d_after, "D")):
        flat_ref = dict(jax.tree_util.tree_leaves_with_path(
            jax.tree.map(jnp.asarray, ref_tree)))
        for path, ours in jax.tree_util.tree_leaves_with_path(ours_tree):
            # biases feeding InstanceNorm have analytically ~zero gradients
            # (IN cancels constant shifts); Adam's first-step eps
            # normalization amplifies fp32 noise there up to ~2*lr.
            key = jax.tree_util.keystr(path)
            tol = 1.5e-4 if "kernel" in key else 9e-4
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(flat_ref[path]), atol=tol,
                err_msg=f"{tag} param mismatch at {key}")
    # BN running stats advanced TWICE per step in the reference
    np.testing.assert_allclose(
        np.asarray(new_state.g_batch_stats["smoother_bn"]["mean"]),
        stats_after["smoother_bn"]["mean"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.g_batch_stats["smoother_bn"]["var"]),
        stats_after["smoother_bn"]["var"], atol=1e-3)


def test_guide_dropout_substitutes_rgb_for_trailing_channels():
    """training.guide_dropout_p=1.0 must be exactly equivalent to feeding the
    serving engine's chain-start input: trailing guide channels replaced by
    the frame RGB (infer/engine.py temporal path, guide = frame[..., :3])."""
    def make(gd_p):
        m = StyleTransferModel(
            generator_config={"type": "GeneratorJ",
                              "args": dict(GEN_ARGS, input_channels=6)},
            discriminator_config=None,
            training_config=dict(
                batch_size=4, reconstruction_weight=4.0,
                adversarial_weight=0.5, use_image_loss=True,
                reconstruction_criterion="L1Loss",
                adversarial_criterion="MSELoss",
                use_gradient_clipping=True, gradient_clip_val=0.5,
                precision=32, guide_dropout_p=gd_p, guide_dropout_depth=3,
            ),
            optimizer_config=dict(
                generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5),
                discriminator=dict(lr=4e-4, betas=[0.9, 0.999],
                                   weight_decay=1e-5),
            ),
            data_config=dict(patch_size=32, additional_channels={
                "temporal": {"path": "unused", "depth": 3}}),
            perception_loss_config=None,
        )
        return m

    rng = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(rng, 3)
    pre = jax.random.uniform(k1, (4, 32, 32, 3)) * 2 - 1
    guides = jax.random.uniform(k2, (4, 32, 32, 3)) * 2 - 1
    post = jnp.clip(pre * 0.5 + 0.2, -1, 1)

    # p=1.0: every sample's guide channels are dropped to the frame RGB
    m1 = make(1.0)
    s1 = m1.init_state(jax.random.PRNGKey(0), patch_size=32)
    step1 = make_train_step(m1, donate=False)
    s1, _ = step1(s1, {"pre": pre, "post": post, "channels": guides}, k3)

    # p=0.0 with the substitution done by hand must land on the same params
    m0 = make(0.0)
    s0 = m0.init_state(jax.random.PRNGKey(0), patch_size=32)
    step0 = make_train_step(m0, donate=False)
    s0, _ = step0(s0, {"pre": pre, "post": post, "channels": pre}, k3)

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s1.g_params, s0.g_params)

    # p=0.0 with real guides must differ (the knob actually gates)
    m2 = make(0.0)
    s2 = m2.init_state(jax.random.PRNGKey(0), patch_size=32)
    step2 = make_train_step(m2, donate=False)
    s2, _ = step2(s2, {"pre": pre, "post": post, "channels": guides}, k3)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s1.g_params, s2.g_params))
    assert max(diffs) > 0.0
