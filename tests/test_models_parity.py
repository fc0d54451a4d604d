"""Golden parity tests: our flax models vs the reference torch modules.

The reference model files (src/models/{generator,discriminator}.py) import
only torch, so we load them straight from /root/reference (read-only) and
compare activations bit-for-bit (fp32 tolerance) after converting weights via
patch_toon_tpu.utils.torch_compat. No reference code is copied.
"""

import importlib.util
import pathlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from patch_toon_tpu.models import DiscriminatorN_IN, GeneratorJ, PerceptualVGG19
from patch_toon_tpu.utils.torch_compat import (
    discriminator_params_from_torch,
    generator_params_from_torch,
    vgg_params_from_torch,
)

REF = pathlib.Path("/root/reference/src/models")


def _load_ref_module(name: str):
    path = REF / f"{name}.py"
    if not path.exists():
        pytest.skip("reference repo not available")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _to_nhwc(x: torch.Tensor) -> np.ndarray:
    return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("channels,use_bias,smoothers,tanh", [
    (6, True, True, True),    # shipped default config
    (3, False, False, False),  # minimal variant
])
def test_generator_parity(channels, use_bias, smoothers, tanh):
    ref_gen = _load_ref_module("generator")
    torch.manual_seed(0)
    tg = ref_gen.GeneratorJ(
        input_channels=channels, use_bias=use_bias, tanh=tanh,
        append_smoothers=smoothers, resnet_blocks=7,
        filters=[32, 64, 128, 128, 128, 64], norm_layer="instance_norm",
    ).eval()

    params, batch_stats = generator_params_from_torch(
        tg.state_dict(), resnet_blocks=7, norm_layer="instance_norm",
        append_smoothers=smoothers,
    )
    variables = {"params": params}
    if smoothers:
        variables["batch_stats"] = batch_stats

    jg = GeneratorJ(
        input_channels=channels, use_bias=use_bias, tanh=tanh,
        append_smoothers=smoothers, resnet_blocks=7,
        filters=(32, 64, 128, 128, 128, 64), norm_layer="instance_norm",
    )

    x = torch.randn(2, channels, 80, 80)
    with torch.no_grad():
        y_ref = tg(x)
    y_jax = jg.apply(variables, jnp.asarray(_to_nhwc(x)), train=False)
    np.testing.assert_allclose(
        np.asarray(y_jax), _to_nhwc(y_ref), atol=2e-4, rtol=1e-3
    )


def test_generator_parity_train_mode_batchnorm():
    """Train-mode BatchNorm (batch statistics) must match torch training mode."""
    ref_gen = _load_ref_module("generator")
    torch.manual_seed(1)
    tg = ref_gen.GeneratorJ(input_channels=3, use_bias=True).train()
    params, batch_stats = generator_params_from_torch(tg.state_dict())
    jg = GeneratorJ(input_channels=3, use_bias=True)

    x = torch.randn(4, 3, 80, 80)
    y_ref = tg(x)  # training mode -> batch stats
    y_jax, _ = jg.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(_to_nhwc(x)), train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(y_jax), _to_nhwc(y_ref), atol=2e-4, rtol=1e-3
    )


def test_generator_nonsquare_input():
    """Generator must handle non-square tiles (whole-frame use)."""
    jg = GeneratorJ(input_channels=3, use_bias=True)
    v = jg.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)))
    y = jg.apply(v, jnp.zeros((1, 64, 128, 3)))
    assert y.shape == (1, 64, 128, 3)


@pytest.mark.parametrize("n_layers,num_filters", [(2, 12), (3, 64)])
def test_discriminator_parity(n_layers, num_filters):
    ref_disc = _load_ref_module("discriminator")
    torch.manual_seed(0)
    td = ref_disc.DiscriminatorN_IN(
        input_channels=3, num_filters=num_filters, n_layers=n_layers,
        use_noise=False, norm_layer="instance_norm", use_bias=True,
    ).eval()
    params = discriminator_params_from_torch(td.state_dict(), n_layers=n_layers)
    jd = DiscriminatorN_IN(
        input_channels=3, num_filters=num_filters, n_layers=n_layers,
        use_noise=False, norm_layer="instance_norm", use_bias=True,
    )
    x = torch.randn(2, 3, 80, 80)
    with torch.no_grad():
        y_ref, second = td(x)
    assert second is None  # reference returns (map, None), discriminator.py:150
    y_jax = jd.apply({"params": params}, jnp.asarray(_to_nhwc(x)))
    np.testing.assert_allclose(
        np.asarray(y_jax), _to_nhwc(y_ref), atol=2e-4, rtol=1e-3
    )


def test_vgg_feature_parity_against_torch_prefix():
    """Feature extraction semantics vs a torch-built VGG19 prefix.

    torchvision itself is unavailable in this image, so the torch side is the
    same architecture prefix (conv3-64, relu, conv64-64, relu, pool, conv64-128
    = vgg19.features[0:6]) built in the test with random weights.
    """
    torch.manual_seed(0)
    prefix = torch.nn.Sequential(
        torch.nn.Conv2d(3, 64, 3, 1, 1),
        torch.nn.ReLU(),
        torch.nn.Conv2d(64, 64, 3, 1, 1),
        torch.nn.ReLU(),
        torch.nn.MaxPool2d(2, 2),
        torch.nn.Conv2d(64, 128, 3, 1, 1),
    ).eval()

    feature_layers = [0, 3, 5]
    x = torch.randn(2, 3, 80, 80)
    feats = []
    cur = x
    with torch.no_grad():
        for i, layer in enumerate(prefix):
            cur = layer(cur)
            if i in feature_layers:
                feats.append(cur.reshape(cur.size(0), -1))
    ref_feats = torch.cat(feats, dim=1).numpy()

    sd = {f"model.features.{i}.weight": m.weight for i, m in enumerate(prefix)
          if isinstance(m, torch.nn.Conv2d)}
    sd.update({f"model.features.{i}.bias": m.bias for i, m in enumerate(prefix)
               if isinstance(m, torch.nn.Conv2d)})
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    params = vgg_params_from_torch(sd, max_index=5)

    jv = PerceptualVGG19(feature_layers=tuple(feature_layers),
                         use_normalization=False)
    from patch_toon_tpu.models.perception import flatten_features

    y = flatten_features(jv.apply({"params": params}, jnp.asarray(_to_nhwc(x))))
    np.testing.assert_allclose(np.asarray(y), ref_feats, atol=2e-4, rtol=1e-3)


def test_vgg_normalization_path():
    jv = PerceptualVGG19(feature_layers=(0,), use_normalization=True)
    v = jv.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    a = jv.apply(v, jnp.zeros((1, 16, 16, 3)))[0]
    b = jv.apply(v, jnp.ones((1, 16, 16, 3)))[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_generator_32_fast_mode_close_to_fp32():
    """precision "32_fast" (tf32-style 3-pass bf16 convs, lax.Precision.HIGH)
    must stay within ~1e-5 of the fp32-parity generator. On CPU HIGH runs
    native fp32, so this validates the plumbing and that the mode is
    value-safe; the ~2x TPU throughput claim is measured in
    tools/profile_convs.py."""
    gen32 = GeneratorJ(input_channels=6, use_bias=True, tanh=True,
                       append_smoothers=True, resnet_blocks=7,
                       filters=(32, 64, 128, 128, 128, 64))
    genf = gen32.clone(conv_precision="high")
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 80, 80, 6)), jnp.float32)
    variables = gen32.init(jax.random.PRNGKey(0), x, train=True)
    a = gen32.apply(variables, x, train=False)
    b = genf.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)


def test_32_fast_precision_resolution():
    from patch_toon_tpu.train.model import (_resolve_conv_precision,
                                            _resolve_dtype)

    assert _resolve_dtype("32_fast") is None          # fp32 tensors
    assert _resolve_conv_precision("32_fast") == "high"
    assert _resolve_conv_precision(32) is None
    assert _resolve_conv_precision("bf16") is None
