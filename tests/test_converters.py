"""Converter tools: torch .ckpt -> orbax, and VGG19 weights -> .npz."""

import pathlib
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO))

REF_MODELS = pathlib.Path("/root/reference/src/models")


def test_convert_checkpoint_roundtrip(tmp_path, monkeypatch):
    """tools/convert_checkpoint.py: a reference .ckpt becomes an orbax dir
    that the inference loader restores to the same parameters."""
    if not REF_MODELS.exists():
        pytest.skip("reference repo not available")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_gen", REF_MODELS / "generator.py")
    ref_gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_gen)

    torch.manual_seed(3)
    tg = ref_gen.GeneratorJ(
        input_channels=6, use_bias=True, tanh=True, append_smoothers=True,
        resnet_blocks=2, filters=[32, 64, 128, 128, 128, 64],
        norm_layer="instance_norm").eval()
    ckpt = tmp_path / "ref.ckpt"
    torch.save({"state_dict": {
        f"generator.{k}": v for k, v in tg.state_dict().items()}}, ckpt)

    out = tmp_path / "orbax" / "last"
    import convert_checkpoint

    monkeypatch.setattr(sys, "argv", [
        "convert_checkpoint.py", str(ckpt), str(out),
        "--resnet-blocks", "2", "--patch-size", "32"])
    convert_checkpoint.main()

    from patch_toon_tpu.train.checkpoints import (
        restore_generator,
        sniff_input_channels,
    )
    from patch_toon_tpu.utils.torch_compat import generator_params_from_torch

    assert sniff_input_channels(str(out)) == 6
    g_params, g_stats = restore_generator(str(out))
    want, want_stats = generator_params_from_torch(
        tg.state_dict(), resnet_blocks=2)
    flat_want = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree.map(jnp.asarray, want)))
    for path, got in jax.tree_util.tree_leaves_with_path(g_params):
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(flat_want[path]),
            err_msg=jax.tree_util.keystr(path))
    np.testing.assert_array_equal(
        np.asarray(g_stats["smoother_bn"]["mean"]),
        want_stats["smoother_bn"]["mean"])


def test_convert_vgg_state_dict_roundtrip(tmp_path):
    """tools/convert_vgg.py: a torchvision-style state dict converts to the
    .npz that init_vgg_params loads, bit-exact."""
    import convert_vgg

    torch.manual_seed(4)
    sd = {}
    for idx, (cin, cout) in zip((0, 2, 5), ((3, 64), (64, 64), (64, 128))):
        sd[f"model.features.{idx}.weight"] = torch.randn(cout, cin, 3, 3)
        sd[f"model.features.{idx}.bias"] = torch.randn(cout)
    sd["classifier.0.weight"] = torch.randn(8, 8)  # must be ignored
    npz = tmp_path / "vgg.npz"
    convert_vgg.convert_state_dict(sd, str(npz), max_index=5)

    loaded = np.load(npz)
    assert sorted(loaded.files) == [
        "features.0.bias", "features.0.weight", "features.2.bias",
        "features.2.weight", "features.5.bias", "features.5.weight"]

    from patch_toon_tpu.models.perception import init_vgg_params

    vgg = init_vgg_params([0, 3, 5], weights_path=str(npz))
    k0 = np.asarray(vgg["params"]["features_0"]["kernel"])  # HWIO
    np.testing.assert_array_equal(
        k0, np.transpose(sd["model.features.0.weight"].numpy(), (2, 3, 1, 0)))
    b5 = np.asarray(vgg["params"]["features_5"]["bias"])
    np.testing.assert_array_equal(b5, sd["model.features.5.bias"].numpy())
