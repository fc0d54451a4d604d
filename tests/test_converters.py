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


def test_export_checkpoint_reference_strict_load(tmp_path):
    """tools/export_checkpoint.py: an orbax checkpoint trained by this build
    exports to a .ckpt the REFERENCE's torch modules load with strict=True
    and reproduce forward-for-forward (the interop round trip's other
    direction; reference load site generator.py:115-180)."""
    if not REF_MODELS.exists():
        pytest.skip("reference repo not available")
    import importlib.util

    from patch_toon_tpu.train.checkpoints import CheckpointManager
    from patch_toon_tpu.train.model import StyleTransferModel

    gen_args = dict(use_bias=True, tanh=True, append_smoothers=True,
                    resnet_blocks=2, filters=[8, 16, 32, 32, 32, 16],
                    norm_layer="instance_norm", input_size=256,
                    input_channels=6)
    disc_args = dict(num_filters=8, n_layers=2, use_noise=False,
                     norm_layer="instance_norm", use_bias=True,
                     input_channels=3)
    model = StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(gen_args)},
        discriminator_config={"type": "DiscriminatorN_IN",
                              "args": dict(disc_args)},
        training_config=dict(
            batch_size=4, reconstruction_weight=4.0, adversarial_weight=0.5,
            use_image_loss=True, reconstruction_criterion="L1Loss",
            adversarial_criterion="MSELoss", use_gradient_clipping=True,
            gradient_clip_val=0.5, precision=32),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5),
            discriminator=dict(lr=4e-4, betas=[0.9, 0.999],
                               weight_decay=1e-5)),
        data_config=dict(patch_size=32, additional_channels={}),
        perception_loss_config=None,
    )
    state = model.init_state(jax.random.PRNGKey(11), patch_size=32)
    mgr = CheckpointManager(str(tmp_path / "ckpts"),
                            meta={"generator_args": gen_args,
                                  "discriminator_args": disc_args,
                                  "input_channels": 6, "epoch": 4})
    mgr.save(state, epoch=4, score=0.5)

    sys.path.insert(0, str(REPO / "tools"))
    from export_checkpoint import export_checkpoint

    out = tmp_path / "export.ckpt"
    export_checkpoint(str(tmp_path / "ckpts" / "last"), str(out))
    ck = torch.load(out, map_location="cpu")
    assert ck["epoch"] == 4

    spec = importlib.util.spec_from_file_location(
        "ref_gen2", REF_MODELS / "generator.py")
    ref_gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_gen)
    spec = importlib.util.spec_from_file_location(
        "ref_disc2", REF_MODELS / "discriminator.py")
    ref_disc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_disc)

    tg = ref_gen.GeneratorJ(**gen_args).eval()
    tg.load_state_dict(
        {k[len("generator."):]: v for k, v in ck["state_dict"].items()
         if k.startswith("generator.")}, strict=True)
    td = ref_disc.DiscriminatorN_IN(**disc_args).eval()
    td.load_state_dict(
        {k[len("discriminator."):]: v for k, v in ck["state_dict"].items()
         if k.startswith("discriminator.")}, strict=True)

    # forward parity on the same input (fp32; conv precision HIGHEST)
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (2, 32, 32, 6)).astype(np.float32)
    ours = model.generator.apply(
        {"params": state.g_params, "batch_stats": state.g_batch_stats},
        jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = tg(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.asarray(ours), np.transpose(theirs.numpy(), (0, 2, 3, 1)),
        atol=2e-5)

    xd = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    ours_d = model.discriminator.apply(
        {"params": state.d_params}, jnp.asarray(xd), train=False)
    with torch.no_grad():
        theirs_d = td(torch.from_numpy(np.transpose(xd, (0, 3, 1, 2))))
    if isinstance(theirs_d, (tuple, list)):
        theirs_d = theirs_d[0]
    np.testing.assert_allclose(
        np.asarray(ours_d), np.transpose(theirs_d.numpy(), (0, 2, 3, 1)),
        atol=2e-5)


def test_export_full_reference_model_keys(tmp_path):
    """--full-reference-model emits the complete perception_loss_model
    subtree (torchvision vgg19 layout + mean/std buffers) so the
    reference's strict=True full-model load finds every key, with this
    build's deterministic training-time VGG features embedded."""
    from export_checkpoint import VGG19_FEATURE_CONVS, _vgg_filler

    sd = _vgg_filler(None)
    conv_keys = {k for k in sd if k.startswith("model.features.")}
    assert len(conv_keys) == 2 * len(VGG19_FEATURE_CONVS)
    assert sd["model.classifier.6.weight"].shape == (1000, 4096)
    assert sd["model.classifier.0.weight"].shape == (4096, 512 * 7 * 7)
    assert sd["mean"].shape == (1, 3, 1, 1)
    sd40 = _vgg_filler(40)
    assert sd40["model.classifier.0.weight"].shape == (4096, 512 * 8 * 8)
    assert sd40["model.classifier.6.weight"].shape == (40, 4096)
