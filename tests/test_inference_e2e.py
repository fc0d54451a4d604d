"""End-to-end inference bit-parity on a real 540x960 frame.

The oracle (tools/torch_oracle.py) is a straight-line torch reimplementation
of the reference's whole inference path (generator.py:327-351 mask erosion,
:353-398 patch positions, :427-565 per-tile loop with Gaussian blending,
:643-652 uint8 conversion), running the reference's own torch GeneratorJ
(loaded read-only from /root/reference, never copied). This build's side goes
through the REAL engine surface: a torch-format .ckpt on disk ->
StyleTransferInference (tiled mode, fp32) -> the output PNG. Final uint8
frames must differ by at most 1 count (fp32 roundoff only).
"""

import pathlib
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from PIL import Image  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO))

SCENE = pathlib.Path("/root/reference/test_dataset/PlatinumChan_x0.5_train")


def test_tiled_mode_bit_parity_on_real_frame(tmp_path):
    if not SCENE.exists():
        pytest.skip("reference test_dataset not available")
    import torch_oracle

    # reference generator with deterministic random weights, RGB-only
    torch.manual_seed(7)
    tgen = torch_oracle.load_reference_module("generator").GeneratorJ(
        input_channels=3, use_bias=True, tanh=True, append_smoothers=True,
        resnet_blocks=7, filters=[32, 64, 128, 128, 128, 64],
        norm_layer="instance_norm",
    ).eval()

    # save it in the reference lightning .ckpt layout -> exercises the
    # build's torch-checkpoint interop end to end
    ckpt = tmp_path / "ref_style.ckpt"
    torch.save({"state_dict": {
        f"generator.{k}": v for k, v in tgen.state_dict().items()}}, ckpt)

    # one real 540x960 keyframe + its real (irregular) mask
    scene = tmp_path / "scene"
    (scene / "input").mkdir(parents=True)
    (scene / "mask").mkdir()
    Image.open(SCENE / "input" / "001.png").convert("RGB").save(
        scene / "input" / "001.png")
    Image.open(SCENE / "mask" / "001.jpg").convert("L").save(
        scene / "mask" / "001.png")

    # --- this build: the real engine surface, tiled fp32 ---------------
    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer.engine import StyleTransferInference

    cfg = compose(REPO / "config", "inference", overrides=[
        f"paths.checkpoint={ckpt}",
        f"paths.input_dir={scene / 'input'}",
        f"paths.mask_dir={scene / 'mask'}",
        f"paths.output_dir={tmp_path / 'out'}",
        "paths.additional_channels=null",
        "inference.use_gpu=false",
        "inference.mode=tiled",
        "inference.precision=32",
        "data.patch_size=80",
    ])
    StyleTransferInference(cfg).process_directory()
    got = np.asarray(Image.open(tmp_path / "out" / "001.png")).astype(int)

    # --- torch oracle ----------------------------------------------------
    frame11 = np.asarray(
        Image.open(scene / "input" / "001.png").convert("RGB"),
        np.float32) / 255.0 * 2.0 - 1.0   # ToTensor + Normalize(.5,.5)
    eroded = torch_oracle.eroded_mask(Image.open(scene / "mask" / "001.png"))
    want = torch_oracle.stylize_frame(tgen, frame11, eroded,
                                      patch_size=80).astype(int)

    assert got.shape == want.shape
    diff = np.abs(got - want)
    # fp32 roundoff across frameworks can flip a rounding decision by 1
    assert diff.max() <= 1, (
        f"max uint8 diff {diff.max()} at "
        f"{np.unravel_index(diff.argmax(), diff.shape)}; "
        f"mean {diff.mean():.4f}")
    assert (diff > 0).mean() < 0.05  # and only on a small fraction of pixels
