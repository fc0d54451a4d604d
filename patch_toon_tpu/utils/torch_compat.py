"""Torch state-dict <-> flax params conversion.

Lets users of the reference framework bring their trained ``.ckpt``
checkpoints straight into this TPU build (reference checkpoint layout:
lightning_model.py:11 ``StyleTransferModel`` state dict with ``generator.*``,
``discriminator.*``, ``perception_loss_model.*`` prefixes), and powers the
golden-parity tests against /root/reference/src/models.

Weight layout mapping: torch convs are OIHW, flax convs are HWIO.
Torch module-name anatomy (see reference src/models/generator.py:91-147 and
src/models/discriminator.py:42-93):

==========================  ==============================
torch name                  flax path (this build)
==========================  ==============================
initial_conv.0              params/initial_conv/conv
downsample{1,2}.0           params/downsample{1,2}/conv
resnet_blocks.{i}.block.1   params/resnet_{i}/conv1
resnet_blocks.{i}.block.4   params/resnet_{i}/conv2   (index 3 when no norm)
upsample{1,2}.1             params/upsample{1,2}/conv
conv11.0                    params/conv11
smoothers.0                 params/smoother_conv1
smoothers.2 (BatchNorm)     params/smoother_bn + batch_stats/smoother_bn
smoothers.3                 params/smoother_conv2
output.0                    params/output
initial.0                   params/initial/conv        (discriminator)
intermediate.{i}.0          params/intermediate_{i}/conv
pre_output.0                params/pre_output/conv
output.0                    params/output              (discriminator head)
==========================  ==============================
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(t: Any) -> np.ndarray:
    """Copy a torch tensor / array-like into an owned numpy array.

    Must copy: ``np.asarray(torch_tensor)`` aliases the tensor's storage, so a
    later in-place optimizer step would silently mutate converted params.
    """
    return np.array(t, copy=True)


def _k(w: np.ndarray) -> np.ndarray:
    """Torch OIHW conv weight -> flax HWIO kernel."""
    return np.ascontiguousarray(np.transpose(_np(w), (2, 3, 1, 0)))


def _conv(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _k(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def generator_params_from_torch(
    sd: Mapping[str, Any],
    resnet_blocks: int = 7,
    norm_layer: str = "instance_norm",
    append_smoothers: bool = True,
    prefix: str = "",
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torch GeneratorJ state dict to (params, batch_stats)."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    conv2_idx = 4 if norm_layer in ("instance_norm", "batch_norm") else 3
    params: Dict[str, Any] = {
        "initial_conv": {"conv": _conv(sd, "initial_conv.0")},
        "downsample1": {"conv": _conv(sd, "downsample1.0")},
        "downsample2": {"conv": _conv(sd, "downsample2.0")},
        "upsample2": {"conv": _conv(sd, "upsample2.1")},
        "upsample1": {"conv": _conv(sd, "upsample1.1")},
        "conv11": _conv(sd, "conv11.0"),
        "output": _conv(sd, "output.0"),
    }
    for i in range(resnet_blocks):
        params[f"resnet_{i}"] = {
            "conv1": _conv(sd, f"resnet_blocks.{i}.block.1"),
            "conv2": _conv(sd, f"resnet_blocks.{i}.block.{conv2_idx}"),
        }
    batch_stats: Dict[str, Any] = {}
    if append_smoothers:
        params["smoother_conv1"] = _conv(sd, "smoothers.0")
        params["smoother_conv2"] = _conv(sd, "smoothers.3")
        params["smoother_bn"] = {
            "scale": _np(sd["smoothers.2.weight"]),
            "bias": _np(sd["smoothers.2.bias"]),
        }
        batch_stats["smoother_bn"] = {
            "mean": _np(sd["smoothers.2.running_mean"]),
            "var": _np(sd["smoothers.2.running_var"]),
        }
    return params, batch_stats


def discriminator_params_from_torch(
    sd: Mapping[str, Any],
    n_layers: int = 3,
    prefix: str = "",
) -> Dict[str, Any]:
    """Convert a torch DiscriminatorN_IN state dict to flax params."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict[str, Any] = {
        "initial": {"conv": _conv(sd, "initial.0")},
        "pre_output": {"conv": _conv(sd, "pre_output.0")},
        "output": _conv(sd, "output.0"),
    }
    for i in range(n_layers - 1):
        params[f"intermediate_{i}"] = {"conv": _conv(sd, f"intermediate.{i}.0")}
    return params


def vgg_params_from_torch(
    sd: Mapping[str, Any],
    max_index: int,
    prefix: str = "model.features.",
) -> Dict[str, Any]:
    """Convert torchvision vgg19.features state dict prefix to flax params."""
    params: Dict[str, Any] = {}
    for idx in range(max_index + 1):
        wkey = f"{prefix}{idx}.weight"
        if wkey in sd:
            params[f"features_{idx}"] = {
                "kernel": _k(sd[wkey]),
                "bias": _np(sd[f"{prefix}{idx}.bias"]),
            }
    return params


def generator_input_channels_from_torch(sd: Mapping[str, Any],
                                        prefix: str = "generator.") -> int:
    """Channel sniff, mirroring reference generator.py:118-119."""
    w = sd[f"{prefix}initial_conv.0.weight"]
    return int(np.asarray(w).shape[1])


# ---- inverse direction: flax params -> reference torch state dict --------
#
# Completes the interop round trip: checkpoints trained on TPU by this build
# export to the reference's lightning checkpoint layout
# (``{"state_dict": {...}}``, key anatomy above, loaded by the reference at
# generator.py:115-180 with ``strict=True``). All values are numpy; the CLI
# (tools/export_checkpoint.py) wraps them in torch tensors.


def _ik(k: np.ndarray) -> np.ndarray:
    """Flax HWIO conv kernel -> torch OIHW weight."""
    return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def _conv_to(out: Dict[str, np.ndarray], name: str,
             p: Mapping[str, Any]) -> None:
    out[f"{name}.weight"] = _ik(p["kernel"])
    if "bias" in p:
        out[f"{name}.bias"] = np.asarray(p["bias"])


def generator_params_to_torch(
    params: Mapping[str, Any],
    batch_stats: Mapping[str, Any],
    resnet_blocks: int = 7,
    norm_layer: str = "instance_norm",
    append_smoothers: bool = True,
    num_batches_tracked: int = 0,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`generator_params_from_torch` (exact round trip).

    ``num_batches_tracked`` seeds the BatchNorm counter torch tracks
    (reference advances it twice per train step; it only affects behavior
    under ``momentum=None``, which the reference never uses).
    """
    conv2_idx = 4 if norm_layer in ("instance_norm", "batch_norm") else 3
    out: Dict[str, np.ndarray] = {}
    _conv_to(out, "initial_conv.0", params["initial_conv"]["conv"])
    _conv_to(out, "downsample1.0", params["downsample1"]["conv"])
    _conv_to(out, "downsample2.0", params["downsample2"]["conv"])
    for i in range(resnet_blocks):
        _conv_to(out, f"resnet_blocks.{i}.block.1", params[f"resnet_{i}"]["conv1"])
        _conv_to(out, f"resnet_blocks.{i}.block.{conv2_idx}",
                 params[f"resnet_{i}"]["conv2"])
    _conv_to(out, "upsample2.1", params["upsample2"]["conv"])
    _conv_to(out, "upsample1.1", params["upsample1"]["conv"])
    _conv_to(out, "conv11.0", params["conv11"])
    if append_smoothers:
        _conv_to(out, "smoothers.0", params["smoother_conv1"])
        out["smoothers.2.weight"] = np.asarray(params["smoother_bn"]["scale"])
        out["smoothers.2.bias"] = np.asarray(params["smoother_bn"]["bias"])
        out["smoothers.2.running_mean"] = np.asarray(
            batch_stats["smoother_bn"]["mean"])
        out["smoothers.2.running_var"] = np.asarray(
            batch_stats["smoother_bn"]["var"])
        out["smoothers.2.num_batches_tracked"] = np.asarray(
            num_batches_tracked, np.int64)
        _conv_to(out, "smoothers.3", params["smoother_conv2"])
    _conv_to(out, "output.0", params["output"])
    return out


def discriminator_params_to_torch(
    params: Mapping[str, Any],
    n_layers: int = 3,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`discriminator_params_from_torch`."""
    out: Dict[str, np.ndarray] = {}
    _conv_to(out, "initial.0", params["initial"]["conv"])
    for i in range(n_layers - 1):
        _conv_to(out, f"intermediate.{i}.0", params[f"intermediate_{i}"]["conv"])
    _conv_to(out, "pre_output.0", params["pre_output"]["conv"])
    _conv_to(out, "output.0", params["output"])
    return out


def vgg_params_to_torch(
    params: Mapping[str, Any],
    prefix: str = "model.features.",
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`vgg_params_from_torch` (only the layers present)."""
    out: Dict[str, np.ndarray] = {}
    for name, p in params.items():
        idx = int(name.split("_")[1])
        out[f"{prefix}{idx}.weight"] = _ik(p["kernel"])
        out[f"{prefix}{idx}.bias"] = np.asarray(p["bias"])
    return out
