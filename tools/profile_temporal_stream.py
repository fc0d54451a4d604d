#!/usr/bin/env python
"""Where does the temporal STREAMING loop lose to its transport cap?

Round-5 validation (docs/perf/temporal_arms_r5.json): streaming 10.4 fps
(96 ms/frame) vs compute-only 20.3 fps (49 ms) and a matched bidir cap of
14.6 fps (68.5 ms) — ratio 0.71. If the loop pipelined perfectly,
streaming ~= max(compute, wire). This tool isolates the phases by running
the ENGINE'S OWN serving loop (`_process_directory_temporal`, stubbed IO
— the bench harness) in four arms:

  full          : as shipped (upload in the loader thread, band fetches)
  no_fetch      : the blocking np.asarray fetch skipped (the async
                  copy_to_host_async still fires, so the wire still
                  carries the bytes — this arm isolates the BLOCKING
                  wait, not the bandwidth)
  no_upload     : loader returns device-resident frames (pre-uploaded)
                  -> fetch + dispatch + compute pipeline only
  neither       : both stubs -> pure dispatch+compute through the loop
                  (should approach compute-only's 49 ms)

full - neither = the wire's un-overlapped share; comparing no_fetch/
no_upload says which direction fails to overlap. Writes
docs/perf/temporal_stream_r5.json.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import jax

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer.engine import StyleTransferInference
    from patch_toon_tpu.infer import temporal as T
    from patch_toon_tpu.infer.tiling import tile_boxes_from_mask
    from patch_toon_tpu.train.checkpoints import CheckpointManager
    from patch_toon_tpu.train.model import StyleTransferModel

    frames = 16
    h, w, ps = 512, 910, 80
    rng = np.random.default_rng(0)
    host_u8 = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
               for _ in range(3)]
    ones = np.ones((h, w), np.float32)
    boxes = tile_boxes_from_mask(ones, ps, 30.0)

    tmp = Path(tempfile.mkdtemp(prefix="tstream_"))
    (tmp / "out").mkdir()
    g_args = dict(input_channels=6, use_bias=True, tanh=True,
                  append_smoothers=True, resnet_blocks=7,
                  filters=[32, 64, 128, 128, 128, 64],
                  norm_layer="instance_norm")
    model = StyleTransferModel(
        generator_config={"type": "GeneratorJ", "args": dict(g_args)},
        discriminator_config=None,
        training_config=dict(batch_size=4, precision="bf16"),
        optimizer_config=dict(
            generator=dict(lr=4e-4, betas=[0.9, 0.999], weight_decay=1e-5)),
        data_config=dict(patch_size=ps, additional_channels={}),
        perception_loss_config=None)
    state = model.init_state(jax.random.PRNGKey(0), patch_size=ps)
    CheckpointManager(
        tmp / "ckpt", meta={"input_channels": 6, "generator_args": g_args,
                            "patch_size": ps}).save(state, epoch=0,
                                                    score=1.0)

    cfg = compose(REPO / "config", "inference", overrides=[
        f"paths.checkpoint={tmp}/ckpt/last",
        f"paths.input_dir={tmp}", f"paths.mask_dir={tmp}/ignore",
        f"paths.output_dir={tmp}/out", "paths.additional_channels={}",
        f"data.patch_size={ps}",
        "+inference.temporal.enabled=true",
        "+inference.temporal.flow_source=device",
        "+inference.temporal.depth=3",
    ])
    eng = StyleTransferInference(cfg)

    class _Writer:
        def submit(self, *a):
            pass

        def flush(self):
            return 0

        def close(self):
            pass

    dev_frames = [jax.device_put(f) for f in host_u8]
    jax.block_until_ready(dev_frames)

    def run(n: int, upload: bool, fetch: bool) -> float:
        files = [tmp / f"f{i:04d}.png" for i in range(n)]

        def load_one(p):
            i = int(p.stem[1:])
            f = (jax.device_put(host_u8[i % 3]) if upload
                 else dev_frames[i % 3])
            return (f, None, host_u8[i % 3], None, boxes, None)

        orig_asarray = np.asarray
        eng._temporal_prev = None
        eng._temporal_prev_gray = None
        if not fetch:
            # stub the band fetch: the loop submits
            # ``fetch_pool.submit(np.asarray, band)`` — swap np.asarray
            # (shared module object, restored in finally) for a shim that
            # skips the D2H on jax arrays only
            import jax as _jax

            def sel_asarray(x, *a, **k):
                if isinstance(x, _jax.Array):
                    return np.zeros((1,), np.uint8)
                return orig_asarray(x, *a, **k)
            T.np.asarray = sel_asarray
        try:
            t0 = time.perf_counter()
            eng._process_directory_temporal(files, load_one, tmp / "out",
                                            _Writer(), mask_dir=None,
                                            progress=False)
            dt = time.perf_counter() - t0
        finally:
            T.np.asarray = orig_asarray
        return n / dt

    out = {"h": h, "w": w, "frames": frames,
           "device": str(jax.devices()[0])}
    for name, upload, fetch in (("full", True, True),
                                ("no_fetch", True, False),
                                ("no_upload", False, True),
                                ("neither", False, False)):
        run(4, upload, fetch)  # compile + warm
        fps = max(run(frames, upload, fetch) for _ in range(3))
        out[f"{name}_fps"] = round(fps, 2)
        out[f"{name}_ms"] = round(1e3 / fps, 1)
        print(f"{name:10s} {fps:6.2f} fps  {1e3 / fps:6.1f} ms/frame",
              flush=True)

    path = REPO / "docs/perf/temporal_stream_r5.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
