#!/usr/bin/env python
"""Does temporal.flow_batch > 1 EVER win end-to-end on the real tunnel?

VERDICT r4 weak #5: the flow_batch opt-in is justified as "for transports
where per-dispatch latency dominates" — a hypothesis never measured on any
transport. The axon tunnel is the highest-dispatch-latency transport this
project will ever see, so this is the experiment that either backs the
knob's rationale with a number or retires it.

Method: the ENGINE'S OWN single-stream temporal serving loop
(``_process_directory_temporal`` — the same harness bench.py's temporal
arm drives, stubbed file IO, synthetic 512x910 frames, device flow source)
at flow_batch in {1, 2, 4, 8}, at flow_scale 1 (flow cost and dispatch
count are largest there, so a dispatch-latency win has the most room to
show). Reports per arm:

- streaming fps (wall, upload-inclusive: load_one device_puts the frame
  inside the timed loop; best of 3 windows — transport rides on top), and
- compute-only fps (dispatch-difference over ``_chain_step`` + the
  ``_temporal_flow_window`` lookahead, median — the stable metric).

Writes docs/perf/flow_batch_e2e_r5.json.
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
    import jax.numpy as jnp

    from patch_toon_tpu.config import compose
    from patch_toon_tpu.infer.engine import StyleTransferInference
    from patch_toon_tpu.infer.temporal import _temporal_flow_window
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

    tmp = Path(tempfile.mkdtemp(prefix="flow_batch_e2e_"))
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

    def make_engine(flow_batch):
        cfg = compose(REPO / "config", "inference", overrides=[
            f"paths.checkpoint={tmp}/ckpt/last",
            f"paths.input_dir={tmp}",
            f"paths.mask_dir={tmp}/ignore",
            f"paths.output_dir={tmp}/out",
            "paths.additional_channels={}",
            f"data.patch_size={ps}",
            "+inference.temporal.enabled=true",
            "+inference.temporal.flow_source=device",
            "+inference.temporal.depth=3",
            f"+inference.temporal.flow_batch={flow_batch}",
        ])
        return StyleTransferInference(cfg)

    class _Writer:
        def submit(self, *a):
            pass

        def flush(self):
            return 0

        def close(self):
            pass

    def run_stream(e, n):
        files = [tmp / f"f{i:04d}.png" for i in range(n)]

        def load_one(p):
            i = int(p.stem[1:])
            return (jax.device_put(host_u8[i % 3]), None, host_u8[i % 3],
                    None, boxes, None)

        e._temporal_prev = None
        e._temporal_prev_gray = None
        t0 = time.perf_counter()
        e._process_directory_temporal(files, load_one, tmp / "out",
                                      _Writer(), mask_dir=None,
                                      progress=False)
        return n / (time.perf_counter() - t0)

    out = {"h": h, "w": w, "frames": frames, "flow_scale": 1,
           "device": str(jax.devices()[0])}
    for fb in (1, 2, 4, 8):
        eng = make_engine(fb)
        run_stream(eng, 4)  # compile + warm
        run_stream(eng, 4)
        fps = max(run_stream(eng, frames) for _ in range(3))
        out[f"streaming_fps_fb{fb}"] = round(fps, 2)

        fdevs = [jax.device_put(f) for f in host_u8]
        K = eng.temporal_flow_batch

        def chain_compute(n):
            carry = (None, None)
            fcache = {}
            t0 = time.perf_counter()
            u8 = None
            for i in range(n):
                fdev = fdevs[i % 3]
                hit = fcache.pop(i, None)
                if hit is None and K > 1 and carry[1] is not None:
                    js = list(range(i, min(i + K, n)))
                    flows, grays = _temporal_flow_window(
                        jnp.stack([fdevs[j % 3] for j in js]), carry[1],
                        None, eng.temporal_flow_scale)
                    for t, j in enumerate(js):
                        fcache[j] = (flows[t], grays[t])
                    hit = fcache.pop(i)
                u8, _, carry = eng._chain_step(fdev, None, boxes, carry,
                                               flow_hit=hit)
            np.asarray(u8[0, 0, 0])
            return time.perf_counter() - t0

        chain_compute(4)
        n = 8
        cfps = float(np.median(
            [n / max(chain_compute(2 * n) - chain_compute(n), 1e-9)
             for _ in range(3)]))
        out[f"compute_fps_fb{fb}"] = round(cfps, 2)
        print(f"flow_batch={fb}: streaming {out[f'streaming_fps_fb{fb}']} "
              f"fps, compute-only {out[f'compute_fps_fb{fb}']} fps",
              flush=True)

    path = REPO / "docs/perf/flow_batch_e2e_r5.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
