#!/usr/bin/env python
"""Whole-video tiled inference — same CLI surface as the reference
``generator.py`` (reference generator.py:707-719).

Usage:
    python generator.py [key=value overrides ...]
e.g.
    python generator.py paths.checkpoint=outputs/.../checkpoints/last \
        paths.input_dir=video/input paths.output_dir=video/stylized

Accepts both this build's orbax checkpoint directories and reference
torch ``.ckpt`` files (channel count sniffed from the checkpoint either way,
reference generator.py:115-129).
"""

from __future__ import annotations

import sys
from pathlib import Path


def main(argv=None) -> None:
    from patch_toon_tpu.config import compose

    argv = sys.argv[1:] if argv is None else argv
    config_dir = Path(__file__).resolve().parent / "config"
    cfg = compose(config_dir, "inference", overrides=argv)

    import jax

    from patch_toon_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if not bool(cfg.inference.get("use_gpu", True)):
        jax.config.update("jax_platforms", "cpu")

    # Multi-host pod streaming (parallel.dcn.enabled=true, one process per
    # host): join the jax.distributed cluster before any device query. Each
    # worker then stylizes its round-robin share of the frames on its own
    # local chips — per-frame stylization is stateless, so the hosts never
    # communicate (see infer.engine.process_directory).
    dcn_cfg = cfg.get("parallel", {}).get("dcn", {}) or {}
    if bool(dcn_cfg.get("enabled", False)):
        from patch_toon_tpu.parallel import initialize_distributed

        initialize_distributed(
            coordinator_address=dcn_cfg.get("coordinator_address"),
            num_processes=dcn_cfg.get("num_processes"),
            process_id=dcn_cfg.get("process_id"),
        )

    from patch_toon_tpu.infer import StyleTransferInference

    try:
        inferencer = StyleTransferInference(cfg)
        if bool((cfg.inference.get("watch") or {}).get("enabled", False)):
            # long-running service: SIGTERM (systemd/k8s stop) must take
            # the same graceful path as Ctrl-C — the watch loops flush
            # pending readbacks and the writer queue before returning
            import signal

            def _sigterm(signum, frame):
                raise KeyboardInterrupt

            try:
                signal.signal(signal.SIGTERM, _sigterm)
            except ValueError:
                pass  # non-main thread (embedded use): Ctrl-C only
            inferencer.watch_directory()
        else:
            inferencer.process_directory()
        print("Inference completed successfully!")
    except Exception as e:
        print(f"Error during inference: {e}")
        raise


if __name__ == "__main__":
    main()
