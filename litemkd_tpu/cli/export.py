"""Export an orbax checkpoint to a reference-format torch .pt file.

    # student (backbone + classifier) → model_select.load_student layout
    python -m litemkd_tpu.cli.export --ckpt ckpts/run1 --out student.pt

    # teacher head → load_teacher layout (bracnch.transformers.0.*)
    python -m litemkd_tpu.cli.export --ckpt ckpts/run1 --out teacher.pt --teacher

    # MFM fusion teacher → ThreeTRXShiftLoopTime layout (runs in the reference)
    python -m litemkd_tpu.cli.export --ckpt ckpts/mfm --out mfm.pt --mfm

    # AOT serving artifact (StableHLO + weights + manifest in one file; a
    # serving host runs it with jax alone — no model code)
    python -m litemkd_tpu.cli.export --ckpt ckpts/run1 --out model.litemkd \
        --aot [--aot_platforms tpu,cpu] [--aot_episodes 1] [--aot_check]

    # AOT fused-feature extractor (the MFM teacher's extract_feature
    # production path as a standalone servable)
    python -m litemkd_tpu.cli.export --ckpt ckpts/mfm --out extract.litemkd \
        --aot --mfm [--aot_batch 8] [--aot_check]
"""
from __future__ import annotations

import argparse

import numpy as np

from .common import add_common_args, build_config, load_saved_config


def _check_platform(platforms) -> bool:
    """--aot_check runs the artifact on THIS host's backend; an artifact
    lowered for other platforms only (e.g. --aot_platforms cpu on a TPU box)
    would fail jax.export's platform guard, so skip with a note instead."""
    import jax
    here = jax.default_backend()
    if here in platforms:
        return True
    print(f"skipping --aot_check: artifact lowered for {list(platforms)}, "
          f"this host runs '{here}' (load it on a matching host to verify)")
    return False


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--teacher", action="store_true",
                   help="export the teacher-head layout instead of a student")
    p.add_argument("--mfm", action="store_true",
                   help="export an MFM fusion-teacher checkpoint to the "
                        "ThreeTRXShiftLoopTime layout")
    p.add_argument("--aot", action="store_true",
                   help="emit a jax.export AOT serving artifact instead of "
                        "a torch checkpoint")
    p.add_argument("--aot_platforms", default="tpu,cpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--aot_episodes", type=int, default=1,
                   help="episode batch size baked into the artifact")
    p.add_argument("--aot_batch", type=int, default=8,
                   help="video batch size for --aot --mfm extract artifacts")
    p.add_argument("--aot_check", action="store_true",
                   help="reload the artifact and score a synthetic episode "
                        "as a smoke test")
    args = p.parse_args(argv)
    # the run config saved next to the checkpoint is the base: exporting a
    # non-default-geometry run (e.g. --preset tiny) needs no re-specified flags
    cfg = build_config(args, base=load_saved_config(args.ckpt))
    # --aot lowers/compiles the full model (1-8 min on remote-compile TPU
    # setups); serve re-exports from the persistent cache like every other CLI
    from .common import enable_compilation_cache
    enable_compilation_cache()

    from ..train.checkpoint import restore_payload
    from ..tools.torch_export import (export_student_checkpoint,
                                      export_teacher_checkpoint,
                                      export_mfm_checkpoint)
    payload = restore_payload(args.ckpt)
    it = int(np.asarray(payload.get("step", 0)))
    if args.aot:
        from ..tools.aot import (export_serving_artifact,
                                 export_extract_artifact,
                                 load_serving_artifact)
        platforms = tuple(s.strip() for s in args.aot_platforms.split(",")
                          if s.strip())
        if args.mfm:
            variables = {"params": payload["params"]}
            manifest = export_extract_artifact(cfg, variables, args.out,
                                               platforms=platforms,
                                               batch=args.aot_batch)
            print(f"wrote AOT extract artifact → {args.out} "
                  f"(platforms={manifest['platforms']}, "
                  f"modalities={manifest['modalities']}, "
                  f"batch={manifest['batch']})")
            if args.aot_check and _check_platform(platforms):
                extractor, m = load_serving_artifact(args.out)
                rng = np.random.default_rng(0)
                feats = {mod: rng.standard_normal(sh).astype(np.float32)
                         for mod, sh in m["input_shapes"].items()}
                fused = np.asarray(extractor(feats))
                assert np.isfinite(fused).all()
                print(f"smoke check OK: fused {fused.shape}")
            return
        variables = {"params": payload["params"],
                     "batch_stats": payload.get("batch_stats", {})}
        manifest = export_serving_artifact(cfg, variables, args.out,
                                           platforms=platforms,
                                           episodes=args.aot_episodes)
        print(f"wrote AOT artifact → {args.out} "
              f"(platforms={manifest['platforms']}, "
              f"{manifest['way']}-way {manifest['shot']}-shot)")
        if args.aot_check and _check_platform(platforms):
            scorer, m = load_serving_artifact(args.out)
            rng = np.random.default_rng(0)
            sh = m["input_shapes"]
            logits = scorer(
                rng.integers(0, 255, sh["support_clips"], dtype=np.uint8),
                np.tile(np.arange(m["way"], dtype=np.int32),
                        (m["episodes"], m["shot"]))[:, :sh["support_labels"][1]],
                rng.integers(0, 255, sh["query_clips"], dtype=np.uint8))
            assert np.isfinite(np.asarray(logits)).all()
            print(f"smoke check OK: logits {np.asarray(logits).shape}")
        return
    if args.mfm:
        sd = export_mfm_checkpoint({"params": payload["params"]}, cfg,
                                   args.out, iteration=it)
    elif args.teacher:
        sd = export_teacher_checkpoint({"params": payload["params"]}, cfg,
                                       args.out, iteration=it)
    else:
        variables = {"params": payload["params"],
                     "batch_stats": payload.get("batch_stats", {})}
        sd = export_student_checkpoint(variables, cfg, args.out, iteration=it)
    print(f"wrote {len(sd)} tensors → {args.out}")


if __name__ == "__main__":
    main()
