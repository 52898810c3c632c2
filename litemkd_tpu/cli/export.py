"""Export an orbax checkpoint to a reference-format torch .pt file.

    # student (backbone + classifier) → model_select.load_student layout
    python -m litemkd_tpu.cli.export --ckpt ckpts/run1 --out student.pt

    # teacher head → load_teacher layout (bracnch.transformers.0.*)
    python -m litemkd_tpu.cli.export --ckpt ckpts/run1 --out teacher.pt --teacher

    # MFM fusion teacher → ThreeTRXShiftLoopTime layout (runs in the reference)
    python -m litemkd_tpu.cli.export --ckpt ckpts/mfm --out mfm.pt --mfm
"""
from __future__ import annotations

import argparse

import numpy as np

from .common import add_common_args, build_config


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
    args = p.parse_args(argv)
    cfg = build_config(args)

    from ..train.checkpoint import restore_payload
    from ..tools.torch_export import (export_student_checkpoint,
                                      export_teacher_checkpoint,
                                      export_mfm_checkpoint)
    payload = restore_payload(args.ckpt)
    it = int(np.asarray(payload.get("step", 0)))
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
