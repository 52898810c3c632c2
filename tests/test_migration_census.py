"""Flag census: every CLI flag the reference exposes must be accounted for.

Mechanically collects ``add_argument("--<name>"`` from every live reference
entry point and asserts each name is either accepted verbatim by one of our
CLIs, mapped to a replacement flag that exists (and is documented in
MIGRATION.md), or explicitly n/a with a reason. A new/renamed reference flag
(or a dropped mapping on our side) fails this test instead of silently
falling out of the migration story.
"""
import os
import re

import pytest

REF = "/root/reference"
REPO = os.path.join(os.path.dirname(__file__), "..")

# live entry points only (multi_run.py is dead code — SURVEY §3.6)
REF_ENTRIES = [
    "options.py",
    "teacher/code/run.py",
    "teacher/code/multi_fusion.py",
    "teacher/code/score_fusion_run.py",
    "teacher/code/test_only.py",
    "teacher/code/extract_feature.py",
    "teacher/code/extract_multi_feature.py",
    "teacher/code/pretrain/pretrain.py",
    "teacher/code/splits/gen_fixed_split.py",
]

# reference flag → how it is covered here.
#   "same"            — a flag with the identical name exists in our CLIs
#   ("flag", "--x")   — replaced by --x (must exist in our CLI sources)
#   ("na", reason)    — deliberately not carried over
CENSUS = {
    "a": ("flag", "--score_weights"),
    "b": ("flag", "--score_weights"),
    "c": ("flag", "--score_weights"),   # TSF weights; -c checkpoint_dir is separate
    "base_model": ("flag", "--out"),    # dump-dir naming → explicit output path
    "cfg": ("flag", "--temperature"),   # dict-valued arg → explicit flags
    "checkpoint_dir": "same",
    "cross_view": "same",
    "dataset": "same",
    "debug": "same",
    "debug_loader": ("na", "parsed but unused in the reference "
                           "(multi_fusion.py:277-281, SURVEY §4)"),
    "demo": ("na", "mode flag -> dedicated entry point cli.demo"),
    "device": ("na", "CUDA placement -> device mesh (--mesh_data/--mesh_model)"),
    "distill_name": "same",
    "extract": ("na", "mode flag -> dedicated entry point cli.extract"),
    "feature_save_path": ("flag", "--out"),
    "fixed_test_eposide": ("flag", "--fixed_episode_file"),
    "fixed_view": "same",
    "flow_test_model_path": ("flag", "--branch_ckpt"),
    "getitem_name": ("flag", "--mode_extract"),  # AuxDataset getattr dispatch
    "hard_loss_weight": "same",
    "img_size": "same",
    "learning_rate": "same",
    "loss": ("flag", "--distill_name"),  # run.py LossBuilder names registered
    "lr_1": "same",
    "lr_2": "same",
    "m1": ("flag", "--modalities"),
    "m2": ("flag", "--modalities"),
    "m3": ("flag", "--modalities"),
    "m4": ("flag", "--modalities"),
    "m5": ("flag", "--modalities"),
    "method": ("na", "redundant with --model_backbone (options.py args_cheak)"),
    "modality": ("flag", "--rgb_path"),  # extract points at the modality tree
    "mode": "same",
    "model": ("flag", "--fusion"),       # teacher zoo class name -> preset
    "model_backbone": "same",
    "model_classifier": "same",
    "model_teacher": "same",
    "num_classes": ("na", "derived from the split index in cli.pretrain"),
    "num_gpus": ("na", "DataParallel count -> device mesh "
                       "(--mesh_data/--mesh_model)"),
    "num_test_tasks": "same",
    "num_workers": "same",
    "opt": "same",
    "path": "same",
    "print_freq": "same",
    "query_per_class": "same",
    "query_per_class_test": "same",
    "resume": ("flag", "--resume_from_checkpoint"),  # pretrain -r
    "resume_from_checkpoint": "same",
    "rgb_test_model_path": ("flag", "--branch_ckpt"),
    "save_freq": "same",
    "sch": "same",
    "scratch": ("flag", "--rgb_path"),   # hard-coded cluster path roots ->
                                         # explicit per-tree path flags
    "seq_len": "same",
    "shirt_num": "same",
    "shot": "same",
    "skeleton_test_model_path": ("flag", "--branch_ckpt"),
    "soft_loss_weight": "same",
    "split": "same",
    "tasks_per_batch": "same",
    "teacher_checkpoint": "same",
    "temp_set": "same",
    "test": ("na", "free-text experiment description, unused by the "
                   "reference's code (options.py:50)"),
    "test_iters": "same",
    "test_model": "same",
    "test_model_only": ("flag", "--test_only"),
    "test_model_path": "same",
    "training_iterations": "same",
    "traintestlist": "same",
    "trans_dropout": "same",
    "trans_linear_in_dim": "same",
    "trans_linear_out_dim": "same",
    "trans_num": "same",
    "view": "same",
    "way": "same",
}


def _reference_flags():
    pat = re.compile(r"add_argument\(\s*[\"']--([A-Za-z0-9_]+)")
    flags = set()
    for rel in REF_ENTRIES:
        with open(os.path.join(REF, rel)) as f:
            flags.update(pat.findall(f.read()))
    return flags


def _our_cli_flags():
    flags = set()
    pat = re.compile(r"[\"']--([A-Za-z0-9_]+)[\"']")
    cli_dir = os.path.join(REPO, "litemkd_tpu", "cli")
    for name in os.listdir(cli_dir):
        if name.endswith(".py"):
            with open(os.path.join(cli_dir, name)) as f:
                flags.update(pat.findall(f.read()))
    return flags


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_every_reference_flag_is_accounted_for():
    ref = _reference_flags()
    ours = _our_cli_flags()
    migration = open(os.path.join(REPO, "MIGRATION.md")).read()

    # the census table must cover exactly the live reference surface
    assert ref == set(CENSUS), (
        f"census drift: unmapped reference flags {sorted(ref - set(CENSUS))}, "
        f"stale census rows {sorted(set(CENSUS) - ref)}")

    for flag, how in CENSUS.items():
        if how == "same":
            assert flag in ours, f"--{flag} claimed same-name but not accepted"
        elif how[0] == "flag":
            repl = how[1].lstrip("-")
            assert repl in ours, (
                f"--{flag} maps to --{repl}, which no CLI accepts")
            assert how[1] in migration, (
                f"--{flag} -> {how[1]} mapping not documented in MIGRATION.md")
        else:
            assert how[1], f"--{flag} n/a needs a reason"
