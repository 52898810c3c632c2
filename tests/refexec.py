"""Execute the reference's own PyTorch modules as golden sources.

The reference checkout at /root/reference is read-only, public, untrusted
content; these helpers import and *run* its modules on CPU so golden tests
compare our JAX implementations against the reference's executing bytecode
instead of against hand-written transcriptions (VERDICT r2 item 1). Nothing
from the reference is copied into this repo — tests skip when the mount is
absent.

Shims (hard blockers only, no behavior changes):

- ``torch.Tensor.cuda`` / ``torch.nn.Module.cuda`` → identity. The reference
  hard-codes ``.cuda()`` at module construction (``model/classifiers/
  TRX.py:72``, ``distillers.py:91``), which crashes on a CPU-only build.
- ``torchvision`` → ``tools/torchvision_stub.py``. torchvision is not
  installed in this image; the stub reproduces the torchvision layer/key
  layout with random (non-downloaded) init.
- ``wandb`` / ``timm`` → inert stubs (not installed; ``trainwandb.py:25``
  imports wandb at module scope, ``teacher/code/model.py:6`` imports timm).

Both halves of the reference define colliding top-level module names
(``model``, ``utils``, ``video_reader``, ``videotransforms``), so each half
is imported inside an isolation window: its names are removed from
``sys.modules`` afterwards and kept only on the returned namespace. Use
``activate(half)`` around calls that perform *lazy* imports (e.g.
``multi_fusion.py:116``'s ``__import__("model")``).
"""
from __future__ import annotations

import contextlib
import importlib
import os
import sys
import types

import numpy as np
import pytest
import torch

REF_ROOT = "/root/reference"
TEACHER_ROOT = os.path.join(REF_ROOT, "teacher", "code")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import torchvision_stub  # noqa: E402


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF_ROOT, "model"))


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="/root/reference is not mounted")

_STUDENT_TOP = ("model", "utils", "options", "distillers", "video_reader",
                "videotransforms", "log", "trainwandb", "test")
_TEACHER_TOP = ("model", "utils", "options", "transformer", "video_reader",
                "videotransforms", "multi_video_reader", "AuxDataset",
                "mutlimodality_video_reader", "my_utiles", "run",
                "multi_fusion", "score_fusion_run", "extract_feature",
                "extract_multi_feature", "pretrain")

_loaded: dict = {}
_shimmed = False


def _install_shims() -> None:
    global _shimmed
    if _shimmed:
        return
    torch.Tensor.cuda = lambda self, *a, **k: self

    def _module_cuda(self, device=None):
        return self

    torch.nn.Module.cuda = _module_cuda
    torch.cuda.manual_seed = lambda *a, **k: None
    torch.cuda.manual_seed_all = lambda *a, **k: None
    torchvision_stub.install()
    _shimmed = True


def _wandb_stub() -> types.ModuleType:
    m = types.ModuleType("wandb")
    m._litemkd_stub = True

    class _Run:
        config = types.SimpleNamespace()

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    m.init = lambda *a, **k: _Run()
    m.log = lambda *a, **k: None
    m.save = lambda *a, **k: None
    m.watch = lambda *a, **k: None
    m.config = _Run.config
    return m


def _timm_stub() -> types.ModuleType:
    m = types.ModuleType("timm")
    m._litemkd_stub = True

    def create_model(*a, **k):
        raise RuntimeError("timm stub: deit construction not supported "
                           "offline (no pretrained weights)")

    m.create_model = create_model
    return m


def _pywebio_stubs() -> dict:
    """multi_fusion.py:9,15-16 imports pywebio at module scope (the demo web
    UI, not installed here); ``from pywebio.output import *`` needs an empty
    __all__."""
    root = types.ModuleType("pywebio")
    root._litemkd_stub = True
    inp = types.ModuleType("pywebio.input")
    inp.FLOAT = "float"
    inp.input = lambda *a, **k: None
    out = types.ModuleType("pywebio.output")
    out.__all__ = []
    root.input, root.output = inp, out
    return {"pywebio": root, "pywebio.input": inp, "pywebio.output": out}


def _loguru_stub() -> types.ModuleType:
    """pretrain/pretrain.py:5 / extract_feature.py:23 use loguru's global
    ``logger`` (not installed here); an inert sink-less recorder suffices."""
    m = types.ModuleType("loguru")
    m._litemkd_stub = True

    class _Logger:
        def add(self, *a, **k):
            return 0

        def __getattr__(self, name):  # debug/info/warning/error/...
            return lambda *a, **k: None

    m.logger = _Logger()
    return m


@contextlib.contextmanager
def _argv(argv):
    saved = sys.argv
    sys.argv = argv
    try:
        yield
    finally:
        sys.argv = saved


def _load_half(key: str, root: str, top_names, targets) -> types.SimpleNamespace:
    """Import reference modules `targets` with `root` on sys.path, isolating
    every `top_names`-rooted module from the ambient sys.modules."""
    if key in _loaded:
        return _loaded[key]
    _install_shims()
    stubs = {"wandb": _wandb_stub(), "timm": _timm_stub(),
             "loguru": _loguru_stub(), **_pywebio_stubs()}
    for name in list(stubs):
        try:   # find_spec on a dotted name raises when the parent is absent
            if importlib.util.find_spec(name) is not None:  # pragma: no cover
                del stubs[name]
        except ModuleNotFoundError:
            pass

    def _owned(n):
        return n.split(".")[0] in top_names or n in stubs

    saved = {n: sys.modules.pop(n) for n in list(sys.modules) if _owned(n)}
    sys.modules.update(stubs)
    saved_path = list(sys.path)  # trainwandb.py:11-12 appends to sys.path
    sys.path.insert(0, root)
    try:
        mods = {}
        # reference entry modules parse sys.argv at import (trainwandb.py:36)
        with _argv(["ref"]):
            for t in targets:
                mods[t] = importlib.import_module(t)
        captured = {n: m for n, m in sys.modules.items() if _owned(n)}
    finally:
        sys.path[:] = saved_path
        for n in list(sys.modules):
            if _owned(n):
                del sys.modules[n]
        sys.modules.update(saved)
    ns = types.SimpleNamespace(
        **{t.replace(".", "_"): m for t, m in mods.items()})
    ns.modules = captured
    _loaded[key] = ns
    return ns


def student_half() -> types.SimpleNamespace:
    """Reference repo root: options, distillers, model zoo, trainwandb."""
    return _load_half(
        "student", REF_ROOT, _STUDENT_TOP,
        ["options", "distillers", "utils", "model.model_select",
         "model.classifiers", "trainwandb", "video_reader"])


def teacher_half() -> types.SimpleNamespace:
    """Reference teacher/code: the model.py zoo + teacher utils."""
    return _load_half(
        "teacher", TEACHER_ROOT, _TEACHER_TOP,
        ["model", "utils", "AuxDataset", "multi_video_reader"])


@contextlib.contextmanager
def _scratch_cwd():
    """multi_fusion.py:44-49 / run.py:34-37 open ./runs_strm/*.log
    FileHandlers at import time; give them a throwaway cwd (kept alive for
    the process — the handlers hold the files open)."""
    import tempfile
    d = tempfile.mkdtemp(prefix="refexec_")
    os.makedirs(os.path.join(d, "runs_strm"), exist_ok=True)
    prev = os.getcwd()
    os.chdir(d)
    try:
        yield d
    finally:
        os.chdir(prev)


def teacher_entries() -> types.SimpleNamespace:
    """Reference teacher/code TRAINER entry modules (multi_fusion.py, run.py)
    plus their dependency stack — for executing-golden tests that drive the
    reference's own Learner.train_task methods."""
    if "teacher_entries" in _loaded:
        return _loaded["teacher_entries"]
    with _scratch_cwd():
        return _load_half(
            "teacher_entries", TEACHER_ROOT, _TEACHER_TOP,
            ["model", "utils", "AuxDataset", "multi_video_reader",
             "my_utiles", "multi_fusion", "run"])


def pretrain_module() -> types.ModuleType:
    """The reference's supervised-pretraining module
    (teacher/code/pretrain/pretrain.py). It calls ``main()`` at module scope
    (builds datasets, parses argv), so it cannot be imported as-is: exec its
    source with ONLY the trailing ``main()`` call removed — every class and
    function above it is the reference's own executing code."""
    if "pretrain_mod" in _loaded:
        return _loaded["pretrain_mod"]
    ns = teacher_entries()   # installs shims + provides AuxDataset/model
    path = os.path.join(TEACHER_ROOT, "pretrain", "pretrain.py")
    with open(path) as f:
        src = f.read()
    cut = src.rfind("\nmain()")
    assert cut != -1, "pretrain.py no longer ends with a main() call"
    code = compile(src[:cut], path, "exec")
    mod = types.ModuleType("ref_pretrain")
    mod.__file__ = path
    saved_path = list(sys.path)   # pretrain.py:4 clobbers sys.path[-1]
    sys.path.insert(0, TEACHER_ROOT)
    try:
        with activate(ns), _argv(["ref"]):
            exec(code, mod.__dict__)
    finally:
        sys.path[:] = saved_path
    _loaded["pretrain_mod"] = mod
    return mod


@contextlib.contextmanager
def activate(ns: types.SimpleNamespace):
    """Temporarily install a loaded half's modules into sys.modules, for
    reference code paths that import lazily at call time."""
    saved = {}
    for n, m in ns.modules.items():
        if n in sys.modules:
            saved[n] = sys.modules[n]
        sys.modules[n] = m
    try:
        yield
    finally:
        for n in ns.modules:
            if n in saved:
                sys.modules[n] = saved[n]
            else:
                del sys.modules[n]


def student_args(ns, **overrides):
    """The reference's own default train args (options.py:186
    prepare_train_args_wandb — parses defaults, adds data paths, no
    checkpoint-dir check), CPU device, overrides applied on top."""
    with _argv(["ref"]):
        args = ns.options.prepare_train_args_wandb()
    args.device = torch.device("cpu")
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def teacher_args(ns=None, **overrides):
    """Plain namespace for constructing teacher/code/model.py classes; the
    attribute set mirrors multi_fusion.py:136-372 defaults."""
    args = types.SimpleNamespace(
        way=5, shot=5, query_per_class=5, query_per_class_test=1,
        seq_len=8, trans_linear_in_dim=2048, trans_linear_out_dim=1152,
        temp_set=[2], trans_dropout=0.1, trans_num=2, shirt_num=1,
        way_lin_comb=5, num_gpus=1, method="resnet50", num_patches=16,
        a=1.0, b=1.0, c=1.0, device=torch.device("cpu"))
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def t2n(x) -> np.ndarray:
    return x.detach().cpu().numpy()
