"""tools/pyc_reader.py — audit tool for the reference's compiled-only modules.

The release registers several classifiers whose ``.py`` was never shipped —
only ``__pycache__/*.pyc`` bytecode (see the module docstring of
``tools/pyc_reader.py`` for the list). These tests (a) exercise the
marshal/wordcode reader itself and (b) mechanically lock the recovery claims
our implementations cite, by re-deriving the key facts from the bytecode.

Skipped wholesale when the reference checkout is not mounted.
"""
from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import pyc_reader  # noqa: E402

REF = "/root/reference"
CLS = os.path.join(REF, "model", "classifiers", "__pycache__")

pytestmark = pytest.mark.skipif(not os.path.isdir(CLS),
                                reason="reference checkout not mounted")


def _codes(path):
    mod, _ = pyc_reader.load_pyc(path)
    return {(c.name, c.firstlineno): c for c in pyc_reader.walk(mod)}


def test_reader_parses_both_pyc_versions():
    for name, ver in [("TRX_2fcsup_2.cpython-37.pyc", (3, 7)),
                      ("cos.cpython-39.pyc", (3, 9))]:
        mod, version = pyc_reader.load_pyc(os.path.join(CLS, name))
        assert version == ver
        listing = pyc_reader.dump(os.path.join(CLS, name))
        # every opcode resolved — an unknown table entry prints <OP_n>
        assert "<OP_" not in listing


def test_trx_2fcsup_2_recovered_structure():
    """Locks models/classifiers/trx.py::TRX_2fcsup_2's docstring claims."""
    codes = _codes(os.path.join(CLS, "TRX_2fcsup_2.cpython-37.pyc"))
    fwd = codes[("forward", 205)]
    # shared TCT + SupportDK on BOTH streams, keyed kl/ce/sup_kl/sup_ce
    assert ("kl", "ce", "sup_kl", "sup_ce") in fwd.consts
    assert set(fwd.names) == {"transformers", "supportKD"}
    assert "context_features_1" in fwd.consts and "context_features_2" in fwd.consts
    # the _fixed variant is single-stream TCT→kl + SupportDK→sup under no_grad
    fixed = codes[("forward", 241)]
    assert ("kl", "sup") in fixed.consts
    assert "no_grad" in fixed.names


def test_trx_1fc_sup_is_single_stream_tct_plus_supportdk():
    """Locks the TRX_1fc_sup = TRX_2fcsup_fixed registry alias."""
    codes = _codes(os.path.join(CLS, "TRX_1fc_sup.cpython-37.pyc"))
    fwd = codes[("forward", 306)]
    assert ("kl", "sup") in fwd.consts
    assert set(fwd.names) == {"transformers", "supportKD"}
    init = codes[("__init__", 299)]
    assert "TemporalCrossTransformer" in init.names
    assert 2 in init.consts  # hardcoded temporal_set_size=2


def test_strm_1fc_sup_branch_wiring():
    """distance→pat (DistanceLoss), trx→fr (TCT), trx→sup (SupportDK)."""
    codes = _codes(os.path.join(CLS, "strm_1fc_sup.cpython-37.pyc"))
    fwd = codes[("forward", 308)]
    assert ("pat", "fr", "sup") in fwd.consts
    assert "distance" in fwd.consts and "trx" in fwd.consts
    assert {"DistanceLoss", "transformers", "supportKD"} <= set(fwd.names)


def test_cos_is_euclidean_cdist():
    """The 'CosDistance' classifier computes euclidean cdist, not cosine —
    the quirk ops/distances.py reproduces."""
    codes = _codes(os.path.join(CLS, "cos.cpython-39.pyc"))
    fwd = codes[("forward", 29)]
    assert "cdist" in fwd.names
    assert -1.0 in fwd.consts          # distance = -1.0 * query_dist
    assert "cosine_similarity" not in fwd.names


def test_ctx_time_transformer_attends_over_time_with_f1_head():
    """Locks models/classifiers/ctx.py: the compiled classifier transposes
    before the encoder (time-axis attention) and projects through f1 +
    dropout — unlike the teacher-side model.py copy that omits both."""
    codes = _codes(os.path.join(CLS, "CTX.cpython-37.pyc"))
    tt_fwd = codes[("forward", 86)]
    assert "transpose" in tt_fwd.names
    assert "f1" in tt_fwd.names and "dropout" in tt_fwd.names
    ctx_fwd = codes[("forward", 202)]
    assert {"time_trans", "transpose", "transformers"} <= set(ctx_fwd.names)
    listing = "\n".join(pyc_reader.disassemble(tt_fwd))
    # PE → transpose → encoder ordering (not encoder → transpose)
    assert listing.index("positionEncoding") < listing.index("transpose") \
        < listing.index("transformer_encoder")
    # TCT_gai ≡ the shared TCT at set_size=1: norm_k applied to both key
    # streams, norm_v never applied (the shipped-TCT quirk ops/tct.py keeps),
    # and the -||diff||²/seq_len distance
    gai = codes[("forward", 112)]
    assert "norm_k" in gai.names and "norm_v" not in gai.names
    assert {"norm", "div", "seq_len"} <= set(gai.names)


def test_extract_backbone_is_resnet18_patch_head():
    """model_select.Extracter's resnet18_extract ≡ our resnet18 student head:
    trunk minus last 2 layers → AdaptiveMaxPool2d((4,4)) → 16-patch mean →
    Linear 512→2048 (models/backbones/resnet.py litemkd_feature_head)."""
    path = os.path.join(REF, "model", "backbone", "__pycache__",
                        "extract_feature_backbone.cpython-37.pyc")
    codes = _codes(path)
    init = codes[("__init__", 70)]
    assert "resnet18" in init.names and "AdaptiveMaxPool2d" in init.names
    assert (4, 4) in init.consts and 512 in init.consts and 2048 in init.consts
    fwd = codes[("forward", 83)]
    assert {"adap_max", "mean", "res18_2048"} <= set(fwd.names)
