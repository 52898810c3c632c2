"""PyTorch checkpoint exporter — the inverse of ``torch_import``.

Writes litemkd_tpu weights as reference-layout torch state dicts so a user
of the reference codebase can take a TPU-trained student or teacher back to
``model_select.load_student``/``load_teacher`` unchanged:

- ``ResNetTrunk`` params/batch_stats → torchvision attribute naming
  (``layer1.0.conv1.weight``) or the reference student's Sequential naming
  (``resnet.4.0.conv1.weight``, resnet18_2fc.py:33);
- TCT params → ``<prefix>.{k_linear,v_linear,norm_k,norm_v}`` plus the
  ``pe.pe`` sinusoidal buffer the reference registers
  (TRX_2fcsup.py:24-41); the unused ``norm_v`` (TRX_2fcsup.py:106) exports
  identity LayerNorm values;
- a full student (backbone + classifier) → the reference Student module's
  key layout with a ``{"iteration", "model_state_dict"}`` wrapper
  (trainwandb.py:172-180).

Conventions are the importer's reversed: flax kernel (in,out) → torch Linear
(out,in); HWIO conv → OIHW; scale/bias + batch_stats → BN weight/bias +
running stats (num_batches_tracked synthesized as 0).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..config import Config
from ..ops.positional import sinusoidal_pe
from .torch_import import _SEQ_TO_ATTR, _STAGE_BLOCKS, _BLOCK_BNS, _BLOCK_CONVS

_ATTR_TO_SEQ = {v: k for k, v in _SEQ_TO_ATTR.items()}


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _put_lin(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["kernel"]).T.copy()
    sd[f"{prefix}.bias"] = _np(p["bias"])


def _put_conv(sd, key, p):
    sd[key] = np.transpose(_np(p["kernel"]), (3, 2, 0, 1)).copy()


def _put_bn(sd, prefix, p, s):
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])
    sd[f"{prefix}.running_mean"] = _np(s["mean"])
    sd[f"{prefix}.running_var"] = _np(s["var"])
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _put_ln(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])


def export_resnet_trunk(params: dict, stats: dict, depth: int = 18,
                        prefix: str = "", seq_naming: bool = False
                        ) -> Dict[str, np.ndarray]:
    """``ResNetTrunk`` variables → torch resnet keys. ``seq_naming=True``
    emits the reference's ``nn.Sequential(*children)`` indices."""
    def name(attr: str) -> str:
        return prefix + (_ATTR_TO_SEQ.get(attr.split(".")[0], attr.split(".")[0])
                         + attr[len(attr.split(".")[0]):]
                         if seq_naming else attr)

    sd: Dict[str, np.ndarray] = {}
    _put_conv(sd, name("conv1") + ".weight", params["conv1"])
    _put_bn(sd, name("bn1"), params["bn1"], stats["bn1"])
    for i, n_blocks in enumerate(_STAGE_BLOCKS[depth]):
        for b in range(n_blocks):
            src = f"layer{i + 1}_{b}"
            dst = name(f"layer{i + 1}") + f".{b}"
            bp, bs = params[src], stats[src]
            for conv in _BLOCK_CONVS[depth]:
                _put_conv(sd, f"{dst}.{conv}.weight", bp[conv])
            for bn in _BLOCK_BNS[depth]:
                _put_bn(sd, f"{dst}.{bn}", bp[bn], bs[bn])
            if "downsample_conv" in bp:
                _put_conv(sd, f"{dst}.downsample.0.weight",
                          bp["downsample_conv"])
                _put_bn(sd, f"{dst}.downsample.1", bp["downsample_bn"],
                        bs["downsample_bn"])
    return sd


def export_mobilenet_trunk(params: dict, stats: dict, variant: str = "large",
                           prefix: str = "backbone.mobile.0."
                           ) -> Dict[str, np.ndarray]:
    """MobileNetV3Trunk variables → the reference ``mobile_large[_2fc]``
    key layout (torchvision features wrapped in nn.Sequential,
    moblienetv3.py:31-33 — inverse of torch_import.import_mobilenet_trunk)."""
    from ..models.backbones.mobilenet import _LARGE, _SMALL
    specs = _LARGE if variant == "large" else _SMALL
    sd: Dict[str, np.ndarray] = {}
    _put_conv(sd, f"{prefix}0.0.weight", params["stem"])
    _put_bn(sd, f"{prefix}0.1", params["stem_bn"], stats["stem_bn"])
    in_ch = 16
    for i, (_, e, o, se, _hs, _s) in enumerate(specs):
        bp, bs = params[f"block{i}"], stats[f"block{i}"]
        base = f"{prefix}{i + 1}.block"
        j = 0
        if e != in_ch:
            _put_conv(sd, f"{base}.{j}.0.weight", bp["expand"])
            _put_bn(sd, f"{base}.{j}.1", bp["expand_bn"], bs["expand_bn"])
            j += 1
        _put_conv(sd, f"{base}.{j}.0.weight", bp["depthwise"])
        _put_bn(sd, f"{base}.{j}.1", bp["depthwise_bn"], bs["depthwise_bn"])
        j += 1
        if se:
            for name in ("fc1", "fc2"):
                # Dense (in, out) → torch 1×1 conv (out, in, 1, 1)
                sd[f"{base}.{j}.{name}.weight"] = \
                    _np(bp["se"][name]["kernel"]).T[:, :, None, None].copy()
                sd[f"{base}.{j}.{name}.bias"] = _np(bp["se"][name]["bias"])
            j += 1
        _put_conv(sd, f"{base}.{j}.0.weight", bp["project"])
        _put_bn(sd, f"{base}.{j}.1", bp["project_bn"], bs["project_bn"])
        in_ch = o
    head = f"{prefix}{len(specs) + 1}"
    _put_conv(sd, f"{head}.0.weight", params["head"])
    _put_bn(sd, f"{head}.1", params["head_bn"], stats["head_bn"])
    return sd


def export_tct(tct: dict, prefix: str, d_model: int = 2048,
               max_len: int = 12) -> Dict[str, np.ndarray]:
    """TCT params → reference TemporalCrossTransformer keys, including the
    sinusoidal ``pe.pe`` buffer and identity ``norm_v`` (unused in the
    reference forward but present in its state dict).

    ``max_len`` must be ``int(1.5 * seq_len)`` — every reference TCT
    builds its buffer at that size (TRX.py:57, model.py:233) and every
    reference loader is a strict ``load_state_dict``
    (model_select.py:153, multi_fusion.py:895, run.py:421), so any other
    shape fails to load there. The default matches seq_len=8."""
    sd: Dict[str, np.ndarray] = {}
    _put_lin(sd, f"{prefix}.k_linear", tct["k_linear"])
    _put_lin(sd, f"{prefix}.v_linear", tct["v_linear"])
    _put_ln(sd, f"{prefix}.norm_k", tct["norm_k"])
    out_dim = _np(tct["norm_k"]["scale"]).shape[0]
    sd[f"{prefix}.norm_v.weight"] = np.ones((out_dim,), np.float32)
    sd[f"{prefix}.norm_v.bias"] = np.zeros((out_dim,), np.float32)
    sd[f"{prefix}.pe.pe"] = np.asarray(
        sinusoidal_pe(max_len, d_model, 0.1), np.float32)[None]
    return sd


def _tct_sets(classifier: dict, temp_set) -> list:
    """A classifier's TCT sets in ``temp_set`` order — the reference builds
    one ``transformers.{i}`` ModuleList entry per temp_set entry
    (``TRX.py:170-176``), so sorting param names would drop sets or swap
    indices for temp_set like (3, 2)."""
    t = classifier["transformers"]
    if "k_linear" in t:
        return [t]
    return [t[f"tct_{s}"] for s in temp_set]


def export_student_checkpoint(variables: dict, cfg: Config, path: str,
                              iteration: int = 0,
                              depth: Optional[int] = None) -> Dict[str, np.ndarray]:
    """BatchedStudent/Student variables → a reference-format checkpoint file
    loadable by ``model_select.load_student``: resnet/mobilenet backbones
    (2fc or single-fc, with the reference's per-backbone fc attribute
    names), TRX-family and CTX classifiers."""
    import torch
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if cfg.model.backbone.startswith("mobilenetv3"):
        variant = "small" if "small" in cfg.model.backbone else "large"
        sd = export_mobilenet_trunk(params["backbone"]["trunk"],
                                    stats["backbone"]["trunk"], variant)
    else:
        if depth is None:
            depth = 50 if cfg.model.backbone.startswith(
                ("resnet50", "meta_baseline")) else \
                34 if cfg.model.backbone.startswith("resnet34") else 18
        sd = export_resnet_trunk(params["backbone"]["trunk"],
                                 stats["backbone"]["trunk"], depth,
                                 prefix="backbone.resnet.", seq_naming=True)
    if "fc2" in params["backbone"]:
        for fc in ("fc1", "fc2"):
            _put_lin(sd, f"backbone.{fc}", params["backbone"][fc])
    elif "fc1" in params["backbone"]:
        # the reference's single-fc attribute names: res18_2048
        # (resnet18_student.py:34) vs fc (meta_baseline.py:38,
        # moblienetv3.py:106)
        name = ("res18_2048" if cfg.model.backbone.startswith(
            ("resnet18_student", "resnet34_student")) else "fc")
        _put_lin(sd, f"backbone.{name}", params["backbone"]["fc1"])
    if "classifier" in params:
        if "time_trans" in params["classifier"]:
            sd.update(export_ctx_classifier(params["classifier"], cfg))
        else:
            # every reference STUDENT classifier assigns its TCT directly
            # (classifier.transformers.*, e.g. TRX.py:178, TRX_2fcsup.py:202)
            # — ModuleList indexing (.0) exists only on the teacher's bracnch
            # (model.py:1094). load_student is strict, so an indexed key set
            # fails there. Multi-set heads keep indices (no reference analog).
            sets = _tct_sets(params["classifier"], cfg.model.temp_set)
            for i, tct in enumerate(sets):
                prefix = ("classifier.transformers" if len(sets) == 1
                          else f"classifier.transformers.{i}")
                sd.update(export_tct(tct, prefix,
                                     d_model=cfg.model.trans_linear_in_dim,
                                     max_len=int(1.5 * cfg.episode.seq_len)))
    torch.save({"iteration": iteration,
                "model_state_dict": {k: torch.tensor(v) for k, v in sd.items()}},
               path)
    return sd


def _put_encoder_layer(sd: Dict[str, np.ndarray], prefix: str, p: dict) -> None:
    """Our EncoderLayer params → torch nn.TransformerEncoderLayer keys
    (attn_q/k/v fused back into in_proj)."""
    w = np.concatenate([_np(p[n]["kernel"]).T for n in
                        ("attn_q", "attn_k", "attn_v")])
    b = np.concatenate([_np(p[n]["bias"]) for n in
                        ("attn_q", "attn_k", "attn_v")])
    sd[f"{prefix}.self_attn.in_proj_weight"] = w
    sd[f"{prefix}.self_attn.in_proj_bias"] = b
    _put_lin(sd, f"{prefix}.self_attn.out_proj", p["attn_out"])
    _put_lin(sd, f"{prefix}.linear1", p["mlp_in"])
    _put_lin(sd, f"{prefix}.linear2", p["mlp_out"])
    _put_ln(sd, f"{prefix}.norm1", p["norm1"])
    _put_ln(sd, f"{prefix}.norm2", p["norm2"])


def export_ctx_classifier(classifier: dict, cfg: Config) -> Dict[str, np.ndarray]:
    """CTXClassifier params → the compiled CTX head's key layout
    (``classifiers/CTX.pyc``: ``time_trans.{positionEncoding,
    transformer_encoder.layers.N, f1}`` + an UN-indexed ``transformers.*`` —
    the compiled class assigns its TCT directly, not via ModuleList).
    Inverse of torch_import.import_ctx_classifier."""
    sd: Dict[str, np.ndarray] = {}
    tt = classifier["time_trans"]
    pe = tt["pe"]
    sd["classifier.time_trans.positionEncoding.position_embeddings.weight"] \
        = _np(pe["position_embeddings"])
    _put_ln(sd, "classifier.time_trans.positionEncoding.LayerNorm",
            pe["LayerNorm_0"])
    for name, lay in tt["encoder"].items():
        idx = name[len("layer"):]
        _put_encoder_layer(
            sd, f"classifier.time_trans.transformer_encoder.layers.{idx}", lay)
    _put_lin(sd, "classifier.time_trans.f1", tt["f1"])
    # TCT_gai's sinusoidal PE buffer uses max_len=int(1.5*seq_len)
    # (unlike the shipped TRX's 5000) — the buffer shape must match
    sd.update(export_tct(classifier["transformers"], "classifier.transformers",
                         d_model=cfg.model.trans_linear_in_dim,
                         max_len=int(1.5 * cfg.episode.seq_len)))
    return sd


def export_stream_fusion(p: dict, prefix: str) -> Dict[str, np.ndarray]:
    """Two/Three/MultiStreamFusion params → reference Two/ThreeTransforFusion
    key layout (model.py:1300-1331 / 1361-1393; inverse of
    torch_import.import_stream_fusion)."""
    sd: Dict[str, np.ndarray] = {}
    i = 1
    while f"pe{i}" in p:
        pe = p[f"pe{i}"]
        sd[f"{prefix}.positionEncoding{i}.position_embeddings.weight"] = \
            _np(pe["position_embeddings"])
        _put_ln(sd, f"{prefix}.positionEncoding{i}.LayerNorm",
                pe["LayerNorm_0"])
        i += 1
    for name, lay in p["encoder"].items():
        idx = name[len("layer"):]
        _put_encoder_layer(sd, f"{prefix}.transformer_encoder.layers.{idx}",
                           lay)
    _put_lin(sd, f"{prefix}.f1", p["fuse_proj"])
    return sd


def export_mfm_checkpoint(variables: dict, cfg: Config, path: str,
                          iteration: int = 0) -> Dict[str, np.ndarray]:
    """MFMTeacher variables → a reference ``ThreeTRXShiftLoopTime``-layout
    checkpoint (model.py:1588-1607: three_fusion + shared pair fusion +
    bracnch TCT stack), so a TPU-trained fusion teacher runs in the
    reference codebase."""
    import torch
    params = variables["params"]
    sd: Dict[str, np.ndarray] = {}
    sd.update(export_stream_fusion(params["three_fusion"], "three_fusion"))
    sd.update(export_stream_fusion(params["fusion"], "fusion"))
    t = params["branch"]["transformers"]
    # ModuleList order follows cfg.model.temp_set (reference TrxBranch builds
    # transformers per temp_set entry, model.py:1094-1128) — sorting param
    # names would swap sets for temp_set like (3, 2)
    tcts = [t] if "k_linear" in t else [t[f"tct_{s}"]
                                        for s in cfg.model.temp_set]
    for i, tct in enumerate(tcts):
        sd.update(export_tct(tct, f"bracnch.transformers.{i}",
                             d_model=cfg.model.trans_linear_in_dim,
                             max_len=int(1.5 * cfg.episode.seq_len)))
    torch.save({"iteration": iteration,
                "model_state_dict": {k: torch.tensor(v) for k, v in sd.items()}},
               path)
    return sd


def export_teacher_checkpoint(teacher_vars: dict, cfg: Config, path: str,
                              iteration: int = 0) -> Dict[str, np.ndarray]:
    """Teacher head variables → the released teacher layout
    (``bracnch.transformers.0.*`` — reference model_select.py:105-117)."""
    import torch
    sd: Dict[str, np.ndarray] = {}
    for i, tct in enumerate(_tct_sets(teacher_vars["params"]["classifier"],
                                      cfg.model.temp_set)):
        sd.update(export_tct(tct, f"bracnch.transformers.{i}",
                             d_model=cfg.model.trans_linear_in_dim,
                             max_len=int(1.5 * cfg.episode.seq_len)))
    torch.save({"iteration": iteration,
                "model_state_dict": {k: torch.tensor(v) for k, v in sd.items()}},
               path)
    return sd
