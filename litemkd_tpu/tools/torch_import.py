"""PyTorch checkpoint importer.

Brings torch-side weights into litemkd_tpu pytrees:

- torchvision-style resnet state dicts (both attribute naming ``layer1.0.conv1``
  and the reference's Sequential naming ``resnet.4.0.conv1`` from
  ``nn.Sequential(*children)``, resnet18_2fc.py:33) → ``ResNetTrunk`` params +
  batch_stats;
- reference TRX teacher checkpoints → ``Teacher`` variables, handling the
  ``bracnch.transformers.0.*`` key prefix of the released teacher weights
  (model_select.py:105-117) and plainer prefixes. Unlike the reference —
  which silently skips loading for teacher names not in a two-element list
  (model_select.py:238, SURVEY.md §3.6) — this importer loads for every
  fixed-teacher variant;
- full reference student checkpoints (backbone + classifier), with
  DataParallel ``module.`` segments stripped (load_student,
  model_select.py:143-150).

Conventions: torch Linear (out,in) → flax kernel (in,out) [transposed];
torch Conv OIHW → flax HWIO; BN weight/bias → scale/bias + running stats →
batch_stats.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..config import Config


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a checkpoint file; unwraps {'model_state_dict': ...} and
    strips DataParallel 'module.' segments."""
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "model_state_dict" in raw:
        raw = raw["model_state_dict"]
    out = {}
    for k, v in raw.items():
        k = ".".join(seg for seg in k.split(".") if seg != "module")
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _lin(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T.copy(),
            "bias": sd[f"{prefix}.bias"].copy()}


def _conv(sd, key):
    return {"kernel": np.transpose(sd[key], (2, 3, 1, 0)).copy()}


def _bn(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"].copy(),
              "bias": sd[f"{prefix}.bias"].copy()}
    stats = {"mean": sd[f"{prefix}.running_mean"].copy(),
             "var": sd[f"{prefix}.running_var"].copy()}
    return params, stats


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"].copy(),
            "bias": sd[f"{prefix}.bias"].copy()}


_SEQ_TO_ATTR = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
                "6": "layer3", "7": "layer4"}


def normalize_resnet_keys(sd: Dict[str, np.ndarray],
                          prefix: str = "") -> Dict[str, np.ndarray]:
    """Strip ``prefix`` and rewrite Sequential indices to attribute names."""
    out = {}
    for k, v in sd.items():
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix):]
        parts = k.split(".")
        if parts and parts[0] in _SEQ_TO_ATTR:
            parts[0] = _SEQ_TO_ATTR[parts[0]]
        out[".".join(parts)] = v
    return out


_STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}
_BLOCK_BNS = {18: ("bn1", "bn2"), 34: ("bn1", "bn2"), 50: ("bn1", "bn2", "bn3")}
_BLOCK_CONVS = {18: ("conv1", "conv2"), 34: ("conv1", "conv2"),
                50: ("conv1", "conv2", "conv3")}


def import_resnet_trunk(sd: Dict[str, np.ndarray], depth: int = 18,
                        prefix: str = "") -> Tuple[dict, dict]:
    """torchvision resnet{18,34,50} keys → (params, batch_stats) for
    ``ResNetTrunk``."""
    sd = normalize_resnet_keys(sd, prefix)
    params: dict = {}
    stats: dict = {}
    params["conv1"] = _conv(sd, "conv1.weight")
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    for i, n_blocks in enumerate(_STAGE_BLOCKS[depth]):
        for b in range(n_blocks):
            src = f"layer{i + 1}.{b}"
            dst = f"layer{i + 1}_{b}"
            bp: dict = {}
            bs: dict = {}
            for conv in _BLOCK_CONVS[depth]:
                bp[conv] = _conv(sd, f"{src}.{conv}.weight")
            for bn in _BLOCK_BNS[depth]:
                bp[bn], bs[bn] = _bn(sd, f"{src}.{bn}")
            if f"{src}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv(sd, f"{src}.downsample.0.weight")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{src}.downsample.1")
            params[dst] = bp
            stats[dst] = bs
    return params, stats


def import_mobilenet_trunk(sd: Dict[str, np.ndarray], variant: str = "large",
                           prefix: str = "") -> Tuple[dict, dict]:
    """torchvision ``mobilenet_v3_{large,small}`` feature-extractor keys →
    (params, batch_stats) for ``MobileNetV3Trunk``.

    torchvision layout: ``features.0`` = stem ConvBNAct; spec block i lives at
    ``features.{i+1}`` whose ``block`` Sequential indices shift by whether the
    expand 1×1 exists (first block: expand == in_ch → absent) and whether SE
    is used (``fcN`` are 1×1 convs → Dense kernels); the 1×1 head ConvBNAct is
    the last features entry."""
    from ..models.backbones.mobilenet import _LARGE, _SMALL
    specs = _LARGE if variant == "large" else _SMALL
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: dict = {}
    stats: dict = {}
    params["stem"] = _conv(sd, "features.0.0.weight")
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "features.0.1")
    in_ch = 16
    for i, (_, e, o, se, _hs, _s) in enumerate(specs):
        src = f"features.{i + 1}.block"
        bp: dict = {}
        bs: dict = {}
        j = 0
        if e != in_ch:
            bp["expand"] = _conv(sd, f"{src}.{j}.0.weight")
            bp["expand_bn"], bs["expand_bn"] = _bn(sd, f"{src}.{j}.1")
            j += 1
        # depthwise (E, 1, kh, kw) → (kh, kw, 1, E): same transpose as _conv
        bp["depthwise"] = _conv(sd, f"{src}.{j}.0.weight")
        bp["depthwise_bn"], bs["depthwise_bn"] = _bn(sd, f"{src}.{j}.1")
        j += 1
        if se:
            def se_fc(name):
                w = sd[f"{src}.{j}.{name}.weight"]        # (out, in, 1, 1)
                return {"kernel": w[:, :, 0, 0].T.copy(),
                        "bias": sd[f"{src}.{j}.{name}.bias"].copy()}
            bp["se"] = {"fc1": se_fc("fc1"), "fc2": se_fc("fc2")}
            j += 1
        bp["project"] = _conv(sd, f"{src}.{j}.0.weight")
        bp["project_bn"], bs["project_bn"] = _bn(sd, f"{src}.{j}.1")
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs
        in_ch = o
    head = f"features.{len(specs) + 1}"
    params["head"] = _conv(sd, f"{head}.0.weight")
    params["head_bn"], stats["head_bn"] = _bn(sd, f"{head}.1")
    return params, stats


def import_backbone_mobilenet(sd: Dict[str, np.ndarray],
                              variant: str = "large") -> dict:
    """Reference ``mobile_large[_2fc]`` student backbone → MobileNetV3Backbone
    variables. The reference wraps torchvision's features module in
    ``nn.Sequential`` (moblienetv3.py:31-33), so trunk keys carry a
    ``mobile.0.`` prefix."""
    feats = {"features." + k[len("mobile.0."):]: v for k, v in sd.items()
             if k.startswith("mobile.0.")}
    trunk_p, trunk_s = import_mobilenet_trunk(feats, variant)
    params = {"trunk": trunk_p, "fc1": _lin(sd, "fc1" if "fc1.weight" in sd
                                            else "fc")}
    if "fc2.weight" in sd:
        params["fc2"] = _lin(sd, "fc2")
    return {"params": params, "batch_stats": {"trunk": trunk_s}}


def import_tct(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """TRX TemporalCrossTransformer weights under ``prefix`` → TCT params.
    (The value-side LayerNorm ``norm_v`` exists in torch checkpoints but is
    unused by the forward pass — reference TRX_2fcsup.py:106 — and is skipped.)"""
    return {
        "k_linear": _lin(sd, f"{prefix}.k_linear"),
        "v_linear": _lin(sd, f"{prefix}.v_linear"),
        "norm_k": _ln(sd, f"{prefix}.norm_k"),
    }


def _find_tct_prefix(sd: Dict[str, np.ndarray]) -> Optional[str]:
    """Locate the TCT weight prefix in a reference checkpoint."""
    for k in sd:
        if k.endswith("k_linear.weight"):
            return k[: -len(".k_linear.weight")]
    return None


def load_teacher_checkpoint(path: str, cfg: Config) -> dict:
    """Reference teacher checkpoint → Teacher/BatchedTeacher variables.

    Works for any fixed-teacher head whose parameters are a single TCT
    (TRX_fixed, TRX_sup_fixed, TRX_2fcsup_fixed — SupportDK has no params)."""
    sd = load_state_dict(path)
    prefix = _find_tct_prefix(sd)
    if prefix is None:
        raise KeyError(f"no TRX k_linear weights found in {path}")
    tct = import_tct(sd, prefix)
    return {"params": {"classifier": {"transformers": tct}}}


def _encoder_layer_params(sd: Dict[str, np.ndarray], prefix: str,
                          d_model: int) -> dict:
    """torch ``nn.TransformerEncoderLayer`` weights → our EncoderLayer params
    (fused in_proj split into attn_q/k/v)."""
    w = sd[f"{prefix}.self_attn.in_proj_weight"]        # (3d, d)
    b = sd[f"{prefix}.self_attn.in_proj_bias"]
    d = d_model
    qkv = {}
    for i, name in enumerate(("attn_q", "attn_k", "attn_v")):
        qkv[name] = {"kernel": w[i * d:(i + 1) * d].T.copy(),
                     "bias": b[i * d:(i + 1) * d].copy()}
    return {
        **qkv,
        "attn_out": _lin(sd, f"{prefix}.self_attn.out_proj"),
        "mlp_in": _lin(sd, f"{prefix}.linear1"),
        "mlp_out": _lin(sd, f"{prefix}.linear2"),
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
    }


def _trainable_pe_params(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """reference TrainablePositionalEncoding (Embedding + LayerNorm,
    model.py:1135-1153) → TrainablePE params."""
    return {"position_embeddings":
            sd[f"{prefix}.position_embeddings.weight"].copy(),
            "LayerNorm_0": _ln(sd, f"{prefix}.LayerNorm")}


def import_stream_fusion(sd: Dict[str, np.ndarray], prefix: str,
                         n_streams: int, d: int, depth: int,
                         n_pes: Optional[int] = None) -> dict:
    """Two/ThreeTransforFusion-style module (per-stream PEs + torch
    TransformerEncoder + f1 projection; reference model.py:1300-1331 /
    1361-1393) → Two/Three/MultiStreamFusion params. ``n_pes`` < n_streams
    imports only the LIVE PEs (FourTransforFusion's positionEncoding4 is
    constructed but dead — stream 4 rides positionEncoding3,
    model.py:1218-1219 — so the bug-faithful variant has 3 PE tables)."""
    p: dict = {}
    for i in range(n_pes if n_pes is not None else n_streams):
        p[f"pe{i + 1}"] = _trainable_pe_params(
            sd, f"{prefix}.positionEncoding{i + 1}")
    p["encoder"] = {
        f"layer{l}": _encoder_layer_params(
            sd, f"{prefix}.transformer_encoder.layers.{l}", n_streams * d)
        for l in range(depth)}
    p["fuse_proj"] = _lin(sd, f"{prefix}.f1")
    return p


def import_ctx_classifier(sd: Dict[str, np.ndarray],
                          prefix: str = "classifier") -> dict:
    """Compiled-only CTX student head (``classifiers/CTX.pyc``:
    ``Time_Transformer`` + ``TemporalCrossTransformer_gai``; no source in the
    release — see tools/pyc_reader.py) → ``CTXClassifier`` params.

    Layout (attribute names from the bytecode): ``<prefix>.time_trans.
    {positionEncoding, transformer_encoder.layers.N, f1}`` and
    ``<prefix>.transformers.{k_linear, v_linear, norm_k[, norm_v unused]}``.
    Encoder depth is inferred from the layer keys (the compiled head fixes
    num_layers=2)."""
    tt = f"{prefix}.time_trans"
    d = sd[f"{tt}.f1.weight"].shape[0]
    depth = 0
    while f"{tt}.transformer_encoder.layers.{depth}.linear1.weight" in sd:
        depth += 1
    if depth == 0:
        raise KeyError(f"no Time_Transformer encoder layers under {tt!r}")
    time_trans = {
        "pe": _trainable_pe_params(sd, f"{tt}.positionEncoding"),
        "encoder": {f"layer{i}": _encoder_layer_params(
            sd, f"{tt}.transformer_encoder.layers.{i}", d)
            for i in range(depth)},
        "f1": _lin(sd, f"{tt}.f1"),
    }
    return {"time_trans": time_trans,
            "transformers": import_tct(sd, f"{prefix}.transformers")}


def load_mfm_checkpoint(path: str, cfg: Config) -> dict:
    """Reference ``ThreeTRXShiftLoopTime`` checkpoint (model.py:1588-1663:
    three_fusion = ThreeTransforTemproal l.1300-1331, fusion =
    TwoTransforFusion l.1361-1393, bracnch = TrxBranch l.1094-1128) →
    MFMTeacher variables, so a reference-trained fusion teacher drives our
    extraction and evaluation.

    Divergence guards: config geometry (trans_num, temp_set, seq_len) must
    match what the checkpoint was trained with — silently truncating encoder
    layers or TCT sets would compute wrong features."""
    sd = load_state_dict(path)
    d = cfg.model.trans_linear_in_dim
    depth = cfg.model.trans_num
    n = len(cfg.model.modalities)
    for prefix in ("three_fusion", "fusion"):
        extra = (f"{prefix}.transformer_encoder.layers.{depth}."
                 "self_attn.in_proj_weight")
        if extra in sd:
            raise ValueError(
                f"{path}: {prefix} has more encoder layers than "
                f"trans_num={depth} — pass --trans_num matching the trained "
                "teacher")
        pe = sd[f"{prefix}.positionEncoding1.position_embeddings.weight"]
        if pe.shape[0] != cfg.episode.seq_len:
            raise ValueError(
                f"{path}: {prefix} positional table has {pe.shape[0]} frames "
                f"but seq_len={cfg.episode.seq_len}")
    n_sets = len(cfg.model.temp_set)
    if f"bracnch.transformers.{n_sets}.k_linear.weight" in sd:
        raise ValueError(
            f"{path}: checkpoint has more TCT sets than temp_set="
            f"{cfg.model.temp_set} — pass --temp_set matching the trained "
            "teacher")
    params = {
        "three_fusion": import_stream_fusion(sd, "three_fusion", n, d, depth),
        "fusion": import_stream_fusion(sd, "fusion", 2, d, depth),
        "branch": {"transformers": {
            f"tct_{s}": import_tct(sd, f"bracnch.transformers.{i}")
            for i, s in enumerate(cfg.model.temp_set)}},
    }
    return {"params": params}


def import_backbone_2fc(sd: Dict[str, np.ndarray], depth: int = 18) -> dict:
    """Reference resnet student backbone → ResNetBackbone variables.

    Handles the 2fc layout (fc1/fc2, resnet18_2fc.py:34-35) AND the
    reference's single-fc attribute names — ``res18_2048``
    (resnet18_student.py:34) and ``fc`` (meta_baseline.py:38) — which land
    on our ``fc1``. num_fc=0 trunks (resnet50_student) have no fc keys."""
    trunk_p, trunk_s = import_resnet_trunk(sd, depth, prefix="resnet.")
    params = {"trunk": trunk_p}
    for theirs in ("fc1", "res18_2048", "fc"):
        if f"{theirs}.weight" in sd:
            params["fc1"] = _lin(sd, theirs)
            break
    if "fc2.weight" in sd:
        params["fc2"] = _lin(sd, "fc2")
    return {"params": params, "batch_stats": {"trunk": trunk_s}}


def import_deit_trunk(sd: Dict[str, np.ndarray], prefix: str = "",
                      heads: int = 6) -> dict:
    """timm ``deit_small_distilled_patch16_224`` state dict (the downloaded
    zoo layout, incl. the ``convnet.``-prefixed copy inside a saved
    ``model_distillation``) → ``ViTClassifier`` params, MINUS the ``fc`` head.

    The reference resets timm's classifier and adds its own Linear
    (``teacher/code/model.py:2142-2157``: ``reset_classifier(0)`` + fresh
    ``nn.Linear(384, num_classes)``), so ``head.*``/``head_dist.*`` are
    dropped here and the caller deep-merges over a fresh init to keep its own
    ``fc``. qkv fusion is split into flax MHA's per-projection (in, heads,
    head_dim) kernels."""
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    dim = sd["cls_token"].shape[-1]
    hd = dim // heads
    depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    pw = sd["patch_embed.proj.weight"]
    params: dict = {
        "cls_token": sd["cls_token"].copy(),
        "dist_token": sd["dist_token"].copy(),
        "pos_embed": sd["pos_embed"].copy(),
        "patch_embed": {"kernel": np.transpose(pw, (2, 3, 1, 0)).copy(),
                        "bias": sd["patch_embed.proj.bias"].copy()},
        "norm": _ln(sd, "norm"),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        qkv_w = sd[f"{b}.attn.qkv.weight"]           # (3*dim, dim) rows q;k;v
        qkv_b = sd[f"{b}.attn.qkv.bias"]
        attn = {}
        for j, name in enumerate(("query", "key", "value")):
            w = qkv_w[j * dim:(j + 1) * dim]         # (dim, dim) out,in
            attn[name] = {"kernel": w.T.reshape(dim, heads, hd).copy(),
                          "bias": qkv_b[j * dim:(j + 1) * dim]
                          .reshape(heads, hd).copy()}
        attn["out"] = {
            "kernel": sd[f"{b}.attn.proj.weight"].T.reshape(heads, hd, dim).copy(),
            "bias": sd[f"{b}.attn.proj.bias"].copy()}
        params[f"attn_{i}"] = attn
        params[f"norm1_{i}"] = _ln(sd, f"{b}.norm1")
        params[f"norm2_{i}"] = _ln(sd, f"{b}.norm2")
        params[f"mlp_in_{i}"] = _lin(sd, f"{b}.mlp.fc1")
        params[f"mlp_out_{i}"] = _lin(sd, f"{b}.mlp.fc2")
    return params


def load_pretrain_init(path: str, cfg: Config, arch: str) -> dict:
    """Warm-start variables for the pretraining model (``cli.pretrain
    --init_checkpoint``): the ``pretrained=True`` parity path of the
    reference's supervised stage (``pretrain/pretrain.py`` resnet50,
    ``model.py:2146`` timm DeiT). Returns PARTIAL variables (trunk only, no
    classifier head) for deep-merge over a fresh init."""
    sd = load_state_dict(path)
    if arch == "deit_small":
        if "cls_token" not in sd:                    # saved model_distillation
            if not any(k.startswith("convnet.") for k in sd):
                raise ValueError(f"{path} is not a timm DeiT checkpoint")
            return {"params": import_deit_trunk(sd, prefix="convnet.")}
        return {"params": import_deit_trunk(sd)}
    depth = int(arch.replace("resnet", ""))
    kind = detect_torchvision_zoo(sd)
    if kind == "resnet":
        prefix = ""
    elif kind == "mobilenet":
        raise ValueError(f"{path} is a mobilenet zoo checkpoint; the "
                         f"pretraining stage warm-starts resnet/deit trunks "
                         f"only (--arch {arch})")
    elif any(k.startswith("trunk.") for k in sd):    # our exported layout
        prefix = "trunk."
    elif any(k.startswith("convnet.") for k in sd):
        # the reference's own pretrain artifact: Action_Recognition_Resnet50
        # saves convnet.N.* Sequential keys (model.py:3351, pretrain.py:173)
        prefix = "convnet."
    elif any(k.startswith("resnet.") for k in sd):
        # a released expert checkpoint (run.py artifact, model.py:558):
        # the trunk lives under resnet.N.* — warm-start from its trunk
        prefix = "resnet."
    else:
        raise ValueError(f"{path} is not a resnet zoo / pretrain checkpoint")
    # normalize BEFORE the depth probe: convnet./resnet. artifacts carry
    # numeric Sequential keys (convnet.4.0.conv3...), which the raw-key
    # probe always read as resnet18 and rejected (caught by the ARR50
    # executing-reference golden)
    have = _resnet_sd_depth(normalize_resnet_keys(sd, prefix))
    if have != depth:
        # resnet34 basic blocks truncate shape-compatibly into resnet18, so a
        # silent mismatch would train from wrong weights — same guard as
        # load_torchvision_trunk
        raise ValueError(f"{path} holds resnet{have} weights but --arch "
                         f"requested resnet{depth}")
    trunk_p, trunk_s = import_resnet_trunk(sd, depth, prefix=prefix)
    return {"params": {"trunk": trunk_p}, "batch_stats": {"trunk": trunk_s}}


def _resnet_sd_depth(sd: Dict[str, np.ndarray], prefix: str = "") -> int:
    """Depth of a resnet state dict from its block structure: bottleneck
    conv3 ⇒ 50, a third basic block in layer1 ⇒ 34, else 18."""
    if f"{prefix}layer1.0.conv3.weight" in sd:
        return 50
    if f"{prefix}layer1.2.conv1.weight" in sd:
        return 34
    return 18


def detect_torchvision_zoo(sd: Dict[str, np.ndarray]) -> Optional[str]:
    """Classify a RAW torchvision model-zoo state dict (as downloaded, no
    wrapper prefixes): 'resnet' (resnet18/34/50), 'mobilenet'
    (mobilenet_v3_large/small), or None (a reference-layout checkpoint).

    The reference consumes exactly these artifacts via ``pretrained=True``
    (``model/backbone/resnet18_2fc.py:29``, ``moblienetv3.py`` /
    ``teacher/code/model.py:553``); detecting them here makes pretrained
    weight arrival a file-copy + ``--init_checkpoint`` away."""
    if "conv1.weight" in sd and "layer1.0.conv1.weight" in sd:
        return "resnet"
    if "features.0.0.weight" in sd and "features.1.block.0.0.weight" in sd:
        return "mobilenet"
    return None


def load_torchvision_trunk(path: str, cfg: Config) -> dict:
    """A raw torchvision zoo checkpoint → PARTIAL student variables: the conv
    trunk only, under ``params.backbone.trunk`` / ``batch_stats.backbone.trunk``.
    The caller deep-merges over an initialized template so fc heads and the
    classifier keep their fresh init — exactly the reference's
    ``models.resnet18(pretrained=True)`` + new Linear heads recipe
    (``resnet18_2fc.py:29-34``). Classification heads (``fc.*`` /
    ``classifier.*``) and ``num_batches_tracked`` entries are ignored.

    The checkpoint's architecture is validated against ``cfg.model.backbone``
    (zoo files carry no metadata; silently loading resnet18 weights into a
    resnet50 trunk must be impossible)."""
    sd = load_state_dict(path)
    kind = detect_torchvision_zoo(sd)
    if kind is None:
        raise ValueError(f"{path} is not a raw torchvision zoo checkpoint")
    backbone = cfg.model.backbone
    if kind == "resnet":
        depth = _resnet_sd_depth(sd)
        want = 50 if backbone.startswith(("resnet50", "meta_baseline")) else \
            34 if backbone.startswith("resnet34") else 18
        if not backbone.startswith(("resnet", "meta_baseline", "strm", "cnn_strm")):
            raise ValueError(f"resnet zoo checkpoint {path} cannot warm-start "
                             f"backbone '{backbone}'")
        if depth != want:
            raise ValueError(f"{path} is a resnet{depth} zoo checkpoint but "
                             f"backbone '{backbone}' needs resnet{want}")
        trunk_p, trunk_s = import_resnet_trunk(sd, depth)
    else:
        variant = "large" if "features.16.0.weight" in sd else "small"
        if not backbone.startswith("mobilenetv3"):
            raise ValueError(f"mobilenet zoo checkpoint {path} cannot "
                             f"warm-start backbone '{backbone}'")
        want_v = "small" if "small" in backbone else "large"
        if variant != want_v:
            raise ValueError(f"{path} is mobilenet_v3_{variant} but backbone "
                             f"'{backbone}' needs mobilenet_v3_{want_v}")
        trunk_p, trunk_s = import_mobilenet_trunk(sd, variant)
    return {"params": {"backbone": {"trunk": trunk_p}},
            "batch_stats": {"backbone": {"trunk": trunk_s}}}


def _import_tct_stack(sd: Dict[str, np.ndarray], cfg: Config,
                      prefix: str = "transformers",
                      artifact: str = "checkpoint"):
    """A ``TemporalCrossTransformer`` ModuleList under ``prefix`` → classifier
    TCT params: a single entry maps to the flat TCT, several map onto
    ``tct_{s}`` in ``cfg.model.temp_set`` order (the reference builds one per
    entry, model.py:1106-1107). Returns None when no TCT keys exist."""
    n_sets = 0
    while f"{prefix}.{n_sets}.k_linear.weight" in sd:
        n_sets += 1
    if n_sets == 0:
        return None
    if n_sets == 1:
        return import_tct(sd, f"{prefix}.0")
    if n_sets != len(cfg.model.temp_set):
        raise ValueError(
            f"{artifact} holds {n_sets} TCT sets but temp_set="
            f"{cfg.model.temp_set} — pass --temp_set matching the trained "
            "model")
    return {f"tct_{s}": import_tct(sd, f"{prefix}.{i}")
            for i, s in enumerate(cfg.model.temp_set)}


def _load_expert_checkpoint(sd: Dict[str, np.ndarray], cfg: Config,
                            path: str, prefix: str = "resnet.") -> dict:
    """A run.py expert artifact (the raw model's state dict, no Student
    wrapper — ``model.py:558``: ``resnet.N.*`` trunk + ``transformers.{i}``
    ModuleList, plus attn_pat/fr_enrich params the released forward never
    uses) → Student variables for our expert presets (resnet trunk backbone,
    num_fc=0, + TRX/TRX_multi head). ModuleList entries land on ``tct_{s}``
    in ``cfg.model.temp_set`` order (reference builds one per entry,
    model.py:1106-1107); a single entry maps to the flat TCT."""
    depth = _resnet_sd_depth(normalize_resnet_keys(sd, prefix))
    trunk_p, trunk_s = import_resnet_trunk(sd, depth, prefix=prefix)
    params: dict = {"backbone": {"trunk": trunk_p}}
    tct = _import_tct_stack(sd, cfg, artifact=path)
    if tct is not None:
        params["classifier"] = {"transformers": tct}
    return {"params": params,
            "batch_stats": {"backbone": {"trunk": trunk_s}}}


def load_student_checkpoint(path: str, cfg: Config) -> dict:
    """Full reference student checkpoint (Student = backbone + classifier) →
    BatchedStudent variables. Key prefixes per model_select.py:17-36:
    ``backbone.*`` and ``classifier.*``. Raw torchvision zoo files (the
    ``pretrained=True`` artifacts) are detected and imported as partial
    trunk-only variables via :func:`load_torchvision_trunk`."""
    sd = load_state_dict(path)
    if detect_torchvision_zoo(sd) is not None:
        return load_torchvision_trunk(path, cfg)
    if "time_trans.positionEncoding.position_embeddings.weight" in sd:
        # teacher-half CTX artifact (model.py:2938-3014): resnet.* trunk +
        # time_trans + frame-level CrossTransformer — route to the dedicated
        # importer so the TimeTransformer weights are not silently dropped
        return load_teacher_ctx_checkpoint(path, cfg)
    if "encoder.t_embedding.0.weight" in sd:
        # S3D skeleton expert artifact (model.py:2720-2818)
        return load_skeleton_expert_checkpoint(path, cfg)
    if (cfg.model.backbone.startswith(("strm", "cnn_strm"))
            and not any(k.startswith("backbone.") for k in sd)
            and any(k.startswith("resnet.") for k in sd)):
        # CNN_STRM expert artifact targeted at an STRM backbone config (the
        # attn_pat/fr_enrich keys alone cannot identify it — TRX artifacts
        # carry them as dead weight, model.py:558)
        return load_cnn_strm_checkpoint(path, cfg)
    if (not any(k.startswith("backbone.") for k in sd)
            and any(k.startswith("resnet.") for k in sd)):
        return _load_expert_checkpoint(sd, cfg, path)
    if "backbone.0.weight" in sd and "transformers.0.k_linear.weight" in sd:
        # a TRM artifact (model.py:886-900): the GAP trunk lives under
        # ``backbone.`` Sequential indices instead of TRX's ``resnet.``
        return _load_expert_checkpoint(sd, cfg, path, prefix="backbone.")
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    if cfg.model.backbone.startswith("mobilenetv3"):
        variant = "small" if "small" in cfg.model.backbone else "large"
        bb = import_backbone_mobilenet(backbone_sd, variant)
    else:
        depth = 50 if cfg.model.backbone.startswith(("resnet50",
                                                     "meta_baseline")) else \
            34 if cfg.model.backbone.startswith("resnet34") else 18
        have = _resnet_sd_depth(normalize_resnet_keys(backbone_sd, "resnet."))
        if have != depth:
            # resnet34 basic blocks truncate shape-compatibly into 18, so a
            # depth mismatch would silently leave a third of the trunk at
            # random init after the deep-merge
            raise ValueError(f"{path} holds resnet{have} student weights but "
                             f"backbone '{cfg.model.backbone}' expects "
                             f"resnet{depth}")
        bb = import_backbone_2fc(backbone_sd, depth)
    params = {"backbone": bb["params"]}
    if "classifier.time_trans.f1.weight" in sd:
        # CTX head: TCT alone would silently leave time_trans at random init
        params["classifier"] = import_ctx_classifier(sd)
    else:
        prefix = _find_tct_prefix(sd)
        if prefix is not None:
            params["classifier"] = {"transformers": import_tct(sd, prefix)}
    return {"params": params, "batch_stats": {"backbone": bb["batch_stats"]}}


# ---------------------------------------------------------------------------
# Composed fusion-teacher checkpoints — the full model.py permutation zoo
# (``teacher/code/model.py:1394-2719, 3045-3122, 3462-3560``). One mapping
# per composer/teacher kind accepted by ``train.teacher_steps.make_mfm``;
# ``multi_fusion.py:116-120`` selects these classes by bare name, so every
# reference ``--model <ClassName>`` artifact has an ingestion path here.
# ---------------------------------------------------------------------------

def import_bert_attention(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """``transformer.py:56-70`` BertAttention → CrossAttentionFusion params
    (query/key/value from BertSelfAttention, out + LayerNorm from
    BertSelfOutput)."""
    return {
        "query": _lin(sd, f"{prefix}.self.query"),
        "key": _lin(sd, f"{prefix}.self.key"),
        "value": _lin(sd, f"{prefix}.self.value"),
        "out": _lin(sd, f"{prefix}.output.dense"),
        "norm": _ln(sd, f"{prefix}.output.LayerNorm"),
    }


def import_bare_encoder(sd: Dict[str, np.ndarray], prefix: str, d: int,
                        depth: int) -> dict:
    """A bare ``nn.TransformerEncoder`` (e.g. ThreeFusion3's ``tran``,
    model.py:2565-2567) → Encoder params."""
    return {f"layer{i}": _encoder_layer_params(sd, f"{prefix}.layers.{i}", d)
            for i in range(depth)}


def import_bottleneck2(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """Bottleneck_Perceptron_2_layer (model.py:390-408) → BottleneckMLP2."""
    return {"inp_fc": _lin(sd, f"{prefix}.inp_fc"),
            "out_fc": _lin(sd, f"{prefix}.out_fc")}


def import_mlp_enrich(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """MLP_Mix_Enrich (model.py:495-536) → MLPMixEnrich (sinusoidal pe is
    parameterless on both sides)."""
    return {"tok_mlp": {"inp_fc": _lin(sd, f"{prefix}.Tok_MLP.inp_fc"),
                        "out_fc": _lin(sd, f"{prefix}.Tok_MLP.out_fc")},
            "bot_mlp": import_bottleneck2(sd, f"{prefix}.Bot_MLP")}


def import_dga(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """DGAdaIN affines (model.py:2454-2468); the InstanceNorm1d is stateless
    (affine=False, track_running_stats=False)."""
    return {"affine_scale": _lin(sd, f"{prefix}.affine_scale"),
            "affine_bias": _lin(sd, f"{prefix}.affine_bias")}


def _multiset_tct(sd: Dict[str, np.ndarray], cfg: Config,
                  prefix: str = "bracnch") -> dict:
    """TrxBranch (model.py:1094-1128: TCT ModuleList keyed by temp_set order)
    → our TrxBranch classifier params."""
    return {"transformers": {
        f"tct_{s}": import_tct(sd, f"{prefix}.transformers.{i}")
        for i, s in enumerate(cfg.model.temp_set)}}


def _ctx_tct(sd: Dict[str, np.ndarray], cfg: Config,
             prefix: str = "bracnch") -> dict:
    """CTXBranch (model.py:3045-3077: a single frame-level CrossTransformer,
    not a ModuleList) → our ctx-head TrxBranch params (temp_set (1,))."""
    return {"transformers": {"tct_1": import_tct(sd, f"{prefix}.transformers")}}


def _pair(sd, cfg, prefix="fusion"):
    return import_stream_fusion(sd, prefix, 2, cfg.model.trans_linear_in_dim,
                                cfg.model.trans_num)


def _multi(sd, cfg, prefix="three_fusion", n=3, depth=None):
    return import_stream_fusion(sd, prefix, n,
                                cfg.model.trans_linear_in_dim,
                                depth or cfg.model.trans_num)


# per-kind builders: composer preset / teacher kind → params pytree matching
# make_mfm(cfg, kind=<kind>, batched=False).init's tree. Shared reference
# modules land on the FIRST flax index (composer setup collapses shared
# branches onto branch_modules_0 exactly where the reference reuses one
# module object).
_COMPOSED_IMPORTERS = {
    "TwoTRX": lambda sd, cfg: {
        "branch_modules_0": _pair(sd, cfg), "classifier": _multiset_tct(sd, cfg)},
    "TwoCross": lambda sd, cfg: {
        "branch_modules_0": import_bert_attention(sd, "fusion"),
        "classifier": _multiset_tct(sd, cfg)},
    "ThreeCross": lambda sd, cfg: {
        "branch_modules_0": import_bert_attention(sd, "fusion1"),
        "combiner": import_bert_attention(sd, "fusion2"),
        "classifier": _multiset_tct(sd, cfg)},
    "TwoTRXShuffleTime": lambda sd, cfg: {
        "branch_modules_0": _pair(sd, cfg), "classifier": _multiset_tct(sd, cfg)},
    "ThreeTRXShuffleTime": lambda sd, cfg: {
        "branch_modules_0": _pair(sd, cfg), "classifier": _multiset_tct(sd, cfg)},
    "ThreeTRXLRShiftLoopTime": lambda sd, cfg: {
        "branch_modules_0": _pair(sd, cfg), "classifier": _multiset_tct(sd, cfg)},
    "FourShiftFusion": lambda sd, cfg: {
        "branch_modules_0": _multi(sd, cfg, "four_fusion", 4),
        "branch_modules_1": _pair(sd, cfg),
        "classifier": _multiset_tct(sd, cfg)},
    "FiveShiftFusion": lambda sd, cfg: {
        "branch_modules_0": _multi(sd, cfg),
        "branch_modules_1": _pair(sd, cfg),
        "classifier": _multiset_tct(sd, cfg)},
    "OTAMThreeTRXShiftLoopTime": lambda sd, cfg: {
        "branch_modules_0": _multi(sd, cfg),
        "branch_modules_1": _pair(sd, cfg)},
    "ThreeTRXShiftLoopTime": lambda sd, cfg: {
        "branch_modules_0": _multi(sd, cfg),
        "branch_modules_1": _pair(sd, cfg),
        "classifier": _multiset_tct(sd, cfg)},
    # the reference's feature-space ScoreFusion CLASS (model.py:1960-1989:
    # one ThreeTransforTemproal into a TrxBranch — unrelated to
    # score_fusion_run.py's per-modality TSF) is structurally our ThreeStrm
    # preset with a different attribute name
    "ThreeStrm": lambda sd, cfg: {
        "branch_modules_0": _multi(
            sd, cfg, "fusion_temproal"
            if "fusion_temproal.f1.weight" in sd else "three_fusion"),
        "classifier": _multiset_tct(sd, cfg)},
    "FourStrm": lambda sd, cfg: {
        "branch_modules_0": _multi(sd, cfg, "fusion", 4, depth=2),
        "classifier": _multiset_tct(sd, cfg)},
    # bug-faithful FourStrm: only PEs 1-3 are live (shared_last_pe)
    "FourStrm_videoaxis": lambda sd, cfg: {
        "branch_modules_0": import_stream_fusion(
            sd, "fusion", 4, cfg.model.trans_linear_in_dim, 2, n_pes=3),
        "classifier": _multiset_tct(sd, cfg)},
    "TwoCombinationTRX": lambda sd, cfg: {
        "branch_modules_0": _pair(sd, cfg), "classifier": _multiset_tct(sd, cfg)},
    # TwoCombinationCTX wraps a whole TwoCross instance as self.fusion1
    # (model.py:2026) and calls only its .extract — the inner BertAttention
    # lives at fusion1.fusion and fusion1.bracnch's TCT is dead weight
    "TwoCombinationCTX": lambda sd, cfg: {
        "branch_modules_0": import_bert_attention(sd, "fusion1.fusion"),
        "classifier": _multiset_tct(sd, cfg)},
    "ThreeCombinationTRX": lambda sd, cfg: {
        "branch_modules_0": _pair(sd, cfg), "classifier": _multiset_tct(sd, cfg)},
    "TwoCombinationShiftTRX": lambda sd, cfg: {
        "branch_modules_0": _pair(sd, cfg), "classifier": _multiset_tct(sd, cfg)},
    "TwoCombinationTemTroShiftTRX": lambda sd, cfg: {
        "branch_modules_0": _multi(sd, cfg, depth=2),  # ThreeTransforTask: 2 layers
        "branch_modules_1": _pair(sd, cfg),
        "classifier": _multiset_tct(sd, cfg)},
    "ThreeTRXCombination": lambda sd, cfg: {
        "branch_modules_0": _multi(sd, cfg),
        "branch_modules_1": _pair(sd, cfg),
        "classifier": _multiset_tct(sd, cfg)},
    "ThreeFusion3": lambda sd, cfg: {
        "branch_modules_0": {"encoder": import_bare_encoder(
            sd, "tran", cfg.model.trans_linear_in_dim, 3)},
        "branch_modules_1": _pair(sd, cfg),
        "post_mlp": import_bottleneck2(sd, "MLP"),
        "classifier": _multiset_tct(sd, cfg)},
    "TwoFusionBatchFusion": lambda sd, cfg: {
        "branch_modules_0": {"f1": _lin(sd, "fusion2.f1")},
        "classifier": _multiset_tct(sd, cfg)},
    "TwoCTXShuffleTime": lambda sd, cfg: {
        "branch_modules_0": _pair(sd, cfg), "classifier": _ctx_tct(sd, cfg)},
    # bespoke (non-composer) teachers (tsf defined below: _tsf_import)
    "tsf": lambda sd, cfg: _tsf_import(sd, cfg),
    "dga": lambda sd, cfg: {
        "fusion1": _pair(sd, cfg, "fusion1"),
        "fusion2": import_dga(sd, "fusion2"),
        "branch": _multiset_tct(sd, cfg)},
    "dga2": lambda sd, cfg: {
        "fusion1": _pair(sd, cfg, "fusion1"),
        "fusion2": import_dga(sd, "fusion2"),
        "mlp1": import_mlp_enrich(sd, "mlp1"),
        "branch": _multiset_tct(sd, cfg)},
    "two_road": lambda sd, cfg: {
        **{f"pes_{i}": _trainable_pe_params(sd, f"fusion.positionEncoding{i+1}")
           for i in range(3)},
        "encoder": import_bare_encoder(
            sd, "fusion.transformer_encoder",
            3 * cfg.model.trans_linear_in_dim, 4),
        "proj": _lin(sd, "fusion.f1"),
        "road1": _lin(sd, "f1"), "road2": _lin(sd, "f2"),
        "mlp1": import_bottleneck2(sd, "MLP1"),
        "mlp2": import_bottleneck2(sd, "MLP2"),
        "branch": _multiset_tct(sd, cfg)},
}


def _tsf_import(sd: Dict[str, np.ndarray], cfg: Config) -> dict:
    """TSF (model.py:1154-1191): one TrxBranch per modality under the
    released attribute names m1_branch/skeleton_branch/flow_branch, consumed
    in --m1/--m2/--m3 order → our per-modality branch_{name}. TSF is a
    3-modality class; zip() would silently truncate a shorter/longer
    modalities tuple, so validate up front."""
    if len(cfg.model.modalities) != 3:
        raise ValueError(
            "TSF checkpoints are 3-modality (m1_branch/skeleton_branch/"
            f"flow_branch, model.py:1154-1191) but cfg.model.modalities="
            f"{cfg.model.modalities!r} has {len(cfg.model.modalities)} "
            "entries — pass exactly three --modalities")
    return {f"branch_{m}": _multiset_tct(sd, cfg, prefix=ref)
            for m, ref in zip(cfg.model.modalities,
                              ("m1_branch", "skeleton_branch", "flow_branch"))}


def load_composed_checkpoint(path: str, cfg: Config, kind: str) -> dict:
    """Reference fusion-teacher checkpoint of any ``--model`` class →
    variables for ``make_mfm(cfg, kind=<kind>, batched=False)``. ``kind``
    accepts the composer preset name, its ``*_faithful`` variant (same
    parameters, different shift specs), or a bespoke kind (dga/dga2/
    two_road); 'mfm' checkpoints go through :func:`load_mfm_checkpoint`."""
    base = kind[5:] if kind.startswith("otam:") else kind
    if base.endswith("_faithful"):
        base = base[: -len("_faithful")]
    # _videoaxis variants share their base preset's parameter tree unless an
    # explicit entry says otherwise (FourStrm_videoaxis drops the dead PE4)
    if base not in _COMPOSED_IMPORTERS and base.endswith("_videoaxis"):
        base = base[: -len("_videoaxis")]
    if base == "mfm":
        return load_mfm_checkpoint(path, cfg)
    if base not in _COMPOSED_IMPORTERS:
        raise ValueError(f"no composed-checkpoint importer for kind {kind!r}; "
                         f"known: {sorted(_COMPOSED_IMPORTERS)}")
    sd = load_state_dict(path)
    return {"params": _COMPOSED_IMPORTERS[base](sd, cfg)}


# ---------------------------------------------------------------------------
# Expert-model checkpoints beyond the TRX family (run.py --method artifacts)
# ---------------------------------------------------------------------------

def import_self_attn_bot(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """Self_Attn_Bot (model.py:430-494: q/k/v Linears + gamma + 3-layer
    bottleneck MLP; the sinusoidal pe is parameterless) → SelfAttnBot."""
    return {
        "query_proj": _lin(sd, f"{prefix}.query_proj"),
        "key_proj": _lin(sd, f"{prefix}.key_proj"),
        "value_proj": _lin(sd, f"{prefix}.value_conv"),  # released attr name
        "gamma": sd[f"{prefix}.gamma"].copy(),
        "bot_mlp": {"inp_fc": _lin(sd, f"{prefix}.Bot_MLP.inp_fc"),
                    "hid_fc": _lin(sd, f"{prefix}.Bot_MLP.hid_fc"),
                    "out_fc": _lin(sd, f"{prefix}.Bot_MLP.out_fc")},
    }


def load_cnn_strm_checkpoint(path: str, cfg: Config) -> dict:
    """CNN_STRM expert artifact (model.py:3123-3344) → Student variables for
    ``backbone="cnn_strm", classifier="strmclassifiers"``.

    Two structural notes: (a) our STRMBackbone carries a ``lift`` Dense that
    the reference's resnet50 CNN_STRM does not (its trunk dim already equals
    trans_linear_in_dim); the importer fills it with an exact identity.
    (b) the reference's DistanceLoss heads live in a plain PYTHON LIST
    (model.py:3153 — not an nn.ModuleList), so their clsW weights are
    absent from every released checkpoint; the classifier's ``distance``
    params are left to the caller (deep-merge over a fresh init)."""
    sd = load_state_dict(path)
    tct = _import_tct_stack(sd, cfg, artifact=path)
    if tct is None:
        raise ValueError(
            f"{path} holds no transformers.* TCT keys — not a CNN_STRM "
            "expert artifact (model.py:3123-3344 always registers the TCT "
            "ModuleList)")
    d = cfg.model.trans_linear_in_dim
    depth = _resnet_sd_depth(normalize_resnet_keys(sd, "resnet."))
    trunk_p, trunk_s = import_resnet_trunk(sd, depth, prefix="resnet.")
    eye = {"kernel": np.eye(d, dtype=np.float32),
           "bias": np.zeros((d,), np.float32)}
    backbone = {
        "trunk": trunk_p,
        "attn_pat": import_self_attn_bot(sd, "attn_pat"),
        "lift": eye,
        "fr_enrich": import_mlp_enrich(sd, "fr_enrich"),
    }
    return {"params": {"backbone": backbone,
                       "classifier": {"transformers": tct}},
            "batch_stats": {"backbone": {"trunk": trunk_s}}}


def load_teacher_ctx_checkpoint(path: str, cfg: Config) -> dict:
    """Teacher-half CTX expert artifact (model.py:2938-3014: resnet trunk →
    adap-max 4x4 → patch mean → video-axis TimeTransformer whose ``f1`` is
    dead → ``CrossTransformer`` frame-level TCT) → Student variables for
    ``backbone="resnet50_student", classifier="CTX_videoaxis"``.

    Geometry note: the released forward reshapes the pooled features as
    ``(-1, 512, 16)`` regardless of trunk width (model.py:2982-2983); with
    resnet50's 2048 channels that chunked reshape is algebraically the plain
    per-channel patch mean (the mean runs over the 16 spatial positions of
    each channel either way), so only 512-divisible trunks are coherent and
    the class only reassembles to (N, seq_len, trans_linear_in_dim) for
    trans_linear_in_dim == trunk width."""
    sd = load_state_dict(path)
    depth = _resnet_sd_depth(normalize_resnet_keys(sd, "resnet."))
    trunk_p, trunk_s = import_resnet_trunk(sd, depth, prefix="resnet.")
    tt = "time_trans"
    enc_depth = 0
    while f"{tt}.transformer_encoder.layers.{enc_depth}.linear1.weight" in sd:
        enc_depth += 1
    if enc_depth == 0:
        raise ValueError(
            f"{path} holds no time_trans encoder layers — not a teacher CTX "
            "artifact (model.py:2954 always registers the TimeTransformer)")
    d = sd[f"{tt}.f1.weight"].shape[0]   # f1 is dead but carries d_model
    classifier = {
        "time_trans": {
            "pe": _trainable_pe_params(sd, f"{tt}.positionEncoding"),
            "encoder": {f"layer{i}": _encoder_layer_params(
                sd, f"{tt}.transformer_encoder.layers.{i}", d)
                for i in range(enc_depth)},
        },
        "transformers": import_tct(sd, "transformers"),
    }
    return {"params": {"backbone": {"trunk": trunk_p},
                       "classifier": classifier},
            "batch_stats": {"backbone": {"trunk": trunk_s}}}


def load_skeleton_expert_checkpoint(path: str, cfg: Config) -> dict:
    """S3D expert artifact (model.py:2720-2818: S3DEncoder t_embedding
    Sequential + sinusoidal pe + encoder, plus the TCT stack) → Student
    variables for ``backbone="s3d"/"skeleton", classifier="TRX"``-family."""
    sd = load_state_dict(path)
    tct = _import_tct_stack(sd, cfg, artifact=path)
    if tct is None:
        raise ValueError(
            f"{path} holds no transformers.* TCT keys — not an S3D skeleton "
            "expert artifact (run.py builds S3D + the TCT head together)")
    depth = 0
    while f"encoder.t_tr.layers.{depth}.linear1.weight" in sd:
        depth += 1
    d = sd["encoder.t_embedding.0.weight"].shape[0]
    backbone = {
        "embed_in": _lin(sd, "encoder.t_embedding.0"),
        "embed_ln": _ln(sd, "encoder.t_embedding.1"),
        "embed_out": _lin(sd, "encoder.t_embedding.3"),
        "encoder": {f"layer{i}": _encoder_layer_params(
            sd, f"encoder.t_tr.layers.{i}", d) for i in range(depth)},
    }
    return {"params": {"backbone": backbone,
                       "classifier": {"transformers": tct}}}
