"""Student / Teacher episode models and the selection registries.

TPU-native equivalent of ``model/model_select.py:17-241``: string-keyed
registries over backbones and classifier heads, composed into a ``Student``
(CNN backbone + episodic head) and a ``Teacher`` (head over precomputed fused
features). Unlike the reference there is no ``DataParallel`` surgery — data
parallelism is a mesh axis handled by pjit (see ``litemkd_tpu.parallel``).

Batched variants process a whole episode batch per step — the TPU-native
replacement for the reference's sequential 16-episode gradient accumulation
(``trainwandb.py:141-145``): the CNN trunk sees one fused
(episodes × videos × frames) image batch (large, static, MXU-friendly, one BN
batch) and the episodic heads are ``nn.vmap``-ed over the episode axis with
shared parameters. Single-episode and batched wrappers use the same submodule
names ("backbone", "classifier"), so their parameter pytrees are identical.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict

import jax.numpy as jnp
import flax.linen as nn

from ..config import Config
from .backbones.resnet import ResNetBackbone, FeatureBackbone
from .backbones.mobilenet import MobileNetV3Backbone
from .backbones.strm import STRMBackbone
from .backbones.skeleton import SkeletonEncoder
from .classifiers.trx import (TRX, TRX_sup, TRX_2fc, TRX_2fcsup,
                              TRX_2fcsup_fixed, TRX_1fc_sup, TRX_2fcsup_2)
from .classifiers.edist import (EDist, CosDistance, EDistFC2, EDistFC2Sup,
                                EDist1FCSup)
from .classifiers.strm import STRMClassifier, STRMClassifierSup, STRM1FCSup
from .classifiers.otam import OTAMClassifier, TRXMulti
from .classifiers.ctx import CTXClassifier, CTXVideoAxis


# ---------------------------------------------------------------------------
# Registries (reference: model_select.py:167-199 and 220-233)
# ---------------------------------------------------------------------------

BACKBONES: Dict[str, Callable[..., nn.Module]] = {
    "resnet18_student": partial(ResNetBackbone, depth=18, num_fc=1),
    "resnet18_2fc": partial(ResNetBackbone, depth=18, num_fc=2),
    "resnet34_student": partial(ResNetBackbone, depth=34, num_fc=1),
    "resnet34_2fc": partial(ResNetBackbone, depth=34, num_fc=2),
    "resnet50_student": partial(ResNetBackbone, depth=50, num_fc=0),
    # run.py expert trunks at --method resnet18/34 (model.py:551-556):
    # adap-max patch-mean features at the trunk width, no fc
    "resnet18_expert": partial(ResNetBackbone, depth=18, num_fc=0),
    "resnet34_expert": partial(ResNetBackbone, depth=34, num_fc=0),
    "resnet50_gap": partial(ResNetBackbone, depth=50, num_fc=0, pool="gap"),
    "resnet18_gap": partial(ResNetBackbone, depth=18, num_fc=0, pool="gap"),
    "resnet50_2fc": partial(ResNetBackbone, depth=50, num_fc=2),
    "meta_baseline": partial(ResNetBackbone, depth=50, num_fc=1),
    "meta_baseline_fc2": partial(ResNetBackbone, depth=50, num_fc=2),
    "mobilenetv3_large": partial(MobileNetV3Backbone, variant="large", num_fc=1),
    "mobilenetv3_large_2fc": partial(MobileNetV3Backbone, variant="large", num_fc=2),
    "mobilenetv3_small": partial(MobileNetV3Backbone, variant="small", num_fc=1),
    "mobilenetv3_small_2fc": partial(MobileNetV3Backbone, variant="small", num_fc=2),
    "strm18_student": partial(STRMBackbone, depth=18, num_fc=2),
    "strm18_1fc": partial(STRMBackbone, depth=18, num_fc=1),
    "strmbackbone": partial(STRMBackbone, depth=18, num_fc=1),
    "strm50_student": partial(STRMBackbone, depth=50, num_fc=1),
    "cnn_strm": partial(STRMBackbone, depth=50, num_fc=1),
    "feature": lambda name=None, **kw: FeatureBackbone(name=name),
}


def _skeleton_entry(video_axis: bool):
    """Factory for the skeleton backbones: drops the CNN-only kwargs
    (compute_dtype etc.) but MUST forward name= — the "backbone" module name
    is the pytree invariant every importer/exporter addresses. The
    *_videoaxis variants reproduce the released S3DEncoder's no-batch_first
    video-axis attention (model.py:2807) for checkpoint interop."""
    return lambda out_dim=2048, name=None, **kw: SkeletonEncoder(
        out_dim=out_dim, video_axis=video_axis, name=name)


BACKBONES.update({
    "s3d": _skeleton_entry(False),
    "skeleton": _skeleton_entry(False),
    "s3d_videoaxis": _skeleton_entry(True),
    "skeleton_videoaxis": _skeleton_entry(True),
})

CLASSIFIERS: Dict[str, Any] = {
    "TRX": TRX,
    "TRX_fixed": TRX,
    "TRX_sup": TRX_sup,
    "TRX_sup_fixed": TRX_sup,
    "TRX_2fc": TRX_2fc,
    "TRX_2fcsup": TRX_2fcsup,
    "TRX_2fcsup_fixed": TRX_2fcsup_fixed,
    "TRX_1fc_sup": TRX_1fc_sup,
    # recovered from the release's compiled-only classifier (see trx.py)
    "TRX_2fcsup_2": TRX_2fcsup_2,
    "TRX_2fcsup_2_fixed": TRX_2fcsup_fixed,
    "cos": CosDistance,
    "e_dist": EDist,
    "e_dist_fc2": EDistFC2,
    "e_dist_fc2_sup": EDistFC2Sup,
    "e_dist_fc2_sup_fixed": EDist1FCSup,
    "e_dist_1fc_sup": EDist1FCSup,
    "strmclassifiers": STRMClassifier,
    "strm_res18": STRMClassifier,
    "strm_res18_sup": STRMClassifierSup,
    "strm_1fc_sup": STRM1FCSup,
    "OTAM": OTAMClassifier,
    "CNN_OTAM": OTAMClassifier,
    "TRX_multi": TRXMulti,
    "TRM": TRXMulti,
    "CTX": CTXClassifier,
    "CTX_videoaxis": CTXVideoAxis,
}

# teacher selection aliases (reference model_select.py:220-233)
TEACHER_ALIASES: Dict[str, str] = {
    "cos": "cos",
    "e_dist": "e_dist",
    "e_dist_fc2_sup": "e_dist_fc2_sup_fixed",
    "train_teacher": "TRX",
    "test_teacher": "TRX_fixed",
    "train_teacher_TRX_sup": "TRX_sup",
    "test_teacher_TRX_sup_fixed": "TRX_sup_fixed",
    "train_teacher_TRX_2fcsup": "TRX_2fcsup",
    "test_teacher_TRX_2fcsup_fixed": "TRX_2fcsup_fixed",
}


def resolve_teacher(name: str) -> str:
    """Map a reference teacher-selection name (or any registered classifier
    name directly) to its CLASSIFIERS key, with a clear error otherwise."""
    resolved = TEACHER_ALIASES.get(name, name)
    if resolved not in CLASSIFIERS:
        raise ValueError(
            f"unknown teacher head {name!r}; expected one of "
            f"{sorted(TEACHER_ALIASES)} or a classifier name "
            f"{sorted(CLASSIFIERS)}")
    return resolved


def _head_kwargs(name: str, cfg: Config) -> Dict[str, Any]:
    kw = dict(way=cfg.episode.way, shot=cfg.episode.shot,
              seq_len=cfg.episode.seq_len)
    cls = CLASSIFIERS[name]
    if issubclass(cls, CTXClassifier):
        kw.update(in_dim=cfg.model.trans_linear_in_dim,
                  out_dim=cfg.model.trans_linear_out_dim,
                  dropout=cfg.model.trans_dropout)
    if issubclass(cls, (TRX, STRMClassifier)):
        kw.update(in_dim=cfg.model.trans_linear_in_dim,
                  out_dim=cfg.model.trans_linear_out_dim,
                  set_size=cfg.model.temp_set[0],
                  dropout=cfg.model.trans_dropout)
    if issubclass(cls, TRXMulti):
        kw.update(in_dim=cfg.model.trans_linear_in_dim,
                  out_dim=cfg.model.trans_linear_out_dim,
                  temp_set=cfg.model.temp_set,
                  dropout=cfg.model.trans_dropout)
    if issubclass(cls, (TRX, TRXMulti, STRMClassifier, CTXClassifier)):
        # anchor policy: heads are precision-sensitive (attention/softmax/
        # distance math), so they run at the fp32 anchor regardless of a
        # bf16 trunk — widened to fp64 under x64 golden runs (the same
        # policy make_mfm applies to the fusion teacher)
        from ..ops.dtypes import anchor_dtype
        kw.update(use_pallas=cfg.model.use_pallas,
                  compute_dtype=anchor_dtype(jnp.dtype(cfg.model.compute_dtype)))
    return kw


def make_classifier(name: str, cfg: Config, module_name: str = "classifier") -> nn.Module:
    return CLASSIFIERS[name](**_head_kwargs(name, cfg), name=module_name)


def make_vmapped_classifier(name: str, cfg: Config,
                            module_name: str = "classifier") -> nn.Module:
    """Lift a classifier over a leading episode axis with shared params."""
    vcls = nn.vmap(
        CLASSIFIERS[name],
        in_axes=(0, 0, 0, None), out_axes=0,
        variable_axes={"params": None},
        split_rngs={"params": False, "dropout": True},
    )
    return vcls(**_head_kwargs(name, cfg), name=module_name)


def make_backbone(name: str, cfg: Config, module_name: str = "backbone") -> nn.Module:
    if name == "feature":
        return FeatureBackbone(name=module_name)
    kw = dict(out_dim=cfg.model.trans_linear_in_dim,
              compute_dtype=jnp.dtype(cfg.model.compute_dtype),
              name=module_name)
    if name.startswith(("resnet", "meta_baseline", "strm", "cnn_strm",
                        "mobilenetv3")):
        kw["remat"] = cfg.model.remat
    if name.startswith(("resnet", "meta_baseline")):
        kw["pallas_bn"] = cfg.model.pallas_bn
    if name.startswith(("resnet", "meta_baseline", "strm", "cnn_strm",
                        "mobilenetv3")):
        kw["freeze_bn"] = cfg.model.freeze_bn
    if name.startswith(("strm", "cnn_strm")):
        # enrichment-block PE dropout (see STRMBackbone.dropout for the
        # hardcoded-0.1 reference divergence note)
        kw["dropout"] = cfg.model.trans_dropout
    return BACKBONES[name](**kw)


# ---------------------------------------------------------------------------
# Episode models
# ---------------------------------------------------------------------------

def batch_sensitive_backbone(name: str) -> bool:
    """Video-axis (bug-faithful ``*_videoaxis``) backbones attend ACROSS the
    clips of one backbone batch, so batch composition is part of the
    semantics: context and target must be encoded separately, per episode,
    exactly as the reference does (S3D.forward model.py:2741-2743 runs each
    side through the encoder on its own). Everything else is per-clip and
    rides the fused single-batch path."""
    return name.endswith("_videoaxis")


class Student(nn.Module):
    """Backbone + episodic head over one episode's raw clips
    (reference model_select.py:17-36).

    ``__call__(context_clips, context_labels, target_clips, train)`` returns
    ``{'logits', 'context_features', 'target_features'}``.
    """

    cfg: Config

    @nn.compact
    def __call__(self, context_clips, context_labels, target_clips, *, train: bool):
        backbone = make_backbone(self.cfg.model.backbone, self.cfg)
        head = make_classifier(self.cfg.model.classifier, self.cfg)

        if batch_sensitive_backbone(self.cfg.model.backbone):
            ctx = backbone(context_clips, train=train)
            tgt = backbone(target_clips, train=train)
        else:
            n_ctx = context_clips.shape[0]
            clips = jnp.concatenate([context_clips, target_clips], axis=0)
            feats = backbone(clips, train=train)
            if isinstance(feats, dict):
                ctx = {k: feats[k][:n_ctx] for k in feats}
                tgt = {k: feats[k][n_ctx:] for k in feats}
            else:
                ctx, tgt = feats[:n_ctx], feats[n_ctx:]
        logits = head(ctx, context_labels, tgt, train=train)
        return {"logits": logits, "context_features": ctx, "target_features": tgt}


class BatchedStudent(nn.Module):
    """Student over a batch of episodes: context_clips (E, S, T, H, W, 3),
    context_labels (E, S), target_clips (E, Q, T, H, W, 3) → branch logits with
    a leading E axis."""

    cfg: Config

    @nn.compact
    def __call__(self, context_clips, context_labels, target_clips, *, train: bool):
        e, s = context_clips.shape[0], context_clips.shape[1]
        q = target_clips.shape[1]
        backbone = make_backbone(self.cfg.model.backbone, self.cfg)

        if batch_sensitive_backbone(self.cfg.model.backbone):
            # video-axis backbones: one backbone batch per (episode, side),
            # as the reference runs them — an unrolled loop (e is static and
            # small) calling ONE module keeps the params shared
            def per_side(clips):
                outs = [backbone(clips[i], train=train) for i in range(e)]
                if isinstance(outs[0], dict):
                    return {k: jnp.stack([o[k] for o in outs])
                            for k in outs[0]}
                return jnp.stack(outs)

            ctx, tgt = per_side(context_clips), per_side(target_clips)
        else:
            clips = jnp.concatenate(
                [context_clips.reshape(e * s, *context_clips.shape[2:]),
                 target_clips.reshape(e * q, *target_clips.shape[2:])], axis=0)
            feats = backbone(clips, train=train)

            def split(f):
                ctx = f[: e * s].reshape(e, s, *f.shape[1:])
                tgt = f[e * s:].reshape(e, q, *f.shape[1:])
                return ctx, tgt

            if isinstance(feats, dict):
                pairs = {k: split(v) for k, v in feats.items()}
                ctx = {k: v[0] for k, v in pairs.items()}
                tgt = {k: v[1] for k, v in pairs.items()}
            else:
                ctx, tgt = split(feats)

        vhead = make_vmapped_classifier(self.cfg.model.classifier, self.cfg)
        logits = vhead(ctx, context_labels, tgt, train)
        return {"logits": logits, "context_features": ctx, "target_features": tgt}


class Teacher(nn.Module):
    """Episodic head over one episode's precomputed fused teacher features
    (reference model_select.py:38-49). Parameters live in a separate pytree
    from the student's, so no gradient flows into them during distillation."""

    cfg: Config

    @nn.compact
    def __call__(self, context_feats, context_labels, target_feats, *, train: bool):
        name = resolve_teacher(self.cfg.model.teacher)
        head = make_classifier(name, self.cfg)
        return {"logits": head(context_feats, context_labels, target_feats,
                               train=train)}


class BatchedTeacher(nn.Module):
    """Teacher head vmapped over an episode batch of fused features."""

    cfg: Config

    @nn.compact
    def __call__(self, context_feats, context_labels, target_feats, *, train: bool):
        name = resolve_teacher(self.cfg.model.teacher)
        vhead = make_vmapped_classifier(name, self.cfg)
        return {"logits": vhead(context_feats, context_labels, target_feats,
                                train)}
