"""Teacher-side training steps.

- MFM fusion training (reference ``multi_fusion.py:381-494``): episodic
  training of the hierarchical fusion teacher over precomputed per-modality
  features. The reference's per-episode loss is the SUM of per-query CE
  divided by tasks_per_batch (``teacher/code/utils.py:179-194``,
  ``multi_fusion.py:485``) — kept exactly.
- Supervised pretraining (reference ``pretrain/pretrain.py``): plain CE over
  class labels for the per-modality resnet50 classifier.
- Expert episodic training (reference ``run.py``) needs no new step: it is the
  student pipeline with a resnet50 backbone, a TRX head and the 'ce' loss.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict
import flax.linen as nn

from ..config import Config
from ..models.teacher import (MFMTeacher, ScoreFusion, DGAFusionTeacher,
                              ComposedFusionTeacher, FUSION_PRESETS,
                              FUSION_PRESET_OPTIONS, FUSION_PRESET_EXTRACT,
                              TwoRoadFusionTeacher)
from ..models.backbones.classifier_net import ActionRecognitionNet
from ..utils.metrics import per_episode_accuracy
from .schedule import make_optimizer
from .steps import EpisodeBatch, TrainState


def sum_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-query CE summed (not meaned) — the teacher-side episodic loss."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.take_along_axis(logp, labels[..., None], axis=-1))


def make_mfm(cfg: Config, batched: bool = True, kind: str = "mfm",
             score_weights=None) -> nn.Module:
    """Build the fusion teacher: kind='mfm' (ThreeTRXShiftLoopTime) or
    kind='tsf' (per-modality TRX score fusion, reference score_fusion_run.py)."""
    kw = dict(way=cfg.episode.way, shot=cfg.episode.shot,
              seq_len=cfg.episode.seq_len,
              in_dim=cfg.model.trans_linear_in_dim,
              out_dim=cfg.model.trans_linear_out_dim,
              temp_set=cfg.model.temp_set, modalities=cfg.model.modalities,
              dropout=cfg.model.trans_dropout,
              use_pallas=cfg.model.use_pallas)
    if kind == "tsf":
        cls = ScoreFusion
        kw["weights"] = (tuple(score_weights) if score_weights is not None
                         else (1.0,) * len(cfg.model.modalities))
    elif kind in ("dga", "dga2"):
        cls = DGAFusionTeacher
        kw.update(depth=cfg.model.trans_num, with_enrich=(kind == "dga2"))
    elif kind in ("two_road", "two_road_videoaxis"):
        cls = TwoRoadFusionTeacher
        # _videoaxis: the released ThreeTranToTwo's no-batch_first encoder
        # (video-axis attention), for reference-checkpoint interop
        kw["video_axis"] = kind.endswith("_videoaxis")
    elif kind in FUSION_PRESETS or kind.startswith("otam:"):
        cls = ComposedFusionTeacher
        preset_name = kind[5:] if kind.startswith("otam:") else kind
        if preset_name not in FUSION_PRESETS:
            raise ValueError(f"unknown composer preset {preset_name!r}; "
                             f"choose from {sorted(FUSION_PRESETS)}")
        opts = dict(FUSION_PRESET_OPTIONS.get(preset_name, {}))
        if kind.startswith("otam:"):
            opts["head"] = "otam"     # otam: overrides a preset's head option
        else:
            opts.setdefault("head", "trx")
        kw.update(depth=cfg.model.trans_num,
                  branches=FUSION_PRESETS[preset_name],
                  extract_branches=FUSION_PRESET_EXTRACT.get(preset_name),
                  **opts)
    elif kind == "mfm":
        cls = MFMTeacher
        # anchor policy: the fusion teacher is a feature-space transformer
        # (precision-sensitive, no conv trunk to justify bf16), so it runs at
        # the fp32 anchor — widened to fp64 under x64 golden runs
        from ..ops.dtypes import anchor_dtype
        kw.update(depth=cfg.model.trans_num, shirt_num=cfg.model.shirt_num,
                  compute_dtype=anchor_dtype(jnp.dtype(cfg.model.compute_dtype)))
    else:
        raise ValueError(
            f"unknown fusion kind {kind!r}; choose mfm | tsf | dga | dga2 | "
            f"two_road | two_road_videoaxis | otam:<preset> | one of "
            f"{sorted(FUSION_PRESETS)}")
    if not batched:
        return cls(**kw)
    vcls = nn.vmap(cls, in_axes=(0, 0, 0, None), out_axes=0,
                   variable_axes={"params": None},
                   split_rngs={"params": False, "dropout": True})
    return vcls(**kw)


def create_mfm_train_state(cfg: Config, rng, sample_batch: EpisodeBatch,
                           kind: str = "mfm", score_weights=None) -> TrainState:
    """sample_batch carries modality-dict feats in support/query_clips."""
    model = make_mfm(cfg, kind=kind, score_weights=score_weights)
    one = jax.tree_util.tree_map(lambda x: x[:1], sample_batch)
    variables = model.init(rng, one.support_clips, one.support_labels,
                           one.query_clips, False)
    tx = make_optimizer(cfg.train.optimizer, cfg.train.learning_rate,
                        cfg.train.sch, cfg.train.sch_gamma,
                        cfg.train.tasks_per_batch)
    params = variables["params"]
    return TrainState(step=jnp.zeros((), jnp.int32),
                      episodes_seen=jnp.zeros((), jnp.int32),
                      params=params, batch_stats=FrozenDict(),
                      opt_state=tx.init(params), rng=jax.random.split(rng)[0],
                      tx=tx)


def make_mfm_train_step(cfg: Config, kind: str = "mfm",
                        score_weights=None) -> Callable:
    model = make_mfm(cfg, kind=kind, score_weights=score_weights)
    tpb = cfg.train.tasks_per_batch

    def loss_fn(params, batch: EpisodeBatch, rng):
        out = model.apply({"params": params}, batch.support_clips,
                          batch.support_labels, batch.query_clips, True,
                          rngs={"dropout": rng})
        logits = out["logits"]
        per_ep = jax.vmap(sum_ce)(logits, batch.query_labels) / tpb
        total = jnp.sum(per_ep)
        acc = per_episode_accuracy(logits, batch.query_labels)
        return total, {"task_loss": total, "accuracy": jnp.mean(acc)}

    def step(state: TrainState, batch: EpisodeBatch):
        rng, step_rng = jax.random.split(state.rng)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        e = batch.support_labels.shape[0]
        return state.replace(step=state.step + 1,
                             episodes_seen=state.episodes_seen + e,
                             params=new_params, opt_state=new_opt,
                             rng=rng), metrics

    return step


def make_mfm_eval_step(cfg: Config, kind: str = "mfm",
                       score_weights=None) -> Callable:
    model = make_mfm(cfg, kind=kind, score_weights=score_weights)

    def eval_step(variables, batch: EpisodeBatch):
        out = model.apply(variables, batch.support_clips, batch.support_labels,
                          batch.query_clips, False)
        return per_episode_accuracy(out["logits"], batch.query_labels)

    return eval_step


# ---------------------------------------------------------------------------
# Supervised pretraining (per-modality resnet classifier)
# ---------------------------------------------------------------------------

def load_tsf_branches(params, branch_ckpts, temp_set=None) -> Any:
    """Graft separately-trained per-modality experts into a ScoreFusion's
    branches (reference ``score_fusion_run.py`` ``--rgb/skeleton/flow_
    test_model_path``): each expert checkpoint's episodic head
    (``params/classifier/transformers``) replaces ``branch_<modality>``.

    ``branch_ckpts``: {modality: checkpoint_dir_or_torch_pt}. A ``.pt``/
    ``.pth`` value is read as a released run.py expert artifact
    (``transformers.{i}`` ModuleList, model.py:558) — exactly what the
    reference's score-fusion flags consumed; ``temp_set`` gives the
    ModuleList order for multi-set experts. Returns updated params.
    """
    from .checkpoint import restore_params
    new = dict(params)
    for m, path in branch_ckpts.items():
        key = f"branch_{m}"
        if key not in new:
            raise KeyError(f"{key} not in ScoreFusion params "
                           f"({sorted(new)}) — is --fusion tsf set?")
        if str(path).endswith((".pt", ".pth")):
            from ..tools.torch_import import load_state_dict, import_tct
            sd = load_state_dict(path)
            n = 0
            while f"transformers.{n}.k_linear.weight" in sd:
                n += 1
            if n == 0:
                raise KeyError(f"{path} has no transformers.N TCT sets — "
                               "not a run.py expert checkpoint")
            if n == 1:
                src = import_tct(sd, "transformers.0")
            else:
                if temp_set is None or len(temp_set) != n:
                    raise ValueError(
                        f"{path} holds {n} TCT sets; pass temp_set with that "
                        f"many entries (got {temp_set}) for the ModuleList "
                        "order")
                src = {f"tct_{s}": import_tct(sd, f"transformers.{i}")
                       for i, s in enumerate(temp_set)}
        else:
            expert = restore_params(path)
            head = expert.get("classifier", expert)
            src = head.get("transformers", head)
        tpl = new[key]["transformers"]
        if set(tpl) != set(src):
            if any(k.startswith("tct_") for k in src):
                raise ValueError(
                    f"temp_set mismatch grafting {path} into {key}: expert "
                    f"has sets {sorted(src)}, TSF branch expects "
                    f"{sorted(tpl)}")
            # single-set expert stores a flat TCT; the branch's MultiSetTCT
            # nests per-set children (tct_<n>) — replicate into each set
            src = {k: src for k in tpl}
        head = {"transformers": src}
        new[key] = jax.tree_util.tree_map(
            lambda tpl, src: jnp.asarray(src).astype(tpl.dtype).reshape(tpl.shape),
            new[key], head)
    return new


def make_pretrain_model(cfg: Config, num_classes: int,
                        arch: str = "resnet50") -> nn.Module:
    """arch: resnet18/34/50 (Action_Recognition_Resnet50 family) or
    deit_small (the model_distillation ViT, model.py:2142-2157)."""
    if arch == "deit_small":
        from ..models.backbones.classifier_net import ViTClassifier
        return ViTClassifier(num_classes=num_classes,
                             img_size=cfg.episode.img_size,
                             compute_dtype=jnp.dtype(cfg.model.compute_dtype))
    if arch not in ("resnet18", "resnet34", "resnet50"):
        raise ValueError(f"unknown pretrain arch {arch!r}; choose "
                         "resnet18 | resnet34 | resnet50 | deit_small")
    return ActionRecognitionNet(num_classes=num_classes,
                                depth=int(arch.replace("resnet", "")),
                                compute_dtype=jnp.dtype(cfg.model.compute_dtype),
                                remat=cfg.model.remat)


def create_pretrain_state(cfg: Config, rng, num_classes: int,
                          sample_clips, arch: str = "resnet50",
                          init_variables=None, lr_groups=None,
                          steps_per_epoch: int = 0) -> Tuple[TrainState, nn.Module]:
    """``init_variables``: PARTIAL variables (e.g. a zoo trunk from
    ``tools.torch_import.load_pretrain_init``) deep-merged over the fresh
    init — the ``pretrained=True`` warm-start of the reference's supervised
    stage (``pretrain/pretrain.py``, ``model.py:2146``).

    ``lr_groups=(lr_1, lr_2)`` reproduces the reference's dual SGD: the
    trunk (``model.convnet``) at ``lr_1`` and the classifier head at
    ``lr_2``, both momentum 0.9 (pretrain.py:31-32). With
    ``steps_per_epoch`` set, each group follows the reference's
    ``StepLR(step_size=10, gamma=0.1)`` stepped at EPOCH START
    (pretrain.py:33-38, 108-109): epoch e runs at ``0.1 ** ((e+1) // 10)``
    of the base rate. Default (None) keeps a single SGD at
    ``cfg.train.learning_rate``."""
    model = make_pretrain_model(cfg, num_classes, arch)
    variables = model.init(rng, sample_clips[:1], train=False)
    if init_variables is not None:
        from ..utils.tree import deep_merge_variables
        variables = jax.tree_util.tree_map(
            jnp.asarray, deep_merge_variables(variables, init_variables))
    if lr_groups is None:
        tx = optax.sgd(cfg.train.learning_rate, momentum=0.9)
    else:
        lr_1, lr_2 = lr_groups

        def sched(base):
            if not steps_per_epoch:
                return base
            return lambda step: base * 0.1 ** ((step // steps_per_epoch + 1)
                                               // 10)

        tx = optax.multi_transform(
            {"trunk": optax.sgd(sched(lr_1), momentum=0.9),
             "head": optax.sgd(sched(lr_2), momentum=0.9)},
            lambda params: {k: "head" if k == "fc" else "trunk"
                            for k in params})
    params = variables["params"]
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       episodes_seen=jnp.zeros((), jnp.int32),
                       params=params,
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=tx.init(params),
                       rng=jax.random.split(rng)[0], tx=tx)
    return state, model


def make_pretrain_step(cfg: Config, model: nn.Module) -> Callable:
    def loss_fn(params, batch_stats, clips, labels):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, clips, train=True,
            mutable=["batch_stats"])
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        new_stats = mutated.get("batch_stats", FrozenDict())  # ViT: stat-free
        return loss, (new_stats, {"loss": loss, "accuracy": acc})

    def step(state: TrainState, clips, labels):
        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, clips, labels)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        # episodes_seen doubles as the orbax checkpoint key
        # (CheckpointManager.save) — for the non-episodic pretrain stage it
        # counts SAMPLES; leaving it at 0 made orbax silently skip every
        # epoch save after the first
        return state.replace(step=state.step + 1,
                             episodes_seen=state.episodes_seen + clips.shape[0],
                             params=optax.apply_updates(state.params, updates),
                             batch_stats=new_stats, opt_state=new_opt), metrics

    return step
