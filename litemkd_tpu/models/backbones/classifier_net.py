"""Supervised per-modality classifier network.

Rebuild of ``Action_Recognition_Resnet50`` (``teacher/code/model.py:3345-3366``)
used by the pretraining stage (``teacher/code/pretrain/pretrain.py``): resnet
trunk → global average pool → mean over frames → linear classifier; plus a
per-frame feature extractor for the expert-feature dump.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .resnet import ResNetTrunk, _STAGES, flatten_clip_frames
from ...ops.dtypes import anchor, anchor_dtype
from ...ops.torch_init import torch_linear_kernel_init, torch_linear_bias_init


class ViTClassifier(nn.Module):
    """DeiT-small-style ViT classifier — the structural equivalent of
    ``model_distillation`` (``teacher/code/model.py:2142-2157``), which wraps
    timm's ``deit_small_distilled_patch16_224`` plus a linear head. timm and
    its pretrained weights are unavailable offline, so this is the same
    trunk architecture trained from scratch: patch16 embed, cls + distill
    tokens, learned positional embeddings, pre-LN encoder blocks.

    Head simplification (deliberate divergence): ONE linear head over the
    mean of the two special TOKENS. timm's distilled eval instead averages
    the LOGITS of two separate heads, (head(cls)+head_dist(dist))/2, which a
    single fc cannot express with distinct head weights (with tied heads the
    two forms coincide). ``import_deit_trunk`` imports the TRUNK only and
    leaves ``fc`` freshly initialized (the reference replaces the head with
    its own nn.Linear anyway, model.py:2146-2151)."""

    num_classes: int
    img_size: int = 224
    patch: int = 16
    dim: int = 384
    depth: int = 12
    heads: int = 6
    mlp_ratio: int = 4
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        """(B, H, W, 3) → (B, num_classes) logits; a (B, T, H, W, 3) clip is
        scored per frame and logits averaged over T (the clip adapter the
        pretrain loop expects)."""
        frames_per_clip = None
        if images.ndim == 5:
            frames_per_clip = images.shape[1]
            images = images.reshape(-1, *images.shape[2:])
        if images.shape[1] != self.img_size or images.shape[2] != self.img_size:
            raise ValueError(f"ViTClassifier(img_size={self.img_size}) got "
                             f"{images.shape[1]}x{images.shape[2]} input — "
                             "pos_embed is sized at init and cannot adapt")
        cd = self.compute_dtype
        x = images.astype(cd)
        if images.dtype == jnp.uint8:
            x = x / 255.0
        b = x.shape[0]
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    (self.patch, self.patch), padding="VALID", dtype=cd,
                    name="patch_embed")(x)
        x = x.reshape(b, -1, self.dim)
        n_tok = x.shape[1]
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.dim))
        dist = self.param("dist_token", nn.initializers.normal(0.02),
                          (1, 1, self.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n_tok + 2, self.dim))
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)).astype(cd),
                             jnp.tile(dist, (b, 1, 1)).astype(cd), x], axis=1)
        x = x + pos.astype(cd)
        for i in range(self.depth):
            # pre-LN block (ViT/DeiT)
            h = nn.LayerNorm(dtype=anchor_dtype(cd), name=f"norm1_{i}")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=cd, deterministic=not train,
                dropout_rate=self.dropout, name=f"attn_{i}")(h, h)
            x = x + h.astype(x.dtype)
            h = nn.LayerNorm(dtype=anchor_dtype(cd), name=f"norm2_{i}")(x)
            h = nn.Dense(self.dim * self.mlp_ratio, dtype=cd,
                         name=f"mlp_in_{i}")(h)
            h = nn.Dense(self.dim, dtype=cd, name=f"mlp_out_{i}")(nn.gelu(h))
            x = x + h.astype(x.dtype)
        x = nn.LayerNorm(dtype=anchor_dtype(cd), name="norm")(x)
        feat = (x[:, 0] + x[:, 1]) / 2.0          # mean of cls + dist tokens
        logits = nn.Dense(self.num_classes, dtype=anchor_dtype(cd),
                          kernel_init=torch_linear_kernel_init(),
                          bias_init=torch_linear_bias_init(self.dim),
                          name="fc")(anchor(feat))
        if frames_per_clip is not None:
            logits = logits.reshape(-1, frames_per_clip,
                                    self.num_classes).mean(axis=1)
        return logits


class ActionRecognitionNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False

    def setup(self):
        self.trunk = ResNetTrunk(self.depth, self.compute_dtype, self.remat)
        trunk_dim = _STAGES[self.depth][2]
        self.fc = nn.Dense(self.num_classes,
                           dtype=anchor_dtype(self.compute_dtype),
                           kernel_init=torch_linear_kernel_init(),
                           bias_init=torch_linear_bias_init(trunk_dim))

    def features(self, clips: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        """(B, T, H, W, 3) → (B, T, D) global-avg-pooled trunk features —
        the classification path's pooling (``model.py:3357``:
        ``convnet(x).squeeze()`` with torchvision's avgpool retained)."""
        x, b, t = flatten_clip_frames(clips, self.compute_dtype)
        x = self.trunk(x, train=train)
        x = anchor(x).mean(axis=(1, 2))               # global average pool
        return x.reshape(b, t, -1)

    def expert_features(self, clips: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        """(B, T, H, W, 3) → (B, T, D) expert-dump features: AdaptiveMaxPool2d
        (4,4) → mean over the 16 patches — the math ``extract_feature.py``
        actually dumps (``model.py:679-703``), which differs from the GAP
        classification features above."""
        from .resnet import adaptive_max_pool_2d
        x, b, t = flatten_clip_frames(clips, self.compute_dtype)
        x = self.trunk(x, train=train)
        x = anchor(adaptive_max_pool_2d(x, (4, 4)))
        return x.reshape(b * t, 16, -1).mean(axis=1).reshape(b, t, -1)

    def __call__(self, clips: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        """(B, T, H, W, 3) → (B, num_classes) logits."""
        feats = self.features(clips, train=train)
        return self.fc(feats.mean(axis=1))
