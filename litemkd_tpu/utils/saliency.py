"""Grad-CAM saliency for the CNN backbones.

Replaces the reference's ``heatmap_vis.py`` (pytorch_grad_cam over resnet18
layer4): class-activation maps from the gradient of a class score w.r.t. the
last trunk feature map, computed with ``jax.grad`` — no hooks needed, the
functional style gives the intermediate activation directly.
"""
from __future__ import annotations

from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.backbones.resnet import ResNetTrunk


def grad_cam(trunk_apply: Callable[[jnp.ndarray], jnp.ndarray],
             head_apply: Callable[[jnp.ndarray], jnp.ndarray],
             images: jnp.ndarray, class_idx: int) -> np.ndarray:
    """Generic Grad-CAM: trunk_apply: images → feature maps (N, h, w, c);
    head_apply: feature maps → (N, n_classes) logits. Returns (N, h, w) maps
    normalized to [0, 1]."""
    fmaps = trunk_apply(images)

    def score(f):
        return head_apply(f)[:, class_idx].sum()

    grads = jax.grad(score)(fmaps)                       # (N, h, w, c)
    weights = grads.mean(axis=(1, 2), keepdims=True)     # GAP over positions
    cam = jnp.maximum((weights * fmaps).sum(axis=-1), 0.0)
    cam = cam / (cam.max(axis=(1, 2), keepdims=True) + 1e-8)
    return np.asarray(cam)


def _trunk_and_head(variables, depth: int):
    trunk = ResNetTrunk(depth=depth, compute_dtype=jnp.float32)
    t_vars = {"params": variables["params"]["trunk"],
              "batch_stats": variables.get("batch_stats", {}).get("trunk", {})}
    fc = variables["params"]["fc"]

    def trunk_apply(x):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        return trunk.apply(t_vars, x, train=False)

    def head_apply(f):
        pooled = f.mean(axis=(1, 2))
        return pooled @ fc["kernel"] + fc["bias"]

    return trunk_apply, head_apply


def backbone_predict(variables, images: jnp.ndarray,
                     depth: int = 18) -> np.ndarray:
    """(N, n_classes) logits from an ActionRecognitionNet-layout variables
    tree — used to pick Grad-CAM's target class when none is given (the
    reference's ``target_category=None`` default, heatmap_vis.py:20)."""
    trunk_apply, head_apply = _trunk_and_head(variables, depth)
    return np.asarray(head_apply(trunk_apply(images)))


def cam_overlay(cam: np.ndarray, image: np.ndarray) -> np.ndarray:
    """``show_cam_on_image`` analog (heatmap_vis.py:46-47): jet-colormap the
    (h, w) cam, bilinear-resize to the [0,1] float (H, W, 3) image, add, and
    renormalize by the max. Returns a uint8 (H, W, 3) overlay."""
    from matplotlib import colormaps
    h, w = image.shape[:2]
    cam_hw = np.asarray(jax.image.resize(jnp.asarray(cam), (h, w), "bilinear"))
    heat = colormaps["jet"](np.clip(cam_hw, 0.0, 1.0))[..., :3]
    over = heat + image.astype(np.float32)
    over = over / max(float(over.max()), 1e-8)
    return (over * 255.0).astype(np.uint8)


def backbone_grad_cam(variables, images: jnp.ndarray, class_idx: int,
                      n_classes: int, depth: int = 18) -> np.ndarray:
    """Grad-CAM over a ResNetTrunk + linear probe (the heatmap_vis.py setup).

    ``variables`` must contain trunk params/batch_stats under 'trunk' and a
    'fc' linear head (e.g. from ActionRecognitionNet)."""
    trunk_apply, head_apply = _trunk_and_head(variables, depth)
    return grad_cam(trunk_apply, head_apply, images, class_idx)
