"""H2RBox: weakly-supervised oriented detection from horizontal boxes.

Capability mirror of the reference H2RBox
(`python/jdet/models/networks/h2rbox.py:35-121`,
`roi_heads/h2rbox_head.py:31-860`): the image is passed twice — the
original view and a copy rotated by a random angle theta (grid-sample
rotation about the image center, h2rbox.py:35-75). The FCOS-style head is
supervised on the original view using only the horizontal circumscribed
boxes of the (weak) labels, while a self-supervised consistency term ties
the two views' predictions together: the rotated view must predict the
same boxes rotated by theta, which is what forces the angle branch to
learn true orientations without rotated labels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from .single_stage import SingleStageDetector
from ..losses import smooth_l1_loss
from ...ops.deform_conv import bilinear_sample_nhwc
from ...ops.box_convert import rbox_to_hbox, hbox_to_rbox, norm_angle
from ...utils.registry import MODELS


def rotate_image(images, theta):
    """Rotate NHWC images by theta about the center (grid sample, zeros
    outside — reference h2rbox.py:35-75)."""
    B, H, W, C = images.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=images.dtype), jnp.arange(W, dtype=images.dtype),
        indexing="ij",
    )
    cx = (W - 1) / 2.0
    cy = (H - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # sample source position = R(-theta) @ (p - c) + c
    sx = cos * (xx - cx) + sin * (yy - cy) + cx
    sy = -sin * (xx - cx) + cos * (yy - cy) + cy
    return bilinear_sample_nhwc(
        images, jnp.broadcast_to(sy, (B, H, W)), jnp.broadcast_to(sx, (B, H, W))
    )


def rotate_rboxes(rboxes, theta, w, h):
    """Rotate rboxes by theta about the image center."""
    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    ox = rboxes[..., 0] - cx
    oy = rboxes[..., 1] - cy
    nx = cos * ox - sin * oy + cx
    ny = sin * ox + cos * oy + cy
    na = norm_angle(rboxes[..., 4] + theta)
    return jnp.stack([nx, ny, rboxes[..., 2], rboxes[..., 3], na], -1)


@MODELS.register_module()
class H2RBox(SingleStageDetector):
    def __init__(self, backbone, neck=None, bbox_head=None,
                 ss_loss_weight=0.4, rot_range=(0.25, 0.75)):
        super().__init__(backbone, neck, bbox_head)
        self.ss_loss_weight = ss_loss_weight
        self.rot_range = rot_range  # fraction of pi

    def loss(self, images, targets, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        B, H, W, _ = images.shape
        theta = jax.random.uniform(
            k1, (), minval=self.rot_range[0] * jnp.pi,
            maxval=self.rot_range[1] * jnp.pi,
        )

        # weak supervision: the head sees only circumscribed hboxes
        weak = dict(targets)
        weak["gt_bboxes"] = hbox_to_rbox(rbox_to_hbox(targets["gt_bboxes"]))

        feats1 = self.extract_feat(images, train=True)
        outs1 = self.bbox_head(feats1, train=True)

        if hasattr(self.bbox_head, "loss_with_aug"):
            # dedicated H2RBoxHead path (reference h2rbox_head.py:237-243):
            # rotated view runs only the regression tower; the head owns
            # the positive-location consistency loss.
            images2 = rotate_image(images, theta)
            feats2 = self.extract_feat(images2, train=True)
            outs_aug = self.bbox_head.forward_aug(feats2, train=True)
            return self.bbox_head.loss_with_aug(outs1, outs_aug, theta, weak)

        losses = self.bbox_head.loss(outs1, weak)

        # rotated view (stop grad through the rotation path's inputs only)
        images2 = rotate_image(images, theta)
        feats2 = self.extract_feat(images2, train=True)
        outs2 = self.bbox_head(feats2, train=True)

        # self-supervised consistency on the dense angle maps: view2's
        # angle at the rotated location must equal view1's angle + theta
        ss = 0.0
        for (c1, r1, t1, ct1), (c2, r2, t2, ct2) in zip(outs1, outs2):
            b, h, w, _ = t1.shape
            yy, xx = jnp.meshgrid(
                jnp.arange(h, dtype=t1.dtype), jnp.arange(w, dtype=t1.dtype),
                indexing="ij",
            )
            cx = (w - 1) / 2.0
            cy = (h - 1) / 2.0
            cos, sin = jnp.cos(theta), jnp.sin(theta)
            # location in view1 that maps to (xx, yy) in view2
            sx = cos * (xx - cx) + sin * (yy - cy) + cx
            sy = -sin * (xx - cx) + cos * (yy - cy) + cy
            t1r = bilinear_sample_nhwc(
                t1, jnp.broadcast_to(sy, (b, h, w)),
                jnp.broadcast_to(sx, (b, h, w)),
            )
            # weight by view1 objectness (centerness) at the source location
            w1 = jax.nn.sigmoid(
                bilinear_sample_nhwc(
                    ct1, jnp.broadcast_to(sy, (b, h, w)),
                    jnp.broadcast_to(sx, (b, h, w)),
                )
            )
            w1 = jax.lax.stop_gradient(w1)
            # periodic angle difference
            d = t2 - (t1r + theta)
            d = (d + jnp.pi / 2) % jnp.pi - jnp.pi / 2
            ss = ss + (jnp.abs(d) * w1).sum() / jnp.maximum(w1.sum(), 1.0)
        losses["loss_ss"] = ss * self.ss_loss_weight
        return losses


# the dedicated H2RBoxHead (HEADS registry) lives in
# jdet_tpu/models/heads/h2rbox_head.py
