"""Distribution-based rotated retina head + localization distillation.

Capability mirrors:
  - RotatedRetinaDistributionHead
    (`python/jdet/models/roi_heads/rotated_retina_distribution_head.py`):
    each box delta is predicted as a discretized distribution over
    reg_max+1 bins and reduced by the expectation integral
    (box_ops.py:709-723) before the regression loss.
  - LDRotatedRetinaHead (`roi_heads/ld_rotated_retina_head.py`): adds the
    localization-distillation KL term between student and teacher box
    distributions on positive anchors (losses/kd_loss.py:7-42).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from .. import nn as jnn
from .rotated_retina_head import RotatedRetinaHead
from ..layers import normal_init
from ..losses import smooth_l1_loss, knowledge_distillation_kl_div_loss
from ...ops.box_convert import integral, integral_angle
from ...utils.registry import HEADS


@HEADS.register_module()
class RotatedRetinaDistributionHead(RotatedRetinaHead):
    def __init__(self, *a, reg_max=8, rngs: nnx.Rngs, **kw):
        super().__init__(*a, rngs=rngs, **kw)
        self.reg_max = reg_max
        # replace the 5-channel regressor with 5*(reg_max+1) distributions
        self.retina_reg = jnn.Conv(
            self.feat_channels,
            self.num_anchors * 5 * (reg_max + 1),
            (1, 1),
            kernel_init=normal_init(0.01),
            rngs=rngs,
        )

    def _integrate(self, reg_flat):
        """(N, 5*(reg_max+1)) distributions -> (N, 5) expected deltas."""
        n = self.reg_max
        d = reg_flat.reshape(-1, 5, n + 1)
        xy_wh = integral(d[:, :4].reshape(-1, n + 1), n).reshape(-1, 4)
        ang = integral_angle(d[:, 4], n).reshape(-1, 1)
        return jnp.concatenate([xy_wh, ang], -1)

    def _reg_to_deltas(self, reg, b):
        flat = reg.reshape(b, -1, 5 * (self.reg_max + 1))
        a = flat.shape[1]
        return self._integrate(
            flat.reshape(-1, 5 * (self.reg_max + 1))
        ).reshape(b, a, 5)

    def _flatten_outs(self, outs):
        cls_list, reg_list = [], []
        for cls, reg in outs:
            b = cls.shape[0]
            cls_list.append(cls.reshape(b, -1, self.cls_out_channels))
            reg_flat = reg.reshape(b, -1, 5 * (self.reg_max + 1))
            reg_list.append(reg_flat)
        cls_all = jnp.concatenate(cls_list, 1)
        reg_all = jnp.concatenate(reg_list, 1)
        b, a, _ = reg_all.shape
        reg5 = self._integrate(reg_all.reshape(-1, 5 * (self.reg_max + 1)))
        return cls_all, reg5.reshape(b, a, 5)

    def _flatten_dist(self, outs):
        """Raw (B, A, 5*(reg_max+1)) distributions across levels."""
        return jnp.concatenate(
            [
                reg.reshape(reg.shape[0], -1, 5 * (self.reg_max + 1))
                for _, reg in outs
            ],
            1,
        )


@HEADS.register_module()
class LDRotatedRetinaHead(RotatedRetinaDistributionHead):
    def __init__(self, *a, loss_ld=dict(T=10.0, loss_weight=0.25), **kw):
        super().__init__(*a, **kw)
        self.loss_ld_cfg = dict(loss_ld)

    def loss_with_teacher(self, outs, teacher_outs, targets):
        losses = self.loss(outs, targets)
        s = self._flatten_dist(outs)  # (B, A, 5*(n+1))
        t = jax.lax.stop_gradient(self._flatten_dist(teacher_outs))
        n1 = self.reg_max + 1
        kd = knowledge_distillation_kl_div_loss(
            s.reshape(-1, n1),
            t.reshape(-1, n1).astype(s.dtype),
            T=self.loss_ld_cfg.get("T", 10.0),
        )
        losses["loss_ld"] = kd * self.loss_ld_cfg.get("loss_weight", 0.25)
        return losses
