"""MIL + refinement heads (flax.linen).

Behavior contract: reference lib/modeling/heads.py:168-219 (cls_iou_model):

- anti-noise MIL branch: ``classifier`` Linear -> softmax over classes,
  ``detector`` Linear -> softmax over *proposals* (dim 0);
- K refinement branch pairs: ``refine_cls[k]`` Linear -> class softmax,
  ``refine_iou[k]`` Linear -> sigmoid.

Padding: the proposal-axis softmax masks invalid rows (the reference has no
padding; masked softmax over valid rows computes the identical distribution).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from cim_tpu.models.layers import TorchLinear

NEG = -1e30


def masked_softmax_over_proposals(logits, valid):
    logits = jnp.where(valid[:, None], logits, NEG)
    return nn.softmax(logits, axis=0)


class ClsIouHead(nn.Module):
    num_classes: int  # C (without background)
    refine_times: int = 3
    class_agnostic: bool = False

    @nn.compact
    def __call__(self, seg_x, valid) -> Tuple:
        """seg_x: (N, 4096); valid: (N,).

        Returns (predict_cls (N, C+1), predict_det (N, C+1),
                 refine_cls (K, N, C+1), refine_iou (K, N, C+1)).
        """
        cls_out = self.num_classes + 1

        predict_cls = nn.softmax(
            TorchLinear(cls_out, name="classifier")(seg_x), axis=-1
        )
        predict_det = masked_softmax_over_proposals(
            TorchLinear(cls_out, name="detector")(seg_x), valid
        )

        refine_cls = []
        refine_iou = []
        for k in range(self.refine_times):
            refine_cls.append(
                nn.softmax(TorchLinear(cls_out, name=f"refine_cls{k}")(seg_x), -1)
            )
            refine_iou.append(
                nn.sigmoid(TorchLinear(cls_out, name=f"refine_iou{k}")(seg_x))
            )
        return (
            predict_cls,
            predict_det,
            jnp.stack(refine_cls),
            jnp.stack(refine_iou),
        )
