"""In-framework PRM classifier training.

The reference ships the PRM classification datasets and finetune()
param groups (lib/prm/prm_configs.py:13-62, voc_dataset.py,
coco_dataset.py) but runs the actual classifier training in the external
PRM repo (the shipped pipeline consumes a downloaded checkpoint). This
module closes that gap in-framework: the published PRM recipe —
FC-ResNet50 class response maps, peak-stimulation aggregation
(prm_modules.py PeakStimulation), multi-label soft-margin loss, SGD with
the finetune() group LRs — as one jitted TPU train step.

TPU design: the whole step (fwd + peak finding + custom-VJP aggregation
+ bwd + optax update) is a single compiled program; peak_stimulation's
backward is the reference's broadcast-onto-peaks rule, already a custom
VJP in cim_tpu.prm.modules.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from cim_tpu.prm.datasets import finetune_optimizer
from cim_tpu.prm.model import FCResNet50
from cim_tpu.prm.modules import peak_stimulation


def multilabel_soft_margin_loss(logits, targets):
    """torch.nn.MultiLabelSoftMarginLoss semantics: per-sample mean over
    classes of -[y*log sigmoid(x) + (1-y)*log sigmoid(-x)], then mean
    over the batch (the PRM training criterion)."""
    # log sigmoid(x) = -softplus(-x), numerically stable both branches
    per = targets * jax.nn.log_sigmoid(logits) + (1.0 - targets) * (
        jax.nn.log_sigmoid(-logits)
    )
    return -jnp.mean(jnp.mean(per, axis=-1))


class PRMTrainState(NamedTuple):
    params: Any
    stats: Any  # FrozenBatchNorm running stats (non-trainable)
    opt_state: Any
    step: jnp.ndarray


class PRMClassifierTrainer:
    """Train FCResNet50 with peak-stimulation aggregation.

    groups follows the reference finetune() call shape, e.g.
    {'res': 0.01} to train the backbone 100x slower than the classifier
    (prm_configs.py:47 'feature':0.01 — our flax scopes are res*/
    classifier rather than torch's features.*).
    """

    def __init__(self, num_classes=20, base_lr=0.01, groups=None,
                 momentum=0.9, weight_decay=1e-4, win_size=3,
                 image_hw=(448, 448)):
        # excitation=False: training uses the standard conv backward; the
        # pr_conv excitation rule is inference-only (peak backprop)
        self.model = FCResNet50(num_classes=num_classes, excitation=False)
        self.win_size = win_size
        self.image_hw = tuple(image_hw)
        self._opt_args = (base_lr, dict(groups or {"res": 0.01}),
                          momentum, weight_decay)

    def init(self, rng_key) -> PRMTrainState:
        x = jnp.zeros((1,) + self.image_hw + (3,))
        variables = self.model.init(rng_key, x)
        params = variables["params"]
        stats = variables.get("stats", {})
        self.tx = finetune_optimizer(params, self._opt_args[0],
                                     self._opt_args[1],
                                     momentum=self._opt_args[2],
                                     weight_decay=self._opt_args[3])
        return PRMTrainState(params, stats, self.tx.init(params),
                             jnp.zeros((), jnp.int32))

    def logits(self, params, stats, images):
        crm = self.model.apply({"params": params, "stats": stats}, images)
        _, agg = peak_stimulation(crm, self.win_size)
        return agg

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def step(self, state: PRMTrainState, images, targets):
        def loss_fn(params):
            return multilabel_soft_margin_loss(
                self.logits(params, state.stats, images), targets
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        return PRMTrainState(params, state.stats, opt_state,
                             state.step + 1), loss
