"""Class-wise feature memory + contrastive loss (reference C24).

Functional re-design of `utils/feature_memory.py:9-54` and
`utils/contrastive_losses.py:8-69` (both dead code in the reference —
imported by the trainers, never called). The reference hangs per-class
selector MLPs off the models (`networks/unet.py:174-190`); here the
selector is a standalone flax module and the memory is a plain pytree so
everything stays functional/jit-friendly.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ClassSelector(nn.Module):
    """The per-class ranking MLP (`networks/VNet.py:262-268`):
    Linear -> BatchNorm -> LeakyReLU(0.2) -> Linear(1)."""
    feat_dim: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.feat_dim)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        return nn.Dense(1)(x)


class FeatureMemory:
    """Online per-class bank of the top-ranked feature vectors
    (`feature_memory.py:16-54`): keep the ``elements_per_class``
    lowest-scoring features per class, ranked by the class selector."""

    def __init__(self, elements_per_class: int = 32, n_classes: int = 2):
        self.elements_per_class = elements_per_class
        self.n_classes = n_classes
        self.memory: List[Optional[np.ndarray]] = [None] * n_classes

    def add_features(self, selector_fns: Dict[int, Callable],
                     features: jax.Array, class_labels: jax.Array):
        """features (N, F) flattened vectors; class_labels (N,)."""
        features = np.asarray(jax.lax.stop_gradient(features))
        labels = np.asarray(class_labels)
        k = self.elements_per_class
        for c in range(self.n_classes):
            feats_c = features[labels == c]
            if feats_c.shape[0] == 0:
                continue
            if feats_c.shape[0] > k:
                rank = jax.nn.sigmoid(
                    np.asarray(selector_fns[c](jnp.asarray(feats_c))))
                order = np.argsort(rank[:, 0])
                feats_c = feats_c[order][:k]
            self.memory[c] = feats_c


def contrastive_class_to_class(selector_fns: Dict[int, Callable],
                               memory_selector_fns: Dict[int, Callable],
                               features: jax.Array,
                               class_labels: jax.Array,
                               num_classes: int,
                               memory: List[Optional[np.ndarray]]):
    """`contrastive_class_to_class_learned_memory`
    (`contrastive_losses.py:8-69`): cosine-distance between each class's
    current features and its memory bank, doubly reweighted by the
    learned selector scores, averaged over classes."""
    loss = 0.0
    for c in range(num_classes):
        mem = memory[c]
        feats_c = features[class_labels == c]
        if mem is None or feats_c.shape[0] <= 1 or mem.shape[0] <= 1:
            continue
        mem = jnp.asarray(mem)
        mem_n = mem / (jnp.linalg.norm(mem, axis=1, keepdims=True) + 1e-12)
        f_n = feats_c / (jnp.linalg.norm(feats_c, axis=1,
                                         keepdims=True) + 1e-12)
        distances = 1.0 - f_n @ mem_n.T                    # (M, N)

        w_f = jax.nn.sigmoid(selector_fns[c](
            jax.lax.stop_gradient(feats_c)))               # (M, 1)
        w_f = (w_f.shape[0] / w_f.sum(axis=0)) * w_f
        distances = distances * w_f

        w_m = jax.nn.sigmoid(memory_selector_fns[c](mem)).T  # (1, N)
        w_m = (w_m.shape[1] / w_m.sum(axis=1, keepdims=True)) * w_m
        distances = distances * w_m

        loss = loss + distances.mean()
    return loss / num_classes
