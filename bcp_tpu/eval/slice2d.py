"""2D per-slice volume inference (ACDC).

The reference loops over slices with batch-1 forwards
(`utils/val_2d.py:20-41`, `test_ACDC.py:36-79`); here all slices of a
volume zoom to the network size on the host, run as **one** batched device
forward (padded to a slice-count bucket so XLA reuses a few programs), and
zoom back per slice.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from bcp_tpu.eval import metrics as M


class Slice2DEvaluator:
    def __init__(self, model, patch_size: Sequence[int] = (256, 256),
                 num_classes: int = 4, slice_bucket: int = 4, mesh=None):
        """``mesh``: optional 1-D device mesh — the slice batch shards
        over it (slice buckets padded to a mesh multiple), variables
        replicated."""
        if mesh is not None and len(mesh.axis_names) > 1:
            # eval shards slice batches; flatten a 2-D train mesh
            from bcp_tpu.parallel import flat_mesh
            mesh = flat_mesh(mesh)
        self.model = model
        self.patch = tuple(patch_size)
        self.num_classes = num_classes
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._batch_sharded = NamedSharding(
                mesh, PartitionSpec(mesh.axis_names[0]))
            lcm = math.lcm(slice_bucket, mesh.size)
            slice_bucket = lcm
        else:
            self._batch_sharded = None
        self.slice_bucket = slice_bucket
        self._fns: Dict[int, callable] = {}
        # device-resident zoomed volumes keyed by caller token (static
        # validation sets): skips the host zoom + upload per validation
        self._prep_cache: Dict = {}

    def _fn(self, n: int):
        if n in self._fns:
            return self._fns[n]
        model = self.model

        @jax.jit
        def forward(variables, x):
            def one(v):
                out = model.apply(v, x, train=False)
                return out[0] if isinstance(out, tuple) else out
            if isinstance(variables, (list, tuple)):
                # two-model ensemble: average logits —
                # `test_single_volume_cross` (`val_2d.py:43-63`)
                logits = sum(one(v) for v in variables) / len(variables)
            else:
                logits = one(variables)
            # uint8 labels: 4x fewer fetch bytes through a tunneled chip
            return jnp.argmax(jax.nn.softmax(logits, axis=-1),
                              axis=-1).astype(jnp.uint8)

        self._fns[n] = forward
        return forward

    def predict_async(self, variables, image: np.ndarray,
                      cache_token=None):
        """Dispatch one volume without blocking (JAX dispatch is async);
        pass the handle to :meth:`predict_fetch`. Lets callers overlap
        the host zooms/metrics of one volume with device compute of the
        next. ``cache_token`` reuses the zoomed device volume across
        calls (static validation sets)."""
        if isinstance(variables, (list, tuple)):
            variables = tuple(variables)
        if cache_token is not None and cache_token in self._prep_cache:
            x_dev, padded_n, n, x, y = self._prep_cache[cache_token]
        else:
            n, x, y = image.shape
            # one 3-D zoom call == the reference's per-slice loop
            # (`val_2d.py:27`): a slice-axis factor of exactly 1.0 maps
            # output index i to input index i, and the in-plane nearest
            # mapping is per-axis, so the results are bit-identical
            # (asserted in test_eval.py) at ~1/20th the host overhead.
            zoomed = ndimage.zoom(
                image, (1.0, self.patch[0] / x, self.patch[1] / y),
                order=0).astype(np.float32)
            b = self.slice_bucket
            padded_n = int(math.ceil(n / b) * b)
            if padded_n != n:
                zoomed = np.concatenate(
                    [zoomed,
                     np.zeros((padded_n - n, *self.patch), np.float32)])
            x_dev = jnp.asarray(zoomed[..., None])
            if self.mesh is not None:
                x_dev = jax.device_put(x_dev, self._batch_sharded)
            if cache_token is not None:
                self._prep_cache[cache_token] = (x_dev, padded_n, n, x, y)
        out = self._fn(padded_n)(variables, x_dev)
        return out, n, x, y

    def predict_fetch(self, handle) -> np.ndarray:
        out_dev, n, x, y = handle
        out = np.asarray(out_dev)[:n]
        return ndimage.zoom(
            out, (1.0, x / self.patch[0], y / self.patch[1]), order=0)

    def predict_volume(self, variables, image: np.ndarray) -> np.ndarray:
        """image (n_slices, H, W) -> label volume, argmax rule
        (`val_2d.py:27-37`: nearest zoom to patch, net, argmax, zoom
        back)."""
        return self.predict_fetch(self.predict_async(variables, image))

    def predict_volumes(self, variables, images, depth: int = 3,
                        cache_tokens=None):
        """Software-pipelined prediction over an iterable of volumes:
        up to ``depth`` volumes in flight so host zooms and caller-side
        metric work overlap device compute. Yields label volumes in
        order."""
        from collections import deque
        from itertools import repeat
        q: deque = deque()
        toks = repeat(None) if cache_tokens is None else iter(cache_tokens)
        for image, tok in zip(images, toks):
            q.append(self.predict_async(variables, image,
                                        cache_token=tok))
            if len(q) > depth:
                yield self.predict_fetch(q.popleft())
        while q:
            yield self.predict_fetch(q.popleft())

    def validate_volume(self, variables, image, label
                        ) -> List[Tuple[float, float]]:
        """Per-class (dice, hd95) — `val_2d.test_single_volume`
        (`val_2d.py:20-41`)."""
        pred = self.predict_volume(variables, image)
        return [M.calculate_dice_hd95(pred == c, label == c)
                for c in range(1, self.num_classes)]

    def validate_volumes(self, variables, cases, cache: bool = False
                         ) -> List[List[Tuple[float, float]]]:
        """Pipelined :meth:`validate_volume` over (image, label) pairs:
        the host-side hd95 distance transforms of volume i run while the
        device computes volume i+1..i+depth. ``cache=True`` keeps the
        zoomed volumes device-resident across calls."""
        tokens = (("val", i) for i in range(len(cases))) if cache \
            else None
        preds = self.predict_volumes(variables,
                                     (img for img, _ in cases),
                                     cache_tokens=tokens)
        out = []
        for pred, (_, label) in zip(preds, cases):
            out.append([M.calculate_dice_hd95(pred == c, label == c)
                        for c in range(1, self.num_classes)])
        return out

    def metrics_for(self, pred, label) -> List[Tuple[float, float,
                                                     float, float]]:
        """Per-class (dice, jc, hd95, asd) with zero-pred guard —
        the metric half of `test_ACDC.test_single_volume`
        (`test_ACDC.py:36-79`)."""
        out = []
        for c in range(1, self.num_classes):
            pc, gc = pred == c, label == c
            if pc.sum() == 0 or gc.sum() == 0:
                out.append((0.0, 0.0, 0.0, 0.0))
            else:
                dice = M.dice_binary(pc, gc)
                jc = M.jaccard_binary(pc, gc)
                h = M.hd95(pc, gc)
                a = M.asd(pc, gc)
                out.append((dice, jc, h, a))
        return out

    def test_volume(self, variables, image, label):
        """Per-class (dice, jc, hd95, asd) with zero-pred guard —
        `test_ACDC.test_single_volume` (`test_ACDC.py:36-79`)."""
        pred = self.predict_volume(variables, image)
        return self.metrics_for(pred, label), pred
