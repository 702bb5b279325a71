"""Device-batched 3D sliding-window inference.

The reference dispatches **one window per forward pass at batch size 1**,
crossing the host<->device boundary twice per window
(`utils/test_3d_patch.py:116-135` — hundreds of dispatches per LA volume).
This engine is the TPU-native redesign (SURVEY.md §7 step 5):

- the padded volume is uploaded once and stays in HBM;
- windows are gathered on device with vmapped ``dynamic_slice`` and run
  through the net in batches (MXU sees batch=eval_batch, not 1);
- softmax scores are scatter-added into the score/count maps on device
  (``dynamic_update_slice`` read-modify-write inside a ``fori_loop``);
- volumes are padded up to a shape bucket so XLA compiles a handful of
  programs for a whole dataset instead of one per volume shape.

The window grid is byte-identical to the reference
(`test_3d_patch.py:109-121`): ``ceil((dim - patch)/stride) + 1`` windows
per axis with starts ``min(stride*i, dim - patch)`` — the bucket padding
adds windows over padded voxels, which the count map normalises out and the
final crop discards.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bcp_tpu.eval.metrics import host_largest_cc
from bcp_tpu.ops.scatter import pallas_supported, scatter_add_windows


def window_starts(vol_shape: Sequence[int], patch: Sequence[int],
                  stride_xy: int, stride_z: int) -> np.ndarray:
    """The reference's grid (`test_3d_patch.py:109-121`), as an (N,3)
    array of window origins."""
    strides = (stride_xy, stride_xy, stride_z)
    axes = []
    for dim, p, s in zip(vol_shape, patch, strides):
        n = math.ceil((dim - p) / s) + 1 if dim > p else 1
        axes.append([min(s * i, dim - p) for i in range(n)])
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).astype(np.int32)


def pad_to_patch(image: np.ndarray, patch: Sequence[int]):
    """Symmetric pad-if-smaller (`test_3d_patch.py:85-106`); returns the
    padded image and the left-pad offsets for the final crop."""
    pads = []
    for dim, p in zip(image.shape, patch):
        d = max(p - dim, 0)
        pads.append((d // 2, d - d // 2))
    if any(p != (0, 0) for p in pads):
        image = np.pad(image, pads, mode="constant", constant_values=0)
    return image, tuple(p[0] for p in pads)


def bucket_shape(shape: Sequence[int], bucket: Sequence[int],
                 patch: Sequence[int]) -> Tuple[int, ...]:
    """Round each dim up to a bucket multiple (>= patch) to bound the
    number of distinct XLA programs across a dataset."""
    out = []
    for dim, b, p in zip(shape, bucket, patch):
        padded = max(int(math.ceil(dim / b) * b), p)
        out.append(padded)
    return tuple(out)


class SlidingWindowEvaluator:
    """Batched overlap-tiled 3D inference for one model configuration."""

    def __init__(self, model, patch_size: Sequence[int], num_classes: int,
                 stride_xy: int, stride_z: int, batch: int = 8,
                 bucket: Sequence[int] = (32, 32, 16), mesh=None):
        """``mesh``: optional 1-D device mesh — window batches shard over
        it (``batch`` windows *per device*), volume/score/count maps are
        replicated; the long-input axis of SURVEY.md §5 handled by
        spreading the window grid over chips."""
        if mesh is not None and len(mesh.axis_names) > 1:
            # a 2-D (data, space) train mesh: windows are patch-sized, so
            # eval wants every chip on one batch axis
            from bcp_tpu.parallel import flat_mesh
            mesh = flat_mesh(mesh)
        self.model = model
        self.patch = tuple(patch_size)
        self.num_classes = num_classes
        self.stride_xy = stride_xy
        self.stride_z = stride_z
        self.batch = batch * (mesh.size if mesh is not None else 1)
        self.bucket = tuple(bucket)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._replicated = NamedSharding(mesh, PartitionSpec())
            self._batch_sharded = NamedSharding(
                mesh, PartitionSpec(mesh.axis_names[0]))
        else:
            self._replicated = self._batch_sharded = None
        self._volume_fns: Dict[Tuple[int, ...], callable] = {}
        self._cnt_cache: Dict[Tuple, jax.Array] = {}
        # device-resident prepared volumes keyed by caller token: a
        # validation set is static across a training run, so re-padding
        # + re-uploading ~20 volumes through the (tunneled) link every
        # 200 iterations is pure waste (measured 39.7% of pre-train
        # wall-clock in validation+ckpt pauses before this cache)
        self._prep_cache: Dict = {}
        # Pallas overlap-add kernel on any TPU topology: under a mesh the
        # volume program runs per-device inside shard_map (each device
        # scatters its own window shard into a local score map; one psum
        # at the end), so the kernel sees ordinary single-device arrays.
        # CPU tests use the XLA loop, which stays numerically identical.
        self._use_pallas = jax.default_backend() == "tpu"
        if self._use_pallas:
            # the kernel rolls along the (Y, Z*C) vector dims, so the
            # bucketed z extent must make Z*C a multiple of the 128-lane
            # tiling (Y buckets are already multiples of 8)
            z_mult = 128 // math.gcd(num_classes, 128)
            self.bucket = (*self.bucket[:2],
                           math.lcm(self.bucket[2], z_mult))

    # -- shared chunk computation (B windows: gather, forward, scatter) --
    def _process_chunk(self, variables, volume, starts, valid, score):
        patch = self.patch
        C = self.num_classes
        model = self.model

        def gather(s):
            return jax.lax.dynamic_slice(volume, (s[0], s[1], s[2]), patch)
        patches = jax.vmap(gather)(starts)[..., None]

        def forward(v):
            # first tuple element everywhere: (out_seg, feat) models give
            # the logits, and dual-task (out_tanh, out_seg) models give
            # the tanh head — exactly what `test_DTC_single_case`
            # softmaxes (`pancreas/test_util.py:73-74`, `y1, _ = net(..)`)
            out = model.apply(v, patches, train=False)
            return out[0] if isinstance(out, tuple) else out

        if isinstance(variables, (list, tuple)):
            # two-model ensemble: average logits before softmax —
            # `test_single_case_plus` (`test_3d_patch.py:249-253`)
            logits = sum(forward(v) for v in variables) / len(variables)
        else:
            logits = forward(variables)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = probs * valid[:, None, None, None, None]

        if self._use_pallas and pallas_supported(probs.shape, score.shape):
            # stride-18/4 window offsets are unaligned with the (8,128)
            # vector tiling, making the XLA slice/update loop relayout
            # ~16 MB per window (~22 ms/chunk at LA shapes); the Pallas
            # kernel streams the read-modify-write through VMEM instead
            return scatter_add_windows(score, probs.astype(jnp.float32),
                                       starts)

        def body(i, sc):
            s = starts[i]
            idx = (s[0], s[1], s[2], 0)
            tile = jax.lax.dynamic_slice(sc, idx, (*patch, C))
            return jax.lax.dynamic_update_slice(sc, tile + probs[i], idx)

        return jax.lax.fori_loop(0, starts.shape[0], body, score)

    # -- jitted whole-volume processor --------------------------------
    def _volume_fn(self, vol_shape: Tuple[int, ...], n_chunks: int,
                   rule: str):
        """One XLA program runs every window chunk of a volume via an
        inner ``fori_loop`` — on a tunneled/remote device the per-chunk
        dispatch round-trips add up (~13 sequential dispatches per LA
        volume); fusing the loop removes all but one. The count-map
        normalisation and the decision rule live INSIDE the same program
        (round-4: the eager ``score/cnt`` + argmax/threshold + cast chain
        was 4 extra dispatch round-trips per volume on a tunneled chip,
        and the label fetch is 1 byte/voxel instead of C floats).

        Under a mesh the same program body runs per-device inside
        ``shard_map``: the window grid is sharded over devices, each
        device overlap-adds its shard into a zero-initialised local score
        map (the Pallas kernel applies unchanged — no replicated-array
        special cases), and one ``psum`` over ICI merges the partials.
        This replaces the round-2 per-chunk path, which re-dispatched per
        chunk and all-gathered window probs into every device's
        replicated map (forfeiting the Pallas kernel entirely)."""
        key = (*vol_shape, n_chunks, rule)
        if key in self._volume_fns:
            return self._volume_fns[key]
        # per-device windows per chunk (== self.batch on one device)
        B = self.batch // (self.mesh.size if self.mesh is not None else 1)

        def run_chunks(variables, volume, starts, valid, score):
            def chunk(ci, sc):
                s = jax.lax.dynamic_slice(starts, (ci * B, 0), (B, 3))
                v = jax.lax.dynamic_slice(valid, (ci * B,), (B,))
                return self._process_chunk(variables, volume, s, v, sc)
            return jax.lax.fori_loop(0, n_chunks, chunk, score)

        score_shape = (*vol_shape, self.num_classes)

        if self.mesh is None:
            def score_fn(variables, volume, starts, valid):
                return run_chunks(variables, volume, starts, valid,
                                  jnp.zeros(score_shape, jnp.float32))
        else:
            from functools import partial
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            ax = self.mesh.axis_names[0]

            @partial(shard_map, mesh=self.mesh,
                     in_specs=(P(), P(), P(ax), P(ax)),
                     out_specs=P(),
                     check_vma=False)
            def score_fn(variables, volume, starts, valid):
                local = run_chunks(variables, volume, starts, valid,
                                   jnp.zeros(score_shape, jnp.float32))
                return jax.lax.psum(local, ax)

        @jax.jit
        def process_all(variables, volume, starts, valid, cnt):
            sc = score_fn(variables, volume, starts, valid)
            sc = sc / cnt[..., None]
            if rule == "argmax":
                label = jnp.argmax(sc, axis=-1).astype(jnp.uint8)
            else:   # class-1 prob > 0.5 (`test_3d_patch.py:137`)
                label = (sc[..., 1] > 0.5).astype(jnp.uint8)
            return label, sc

        self._volume_fns[key] = process_all
        return process_all

    # -- host-side count map (data-independent, cached per shape) --------
    def _count_map(self, starts: np.ndarray, padded: Tuple[int, ...]):
        """The overlap count map depends only on the window grid, not the
        data: build it once per volume shape with numpy and keep the
        device copy cached — the reference recomputes it per volume on
        device (`test_3d_patch.py:133`), a third of the scatter traffic.
        """
        # key on the exact start grid: the last window per axis sits at
        # dim - patch, so two volumes sharing a padded bucket, window
        # count and strides can still have different grids (e.g. LA
        # x-extents 140 vs 144 both bucket to 160 with 3 x-starts)
        key = (padded, starts.tobytes())
        if key in self._cnt_cache:
            return self._cnt_cache[key]
        cnt = np.zeros(padded, np.float32)
        p = self.patch
        for s in starts:
            cnt[s[0]:s[0] + p[0], s[1]:s[1] + p[1], s[2]:s[2] + p[2]] += 1.0
        cnt = np.maximum(cnt, 1.0)
        dev = jnp.asarray(cnt)
        if self.mesh is not None:
            dev = jax.device_put(dev, self._replicated)
        self._cnt_cache[key] = dev
        return dev

    # -- public API -----------------------------------------------------
    def _prepare_volume(self, image: np.ndarray, cache_token=None):
        """Host pad/bucket + device upload of one volume and its window
        grid. With ``cache_token`` the prepared device arrays are kept
        and reused (validation sets are static across a run)."""
        if cache_token is not None and cache_token in self._prep_cache:
            return self._prep_cache[cache_token]
        orig_shape = image.shape
        image, off = pad_to_patch(image.astype(np.float32), self.patch)
        grid_shape = image.shape
        # window grid over the *pre-bucket* shape (identical to reference)
        starts = window_starts(grid_shape, self.patch, self.stride_xy,
                               self.stride_z)
        padded = bucket_shape(grid_shape, self.bucket, self.patch)
        if padded != grid_shape:
            image = np.pad(
                image, [(0, p - s) for p, s in zip(padded, grid_shape)],
                mode="constant", constant_values=0)

        volume = jnp.asarray(image)
        if self.mesh is not None:
            volume = jax.device_put(volume, self._replicated)
        cnt = self._count_map(starts, padded)

        B = self.batch
        n = starts.shape[0]
        # every chunk of the volume runs inside one jitted program
        n_chunks = math.ceil(n / B)
        pad_n = n_chunks * B - n
        valid = np.concatenate([np.ones(n, np.float32),
                                np.zeros(pad_n, np.float32)])
        all_starts = np.concatenate(
            [starts, np.zeros((pad_n, 3), np.int32)])
        if self.mesh is None:
            starts_dev = jnp.asarray(all_starts)
            valid_dev = jnp.asarray(valid)
        else:
            # window-shard the grid: reorder (chunk, device, local) ->
            # (device, chunk, local) so the axis-0 sharding hands each
            # device its per-chunk sub-blocks in chunk order
            size = self.mesh.size
            loc = B // size
            all_starts = (all_starts.reshape(n_chunks, size, loc, 3)
                          .transpose(1, 0, 2, 3).reshape(-1, 3))
            valid = (valid.reshape(n_chunks, size, loc)
                     .transpose(1, 0, 2).reshape(-1))
            starts_dev = jax.device_put(jnp.asarray(all_starts),
                                        self._batch_sharded)
            valid_dev = jax.device_put(jnp.asarray(valid),
                                       self._batch_sharded)
        prep = (volume, starts_dev, valid_dev, cnt, padded, n_chunks,
                orig_shape, off, grid_shape)
        if cache_token is not None:
            self._prep_cache[cache_token] = prep
        return prep

    def infer_async(self, variables, image: np.ndarray,
                    rule: str = "threshold",
                    return_score: bool = True, cache_token=None):
        """Dispatch one volume and return an opaque handle WITHOUT
        blocking on the result — JAX dispatch is asynchronous, so the
        caller can overlap host work (metrics, NMS, the next volume's
        padding/upload) with device compute. Pass the handle to
        :meth:`infer_fetch`. ``cache_token``: opaque hashable key to
        reuse the padded device volume across calls (static validation
        sets)."""
        if isinstance(variables, (list, tuple)):
            variables = tuple(variables)
        (volume, starts_dev, valid_dev, cnt, padded, n_chunks,
         orig_shape, off, grid_shape) = self._prepare_volume(
            image, cache_token)
        process_all = self._volume_fn(padded, n_chunks, rule)
        label_dev, score_dev = process_all(variables, volume, starts_dev,
                                           valid_dev, cnt)
        # drop the score reference when unwanted so its HBM buffer frees
        # as soon as the program retires
        return (label_dev, score_dev if return_score else None,
                orig_shape, off, grid_shape)

    def infer_fetch(self, handle) -> Tuple[np.ndarray,
                                           Optional[np.ndarray]]:
        """Block on a handle from :meth:`infer_async`; returns
        (label_map, score_map[C-first] or None) cropped to the original
        volume shape."""
        label_dev, score_dev, orig_shape, off, grid_shape = handle
        # fetch the label map as uint8 — the full f32 score map is ~10x
        # the bytes and only the offline CLIs need it
        label = np.asarray(label_dev).astype(np.int32)
        # crop bucket padding, then the pad-to-patch padding
        sl = tuple(slice(o, o + s) for o, s in zip(off, orig_shape))
        label = label[tuple(slice(0, s) for s in grid_shape)][sl]
        if score_dev is None:
            return label, None
        score = np.asarray(score_dev)
        score = np.moveaxis(
            score[tuple(slice(0, s) for s in grid_shape) + (slice(None),)],
            -1, 0)[(slice(None),) + sl]
        return label, score

    def infer(self, variables, image: np.ndarray,
              rule: str = "threshold", return_score: bool = True
              ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Run one volume; returns (label_map, score_map[C,...]-first) with
        the reference's decision rules: 'threshold' = class-1 prob > 0.5
        (`test_3d_patch.py:137`), 'argmax' (`pancreas/test_util.py:146`).

        ``variables`` may be a list/tuple of variable dicts for the
        two-model ensemble variants (`test_all_case_plus`,
        `var_all_case_LA_plus`, `test_3d_patch.py:144-266`).
        """
        return self.infer_fetch(
            self.infer_async(variables, image, rule=rule,
                             return_score=return_score))

    def evaluate_case(self, variables, image, label, nms: bool = False,
                      rule: str = "threshold"):
        from bcp_tpu.eval import metrics as M
        pred, _ = self.infer(variables, image, rule=rule,
                             return_score=False)
        if nms:
            pred = host_largest_cc(pred)
        if pred.sum() == 0:
            return (0.0, 0.0, 0.0, 0.0), pred
        return M.calculate_metric_percase(pred, label[:]), pred

    def infer_cases(self, variables, images, rule: str = "threshold",
                    depth: int = 3, cache_tokens=None):
        """Software-pipelined inference over an iterable of volumes:
        keep up to ``depth`` volumes in flight (dispatch is async) so the
        per-volume host work — padding, upload, label fetch, and whatever
        the caller does between yields (medpy metrics, NMS, NIfTI writes)
        — overlaps device compute of the volumes behind it. Yields label
        maps in order. ``cache_tokens``: optional parallel iterable of
        keys for the device-side volume cache."""
        from collections import deque
        from itertools import repeat
        q: deque = deque()
        toks = repeat(None) if cache_tokens is None else iter(cache_tokens)
        for image, tok in zip(images, toks):
            q.append(self.infer_async(variables, image, rule=rule,
                                      return_score=False,
                                      cache_token=tok))
            if len(q) > depth:
                yield self.infer_fetch(q.popleft())[0]
        while q:
            yield self.infer_fetch(q.popleft())[0]

    def validate_dice(self, variables, cases, rule: str = "threshold",
                      cache: bool = False):
        """`var_all_case_LA` (`test_3d_patch.py:20-39`): mean Dice over a
        case list, no NMS, zero-pred counts as 0. ``cache=True`` keeps
        the padded volumes device-resident across calls (the trainer's
        fixed validation set)."""
        from bcp_tpu.eval import metrics as M
        labels = [lab for _, lab in cases]
        tokens = (("val", i) for i in range(len(cases))) if cache \
            else None
        total = 0.0
        for pred, label in zip(
                self.infer_cases(variables,
                                 (img for img, _ in cases), rule=rule,
                                 cache_tokens=tokens),
                labels):
            total += (M.dice_binary(pred, label)
                      if pred.sum() > 0 else 0.0)
        return total / max(len(cases), 1)
