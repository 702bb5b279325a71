"""The generic two-stage BCP trainer.

One trainer drives all three reference pipelines (`LA_BCP_train.py`,
`ACDC_BCP_train.py`, `pancreas/train_pancreas.py` — parallel near-clones in
the reference, unified here behind the Config presets): labeled-only
copy-paste pre-training, then bidirectional copy-paste mean-teacher
self-training, with periodic validation, best-Dice checkpointing and the
checkpoint-mediated stage hand-off.

Performance notes vs the reference:
- the train step is one donated-state XLA program (no per-step host work
  beyond feeding the next batch, which is prefetched on a thread);
- validation uses the device-batched evaluators;
- metrics are fetched every ``log_every`` steps as a single device->host
  transfer (1 = the reference's per-iteration logging).
"""

from __future__ import annotations

import os
import queue
import threading
import time
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bcp_tpu.config import Config
from bcp_tpu.data.datasets import (ACDCDataset, LAHeartDataset,
                                   PancreasDataset)
from bcp_tpu.data.feed import BCPBatchFeeder
from bcp_tpu.data.transforms import pancreas_test_transform
from bcp_tpu.eval.slice2d import Slice2DEvaluator
from bcp_tpu.eval.sliding_window import SlidingWindowEvaluator
from bcp_tpu.models import create_model
from bcp_tpu.ops.ramps import sigmoid_rampup
from bcp_tpu.train.checkpoints import (CheckpointIO, best_model_path,
                                       scan_best_dice)
from bcp_tpu.train.state import TrainState, build_optimizer, init_state
from bcp_tpu.train.steps import make_pretrain_step, make_selftrain_step
from bcp_tpu.utils.logging import (MetricWriter, cut_pre_measures,
                                   cutmix_ft_measures, enable_compile_cache,
                                   setup_logging)


class _ValWorker:
    """One background thread running validation + checkpoint jobs
    strictly in submission order (``Config.async_val``).

    The train step donates its state buffers, so each job owns a fresh
    on-device copy of the state snapshotted at its eval boundary. Jobs
    are pure functions of that snapshot and execute one at a time in
    submission order, so which states get validated, the best-dice
    comparison sequence and the checkpoints written are identical to
    the serialized loop — only the training loop no longer waits. The
    reference validates inline, pausing training for the whole sweep
    (`LA_BCP_train.py:173-187,278-292`); on the tunneled v5e those
    pauses were 43%/22% of the r4 LA stage wall-clocks.

    ``depth`` bounds the jobs in flight (and so the live state
    snapshots holding HBM): a submit blocks only while ``depth`` jobs
    are still unfinished. Depth > 1 keeps fast stages from exposing a
    slow validation sweep — pre-train's 200-step windows are shorter
    than one LA sweep, so depth 1 made the worker the critical path
    there (31% of the r5-first-cut pre-train wall)."""

    def __init__(self, depth: int = 1):
        self._q: queue.Queue = queue.Queue()
        self._err: Optional[BaseException] = None
        self._slots = threading.BoundedSemaphore(max(int(depth), 1))
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            job = self._q.get()
            try:
                if job is not None and self._err is None:
                    job()
            except BaseException as e:  # surfaced at the next drain
                self._err = e
            finally:
                if job is not None:
                    self._slots.release()
                self._q.task_done()
            if job is None:
                return

    def submit(self, job) -> None:
        """Queue a job, waiting until fewer than ``depth`` are still in
        flight (bounds HBM; jobs themselves stay strictly sequential).
        Re-raises a previous job's error instead of queueing onto it."""
        if self._err is not None:
            err, self._err = self._err, None
            raise err
        self._slots.acquire()
        self._q.put(job)

    def drain(self) -> None:
        """Block until every submitted job finished; re-raise the first
        job error in the caller's thread."""
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def close(self) -> None:
        self._q.put(None)
        self._thread.join()


class BCPTrainer:
    """``cfg.num_devices`` > 1 (or -1 = all) trains data-parallel on a 1-D
    device mesh: state replicated, every feed stream batch-sharded, eval
    windows sharded over the same mesh; the per-device batch stays the
    reference's and the global batch scales with the mesh
    (parallel/mesh.py). ``cfg.sp_devices`` > 1 additionally shards every
    volume's leading spatial axis over a second ``space`` mesh axis (XLA
    inserts the conv halo exchanges) — the global batch then scales by
    ``num_devices // sp_devices`` only. An explicit ``sharding``
    (NamedSharding over the batch axis) may be passed instead of
    ``cfg.num_devices``."""

    def __init__(self, cfg: Config, snapshot_root: Optional[str] = None,
                 sharding=None, log_images: bool = False):
        self.cfg = cfg
        self.log_images = log_images
        self._snapshot_fns = {}
        # kill -USR1 <pid> dumps all thread stacks to stderr: long runs
        # through the tunneled runtime can wedge inside an RPC with zero
        # CPU and no log line, and this is the only way to see where
        try:
            import faulthandler
            import signal
            faulthandler.register(signal.SIGUSR1, all_threads=True)
        except Exception:
            pass
        from bcp_tpu.parallel import make_mesh, stream_sharding
        self.mesh = None
        self.sharding = None
        if sharding is not None:
            self.sharding = sharding
            self.mesh = sharding.mesh
        elif cfg.num_devices == -1 or cfg.num_devices > 1:
            n = (jax.device_count() if cfg.num_devices == -1
                 else cfg.num_devices)
            if n > jax.device_count():
                raise ValueError(
                    f"num_devices={n} but only {jax.device_count()} "
                    f"devices are visible")
            if n > 1:
                self.mesh = make_mesh(n, sp=cfg.sp_devices)
                self.sharding = stream_sharding(self.mesh)
        if cfg.sp_devices > 1 and (
                self.mesh is None
                or "space" not in self.mesh.axis_names
                or self.mesh.shape["space"] != cfg.sp_devices):
            raise ValueError(
                f"sp_devices={cfg.sp_devices} needs a mesh with a "
                f"matching 'space' axis: pass num_devices >= sp_devices "
                f"(got num_devices={cfg.num_devices}, mesh="
                f"{None if self.mesh is None else self.mesh.shape})")
        self.data_scale = (self.mesh.shape["data"]
                           if self.mesh is not None else 1)
        root = snapshot_root or cfg.snapshot_root
        run = f"{cfg.name}_{cfg.exp}_{cfg.labelnum}_labeled"
        self.pre_dir = os.path.join(root, run, "pre_train")
        self.self_dir = os.path.join(root, run, "self_train")
        import jax.numpy as jnp
        dtype = None if cfg.compute_dtype == "float32" else jnp.dtype(
            cfg.compute_dtype).type
        extra = {"n_filters": cfg.n_filters} if cfg.n_filters else {}
        train_extra = dict(extra)
        if cfg.remat:
            if cfg.net_type not in ("VNet", "VNet_pancreas", "git_VNet"):
                raise ValueError(
                    f"remat targets the V-Net pipelines; net_type="
                    f"{cfg.net_type!r} has no remat support")
            train_extra["remat"] = True
        self.model = create_model(cfg.net_type, cfg.num_classes,
                                  compute_dtype=dtype, **train_extra)
        # eval never builds a backward; remat would only slow it down
        self.eval_model = create_model(cfg.net_type, cfg.num_classes,
                                       mode="test", compute_dtype=dtype,
                                       **extra)
        self.ckpt = CheckpointIO()
        self._val_cases: Optional[List[Tuple[np.ndarray, np.ndarray]]] = None
        # device-store cache shared by the pre/self feeders: the store is
        # stage-independent and its upload costs minutes on a tunneled
        # runtime — pay it once per run, not once per stage
        self._feed_store_cache: dict = {}
        # eval shards window/slice *batches*: the evaluators themselves
        # flatten a 2-D (data, space) train mesh onto one batch axis
        if cfg.dims == 3:
            self.evaluator = SlidingWindowEvaluator(
                self.eval_model, cfg.patch_size, cfg.num_classes,
                cfg.stride_xy, cfg.stride_z, batch=cfg.eval_batch,
                mesh=self.mesh)
        else:
            self.evaluator = Slice2DEvaluator(
                self.eval_model, cfg.patch_size, cfg.num_classes,
                mesh=self.mesh)

    # ---------------- validation ----------------

    def _load_val_cases(self):
        if self._val_cases is not None:
            return self._val_cases
        cfg = self.cfg
        cases = []
        if cfg.variant == "la":
            # the reference validates on the *test* list
            # (`test_3d_patch.py:20-24`) — kept for protocol parity
            ds = LAHeartDataset(cfg.root_path, "test")
            cases = [ds.load(i) for i in range(len(ds))]
        elif cfg.variant == "acdc":
            ds = ACDCDataset(cfg.root_path, "val")
            cases = [ds.load(i) for i in range(len(ds))]
        else:
            ds = PancreasDataset(cfg.root_path, "test")
            for i in range(len(ds)):
                image, label = ds.load(i)
                image, label = pancreas_test_transform(
                    image, label, cfg.patch_size)
                cases.append((image, label))
        self._val_cases = cases
        return cases

    def _eval_variables(self, state: TrainState):
        variables = {"params": state.params}
        if len(jax.tree_util.tree_leaves(state.batch_stats)) > 0:
            variables["batch_stats"] = state.batch_stats
        return variables

    def validate(self, state: TrainState) -> float:
        """Returns the scalar the reference tracks as 'dice_sample' /
        'performance' for best-model selection."""
        cfg = self.cfg
        cases = self._load_val_cases()
        variables = self._eval_variables(state)
        self._last_val_per_class = None
        # cache=True: the validation set is fixed for the whole run, so
        # the evaluators keep the prepared volumes device-resident
        # instead of re-uploading every 200 iterations
        if cfg.variant == "la":
            return self.evaluator.validate_dice(variables, cases,
                                                rule=cfg.eval_rule,
                                                cache=True)
        if cfg.variant == "acdc":
            per_case = [np.array(m) for m in
                        self.evaluator.validate_volumes(variables, cases,
                                                        cache=True)]
            metric = np.mean(per_case, axis=0)       # (classes-1, 2)
            self._last_val_per_class = metric        # for info/val_* tags
            return float(metric[:, 0].mean())        # mean dice
        # pancreas: mean dice over center-cropped test volumes, argmax rule
        from bcp_tpu.eval.metrics import dice_binary
        total = 0.0
        preds = self.evaluator.infer_cases(
            variables, (img for img, _ in cases), rule=cfg.eval_rule,
            cache_tokens=(("val", i) for i in range(len(cases))))
        for pred, (_, label) in zip(preds, cases):
            total += dice_binary(pred, label) if pred.sum() > 0 else 0.0
        return total / max(len(cases), 1)

    # ---------------- stages ----------------

    def _run_stage(self, stage: str, max_iterations: int,
                   init_from: Optional[str] = None,
                   resume: bool = False) -> Tuple[float, str]:
        cfg = self.cfg
        enable_compile_cache()
        out_dir = self.pre_dir if stage == "pre" else self.self_dir
        os.makedirs(out_dir, exist_ok=True)
        logger = setup_logging(out_dir)
        writer = MetricWriter(os.path.join(out_dir, "log"))
        logger.info("config: %s", cfg)

        tx = build_optimizer(cfg, stage)
        state = init_state(self.model, cfg,
                           jax.random.PRNGKey(cfg.seed), tx)
        if init_from is not None:
            # stage hand-off (`LA_BCP_train.py:220-222` weights-only;
            # `ACDC_BCP_train.py:335-336` student+opt)
            if cfg.load_opt_state:
                state = self.ckpt.restore_with_opt(init_from, state)
            else:
                state = self.ckpt.restore_weights_only(init_from, state)
            logger.info("loaded from %s", init_from)
        last_path = os.path.join(out_dir, "last")
        resumed_best = 0.0
        if resume and os.path.exists(last_path):
            state = self.ckpt.restore(last_path, state)
            # a resumed stage must not clobber {model}_best_model with a
            # worse state: recover the historical best from the
            # iter_{i}_dice_{d} snapshot names
            resumed_best = scan_best_dice(out_dir)
            logger.info("resumed from %s at step %d (best dice so far "
                        "%.4f)", last_path, int(state.step), resumed_best)

        if self.mesh is not None:
            # data-parallel: params on every chip, XLA all-reduces grads
            # over ICI inside the jitted step (SURVEY.md C28/C29)
            from bcp_tpu.parallel import replicate_state
            state = replicate_state(state, self.mesh)
            sp = self.mesh.shape.get("space", 1)
            if sp > 1 and cfg.patch_size[0] % sp:
                raise ValueError(
                    f"sp_devices={sp} must divide the patch's leading "
                    f"spatial extent {cfg.patch_size[0]}")
            logger.info("mesh over %d devices: data=%d space=%d "
                        "(global batch %d)", self.mesh.size,
                        self.data_scale, sp,
                        cfg.batch_size * self.data_scale)

        K = max(int(cfg.steps_per_dispatch), 1)
        if K > 1:
            if cfg.eval_every % K or (max_iterations - int(state.step)) % K:
                raise ValueError(
                    f"eval_every ({cfg.eval_every}) and the remaining "
                    f"iterations ({max_iterations - int(state.step)}) "
                    f"must be multiples of steps_per_dispatch ({K})")
        if stage == "pre":
            step_fn = make_pretrain_step(self.model, tx, cfg, n_steps=K)
        else:
            step_fn = make_selftrain_step(self.model, tx, cfg, n_steps=K)
        feeder = BCPBatchFeeder(cfg, stage, sharding=self.sharding,
                                data_scale=self.data_scale, stack=K,
                                store_cache=self._feed_store_cache)
        logger.info("%d iterations per epoch (device-store init %.1fs)",
                    feeder.steps_per_epoch, feeder.store_init_s)

        if cfg.debug_nans:
            # SURVEY.md §5 "race detection/sanitizers absent" -> the
            # TPU-native equivalent: trap NaNs inside the jitted step.
            jax.config.update("jax_debug_nans", True)

        meters = None
        if cfg.variant == "pancreas":
            # `CutPreMeasures` / `CutmixFTMeasures` online meters incl.
            # per-step train dice (`pancreas_utils.py:122-150,223-251`,
            # `train_pancreas.py:63,98-99,114,173-174`)
            meters = (cut_pre_measures(writer, logger) if stage == "pre"
                      else cutmix_ft_measures(writer, logger))

        base_key = jax.random.PRNGKey(cfg.seed + (0 if stage == "pre"
                                                  else 1))
        best = {"dice": resumed_best}   # shared with the val worker
        best_path = best_model_path(out_dir, cfg.net_type)

        def run_validation(v_it: int, v_state: TrainState) -> None:
            """Validate one state + write its checkpoints — the body of
            the reference's eval boundary (`LA_BCP_train.py:173-187`).
            Runs inline (async_val=False) or on the _ValWorker. The
            best-dice decision is made here, in validation order; only
            the checkpoint I/O (device fetch + disk write) is handed to
            the chained ckpt worker so validation v+1 overlaps the
            writes of validation v — in the r5 LA pre-train, eval+ckpt
            (~44 s serial) exceeded the 29.6 s of compute between eval
            boundaries, backing the queue up into the train loop."""
            tv = time.time()
            dice_sample = self.validate(v_state)
            t_eval = time.time() - tv
            tc = time.time()
            if dice_sample > best["dice"]:
                best["dice"] = round(dice_sample, 4)
                tagged = os.path.join(
                    out_dir, f"iter_{v_it}_dice_{best['dice']}")
                io_job = partial(self.ckpt.save_many,
                                 [tagged, best_path, last_path], v_state)
                logger.info("save best model to %s", tagged)
            else:
                io_job = partial(self.ckpt.save, last_path, v_state)
            if ckpt_worker is not None:
                ckpt_worker.submit(io_job)
            else:
                io_job()
            self._val_tags(writer, stage, dice_sample, best["dice"], v_it)
            logger.info("validation@%d: dice %.4f (eval %.2fs, "
                        "ckpt %.2fs)", v_it, dice_sample, t_eval,
                        time.time() - tc)

        def snapshot_state(s: TrainState) -> TrainState:
            # the next step donates (and so deletes) the state's buffers:
            # each job must own a fresh on-device copy
            return jax.tree_util.tree_map(
                lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
                s)

        val_worker = (_ValWorker(cfg.async_val_depth) if cfg.async_val
                      else None)
        # second ordered stage of the validation pipeline: checkpoint
        # writes of validation v run while validation v+1 evaluates
        ckpt_worker = (_ValWorker(cfg.async_val_depth)
                       if val_worker is not None else None)
        warm_job = None
        if val_worker is not None:
            # Warm the evaluator off the critical path: upload the
            # (cached) validation volumes and compile the eval program so
            # the first eval boundary's job doesn't carry them. Discards
            # the dice; touches no best/checkpoint state. The snapshot is
            # taken NOW (the first step donates these buffers) but the
            # job is submitted only after the first step_fn call returns:
            # jit blocks through the (minutes-long) train-step compile,
            # and overlapping the worker's eval fetches with that compile
            # RPC wedged the tunneled runtime (r5: self-train hung at
            # stage start; execution-overlap at eval boundaries has been
            # safe for two rounds, compile-overlap had never been hit).
            warm_snap = snapshot_state(state)
            warm_job = lambda: (self.validate(warm_snap), None)[1]  # noqa: E731
        def emit_metrics(first_it: int, metrics) -> None:
            """Fetch + log metrics — one step's scalars, or a
            steps_per_dispatch group's leading-stacked scalars, emitted
            per sub-step exactly as K=1 would (TB scalars on the
            log_every cadence; pancreas meters every step,
            `pancreas_utils.py:122-150`)."""
            fetched = {k: np.atleast_1d(np.asarray(v)) for k, v in
                       jax.device_get(metrics).items()}
            n = len(next(iter(fetched.values())))
            for j in range(n):
                emit_one(first_it + j,
                         {k: float(v[j]) for k, v in fetched.items()})

        def emit_one(m_it: int, host_metrics) -> None:
            if m_it % cfg.log_every == 0:
                for k, v in self._metric_tags(
                        stage, host_metrics).items():
                    writer.scalar(k, v, m_it)
            if meters is not None:
                epoch = (m_it - 1) // feeder.steps_per_epoch + 1
                if (m_it - 1) % feeder.steps_per_epoch == 0:
                    meters.reset()   # per-epoch averages, as reference
                if stage == "pre":
                    meters.update(
                        ce_loss=host_metrics["loss_ce"],
                        dice_loss=host_metrics["loss_dice"],
                        loss_all=host_metrics["loss"],
                        train_dice=host_metrics["train_dice"])
                else:
                    meters.update(
                        mix_loss_lab=host_metrics["loss_l"],
                        mix_loss_unlab=host_metrics["loss_u"],
                        loss_all=host_metrics["loss"])
                meters.log(epoch, m_it)
            elif m_it % cfg.log_every == 0:
                logger.info("iteration %d : %s", m_it, " ".join(
                    f"{k}: {v:.4f}" for k, v in
                    sorted(host_metrics.items())))

        t0 = time.time()
        start = int(state.step)
        val_seconds = 0.0   # validation + checkpoint pauses (wall)
        pending = None   # (first_it, device metrics) awaiting fetch
        for itk in range(start + 1, max_iterations + 1, K):
            it = itk + K - 1      # last sub-step of this dispatch group
            if cfg.profile_dir and itk <= cfg.profile_steps[0] + start <= it:
                jax.profiler.start_trace(cfg.profile_dir)
            batch = next(feeder)
            # true unlabeled labels ride along for the ACDC snapshot
            # panels only (`ACDC_BCP_train.py:368-369`); the step never
            # sees them
            ulabs = {k: batch.pop(k) for k in ("ulab_a", "ulab_b")
                     if k in batch}
            # Snapshot panels are computed from the PRE-update state with
            # the due sub-step's own fold_in key, so the mixed inputs /
            # targets are bit-identical to what that step consumes
            # (with steps_per_dispatch > 1 the group's initial state
            # stands in for later sub-steps' pre-state — the teacher is
            # then up to K-1 EMA updates behind; monitoring-only delta).
            snap_pending = None
            if self.log_images:
                due = [j for j in range(K)
                       if self._snapshot_due(itk + j, stage)]
                if due:
                    j = due[0]
                    sub = (batch if K == 1 else jax.tree_util.tree_map(
                        lambda a: a[j], batch))
                    sub_ulabs = (ulabs if K == 1 else
                                 {k: v[j] for k, v in ulabs.items()})
                    skey = jax.random.fold_in(base_key, itk + j)
                    try:
                        snap_pending = (itk + j, self._compute_snapshot(
                            stage, state, sub, skey, sub_ulabs))
                    except Exception:
                        logger.exception("image snapshot failed")
            if K == 1:
                key = jax.random.fold_in(base_key, itk)
                state, metrics = step_fn(state, batch, key)
            else:
                # keys are derived in-graph: fold_in(base_key, itk + j)
                state, metrics = step_fn(state, batch, base_key,
                                          jnp.int32(itk))
            if warm_job is not None:
                # first dispatch done compiling (jit blocked through it);
                # execution is async, so the warmup still overlaps it
                val_worker.submit(warm_job)
                warm_job = None
            # One-step-deferred metric processing: fetch the previous
            # dispatch's scalars only after this one is dispatched, so
            # the host<->device round-trip overlaps device compute
            # instead of serialising with it (the fetch is the only
            # per-iteration sync; measured ~96 ms/iter of exposed latency
            # on the tunneled v5e with log_every=1). Log *content* is
            # identical to the reference's per-iteration prints — each
            # line still carries its own step's values.
            if pending is not None:
                emit_metrics(*pending)
            want = (meters is not None
                    or any((itk + j) % cfg.log_every == 0
                           for j in range(K)))
            pending = (itk, metrics) if want else None
            if stage == "self":
                # computed + logged, never applied (reference parity —
                # `LA_BCP_train.py:246,260`)
                for j in range(itk, it + 1):
                    cw = cfg.consistency * float(
                        sigmoid_rampup(j // 150, cfg.consistency_rampup))
                    if cfg.variant == "acdc":
                        # ACDC's helper carries an extra 5x factor
                        # (`ACDC_BCP_train.py:119-121`); LA/pancreas do not
                        writer.scalar("info/consistency_weight", 5.0 * cw, j)
                    else:
                        # `LA_BCP_train.py:260`
                        writer.scalar("Self/consistency", cw, j)
            if cfg.profile_dir and itk <= cfg.profile_steps[1] + start <= it:
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s",
                            cfg.profile_dir)

            if snap_pending is not None:
                try:
                    self._emit_snapshot(writer, stage, feeder,
                                        *snap_pending)
                except Exception:
                    logger.exception("image logging failed")

            if it % cfg.eval_every == 0:
                if pending is not None:   # keep log lines in step order
                    emit_metrics(*pending)
                    pending = None
                tv0 = time.time()
                if val_worker is not None:
                    val_worker.submit(partial(run_validation, it,
                                              snapshot_state(state)))
                else:
                    run_validation(it, state)
                # exposed pause only: the snapshot copy + any wait for a
                # still-running previous validation (async), or the whole
                # validation + checkpoint write (sync)
                val_seconds += time.time() - tv0

        if pending is not None:   # flush the last step's metrics
            emit_metrics(*pending)
            pending = None

        if val_worker is not None:
            tv0 = time.time()
            try:
                val_worker.drain()      # may still submit ckpt jobs...
                ckpt_worker.drain()     # ...so drain the I/O stage after
            finally:
                val_worker.close()
                ckpt_worker.close()
            val_seconds += time.time() - tv0
        best_dice = best["dice"]

        if not os.path.exists(best_path):
            # A stage shorter than eval_every would otherwise leave no
            # best checkpoint for the hand-off (the reference only saves
            # at %200 boundaries and crashes in that case): validate and
            # save at stage end.
            dice_sample = self.validate(state)
            best_dice = round(dice_sample, 4)
            self.ckpt.save_many([best_path, last_path], state)
            logger.info("end-of-stage save (dice %.4f) to %s", best_dice,
                        best_path)

        dt = time.time() - t0
        done = max_iterations - start
        logger.info("stage %s done: %d steps in %.1fs (%.3f s/step), "
                    "validation+ckpt pauses %.1fs (%.1f%%), "
                    "best dice %.4f", stage, done, dt,
                    dt / max(done, 1), val_seconds,
                    100.0 * val_seconds / max(dt, 1e-9), best_dice)
        feeder.close()
        writer.close()
        return best_dice, best_path

    def _metric_tags(self, stage: str, m: Dict[str, float]
                     ) -> Dict[str, float]:
        """Per-variant step-scalar tags, byte-identical to the reference:
        LA `pre/*` + `Self/*` (`LA_BCP_train.py:164-166,261-263`), ACDC
        `info/*` (`ACDC_BCP_train.py:259-261,392-394`); pancreas scalars
        are owned by the Measures meters (`pancreas_utils.py:146-149`)."""
        if self.cfg.variant == "acdc":
            return {"info/total_loss": m["loss"],
                    "info/mix_dice": m["loss_dice"],
                    "info/mix_ce": m["loss_ce"]}
        if self.cfg.variant == "la":
            if stage == "pre":
                return {"pre/loss_dice": m["loss_dice"],
                        "pre/loss_ce": m["loss_ce"],
                        "pre/loss_all": m["loss"]}
            return {"Self/loss_l": m["loss_l"],
                    "Self/loss_u": m["loss_u"],
                    "Self/loss_all": m["loss"]}
        return {}

    def _val_tags(self, writer: MetricWriter, stage: str,
                  dice_sample: float, best_dice: float, it: int) -> None:
        """Validation tags: LA `4_Var_dice/*` (`LA_BCP_train.py:185-186`),
        ACDC `info/val_*` (`ACDC_BCP_train.py:281-285`), pancreas
        `test_dice`/`val_dice` (`train_pancreas.py:77,136`)."""
        if self.cfg.variant == "acdc":
            per_class = getattr(self, "_last_val_per_class", None)
            if per_class is not None:
                for ci in range(per_class.shape[0]):
                    writer.scalar(f"info/val_{ci + 1}_dice",
                                  float(per_class[ci, 0]), it)
                    writer.scalar(f"info/val_{ci + 1}_hd95",
                                  float(per_class[ci, 1]), it)
            writer.scalar("info/val_mean_dice", dice_sample, it)
        elif self.cfg.variant == "pancreas":
            writer.scalar("test_dice" if stage == "pre" else "val_dice",
                          dice_sample, it)
        else:
            writer.scalar("4_Var_dice/Dice", dice_sample, it)
            writer.scalar("4_Var_dice/Best_dice", best_dice, it)

    # -- reference-faithful TB image snapshots (train/snapshots.py) -----
    def _snapshot_due(self, it: int, stage: str) -> bool:
        """The reference's image cadences: LA self-train every
        ``eval_every`` at ``iter % 200 == 1`` (`LA_BCP_train.py:294`);
        ACDC both stages every 20 (`ACDC_BCP_train.py:265,399`); no
        images for LA pre-train or pancreas."""
        if self.cfg.variant == "acdc":
            return it % 20 == 0
        if self.cfg.variant == "la" and stage == "self":
            return it % self.cfg.eval_every == 1
        return False

    def _compute_snapshot(self, stage: str, state: TrainState, batch,
                          key, ulabs):
        from bcp_tpu.train import snapshots
        cache_key = (stage, self.cfg.variant)
        fn = self._snapshot_fns.get(cache_key)
        if fn is None:
            if self.cfg.variant == "la":
                fn = snapshots.make_la_snapshot_fn(
                    self.model, self.eval_model, self.cfg)
            else:
                fn = snapshots.make_acdc_snapshot_fn(
                    self.model, self.eval_model, self.cfg, stage)
            self._snapshot_fns[cache_key] = fn
        if self.cfg.variant == "acdc" and stage == "self":
            return fn(state, batch, key, ulabs["ulab_a"],
                      ulabs["ulab_b"])
        return fn(state, batch, key)

    def _emit_snapshot(self, writer: MetricWriter, stage: str, feeder,
                       it: int, panels):
        from bcp_tpu.train import snapshots
        panels = {k: np.asarray(v) for k, v in panels.items()}
        if self.cfg.variant == "la":
            # `LA_BCP_train.py:321,340`: Epoch_{e}_Iter_{i}_{labeled,
            # unlabel} grids; epoch = 0-based dataloader epoch
            epoch = (it - 1) // max(feeder.steps_per_epoch, 1)
            for tag, prefix in (("labeled", "mixl"), ("unlabel", "mixu")):
                grid = snapshots.la_snapshot_grid(
                    panels[f"{prefix}_img"], panels[f"{prefix}_lab"],
                    panels[f"{prefix}_prob"])
                writer.images(f"Epoch_{epoch}_Iter_{it}_{tag}", grid)
        else:
            for tag, img in panels.items():
                writer.image(tag, img[None].astype(np.float32), it)

    def pretrain(self, resume: bool = False) -> Tuple[float, str]:
        return self._run_stage("pre", self.cfg.pre_iterations,
                               resume=resume)

    def selftrain(self, pretrained: Optional[str] = None,
                  resume: bool = False) -> Tuple[float, str]:
        init_from = pretrained or best_model_path(self.pre_dir,
                                                  self.cfg.net_type)
        return self._run_stage("self", self.cfg.self_iterations,
                               init_from=init_from, resume=resume)

    def run(self) -> Dict[str, float]:
        pre_dice, _ = self.pretrain()
        self_dice, _ = self.selftrain()
        return {"pre_best_dice": pre_dice, "self_best_dice": self_dice}
