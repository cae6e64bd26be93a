"""Runner: builds everything from the global config and drives
train/val/test with a single jit-compiled train step.

Capability mirror of the reference Runner (`python/jdet/runner/runner.py`):
ctor builds model/optimizer/scheduler/datasets/logger from cfg (:22-70);
`run` loops epochs with eval/checkpoint intervals (:80-90); `train` logs
FPS/ETA/losses every log_interval (:117-158); `val`/`test` run eval-mode
inference (:171-221); `save`/`load`/`resume` manage checkpoints with
auto-search (:224-263); `test_time` measures steps/sec (:91-115).

TPU redesign: the hot loop is one jitted function (fwd+bwd+update over the
data mesh); datasets yield fixed-shape host batches from a prefetch
thread; eval inference is a second jitted function; rank gating uses
jax.process_index.
"""
from __future__ import annotations

import os
import pickle
import time

import numpy as np

from .. import data as _data  # noqa: F401 — registers DATASETS/TRANSFORMS
from ..config import get_cfg, save_cfg
from ..models.builder import build_detector
from ..optim import build_lr_schedule, build_optimizer
from ..parallel.spmd import (
    build_train_step,
    is_main_process,
    make_mesh,
    psum_scalar_metrics,
    shard_batch,
)
from ..utils.general import (
    build_file,
    check_interval,
    search_ckpt,
    set_random_seed,
)
from ..utils.logger import RunLogger
from ..utils.registry import DATASETS, build_from_cfg
from .checkpoint import load_checkpoint, save_checkpoint


class Runner:
    def __init__(self, cfg=None, mode="whole"):
        import jax
        from flax import nnx

        self.jax = jax
        self.nnx = nnx
        cfg = cfg or get_cfg()
        self.cfg = cfg
        self.work_dir = os.path.abspath(cfg.work_dir or "exp/default")
        self.max_epoch = cfg.max_epoch or 0
        self.max_iter = cfg.max_iter or 0
        assert self.max_epoch or self.max_iter, "need max_epoch or max_iter"
        self.checkpoint_interval = cfg.checkpoint_interval or 1
        self.eval_interval = cfg.eval_interval
        self.log_interval = cfg.log_interval or 50
        if cfg.seed is not None:
            set_random_seed(cfg.seed)

        self.model = build_detector(cfg.model.dump() if hasattr(cfg.model, "dump") else dict(cfg.model), seed=cfg.seed or 0)

        # datasets
        ds_cfg = cfg.dataset or {}
        self.train_dataset = (
            build_from_cfg(_plain(ds_cfg.get("train")), DATASETS)
            if ds_cfg.get("train") and mode == "whole"
            else None
        )
        self.val_dataset = (
            build_from_cfg(_plain(ds_cfg.get("val")), DATASETS)
            if ds_cfg.get("val")
            else None
        )
        self.test_dataset = (
            build_from_cfg(_plain(ds_cfg.get("test")), DATASETS)
            if ds_cfg.get("test")
            else None
        )

        steps_per_epoch = (
            self.train_dataset.num_batches if self.train_dataset else 1
        )
        if not self.max_iter:
            self.max_iter = self.max_epoch * steps_per_epoch
        if not self.max_epoch:
            self.max_epoch = max(1, self.max_iter // max(steps_per_epoch, 1))

        # optimizer + schedule
        ocfg = _plain(cfg.optimizer) or {"type": "SGD", "lr": 0.01}
        scfg = _plain(cfg.scheduler) or {}
        self.lr_schedule = build_lr_schedule(
            ocfg.get("lr", 0.01),
            scheduler_type=scfg.get("type", "StepLR"),
            milestones=scfg.get("milestones", ()),
            gamma=scfg.get("gamma", 0.1),
            steps_per_epoch=steps_per_epoch,
            max_steps=self.max_iter,
            warmup=scfg.get("warmup"),
            warmup_iters=scfg.get("warmup_iters", 500),
            warmup_ratio=scfg.get("warmup_ratio", 1.0 / 3),
            min_lr=scfg.get("min_lr", 0.0),
            power=scfg.get("power", 1.0),
        )
        group_schedules = None
        if scfg.get("groups"):
            # WarmUpLRGroup / CosineAnnealingLRGroup capability
            # (reference lr_scheduler.py:73,257): per-group warmup/lr
            from ..optim.lr_scheduler import build_group_lr_schedules

            common = dict(
                scheduler_type=scfg.get("type", "StepLR"),
                milestones=scfg.get("milestones", ()),
                gamma=scfg.get("gamma", 0.1),
                steps_per_epoch=steps_per_epoch,
                max_steps=self.max_iter,
                warmup=scfg.get("warmup"),
                warmup_iters=scfg.get("warmup_iters", 500),
                warmup_ratio=scfg.get("warmup_ratio", 1.0 / 3),
                min_lr=scfg.get("min_lr", 0.0),
                power=scfg.get("power", 1.0),
            )
            group_schedules = build_group_lr_schedules(
                ocfg.get("lr", 0.01), scfg["groups"], **common
            )
        self.optimizer = build_optimizer(
            self.model,
            opt_type=ocfg.get("type", "SGD"),
            lr_schedule=self.lr_schedule,
            momentum=ocfg.get("momentum", 0.9),
            weight_decay=ocfg.get("weight_decay", 0.0001),
            grad_clip=ocfg.get("grad_clip"),
            frozen_stages=_plain(cfg.model).get("backbone", {}).get("frozen_stages"),
            param_groups=ocfg.get("param_groups"),
            group_schedules=group_schedules,
        )

        # 1-D data mesh over all devices that evenly divide the train batch
        # (reference DP touchpoints runner.py:44,112,130,149 — here the
        # whole surface is the mesh + sharded train step in spmd.py).
        train_bs = (
            self.train_dataset.batch_size if self.train_dataset else None
        )
        self.mesh = make_mesh(batch_size=train_bs)
        self._root_key = jax.random.PRNGKey(cfg.seed or 0)
        self.logger = RunLogger(self.work_dir) if is_main_process() else None
        self.epoch = 0
        self.iter = 0
        if is_main_process():
            try:
                save_cfg(os.path.join(self.work_dir, "config.yaml"))
            except Exception:
                os.makedirs(self.work_dir, exist_ok=True)

        if cfg.pretrained_weights:
            self.load(cfg.pretrained_weights, model_only=True)
        if cfg.resume_path or cfg.resume:
            self.resume()

        self._train_step = None
        self._predict_fn = None
        # optional device-side normalization: pair with the dataset's
        # image_dtype="uint8" to ship raw pixels and normalize on device
        dn = cfg.device_normalize
        if dn:
            from ..parallel.spmd import make_device_normalizer

            self._preprocess = make_device_normalizer(
                dn.get("mean", [0.0, 0.0, 0.0]),
                dn.get("std", [1.0, 1.0, 1.0]),
                dn.get("to_bgr", False),
            )
        else:
            self._preprocess = None
        # optional device-side geometric augmentation (flip/rot90 moved
        # into the jitted step; host keeps decode+resize):
        #   device_augment = dict(flip_h=0.5, flip_v=0.0, rot90=0.0)
        da = cfg.device_augment
        if da:
            from ..parallel.spmd import make_device_augmenter

            self._augment = make_device_augmenter(
                flip_h=da.get("flip_h", 0.0),
                flip_v=da.get("flip_v", 0.0),
                rot90=da.get("rot90", 0.0),
            )
        else:
            self._augment = None
        # optional model EMA (reference ModelEMAWraper, networks/yolo.py:57-91)
        ema_cfg = cfg.ema
        self._ema_cfg = (
            dict(ema_cfg) if isinstance(ema_cfg, dict)
            else ({} if ema_cfg else None)
        )
        self.ema = None

    # ------------------------------------------------------------------
    @property
    def finish(self):
        return self.epoch >= self.max_epoch

    def _build_train_step(self):
        # training graphs must be traced with cache_on=False: a
        # load()->val()->train_epoch() resume otherwise bakes the frozen
        # ExpandedWeight buffer into the train graphdef and the base
        # weights stop receiving gradients (ADVICE r3)
        from ..models.equivariant import cache_expanded_weights

        cache_expanded_weights(self.model, enable=False)
        # ...except FROZEN backbone stages: their weights never update
        # (optimizer mask + backbone stop_gradient), so the 8x ARF/
        # steerable expansion is loop-invariant across the whole run —
        # precompute it once instead of re-gathering every step (the
        # dominant non-conv cost of frozen ReResNet stages)
        bb = getattr(self.model, "backbone", None)
        fs = getattr(bb, "frozen_stages", -1) if bb is not None else -1
        if fs is not None and fs >= 0:
            for name in ["conv1", "bn1"] + [
                f"layer{i}" for i in range(1, fs + 1)
            ]:
                sub = getattr(bb, name, None)
                if sub is not None:
                    cache_expanded_weights(sub, enable=True)
        graphdef, state, step = build_train_step(
            self.model, self.optimizer, self.mesh,
            preprocess=self._preprocess,
            augment=self._augment,
        )
        self._graphdef = graphdef
        self._state = state
        self._train_step = step
        if self._ema_cfg is not None and self.ema is None:
            from ..utils.ema import ModelEMA

            self.ema = ModelEMA(
                self._state[0], decay=self._ema_cfg.get("decay", 0.9999)
            )

    def _sync_state_to_model(self):
        if self._train_step is not None:
            self.nnx.update(
                (self.model, self.optimizer), self._state
            )

    def _build_predict(self):
        jax, nnx = self.jax, self.nnx
        from functools import partial

        from ..parallel.spmd import batch_sharding, replicated_sharding

        from ..parallel.spmd import make_mesh

        graphdef, state = nnx.split(self.model)

        preprocess = self._preprocess
        # LOCAL mesh: val/test run on the main process only (reference
        # @jt.single_process_scope, runner.py:170), so a global-mesh
        # collective would deadlock multi-host — shard inference over
        # this host's devices only
        self._predict_mesh = make_mesh(devices=self.jax.local_devices())
        rep = replicated_sharding(self._predict_mesh)
        dat = batch_sharding(self._predict_mesh)

        # data-parallel inference: batch sharded over the local mesh,
        # params replicated. _run_inference pads batches to mesh-size
        # divisibility.
        @partial(jax.jit, in_shardings=(rep, dat, dat), out_shardings=rep)
        def predict(state, images, scale_factor):
            m = nnx.merge(graphdef, state)
            if preprocess is not None:
                images = preprocess(images)
            return m.predict(images, {"scale_factor": scale_factor})

        self._predict_graphdef = graphdef
        self._predict_rep = rep
        self._predict_fn = predict

    # ------------------------------------------------------------------
    def run(self):
        if self.logger:
            self.logger.print_on_screen(
                {"work_dir": self.work_dir, "max_epoch": self.max_epoch}
            )
        while not self.finish:
            self.train_epoch()
            if check_interval(self.epoch, self.eval_interval):
                self.val()
            if check_interval(self.epoch, self.checkpoint_interval):
                self.save()
        self.test()

    def train_epoch(self):
        import jax

        if self._train_step is None:
            self._build_train_step()
        start = time.time()
        n_img = 0
        from ..parallel.spmd import prefetch_to_device

        for (images, targets), metas in prefetch_to_device(
            self.train_dataset.batches(epoch=self.epoch,
                                       seed=self.cfg.seed or 0),
            size=2,
        ):
            self._state, log_vars = self._train_step(
                self._state, images, targets, self._root_key,
                jax.numpy.int32(self.iter),
            )
            if self.ema is not None:
                self.ema.update(self._state[0])
            self.iter += 1
            n_img += images.shape[0]
            if check_interval(self.iter, self.log_interval) and self.logger:
                log_vars = psum_scalar_metrics(log_vars, self.mesh)
                dt = time.time() - start
                fps = n_img / max(dt, 1e-9)
                eta = (self.max_iter - self.iter) * dt / max(self.iter, 1)
                self.logger.log(
                    {
                        "name": self.cfg.name,
                        "epoch": self.epoch,
                        "iter": self.iter,
                        "lr": float(self.lr_schedule(self.iter)),
                        "fps": round(fps, 2),
                        "eta_min": round(eta / 60, 1),
                        **log_vars,
                    }
                )
            if self.max_iter and self.iter >= self.max_iter:
                break
        self.epoch += 1
        self._sync_state_to_model()

    # ------------------------------------------------------------------
    def _run_inference(self, dataset):
        """Eval-mode inference, optionally with flip TTA (reference
        flip_test H/V/HV loop, runner.py:201-215: extra passes on flipped
        images whose detections are unflipped back)."""
        import jax

        self._sync_state_to_model()
        raw_state = None
        if self.ema is not None:
            # evaluate the EMA weights (reference ModelEMAWraper.execute);
            # snapshot the raw weights so save() after a load()+val() (no
            # train step built → _sync_state_to_model is a no-op) does not
            # checkpoint EMA weights as the 'model' payload
            _, raw_state = self.nnx.split(self.model)
            self.nnx.update(self.model, self.ema.ema)
        # fill the ARF/steerable expansion caches from the current weights
        # (no-op for models without equivariant/OR convs); must precede
        # _build_predict — the first fill flips a static flag
        from ..models.equivariant import cache_expanded_weights

        cache_expanded_weights(self.model)
        if self._predict_fn is None:
            self._build_predict()
        _, state = self.nnx.split(self.model)
        if jax.process_count() > 1:
            # state arrays are committed to the GLOBAL training mesh; the
            # local-mesh predict jit cannot consume them directly — fetch
            # to host and re-place on the local mesh (ADVICE r2)
            state = jax.device_put(
                jax.device_get(state), self._predict_rep
            )
        flip_modes = list(self.cfg.flip_test or [])
        results = []
        mesh_n = (
            self._predict_mesh.size
            if getattr(self, "_predict_mesh", None) is not None
            else 1
        )
        from ..parallel.spmd import prefetch_to_device

        for (images, targets), metas in prefetch_to_device(
            dataset.batches(), size=2
        ):
            sf = targets["scale_factor"]
            if images.shape[0] % mesh_n:
                # pad the (last) batch to mesh divisibility; padded rows
                # have no meta entry so their detections are dropped
                pad = (-images.shape[0]) % mesh_n
                images = jax.numpy.concatenate(
                    [images, jax.numpy.zeros((pad, *images.shape[1:]),
                                             images.dtype)]
                )
                sf = jax.numpy.concatenate(
                    [sf, jax.numpy.ones((pad,), sf.dtype)]
                )
            variants = [(None, images)]
            for mode in flip_modes:
                v = images
                if "H" in mode:
                    v = v[:, :, ::-1]
                if "V" in mode:
                    v = v[:, ::-1]
                variants.append((mode, v))
            for mode, imgs in variants:
                det = self._predict_fn(state, imgs, sf)
                det = {k: np.asarray(v) for k, v in det.items()}
                if mode is not None:
                    det = _unflip_dets(det, mode, images.shape[2], images.shape[1])
                for i, meta in enumerate(metas):
                    results.append(({k: v[i] for k, v in det.items()}, meta))
        if raw_state is not None:
            self.nnx.update(self.model, raw_state)
        # drop the expansion caches in BOTH paths: wexp goes stale as
        # training continues and would otherwise be checkpointed; the next
        # _run_inference refills it from the then-current weights
        cache_expanded_weights(self.model, enable=False)
        return results

    def val(self):
        if self.val_dataset is None or not is_main_process():
            return {}
        results = self._run_inference(self.val_dataset)
        metrics = self.val_dataset.evaluate(
            results, self.work_dir, self.epoch
        )
        if self.logger:
            self.logger.log({"iter": self.iter, **metrics})
        return metrics

    def test(self):
        if self.test_dataset is None or not is_main_process():
            return None
        results = self._run_inference(self.test_dataset)
        path = build_file(
            self.work_dir, f"test/test_{self.epoch}.pkl"
        )
        with open(path, "wb") as f:
            pickle.dump(
                [
                    ({k: np.asarray(v) for k, v in det.items()}, _meta_light(meta))
                    for det, meta in results
                ],
                f,
            )
        if hasattr(self.test_dataset, "save_submission"):
            self.test_dataset.save_submission(
                results, os.path.join(self.work_dir, "submission")
            )
        return path

    def run_on_images(self, images_dir, save_dir=None):
        from ..data.dota import ImageDataset
        from ..utils.visualization import visualize_results

        ds = ImageDataset(
            images_dir=images_dir,
            dataset_type=self.cfg.dataset_type or "DOTA",
            transforms=_plain(self.cfg.dataset.get("test", {})).get("transforms"),
            image_size=_plain(self.cfg.dataset.get("test", {})).get("image_size", (1024, 1024)),
        )
        results = self._run_inference(ds)
        if save_dir:
            visualize_results(results, ds.CLASSES, images_dir, save_dir)
        return results

    def profile(self, n_steps=10, out_dir=None):
        """Capture a jax.profiler device trace of the train step
        (SURVEY §5: TPU equivalent of the reference's timing hooks).
        View with TensorBoard or xprof."""
        import jax

        if self._train_step is None:
            self._build_train_step()
        out_dir = out_dir or os.path.join(self.work_dir, "profile")
        gen = self.train_dataset.batches()
        batch, _ = next(gen)
        images = jax.numpy.asarray(batch["images"])
        targets = {k: jax.numpy.asarray(v) for k, v in batch["targets"].items()}
        # warm up / compile outside the trace
        self._state, _ = self._train_step(
            self._state, images, targets, self._root_key, jax.numpy.int32(0)
        )
        jax.device_get(_)
        with jax.profiler.trace(out_dir):
            for _i in range(n_steps):
                self._state, lv = self._train_step(
                    self._state, images, targets, self._root_key,
                    jax.numpy.int32(_i + 1),
                )
            jax.device_get(lv)
        if self.logger:
            self.logger.print_on_screen({"profile_trace": out_dir})
        return out_dir

    def test_time(self, warmup=10, rerun=100):
        """FPS measurement (runner.py:91-115)."""
        import jax

        if self._train_step is None:
            self._build_train_step()
        gen = self.train_dataset.batches()
        batch, _ = next(gen)
        images = jax.numpy.asarray(batch["images"])
        targets = {k: jax.numpy.asarray(v) for k, v in batch["targets"].items()}
        it = 0
        for _ in range(warmup):
            self._state, _lv = self._train_step(
                self._state, images, targets, self._root_key,
                jax.numpy.int32(it),
            )
            it += 1
        jax.block_until_ready(self._state)
        t0 = time.perf_counter()
        for _ in range(rerun):
            self._state, _lv = self._train_step(
                self._state, images, targets, self._root_key,
                jax.numpy.int32(it),
            )
            it += 1
        jax.block_until_ready(self._state)
        fps = rerun * images.shape[0] / (time.perf_counter() - t0)
        if self.logger:
            self.logger.print_on_screen({"FPS": round(fps, 2)})
        return fps

    # ------------------------------------------------------------------
    def save(self):
        if not is_main_process():
            return None
        self._sync_state_to_model()
        path = build_file(
            self.work_dir, f"checkpoints/ckpt_{self.epoch}.pkl"
        )
        meta = {
            "epoch": self.epoch,
            "iter": self.iter,
            "max_epoch": self.max_epoch,
            "max_iter": self.max_iter,
            "config": self.cfg.dump() if hasattr(self.cfg, "dump") else dict(self.cfg),
        }
        return save_checkpoint(path, self.model, self.optimizer, meta,
                               ema=self.ema)

    def load(self, path, model_only=False):
        meta = load_checkpoint(path, self.model, self.optimizer, model_only)
        if not model_only:
            self.epoch = meta.get("epoch", 0)
            self.iter = meta.get("iter", 0)
        ema_payload = meta.pop("_ema_payload", None)
        if ema_payload is not None and self._ema_cfg is not None:
            # restore the EMA shadow weights + ramp counter; without this
            # a resume would silently restart the EMA from the raw
            # weights at updates=0
            from ..utils.ema import ModelEMA

            self.ema = ModelEMA(
                ema_payload["state"],
                decay=ema_payload.get(
                    "decay", self._ema_cfg.get("decay", 0.9999)
                ),
                updates=ema_payload.get("updates", 0),
            )
        self._train_step = None  # state must be re-split
        self._predict_fn = None
        return meta

    def resume(self):
        path = self.cfg.resume_path or search_ckpt(self.work_dir)
        if path and os.path.exists(path):
            self.load(path)
            if self.logger:
                self.logger.print_on_screen({"resumed": path})


def _unflip_dets(det, mode, width, height):
    """Map detections from a flipped image back (data_merge.py:14-27
    unflip semantics; rbox flip formulas from transforms.py:393-398)."""
    boxes = det["boxes"].copy()
    polys = det["polys"].copy()
    if "H" in mode:
        boxes[..., 0] = width - boxes[..., 0] - 1
        boxes[..., 4] = (np.pi - boxes[..., 4] + np.pi / 4) % np.pi - np.pi / 4
        polys[..., 0::2] = width - polys[..., 0::2] - 1
    if "V" in mode:
        boxes[..., 1] = height - boxes[..., 1] - 1
        boxes[..., 4] = (-boxes[..., 4] + np.pi / 4) % np.pi - np.pi / 4
        polys[..., 1::2] = height - polys[..., 1::2] - 1
    det["boxes"] = boxes
    det["polys"] = polys
    return det


def _plain(obj):
    if obj is None:
        return {}
    if hasattr(obj, "dump"):
        return obj.dump()
    return dict(obj) if isinstance(obj, dict) else obj


def _meta_light(meta):
    return {
        k: v
        for k, v in meta.items()
        if k in ("filename", "img_id", "img_size", "scale_factor")
    }
