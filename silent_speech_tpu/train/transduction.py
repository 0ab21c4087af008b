"""EMG→mel transduction training on TPU.

Workload parity with the reference loop (``transduction_model.py:159-227``):
AdamW with linear warmup + plateau decay, size-aware length-packed batches
(256k raw samples), per-epoch validation with phoneme accuracy/confusion,
checkpoint each epoch, optional per-epoch vocoded audio sample, final dev-set
synthesis + ASR WER.

TPU-first structure: batches are packed on the host into static-shape
:class:`~..data.packing.PackedBatch` buckets, the entire
forward + DTW loss + backward + AdamW update is ONE jit region (donated
state), sharded over the device mesh; the host only computes the LR scalar
and aggregates logged metrics.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.dataset import EMGDataset
from ..data.packing import PackedBatch, pack_batch, SILENT_BUCKET
from ..data.sampler import SizeAwareSampler
from ..models.encoder import EMGEncoder
from ..ops.dtw import dtw_align
from ..parallel.mesh import make_mesh, shard_params, shard_batch
from ..phonemes import NUM_PHONES
from .checkpoint import (
    save_checkpoint, export_reference_checkpoint, load_reference_checkpoint,
    load_params_into_state,
)
from .losses import transduction_loss
from .schedule import ReduceLROnPlateau, warmup_lr
from .state import TrainState, create_train_state, make_adamw, \
    set_learning_rate


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class TransductionTrainer:
    def __init__(self, cfg: Config, num_mel_bins: int = 80,
                 mesh=None, dtype=None,
                 use_segment_mask: bool = False):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.mesh.data_parallel, cfg.mesh.model_parallel)
        if dtype is None:
            dtype = (jnp.bfloat16
                     if cfg.model.compute_dtype == "bfloat16"
                     else jnp.float32)
        self.dtype = dtype
        # hardware RNG for dropout masks: threefry costs ~50ms/step at this
        # batch size on v5e; rbg is ~2.5x cheaper and fine for dropout
        jax.config.update("jax_default_prng_impl", "rbg")
        self.use_segment_mask = use_segment_mask
        self.model = EMGEncoder(
            num_outs=num_mel_bins, num_aux_outs=NUM_PHONES,
            model_size=cfg.model.model_size,
            num_layers=cfg.model.num_layers,
            num_heads=cfg.model.num_heads,
            dim_feedforward=cfg.model.dim_feedforward,
            dropout=cfg.model.dropout,
            max_dist=cfg.model.relative_positional_distance,
            bn_axis_name=None,  # BN sync handled by GSPMD data sharding
            shift_augment=cfg.model.shift_augment,
            remat_layers=cfg.model.remat_layers,
            fused_attention=cfg.model.fused_attention,
            dtype=dtype)
        self.tx = make_adamw(weight_decay=cfg.transduction.l2,
                             moment_dtype=cfg.transduction.moment_dtype)
        self.state: Optional[TrainState] = None
        self._train_step = self._build_train_step()
        self._wave_step = self._build_wave_step()
        self._cache_step = self._build_cache_step()
        self._cache_scan_step = None  # built on first cache_scan_ids use
        self._eval_step = self._build_eval_step()
        self._forward = self._build_forward()

    # ---------------- jitted kernels ----------------------------------
    def _apply(self, params, batch_stats, batch, train, rngs=None,
               mutable=False):
        seg = batch.segment_ids if self.use_segment_mask else None
        return self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch.emg, batch.raw_emg, batch.session_ids,
            segment_ids=seg, train=train, rngs=rngs,
            mutable=["batch_stats"] if mutable else False)

    def _build_train_step(self):
        w = self.cfg.transduction.phoneme_loss_weight

        def train_step(state: TrainState, batch, rng, lr, n_silent):
            # LR is a traced scalar arg — never poke opt_state from the
            # host between steps (an eager dispatch per step is disastrous
            # through the remote-device relay)
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, lr))
            step_rng = jax.random.fold_in(rng, state.step)
            shift_rng, dropout_rng = jax.random.split(step_rng)

            def loss_fn(params):
                (pred, phone), mutated = self._apply(
                    params, state.batch_stats, batch, train=True,
                    rngs={"shift": shift_rng, "dropout": dropout_rng},
                    mutable=True)
                out = transduction_loss(pred, phone, batch, w,
                                        n_silent=n_silent,
                                        matmul_dtype=self.dtype)
                return out.loss, (mutated["batch_stats"], out)

            (loss, (bs, out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads, new_batch_stats=bs)
            metrics = {"loss": loss, "correct": out.correct_phones,
                       "total": out.total_length}
            return new_state, metrics

        return jax.jit(train_step, donate_argnums=(0,),
                       static_argnums=(4,))

    def _build_wave_step(self):
        """One step over a stacked wave of W batches: slice batch ``i`` on
        device, then the normal step body. The wave is uploaded once while
        the device is idle (remote-device links serialize H2D transfers
        against in-flight compute, so per-step uploads are ruinous)."""
        w = self.cfg.transduction.phoneme_loss_weight

        def wave_step(state: TrainState, wave, i, rng, lr, n_silent):
            batch = jax.tree_util.tree_map(lambda x: x[i], wave)
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, lr))
            step_rng = jax.random.fold_in(rng, state.step)
            shift_rng, dropout_rng = jax.random.split(step_rng)

            def loss_fn(params):
                (pred, phone), mutated = self._apply(
                    params, state.batch_stats, batch, train=True,
                    rngs={"shift": shift_rng, "dropout": dropout_rng},
                    mutable=True)
                out = transduction_loss(pred, phone, batch, w,
                                        n_silent=n_silent,
                                        matmul_dtype=self.dtype)
                return out.loss, (mutated["batch_stats"], out)

            (loss, (bs, out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads, new_batch_stats=bs)
            metrics = {"loss": loss, "correct": out.correct_phones,
                       "total": out.total_length}
            return new_state, metrics

        return jax.jit(wave_step, donate_argnums=(0,),
                       static_argnums=(5,))

    def _cache_caps(self):
        """Static shape caps for on-device assembly (same as _pack's)."""
        cb = _round_up(self.cfg.data.chunk_bucket,
                       self.mesh.shape["data"])
        return dict(
            n_chunks=_round_up(
                -(-self._frames_cap // self.cfg.data.seq_len) + 2, cb),
            seq_len=self.cfg.data.seq_len,
            t_cap=self.cfg.data.t_cap,
            text_cap=128,
        )

    def _build_cache_step(self):
        """Train step over the HBM corpus cache: per-step host→device
        traffic is one (U,) id vector; the packed batch is assembled by
        on-device gathers (data/device_cache.py)."""
        from ..data.device_cache import assemble_batch

        w = self.cfg.transduction.phoneme_loss_weight

        def cache_step(state: TrainState, arrays, utt_ids, utt_valid, rng,
                       lr, n_silent):
            batch = assemble_batch(arrays, utt_ids, utt_valid,
                                   **self._cache_caps())
            if self.mesh.devices.size > 1:
                from ..parallel.mesh import constrain_batch

                batch = constrain_batch(batch, self.mesh)
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, lr))
            step_rng = jax.random.fold_in(rng, state.step)
            shift_rng, dropout_rng = jax.random.split(step_rng)

            def loss_fn(params):
                (pred, phone), mutated = self._apply(
                    params, state.batch_stats, batch, train=True,
                    rngs={"shift": shift_rng, "dropout": dropout_rng},
                    mutable=True)
                out = transduction_loss(pred, phone, batch, w,
                                        n_silent=n_silent,
                                        matmul_dtype=self.dtype)
                return out.loss, (mutated["batch_stats"], out)

            (loss, (bs, out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads, new_batch_stats=bs)
            metrics = {"loss": loss, "correct": out.correct_phones,
                       "total": out.total_length}
            return new_state, metrics

        return jax.jit(cache_step, donate_argnums=(0,),
                       static_argnums=(6,))

    def _build_cache_scan_step(self):
        """W train steps per dispatch: ``lax.scan`` over a (W, U) id wave
        against the HBM corpus. Python-level dispatch through a
        remote-attached device costs tens of ms per call (docs/ROUND1.md);
        scanning W steps inside ONE jit amortizes it to D/W. The scan
        carries the donated train state; per-step host traffic is W·(U+1)
        scalars."""
        from ..data.device_cache import assemble_batch

        w_loss = self.cfg.transduction.phoneme_loss_weight

        def scan_step(state: TrainState, arrays, utt_ids_w, utt_valid_w,
                      rng, lrs, n_silent):
            def body(state, xs):
                utt_ids, utt_valid, lr = xs
                batch = assemble_batch(arrays, utt_ids, utt_valid,
                                       **self._cache_caps())
                if self.mesh.devices.size > 1:
                    from ..parallel.mesh import constrain_batch

                    batch = constrain_batch(batch, self.mesh)
                state = state.replace(
                    opt_state=set_learning_rate(state.opt_state, lr))
                step_rng = jax.random.fold_in(rng, state.step)
                shift_rng, dropout_rng = jax.random.split(step_rng)

                def loss_fn(params):
                    (pred, phone), mutated = self._apply(
                        params, state.batch_stats, batch, train=True,
                        rngs={"shift": shift_rng,
                              "dropout": dropout_rng},
                        mutable=True)
                    out = transduction_loss(pred, phone, batch, w_loss,
                                            n_silent=n_silent,
                                            matmul_dtype=self.dtype)
                    return out.loss, (mutated["batch_stats"], out)

                (loss, (bs, out)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                state = state.apply_gradients(grads, new_batch_stats=bs)
                return state, {"loss": loss,
                               "correct": out.correct_phones,
                               "total": out.total_length}

            return jax.lax.scan(body, state,
                                (utt_ids_w, utt_valid_w, lrs))

        return jax.jit(scan_step, donate_argnums=(0,),
                       static_argnums=(6,))

    def _cache_guard_ok(self, corpus, ids: List[int], caps, u_cap) -> bool:
        """True when a batch fits the static assembly caps."""
        return not (
            len(ids) > u_cap
            or int(corpus.feat_len_host[ids].sum())
            > caps["n_chunks"] * caps["seq_len"]
            or int(corpus.feat_len_host[ids].max(initial=0))
            > caps["t_cap"]
            or int(corpus.tgt_len_host[ids].max(initial=0))
            > caps["t_cap"]
            or int(corpus.text_len_host[ids].max(initial=0))
            > caps["text_cap"])

    def _cache_fits(self, corpus, ids: List[int]) -> bool:
        """True when one id-batch fits the static cache-step caps
        (order-independent: the guard only sums/maxes over ids)."""
        caps = self._cache_caps()
        u_cap = _round_up(self.cfg.data.utt_cap, self.mesh.shape["data"])
        return self._cache_guard_ok(corpus, list(ids), caps, u_cap)

    def cache_scan_ids(self, corpus, id_lists: List[List[int]], rng,
                       lrs: List[float]):
        """Run ``len(id_lists)`` cached-corpus steps in ONE dispatch.
        Returns stacked metrics, or None if any batch exceeds the caps
        (callers fall back to per-batch steps)."""
        caps = self._cache_caps()
        u_cap = _round_up(self.cfg.data.utt_cap, self.mesh.shape["data"])
        w = len(id_lists)
        utt_ids = np.zeros((w, u_cap), np.int32)
        valid = np.zeros((w, u_cap), bool)
        n_silent = 0
        for j, ids in enumerate(id_lists):
            ids = corpus.order_silent_first(ids)
            if not self._cache_guard_ok(corpus, ids, caps, u_cap):
                return None
            n_sil = sum(1 for i in ids if corpus.silent_mask[i])
            n_silent = max(n_silent,
                           min(-(-max(n_sil, 0) // SILENT_BUCKET)
                               * SILENT_BUCKET, u_cap)
                           if n_sil else 0)
            utt_ids[j, : len(ids)] = ids
            valid[j, : len(ids)] = True
        if self._cache_scan_step is None:
            self._cache_scan_step = self._build_cache_scan_step()
        self.state, metrics = self._cache_scan_step(
            self.state, corpus.arrays, utt_ids, valid,
            jax.random.PRNGKey(0) if rng is None else rng,
            np.asarray(lrs, np.float32), n_silent)
        return metrics

    def cache_step_ids(self, corpus, ids: List[int], rng, lr: float):
        """Run one cached-corpus step for the given utterance indices;
        returns metrics (or None if the batch exceeds the static caps)."""
        caps = self._cache_caps()
        u_cap = _round_up(self.cfg.data.utt_cap, self.mesh.shape["data"])
        ids = corpus.order_silent_first(ids)
        # static-cap guards: oversized batches fall back to the host path
        if not self._cache_guard_ok(corpus, ids, caps, u_cap):
            return None
        n_sil = sum(1 for i in ids if corpus.silent_mask[i])
        n_silent = min(-(-max(n_sil, 0) // SILENT_BUCKET)
                       * SILENT_BUCKET, u_cap) if n_sil else 0
        utt_ids = np.zeros(u_cap, np.int32)
        utt_ids[: len(ids)] = ids
        valid = np.zeros(u_cap, bool)
        valid[: len(ids)] = True
        self.state, metrics = self._cache_step(
            self.state, corpus.arrays, utt_ids, valid,
            jax.random.PRNGKey(0) if rng is None else rng,
            np.float32(lr), n_silent)
        return metrics

    def _upload_wave(self, batches: List[PackedBatch]):
        """Stack W device-batches and ship them in one transfer."""
        dbs = [b.device_batch(
            send_features=self.cfg.data.send_feature_input,
            target_dtype=(np.float16
                          if self.cfg.data.target_transfer_dtype
                          == "float16" else None)) for b in batches]
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *dbs)
        if self.mesh.devices.size > 1:
            # wave axis 0 is the step index; batch arrays shard on axis 1
            return shard_batch(stacked, self.mesh, leading_axis=1)
        return jax.device_put(stacked)

    def _build_eval_step(self):
        w = self.cfg.transduction.phoneme_loss_weight

        def eval_step(params, batch_stats, batch, n_silent):
            pred, phone = self._apply(params, batch_stats, batch,
                                      train=False)
            out = transduction_loss(pred, phone, batch, w,
                                    phoneme_eval=True, n_silent=n_silent)
            return {"loss": out.loss, "correct": out.correct_phones,
                    "total": out.total_length, "confusion": out.confusion}

        return jax.jit(eval_step, static_argnums=(3,))

    def _build_forward(self):
        def forward(params, batch_stats, emg, raw, sess, seg):
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                emg, raw, sess, segment_ids=seg, train=False)

        return jax.jit(forward)

    # ---------------- state -------------------------------------------
    def init_state(self, example_batch: PackedBatch, seed: int = 0
                   ) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        state = create_train_state(
            self.model, rng, example_batch, self.tx)
        state = state.replace(
            params=shard_params(state.params, self.mesh),
            batch_stats=shard_params(state.batch_stats, self.mesh))
        if self.cfg.transduction.start_training_from:
            params, stats = load_reference_checkpoint(
                self.cfg.transduction.start_training_from,
                num_layers=self.cfg.model.num_layers)
            state = load_params_into_state(state, params, stats,
                                           strict=False)
            state = state.replace(
                params=shard_params(state.params, self.mesh),
                batch_stats=shard_params(state.batch_stats, self.mesh))
        self.state = state
        return state

    # ---------------- batching ----------------------------------------
    @property
    def _frames_cap(self) -> int:
        """Packed feature frames implied by the raw-sample batch capacity
        (1 kHz capture → 516.79 Hz → frame hop 6, read_emg.py:70-88)."""
        return int(self.cfg.transduction.max_batch_len
                   * (516.79 / 1000.0) / 6.0)

    def _pack(self, examples: List[dict]) -> PackedBatch:
        dp = self.mesh.shape["data"]
        cb = _round_up(self.cfg.data.chunk_bucket, dp)
        fixed_chunks = fixed_utts = fixed_t = None
        if self.cfg.data.fixed_shapes:
            fixed_t = self.cfg.data.t_cap
            fixed_utts = _round_up(self.cfg.data.utt_cap, dp)
            fixed_chunks = _round_up(
                -(-self._frames_cap // self.cfg.data.seq_len) + 2, cb)
        return pack_batch(
            examples, seq_len=self.cfg.data.seq_len, chunk_bucket=cb,
            utt_bucket=_round_up(8, dp), fixed_chunks=fixed_chunks,
            fixed_utts=fixed_utts, fixed_t=fixed_t)

    def _to_device(self, batch: PackedBatch):
        """DeviceBatch for a jit call. On a 1-device mesh host arrays are
        passed straight into jit (implicit transfer overlaps better through
        remote-device relays than explicit device_put); multi-device meshes
        shard explicitly."""
        db = batch.device_batch(
            send_features=self.cfg.data.send_feature_input,
            target_dtype=(np.float16
                          if self.cfg.data.target_transfer_dtype
                          == "float16" else None))
        if self.mesh.devices.size > 1:
            return shard_batch(db, self.mesh)
        return db

    def batches(self, dataset: EMGDataset, max_len: Optional[int] = None,
                seed: Optional[int] = None) -> Iterable[PackedBatch]:
        sampler = SizeAwareSampler(
            dataset, max_len or self.cfg.transduction.max_batch_len,
            seed=seed)
        for idx_batch in sampler:
            yield self._pack([dataset[i] for i in idx_batch])

    # ---------------- train / eval ------------------------------------
    def fit(self, trainset: EMGDataset, devset: EMGDataset,
            epochs: Optional[int] = None, vocoder=None,
            save_sound_outputs: bool = False, seed: int = 0,
            resume: bool = False, eval_every: int = 1,
            checkpoint_every: int = 1) -> TrainState:
        """``eval_every``/``checkpoint_every``: run validation (and the
        plateau scheduler) / write checkpoints every N epochs. The
        default 1 is the reference cadence (transduction_model.py:213-226
        evaluates and saves each epoch); >1 trades per-epoch visibility
        for wall-clock when the devset pass dominates (small corpora,
        host-CPU runs). The final epoch always evaluates and saves."""
        cfg = self.cfg.transduction
        epochs = epochs if epochs is not None else cfg.epochs

        if cfg.data_size_fraction < 1:
            trainset = trainset.subset(cfg.data_size_fraction)

        plateau = ReduceLROnPlateau(patience=cfg.learning_rate_patience)
        rng = jax.random.PRNGKey(seed + 1)
        global_step = 0
        start_epoch = 0
        os.makedirs(cfg.output_directory, exist_ok=True)

        if self.state is None:
            self.init_state(self._pack([trainset[0]]), seed=seed)
        if resume:
            from .checkpoint import checkpoint_exists, restore_checkpoint

            if checkpoint_exists(cfg.output_directory):
                self.state, extra = restore_checkpoint(
                    cfg.output_directory, self.state, with_extra=True)
                global_step = int(extra.get("global_step",
                                            int(self.state.step)))
                start_epoch = int(extra.get("epoch", 0))
                for k, v in extra.get("plateau", {}).items():
                    setattr(plateau, k, v)
                logging.info("resumed from epoch %d (step %d)",
                             start_epoch, global_step)

        # one sampler across epochs → fresh shuffle each epoch
        sampler = SizeAwareSampler(trainset, cfg.max_batch_len, seed=seed)

        wave_size = max(1, self.cfg.data.wave_size) \
            if self.cfg.data.fixed_shapes else 1

        corpus = None
        if self.cfg.data.device_cache and self.cfg.data.fixed_shapes:
            from ..data.device_cache import HBMBudgetError
            from ..data.jax_featurize import build_device_corpus

            logging.info("building HBM corpus cache (%d examples, "
                         "%s featurization)", len(trainset),
                         self.cfg.data.cache_featurize)
            try:
                corpus = build_device_corpus(
                    trainset, mesh=self.mesh,
                    featurize=self.cfg.data.cache_featurize,
                    hbm_fraction=self.cfg.data.cache_hbm_fraction)
            except HBMBudgetError as e:
                logging.warning("%s", e)
                logging.warning("HBM cache over budget - using the host "
                                "packing path (per-batch upload)")

        for epoch in range(start_epoch, epochs):
            losses = []
            t0 = time.time()
            n_steps = 0
            batch_iter = iter(sampler)

            def take_wave():
                out = []
                for idx_batch in batch_iter:
                    out.append(self._pack([trainset[i]
                                           for i in idx_batch]))
                    if len(out) >= wave_size:
                        break
                return out

            def lr_now():
                return np.float32(
                    warmup_lr(global_step, cfg.learning_rate,
                              cfg.learning_rate_warmup) * plateau.scale)

            if corpus is not None:
                scan_w = max(1, wave_size)
                id_batches = list(batch_iter)
                # pre-mark over-cap batches so one oversized batch only
                # degrades ITSELF to per-step dispatch, not every wave
                # window containing it (see recognition.fit)
                fits = [self._cache_fits(corpus, ids)
                        for ids in id_batches]
                pos = 0
                while pos < len(id_batches):
                    metrics = None
                    # only full waves scan (a short tail would recompile)
                    if scan_w > 1 and fits[pos]:
                        end = pos
                        while (end < len(id_batches)
                               and end - pos < scan_w and fits[end]):
                            end += 1
                        if end - pos == scan_w:
                            group = id_batches[pos:end]
                            lrs = [warmup_lr(global_step + j,
                                             cfg.learning_rate,
                                             cfg.learning_rate_warmup)
                                   * plateau.scale
                                   for j in range(len(group))]
                            metrics = self.cache_scan_ids(
                                corpus, group, rng, lrs)
                    if metrics is not None:  # W steps in one dispatch
                        losses.extend(metrics["loss"])
                        global_step += scan_w
                        n_steps += scan_w
                        pos += scan_w
                        continue
                    idx_batch = id_batches[pos]
                    metrics = self.cache_step_ids(corpus, idx_batch, rng,
                                                  lr_now())
                    if metrics is None:  # over static caps → host path
                        b = self._pack([trainset[i] for i in idx_batch])
                        db = self._to_device(b)
                        self.state, metrics = self._train_step(
                            self.state, db, rng, lr_now(),
                            b.num_silent)
                    losses.append(metrics["loss"])
                    global_step += 1
                    n_steps += 1
                    pos += 1
                current = []
            else:
                current = take_wave()
            metrics = None
            while current:
                stackable = (len(current) > 1
                             and len({b.shape_key()
                                      for b in current}) == 1
                             and all(b.num_silent is not None
                                     for b in current))
                if stackable:
                    ns = max(b.num_silent for b in current)
                    wave = self._upload_wave(current)
                    for i in range(len(current)):
                        self.state, metrics = self._wave_step(
                            self.state, wave, np.int32(i), rng,
                            lr_now(), ns)
                        losses.append(metrics["loss"])
                        global_step += 1
                        n_steps += 1
                else:
                    for b in current:
                        db = self._to_device(b)
                        self.state, metrics = self._train_step(
                            self.state, db, rng, lr_now(), b.num_silent)
                        losses.append(metrics["loss"])
                        global_step += 1
                        n_steps += 1
                # pack the next wave while the device runs this one, then
                # sync so the next upload lands on an idle device
                current = take_wave()
                if metrics is not None:
                    float(metrics["loss"])
            train_loss = float(np.mean([float(l) for l in losses])) \
                if losses else float("nan")
            dt = time.time() - t0
            if losses and not np.isfinite(train_loss):
                logging.error("non-finite training loss at epoch %d — "
                              "stopping (checkpoint from the previous "
                              "epoch is intact)", epoch + 1)
                raise FloatingPointError("non-finite training loss")

            last = epoch + 1 == epochs
            if (epoch + 1) % max(eval_every, 1) == 0 or last:
                val_loss, phoneme_acc, _ = self.evaluate(devset)
                plateau.step(val_loss)
                logging.info(
                    f"finished epoch {epoch + 1} - validation loss: "
                    f"{val_loss:.4f} training loss: {train_loss:.4f} "
                    f"phoneme accuracy: {phoneme_acc * 100:.2f}")
            else:
                logging.info(f"finished epoch {epoch + 1} - training "
                             f"loss: {train_loss:.4f}")
            logging.info("epoch %d: %d steps in %.1fs (%.2f steps/s)",
                         epoch + 1, n_steps, dt,
                         n_steps / dt if dt > 0 else 0.0)

            if not ((epoch + 1) % max(checkpoint_every, 1) == 0 or last):
                continue
            save_checkpoint(
                cfg.output_directory, self.state,
                extra={"epoch": epoch + 1, "global_step": global_step,
                       "plateau": {"best": plateau.best,
                                   "num_bad_epochs": plateau.num_bad_epochs,
                                   "scale": plateau.scale}})
            try:
                export_reference_checkpoint(
                    self.state,
                    os.path.join(cfg.output_directory, "model.pt"))
            except ImportError:
                pass
            if save_sound_outputs and vocoder is not None:
                from ..eval.synthesis import save_output

                save_output(
                    self, devset[0],
                    os.path.join(cfg.output_directory,
                                 f"epoch_{epoch}_output.wav"),
                    devset.mfcc_norm, vocoder)
        return self.state

    def eval_groups(self, dataset: EMGDataset, batch_size: int = 32):
        """Group eval examples to fit the fixed packed-batch capacity
        (keeps validation on the single compiled shape)."""
        groups: List[List[int]] = []
        cur: List[int] = []
        cur_frames = 0
        cap = self._frames_cap if self.cfg.data.fixed_shapes else None
        for i in range(len(dataset)):
            frames = dataset[i]["emg"].shape[0]
            over_cap = cap is not None and cur and \
                cur_frames + frames > cap
            if len(cur) >= batch_size or over_cap:
                groups.append(cur)
                cur, cur_frames = [], 0
            cur.append(i)
            cur_frames += frames
        if cur:
            groups.append(cur)
        return groups

    def evaluate(self, dataset: EMGDataset, batch_size: int = 32):
        """Validation loss / phoneme accuracy / confusion matrix
        (reference ``transduction_model.py:33-55``)."""
        assert self.state is not None, "call fit() or init_state() first"
        total_loss = 0.0
        total_batches = 0
        correct = 0
        total = 0
        confusion = np.zeros((NUM_PHONES, NUM_PHONES))
        for group in self.eval_groups(dataset, batch_size):
            examples = [dataset[i] for i in group]
            batch = self._pack(examples)
            db = self._to_device(batch)
            m = self._eval_step(self.state.params, self.state.batch_stats,
                                db, batch.num_silent)
            total_loss += float(m["loss"])
            total_batches += 1
            correct += int(m["correct"])
            total += int(m["total"])
            confusion += np.asarray(m["confusion"])
        mean_loss = total_loss / max(total_batches, 1)
        acc = correct / max(total, 1)
        return mean_loss, acc, confusion

    # ---------------- inference ---------------------------------------
    @staticmethod
    def pad_single(example: dict):
        """Bucket-padded (emg, raw, sess, seg, t) arrays for a solo
        utterance forward (padding masked out of attention)."""
        t = example["emg"].shape[0]
        t_pad = _round_up(max(t, 8), 32)
        emg = np.zeros((1, t_pad, example["emg"].shape[1]), np.float32)
        emg[0, :t] = example["emg"]
        raw = np.zeros((1, t_pad * 8, example["raw_emg"].shape[1]),
                       np.float32)
        raw[0, : t * 8] = example["raw_emg"]
        sess = np.zeros((1, t_pad), np.int32)
        sess[0, :t] = example["session_ids"]
        seg = np.zeros((1, t_pad), np.int32)
        seg[0, :t] = 1
        return emg, raw, sess, seg, t

    def predict(self, example: dict) -> np.ndarray:
        """(T, 80) normalized mel prediction for one utterance. Padding is
        masked out of attention, so the result equals a solo unpadded
        forward (the reference's inference setting)."""
        assert self.state is not None
        emg, raw, sess, seg, t = self.pad_single(example)
        pred, _ = self._forward(self.state.params, self.state.batch_stats,
                                emg, raw, sess, seg)
        return np.asarray(pred)[0, :t]

    def get_aligned_prediction(self, example: dict, audio_normalizer
                               ) -> np.ndarray:
        """DTW-warp the prediction onto the (voiced) target timeline and
        denormalize (reference ``transduction_model.py:75-96``) — the
        vocoder fine-tuning data path."""
        pred = self.predict(example)
        if example["silent"]:
            y = np.asarray(example["parallel_voiced_audio_features"])
            costs = np.sqrt(np.clip(
                (pred ** 2).sum(-1)[:, None] + (y ** 2).sum(-1)[None, :]
                - 2 * pred @ y.T, 1e-12, None))
            align, _ = dtw_align(
                jnp.asarray(costs.T),
                jnp.asarray(y.shape[0], jnp.int32),
                jnp.asarray(pred.shape[0], jnp.int32))
            pred = pred[np.asarray(align)]
        return audio_normalizer.inverse(pred)
