"""EMG→text CTC recognition training on TPU.

Workload parity with the reference loop (``recognition_model.py:61-117``):
the shared encoder with a 38-way head (37 chars + blank), CTC loss over
length-packed batches (128k raw samples), gradient accumulation ×2, AdamW
with 1000-step warmup and MultiStep LR [125,150,175]×0.5, per-epoch WER
validation via LM-fused beam decode.

TPU-first structure mirrors the transduction trainer: one donated-state jit
region per optimizer micro-step (optax.MultiSteps holds the accumulator on
device), host-side LR control, beam decode on the host (eval only).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.dataset import EMGDataset
from ..data.packing import PackedBatch, pack_batch
from ..data.sampler import SizeAwareSampler
from ..models.encoder import EMGEncoder
from ..parallel.mesh import make_mesh, shard_params, shard_batch
from ..text import TextTransform, wer
from ..eval.decode import beam_ctc_decode, greedy_ctc_decode, ArpaLM
from .checkpoint import (
    save_checkpoint, export_reference_checkpoint, load_reference_checkpoint,
    load_params_into_state,
)
from .losses import ctc_loss
from .schedule import MultiStepLR, warmup_lr
from .state import TrainState, create_train_state, make_adamw, \
    set_learning_rate


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class RecognitionTrainer:
    def __init__(self, cfg: Config, mesh=None, dtype=None,
                 use_segment_mask: bool = False):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.mesh.data_parallel, cfg.mesh.model_parallel)
        if dtype is None:
            dtype = (jnp.bfloat16
                     if cfg.model.compute_dtype == "bfloat16"
                     else jnp.float32)
        jax.config.update("jax_default_prng_impl", "rbg")  # fast dropout RNG
        self.text_transform = TextTransform()
        self.n_chars = len(self.text_transform.chars)
        self.blank_id = self.n_chars  # blank = last (recognition_model.py:33)
        self.use_segment_mask = use_segment_mask
        self.model = EMGEncoder(
            num_outs=self.n_chars + 1, num_aux_outs=None,
            model_size=cfg.model.model_size,
            num_layers=cfg.model.num_layers,
            num_heads=cfg.model.num_heads,
            dim_feedforward=cfg.model.dim_feedforward,
            dropout=cfg.model.dropout,
            max_dist=cfg.model.relative_positional_distance,
            shift_augment=cfg.model.shift_augment,
            remat_layers=cfg.model.remat_layers,
            fused_attention=cfg.model.fused_attention,
            dtype=dtype)
        self.tx = make_adamw(weight_decay=cfg.recognition.l2,
                             grad_accum=cfg.recognition.grad_accum,
                             moment_dtype=cfg.recognition.moment_dtype)
        self.state: Optional[TrainState] = None
        self._train_step = self._build_train_step()
        self._cache_step = self._build_cache_step()
        self._cache_scan_step = None  # built on first cache_scan_ids use
        self._logits_fn = self._build_logits_fn()
        self._lm: Optional[ArpaLM] = None

    def _apply(self, params, batch_stats, batch, train, rngs=None,
               mutable=False):
        seg = batch.segment_ids if self.use_segment_mask else None
        return self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch.emg, batch.raw_emg, batch.session_ids,
            segment_ids=seg, train=train, rngs=rngs,
            mutable=["batch_stats"] if mutable else False)

    def _build_train_step(self):
        blank = self.blank_id

        def train_step(state: TrainState, batch, rng, lr):
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, lr))
            step_rng = jax.random.fold_in(rng, state.step)
            shift_rng, dropout_rng = jax.random.split(step_rng)

            def loss_fn(params):
                logits, mutated = self._apply(
                    params, state.batch_stats, batch, train=True,
                    rngs={"shift": shift_rng, "dropout": dropout_rng},
                    mutable=True)
                log_probs = jax.nn.log_softmax(logits, axis=-1)
                loss = ctc_loss(log_probs, batch, blank_id=blank)
                return loss, mutated["batch_stats"]

            (loss, bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads, new_batch_stats=bs)
            return new_state, {"loss": loss}

        return jax.jit(train_step, donate_argnums=(0,))

    def _cache_caps(self):
        cb = _round_up(self.cfg.data.chunk_bucket, self.mesh.shape["data"])
        frames_cap = int(self.cfg.recognition.max_batch_len
                         * (516.79 / 1000.0) / 6.0)
        return dict(
            n_chunks=_round_up(
                -(-frames_cap // self.cfg.data.seq_len) + 2, cb),
            seq_len=self.cfg.data.seq_len,
            t_cap=self.cfg.data.t_cap,
            text_cap=128,
        )

    def _build_cache_step(self):
        """CTC train step over the HBM corpus cache (see
        transduction._build_cache_step)."""
        from ..data.device_cache import assemble_batch

        blank = self.blank_id

        def cache_step(state: TrainState, arrays, utt_ids, utt_valid, rng,
                       lr):
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
                logits, mutated = self._apply(
                    params, state.batch_stats, batch, train=True,
                    rngs={"shift": shift_rng, "dropout": dropout_rng},
                    mutable=True)
                log_probs = jax.nn.log_softmax(logits, axis=-1)
                loss = ctc_loss(log_probs, batch, blank_id=blank)
                return loss, mutated["batch_stats"]

            (loss, bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads, new_batch_stats=bs)
            return new_state, {"loss": loss}

        return jax.jit(cache_step, donate_argnums=(0,))

    def _build_cache_scan_step(self):
        """W CTC train steps per dispatch: ``lax.scan`` over a (W, U) id
        wave against the HBM corpus (mirror of
        transduction._build_cache_scan_step — Python-level dispatch
        through a remote-attached device costs ~1 s/call through the
        tunnel; scanning W steps inside ONE jit amortizes it to 1/W).
        The optax.MultiSteps ×2 grad-accumulation state rides in
        ``opt_state`` through the scan carry, so accumulate-then-apply
        behaves exactly as in the per-step path
        (recognition_model.py:105-107 parity)."""
        from ..data.device_cache import assemble_batch

        blank = self.blank_id

        def scan_step(state: TrainState, arrays, utt_ids_w, utt_valid_w,
                      rng, lrs):
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
                    logits, mutated = self._apply(
                        params, state.batch_stats, batch, train=True,
                        rngs={"shift": shift_rng,
                              "dropout": dropout_rng},
                        mutable=True)
                    log_probs = jax.nn.log_softmax(logits, axis=-1)
                    loss = ctc_loss(log_probs, batch, blank_id=blank)
                    return loss, mutated["batch_stats"]

                (loss, bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                state = state.apply_gradients(grads, new_batch_stats=bs)
                return state, {"loss": loss}

            return jax.lax.scan(body, state,
                                (utt_ids_w, utt_valid_w, lrs))

        return jax.jit(scan_step, donate_argnums=(0,))

    def _cache_fits(self, corpus, ids: List[int]) -> bool:
        """True when one id-batch fits the static cache-step caps."""
        caps = self._cache_caps()
        u_cap = _round_up(self.cfg.data.utt_cap, self.mesh.shape["data"])
        ids = list(ids)
        return not (len(ids) > u_cap
                    or int(corpus.feat_len_host[ids].sum())
                    > caps["n_chunks"] * caps["seq_len"]
                    or int(corpus.feat_len_host[ids].max(initial=0))
                    > caps["t_cap"]
                    or int(corpus.text_len_host[ids].max(initial=0))
                    > caps["text_cap"])

    def cache_scan_ids(self, corpus, id_lists: List[List[int]], rng,
                       lrs: List[float]):
        """Run ``len(id_lists)`` cached-corpus CTC steps in ONE dispatch.
        Returns stacked metrics, or None if any batch exceeds the caps
        (callers fall back to per-batch steps)."""
        u_cap = _round_up(self.cfg.data.utt_cap, self.mesh.shape["data"])
        w = len(id_lists)
        utt_ids = np.zeros((w, u_cap), np.int32)
        valid = np.zeros((w, u_cap), bool)
        for j, ids in enumerate(id_lists):
            ids = list(ids)
            if not self._cache_fits(corpus, ids):
                return None
            utt_ids[j, : len(ids)] = ids
            valid[j, : len(ids)] = True
        if self._cache_scan_step is None:
            self._cache_scan_step = self._build_cache_scan_step()
        self.state, metrics = self._cache_scan_step(
            self.state, corpus.arrays, utt_ids, valid,
            jax.random.PRNGKey(0) if rng is None else rng,
            np.asarray(lrs, np.float32))
        return metrics

    def cache_step_ids(self, corpus, ids: List[int], rng, lr: float):
        """One cached-corpus CTC step; None if the batch exceeds caps."""
        u_cap = _round_up(self.cfg.data.utt_cap, self.mesh.shape["data"])
        ids = list(ids)
        if not self._cache_fits(corpus, ids):
            return None
        utt_ids = np.zeros(u_cap, np.int32)
        utt_ids[: len(ids)] = ids
        valid = np.zeros(u_cap, bool)
        valid[: len(ids)] = True
        self.state, metrics = self._cache_step(
            self.state, corpus.arrays, utt_ids, valid, rng,
            np.float32(lr))
        return metrics

    def _build_logits_fn(self):
        def logits_fn(params, batch_stats, emg, raw, sess, seg):
            out = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                emg, raw, sess, segment_ids=seg, train=False)
            return jax.nn.log_softmax(out, axis=-1)

        return jax.jit(logits_fn)

    def _build_masked_logits_fn(self):
        """Full-utterance forward over a padded batch with segment masking:
        real frames attend only to real frames, so each utterance sees
        exactly the attention context of a solo forward (the reference
        evaluates one utterance at a time, ``recognition_model.py:37``)."""
        def fn(params, batch_stats, raw, sess, seg):
            emg = jnp.zeros((raw.shape[0], 1, 112), jnp.float32)
            out = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                emg, raw, sess, segment_ids=seg, train=False)
            return jax.nn.log_softmax(out, axis=-1)

        return jax.jit(fn)

    def batch_logits(self, examples: List[dict], group: int = 16
                     ) -> List[np.ndarray]:
        """(T_i, 38) log-probs for many utterances in a few padded batched
        forwards (vs one forward per utterance)."""
        assert self.state is not None
        if not hasattr(self, "_masked_logits_fn"):
            self._masked_logits_fn = self._build_masked_logits_fn()
        order = sorted(range(len(examples)),
                       key=lambda i: examples[i]["emg"].shape[0])
        out: List[Optional[np.ndarray]] = [None] * len(examples)
        for g in range(0, len(order), group):
            ids = order[g: g + group]
            lens = [examples[i]["emg"].shape[0] for i in ids]
            t_pad = -(-max(lens) // 32) * 32
            b = len(ids)
            raw = np.zeros((b, t_pad * 8, 8), np.float32)
            sess = np.zeros((b, t_pad), np.int32)
            seg = np.zeros((b, t_pad), np.int32)
            for k, i in enumerate(ids):
                t = lens[k]
                raw[k, : t * 8] = examples[i]["raw_emg"]
                sess[k, :t] = examples[i]["session_ids"]
                seg[k, :t] = 1
            lp = np.asarray(self._masked_logits_fn(
                self.state.params, self.state.batch_stats, raw, sess, seg))
            for k, i in enumerate(ids):
                out[i] = lp[k, : lens[k]]
        return out  # type: ignore[return-value]

    # ---------------- state / batching --------------------------------
    def init_state(self, example_batch: PackedBatch, seed: int = 0
                   ) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        state = create_train_state(self.model, rng, example_batch, self.tx)
        state = state.replace(
            params=shard_params(state.params, self.mesh),
            batch_stats=shard_params(state.batch_stats, self.mesh))
        if self.cfg.recognition.start_training_from:
            params, stats = load_reference_checkpoint(
                self.cfg.recognition.start_training_from,
                num_layers=self.cfg.model.num_layers)
            state = load_params_into_state(state, params, stats)
        self.state = state
        return state

    def _pack(self, examples: List[dict]) -> PackedBatch:
        dp = self.mesh.shape["data"]
        cb = _round_up(self.cfg.data.chunk_bucket, dp)
        fixed_chunks = fixed_utts = fixed_t = None
        if self.cfg.data.fixed_shapes:
            frames_cap = int(self.cfg.recognition.max_batch_len
                             * (516.79 / 1000.0) / 6.0)
            fixed_t = self.cfg.data.t_cap
            fixed_utts = _round_up(self.cfg.data.utt_cap, dp)
            fixed_chunks = _round_up(
                -(-frames_cap // self.cfg.data.seq_len) + 2, cb)
        return pack_batch(
            examples, seq_len=self.cfg.data.seq_len, chunk_bucket=cb,
            utt_bucket=_round_up(8, dp), with_audio=False,
            fixed_chunks=fixed_chunks, fixed_utts=fixed_utts,
            fixed_t=fixed_t)

    def _to_device(self, batch: PackedBatch):
        db = batch.device_batch(
            send_features=self.cfg.data.send_feature_input)
        if self.mesh.devices.size > 1:
            return shard_batch(db, self.mesh)
        return db

    # ---------------- train / eval ------------------------------------
    def fit(self, trainset: EMGDataset, devset: EMGDataset,
            epochs: Optional[int] = None, seed: int = 0,
            resume: bool = False, eval_every: int = 1,
            checkpoint_every: int = 1) -> TrainState:
        """``eval_every``/``checkpoint_every``: run the dev beam-WER pass /
        write checkpoints every N epochs (default 1 = the reference
        cadence, recognition_model.py:106-117; the final epoch always
        evaluates and saves)."""
        cfg = self.cfg.recognition
        epochs = epochs if epochs is not None else cfg.epochs
        os.makedirs(cfg.output_directory, exist_ok=True)

        multistep = MultiStepLR(milestones=cfg.lr_milestones,
                                gamma=cfg.lr_gamma)
        rng = jax.random.PRNGKey(seed + 1)
        sampler = SizeAwareSampler(trainset, cfg.max_batch_len, seed=seed)
        global_step = 0
        start_epoch = 0

        if self.state is None:
            self.init_state(self._pack([trainset[0]]), seed=seed)
        if resume:
            from .checkpoint import checkpoint_exists, restore_checkpoint

            if checkpoint_exists(cfg.output_directory):
                self.state, extra = restore_checkpoint(
                    cfg.output_directory, self.state, with_extra=True)
                global_step = int(extra.get("global_step", 0))
                start_epoch = int(extra.get("epoch", 0))
                multistep.epoch = start_epoch
                multistep.scale = float(extra.get("lr_scale", 1.0))
                logging.info("resumed from epoch %d (step %d)",
                             start_epoch, global_step)

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

        wave_size = max(1, self.cfg.data.wave_size) \
            if self.cfg.data.fixed_shapes else 1

        for epoch in range(start_epoch, epochs):
            losses = []
            t0 = time.time()

            def lr_at(step):
                # reference counts warmup in batches, stepping every 2
                return warmup_lr(step, cfg.learning_rate,
                                 cfg.learning_rate_warmup) \
                    * multistep.scale

            id_batches = list(sampler)
            # pre-mark over-cap batches: a wave is only attempted over a
            # run of cap-fitting batches, so one oversized batch degrades
            # ONLY itself to per-step dispatch — not every window that
            # would have contained it (each failed wave attempt costs the
            # full guard scan and, through the TPU tunnel, returns the
            # ~1 s/step dispatch latency the scan exists to amortize)
            fits = [corpus is not None and self._cache_fits(corpus, ids)
                    for ids in id_batches]
            pos = 0
            while pos < len(id_batches):
                metrics = None
                # only full waves scan (a short tail would recompile)
                if wave_size > 1 and fits[pos]:
                    end = pos
                    while (end < len(id_batches) and end - pos < wave_size
                           and fits[end]):
                        end += 1
                    if end - pos == wave_size:
                        group = id_batches[pos:end]
                        lrs = [lr_at(global_step + j)
                               for j in range(len(group))]
                        metrics = self.cache_scan_ids(corpus, group, rng,
                                                      lrs)
                if metrics is not None:  # W steps in one dispatch
                    losses.extend(metrics["loss"])
                    global_step += wave_size
                    pos += wave_size
                    continue
                group = id_batches[pos: pos + 1]
                idx_batch = group[0]
                lr = lr_at(global_step)
                metrics = None
                if corpus is not None:
                    metrics = self.cache_step_ids(corpus, idx_batch, rng,
                                                  lr)
                if metrics is None:
                    batch = self._pack([trainset[i] for i in idx_batch])
                    db = self._to_device(batch)
                    self.state, metrics = self._train_step(
                        self.state, db, rng, np.float32(lr))
                losses.append(metrics["loss"])
                global_step += 1
                pos += 1
            train_loss = float(np.mean([float(l) for l in losses])) \
                if losses else float("nan")
            if losses and not np.isfinite(train_loss):
                logging.error("non-finite training loss at epoch %d — "
                              "stopping", epoch + 1)
                raise FloatingPointError("non-finite training loss")
            last = epoch + 1 == epochs
            if (epoch + 1) % max(eval_every, 1) == 0 or last:
                val_wer = self.evaluate_wer(devset)
                logging.info(
                    f"finished epoch {epoch + 1} - training loss: "
                    f"{train_loss:.4f} validation WER: "
                    f"{val_wer * 100:.2f}")
            else:
                logging.info(f"finished epoch {epoch + 1} - training "
                             f"loss: {train_loss:.4f}")
            multistep.step()
            logging.info("epoch %d took %.1fs", epoch + 1,
                         time.time() - t0)
            if not ((epoch + 1) % max(checkpoint_every, 1) == 0 or last):
                continue
            save_checkpoint(
                cfg.output_directory, self.state,
                extra={"epoch": epoch + 1, "global_step": global_step,
                       "lr_scale": multistep.scale})
            try:
                export_reference_checkpoint(
                    self.state,
                    os.path.join(cfg.output_directory, "model.pt"))
            except ImportError:
                pass
        return self.state

    def _get_lm(self):
        """Beam-decode LM: KenLM probing ``.binary`` or ARPA text.

        Load failures are LOUD (reference parity: ctcdecode crashes
        without its ``lm.binary``, ``recognition_model.py:34-35``). The
        single tolerated absence is the *default* ``lm.binary`` path not
        existing — a fresh checkout without the downloaded LM — which
        warns once and decodes LM-free so smoke runs still work.
        """
        cfg = self.cfg.recognition
        if self._lm is not None or not cfg.lm_path:
            return self._lm
        from ..config import RecognitionTrainConfig

        is_default = cfg.lm_path == RecognitionTrainConfig().lm_path
        if is_default and not os.path.exists(cfg.lm_path):
            if not getattr(self, "_warned_no_lm", False):
                logging.warning(
                    "language model %r not found — decoding WITHOUT an "
                    "LM; WER will not match the reference's LM-fused "
                    "beam search (recognition_model.py:34-35). Pass "
                    "--lm_path to a KenLM probing .binary or ARPA file.",
                    cfg.lm_path)
                self._warned_no_lm = True
            return None
        from ..eval.kenlm_binary import load_lm

        self._lm = load_lm(cfg.lm_path)
        logging.info("loaded %s LM from %s (order %d)",
                     type(self._lm).__name__, cfg.lm_path, self._lm.order)
        return self._lm

    def predict_logits(self, example: dict) -> np.ndarray:
        """(T, 38) log-probs for one utterance. Padding frames are masked
        out of attention (segment ids), so the result equals a solo
        unpadded forward — the reference's eval setting."""
        assert self.state is not None
        t = example["emg"].shape[0]
        t_pad = _round_up(max(t, 8), 32)
        emg = np.zeros((1, t_pad, example["emg"].shape[1]), np.float32)
        emg[0, :t] = example["emg"]
        raw = np.zeros((1, t_pad * 8, example["raw_emg"].shape[1]),
                       np.float32)
        raw[0, : t * 8] = example["raw_emg"]
        sess = np.zeros((1, t_pad), np.int32)
        seg = np.zeros((1, t_pad), np.int32)
        seg[0, :t] = 1
        lp = self._logits_fn(self.state.params, self.state.batch_stats,
                             emg, raw, sess, seg)
        return np.asarray(lp)[0, :t]

    def decode(self, example: dict, beam: bool = True) -> str:
        lp = self.predict_logits(example)
        cfg = self.cfg.recognition
        if beam:
            ids = beam_ctc_decode(
                lp, self.text_transform.chars, self.blank_id,
                beam_width=cfg.beam_width, lm=self._get_lm(),
                alpha=cfg.lm_alpha, beta=cfg.lm_beta)
        else:
            ids = greedy_ctc_decode(lp, self.blank_id)
        return self.text_transform.int_to_text(ids)

    def evaluate_wer(self, dataset: EMGDataset, beam: bool = True,
                     batched: bool = True) -> float:
        """Validation WER (reference ``recognition_model.py:30-58``).
        ``batched`` computes all logits in a few padded device forwards;
        decoding stays per-utterance on the host."""
        cfg = self.cfg.recognition
        examples = [dataset[i] for i in range(len(dataset))]
        references = [self.text_transform.clean_text(e["text"])
                      for e in examples]
        predictions = []
        if batched:
            all_lp = self.batch_logits(examples)
            lm = self._get_lm() if beam else None

            def decode_one(lp):
                if beam:
                    ids = beam_ctc_decode(
                        lp, self.text_transform.chars, self.blank_id,
                        beam_width=cfg.beam_width, lm=lm,
                        alpha=cfg.lm_alpha, beta=cfg.lm_beta)
                else:
                    ids = greedy_ctc_decode(lp, self.blank_id)
                return self.text_transform.int_to_text(ids)

            # the native decoder releases the GIL for the whole C call,
            # so utterances decode in parallel across host cores; the
            # pure-Python fallback is GIL-bound and stays serial
            from ..eval.decode import native_beam_usable
            if beam and native_beam_usable(lm):
                from concurrent.futures import ThreadPoolExecutor

                workers = min(16, os.cpu_count() or 1, max(len(all_lp), 1))
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    predictions = list(pool.map(decode_one, all_lp))
            else:
                predictions = [decode_one(lp) for lp in all_lp]
        else:
            for ex in examples:
                predictions.append(self.decode(ex, beam=beam))
        return wer(references, predictions)
