"""Typed configuration, backed by the reference's absl flag names.

The reference's de-facto config system is a global absl ``FLAGS`` registry
spread across modules (SURVEY.md §2.2; ``transduction_model.py:22-31``,
``recognition_model.py:20-28``, ``architecture.py:10-12``, ``read_emg.py:21-25``,
``data_utils.py:15``, ``vocoder.py:14``, ``evaluate.py:19-20``,
``make_vocoder_trainset.py:17``). We keep every flag name/default for CLI
compatibility but back them with typed dataclasses so library code never
touches global state.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Sequence


@dataclass
class ModelConfig:
    """Encoder architecture (reference ``architecture.py:10-12,42-59``)."""

    model_size: int = 768
    num_layers: int = 6
    dropout: float = 0.2
    num_heads: int = 8
    dim_feedforward: int = 3072
    relative_positional_distance: int = 100
    raw_channels: int = 8          # EMG electrodes into the conv stack
    downsample_factor: int = 8     # 3× stride-2 ResBlocks
    # MXU compute precision for the encoder body (params/norms/heads stay
    # float32); TPU-first default is bfloat16
    compute_dtype: str = "bfloat16"
    # BatchNorm cross-replica sync axis; None = per-device stats.
    bn_axis_name: Optional[str] = "data"
    # train-time random raw-signal shift (architecture.py:64-68); off for
    # deterministic cross-framework parity runs
    shift_augment: bool = True
    # rematerialize transformer layers in the backward pass: trades ~33%
    # recompute FLOPs for the per-layer residual HBM traffic — a win when
    # effective bandwidth, not the MXU, bounds the step
    remat_layers: bool = False
    # fused Pallas attention kernel (ops/pallas/rel_attention.py)
    fused_attention: bool = True


@dataclass
class DataConfig:
    """Dataset discovery / featurization (reference ``read_emg.py:21-25``)."""

    remove_channels: List[int] = field(default_factory=list)
    silent_data_directories: List[str] = field(
        default_factory=lambda: ["./emg_data/silent_parallel_data"]
    )
    voiced_data_directories: List[str] = field(
        default_factory=lambda: [
            "./emg_data/voiced_parallel_data",
            "./emg_data/nonparallel_data",
        ]
    )
    testset_file: str = "testset_largedev.json"
    text_align_directory: str = "text_alignments"
    normalizers_file: str = "normalizers.pkl"
    # Fixed packing chunk length in feature frames; raw EMG chunks are 8×
    # (reference seq_len=200, ``transduction_model.py:191``).
    seq_len: int = 200
    # Round packed batches up to a multiple of this many chunks, so jit sees
    # a small set of static shapes instead of one shape per batch (TPU-first
    # addition; the reference recompiles nothing because torch is eager).
    chunk_bucket: int = 8
    # Fixed-shape packing: pad every batch to capacity-derived caps so the
    # whole training run compiles ONCE (vs ~40 s per distinct shape through
    # a remote compiler). Batches exceeding a cap fall back to bucketing.
    fixed_shapes: bool = True
    utt_cap: int = 64     # max utterances per packed batch
    t_cap: int = 1024     # max per-utterance frames (≈12 s at 86 fps)
    # host→device transfer trimming: the encoder ignores the 112-dim
    # feature tensor (architecture.py:61-75), so don't ship it by default;
    # mel targets may transfer at reduced precision (loss computes in f32)
    send_feature_input: bool = False
    target_transfer_dtype: str = "float32"  # or "float16"
    # batches per training "wave": W batches are stacked and uploaded in ONE
    # host→device transfer while the device is idle, then W steps run with
    # on-device slicing. Amortizes transfer latency (remote-device links
    # serialize uploads against in-flight compute). 1 = per-step transfers.
    # Only used when the HBM corpus cache is off.
    wave_size: int = 16
    # HBM-resident corpus cache: upload the featurized corpus once; each
    # step ships only a (U,) utterance-id vector and the packed batch is
    # assembled on device (data/device_cache.py). Requires fixed_shapes;
    # currently single-device meshes only.
    device_cache: bool = True
    # cache-build featurization: "jax" runs the batched masked device DSP
    # pipeline (data/jax_featurize.py); "host" uses the per-utterance
    # scipy/numpy path (data/dataset.py)
    cache_featurize: str = "jax"
    # fraction of per-device HBM the corpus cache may occupy (the rest is
    # params/optimizer/activations). Exceeding it falls back to the host
    # packing path with a warning (see data/device_cache.py's bytes/hour
    # arithmetic). <=0 disables the check.
    cache_hbm_fraction: float = 0.4


@dataclass
class TransductionTrainConfig:
    """EMG→mel training loop (reference ``transduction_model.py:22-31``)."""

    batch_size: int = 32  # defined-but-unused in the reference too
    epochs: int = 80
    learning_rate: float = 1e-3
    learning_rate_patience: int = 5
    learning_rate_warmup: int = 500
    start_training_from: Optional[str] = None
    data_size_fraction: float = 1.0
    phoneme_loss_weight: float = 0.5
    l2: float = 1e-7
    # Adam moment storage: bfloat16 cuts optimizer HBM traffic ~30%
    # (train/state.py fused_adamw); "float32" = bit-exact optax/torch
    moment_dtype: str = "bfloat16"
    output_directory: str = "output"
    # Length-packed batch capacity in raw-recording EMG samples
    # (``transduction_model.py:166``).
    max_batch_len: int = 256000


@dataclass
class RecognitionTrainConfig:
    """EMG→text CTC training loop (reference ``recognition_model.py:20-28``)."""

    batch_size: int = 32
    epochs: int = 200
    learning_rate: float = 3e-4
    learning_rate_warmup: int = 1000
    learning_rate_patience: int = 5
    start_training_from: Optional[str] = None
    l2: float = 0.0
    moment_dtype: str = "bfloat16"  # see TransductionTrainConfig
    output_directory: str = "output"
    evaluate_saved: Optional[str] = None
    debug: bool = False
    max_batch_len: int = 128000   # ``recognition_model.py:62``
    grad_accum: int = 2           # ``recognition_model.py:105-107``
    lr_milestones: Sequence[int] = (125, 150, 175)
    lr_gamma: float = 0.5
    # Beam decode (reference ``recognition_model.py:34-35``)
    lm_path: str = "lm.binary"
    lm_alpha: float = 1.5
    lm_beta: float = 1.85
    beam_width: int = 100


@dataclass
class VocoderConfig:
    """HiFi-GAN vocoder (reference ``vocoder.py:14``)."""

    hifigan_checkpoint: Optional[str] = None


@dataclass
class MeshConfig:
    """TPU mesh layout. The reference has no parallelism (SURVEY.md §2.4);
    these axes are a new first-class component of this framework."""

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 = use all devices on the data axis.
    data_parallel: int = -1
    model_parallel: int = 1


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    transduction: TransductionTrainConfig = field(
        default_factory=TransductionTrainConfig
    )
    recognition: RecognitionTrainConfig = field(
        default_factory=RecognitionTrainConfig
    )
    vocoder: VocoderConfig = field(default_factory=VocoderConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    seed: int = 0


# ---------------------------------------------------------------------------
# absl flag bridge — keeps the reference CLI surface
# ---------------------------------------------------------------------------

_FLAGS_REGISTERED = False


def define_flags() -> None:
    """Register the complete reference flag surface (SURVEY.md §2.2)."""
    global _FLAGS_REGISTERED
    if _FLAGS_REGISTERED:
        return
    from absl import flags

    F = flags.FLAGS

    def _i(name, default, help_):
        if name not in F:
            flags.DEFINE_integer(name, default, help_)

    def _f(name, default, help_):
        if name not in F:
            flags.DEFINE_float(name, default, help_)

    def _s(name, default, help_):
        if name not in F:
            flags.DEFINE_string(name, default, help_)

    def _l(name, default, help_):
        if name not in F:
            flags.DEFINE_list(name, default, help_)

    def _b(name, default, help_):
        if name not in F:
            flags.DEFINE_boolean(name, default, help_)

    # architecture.py:10-12
    _i("model_size", 768, "number of hidden dimensions")
    _i("num_layers", 6, "number of layers")
    _f("dropout", 0.2, "dropout")
    # transduction_model.py:22-31 / recognition_model.py:20-28
    _i("batch_size", 32, "training batch size")
    _i("epochs", 80, "number of training epochs")
    _f("learning_rate", 1e-3, "learning rate")
    _i("learning_rate_patience", 5, "learning rate decay patience")
    _i("learning_rate_warmup", 500, "steps of linear warmup")
    _s("start_training_from", None, "start training from this model")
    _f("data_size_fraction", 1.0, "fraction of training data to use")
    _f("phoneme_loss_weight", 0.5, "weight of auxiliary phoneme loss")
    _f("l2", 1e-7, "weight decay")
    _s("output_directory", "output", "output directory")
    _s("evaluate_saved", None, "run evaluation on given model file")
    _b("debug", False, "debug")
    # read_emg.py:21-25
    _l("remove_channels", [], "channels to remove")
    _l(
        "silent_data_directories",
        ["./emg_data/silent_parallel_data"],
        "silent data locations",
    )
    _l(
        "voiced_data_directories",
        ["./emg_data/voiced_parallel_data", "./emg_data/nonparallel_data"],
        "voiced data locations",
    )
    _s("testset_file", "testset_largedev.json", "file with testset indices")
    _s("text_align_directory", "text_alignments", "alignment file directory")
    # data_utils.py:15
    _s("normalizers_file", "normalizers.pkl", "pickled feature normalizers")
    # vocoder.py:14
    _s("hifigan_checkpoint", None, "hifi-gan generator checkpoint")
    # evaluate.py:19-20 / make_vocoder_trainset.py:17
    _l("models", [], "identifiers of models to evaluate")
    _b("dev", False, "evaluate dev instead of test")
    _s("model", None, "checkpoint of model to run")
    # TPU-native additions
    _i("model_parallel", 1, "size of the model (tensor-parallel) mesh axis")
    _i("chunk_bucket", 8, "pad packed batches to a multiple of this many chunks")
    _s("compute_dtype", "bfloat16", "encoder compute dtype "
                                    "(bfloat16|float32)")
    _b("resume", False, "resume training from the output_directory "
                        "checkpoint (full state incl. schedules)")
    _b("fixed_shapes", True, "pad every batch to capacity caps so training "
                             "compiles once")
    _i("max_batch_len", 0, "length-packed batch capacity in raw EMG "
                           "samples (0 = task default: 256000 transduction"
                           " / 128000 recognition)")
    _i("t_cap", 1024, "fixed-shape cap on per-utterance frames")
    _i("utt_cap", 64, "fixed-shape cap on utterances per batch")
    _i("wave_size", 16, "train steps fused per device dispatch (lax.scan "
                       "over the HBM corpus cache; also the host-path "
                       "upload wave length)")

    _FLAGS_REGISTERED = True


def config_from_flags() -> Config:
    """Build a typed Config from parsed absl FLAGS."""
    from absl import flags

    from silent_speech_tpu.utils.platform import apply_env_platform_override

    apply_env_platform_override()

    F = flags.FLAGS
    cfg = Config()
    cfg.model.model_size = F.model_size
    cfg.model.num_layers = F.num_layers
    cfg.model.dropout = F.dropout
    cfg.model.compute_dtype = F.compute_dtype
    cfg.data.remove_channels = [int(c) for c in F.remove_channels]
    cfg.data.silent_data_directories = list(F.silent_data_directories)
    cfg.data.voiced_data_directories = list(F.voiced_data_directories)
    cfg.data.testset_file = F.testset_file
    cfg.data.text_align_directory = F.text_align_directory
    cfg.data.normalizers_file = F.normalizers_file
    cfg.data.chunk_bucket = F.chunk_bucket
    cfg.data.fixed_shapes = F.fixed_shapes
    cfg.data.t_cap = F.t_cap
    cfg.data.utt_cap = F.utt_cap
    cfg.data.wave_size = F.wave_size

    t = cfg.transduction
    t.batch_size = F.batch_size
    t.epochs = F.epochs
    t.learning_rate = F.learning_rate
    t.learning_rate_patience = F.learning_rate_patience
    t.learning_rate_warmup = F.learning_rate_warmup
    t.start_training_from = F.start_training_from
    t.data_size_fraction = F.data_size_fraction
    t.phoneme_loss_weight = F.phoneme_loss_weight
    t.l2 = F.l2
    t.output_directory = F.output_directory
    if F.max_batch_len:
        t.max_batch_len = F.max_batch_len

    # recognition defaults differ from the shared flag defaults
    # (reference: lr 3e-4, warmup 1000, l2 0 — recognition_model.py:23-27);
    # only explicitly-passed flags override them
    r = cfg.recognition
    if F["epochs"].present:
        r.epochs = F.epochs
    r.batch_size = F.batch_size
    if F["learning_rate"].present:
        r.learning_rate = F.learning_rate
    if F["learning_rate_warmup"].present:
        r.learning_rate_warmup = F.learning_rate_warmup
    r.learning_rate_patience = F.learning_rate_patience
    r.start_training_from = F.start_training_from
    if F["l2"].present:
        r.l2 = F.l2
    r.output_directory = F.output_directory
    r.evaluate_saved = F.evaluate_saved
    r.debug = F.debug
    if F.max_batch_len:
        r.max_batch_len = F.max_batch_len

    cfg.vocoder.hifigan_checkpoint = F.hifigan_checkpoint
    cfg.mesh.model_parallel = F.model_parallel
    return cfg


def replace(cfg, **kwargs):
    """Dataclass-replace helper."""
    return dataclasses.replace(cfg, **kwargs)
