"""CLI: test-set synthesis evaluation with model ensembling.

Reference-compatible entry point (same flags as the reference
``evaluate.py``): loads N transduction checkpoints (``--models a.pt b.pt``,
reference format or our orbax directories), averages their outputs, reports
loss/phoneme confusion, vocodes every test utterance to
``example_output_{i}.wav``, and runs the ASR WER judge.
"""

import logging
import os
import sys


def _load_state(trainer, path):
    """(params, batch_stats) from a reference ``model.pt`` or an orbax run
    directory, loaded through ONE shared trainer (no per-checkpoint model
    objects or extra jit traces)."""
    from silent_speech_tpu.train.checkpoint import load_any_checkpoint

    return load_any_checkpoint(trainer.state, path,
                               num_layers=trainer.cfg.model.num_layers)


def main():
    from absl import flags

    from silent_speech_tpu.config import config_from_flags
    from silent_speech_tpu.data.dataset import EMGDataset
    from silent_speech_tpu.eval.synthesis import EnsemblePredictor
    from silent_speech_tpu.phonemes import print_confusion
    from silent_speech_tpu.utils.run_logging import setup_run_logging

    cfg = config_from_flags()
    out_dir = cfg.transduction.output_directory
    setup_run_logging(out_dir, filename='eval_log.txt')

    dev = flags.FLAGS.dev
    testset = EMGDataset(cfg.data, dev=dev, test=not dev)

    # one trainer, one init; N checkpoints load into stacked param sets
    from silent_speech_tpu.train.transduction import TransductionTrainer

    trainer = TransductionTrainer(cfg)
    trainer.init_state(trainer._pack([testset[0]]), seed=0)
    states = [_load_state(trainer, f) for f in flags.FLAGS.models]
    assert states, 'pass at least one --models checkpoint'

    ensemble = EnsemblePredictor(base=trainer, states=states)
    loss, acc, confusion = ensemble.evaluate(testset)
    logging.info('loss: %.4f phoneme accuracy: %.2f', loss, acc * 100)
    print_confusion(confusion)

    if cfg.vocoder.hifigan_checkpoint is None:
        logging.warning(
            'no --hifigan_checkpoint: skipping wav synthesis and the ASR '
            'WER judge (reference evaluate.py:59-64 requires a vocoder)')
        return

    from silent_speech_tpu.models.hifigan import Vocoder
    from silent_speech_tpu.utils.audio_io import write_wav

    vocoder = Vocoder(cfg.vocoder.hifigan_checkpoint)
    for i in range(len(testset)):
        datapoint = testset[i]
        mel = testset.mfcc_norm.inverse(ensemble.predict(datapoint))
        audio = vocoder(mel)
        write_wav(os.path.join(out_dir, f'example_output_{i}.wav'),
                  audio, 22050)

    from silent_speech_tpu.eval.asr import evaluate

    try:
        evaluate(testset, out_dir)
    except ImportError as e:
        # wavs are already on disk; the pinned judge just isn't installed
        logging.warning(
            'ASR WER skipped (%s) — install deepspeech==0.7.0 with its '
            'pbmm+scorer models for published-comparable WER, or run '
            'eval.asr.evaluate with TransformersASR on %s', e, out_dir)


if __name__ == '__main__':
    from absl import flags

    from silent_speech_tpu.config import define_flags

    define_flags()
    flags.FLAGS(sys.argv)
    main()
