"""CLI: train the EMG→mel transduction model (TPU).

Reference-compatible entry point (same flags/outputs as the reference
``transduction_model.py``): trains with warmup+plateau AdamW, validates per
epoch, writes ``model.pt`` + full checkpoints + ``log.txt`` into
``--output_directory``, optionally vocodes per-epoch samples and runs the
final dev-set synthesis + ASR WER when ``--hifigan_checkpoint`` is given.
"""

import logging
import os
import sys


def main():
    from silent_speech_tpu.config import config_from_flags
    from silent_speech_tpu.data.dataset import EMGDataset
    from silent_speech_tpu.train.transduction import TransductionTrainer
    from silent_speech_tpu.utils.run_logging import (
        setup_run_logging, log_run_provenance, log_device_info,
    )

    cfg = config_from_flags()
    out_dir = cfg.transduction.output_directory
    setup_run_logging(out_dir)
    log_run_provenance()

    trainset = EMGDataset(cfg.data, dev=False, test=False)
    devset = EMGDataset(cfg.data, dev=True)
    logging.info('output example: %s', devset.example_indices[0])
    logging.info('train / dev split: %d %d', len(trainset), len(devset))

    trainer = TransductionTrainer(cfg)
    log_device_info(trainer.mesh)

    vocoder = None
    save_sound = cfg.vocoder.hifigan_checkpoint is not None
    if save_sound:
        from silent_speech_tpu.models.hifigan import Vocoder

        vocoder = Vocoder(cfg.vocoder.hifigan_checkpoint)

    from absl import flags

    trainer.fit(trainset, devset, vocoder=vocoder,
                save_sound_outputs=save_sound, seed=0,
                resume=flags.FLAGS.resume)

    if save_sound:
        from silent_speech_tpu.eval.asr import evaluate
        from silent_speech_tpu.eval.synthesis import dump_all_outputs

        dump_all_outputs(trainer, devset, out_dir, devset.mfcc_norm,
                         vocoder)
        evaluate(devset, out_dir)


if __name__ == '__main__':
    from absl import flags

    from silent_speech_tpu.config import define_flags

    define_flags()
    flags.FLAGS(sys.argv)
    main()
