"""CLI: train / evaluate the EMG→text CTC recognition model (TPU).

Reference-compatible entry point (same flags as the reference
``recognition_model.py``): CTC training with grad accumulation ×2, MultiStep
LR, per-epoch beam-decode WER validation; ``--evaluate_saved`` runs test-set
WER for a saved ``model.pt``.
"""

import logging
import sys


def _trainer(cfg):
    from silent_speech_tpu.train.recognition import RecognitionTrainer

    return RecognitionTrainer(cfg)


def evaluate_saved():
    import os

    from silent_speech_tpu.config import config_from_flags
    from silent_speech_tpu.data.dataset import EMGDataset
    from silent_speech_tpu.train.checkpoint import (
        checkpoint_exists, load_reference_checkpoint,
        load_params_into_state, restore_checkpoint,
    )

    cfg = config_from_flags()
    testset = EMGDataset(cfg.data, test=True)
    trainer = _trainer(cfg)
    batch = trainer._pack([testset[0]])
    trainer.init_state(batch, seed=0)
    path = cfg.recognition.evaluate_saved
    if os.path.isdir(path) and checkpoint_exists(path):
        trainer.state = restore_checkpoint(path, trainer.state)
    else:
        params, stats = load_reference_checkpoint(
            path, num_layers=cfg.model.num_layers)
        trainer.state = load_params_into_state(trainer.state, params,
                                               stats)
    print('WER:', trainer.evaluate_wer(testset))


def main():
    from absl import flags

    from silent_speech_tpu.config import config_from_flags
    from silent_speech_tpu.data.dataset import EMGDataset
    from silent_speech_tpu.utils.run_logging import (
        setup_run_logging, log_run_provenance, log_device_info,
    )

    cfg = config_from_flags()
    if cfg.recognition.debug:
        # reference --debug forces CPU (recognition_model.py:120,144)
        import jax

        jax.config.update("jax_platforms", "cpu")
    setup_run_logging(cfg.recognition.output_directory)
    log_run_provenance()

    trainset = EMGDataset(cfg.data, dev=False, test=False)
    devset = EMGDataset(cfg.data, dev=True)
    logging.info('output example: %s', devset.example_indices[0])
    logging.info('train / dev split: %d %d', len(trainset), len(devset))

    trainer = _trainer(cfg)
    log_device_info(trainer.mesh)
    trainer.fit(trainset, devset, seed=0, resume=flags.FLAGS.resume)


if __name__ == '__main__':
    from absl import flags

    from silent_speech_tpu.config import define_flags

    define_flags()
    flags.FLAGS(sys.argv)
    if flags.FLAGS.evaluate_saved is not None:
        evaluate_saved()
    else:
        main()
