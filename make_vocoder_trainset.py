"""CLI: generate the HiFi-GAN fine-tuning dataset from a trained model.

Reference-compatible entry point (same flags as the reference
``make_vocoder_trainset.py``): for the train and dev sets, saves DTW-aligned
*predicted* mel spectrograms as ``.npy`` (warped onto the voiced target
timeline for silent utterances) plus ground-truth 22.05 kHz wavs and
filelists — the input HiFi-GAN fine-tuning expects (predicted, not gold,
spectrograms).
"""

import os
import sys

import numpy as np


def main():
    from absl import flags

    from silent_speech_tpu.config import config_from_flags
    from silent_speech_tpu.data.dataset import EMGDataset
    from silent_speech_tpu.dsp.resample import resample_poly_audio
    from silent_speech_tpu.train.checkpoint import (
        load_reference_checkpoint, load_params_into_state,
    )
    from silent_speech_tpu.train.transduction import TransductionTrainer
    from silent_speech_tpu.utils.audio_io import read_audio, write_wav

    cfg = config_from_flags()
    out_dir = cfg.transduction.output_directory

    trainset = EMGDataset(cfg.data, dev=False, test=False)
    devset = EMGDataset(cfg.data, dev=True)

    trainer = TransductionTrainer(cfg)
    batch = trainer._pack([devset[0]])
    trainer.init_state(batch, seed=0)
    params, stats = load_reference_checkpoint(
        flags.FLAGS.model, num_layers=cfg.model.num_layers)
    trainer.state = load_params_into_state(trainer.state, params, stats)

    os.makedirs(os.path.join(out_dir, 'mels'), exist_ok=True)
    os.makedirs(os.path.join(out_dir, 'wavs'), exist_ok=True)

    for dataset, name_prefix in [(trainset, 'train'), (devset, 'dev')]:
        filelist_path = os.path.join(out_dir, f'{name_prefix}_filelist.txt')
        with open(filelist_path, 'w') as filelist:
            for i in range(len(dataset)):
                datapoint = dataset[i]
                spec = trainer.get_aligned_prediction(
                    datapoint, dataset.mfcc_norm)
                spec = np.asarray(spec).T[np.newaxis, :, :]
                np.save(os.path.join(out_dir, 'mels',
                                     f'{name_prefix}_output_{i}.npy'), spec)
                audio, r = read_audio(datapoint['audio_file'])
                if r != 22050:
                    audio = resample_poly_audio(audio, r, 22050)
                audio = np.clip(audio, -1, 1)
                write_wav(os.path.join(out_dir, 'wavs',
                                       f'{name_prefix}_output_{i}.wav'),
                          audio, 22050)
                filelist.write(f'{name_prefix}_output_{i}\n')


if __name__ == '__main__':
    from absl import flags

    from silent_speech_tpu.config import define_flags

    define_flags()
    flags.FLAGS(sys.argv)
    main()
