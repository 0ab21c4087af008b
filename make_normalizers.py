"""CLI: build ``normalizers.pkl`` from the configured dataset.

Reference parity: ``read_emg.py:298-309`` (``make_normalizers``) — mfcc
stats over the first ~51 examples with one shared scalar std, per-dim EMG
stats, pickled as ``(mfcc_norm, emg_norm)``. Run once per corpus before
training so the CLIs work without reaching into the reference checkout:

    python make_normalizers.py --silent_data_directories ... \
        --voiced_data_directories ... --testset_file ... \
        --normalizers_file normalizers.pkl
"""

import sys


def main():
    from silent_speech_tpu.config import config_from_flags
    from silent_speech_tpu.data.dataset import EMGDataset
    from silent_speech_tpu.data.normalizers import (
        make_normalizers, save_normalizers)

    cfg = config_from_flags()
    dataset = EMGDataset(cfg.data, no_normalizers=True)
    mfcc_norm, emg_norm = make_normalizers(dataset)
    save_normalizers(cfg.data.normalizers_file, mfcc_norm, emg_norm)
    print(f"wrote {cfg.data.normalizers_file}: "
          f"mfcc means {mfcc_norm.feature_means.shape} shared std, "
          f"emg means {emg_norm.feature_means.shape} per-dim std")


if __name__ == "__main__":
    from absl import flags

    from silent_speech_tpu.config import define_flags

    define_flags()
    flags.FLAGS(sys.argv)
    main()
