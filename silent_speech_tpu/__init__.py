"""silent_speech_tpu — a TPU-native framework for voicing silent speech from EMG.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of dgaddy/silent_speech
(see /root/reference and SURVEY.md): EMG signal cleaning + featurization, a
conv + relative-position transformer encoder trained with an on-device
DTW-aligned spectrogram loss, a CTC recognition head with beam decoding,
HiFi-GAN vocoding, and WER evaluation harnesses — designed TPU-first:

- all hot-path compute (model, DTW loss, CTC) runs under ``jax.jit`` with
  static shapes; utterances are packed into fixed-length chunks with segment
  masking (reference: ``data_utils.py:158-178``),
- the DTW alignment (reference: ``align.py``, a host-side numba kernel called
  once per silent utterance per step, forcing a device→host sync at
  ``transduction_model.py:126``) runs on-device as an anti-diagonal wavefront
  ``lax.scan`` / Pallas kernel, vmapped over the batch,
- scaling is expressed via a ``jax.sharding.Mesh`` with data and model axes;
  XLA inserts the collectives (no hand-written communication backend).
"""

__version__ = "0.1.0"
