"""Evaluation harnesses: CTC decoding, synthesis output, ASR WER."""
