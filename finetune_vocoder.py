"""CLI: fine-tune the HiFi-GAN vocoder on TPU.

Completes the reference workflow's external step (``README.md:67-75``: 75k
fine-tuning steps from the UNIVERSAL_V1 checkpoint on the output of
``make_vocoder_trainset``) inside this framework:

    python make_vocoder_trainset.py --model run/model.pt --output_directory voc_data
    python finetune_vocoder.py --data_directory voc_data \
        --hifigan_checkpoint g_02500000 --steps 75000 --output_directory voc_out
"""

import os
import sys


def main():
    from absl import flags

    from silent_speech_tpu.config import define_flags
    from silent_speech_tpu.utils.platform import apply_env_platform_override
    from silent_speech_tpu.models.hifigan import HiFiGANConfig
    from silent_speech_tpu.train.vocoder import (
        VocoderDataSource, VocoderTrainer,
    )
    from silent_speech_tpu.utils.run_logging import (
        setup_run_logging, log_run_provenance,
    )

    define_flags()
    if "data_directory" not in flags.FLAGS:
        flags.DEFINE_string("data_directory", None,
                            "make_vocoder_trainset output directory")
        flags.DEFINE_integer("steps", 75000, "fine-tuning steps")
        flags.DEFINE_integer("vocoder_batch_size", 16, "segment batch size")
        flags.DEFINE_string("filelist_prefix", "train",
                            "which filelist to train on")
        flags.DEFINE_integer("vocoder_segment_frames", 32,
                             "mel frames per training segment")
        flags.DEFINE_list("vocoder_disc_periods", ["2", "3", "5", "7", "11"],
                          "MPD discriminator periods")
        flags.DEFINE_integer("vocoder_checkpoint_every", 1000,
                             "save the full GAN state every N steps")
    flags.FLAGS(sys.argv)
    F = flags.FLAGS
    apply_env_platform_override()

    out_dir = F.output_directory
    setup_run_logging(out_dir)
    log_run_provenance()

    gen_cfg = HiFiGANConfig()
    if F.hifigan_checkpoint:
        cfg_json = os.path.join(os.path.dirname(F.hifigan_checkpoint),
                                "config.json")
        if os.path.exists(cfg_json):
            gen_cfg = HiFiGANConfig.from_json(cfg_json)

    trainer = VocoderTrainer(
        gen_cfg=gen_cfg,
        disc_periods=tuple(int(p) for p in F.vocoder_disc_periods))
    if F.hifigan_checkpoint:
        trainer.load_generator(F.hifigan_checkpoint)

    # --resume (the shared trainer flag): continue from the full GAN
    # state in output_directory — lr decay and step numbering stay
    # continuous, so the reference's 75k-step budget splits across
    # bounded sessions
    start_step = 0
    if F.resume and trainer.state_exists(out_dir):
        start_step = trainer.load_state(out_dir)
        import logging
        logging.info("resumed vocoder state at step %d", start_step)

    source = VocoderDataSource(F.data_directory,
                               prefix=F.filelist_prefix)
    final = trainer.train(source, steps=F.steps,
                          batch_size=F.vocoder_batch_size,
                          segment_frames=F.vocoder_segment_frames,
                          start_step=start_step,
                          checkpoint_every=F.vocoder_checkpoint_every,
                          checkpoint_dir=out_dir)
    trainer.export_torch(os.path.join(out_dir, "generator_finetuned.pt"))

    import logging
    logging.info("finetune done: %d new steps (at %d total), final "
                 "metrics %s", F.steps, start_step + F.steps,
                 {k: round(v, 4) for k, v in final.items()})


if __name__ == "__main__":
    main()
