#!/usr/bin/env python3
"""Voice-convert a Kaldi dir to target voices (augmentation/anonymization).

Counterpart of reference ssak/utils/voice_conversion.py (_convert_voice:258:
per-segment random SVC target speaker, augmented Kaldi dir output). Instead
of downloaded so-vits-svc checkpoints, target voices are TRAINED here
(ssak_tpu.augment.vc any-to-one converter):

    # train a target-voice model from that speaker's audio
    convert_voice.py train speaker1_dir_or_wavs... -o spk1.npz

    # convert a Kaldi dir, choosing randomly among target models per segment
    convert_voice.py convert kaldi_in spk1.npz spk2.npz -ok kaldi_out
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _collect_audios(paths, sample_rate):
    from ssak_tpu.audio import load_audio

    out = []
    for p in paths:
        if os.path.isdir(p):
            for fn in sorted(os.listdir(p)):
                if fn.rsplit(".", 1)[-1].lower() in ("wav", "mp3", "flac", "ogg"):
                    out.append(load_audio(os.path.join(p, fn), sample_rate=sample_rate))
        else:
            out.append(load_audio(p, sample_rate=sample_rate))
    return out


def main(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train", help="train a target-voice model from the speaker's audio")
    pt.add_argument("audio", nargs="+", help="wav files or directories of the target speaker")
    pt.add_argument("-o", "--output", required=True, help="output model .npz")
    pt.add_argument("--steps", type=int, default=1000)
    pt.add_argument("--hidden", type=int, default=128)
    pt.add_argument("--blocks", type=int, default=4)
    pt.add_argument("--seed", type=int, default=0)

    pc = sub.add_parser("convert", help="voice-convert a Kaldi dir")
    pc.add_argument("kaldi_input", help="input Kaldi folder")
    pc.add_argument("models", nargs="+", help="target-voice model .npz files")
    pc.add_argument("-ok", "--kaldi_output", default=None, help="output Kaldi folder")
    pc.add_argument("-oa", "--audio_output", default=None, help="output wav folder")
    pc.add_argument("--seed", type=int, default=0)
    pc.add_argument("--gl_iters", type=int, default=24, help="Griffin-Lim iterations")

    args = p.parse_args(argv)
    if args.cmd == "train":
        from ssak_tpu.augment.vc import save_vc, train_voice_converter

        audios = _collect_audios(args.audio, 16000)
        params, losses = train_voice_converter(
            audios, steps=args.steps, hidden=args.hidden, blocks=args.blocks, seed=args.seed)
        save_vc(params, args.output)
        print(f"{args.output} (final L1 {losses[-1]:.4f})")
    else:
        from ssak_tpu.augment.vc import convert_kaldi_dir

        out = args.kaldi_output or (args.kaldi_input.rstrip("/") + "_augmented_vc")
        convert_kaldi_dir(
            args.kaldi_input, args.models, out, audio_out_dir=args.audio_output,
            seed=args.seed, gl_iters=args.gl_iters)
        print(out)


if __name__ == "__main__":
    main()
