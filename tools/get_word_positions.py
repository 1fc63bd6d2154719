#!/usr/bin/env python3
"""Word timestamps for every utterance of a Kaldi folder (CTC alignment).

Counterpart of reference tools/get_word_positions.py: prints
'<utt-id> <word> <start> <end> <score>' lines.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kaldi_dir")
    p.add_argument("--model", default=None)
    p.add_argument("--language", default="fr")
    p.add_argument("--output", default=None)
    p.add_argument("--seeded_test_config", default=None, help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    from ssak_tpu.align.forced import align_audio_to_transcript
    from ssak_tpu.audio import load_audio
    from ssak_tpu.data.dataset import kaldi_folder_to_manifest
    from ssak_tpu.infer.general import load_model
    from ssak_tpu.text import format_text

    model = load_model(args.model, seeded_test_config=args.seeded_test_config)
    _meta, rows = kaldi_folder_to_manifest(args.kaldi_dir)
    out = open(args.output, "w", encoding="utf-8") if args.output else sys.stdout
    try:
        for row in rows:
            if not row["text"]:
                continue
            audio = load_audio(row["audio"], start=row["start"], end=row["end"], sample_rate=model.sample_rate)
            transcript = format_text(row["text"], args.language, extract_parenthesized=False, safety_checks=False).replace("\n", " ")
            for w in align_audio_to_transcript(model, audio, transcript, model.sample_rate):
                out.write(f"{row['id']} {w.label} {w.start:.3f} {w.end:.3f} {w.score:.3f}\n")
    finally:
        if args.output:
            out.close()


if __name__ == "__main__":
    main()
