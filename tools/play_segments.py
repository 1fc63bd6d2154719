#!/usr/bin/env python3
"""Audition Kaldi-dir segments: print each utterance, play (or export) its
audio, optionally render waveforms.

Counterpart of reference tools/play_segments.py (interactive QA of
segments); headless-friendly: --export writes per-utterance wavs +
waveform PNGs instead of playing.

    play_segments.py <kaldi_dir> [--filter REGEX] [--export out_dir]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kaldi_dir")
    p.add_argument("--filter", default=None, help="only utterance ids matching this regex")
    p.add_argument("--export", default=None, help="write wav+png per segment here instead of playing")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    from ssak_tpu.audio import load_audio, save_audio
    from ssak_tpu.data.dataset import kaldi_folder_to_manifest
    from ssak_tpu.utils.viewer import play_audio, plot_waveform

    _meta, rows = kaldi_folder_to_manifest(args.kaldi_dir)
    rx = re.compile(args.filter) if args.filter else None
    n = 0
    for r in rows:
        if rx and not rx.search(r["id"]):
            continue
        audio = load_audio(r["audio"], start=r["start"], end=r["end"], sample_rate=16000)
        dur = len(audio) / 16000
        print(f"{r['id']}  [{dur:.2f}s]  {r['text'] or ''}")
        if args.export:
            os.makedirs(args.export, exist_ok=True)
            save_audio(os.path.join(args.export, f"{r['id']}.wav"), audio, 16000)
            plot_waveform(audio, 16000, output=os.path.join(args.export, f"{r['id']}.png"), title=r["text"])
        else:
            play_audio(audio, 16000)
        n += 1
        if args.limit and n >= args.limit:
            break


if __name__ == "__main__":
    main()
