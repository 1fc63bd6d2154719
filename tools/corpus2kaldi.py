#!/usr/bin/env python3
"""Corpus format converters -> Kaldi data dir.

One CLI covering the reference's per-format scripts (tools/srt2kaldi.py,
tsv2kaldi.py, transcriber2kaldi.py, textgrid2kaldi.py):

    corpus2kaldi.py srt <audio> <subtitles.srt> <out_dir>
    corpus2kaldi.py tsv <corpus.tsv> <audio_root> <out_dir> [--audio_col path --text_col sentence]
    corpus2kaldi.py trs <audio> <file.trs> <out_dir>
    corpus2kaldi.py textgrid <audio> <file.TextGrid> <out_dir>
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _segments_to_dataset(audio_path, segments, base_id=None, speaker=None):
    from ssak_tpu.data.kaldi_dataset import KaldiDataset, KaldiDatasetRow

    base = base_id or os.path.splitext(os.path.basename(audio_path))[0]
    ds = KaldiDataset(name=base)
    for i, seg in enumerate(segments):
        ds.append(
            KaldiDatasetRow(
                id=f"{base}_seg{i:04d}",
                audio_id=base,
                audio_path=audio_path,
                start=seg["start"],
                end=seg["end"],
                text=seg["text"],
                speaker=seg.get("speaker") or speaker or base,
                gender=seg.get("gender"),
            )
        )
    return ds


def cmd_srt(args):
    from ssak_tpu.formats import to_transcription

    tr = to_transcription(args.subtitles, format="srt")
    segments = [{"start": s["start"], "end": s["end"], "text": s["segment"]} for s in tr["segments"]]
    _segments_to_dataset(args.audio, segments).save(args.out_dir)
    print(f"{args.out_dir}: {len(segments)} segments")


def cmd_textgrid(args):
    from ssak_tpu.formats import to_transcription

    tr = to_transcription(args.textgrid, format="textgrid")
    segments = [{"start": s["start"], "end": s["end"], "text": s["segment"]} for s in tr["segments"]]
    _segments_to_dataset(args.audio, segments).save(args.out_dir)
    print(f"{args.out_dir}: {len(segments)} segments")


def cmd_trs(args):
    from ssak_tpu.formats.transcriber import read_transcriber

    segments = read_transcriber(args.trs, anonymize_speakers=args.anonymize)
    _segments_to_dataset(args.audio, segments).save(args.out_dir)
    print(f"{args.out_dir}: {len(segments)} segments")


def cmd_tsv(args):
    """Common-Voice-style TSV: one audio file + transcript per row."""
    from ssak_tpu.data.kaldi_dataset import KaldiDataset, KaldiDatasetRow

    ds = KaldiDataset(name=os.path.basename(args.out_dir))
    with open(args.tsv, encoding="utf-8") as f:
        reader = csv.DictReader(f, delimiter="\t")
        for i, row in enumerate(reader):
            audio = os.path.join(args.audio_root, row[args.audio_col])
            rid = os.path.splitext(os.path.basename(row[args.audio_col]))[0]
            ds.append(
                KaldiDatasetRow(
                    id=rid, audio_path=audio, text=row[args.text_col],
                    speaker=row.get(args.speaker_col) or rid,
                    gender={"male": "m", "female": "f", "m": "m", "f": "f"}.get((row.get("gender") or "").lower()),
                )
            )
    ds.save(args.out_dir)
    print(f"{args.out_dir}: {len(ds)} utts")


def main(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("srt")
    s.add_argument("audio"); s.add_argument("subtitles"); s.add_argument("out_dir")
    s.set_defaults(fn=cmd_srt)

    s = sub.add_parser("textgrid")
    s.add_argument("audio"); s.add_argument("textgrid"); s.add_argument("out_dir")
    s.set_defaults(fn=cmd_textgrid)

    s = sub.add_parser("trs")
    s.add_argument("audio"); s.add_argument("trs"); s.add_argument("out_dir")
    s.add_argument("--anonymize", action="store_true")
    s.set_defaults(fn=cmd_trs)

    s = sub.add_parser("tsv")
    s.add_argument("tsv"); s.add_argument("audio_root"); s.add_argument("out_dir")
    s.add_argument("--audio_col", default="path")
    s.add_argument("--text_col", default="sentence")
    s.add_argument("--speaker_col", default="client_id")
    s.set_defaults(fn=cmd_tsv)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
