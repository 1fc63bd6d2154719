#!/usr/bin/env python3
"""Corpus format converters -> Kaldi data dir.

One CLI covering the reference's per-format scripts (tools/srt2kaldi.py,
tsv2kaldi.py, transcriber2kaldi.py, textgrid2kaldi.py):

    corpus2kaldi.py srt <audio> <subtitles.srt> <out_dir>
    corpus2kaldi.py tsv <corpus.tsv> <audio_root> <out_dir> [--audio_col path --text_col sentence]
    corpus2kaldi.py trs <audio> <file.trs> <out_dir>
    corpus2kaldi.py textgrid <audio> <file.TextGrid> <out_dir>
    corpus2kaldi.py stm <file.stm> <audio_root> <out_dir>       (tools/kaldi/stm2kaldi.py)
    corpus2kaldi.py vtt <vtt_folder> <audio_folder> <out_dir>   (tools/kaldi/vtt2kaldi_masc.py)
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


def cmd_stm(args):
    """NIST STM: lines 'filename channel speaker start end <flags> text'
    (reference tools/kaldi/stm2kaldi.py). Audio '<filename>.wav' is looked
    up under audio_root (underscores in ids normalized to hyphens as the
    reference does)."""
    import re

    from ssak_tpu.data.kaldi_dataset import KaldiDataset, KaldiDatasetRow

    rx = re.compile(r"(\S+) (\S+) (\S+) (\S+) (\S+) (\S+) (.+)")
    gender_rx = re.compile(r"<\S+,\S+,(\w+)>")
    ds = KaldiDataset(name=os.path.basename(args.out_dir))
    with open(args.stm, encoding="utf-8") as f:
        for i, line in enumerate(l for l in f if l.strip() and not l.startswith(";;")):
            m = rx.match(line.strip())
            if not m:
                continue
            fname, _chan, spk, start, end, flags, text = m.groups()
            fname = fname.replace("_", "-")
            gm = gender_rx.search(flags)
            gender = {"female": "f", "male": "m"}.get(gm.group(1).lower()) if gm else None
            rid = f"{args.prefix or ''}{fname}-seg_{i:04d}"
            ds.append(
                KaldiDatasetRow(
                    id=rid, audio_id=fname,
                    audio_path=os.path.join(args.audio_root, fname + ".wav"),
                    start=float(start), end=float(end), text=text,
                    speaker=f"{args.prefix or ''}{spk}", gender=gender,
                )
            )
    ds.save(args.out_dir)
    print(f"{args.out_dir}: {len(ds)} utts")


def cmd_vtt(args):
    """Folder of WebVTT subtitle files + folder of audio with matching stems
    (reference tools/kaldi/vtt2kaldi_masc.py). Segments past the end of the
    audio are dropped."""
    from ssak_tpu.audio import get_audio_duration
    from ssak_tpu.data.kaldi_dataset import KaldiDataset, KaldiDatasetRow
    from ssak_tpu.formats import to_transcription

    exts = (".wav", ".mp3", ".ogg", ".flac")
    vtts = {}
    for fn in sorted(os.listdir(args.vtt_folder)):
        if fn.endswith(".vtt"):
            vtts[os.path.splitext(fn)[0]] = os.path.join(args.vtt_folder, fn)
    ds = KaldiDataset(name=os.path.basename(args.out_dir))
    n_files = 0
    for fn in sorted(os.listdir(args.audio_folder)):
        stem, ext = os.path.splitext(fn)
        if ext.lower() not in exts:
            continue
        vtt = vtts.get(stem) or next((p for s, p in vtts.items() if s.startswith(stem) or stem.startswith(s)), None)
        if vtt is None:
            print(f"warning: no VTT for {fn}")
            continue
        audio_path = os.path.realpath(os.path.join(args.audio_folder, fn))
        audio_dur = get_audio_duration(audio_path)
        tr = to_transcription(vtt, format="vtt")
        n_files += 1
        for n, seg in enumerate(tr["segments"]):
            text = seg["segment"].replace("‎", "").strip()
            if text and seg["end"] > seg["start"] and seg["start"] < audio_dur:
                ds.append(
                    KaldiDatasetRow(
                        id=f"{args.prefix or ''}{stem}-seg{n:04d}", audio_id=stem,
                        audio_path=audio_path, start=seg["start"], end=min(seg["end"], audio_dur),
                        text=text, speaker=f"{args.prefix or ''}{stem}-seg{n:04d}",
                    )
                )
    ds.save(args.out_dir)
    print(f"{args.out_dir}: {len(ds)} utts from {n_files} audio files")


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

    s = sub.add_parser("stm")
    s.add_argument("stm"); s.add_argument("audio_root"); s.add_argument("out_dir")
    s.add_argument("--prefix", default=None)
    s.set_defaults(fn=cmd_stm)

    s = sub.add_parser("vtt")
    s.add_argument("vtt_folder"); s.add_argument("audio_folder"); s.add_argument("out_dir")
    s.add_argument("--prefix", default=None)
    s.set_defaults(fn=cmd_vtt)

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
