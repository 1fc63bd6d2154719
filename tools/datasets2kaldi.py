#!/usr/bin/env python3
"""Dataset-specific corpus -> Kaldi importers.

One CLI covering the reference's tools/kaldi/datasets2kaldi/ scripts
(mls2kaldi.py, tedx2kaldi.py, pfc2kaldi.py, clapi2kaldi.py,
lesvocaux2kaldi.py, huggingFace_Voxpopuli_to_kaldi.py,
huggingFace_SUMM-RE_to_kaldi.py), built on the Reader2Kaldi framework:

    datasets2kaldi.py mls <input> <out> [--splits dev test train]
    datasets2kaldi.py tedx <input> <out> [--splits valid test train] [--lang fr]
    datasets2kaldi.py pfc <input> <out>
    datasets2kaldi.py clapi <input> <out>
    datasets2kaldi.py lesvocaux <input> <out>
    datasets2kaldi.py hf <dataset_dir_or_name> <out> [--wavs_dir d] [--split s]

Each command writes the raw (cased, punctuated) dir; pass --nocasepunc to
also emit a normalized copy (the reference pipes through clean_text_fr).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _save(dataset, out_dir, nocasepunc=False, language="fr"):
    dataset.save(out_dir)
    n = len(dataset)
    if nocasepunc:
        from ssak_tpu.text import format_text

        for r in dataset:
            r.text = format_text(r.text or "", language=language)
        dataset.save(out_dir.rstrip("/") + "_nocasepunc")
    print(f"{out_dir}: {n} utts")


def cmd_mls(args):
    """MLS (Multilingual LibriSpeech) layout: {split}/transcripts.txt
    (id<TAB>text, id = speaker_book_chapter), {split}/audio/**.flac,
    metainfo.txt '|'-separated with per-speaker gender."""
    from ssak_tpu.data.kaldi_converter import (
        AudioFolder2Kaldi, ColumnFile2Kaldi, Reader2Kaldi, Row2Duration, Row2Info)

    for split in args.splits:
        procs = [
            ColumnFile2Kaldi(f"{split}/transcripts.txt", ["id", "text"], sep="\t"),
            Row2Info("speaker", r"^([^_]+)"),
            AudioFolder2Kaldi(f"{split}/audio", extensions=(".flac", ".wav", ".opus")),
        ]
        if os.path.exists(os.path.join(args.input, "metainfo.txt")):
            procs.append(ColumnFile2Kaldi("metainfo.txt", ["speaker", "gender"], sep="|", skip_header=True, merge_on="speaker"))
        procs.append(Row2Duration())
        ds = Reader2Kaldi(args.input, procs).load()
        _save(ds, os.path.join(args.out, split), args.nocasepunc)


def cmd_tedx(args):
    """mTEDx layout: {split}/txt/segments (id audio_id start end),
    {split}/txt/{split}.{lang} aligned transcript lines, {split}/wav/*.flac."""
    from ssak_tpu.data.kaldi_converter import (
        AudioFolder2Kaldi, ColumnFile2Kaldi, ListFile2Kaldi, Reader2Kaldi, Row2Info)

    for split in args.splits:
        root = os.path.join(args.input, split)
        ds = Reader2Kaldi(root, [
            ColumnFile2Kaldi("txt/segments", ["id", "audio_id", "start", "end"], sep=" "),
            ListFile2Kaldi(f"txt/{split}.{args.lang}"),
            AudioFolder2Kaldi("wav", extensions=(".flac", ".wav"), merge_on="audio_id"),
            Row2Info("speaker", r"^(.+?)_\d+$"),
        ]).load()
        _save(ds, os.path.join(args.out, split), args.nocasepunc)


def cmd_pfc(args):
    """PFC: nested folders of .TextGrid (tier 0 = transcript) + .mp3 with
    matching stems."""
    from ssak_tpu.data.kaldi_converter import AudioFolder2Kaldi, Reader2Kaldi, TextGrid2Kaldi

    ds = Reader2Kaldi(args.input, [
        TextGrid2Kaldi("", tiers=(0,)),
        AudioFolder2Kaldi("", extensions=(".mp3", ".wav"), merge_on="audio_id"),
    ]).load()
    _save(ds, args.out, args.nocasepunc)


def cmd_clapi(args):
    """CLAPI: TEI-CES .xml transcripts + .mp3 recordings."""
    from ssak_tpu.data.kaldi_converter import AudioFolder2Kaldi, Reader2Kaldi, Tei2Kaldi

    ds = Reader2Kaldi(args.input, [
        Tei2Kaldi(""),
        AudioFolder2Kaldi("", extensions=(".mp3", ".wav"), merge_on="audio_id"),
    ]).load()
    _save(ds, args.out, args.nocasepunc)


def cmd_lesvocaux(args):
    """LesVocaux: txt/<id>.txt transcripts, audio/<id>.wav, speaker = id
    prefix before '_', genders in Speaker_metadata_fixed.csv."""
    from ssak_tpu.data.kaldi_converter import (
        AudioFolder2Kaldi, ColumnFile2Kaldi, Reader2Kaldi, Row2Duration, Row2Info, TextFolder2Kaldi)

    procs = [
        TextFolder2Kaldi("txt"),
        AudioFolder2Kaldi("audio", extensions=(".wav",)),
        Row2Duration(),
        Row2Info("speaker", r"^([^_]+)"),
    ]
    meta = os.path.join(args.input, "Speaker_metadata_fixed.csv")
    if os.path.exists(meta):
        procs.append(ColumnFile2Kaldi("Speaker_metadata_fixed.csv", ["speaker", "gender"], sep=",", merge_on="speaker"))
    ds = Reader2Kaldi(args.input, procs).load()
    for r in ds:  # reference lesvocaux2kaldi.py:47-49 tag fixes
        r.text = (r.text or "").replace("<nib>", "[beep]").replace("<usb>", "[beep]").replace("…", "...")
    _save(ds, args.out, args.nocasepunc)


def cmd_hf(args):
    """HuggingFace dataset -> Kaldi (reference huggingFace_Voxpopuli/SUMM-RE
    scripts). Handles both schemas: one-text-per-row (raw_text /
    normalized_text / text + speaker_id + gender) and segment-list rows
    (SUMM-RE's row["segments"]). Audio arrays are written under --wavs_dir
    unless the rows carry usable file paths."""
    from ssak_tpu.audio import save_audio
    from ssak_tpu.data.kaldi_dataset import KaldiDataset, KaldiDatasetRow

    try:
        import datasets as hf_datasets
    except ImportError:
        raise SystemExit("the 'datasets' package is required for hf import")

    if os.path.isdir(os.path.join(args.dataset, "dataset_info.json")) or os.path.exists(os.path.join(args.dataset, "dataset_dict.json")) or os.path.exists(os.path.join(args.dataset, "dataset_info.json")):
        data = hf_datasets.load_from_disk(args.dataset)
    else:
        data = hf_datasets.load_dataset(args.dataset, name=args.subset)
    if args.split:
        data = {args.split: data[args.split]} if not hasattr(data, "features") else {args.split: data}
    elif hasattr(data, "features"):  # a single Dataset
        data = {"train": data}

    wavs_dir = args.wavs_dir or os.path.join(args.out, "wavs")
    os.makedirs(wavs_dir, exist_ok=True)
    ds = KaldiDataset()
    for split_name, split in data.items():
        for i, row in enumerate(split):
            audio = row.get("audio")
            audio_id = str(row.get("audio_id") or f"{split_name}_{i:06d}").replace(":", "-")
            speaker = row.get("speaker_id")
            gender = {"male": "m", "female": "f", "m": "m", "f": "f"}.get(str(row.get("gender", "")).lower())
            if speaker in (None, "None", ""):
                speaker = f"unknown-{row.get('gender') or 'gender'}"
            path = audio.get("path") if isinstance(audio, dict) else None
            if not path or not os.path.isfile(path):
                path = os.path.join(wavs_dir, audio_id + ".wav")
                if not os.path.exists(path) and isinstance(audio, dict):
                    save_audio(path, audio["array"], audio["sampling_rate"])
            path = os.path.abspath(path)
            if row.get("segments"):
                for n, seg in enumerate(row["segments"]):
                    text = (seg.get("transcript") or seg.get("text") or "").strip()
                    if len(text) > 1:
                        ds.append(KaldiDatasetRow(
                            id=f"{audio_id}_{n:04d}", audio_id=audio_id, audio_path=path,
                            text=text, speaker=str(speaker), gender=gender,
                            start=seg["start"], end=seg["end"]))
            else:
                text = (row.get("raw_text") or row.get("text") or row.get("normalized_text") or "").strip()
                dur = None
                if isinstance(audio, dict) and audio.get("array") is not None:
                    dur = len(audio["array"]) / audio["sampling_rate"]
                if text:
                    ds.append(KaldiDatasetRow(
                        id=f"{speaker}_{audio_id}", audio_id=audio_id, audio_path=path,
                        text=text, speaker=str(speaker), gender=gender, duration=dur))
    _save(ds, args.out, args.nocasepunc)


def main(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(s):
        s.add_argument("input")
        s.add_argument("out")
        s.add_argument("--nocasepunc", action="store_true", help="also write a text-normalized copy")

    s = sub.add_parser("mls")
    common(s)
    s.add_argument("--splits", nargs="+", default=["dev", "test", "train"])
    s.set_defaults(fn=cmd_mls)

    s = sub.add_parser("tedx")
    common(s)
    s.add_argument("--splits", nargs="+", default=["valid", "test", "train"])
    s.add_argument("--lang", default="fr")
    s.set_defaults(fn=cmd_tedx)

    s = sub.add_parser("pfc")
    common(s)
    s.set_defaults(fn=cmd_pfc)

    s = sub.add_parser("clapi")
    common(s)
    s.set_defaults(fn=cmd_clapi)

    s = sub.add_parser("lesvocaux")
    common(s)
    s.set_defaults(fn=cmd_lesvocaux)

    s = sub.add_parser("hf")
    s.add_argument("dataset", help="local load_from_disk dir or hub name")
    s.add_argument("out")
    s.add_argument("--wavs_dir", default=None)
    s.add_argument("--split", default=None)
    s.add_argument("--subset", default=None)
    s.add_argument("--nocasepunc", action="store_true")
    s.set_defaults(fn=cmd_hf)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
