#!/usr/bin/env python3
"""YouTube corpus harvesting pipeline.

Counterpart of reference tools/scraping/{scrape_youtube.py,
scrape_youtube_get_metadata.py,scrape_youtube_download_audio.py,
scrape_youtube_to_kaldi.py} without selenium/pytube: static-page scraping
with urllib (ssak_tpu.utils.scraping). Network steps accept local files so
the parsing path works offline and cached pages can be reprocessed.

    scrape_youtube.py ids <url-or-html-file...> --out ids.txt
    scrape_youtube.py metadata <watchpage-url-or-html...> --out meta.csv
    scrape_youtube.py captions <watchpage-url-or-html...> --out_dir transcripts/ --language fr
    scrape_youtube.py tokaldi <audio_folder> <transcripts_folder> <out_dir> [--extension mp3]

The scraped-transcript interchange format is the reference's per-video CSV
'text;start;duration' with a header line (scrape_youtube_to_kaldi.py:66).
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _page(src: str) -> str:
    from ssak_tpu.utils.scraping import fetch_page

    if os.path.isfile(src):
        with open(src, encoding="utf-8", errors="replace") as f:
            return f.read()
    return fetch_page(src)


def cmd_ids(args):
    from ssak_tpu.utils.scraping import extract_video_ids

    seen, ids = set(), []
    for src in args.sources:
        for vid in extract_video_ids(_page(src)):
            if vid not in seen:
                seen.add(vid)
                ids.append(vid)
    out = open(args.out, "w") if args.out else sys.stdout
    for vid in ids:
        print(vid, file=out)
    if args.out:
        out.close()
        print(f"{args.out}: {len(ids)} video ids")


def cmd_metadata(args):
    from ssak_tpu.utils.scraping import extract_player_response, video_metadata

    rows = []
    for src in args.sources:
        meta = video_metadata(extract_player_response(_page(src)))
        if meta.get("video_id"):
            rows.append(meta)
        else:
            print(f"warning: no player response in {src}", file=sys.stderr)
    with open(args.out, "w", encoding="utf-8", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video_id", "title", "author", "duration_seconds", "caption_languages", "has_manual_captions"])
        for m in rows:
            langs = ",".join(t["language_code"] or "" for t in m["caption_tracks"])
            manual = any(not t["is_automatic"] for t in m["caption_tracks"])
            w.writerow([m["video_id"], m["title"], m["author"], m["duration_seconds"], langs, manual])
    print(f"{args.out}: {len(rows)} videos")


def cmd_captions(args):
    """Pick the requested-language caption track of each watch page and save
    its transcript as <video_id>.csv. Accepts local caption payload files
    named <video_id>.xml/.json too (offline reprocessing)."""
    from ssak_tpu.utils.scraping import (
        extract_player_response, fetch_page, parse_timedtext, video_metadata, write_transcript_csv)

    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for src in args.sources:
        if os.path.isfile(src) and src.endswith((".xml", ".json", ".json3")):
            vid = os.path.splitext(os.path.basename(src))[0]
            segments = parse_timedtext(_page(src))
        else:
            meta = video_metadata(extract_player_response(_page(src)))
            vid = meta.get("video_id")
            if not vid:
                print(f"warning: no metadata in {src}", file=sys.stderr)
                continue
            tracks = [t for t in meta["caption_tracks"] if (t["language_code"] or "").split("-")[0] == args.language]
            if not tracks:
                print(f"warning: no {args.language} captions for {vid}", file=sys.stderr)
                continue
            manual = [t for t in tracks if not t["is_automatic"]]
            if not manual and not args.allow_automatic:
                print(f"warning: only automatic captions for {vid} (pass --allow_automatic)", file=sys.stderr)
                continue
            track = (manual or tracks)[0]
            segments = parse_timedtext(fetch_page(track["url"]))
        if segments:
            write_transcript_csv(segments, os.path.join(args.out_dir, vid + ".csv"))
            n += 1
    print(f"{args.out_dir}: {n} transcripts")


def cmd_tokaldi(args):
    """Scraped audio + transcript CSVs -> Kaldi dir
    (reference scrape_youtube_to_kaldi.py generate_kaldi_data:13)."""
    from ssak_tpu.audio import get_audio_duration
    from ssak_tpu.data.kaldi_dataset import KaldiDataset, KaldiDatasetRow
    from ssak_tpu.text.basic import format_special_characters
    from ssak_tpu.utils.scraping import read_transcript_csv

    prefix = (args.utt_prefix + "_") if args.utt_prefix else ""
    ds = KaldiDataset(name=os.path.basename(args.out_dir))
    n_audio = 0
    for fn in sorted(os.listdir(args.transcripts)):
        if not fn.endswith(".csv"):
            continue
        stem = os.path.splitext(fn)[0]
        audio_name = stem + (args.audio_suffix or "")
        audio_path = os.path.realpath(os.path.join(args.audios, f"{audio_name}.{args.extension}"))
        if not os.path.isfile(audio_path):
            print(f"warning: missing audio {audio_path}", file=sys.stderr)
            continue
        audio_duration = get_audio_duration(audio_path)
        n_audio += 1
        for i, (text, start, dur) in enumerate(read_transcript_csv(os.path.join(args.transcripts, fn))):
            text = format_special_characters(text)
            start, end = round(start, 3), round(start + dur, 3)
            if not text or end <= start or start >= audio_duration:
                continue
            rid = f"{prefix}{audio_name}-seg_{i:05d}"
            ds.append(KaldiDatasetRow(
                id=rid, audio_id=audio_name, audio_path=audio_path,
                start=start, end=min(end, audio_duration), text=text, speaker=rid))
    ds.save(args.out_dir)
    print(f"{args.out_dir}: {len(ds)} utts from {n_audio} videos")


def main(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("ids")
    s.add_argument("sources", nargs="+")
    s.add_argument("--out", default=None)
    s.set_defaults(fn=cmd_ids)

    s = sub.add_parser("metadata")
    s.add_argument("sources", nargs="+")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_metadata)

    s = sub.add_parser("captions")
    s.add_argument("sources", nargs="+")
    s.add_argument("--out_dir", required=True)
    s.add_argument("--language", default="fr")
    s.add_argument("--allow_automatic", action="store_true")
    s.set_defaults(fn=cmd_captions)

    s = sub.add_parser("tokaldi")
    s.add_argument("audios")
    s.add_argument("transcripts")
    s.add_argument("out_dir")
    s.add_argument("--extension", default="mp3")
    s.add_argument("--audio_suffix", default=None)
    s.add_argument("--utt_prefix", default="youtube")
    s.set_defaults(fn=cmd_tokaldi)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
