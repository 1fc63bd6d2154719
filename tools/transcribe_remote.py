#!/usr/bin/env python3
"""Transcribe audio with a remote LinTO-compatible server.

Counterpart of reference tools/linstt_request.py (batch HTTP job API) and
tools/linstt_streaming.py (websocket streaming), on ssak_tpu.remote:

    transcribe_remote.py request <audio...> --server URL [--output_dir d]
        [--num_speakers N --disable_punctuation --convert_numbers]
        [--output_format json|text|srt|vtt]
    transcribe_remote.py stream --server ws://... --audio_file f.wav
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def cmd_request(args):
    from ssak_tpu.formats import to_transcription
    from ssak_tpu.formats.transcription import transcription_to
    from ssak_tpu.remote import build_transcription_config, remote_transcribe

    cfg = build_transcription_config(
        language=args.language or "fr",
        diarization=args.num_speakers is not None,
        n_speakers=args.num_speakers,
        punctuation=not args.disable_punctuation,
    )
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
    for audio in args.audio_files:
        print(f"Processing {audio}", file=sys.stderr)
        result = remote_transcribe(args.server, audio, transcription_config=cfg, verbose=args.verbose)
        if args.output_format == "json":
            rendered = json.dumps(result, indent=2, ensure_ascii=False)
        else:
            rendered = transcription_to(to_transcription(result), args.output_format)
        if args.output_dir:
            ext = {"json": ".json", "text": ".txt", "srt": ".srt", "vtt": ".vtt"}[args.output_format]
            out = os.path.join(args.output_dir, os.path.basename(audio) + ".remote" + ext)
            with open(out, "w", encoding="utf-8") as f:
                f.write(rendered + "\n")
            print(out)
        else:
            print(rendered)


def cmd_stream(args):
    import asyncio

    from ssak_tpu.audio import load_audio
    from ssak_tpu.remote import remote_streaming

    audio = load_audio(args.audio_file, sample_rate=16000)

    def on_partial(text):
        if args.verbose:
            print(f"... {text}", file=sys.stderr)

    final = asyncio.run(remote_streaming(args.server, audio, on_partial=on_partial))
    print(final)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("request")
    s.add_argument("audio_files", nargs="+")
    s.add_argument("--server", required=True)
    s.add_argument("--language", default=None)
    s.add_argument("--num_speakers", type=int, default=None)
    s.add_argument("--disable_punctuation", action="store_true")
    s.add_argument("--output_dir", default=None)
    s.add_argument("--output_format", choices=["json", "text", "srt", "vtt"], default="json")
    s.add_argument("--verbose", action="store_true")
    s.set_defaults(fn=cmd_request)

    s = sub.add_parser("stream")
    s.add_argument("--server", required=True)
    s.add_argument("--audio_file", required=True)
    s.add_argument("--verbose", action="store_true")
    s.set_defaults(fn=cmd_stream)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
