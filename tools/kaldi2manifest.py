#!/usr/bin/env python3
"""Kaldi dir -> JSONL manifest / tarred dataset.

Covers the reference's NeMo data pipeline
(tools/nemo/convert_kaldi_dataset_to_nemo.py, merge_manifest.py,
convert_to_tarred_audio_dataset.py):

    kaldi2manifest.py manifest <kaldi_dir> <out.jsonl> [--language fr]
    kaldi2manifest.py merge <out.jsonl> <in1.jsonl> <in2.jsonl> ...
    kaldi2manifest.py tar <kaldi_dir_or_list> <out_dir> [--shard_size 512]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def cmd_manifest(args):
    from ssak_tpu.data.dataset import kaldi_folder_to_manifest

    _meta, rows = kaldi_folder_to_manifest(args.kaldi_dir)
    norm = None
    if args.language:
        from ssak_tpu.text import format_text

        def norm(t):
            return format_text(t, args.language, extract_parenthesized=False, safety_checks=False).replace("\n", " ")

    with open(args.out, "w", encoding="utf-8") as f:
        for r in rows:
            text = r["text"] or ""
            entry = {
                "audio_filepath": r["audio"],
                "offset": r["start"],
                "duration": r["duration"],
                "text": norm(text) if norm else text,
                "utt_id": r["id"],
                "speaker": r["speaker"],
            }
            f.write(json.dumps(entry, ensure_ascii=False) + "\n")
    print(f"{args.out}: {len(rows)} entries")


def cmd_merge(args):
    n = 0
    with open(args.out, "w", encoding="utf-8") as fo:
        for path in args.inputs:
            with open(path, encoding="utf-8") as fi:
                for line in fi:
                    if line.strip():
                        fo.write(line if line.endswith("\n") else line + "\n")
                        n += 1
    print(f"{args.out}: {n} entries")


def cmd_tar(args):
    from ssak_tpu.data.dataset import kaldi_folder_to_manifest
    from ssak_tpu.data.tarred import create_tarred_dataset

    _meta, rows = kaldi_folder_to_manifest(args.source)
    meta = create_tarred_dataset(rows, args.out_dir, shard_size=args.shard_size)
    print(json.dumps(meta))


def main(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("manifest")
    s.add_argument("kaldi_dir"); s.add_argument("out")
    s.add_argument("--language", default=None)
    s.set_defaults(fn=cmd_manifest)

    s = sub.add_parser("merge")
    s.add_argument("out"); s.add_argument("inputs", nargs="+")
    s.set_defaults(fn=cmd_merge)

    s = sub.add_parser("tar")
    s.add_argument("source"); s.add_argument("out_dir")
    s.add_argument("--shard_size", type=int, default=512)
    s.set_defaults(fn=cmd_tar)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
