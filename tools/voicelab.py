#!/usr/bin/env python3
"""LeVoiceLab speech-data-hub exchange: export / import / augment.

Counterpart of reference tools/LeVoiceLab/{kaldi_to_voicelab.py,
voicelab_to_kaldi.py,augment_database.py}:

    voicelab.py export <kaldi_dir> <db_dir> [--name X --license L --languages fr en]
    voicelab.py import <db_dir> <kaldi_dir> [--annotdir d --normalize --name_genders csv]
    voicelab.py augment <db_dir> <out_db_dir> [--noise_dir d --rir_dir d --seed 0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def cmd_export(args):
    from ssak_tpu.formats.voicelab import kaldi_to_voicelab

    out = kaldi_to_voicelab(
        args.kaldi_dir, args.db_dir, name=args.name, license=args.license,
        languages=args.languages, is_private=not args.public,
        ignore_speakers=args.ignore_speakers,
    )
    print(out)


def cmd_import(args):
    from ssak_tpu.formats.voicelab import voicelab_to_kaldi

    name_genders = None
    if args.name_genders:
        name_genders = {}
        with open(args.name_genders, encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split(",")
                if len(parts) >= 2:
                    name_genders[parts[0].lower()] = parts[1].strip().lower()
    out = voicelab_to_kaldi(args.db_dir, args.kaldi_dir, annotdir=args.annotdir,
                            normalize=args.normalize, name_genders=name_genders)
    print(out)


def cmd_augment(args):
    from ssak_tpu.formats.voicelab import augment_database

    out = augment_database(args.db_dir, args.out_db_dir, noise_dir=args.noise_dir,
                           rir_dir=args.rir_dir, seed=args.seed)
    print(out)


def main(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("export")
    s.add_argument("kaldi_dir"); s.add_argument("db_dir")
    s.add_argument("--name", default=None)
    s.add_argument("--license", default="CC-BY-NC-SA 4.0")
    s.add_argument("--languages", nargs="+", default=["fr"])
    s.add_argument("--public", action="store_true")
    s.add_argument("--ignore_speakers", action="store_true")
    s.set_defaults(fn=cmd_export)

    s = sub.add_parser("import")
    s.add_argument("db_dir"); s.add_argument("kaldi_dir")
    s.add_argument("--annotdir", default=None)
    s.add_argument("--normalize", action="store_true")
    s.add_argument("--name_genders", default=None, help="csv: first_name,m|f")
    s.set_defaults(fn=cmd_import)

    s = sub.add_parser("augment")
    s.add_argument("db_dir"); s.add_argument("out_db_dir")
    s.add_argument("--noise_dir", default=None)
    s.add_argument("--rir_dir", default=None)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_augment)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
