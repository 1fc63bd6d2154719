#!/usr/bin/env python3
"""Kaldi data-dir manipulation: stats, split, subsample, validate/fix.

One CLI covering the reference's tools/kaldi/kaldi_stats.py,
kaldi_split.py, kaldi_subsample.py and the fix/validate shell pipeline:

    kaldi_tools.py stats <dir> [...]
    kaldi_tools.py split <dir> <out_prefix> --ratios 0.8 0.1 0.1 [--by_utterance]
    kaldi_tools.py subsample <dir> <out> --n 100 [--mode head|random|spread]
    kaldi_tools.py fix <dir>
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def cmd_stats(args):
    from ssak_tpu.data.kaldi_dataset import KaldiDataset

    for d in args.dirs:
        ds = KaldiDataset.load(d)
        durs = [r.duration or 0.0 for r in ds]
        genders = {}
        for r in ds:
            if r.gender:
                genders[r.gender] = genders.get(r.gender, 0) + 1
        stats = {
            "dir": d,
            "utterances": len(ds),
            "speakers": len(ds.speakers()),
            "total_hours": round(ds.total_duration() / 3600, 4),
            "min_duration": round(min(durs), 3) if durs else 0,
            "max_duration": round(max(durs), 3) if durs else 0,
            "mean_duration": round(sum(durs) / len(durs), 3) if durs else 0,
            "genders": genders,
        }
        print(json.dumps(stats))


def cmd_split(args):
    from ssak_tpu.data.kaldi_dataset import KaldiDataset

    ds = KaldiDataset.load(args.dir)
    parts = ds.split(ratios=tuple(args.ratios), by_speaker=not args.by_utterance, seed=args.seed)
    names = ["train", "dev", "test"][: len(parts)]
    for part, name in zip(parts, names):
        out = f"{args.out_prefix}_{name}"
        part.save(out)
        print(f"{out}: {len(part)} utts")


def cmd_subsample(args):
    import random

    from ssak_tpu.data.kaldi_dataset import KaldiDataset

    ds = KaldiDataset.load(args.dir)
    rows = list(ds.rows)
    if args.mode == "random":
        random.Random(args.seed).shuffle(rows)
        rows = rows[: args.n]
    elif args.mode == "spread":
        step = max(1, len(rows) // max(1, args.n))
        rows = rows[::step][: args.n]
    else:
        rows = rows[: args.n]
    KaldiDataset(rows).save(args.out)
    print(f"{args.out}: {len(rows)} utts")


def cmd_fix(args):
    from ssak_tpu.data.kaldi import check_kaldi_dir

    report = check_kaldi_dir(args.dir, fix=True, language=args.language)
    print(json.dumps({k: v for k, v in report.items() if k != "removed_utts"} | {"removed": len(report["removed_utts"])}))


def main(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("stats")
    s.add_argument("dirs", nargs="+")
    s.set_defaults(fn=cmd_stats)

    s = sub.add_parser("split")
    s.add_argument("dir")
    s.add_argument("out_prefix")
    s.add_argument("--ratios", type=float, nargs="+", default=[0.8, 0.1, 0.1])
    s.add_argument("--by_utterance", action="store_true")
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_split)

    s = sub.add_parser("subsample")
    s.add_argument("dir")
    s.add_argument("out")
    s.add_argument("--n", type=int, required=True)
    s.add_argument("--mode", choices=["head", "random", "spread"], default="random")
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_subsample)

    s = sub.add_parser("fix")
    s.add_argument("dir")
    s.add_argument("--language", default=None)
    s.set_defaults(fn=cmd_fix)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
