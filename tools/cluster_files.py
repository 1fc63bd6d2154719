#!/usr/bin/env python3
"""HPC-cluster file management helpers.

Counterpart of reference tools/jeanzay/{touch_everything.py,batch_rsync.py}
(Jean-Zay scratch purges untouched files; big corpora rsync folder by
folder with per-folder logs so interrupted copies resume cleanly):

    cluster_files.py touch <folder>
    cluster_files.py batch-rsync <folder_list> <src_root> <dest_root>
        [--only_audios] [--log_dir logs]
    cluster_files.py corrupt <input_audio> <output_audio> [--bits 1 --seed 0]
        (tools/audio_change_random_bit.sh: bit-level corruption for
         robustness testing of the ingest layer)
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def cmd_touch(args):
    n = 0
    for root, _dirs, files in os.walk(args.folder):
        for fn in files:
            os.utime(os.path.join(root, fn))
            n += 1
    print(f"touched {n} files under {args.folder}")


def cmd_batch_rsync(args):
    with open(args.folder_list, encoding="utf-8") as f:
        folders = [l.strip().rstrip("/") for l in f if l.strip()]
    os.makedirs(args.log_dir, exist_ok=True)
    done, skipped = 0, 0
    for folder in folders:
        src = os.path.join(args.src_root, folder)
        log_file = os.path.join(args.log_dir, os.path.basename(folder) + ".log")
        if os.path.exists(log_file):
            skipped += 1
            continue
        cmd = ["rsync", "-a", "--info=progress2"]
        if args.only_audios:
            cmd += ["--include", "*/", "--include", "*.wav", "--include", "*.mp3",
                    "--include", "*.flac", "--include", "*.ogg", "--exclude", "*"]
        cmd += [src, args.dest_root]
        with open(log_file + ".tmp", "w") as log:
            r = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT)
        if r.returncode == 0:
            os.rename(log_file + ".tmp", log_file)
            done += 1
        else:
            print(f"rsync failed for {src} (see {log_file}.tmp)", file=sys.stderr)
    print(f"rsynced {done} folders ({skipped} already done)")


def cmd_corrupt(args):
    """Flip random bits in the payload of an audio file (past the first
    128 header bytes so the container stays parseable)."""
    import random

    with open(args.input, "rb") as f:
        data = bytearray(f.read())
    if args.input == args.output:
        raise SystemExit("input and output must differ")
    rng = random.Random(args.seed)
    lo = min(128, max(0, len(data) - 1))
    for _ in range(args.bits):
        pos = rng.randrange(lo, len(data))
        data[pos] ^= 1 << rng.randrange(8)
    with open(args.output, "wb") as f:
        f.write(bytes(data))
    print(f"{args.output}: flipped {args.bits} bit(s)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("touch")
    s.add_argument("folder")
    s.set_defaults(fn=cmd_touch)

    s = sub.add_parser("batch-rsync")
    s.add_argument("folder_list"); s.add_argument("src_root"); s.add_argument("dest_root")
    s.add_argument("--only_audios", action="store_true")
    s.add_argument("--log_dir", default="logs")
    s.set_defaults(fn=cmd_batch_rsync)

    s = sub.add_parser("corrupt")
    s.add_argument("input"); s.add_argument("output")
    s.add_argument("--bits", type=int, default=1)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_corrupt)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
