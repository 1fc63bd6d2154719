#!/usr/bin/env python3
"""Batch text normalization CLI.

Counterpart of reference tools/clean_text_fr.py / clean_text_ar.py:
normalizes stdin or a file line-by-line for the given language.

    clean_text.py --language fr < corpus.txt > corpus_clean.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", nargs="?", default=None, help="input file (default stdin)")
    p.add_argument("--language", default="fr")
    p.add_argument("--output", default=None)
    p.add_argument("--keep_punc", action="store_true")
    p.add_argument("--no_lower", dest="lower", action="store_false", default=True)
    args = p.parse_args(argv)

    from ssak_tpu.text import format_text

    fin = open(args.input, encoding="utf-8") if args.input else sys.stdin
    fout = open(args.output, "w", encoding="utf-8") if args.output else sys.stdout
    try:
        for line in fin:
            out = format_text(
                line.rstrip("\n"), args.language,
                keep_punc=args.keep_punc, lower_case=args.lower, safety_checks=False,
            ) if args.language.split("-")[0] in ("fr", "en", "es", "it", "pt", "de") else format_text(line.rstrip("\n"), args.language)
            for seg in out.split("\n"):
                if seg:
                    fout.write(seg + "\n")
    finally:
        if args.input:
            fin.close()
        if args.output:
            fout.close()


if __name__ == "__main__":
    main()
