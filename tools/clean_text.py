#!/usr/bin/env python3
"""Batch text normalization CLI.

Counterpart of reference tools/clean_text_fr.py / clean_text_ar.py
(clean_text_fr.py:10 clean_text_fr): normalizes a file (or stdin)
line-by-line for the given language, with the reference's policies for empty
strings / introduced line breaks, parenthesis extraction as separate lines,
and acronym / removed-special-char mining files.

    clean_text.py corpus.txt corpus_clean.txt --extract_parenthesis \
        --file_acronyms acros.txt --file_special_char specials.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_LATIN = ("fr", "en", "es", "it", "pt", "de")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", nargs="?", default=None, help="input file (default stdin)")
    p.add_argument("output", nargs="?", default=None, help="output file (default stdout)")
    p.add_argument("--language", default="fr")
    p.add_argument("--keep_punc", action="store_true")
    p.add_argument("--keep_num", action="store_true", help="keep numbers/symbols unverbalized")
    p.add_argument("--keep_case", action="store_true")
    p.add_argument("--no_lower", dest="keep_case", action="store_true", help="alias of --keep_case")
    p.add_argument("--empty_string_policy", choices=["fail", "allow", "ignore"], default="fail")
    p.add_argument("--linebreak_policy", choices=["fail", "allow"], default="fail")
    p.add_argument("--extract_parenthesis", action="store_true",
                   help="pull out parenthesized groups as separate output lines")
    p.add_argument("--ignore_first", default=0, type=int,
                   help="pass through the first N words unnormalized (1 = kaldi utt id)")
    p.add_argument("--file_acronyms", "--file_acro", default=None,
                   help="file collecting ALL-CAPS acronyms found (deduped)")
    p.add_argument("--file_special_char", "--file_special", default=None,
                   help="file collecting removed non-latin characters (deduped)")
    args = p.parse_args(argv)

    from ssak_tpu.text import format_text
    from ssak_tpu.text.latin import format_text_latin, reset_mined_state

    latin = args.language.split("-")[0] in _LATIN
    reset_mined_state()
    fid_acr = open(args.file_acronyms, "a", encoding="utf-8") if args.file_acronyms else None
    fid_spc = open(args.file_special_char, "a", encoding="utf-8") if args.file_special_char else None

    fin = open(args.input, encoding="utf-8") if args.input else sys.stdin
    fout = open(args.output, "w", encoding="utf-8") if args.output else sys.stdout
    try:
        for line in fin:
            full_line = line
            line = line.rstrip("\n")
            prefix = ""
            if args.ignore_first:
                words = line.split()
                if len(words) < args.ignore_first:
                    raise RuntimeError(f"Line {line!r} has less than {args.ignore_first} words")
                prefix = " ".join(words[: args.ignore_first]) + " "
                line = " ".join(words[args.ignore_first:])
            if latin:
                out = format_text_latin(
                    line, args.language,
                    lower_case=not args.keep_case, keep_punc=args.keep_punc,
                    extract_parenthesized=args.extract_parenthesis,
                    safety_checks=False,
                    fid_acronyms=fid_acr, fid_special_chars=fid_spc,
                ) if not args.keep_num else format_text(
                    line, args.language, keep_punc=args.keep_punc,
                    lower_case=not args.keep_case, convert_numbers=False,
                    safety_checks=False,
                )
            else:
                out = format_text(line, args.language)
            num_dumps = 0
            for seg in out.split("\n"):
                seg = seg.strip()
                if seg or args.empty_string_policy == "allow":
                    fout.write(prefix + seg + "\n")
                    num_dumps += 1
            if not num_dumps and args.empty_string_policy != "ignore":
                raise RuntimeError(
                    f"Empty string found (on {full_line!r}). Use --empty_string_policy=allow|ignore."
                )
            if num_dumps > 1 and args.linebreak_policy == "fail":
                raise RuntimeError(
                    f"Line break introduced normalizing {full_line!r}. Use --linebreak_policy=allow."
                )
    finally:
        if args.input:
            fin.close()
        if args.output:
            fout.close()
        for f in (fid_acr, fid_spc):
            if f:
                f.close()


if __name__ == "__main__":
    main()
