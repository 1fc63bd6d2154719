#!/usr/bin/env python3
"""Harvest plain text from document files (docx/odt/ods/xlsx/pdf).

Counterpart of reference tools/scraping/scrape_docs.py: walk folders,
extract text from each supported document into .txt files (or stdout).

    scrape_docs.py <file-or-folder...> [--output_dir d] [--extension .txt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    from ssak_tpu.utils.docs import EXTRACTORS, doc2text
    from ssak_tpu.utils.misc import walk_files

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs", nargs="+")
    p.add_argument("--output_dir", default=None)
    p.add_argument("--extension", default=".txt")
    args = p.parse_args(argv)

    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
    n = 0
    for inp in args.inputs:
        paths = [p for p in walk_files(inp) if os.path.splitext(p)[1].lower() in EXTRACTORS] if os.path.isdir(inp) else [inp]
        for path in paths:
            try:
                text = doc2text(path)
            except Exception as e:
                print(f"warning: {path}: {e}", file=sys.stderr)
                continue
            if args.output_dir:
                out = os.path.join(args.output_dir, os.path.splitext(os.path.basename(path))[0] + args.extension)
                with open(out, "w", encoding="utf-8") as f:
                    f.write(text + "\n")
            else:
                print(text)
            n += 1
    print(f"extracted {n} documents", file=sys.stderr)


if __name__ == "__main__":
    main()
