"""`sak-wer`: compute WER/CER between reference and hypothesis files.

CLI face of ssak_tpu.eval.wer (reference compute_wer CLI usage)."""

import argparse
import json
import sys


def main(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description="WER/CER between two '<id> <text>' files")
    p.add_argument("references")
    p.add_argument("predictions")
    p.add_argument("--normalization", default=None, help="e.g. fr, fr+, fr++")
    p.add_argument("--char", action="store_true", help="character error rate")
    p.add_argument("--details", action="store_true", help="print per-utterance alignments")
    p.add_argument("--bootstrap_ci", action="store_true")
    p.add_argument("--plot", default=None, help="save a WER bar plot to this path")
    args = p.parse_args(argv)

    from ssak_tpu.eval.wer import compute_wer

    result = compute_wer(
        args.references, args.predictions,
        normalization=args.normalization,
        character_level=args.char,
        details=args.details,
        bootstrap_ci=args.bootstrap_ci,
    )
    if args.details:
        for a in result["alignments"]:
            print(f"--- {a['id']} (wer {a['wer']:.3f})")
            print(a["viz"])
        result = {k: v for k, v in result.items() if k != "alignments"}
    if args.plot:
        from ssak_tpu.eval.plots import plot_wer

        plot_wer(result, output=args.plot)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
