"""`sak-infer`: transcribe with any supported model (auto-detected type).

Counterpart of the reference console scripts sak_infer /
sak_infer_speechbrain (setup.py:36-41) unified into one entry point.
"""

import sys


def main(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    argv = list(sys.argv[1:] if argv is None else argv)
    # peek at the model dir to dispatch
    pos = [a for a in argv if not a.startswith("-")]
    if len(pos) >= 2:
        from ssak_tpu.infer.general import ModelType, get_model_type

        try:
            mtype = get_model_type(pos[1])
        except Exception:
            mtype = ModelType.WAV2VEC2_CTC
        if mtype == ModelType.WHISPER:
            from ssak_tpu.infer.whisper_infer import cli

            return cli(argv)
    from ssak_tpu.infer.ctc_infer import cli

    return cli(argv)


if __name__ == "__main__":
    main()
