"""Whisper inference: batched greedy decode with 30 s windowing.

Counterpart of reference ssak/infer/whisper_infer.py (whisper_infer:13,
model.transcribe 30 s sliding windows :79) and whisper_infer_v2.py (batched
HF generate). TPU-first: each 30 s window is a fixed (B, n_mels, 3000) mel
batch through ONE compiled greedy-decode program (lax.scan KV-cache);
long audio iterates windows with the transcript concatenated.
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from ssak_tpu.ops.logmel import N_SAMPLES, log_mel_spectrogram, pad_or_trim

_DECODE_CACHE = {}


def _jitted_greedy(cfg, prompt, max_tokens):
    """One compiled program per (config, prompt, budget) — reused across
    batches and windows."""
    from ssak_tpu.models import whisper

    key = (cfg, tuple(prompt), max_tokens)
    if key not in _DECODE_CACHE:
        _DECODE_CACHE[key] = jax.jit(
            lambda p, mel: whisper.greedy_decode(p, mel, cfg, list(key[1]), max_tokens=max_tokens)
        )
    return _DECODE_CACHE[key]


def compression_ratio(text: str) -> float:
    import zlib

    data = text.encode("utf-8")
    return len(data) / max(1, len(zlib.compress(data)))


def _jitted_sample(cfg, prompt, max_tokens, temperature):
    from ssak_tpu.models import whisper

    key = ("sample", cfg, tuple(prompt), max_tokens, float(temperature))
    if key not in _DECODE_CACHE:
        _DECODE_CACHE[key] = jax.jit(
            lambda p, mel, k: whisper.sample_decode(p, mel, cfg, list(key[2]), k, temperature=temperature, max_tokens=max_tokens)
        )
    return _DECODE_CACHE[key]


def _jitted_beam(cfg, prompt, max_tokens, beam_size):
    from ssak_tpu.models import whisper

    key = ("beam", cfg, tuple(prompt), max_tokens, beam_size)
    if key not in _DECODE_CACHE:
        _DECODE_CACHE[key] = jax.jit(
            lambda p, mel: whisper.beam_decode(p, mel, cfg, list(key[2]), beam_size=beam_size, max_tokens=max_tokens)
        )
    return _DECODE_CACHE[key]


def transcribe_with_fallback(
    model,
    mel,
    prompt,
    max_tokens: int = 224,
    beam_size: int = 0,
    temperatures=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: float = 2.4,
    logprob_threshold: float = -1.0,
    seed: int = 0,
):
    """Whisper-style temperature fallback (reference whisper_infer.py
    --accurate preset; openai-whisper decode loop): try beam/greedy at
    T=0, retry failing utterances with sampling at increasing temperature
    until compression-ratio and avg-logprob checks pass."""
    import jax as _jax

    cfg = model.cfg
    eot = model.tokenizer.eot if model.tokenizer else cfg.eot
    B = mel.shape[0]
    texts = [None] * B

    def decode_ids(tokens, lengths, b):
        ids = [int(t) for t in np.asarray(tokens)[b][: int(np.asarray(lengths)[b])] if int(t) != eot]
        return model.tokenizer.decode(ids) if model.tokenizer else " ".join(map(str, ids))

    pending = list(range(B))
    for ti, temp in enumerate(temperatures):
        if not pending:
            break
        if temp == 0.0 and beam_size > 1:
            tokens, lengths, scores = _jitted_beam(cfg, prompt, max_tokens, beam_size)(model.params, mel)
            avg_lp = np.asarray(scores) / np.maximum(1, np.asarray(lengths))
        else:
            key = _jax.random.PRNGKey(seed + ti)
            tokens, lengths, sum_lp = _jitted_sample(cfg, prompt, max_tokens, temp)(model.params, mel, key)
            avg_lp = np.asarray(sum_lp) / np.maximum(1, np.asarray(lengths))
        still = []
        for b in pending:
            text = decode_ids(tokens, lengths, b)
            ok = compression_ratio(text) <= compression_ratio_threshold and (
                avg_lp[b] >= logprob_threshold or temp == temperatures[-1]
            )
            if ok or ti == len(temperatures) - 1:
                texts[b] = text
            else:
                still.append(b)
        pending = still
    return ["" if t is None else t for t in texts]


def whisper_transcribe_batch(
    model, batch, language: str = None, task: str = "transcribe", max_tokens: int = 224,
    beam_size: int = 0, temperature_fallback: bool = False,
):
    """batch: list of 1-D float32 arrays at 16 kHz -> list of transcripts.
    Utterances longer than 30 s are windowed and window texts joined.
    beam_size>1 / temperature_fallback enable the 'accurate' decode chain."""
    from ssak_tpu.models import whisper

    cfg = model.cfg
    tok = model.tokenizer
    if tok is not None:
        prompt = tok.sot_sequence(language=language, task=task)
        eot = tok.eot
    else:  # seeded test model
        prompt = [cfg.sot, cfg.no_timestamps]
        eot = cfg.eot

    # window length follows the encoder context (30 s for real Whisper)
    window_samples = cfg.n_audio_ctx * 2 * 160
    max_tokens = min(max_tokens, cfg.n_text_ctx - len(prompt) - 1)

    # split long utterances into windows, remember origin
    windows, origins = [], []
    for bi, a in enumerate(batch):
        n = max(1, len(a))
        for s in range(0, n, window_samples):
            windows.append(a[s : s + window_samples])
            origins.append(bi)

    texts = [""] * len(batch)
    for w0 in range(0, len(windows), max(1, len(batch))):
        group = windows[w0 : w0 + max(1, len(batch))]
        x = np.stack([np.asarray(pad_or_trim(jnp.asarray(w), window_samples)) for w in group])
        mel = log_mel_spectrogram(jnp.asarray(x), n_mels=cfg.n_mels)
        if beam_size > 1 or temperature_fallback:
            pieces = transcribe_with_fallback(
                model, mel, prompt, max_tokens=max_tokens, beam_size=beam_size,
                temperatures=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0) if temperature_fallback else (0.0,),
            )
        else:
            tokens, lengths = _jitted_greedy(cfg, prompt, max_tokens)(model.params, mel)
            tokens = np.asarray(tokens)
            lengths = np.asarray(lengths)
            pieces = []
            for gi in range(len(group)):
                ids = [int(t) for t in tokens[gi, : lengths[gi]] if int(t) != eot]
                pieces.append(model.tokenizer.decode(ids) if model.tokenizer else " ".join(map(str, ids)))
        for gi, piece in enumerate(pieces):
            bi = origins[w0 + gi]
            texts[bi] = (texts[bi] + " " + piece).strip() if piece else texts[bi]
    return texts


def whisper_infer(
    model_dir,
    audios,
    batch_size: int = 4,
    language: str = None,
    output_ids: bool = False,
    seeded_test_config: str = None,
    beam_size: int = 0,
    temperature_fallback: bool = False,
    tensor_parallel: int = 0,
    quantize_bits: int = 0,
):
    from ssak_tpu.data.dataset import to_audio_batches
    from ssak_tpu.infer.general import load_model, shard_model

    model = load_model(model_dir, seeded_test_config=seeded_test_config, quantize_bits=quantize_bits)
    if tensor_parallel:
        shard_model(model, model_axis=tensor_parallel)
    batches = to_audio_batches(audios, batch_size=batch_size, sample_rate=16000, output_ids=True)
    for batch, ids in batches:
        texts = whisper_transcribe_batch(
            model, batch, language=language, beam_size=beam_size, temperature_fallback=temperature_fallback
        )
        for i, t in zip(ids, texts):
            yield (i, t) if output_ids else t


def cli(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    import argparse

    parser = argparse.ArgumentParser(description="Transcribe audio with Whisper (TPU)")
    parser.add_argument("data")
    parser.add_argument("model", help="HF Whisper checkpoint directory")
    parser.add_argument("--language", default=None)
    parser.add_argument("--output", default=None)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--use_ids", action="store_true", default=True)
    parser.add_argument("--no-use_ids", dest="use_ids", action="store_false")
    parser.add_argument("--beam_size", type=int, default=0)
    parser.add_argument("--accurate", action="store_true", help="beam 5 + temperature fallback (reference --accurate preset)")
    parser.add_argument("--efficient", action="store_true", help="greedy decode (reference --efficient preset)")
    parser.add_argument("--tensor_parallel", "--tp", type=int, default=0, dest="tensor_parallel",
                        help="shard model weights over N chips (megatron TP rules)")
    parser.add_argument("--load_in_8bit", action="store_true", help="int8 weight-only quantized decode")
    parser.add_argument("--load_in_4bit", action="store_true", help="int4 weight-only quantized decode")
    args = parser.parse_args(argv)
    beam = 5 if args.accurate else (0 if args.efficient else args.beam_size)

    out = open(args.output, "w", encoding="utf-8") if args.output else sys.stdout
    try:
        for item in whisper_infer(
            args.model, args.data, batch_size=args.batch_size, language=args.language,
            output_ids=args.use_ids, beam_size=beam, temperature_fallback=args.accurate,
            tensor_parallel=args.tensor_parallel,
            quantize_bits=4 if args.load_in_4bit else (8 if args.load_in_8bit else 0),
        ):
            out.write(f"{item[0]} {item[1]}\n" if args.use_ids else f"{item}\n")
            out.flush()
    finally:
        if args.output:
            out.close()


if __name__ == "__main__":
    cli()
