"""Whisper seq2seq fine-tuning: host driver + CLI.

Counterpart of reference ssak/train/transformers/whisper_train.py
(Seq2SeqTrainer + predict_with_generate + LoRA/PEFT + per-language text
normalization :341-354): mel windows feed one donated train step; eval
decodes greedily and scores WER; --lora trains adapters only and
checkpoints just the adapter leaves (reference SavePeftModelCallback:91).
"""

import argparse
import json
import os
import sys

import numpy as np


class WhisperBatcher:
    """rows -> {mel, tokens_in, tokens_out, token_mask} with static shapes
    per (batch, token bucket)."""

    def __init__(self, cfg, tokenizer, language=None, batch_size=4, sample_rate=16000, max_tokens=None, normalize_text=None):
        self.cfg = cfg
        self.tok = tokenizer
        self.language = language
        self.batch_size = batch_size
        self.sample_rate = sample_rate
        self.window = cfg.n_audio_ctx * 2 * 160
        self.max_tokens = max_tokens or (cfg.n_text_ctx - 8)
        self.normalize_text = normalize_text or (lambda t: t)
        if tokenizer is not None:
            self.prompt = tokenizer.sot_sequence(language=language)
            self.eot = tokenizer.eot
        else:
            self.prompt = [cfg.sot, cfg.no_timestamps]
            self.eot = cfg.eot

    def _tokens(self, text):
        if self.tok is not None:
            return self.tok.encode(self.normalize_text(text))
        # seeded test model: bytes of the text as pseudo-tokens
        return [(b % (self.cfg.n_vocab - 10)) + 10 for b in self.normalize_text(text).encode()][: self.max_tokens]

    def batches(self, rows, seed=None):
        import random

        import jax.numpy as jnp

        from ssak_tpu.audio import load_audio
        from ssak_tpu.ops.logmel import log_mel_spectrogram

        rows = [r for r in rows if r.get("text")]
        if seed is not None:
            random.Random(seed).shuffle(rows)
        for i in range(0, len(rows), self.batch_size):
            chunk = rows[i : i + self.batch_size]
            audios = np.zeros((len(chunk), self.window), np.float32)
            U = self.max_tokens + len(self.prompt) + 1
            tokens_in = np.full((len(chunk), U), self.eot, np.int32)
            tokens_out = np.full((len(chunk), U), self.eot, np.int32)
            mask = np.zeros((len(chunk), U), np.float32)
            for j, r in enumerate(chunk):
                a = load_audio(r["audio"], start=r.get("start"), end=r.get("end"), sample_rate=self.sample_rate)
                audios[j, : min(len(a), self.window)] = a[: self.window]
                seq = list(self.prompt) + self._tokens(r["text"])[: self.max_tokens] + [self.eot]
                inp = seq[:-1][:U]
                out = seq[1:][:U]
                tokens_in[j, : len(inp)] = inp
                tokens_out[j, : len(out)] = out
                mask[j, len(self.prompt) - 1 : len(out)] = 1.0  # predict text + eot
            # int16 wire format (audio/wire.py) for the audio — the
            # dominant h2d payload: a 4x30s f32 window batch is 7.7 MB
            # over the ~37 MB/s link (PERF.md). The f32 cast happens on
            # device ahead of the mel matmuls.
            from ssak_tpu.audio.wire import encode_array, to_device_f32

            mel = log_mel_spectrogram(to_device_f32(encode_array(audios)), n_mels=self.cfg.n_mels)
            yield {
                "mel": mel,
                "tokens_in": jnp.asarray(tokens_in),
                "tokens_out": jnp.asarray(tokens_out),
                "token_mask": jnp.asarray(mask),
            }, chunk


def train_whisper(
    params, cfg, tokenizer, train_rows, eval_rows, output_dir,
    language=None, lora_rank: int = 0, learning_rate=1e-5, warmup_steps=50,
    max_steps=1000, batch_size=4, eval_steps=200, seed=69, normalize_text=None,
    log_interval=10, quantize_bits: int = 0, grad_accum: int = 1,
    max_eval_samples: int = None,
):
    import jax
    import jax.numpy as jnp

    from ssak_tpu.eval.wer import compute_wer
    from ssak_tpu.infer.whisper_infer import whisper_transcribe_batch
    from ssak_tpu.models.lora import add_lora, extract_lora
    from ssak_tpu.train.checkpoint import save_checkpoint
    from ssak_tpu.train.steps import init_train_state, make_optimizer, make_whisper_train_step
    from ssak_tpu.utils.monitoring import logger

    os.makedirs(output_dir, exist_ok=True)
    if lora_rank:
        if not quantize_bits:
            # the base is FROZEN under LoRA: hold it in bf16 (half the
            # HBM + weight-stream bytes; the headline LoRA bench config)
            # and use the partitioned step below — gradients are taken
            # w.r.t. the f32 adapter leaves only, instead of building the
            # full-model backward and masking it (2x the backward FLOPs
            # and grad memory for leaves that are then zeroed)
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
                params,
            )
        params = add_lora(params, rank=lora_rank, key=jax.random.PRNGKey(seed))
    if quantize_bits:
        # reference whisper_train.py:374-407: int8/int4 frozen base + LoRA
        from ssak_tpu.models.quant import quantize_params, quantized_bytes

        params = quantize_params(params, bits=quantize_bits)
        qb, db = quantized_bytes(params)
        logger.info(f"quantized base: {qb / 1e6:.1f} MB in HBM (dense bf16 equivalent {db / 1e6:.1f} MB)")
    optimizer = make_optimizer(learning_rate=learning_rate, warmup_steps=warmup_steps, total_steps=max_steps)
    if grad_accum > 1:
        from ssak_tpu.train.steps import with_grad_accumulation

        optimizer = with_grad_accumulation(optimizer, grad_accum)
    # partitioned step whenever a frozen partition exists (quantized base
    # and/or LoRA adapters): optimizer state and autodiff see only the
    # trainable float leaves (models/quant.partition_trainable)
    partitioned = bool(quantize_bits) or bool(lora_rank)
    state = init_train_state(params, optimizer, quantized=partitioned)
    step_fn = make_whisper_train_step(cfg, optimizer, quantized=partitioned)
    batcher = WhisperBatcher(cfg, tokenizer, language=language, batch_size=batch_size, normalize_text=normalize_text)

    log_history = []
    # host-side step counter — fetching state["step"] per step drains the
    # async dispatch queue and serializes compute against the next batch's
    # transfer (PERF.md "sak-train end-to-end"; same fix as CTCTrainer)
    gstep = int(np.asarray(state["step"]))
    epoch = 0
    from ssak_tpu.data.prefetch import prefetch_iterator

    while gstep < max_steps:
        for batch, _chunk in prefetch_iterator(batcher.batches(train_rows, seed=seed + epoch)):
            state, metrics = step_fn(state, batch)
            gstep += 1
            if gstep % log_interval == 0 or gstep == 1:
                entry = {"step": gstep, "loss": round(float(metrics["loss"]), 4)}
                log_history.append(entry)
                logger.info(f"whisper train {entry}")
            if eval_rows and eval_steps and gstep % eval_steps == 0:
                ev = evaluate_whisper(state["params"], cfg, tokenizer, eval_rows, batcher, normalize_text,
                                      max_samples=max_eval_samples)
                ev["step"] = gstep
                log_history.append(ev)
                logger.info(f"whisper eval {ev}")
                if lora_rank:
                    adapters = extract_lora(state["params"])
                    np.savez(os.path.join(output_dir, f"adapters-{gstep}.npz"), **adapters)
                else:
                    save_checkpoint(output_dir, state, metadata=ev, save_total_limit=2)
            if gstep >= max_steps:
                break
        epoch += 1
    with open(os.path.join(output_dir, "trainer_state.json"), "w") as f:
        json.dump({"global_step": gstep, "log_history": log_history}, f, indent=1)
    if lora_rank:
        adapters = extract_lora(state["params"])
        np.savez(os.path.join(output_dir, "adapters.npz"), **adapters)
    else:
        save_checkpoint(output_dir, state, save_total_limit=2)
    return state, log_history


def evaluate_whisper(params, cfg, tokenizer, eval_rows, batcher, normalize_text=None, max_samples: int = None):
    from ssak_tpu.audio import load_audio
    from ssak_tpu.eval.wer import compute_wer
    from ssak_tpu.infer.general import LoadedModel, ModelType
    from ssak_tpu.infer.whisper_infer import whisper_transcribe_batch

    normalize_text = normalize_text or (lambda t: t)
    model = LoadedModel(ModelType.WHISPER, params, cfg, tokenizer)
    refs, hyps = {}, {}
    rows = [r for r in eval_rows if r.get("text")]
    if max_samples:
        # predict_with_generate-style eval cost cap (reference Seq2SeqTrainer
        # eval runs generation per sample — unbounded eval dominates training
        # wall-clock on big dev sets); deterministic head keeps evals comparable
        rows = rows[:max_samples]
    B = batcher.batch_size
    for i in range(0, len(rows), B):
        chunk = rows[i : i + B]
        audios = [load_audio(r["audio"], start=r.get("start"), end=r.get("end"), sample_rate=16000) for r in chunk]
        texts = whisper_transcribe_batch(model, audios, language=batcher.language)
        for r, t in zip(chunk, texts):
            refs[r["id"]] = normalize_text(r["text"])
            hyps[r["id"]] = normalize_text(t) if t else ""
    wer = compute_wer(refs, hyps)["wer"] if refs else float("nan")
    return {"eval_wer": wer}


def main(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description="Fine-tune Whisper on Kaldi data (TPU)")
    p.add_argument("train")
    p.add_argument("valid")
    p.add_argument("--base_model", default=None, help="HF Whisper checkpoint dir")
    p.add_argument("--output_dir", default="runs/whisper")
    p.add_argument("--language", default=None)
    p.add_argument("--lora", type=int, default=0, help="LoRA rank (0 = full fine-tune)")
    p.add_argument("--load_in_8bit", action="store_true", help="int8 frozen base (pair with --lora)")
    p.add_argument("--load_in_4bit", action="store_true", help="int4 frozen base (pair with --lora)")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--grad_accum", type=int, default=1, help="gradient accumulation micro-steps per optimizer update")
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--eval_steps", type=int, default=200)
    p.add_argument("--max_eval_samples", type=int, default=None, help="cap generation-eval cost (first N eval utterances)")
    p.add_argument("--max_duration", type=float, default=30.0)
    p.add_argument("--seed", type=int, default=69)
    args = p.parse_args(argv)

    import jax

    from ssak_tpu.data.dataset import kaldi_folder_to_manifest
    from ssak_tpu.models import whisper as whisper_mod
    from ssak_tpu.text import format_text

    def norm(t):
        if not args.language:
            return t.strip()
        try:
            return format_text(t, args.language, extract_parenthesized=False, safety_checks=False).replace("\n", " ")
        except Exception:
            return t.lower()

    _m1, train_rows = kaldi_folder_to_manifest(args.train, max_duration=args.max_duration, seed=args.seed)
    _m2, valid_rows = kaldi_folder_to_manifest(args.valid, max_duration=args.max_duration, seed=args.seed)

    if args.base_model:
        from ssak_tpu.models.hf_loader import load_whisper
        from ssak_tpu.models.tokenizer import WhisperTokenizer

        params, cfg = load_whisper(args.base_model)
        tokenizer = WhisperTokenizer(args.base_model)
    else:
        cfg = whisper_mod.make_config("tiny_test")
        params = whisper_mod.init_params(jax.random.PRNGKey(args.seed), cfg)
        tokenizer = None

    state, hist = train_whisper(
        params, cfg, tokenizer, train_rows, valid_rows, args.output_dir,
        language=args.language, lora_rank=args.lora, learning_rate=args.learning_rate,
        max_steps=args.max_steps, batch_size=args.batch_size, eval_steps=args.eval_steps,
        max_eval_samples=args.max_eval_samples,
        seed=args.seed, normalize_text=norm,
        quantize_bits=4 if args.load_in_4bit else (8 if args.load_in_8bit else 0),
        grad_accum=args.grad_accum,
    )
    print(json.dumps({"output_dir": args.output_dir, "steps": int(np.asarray(state["step"]))}))


if __name__ == "__main__":
    main()
