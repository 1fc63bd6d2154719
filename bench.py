"""Benchmarks: CTC train (headline, base + large dims), Whisper large-v3
LoRA train, Whisper large-v3 batched greedy decode (bf16 AND int8 weights +
int8 KV), CTC beam decode (plain, lexicon-constrained, word-LM fused) —
each reported with achieved model TFLOP/s and MFU where FLOPs are the
dominant term (ssak_tpu.utils.flops analytic accounting vs chip peak).

Prints one JSON line per metric; the HEADLINE line (CTC train) is printed
LAST:
  {"metric": "ctc_train_audio_s_per_s", "value": N, "unit": "audio_seconds/s/chip",
   "vs_baseline": N, "tflops": N, "mfu": N}

Methodology: N_INNER train steps fused into ONE compiled program
(lax.fori_loop — how a production TPU loop runs), timed over several calls
with the loss VALUE fetched each call (device->host value fetch is the only
sync that can't be absorbed by the async dispatch queue of the remote TPU
runtime). vs_baseline compares against the reference stack's runnable
equivalent on this host: HF Wav2Vec2ForCTC (torch CPU) fwd+bwd on the same
shapes, measured once and cached in bench_baseline.json (the reference
publishes no numbers — BASELINE.md).
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

BATCH = 32
SECONDS = 10
SR = 16000
LABEL_LEN = 48
N_INNER = 10
TIMED_CALLS = 3

# Whisper large-v3 shapes (synthetic weights; fidelity to the reference's
# --load_in_8bit/4bit + LoRA large fine-tune path, whisper_train.py)
W_BATCH = 4
W_TOKENS = 224
# decode batch 24: largest large-v3 window batch that fits one v5e chip with
# the (B, H, Dh, T) decode-cache layout (see models/layers.py
# decode_attention); measured 374 audio-s/s vs 335 at B=8
W_DEC_BATCH = 24
W_DEC_TOKENS = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _peak():
    from ssak_tpu.utils.flops import tpu_peak_flops

    try:
        return tpu_peak_flops()
    except Exception:
        return None


def _line(metric, value, unit, model_flops_per_s=None, vs_baseline=None):
    peak = _peak()
    rec = {"metric": metric, "value": round(value, 2), "unit": unit, "vs_baseline": vs_baseline}
    if model_flops_per_s is not None:
        rec["tflops"] = round(model_flops_per_s / 1e12, 1)
        if peak:
            rec["mfu"] = round(model_flops_per_s / peak, 3)
    return rec


def bench_ctc_train(preset: str = "base", batch: int = None):
    import jax
    import jax.numpy as jnp
    import optax

    from ssak_tpu.models import wav2vec2
    from ssak_tpu.ops.ctc_pallas import ctc_loss_fast as ctc_loss
    from ssak_tpu.train.steps import init_train_state, make_optimizer
    from ssak_tpu.utils.flops import wav2vec2_train_flops_per_audio_second

    B = batch or BATCH
    cfg = wav2vec2.make_config(preset, vocab_size=48)
    params = wav2vec2.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(total_steps=1000)
    state = init_train_state(params, opt)

    rng = np.random.RandomState(0)
    T = SECONDS * SR
    batch = {
        "audio": jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1),
        "audio_lengths": jnp.full((B,), T, jnp.int32),
        "labels": jnp.asarray(rng.randint(1, 48, (B, LABEL_LEN)), jnp.int32),
        "label_lengths": jnp.full((B,), LABEL_LEN, jnp.int32),
    }

    def loss_fn(p, batch):
        lp, fl = wav2vec2.ctc_log_probs(p, batch["audio"], cfg, batch["audio_lengths"], freeze_feature_encoder=True)
        return ctc_loss(lp, fl, batch["labels"], batch["label_lengths"], blank_id=cfg.blank_id)

    @partial(jax.jit, donate_argnums=(0,))
    def train_n(state, batch):
        def body(_i, st):
            loss, grads = jax.value_and_grad(loss_fn)(st["params"], batch)
            grads = dict(grads)
            grads["feature_extractor"] = jax.tree_util.tree_map(jnp.zeros_like, grads["feature_extractor"])
            updates, opt_state = opt.update(grads, st["opt_state"], st["params"])
            return {
                "params": optax.apply_updates(st["params"], updates),
                "opt_state": opt_state,
                "step": st["step"] + 1,
                "loss": loss,
            }

        st = jax.lax.fori_loop(0, N_INNER, body, {**state, "loss": jnp.float32(0)})
        return {k: st[k] for k in ("params", "opt_state", "step")}, st["loss"]

    state, loss = train_n(state, batch)  # compile + warmup
    loss0 = float(loss)
    assert np.isfinite(loss0) and loss0 > 0, f"degenerate warmup loss: {loss0}"
    log(f"ctc train[{preset}] warmup: loss={loss0:.4f}")
    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        state, loss = train_n(state, batch)
        lv = float(loss)  # value fetch = true synchronization
    dt = time.perf_counter() - t0
    steps = N_INNER * TIMED_CALLS
    log(f"ctc train[{preset}]: {steps} steps in {dt:.2f}s ({dt/steps*1000:.1f} ms/step), final loss={lv:.3f}")
    assert np.isfinite(lv)
    audio_s_per_s = B * SECONDS * steps / dt
    flops_per_s = audio_s_per_s * wav2vec2_train_flops_per_audio_second(cfg)
    return audio_s_per_s, flops_per_s


def bench_whisper_lora_train():
    """Whisper large-v3 dims, frozen bf16 base + LoRA adapters (the
    reference's large-model fine-tune path), block remat to fit one chip."""
    import jax
    import jax.numpy as jnp
    import optax

    from ssak_tpu.models import whisper
    from ssak_tpu.models.lora import add_lora
    from ssak_tpu.train.steps import make_whisper_train_step
    from ssak_tpu.utils.flops import WhisperStepShape, whisper_train_flops_per_step

    cfg = whisper.make_config("large-v3", remat=True)
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)  # frozen base
    params = add_lora(params, rank=16, key=jax.random.PRNGKey(1))
    opt = optax.adamw(1e-4)
    step = make_whisper_train_step(cfg, opt, quantized=True)  # partitioned: LoRA trains, base frozen

    from ssak_tpu.models.quant import partition_trainable

    trainable, _ = partition_trainable(params)
    rng = np.random.RandomState(0)
    n_frames = cfg.n_audio_ctx * 2
    window_s = n_frames * 160 / SR
    batch = {
        "mel": jnp.asarray(rng.randn(W_BATCH, cfg.n_mels, n_frames).astype(np.float32) * 0.1),
        "tokens_in": jnp.asarray(rng.randint(0, cfg.n_vocab, (W_BATCH, W_TOKENS)), jnp.int32),
        "tokens_out": jnp.asarray(rng.randint(0, cfg.n_vocab, (W_BATCH, W_TOKENS)), jnp.int32),
        "token_mask": jnp.ones((W_BATCH, W_TOKENS), jnp.float32),
    }
    state = {"params": params, "opt_state": opt.init(trainable), "step": jnp.int32(0)}
    state, metrics = step(state, batch)  # compile + warmup
    l0 = float(metrics["loss"])
    assert np.isfinite(l0), f"warmup loss {l0}"
    log(f"whisper lora train warmup: loss={l0:.3f}")
    calls = 3
    t0 = time.perf_counter()
    for _ in range(calls):
        state, metrics = step(state, batch)
        lv = float(metrics["loss"])
    dt = time.perf_counter() - t0
    log(f"whisper lora train: {dt/calls*1000:.0f} ms/step, loss={lv:.3f}")
    audio_s_per_s = W_BATCH * window_s * calls / dt
    flops = whisper_train_flops_per_step(cfg, WhisperStepShape(W_BATCH, n_frames, W_TOKENS))
    return audio_s_per_s, flops * calls / dt


def bench_whisper_decode(int8: bool = False):
    """Whisper large-v3 batched greedy decode, 30 s windows.

    int8=True: weight-only int8 kernels through the fused dequant-matmul
    Pallas kernel (ops/int8_matmul — streams 1 byte/param from HBM inside
    the token scan) + int8 cross-attention K/V and int8 self-cache
    (cfg.kv_int8, layers.decode_attention_int8) — the --load_in_8bit
    decode path (reference whisper_train.py:374 bitsandbytes capability).
    Measured (PERF.md "int8 decode"): at matched batch the decode is
    per-step-latency-bound so int8 bytes are roughly neutral; int8's real
    win is MEMORY — the halved weights+KV fit TWICE the batch (48 vs 24),
    which is what this line runs."""
    import jax
    import jax.numpy as jnp

    from ssak_tpu.models import whisper
    from ssak_tpu.utils.flops import whisper_decode_flops_per_window

    cfg = whisper.make_config("large-v3", kv_int8=int8)
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    B = W_DEC_BATCH
    if int8:
        from ssak_tpu.models.quant import quantize_params

        params = jax.tree_util.tree_map(jnp.asarray, quantize_params(params, bits=8))
        B = 40  # halved weight+KV HBM -> ~2x the windows (48 leaves <200 MB slack; 40 is the safe production batch)
    else:
        # load-time decoder qkv fusion (2 fewer launches per self-attn
        # site); quantized kernels skip it inside fuse_qkv_params
        params = whisper.fuse_decode_qkv(
            jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
        )
    rng = np.random.RandomState(0)
    n_frames = cfg.n_audio_ctx * 2
    window_s = n_frames * 160 / SR
    mel = jnp.asarray(rng.randn(B, cfg.n_mels, n_frames).astype(np.float32) * 0.1)
    prompt = [cfg.sot, cfg.no_timestamps]

    fn = jax.jit(lambda p, m: whisper.greedy_decode(p, m, cfg, prompt, max_tokens=W_DEC_TOKENS))
    toks, lens = fn(params, mel)
    int(np.asarray(lens)[0])
    calls = 3
    t0 = time.perf_counter()
    for _ in range(calls):
        toks, lens = fn(params, mel)
    _ = int(np.asarray(lens).sum())  # sync
    dt = time.perf_counter() - t0
    tag = "int8" if int8 else "bf16"
    log(f"whisper decode[{tag}]: {dt/calls*1000:.0f} ms/batch of {B}x{window_s:.0f}s")
    audio_s_per_s = B * window_s * calls / dt
    flops = B * whisper_decode_flops_per_window(cfg, n_frames, len(prompt), W_DEC_TOKENS)
    return audio_s_per_s, flops * calls / dt


def _synthetic_lexicon_lm(n_words=12000, order=3):
    """Realistic-scale decode tables: ~12k-word lexicon (Vosk-model order)
    + an order-3 word LM over it, built once at bench time."""
    from ssak_tpu.decode.lexicon import Lexicon
    from ssak_tpu.decode.lm import train_ngram_lm, word_lm_device_tables

    rng = np.random.RandomState(0)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = sorted({
        "".join(alphabet[i] for i in rng.randint(0, 26, rng.randint(3, 11)))
        for _ in range(n_words)
    })
    lex = Lexicon(words)
    vocab = ["<pad>"] + list(alphabet) + [str(d) for d in range(10)] + ["|", "'", "-", "!", "?", "@", "#", "$", "%", "&", "*"]
    assert len(vocab) == 48
    sents = [" ".join(rng.choice(words, size=8)) for _ in range(2000)]
    lm = train_ngram_lm(sents, order=order)
    trans, accept = lex.device_tables(vocab, word_delimiter="|")
    tables = (trans, accept, lex.node_word_ids())
    wlm = word_lm_device_tables(lm, lex.word_list())
    return tables, wlm


# decode-only batch: inference has no optimizer-state HBM pressure, so the
# batch is a free throughput lever — 96 x 10 s fits comfortably and
# amortizes the beam scan's per-frame fixed costs 3x better than the train
# batch of 32 (measured: 777 -> 1646 audio-s/s synchronous)
DEC_BATCH = 96


def bench_ctc_beam_decode(mode: str = "plain"):
    """wav2vec2-base forward + on-device CTC beam search (beam 16).
    mode: plain | lexicon (trie-constrained) | wordlm (lexicon + on-device
    word n-gram fusion — the configuration word-LM users actually run).

    PIPELINED like production decoding: all batches' encoder+beam programs
    are enqueued before any host fetch (return_async), so the device never
    drains on the host round trip; .result() then fetches + backtraces
    every batch (a true synchronization)."""
    import jax
    import jax.numpy as jnp

    from ssak_tpu.decode.ctc_beam import ctc_beam_search_device
    from ssak_tpu.models import wav2vec2
    from ssak_tpu.utils.flops import ctc_decode_flops_per_audio_second

    cfg = wav2vec2.make_config("base", vocab_size=48)
    params = wav2vec2.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    T = SECONDS * SR
    audio = jnp.asarray(rng.randn(DEC_BATCH, T).astype(np.float32) * 0.1)
    lens = jnp.full((DEC_BATCH,), T, jnp.int32)

    kw = {}
    if mode in ("lexicon", "wordlm"):
        tables, wlm = _synthetic_lexicon_lm()
        kw["lexicon_tables"] = tables
        if mode == "wordlm":
            kw["word_lm"] = wlm

    @jax.jit
    def logits_fn(params, audio, lens):
        return wav2vec2.ctc_log_probs(params, audio, cfg, lens)

    lp, fl = logits_fn(params, audio, lens)
    ctc_beam_search_device(lp, fl, beam_width=16, blank_id=cfg.blank_id, **kw)  # warm
    calls = 4
    t0 = time.perf_counter()
    handles = []
    for _ in range(calls):
        lp, fl = logits_fn(params, audio, lens)
        handles.append(ctc_beam_search_device(lp, fl, beam_width=16, blank_id=cfg.blank_id, return_async=True, **kw))
    done = [h.result() for h in handles]  # fetch + backtrace = full sync
    dt = time.perf_counter() - t0
    assert all(int(tl.sum()) >= 0 for _t, tl in done)
    log(f"ctc beam16 decode[{mode}]: {dt/calls*1000:.0f} ms/batch of {DEC_BATCH}x{SECONDS}s")
    audio_s_per_s = DEC_BATCH * SECONDS * calls / dt
    return audio_s_per_s, audio_s_per_s * ctc_decode_flops_per_audio_second(cfg)


def bench_conformer_train():
    """Conformer-large CTC train (NeMo conformer_ctc_large dims, RoPE
    attention) — the third production model family, same harness."""
    import jax
    import jax.numpy as jnp
    import optax

    from ssak_tpu.models import conformer
    from ssak_tpu.ops.ctc_pallas import ctc_loss_fast as ctc_loss
    from ssak_tpu.train.steps import init_train_state, make_optimizer
    from ssak_tpu.utils.flops import conformer_train_flops_per_audio_second

    cfg = conformer.make_config("large", vocab_size=128)
    params = conformer.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(total_steps=1000)
    state = init_train_state(params, opt)
    rng = np.random.RandomState(0)
    T = SECONDS * SR
    batch = {
        "audio": jnp.asarray(rng.randn(BATCH, T).astype(np.float32) * 0.1),
        "audio_lengths": jnp.full((BATCH,), T, jnp.int32),
        "labels": jnp.asarray(rng.randint(1, 128, (BATCH, LABEL_LEN)), jnp.int32),
        "label_lengths": jnp.full((BATCH,), LABEL_LEN, jnp.int32),
    }

    def loss_fn(p, batch):
        lp, fl = conformer.ctc_log_probs(p, batch["audio"], cfg, batch["audio_lengths"])
        return ctc_loss(lp, fl, batch["labels"], batch["label_lengths"], blank_id=cfg.blank_id)

    @partial(jax.jit, donate_argnums=(0,))
    def train_n(state, batch):
        def body(_i, st):
            loss, grads = jax.value_and_grad(loss_fn)(st["params"], batch)
            updates, opt_state = opt.update(grads, st["opt_state"], st["params"])
            import optax as _optax

            return {
                "params": _optax.apply_updates(st["params"], updates),
                "opt_state": opt_state,
                "step": st["step"] + 1,
                "loss": loss,
            }

        st = jax.lax.fori_loop(0, N_INNER, body, {**state, "loss": jnp.float32(0)})
        return {k: st[k] for k in ("params", "opt_state", "step")}, st["loss"]

    state, loss = train_n(state, batch)
    l0 = float(loss)
    assert np.isfinite(l0) and l0 > 0, l0
    log(f"conformer train warmup: loss={l0:.4f}")
    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        state, loss = train_n(state, batch)
        lv = float(loss)
    dt = time.perf_counter() - t0
    steps = N_INNER * TIMED_CALLS
    log(f"conformer train: {dt/steps*1000:.1f} ms/step, final loss={lv:.3f}")
    audio_s_per_s = BATCH * SECONDS * steps / dt
    return audio_s_per_s, audio_s_per_s * conformer_train_flops_per_audio_second(cfg)


def bench_torch_cpu_baseline():
    """Reference-stack equivalent: HF Wav2Vec2ForCTC fwd+bwd on torch CPU."""
    cache = os.path.join(HERE, "bench_baseline.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["ctc_train_audio_s_per_s_torch_cpu"]
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    cfg = Wav2Vec2Config(vocab_size=48)
    model = Wav2Vec2ForCTC(cfg)
    model.train()
    model.freeze_feature_encoder()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    T = SECONDS * SR
    bs = 8  # CPU cannot fit/afford the TPU batch; audio-s/s is normalized
    x = torch.randn(bs, T) * 0.1
    labels = torch.randint(1, 48, (bs, LABEL_LEN))
    steps = 2
    out = model(x, labels=labels)
    out.loss.backward()
    opt.step()
    opt.zero_grad()
    t0 = time.perf_counter()
    for _ in range(steps):
        out = model(x, labels=labels)
        out.loss.backward()
        opt.step()
        opt.zero_grad()
    dt = time.perf_counter() - t0
    value = bs * SECONDS * steps / dt
    with open(cache, "w") as f:
        json.dump({"ctc_train_audio_s_per_s_torch_cpu": value, "note": "HF Wav2Vec2ForCTC base, torch CPU, same audio shapes (batch 8)"}, f, indent=1)
    log(f"torch cpu baseline: {value:.2f} audio_s/s")
    return value


def main():
    import jax

    log(f"jax devices: {jax.devices()}")
    lines = []
    for name, fn, metric in (
        ("whisper_lora_train", bench_whisper_lora_train, "whisper_large3_lora_train_audio_s_per_s"),
        ("whisper_decode", bench_whisper_decode, "whisper_large3_greedy_decode_audio_s_per_s"),
        ("whisper_int8_decode", partial(bench_whisper_decode, int8=True), "whisper_large3_int8_decode_audio_s_per_s"),
        ("ctc_beam_decode", bench_ctc_beam_decode, "ctc_beam16_decode_audio_s_per_s"),
        ("ctc_beam_lexicon", partial(bench_ctc_beam_decode, mode="lexicon"), "ctc_beam16_lexicon_decode_audio_s_per_s"),
        ("ctc_beam_wordlm", partial(bench_ctc_beam_decode, mode="wordlm"), "ctc_beam16_wordlm_decode_audio_s_per_s"),
        ("ctc_train_large", partial(bench_ctc_train, preset="large", batch=16), "ctc_train_large_audio_s_per_s"),
        ("conformer_train", bench_conformer_train, "conformer_train_audio_s_per_s"),
    ):
        try:
            value, flops_per_s = fn()
            lines.append(_line(metric, value, "audio_seconds/s/chip", flops_per_s))
        except Exception as e:
            log(f"{name} failed: {type(e).__name__}: {e}")

    value, flops_per_s = bench_ctc_train()
    try:
        baseline = bench_torch_cpu_baseline()
    except Exception as e:
        log(f"baseline measurement failed: {e}")
        baseline = None
    vs = round(value / baseline, 3) if baseline else None
    lines.append(_line("ctc_train_audio_s_per_s", value, "audio_seconds/s/chip", flops_per_s, vs))
    for rec in lines:
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
