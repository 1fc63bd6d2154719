"""Benchmarks: CTC train (headline, base + large dims), Whisper large-v3
LoRA train, Whisper large-v3 batched greedy decode (bf16 / int8 / int4
weights), the --accurate decode chain (beam5 + best_of5 + fallback), CTC
beam decode (plain, lexicon-constrained, word-LM fused — measured
INTERLEAVED round-robin), conformer train + decode, and the END-TO-END
sak-infer path (real wav files in a Kaldi dir -> final transcripts through
the production CLI machinery) — each reported with achieved model TFLOP/s
and MFU where FLOPs are the dominant term.

Prints one JSON line per metric; the HEADLINE line (CTC train) is printed
LAST:
  {"metric": "ctc_train_audio_s_per_s", "value": N, "unit": "audio_seconds/s/chip",
   "vs_baseline": N, "tflops": N, "mfu": N}

Methodology (hardened round 4 — the remote-TPU relay can wedge and recover
on a ~minutes cycle, and a single wedged call poisons a single-shot
measurement, VERDICT r3 weak #1):
  * each metric times its calls INDIVIDUALLY and reports the MEDIAN rate;
  * a tiny probe matmul runs between heavy sections; if the probe is slow
    the harness waits for the relay to recover before measuring;
  * the three CTC-beam modes share one setup and are measured interleaved
    A/B/C round-robin, so a transient stall cannot make a strict-subset
    program (lexicon-only) appear slower than its superset (lexicon+LM);
  * timed calls fetch a VALUE (device->host) — the only true sync on this
    async-dispatch runtime;
  * N_INNER train steps are fused into ONE compiled program (lax.fori_loop).

vs_baseline compares against the reference stack's runnable equivalent on
this host: HF Wav2Vec2ForCTC (torch CPU) fwd+bwd on the same shapes,
measured once and cached in bench_baseline.json (the reference publishes no
numbers — BASELINE.md).
"""

import json
import os
import statistics
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


def probe_device(tag: str = "") -> float:
    """Tiny matmul round trip; seconds. The canary for a wedged relay."""
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jnp.full((128, 128), 1.0, jnp.bfloat16)
    _ = float((x @ x).sum())
    dt = time.perf_counter() - t0
    log(f"probe[{tag}]: {dt*1000:.0f} ms")
    return dt


def ensure_healthy(tag: str, slow_s: float = 2.0, max_wait_s: float = 900.0):
    """Block until the device answers a probe quickly (the relay recovers
    on its own — CLAUDE.md); prevents a wedge from poisoning the next
    section's numbers."""
    waited = 0.0
    while probe_device(tag) > slow_s:
        if waited >= max_wait_s:
            log(f"ensure_healthy[{tag}]: still slow after {waited:.0f}s — proceeding")
            return
        log(f"ensure_healthy[{tag}]: relay slow, waiting 30 s")
        time.sleep(30.0)
        waited += 30.0


def median_rate(work_per_call: float, call_times) -> float:
    return work_per_call / statistics.median(call_times)


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
    times = []
    for _ in range(TIMED_CALLS):
        t0 = time.perf_counter()
        state, loss = train_n(state, batch)
        lv = float(loss)  # value fetch = true synchronization
        times.append(time.perf_counter() - t0)
    log(f"ctc train[{preset}]: per-call s {['%.2f' % t for t in times]}, final loss={lv:.3f}")
    assert np.isfinite(lv)
    audio_s_per_s = median_rate(B * SECONDS * N_INNER, times)
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
    times = []
    for _ in range(TIMED_CALLS):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        lv = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    log(f"whisper lora train: per-call s {['%.2f' % t for t in times]}, loss={lv:.3f}")
    audio_s_per_s = median_rate(W_BATCH * window_s, times)
    flops = whisper_train_flops_per_step(cfg, WhisperStepShape(W_BATCH, n_frames, W_TOKENS))
    return audio_s_per_s, flops * audio_s_per_s / (W_BATCH * window_s)


def bench_whisper_decode(bits: int = 0):
    """Whisper large-v3 batched greedy decode, 30 s windows.

    bits=8: weight-only int8 through the fused dequant-matmul Pallas kernel
    (ops/int8_matmul) + int8 KV caches (cfg.kv_int8) — the --load_in_8bit
    path. int8's claimed win is CAPACITY (halved weights+KV): the r3
    single-shot record said B=48 is the best large-v3 decode config on
    this chip, r4's hardened B=40 measured a 0.7% win over bf16 — so this
    section A/B-tests B=40 vs B=48 INTERLEAVED under the hardened harness
    and reports the winner (VERDICT r4 next #4: one configuration, one
    claim, one number).
    bits=4: blockwise int4 weights (models/quant q4) through the fused
    matmul_int4 Pallas kernel — the --load_in_4bit path; ~0.9 GB weights.
    Pinned at B=32: larger int4 programs crash or hang the remote compile
    helper (measured r4, PERF.md "int4 decode")."""
    import jax
    import jax.numpy as jnp

    from ssak_tpu.models import whisper
    from ssak_tpu.utils.flops import whisper_decode_flops_per_window

    cfg = whisper.make_config("large-v3", kv_int8=(bits in (8, 4)))
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    if bits:
        from ssak_tpu.models.quant import quantize_params

        params = jax.tree_util.tree_map(jnp.asarray, quantize_params(params, bits=bits))
        # int8: both candidate batches measured interleaved below. int4 is
        # pinned at B=32: B=64/48 CRASH the remote compile helper
        # (tpu_compile_helper exit 1 after ~6 min) and B=40 hangs its
        # compile >10 min — measured r4, PERF.md "int4 decode"; int4's win
        # is weight FOOTPRINT (0.9 GB vs 1.6), not throughput.
        batch_ladder = [48, 40] if bits == 8 else [32]
    else:
        # load-time decoder qkv fusion (2 fewer launches per self-attn
        # site); quantized kernels skip it inside fuse_qkv_params
        params = whisper.fuse_decode_qkv(
            jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
        )
        batch_ladder = [W_DEC_BATCH]
    rng = np.random.RandomState(0)
    n_frames = cfg.n_audio_ctx * 2
    window_s = n_frames * 160 / SR
    prompt = [cfg.sot, cfg.no_timestamps]

    fn = jax.jit(lambda p, m: whisper.greedy_decode(p, m, cfg, prompt, max_tokens=W_DEC_TOKENS))
    candidates = []  # (B, mel) that compiled and ran
    for try_b in batch_ladder:
        mel = jnp.asarray(rng.randn(try_b, cfg.n_mels, n_frames).astype(np.float32) * 0.1)
        try:
            toks, lens = fn(params, mel)
            int(np.asarray(lens)[0])
            candidates.append((try_b, mel))
        except Exception as e:  # OOM/compile failure at this batch
            log(f"whisper decode[bits={bits}] B={try_b} failed: {type(e).__name__}")
            continue
    assert candidates, "no batch size fit"
    tag = {0: "bf16", 8: "int8", 4: "int4"}[bits]
    times = {b: [] for b, _ in candidates}
    dead = set()
    for _rnd in range(TIMED_CALLS):  # interleaved: relay drift hits all Bs equally
        for b, mel in candidates:
            if b in dead:
                continue
            try:
                t0 = time.perf_counter()
                toks, lens = fn(params, mel)
                _ = int(np.asarray(lens).sum())  # sync
                times[b].append(time.perf_counter() - t0)
            except Exception as e:
                # a candidate at the HBM edge (B=48) can pass its warm
                # probe and still die mid-rotation; losing IT must not
                # lose the other candidate's already-collected rounds
                log(f"whisper decode[{tag}] B={b} died mid-rotation: {type(e).__name__}")
                dead.add(b)
    rates = {b: median_rate(b * window_s, times[b]) for b, _ in candidates if times[b]}
    assert rates, "every candidate batch died during timing"
    for b in rates:
        log(f"whisper decode[{tag}]: B={b}, per-call s {['%.2f' % t for t in times[b]]} -> {rates[b]:.1f} audio-s/s")
    B = max(rates, key=rates.get)
    audio_s_per_s = rates[B]
    log(f"whisper decode[{tag}]: pinned B={B}")
    flops = B * whisper_decode_flops_per_window(cfg, n_frames, len(prompt), W_DEC_TOKENS)
    return audio_s_per_s, flops * audio_s_per_s / (B * window_s)


def bench_whisper_accurate():
    """The --accurate preset chain on large-v3 dims: beam-5 decode at T=0
    plus best_of-5 sampled retry for rows failing the quality gates — the
    configuration the reference ships for quality-first transcription
    (whisper_infer.py --accurate). Random weights fail the avg-logprob gate
    at T=0, so every timed call measures beam5(full batch) + best_of5
    sampling(pending rows): the WORST-case two-stage cost. Two temperatures
    keep the program count at 2 (each (T, best_of) signature is a separate
    multi-minute large-v3 compile on this runtime)."""
    import jax
    import jax.numpy as jnp

    from ssak_tpu.infer.general import LoadedModel, ModelType
    from ssak_tpu.infer.whisper_infer import transcribe_with_fallback
    from ssak_tpu.models import whisper

    cfg = whisper.make_config("large-v3")
    params = whisper.fuse_decode_qkv(
        jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), whisper.init_params(jax.random.PRNGKey(0), cfg)
        )
    )
    model = LoadedModel(ModelType.WHISPER, params, cfg, None)
    # beam 5 multiplies decode state 5x; the remote compile helper crashes
    # on large-v3 beam programs past ~20 effective rows (B=8 x beam5 died,
    # B=4 x beam5 compiles in ~2 min — measured r4, PERF.md), so B=4 is the
    # largest --accurate batch this runtime can own
    B = 4
    rng = np.random.RandomState(0)
    n_frames = cfg.n_audio_ctx * 2
    window_s = n_frames * 160 / SR
    mel = jnp.asarray(rng.randn(B, cfg.n_mels, n_frames).astype(np.float32) * 0.1)
    prompt = [cfg.sot, cfg.no_timestamps]

    def run_once():
        return transcribe_with_fallback(
            model, mel, prompt, max_tokens=W_DEC_TOKENS, beam_size=5, best_of=5,
            temperatures=(0.0, 0.2),
        )

    texts = run_once()  # compile both stages + warmup
    assert len(texts) == B
    times = []
    for _ in range(TIMED_CALLS):
        t0 = time.perf_counter()
        texts = run_once()
        times.append(time.perf_counter() - t0)
    log(f"whisper accurate: B={B}, per-call s {['%.2f' % t for t in times]}")
    return median_rate(B * window_s, times), None


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
    return words, lm, tables, wlm


# decode-only batch: inference has no optimizer-state HBM pressure, so the
# batch is a free throughput lever — 96 x 10 s fits comfortably and
# amortizes the beam scan's per-frame fixed costs 3x better than the train
# batch of 32 (measured: 777 -> 1646 audio-s/s synchronous)
DEC_BATCH = 96
BEAM_ROUNDS = 4
BEAM_CALLS_PER_ROUND = 2


def bench_ctc_beam_all():
    """On-device CTC beam search (beam 16), FOUR modes measured INTERLEAVED
    round-robin — wav2vec2-base plain, lexicon-constrained, lexicon+word-LM,
    and conformer-large plain — so a relay stall hits all modes equally: a
    strict subset can never report slower than its superset (the r3
    anomaly), and the conformer line can no longer swing 2.2x against the
    wav2vec2 line purely on relay drift (VERDICT r4 weak #3 — its lone
    3-call median spanned 2204-4090 across runs while sharing the exact
    beam engine). Median over rounds per mode; per-round times logged so a
    drifting round is visible in the record.

    PIPELINED like production decoding: each measurement enqueues
    BEAM_CALLS_PER_ROUND encoder+beam programs before any host fetch
    (return_async), then resolves them all (fetch + backtrace = sync)."""
    import jax
    import jax.numpy as jnp

    from ssak_tpu.decode.ctc_beam import ctc_beam_search_device
    from ssak_tpu.models import conformer, wav2vec2
    from ssak_tpu.utils.flops import (
        conformer_train_flops_per_audio_second,
        ctc_decode_flops_per_audio_second,
    )

    cfg = wav2vec2.make_config("base", vocab_size=48)
    params = wav2vec2.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = conformer.make_config("large", vocab_size=128)
    cparams = conformer.init_params(jax.random.PRNGKey(0), ccfg)
    rng = np.random.RandomState(0)
    T = SECONDS * SR
    audio = jnp.asarray(rng.randn(DEC_BATCH, T).astype(np.float32) * 0.1)
    lens = jnp.full((DEC_BATCH,), T, jnp.int32)

    _w, _lm, tables, wlm = _synthetic_lexicon_lm()

    @jax.jit
    def w2v_logits(params, audio, lens):
        return wav2vec2.ctc_log_probs(params, audio, cfg, lens)

    @jax.jit
    def conf_logits(params, audio, lens):
        return conformer.ctc_log_probs(params, audio, ccfg, lens)

    # mode -> (logits_fn, params, blank_id, beam kwargs, flops/audio-s)
    modes = {
        "plain": (w2v_logits, params, cfg.blank_id, {}, ctc_decode_flops_per_audio_second(cfg)),
        "lexicon": (w2v_logits, params, cfg.blank_id, {"lexicon_tables": tables},
                    ctc_decode_flops_per_audio_second(cfg)),
        "wordlm": (w2v_logits, params, cfg.blank_id, {"lexicon_tables": tables, "word_lm": wlm},
                   ctc_decode_flops_per_audio_second(cfg)),
        # conformer decode = encoder forward only (~1/3 of its train FLOPs)
        "conformer": (conf_logits, cparams, ccfg.blank_id, {},
                      conformer_train_flops_per_audio_second(ccfg) / 3.0),
    }

    warm_t = {}
    for m, (lfn, p, blank, kw, _f) in modes.items():  # compile + table upload
        lp, fl = lfn(p, audio, lens)
        ctc_beam_search_device(lp, fl, beam_width=16, blank_id=blank, **kw)
        t0 = time.perf_counter()
        lp, fl = lfn(p, audio, lens)
        ctc_beam_search_device(lp, fl, beam_width=16, blank_id=blank, **kw)
        warm_t[m] = time.perf_counter() - t0
        log(f"ctc beam[{m}] warmed ({warm_t[m]*1000:.0f} ms/call)")
    # adaptive calls-per-round: every mode's timed interval spans >= ~0.8 s
    # so the relay's fixed ~±50 ms per-call jitter stays <~7% of any
    # measurement — the conformer batch (~0.2 s/call) otherwise carries
    # ±25% error bars the slower wav2vec2 modes don't (PERF.md)
    calls = {m: max(BEAM_CALLS_PER_ROUND, min(8, round(0.8 / max(warm_t[m], 0.05)))) for m in modes}
    times = {m: [] for m in modes}
    for rnd in range(BEAM_ROUNDS):
        for m, (lfn, p, blank, kw, _f) in modes.items():
            t0 = time.perf_counter()
            handles = []
            for _ in range(calls[m]):
                lp, fl = lfn(p, audio, lens)
                handles.append(ctc_beam_search_device(
                    lp, fl, beam_width=16, blank_id=blank, return_async=True, **kw))
            done = [h.result() for h in handles]  # fetch + backtrace = full sync
            dt = (time.perf_counter() - t0) / calls[m]
            assert all(int(tl.sum()) >= 0 for _t, tl in done)
            times[m].append(dt)
            log(f"ctc beam16[{m}] round {rnd}: {dt*1000:.0f} ms/batch of {DEC_BATCH}x{SECONDS}s (x{calls[m]})")
    out = {}
    for m, (_lfn, _p, _blank, _kw, flops_per_audio_s) in modes.items():
        rate = median_rate(DEC_BATCH * SECONDS, times[m])
        spread = max(times[m]) / min(times[m])
        log(f"ctc beam16[{m}]: median {rate:.0f} audio-s/s, round spread x{spread:.2f}")
        out[m] = (rate, rate * flops_per_audio_s)
    return out


def bench_sak_infer_e2e():
    """END-TO-END production decode: real wav files in a Kaldi dir ->
    final transcripts through ctc_infer (the sak-infer machinery) — file
    read, resample, auto batch packing, prefetch, encoder, on-device
    word-LM beam, backtrace, tokenizer decode, everything (VERDICT r3 next
    #1; reference corpus decode transformers_infer.py:14 + dataset.py:647).
    wav2vec2-base dims via the seeded-model hook; 12k-word lexicon +
    order-3 ARPA from files, exactly as a user passes them. First pass
    warms the compile caches (production corpora dwarf compile time);
    second pass is timed."""
    import shutil
    import tempfile

    from ssak_tpu.audio.io import save_audio
    from ssak_tpu.decode.lm import train_ngram_lm, write_arpa
    from ssak_tpu.infer.ctc_infer import ctc_infer

    tmp = tempfile.mkdtemp(prefix="ssak_e2e_")
    try:
        rng = np.random.RandomState(0)
        alphabet = "abcdefghijklmnopqrstuvwxyz"
        words = sorted({
            "".join(alphabet[i] for i in rng.randint(0, 26, rng.randint(3, 11)))
            for _ in range(12000)
        })
        lex_path = os.path.join(tmp, "lexicon.txt")
        with open(lex_path, "w") as f:
            f.write("\n".join(words) + "\n")
        lm = train_ngram_lm([" ".join(rng.choice(words, size=8)) for _ in range(2000)], order=3)
        arpa_path = os.path.join(tmp, "lm.arpa")
        write_arpa(lm, arpa_path)

        wav_dir = os.path.join(tmp, "wavs")
        os.makedirs(wav_dir)
        kal = os.path.join(tmp, "kaldi")
        os.makedirs(kal)
        # 768 = 8 exact full auto-packed batches of 96: per-pass fixed cost
        # (model init + trie/hash-table build, ~4 s) amortizes the way a
        # real corpus does, and the timed pass compiles nothing new
        n_files, total_s, paths = 768, 0.0, []
        with open(os.path.join(kal, "wav.scp"), "w") as scp:
            for i in range(n_files):
                dur = float(rng.uniform(6.0, 10.0))
                total_s += dur
                a = (rng.randn(int(dur * SR)) * 0.1).astype(np.float32)
                p = os.path.join(wav_dir, f"utt{i:04d}.wav")
                save_audio(p, a, sample_rate=SR)
                paths.append(p)
                scp.write(f"utt{i:04d} {p}\n")

        def run(source, sort_by_len=False):
            gen = ctc_infer(
                None, source, seeded_test_config="wav2vec2:base", output_ids=True,
                beam_width=16, lm_path=arpa_path, lexicon_path=lex_path,
                sort_by_len=sort_by_len,
            )
            t0 = time.perf_counter()
            first = next(gen)
            t_first = time.perf_counter() - t0
            rest = list(gen)
            return [first] + rest, t_first

        t0 = time.perf_counter()
        out, _tf = run(paths[:96])  # warm: compiles + device table upload
        log(f"sak-infer e2e warm pass: {len(out)} utts in {time.perf_counter()-t0:.1f}s")
        assert len(out) == 96
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            out, t_first = run(kal)
            dt = time.perf_counter() - t0
            times.append(dt)
            log(f"sak-infer e2e pass: {dt:.2f}s total, {t_first:.2f}s to first transcript "
                f"(setup + batch 1), {(total_s - total_s/8)/(dt - t_first):.0f} audio-s/s steady-state")
        log(f"sak-infer e2e: {total_s:.0f} audio-s, per-pass s {['%.2f' % t for t in times]}")
        assert len(out) == n_files

        # ---- ragged-duration realism variant (VERDICT r4 next #7) ------
        # Real Kaldi dirs are ragged; the pow2 width bucketing + samples-
        # budget packing exist for exactly that case but the main corpus
        # (6-10 s) never exercises them. One warm + one timed pass over a
        # 3-28 s log-uniform corpus, with the PACKING EFFICIENCY
        # (real / padded device samples, the reference's sort-by-length
        # batching rationale, dataset.py:278-291) logged for the record.
        rag_dir = os.path.join(tmp, "ragged")
        os.makedirs(rag_dir)
        rkal = os.path.join(tmp, "kaldi_ragged")
        os.makedirs(rkal)
        rag_total, rag_lens = 0.0, []
        with open(os.path.join(rkal, "wav.scp"), "w") as scp:
            for i in range(192):
                dur = float(np.exp(rng.uniform(np.log(3.0), np.log(28.0))))
                rag_total += dur
                a = (rng.randn(int(dur * SR)) * 0.1).astype(np.float32)
                p = os.path.join(rag_dir, f"rag{i:04d}.wav")
                save_audio(p, a, sample_rate=SR)
                rag_lens.append(int(dur * SR))
                scp.write(f"rag{i:04d} {p}\n")

        def packing_ratio(lens_order):
            """Real/padded samples under the PRODUCTION packer and padding
            arithmetic (auto_pack_batches + padded_batch_shape — no
            duplicated formula that could drift from the packer)."""
            from ssak_tpu.infer.ctc_infer import auto_pack_batches, padded_batch_shape

            padded = 0
            for batch, _ids in auto_pack_batches(((np.empty(n), i) for i, n in enumerate(lens_order))):
                W, pad_to = padded_batch_shape([len(a) for a in batch], sample_rate=SR)
                padded += W * pad_to
            return sum(lens_order) / padded

        log(f"sak-infer e2e ragged: packing efficiency {packing_ratio(rag_lens):.2f} unsorted, "
            f"{packing_ratio(sorted(rag_lens)):.2f} sorted-by-length "
            f"(uniform main corpus: ~{packing_ratio([int(rng.uniform(6, 10) * SR) for _ in range(768)]):.2f})")
        for sort_flag in (False, True):
            tag = "sorted" if sort_flag else "unsorted"
            t0 = time.perf_counter()
            rout, _ = run(rkal, sort_by_len=sort_flag)  # warm: new (bucket, rows) programs
            log(f"sak-infer e2e ragged[{tag}] warm pass: {len(rout)} utts in {time.perf_counter()-t0:.1f}s")
            t0 = time.perf_counter()
            rout, rt_first = run(rkal, sort_by_len=sort_flag)
            rdt = time.perf_counter() - t0
            assert len(rout) == 192
            log(f"sak-infer e2e ragged[{tag}] pass: {rag_total:.0f} audio-s in {rdt:.2f}s = "
                f"{rag_total/rdt:.0f} audio-s/s ({rt_first:.2f}s to first)")

        return median_rate(total_s, times), None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_sak_whisper_e2e():
    """END-TO-END Whisper corpus decode: real 30 s wav files -> transcripts
    through whisper_infer (the sak-infer machinery for Whisper) at
    large-v3 dims — ingest, int16 wire, auto window batch (24), pipelined
    greedy decode, tokenizer tail. The measured answer to 'does the CLI
    reach the greedy bench line' (VERDICT r3 weak #2/#6)."""
    import shutil
    import tempfile

    from ssak_tpu.audio.io import save_audio
    from ssak_tpu.infer.whisper_infer import whisper_infer

    tmp = tempfile.mkdtemp(prefix="ssak_we2e_")
    try:
        rng = np.random.RandomState(0)
        wav_dir = os.path.join(tmp, "wavs")
        os.makedirs(wav_dir)
        kal = os.path.join(tmp, "kaldi")
        os.makedirs(kal)
        # 96 = 4 exact window batches of 24; ~29 s per file keeps every
        # utterance in the single-window (short) decode path
        n_files, paths, total_s = 96, [], 0.0
        with open(os.path.join(kal, "wav.scp"), "w") as scp:
            for i in range(n_files):
                dur = 29.0
                total_s += dur
                a = (rng.randn(int(dur * SR)) * 0.1).astype(np.float32)
                p = os.path.join(wav_dir, f"utt{i:04d}.wav")
                save_audio(p, a, sample_rate=SR)
                paths.append(p)
                scp.write(f"utt{i:04d} {p}\n")

        def run(source):
            # max_tokens matches the device greedy line (W_DEC_TOKENS): the
            # random seeded model never emits EOT, so an uncapped budget
            # would measure 224-token decodes against a 64-token bench
            gen = whisper_infer(None, source, seeded_test_config="whisper:large-v3",
                                output_ids=True, max_tokens=W_DEC_TOKENS)
            t0 = time.perf_counter()
            first = next(gen)
            t_first = time.perf_counter() - t0
            rest = list(gen)
            return [first] + rest, t_first

        t0 = time.perf_counter()
        out, _tf = run(paths[:24])  # warm: large-v3 window program compile
        log(f"sak-whisper e2e warm pass: {len(out)} utts in {time.perf_counter()-t0:.1f}s")
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            out, t_first = run(kal)
            dt = time.perf_counter() - t0
            times.append(dt)
            log(f"sak-whisper e2e pass: {dt:.2f}s total, {t_first:.2f}s to first "
                f"(setup + batch 1), {(total_s - total_s/4)/(max(dt - t_first, 1e-9)):.0f} audio-s/s steady-state")
        assert len(out) == n_files
        log(f"sak-whisper e2e: {total_s:.0f} audio-s, per-pass s {['%.2f' % t for t in times]}")
        return median_rate(total_s, times), None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


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
    times = []
    for _ in range(TIMED_CALLS):
        t0 = time.perf_counter()
        state, loss = train_n(state, batch)
        lv = float(loss)
        times.append(time.perf_counter() - t0)
    log(f"conformer train: per-call s {['%.2f' % t for t in times]}, final loss={lv:.3f}")
    audio_s_per_s = median_rate(BATCH * SECONDS * N_INNER, times)
    return audio_s_per_s, audio_s_per_s * conformer_train_flops_per_audio_second(cfg)


def bench_sak_train_e2e():
    """END-TO-END CTC training: real wav files in a Kaldi dir -> GRADIENTS
    through the production CTCTrainer — manifest parse, bucketed batching,
    label encode (pow2 widths), on-device SpecAugment, int16 wire h2d,
    prefetch-threaded ingest, donated train step — at the headline config
    (wav2vec2-base dims, batch 32 x 10 s bucket). The decode CLI's r4
    bench-to-product treatment applied to training (VERDICT r4 weak #1 /
    next #1): the headline 1677 line is measured with the batch resident
    on device; THIS line streams a fresh batch per step, exactly as
    sak-train does (reference wav2vec_train.py:415 hot loop +
    utils/dataset.py:498 feeding pipeline). Warm pass compiles; each timed
    pass is one epoch over the corpus."""
    import shutil
    import tempfile

    import jax

    from ssak_tpu.audio.io import save_audio
    from ssak_tpu.data.dataset import kaldi_folder_to_manifest
    from ssak_tpu.models import wav2vec2
    from ssak_tpu.models.tokenizer import CTCTokenizer
    from ssak_tpu.train.loop import CTCTrainer
    from ssak_tpu.utils.flops import wav2vec2_train_flops_per_audio_second

    tmp = tempfile.mkdtemp(prefix="ssak_te2e_")
    try:
        rng = np.random.RandomState(0)
        wav_dir = os.path.join(tmp, "wavs")
        os.makedirs(wav_dir)
        kal = os.path.join(tmp, "kaldi")
        os.makedirs(kal)
        alphabet = "abcdefghijklmnopqrstuvwxyz"
        words = ["".join(alphabet[i] for i in rng.randint(0, 26, 6)) for _ in range(400)]
        # 256 files = 8 batches of 32: per-pass fixed cost amortizes and
        # the prefetch thread gets real lead; 9-10 s durations all land in
        # the 10 s bucket (the headline shape). Fixed 12-word texts keep
        # every batch in ONE pow2 label width (no mid-timing compiles).
        n_files, total_s = 256, 0.0
        with open(os.path.join(kal, "wav.scp"), "w") as scp, \
             open(os.path.join(kal, "text"), "w", encoding="utf-8") as txt:
            for i in range(n_files):
                dur = float(rng.uniform(9.0, 10.0))
                total_s += dur
                a = (rng.randn(int(dur * SR)) * 0.1).astype(np.float32)
                p = os.path.join(wav_dir, f"utt{i:04d}.wav")
                save_audio(p, a, sample_rate=SR)
                scp.write(f"utt{i:04d} {p}\n")
                txt.write(f"utt{i:04d} " + " ".join(rng.choice(words, size=12)) + "\n")

        _meta, rows = kaldi_folder_to_manifest(kal)
        assert len(rows) == n_files
        tok = CTCTokenizer.from_corpus([r["text"] for r in rows])
        cfg = wav2vec2.make_config("base", vocab_size=48)
        params = wav2vec2.init_params(jax.random.PRNGKey(0), cfg)
        trainer = CTCTrainer(
            cfg, params, tok, output_dir=os.path.join(tmp, "run"),
            batch_size=BATCH, total_steps=10**9, eval_steps=0,
            buckets=(10.0,), seed=0,
        )

        def run_pass(pass_rows):
            n_batches = (len(pass_rows) + BATCH - 1) // BATCH
            gcur = int(np.asarray(trainer.state["step"]))
            t0 = time.perf_counter()
            trainer.train(pass_rows, eval_rows=None, max_steps=gcur + n_batches,
                          log_interval=10**9, final_save=False)
            # the non-blocking loop ENQUEUES steps and only syncs at log
            # points; fetch the step counter VALUE so the clock stops when
            # the last step has actually executed (CLAUDE.md: a value
            # fetch is the only true synchronization on this runtime)
            assert int(np.asarray(trainer.state["step"])) == gcur + n_batches
            return time.perf_counter() - t0

        dt = run_pass(rows[:BATCH])  # warm: compiles the (32, 160k) step
        log(f"sak-train e2e warm pass: {dt:.1f}s")
        times = []
        for _ in range(2):
            dt = run_pass(rows)
            times.append(dt)
            log(f"sak-train e2e pass: {dt:.2f}s for {total_s:.0f} audio-s "
                f"({total_s/dt:.0f} audio-s/s files->gradients)")
        rate = median_rate(total_s, times)
        return rate, rate * wav2vec2_train_flops_per_audio_second(cfg)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_sak_whisper_train_e2e():
    """END-TO-END Whisper LoRA fine-tune at large-v3 dims: real ~30 s wav
    files -> ADAPTER GRADIENTS through the whisper_loop machinery — the
    WhisperBatcher (file ingest, int16 wire, on-device mel, teacher-forced
    token tensors), prefetch thread, and the partitioned donated step —
    the files->gradients line for the second trainer product path
    (VERDICT r4 next #6; reference train/transformers/whisper_train.py).
    The batcher+step pair is constructed ONCE (train_whisper's own inner
    loop, lines it executes verbatim) so timed passes reuse the compiled
    step the way a real run's steps 2..N do."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp
    import optax

    from ssak_tpu.audio.io import save_audio
    from ssak_tpu.data.prefetch import prefetch_iterator
    from ssak_tpu.models import whisper
    from ssak_tpu.models.lora import add_lora
    from ssak_tpu.train.steps import init_train_state, make_whisper_train_step
    from ssak_tpu.train.whisper_loop import WhisperBatcher

    tmp = tempfile.mkdtemp(prefix="ssak_wte2e_")
    try:
        rng = np.random.RandomState(0)
        wav_dir = os.path.join(tmp, "wavs")
        os.makedirs(wav_dir)
        # 32 files = 8 batches of 4 (the headline LoRA batch)
        n_files, total_s, rows = 32, 0.0, []
        for i in range(n_files):
            dur = 29.5
            total_s += dur
            a = (rng.randn(int(dur * SR)) * 0.1).astype(np.float32)
            p = os.path.join(wav_dir, f"utt{i:04d}.wav")
            save_audio(p, a, sample_rate=SR)
            rows.append({"id": f"utt{i:04d}", "audio": p,
                         "text": "lorem ipsum dolor sit amet " * 8})

        cfg = whisper.make_config("large-v3", remat=True)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), whisper.init_params(jax.random.PRNGKey(0), cfg))
        params = add_lora(params, rank=16, key=jax.random.PRNGKey(1))
        opt = optax.adamw(1e-4)
        step_fn = make_whisper_train_step(cfg, opt, quantized=True)  # partitioned: LoRA trains
        state = init_train_state(params, opt, quantized=True)
        # U = 224 teacher-forced tokens, matching the device-only headline
        batcher = WhisperBatcher(cfg, None, batch_size=W_BATCH, max_tokens=W_TOKENS - 3)

        def run_pass(pass_rows):
            nonlocal state
            t0 = time.perf_counter()
            metrics = None
            for batch, _chunk in prefetch_iterator(batcher.batches(pass_rows)):
                state, metrics = step_fn(state, batch)
            lv = float(metrics["loss"])  # value fetch = true sync
            assert np.isfinite(lv)
            return time.perf_counter() - t0

        dt = run_pass(rows[:W_BATCH])  # warm: the multi-minute large-v3 compile
        log(f"sak-whisper-train e2e warm pass: {dt:.1f}s")
        times = []
        for _ in range(2):
            dt = run_pass(rows)
            times.append(dt)
            log(f"sak-whisper-train e2e pass: {dt:.2f}s for {total_s:.0f} audio-s "
                f"({total_s/dt:.0f} audio-s/s files->gradients)")
        return median_rate(total_s, times), None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


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


def main(argv=None):
    import argparse
    import gc

    import jax

    SECTIONS = (
        "whisper_lora_train", "sak_whisper_train_e2e", "whisper_decode",
        "whisper_int8_decode", "whisper_int4_decode", "whisper_accurate",
        "ctc_beam_all", "sak_infer_e2e", "sak_whisper_e2e", "sak_train_e2e",
        "ctc_train_large", "conformer_train", "ctc_train_headline",
    )
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None,
                   help="comma-separated section names to run (default: all); one of: " + ", ".join(SECTIONS))
    args = p.parse_args(argv)
    only = set(args.only.split(",")) if args.only else None
    if only:
        unknown = only - set(SECTIONS)
        if unknown:
            # a typo or a removed section must not exit 0 with zero lines
            raise SystemExit(f"unknown bench section(s): {sorted(unknown)}; known: {list(SECTIONS)}")

    log(f"jax devices: {jax.devices()}")

    def emit(rec):
        # print IMMEDIATELY: a section crash (e.g. an OOM on a fragmented
        # HBM) must not lose the lines already measured
        print(json.dumps(rec), flush=True)

    def run_section(name, fn, metric):
        if only is not None and name not in only:
            return
        # drop compiled executables + dead buffers between sections:
        # each section warms its own programs, and the big-model sections
        # fragment HBM for their successors otherwise (measured: the
        # whisper LoRA e2e OOMed after the int8/int4/accurate sections
        # but runs fine standalone)
        gc.collect()
        jax.clear_caches()
        ensure_healthy(name)
        try:
            value, flops_per_s = fn()
            emit(_line(metric, value, "audio_seconds/s/chip", flops_per_s))
        except Exception as e:
            log(f"{name} failed: {type(e).__name__}: {e}")

    for name, fn, metric in (
        ("whisper_lora_train", bench_whisper_lora_train, "whisper_large3_lora_train_audio_s_per_s"),
        # same memory profile as the LoRA train section; runs BEFORE the
        # decode sections fragment HBM
        ("sak_whisper_train_e2e", bench_sak_whisper_train_e2e, "sak_whisper_train_e2e_audio_s_per_s"),
        ("whisper_decode", bench_whisper_decode, "whisper_large3_greedy_decode_audio_s_per_s"),
        ("whisper_int8_decode", partial(bench_whisper_decode, bits=8), "whisper_large3_int8_decode_audio_s_per_s"),
        ("whisper_int4_decode", partial(bench_whisper_decode, bits=4), "whisper_large3_int4_decode_audio_s_per_s"),
        ("whisper_accurate", bench_whisper_accurate, "whisper_large3_accurate_decode_audio_s_per_s"),
    ):
        run_section(name, fn, metric)

    # CTC beam quartet (incl. conformer): one setup, interleaved measurement
    if only is None or "ctc_beam_all" in only:
        gc.collect()
        jax.clear_caches()
        ensure_healthy("ctc_beam_all")
        try:
            beam = bench_ctc_beam_all()
            for m, metric in (("plain", "ctc_beam16_decode_audio_s_per_s"),
                              ("lexicon", "ctc_beam16_lexicon_decode_audio_s_per_s"),
                              ("wordlm", "ctc_beam16_wordlm_decode_audio_s_per_s"),
                              ("conformer", "conformer_beam16_decode_audio_s_per_s")):
                value, flops_per_s = beam[m]
                emit(_line(metric, value, "audio_seconds/s/chip", flops_per_s))
        except Exception as e:
            log(f"ctc_beam_all failed: {type(e).__name__}: {e}")

    for name, fn, metric in (
        ("sak_infer_e2e", bench_sak_infer_e2e, "sak_infer_e2e_audio_s_per_s"),
        ("sak_whisper_e2e", bench_sak_whisper_e2e, "sak_whisper_e2e_audio_s_per_s"),
        ("sak_train_e2e", bench_sak_train_e2e, "sak_train_e2e_audio_s_per_s"),
        ("ctc_train_large", partial(bench_ctc_train, preset="large", batch=16), "ctc_train_large_audio_s_per_s"),
        ("conformer_train", bench_conformer_train, "conformer_train_audio_s_per_s"),
    ):
        run_section(name, fn, metric)

    if only is None or "ctc_train_headline" in only:
        gc.collect()
        jax.clear_caches()
        ensure_healthy("ctc_train_headline")
        value, flops_per_s = bench_ctc_train()
        try:
            baseline = bench_torch_cpu_baseline()
        except Exception as e:
            log(f"baseline measurement failed: {e}")
            baseline = None
        vs = round(value / baseline, 3) if baseline else None
        emit(_line("ctc_train_audio_s_per_s", value, "audio_seconds/s/chip", flops_per_s, vs))


if __name__ == "__main__":
    main()
