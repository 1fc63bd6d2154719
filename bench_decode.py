"""Inference benchmarks (not run by the driver — supplementary evidence):
wav2vec2-base CTC greedy and on-device beam decode throughput per chip.

    python bench_decode.py
prints one JSON line per configuration.
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

BATCH = 32
SECONDS = 10
SR = 16000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from ssak_tpu.decode.ctc_beam import ctc_beam_search_device
    from ssak_tpu.models import wav2vec2
    from ssak_tpu.ops.ctc import ctc_greedy_decode

    cfg = wav2vec2.make_config("base", vocab_size=48)
    params = wav2vec2.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    T = SECONDS * SR
    audio = jnp.asarray(rng.randn(BATCH, T).astype(np.float32) * 0.1)
    lens = jnp.full((BATCH,), T, jnp.int32)

    @jax.jit
    def greedy(params, audio, lens):
        lp, fl = wav2vec2.ctc_log_probs(params, audio, cfg, lens)
        toks, tl = ctc_greedy_decode(lp, fl, blank_id=cfg.blank_id)
        return toks, tl

    toks, tl = greedy(params, audio, lens)
    int(np.asarray(tl)[0])
    t0 = time.perf_counter()
    calls = 10
    for _ in range(calls):
        toks, tl = greedy(params, audio, lens)
    v = int(np.asarray(tl).sum())  # value fetch = sync
    dt = time.perf_counter() - t0
    greedy_tp = BATCH * SECONDS * calls / dt
    log(f"greedy: {dt/calls*1000:.1f} ms/batch")
    print(json.dumps({"metric": "ctc_greedy_decode_audio_s_per_s", "value": round(greedy_tp, 1), "unit": "audio_seconds/s/chip"}))

    # on-device beam (logits on device; backtrace host-side)
    @jax.jit
    def logits_fn(params, audio, lens):
        return wav2vec2.ctc_log_probs(params, audio, cfg, lens)

    lp, fl = logits_fn(params, audio, lens)
    ctc_beam_search_device(lp, fl, beam_width=16, blank_id=cfg.blank_id)  # warm
    t0 = time.perf_counter()
    calls = 3
    for _ in range(calls):
        lp, fl = logits_fn(params, audio, lens)
        toks, tl = ctc_beam_search_device(lp, fl, beam_width=16, blank_id=cfg.blank_id)
    dt = time.perf_counter() - t0
    beam_tp = BATCH * SECONDS * calls / dt
    log(f"beam16: {dt/calls*1000:.1f} ms/batch")
    print(json.dumps({"metric": "ctc_beam16_decode_audio_s_per_s", "value": round(beam_tp, 1), "unit": "audio_seconds/s/chip"}))


if __name__ == "__main__":
    main()
