"""Benchmark: wav2vec2-base CTC fine-tune step (fwd+bwd+Adam) throughput.

Prints ONE JSON line:
  {"metric": "ctc_train_audio_s_per_s", "value": N, "unit": "audio_seconds/s/chip", "vs_baseline": N}

vs_baseline compares against the reference stack's runnable equivalent on
this host: a torch (HF Wav2Vec2ForCTC, CPU) fwd+bwd step on identical
shapes, measured once and cached in bench_baseline.json. The reference
publishes no benchmark numbers (BASELINE.md), so the PyTorch comparison is
measured, not quoted.
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

BATCH = 8
SECONDS = 10
SR = 16000
LABEL_LEN = 48
WARMUP = 3
STEPS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_jax():
    import jax
    import jax.numpy as jnp

    from ssak_tpu.models import wav2vec2
    from ssak_tpu.train.steps import init_train_state, make_ctc_train_step, make_optimizer

    cfg = wav2vec2.make_config("base", vocab_size=48)
    params = wav2vec2.init_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(total_steps=1000)
    state = init_train_state(params, optimizer)
    step_fn = make_ctc_train_step(cfg, optimizer)

    rng = np.random.RandomState(0)
    T = SECONDS * SR
    batch = {
        "audio": jnp.asarray(rng.randn(BATCH, T).astype(np.float32) * 0.1),
        "audio_lengths": jnp.full((BATCH,), T, jnp.int32),
        "labels": jnp.asarray(rng.randint(1, 48, (BATCH, LABEL_LEN)), jnp.int32),
        "label_lengths": jnp.full((BATCH,), LABEL_LEN, jnp.int32),
    }
    log(f"jax devices: {jax.devices()}")
    for i in range(WARMUP):
        state, metrics = step_fn(state, batch)
        log(f"warmup {i}: loss={float(metrics['loss']):.4f} gnorm={float(metrics['grad_norm']):.4f}")
    loss0 = float(metrics["loss"])
    assert np.isfinite(loss0) and loss0 > 0, f"degenerate warmup loss: {loss0}"
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    audio_s = BATCH * SECONDS * STEPS
    log(f"jax: {STEPS} steps in {dt:.2f}s, loss={float(metrics['loss']):.3f}")
    return audio_s / dt


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
    x = torch.randn(BATCH, T) * 0.1
    labels = torch.randint(1, 48, (BATCH, LABEL_LEN))
    steps = 2
    # warmup
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
    value = BATCH * SECONDS * steps / dt
    with open(cache, "w") as f:
        json.dump({"ctc_train_audio_s_per_s_torch_cpu": value, "note": "HF Wav2Vec2ForCTC base, torch CPU, same shapes"}, f, indent=1)
    log(f"torch cpu baseline: {value:.2f} audio_s/s")
    return value


def main():
    value = bench_jax()
    try:
        baseline = bench_torch_cpu_baseline()
    except Exception as e:
        log(f"baseline measurement failed: {e}")
        baseline = None
    vs = round(value / baseline, 3) if baseline else None
    print(json.dumps({
        "metric": "ctc_train_audio_s_per_s",
        "value": round(value, 2),
        "unit": "audio_seconds/s/chip",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
