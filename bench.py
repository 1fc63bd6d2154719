"""Benchmark: wav2vec2-base CTC fine-tune throughput (fwd+bwd+AdamW).

Prints ONE JSON line:
  {"metric": "ctc_train_audio_s_per_s", "value": N, "unit": "audio_seconds/s/chip", "vs_baseline": N}

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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_jax():
    import jax
    import jax.numpy as jnp
    import optax

    from ssak_tpu.models import wav2vec2
    from ssak_tpu.ops.ctc_pallas import ctc_loss_fast as ctc_loss
    from ssak_tpu.train.steps import init_train_state, make_optimizer

    cfg = wav2vec2.make_config("base", vocab_size=48)
    params = wav2vec2.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(total_steps=1000)
    state = init_train_state(params, opt)

    rng = np.random.RandomState(0)
    T = SECONDS * SR
    batch = {
        "audio": jnp.asarray(rng.randn(BATCH, T).astype(np.float32) * 0.1),
        "audio_lengths": jnp.full((BATCH,), T, jnp.int32),
        "labels": jnp.asarray(rng.randint(1, 48, (BATCH, LABEL_LEN)), jnp.int32),
        "label_lengths": jnp.full((BATCH,), LABEL_LEN, jnp.int32),
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

    log(f"jax devices: {jax.devices()}")
    state, loss = train_n(state, batch)  # compile + warmup
    loss0 = float(loss)
    assert np.isfinite(loss0) and loss0 > 0, f"degenerate warmup loss: {loss0}"
    log(f"warmup: loss={loss0:.4f}")
    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        state, loss = train_n(state, batch)
        lv = float(loss)  # value fetch = true synchronization
    dt = time.perf_counter() - t0
    steps = N_INNER * TIMED_CALLS
    log(f"jax: {steps} steps in {dt:.2f}s ({dt/steps*1000:.1f} ms/step), final loss={lv:.3f}")
    assert np.isfinite(lv)
    return BATCH * SECONDS * steps / dt


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
