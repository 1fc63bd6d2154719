"""Weight-only int8/int4 quantization (models.quant): kernel roundtrip
accuracy, transparent dense() consumption, whole-model decode parity, and
QLoRA-style training (quantized frozen base + LoRA adapters) — the
reference's load_in_8bit/load_in_4bit + PEFT capability
(ssak/train/transformers/whisper_train.py:374-407)."""

import numpy as np
import jax
import jax.numpy as jnp

from ssak_tpu.models.quant import (
    dequantize_kernel,
    dequantize_params,
    merge_partition,
    partition_trainable,
    quantize_kernel,
    quantize_params,
    quantized_bytes,
)


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(a).max() + 1e-9)


class TestKernelRoundtrip:
    def test_int8_per_channel(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(256, 192)).astype(np.float32)
        w[:, 7] *= 50.0  # outlier column must not hurt other columns
        qd = quantize_kernel(w, bits=8)
        assert qd["q8"].dtype == np.int8 and qd["q8"].shape == w.shape
        back = np.asarray(dequantize_kernel(qd, jnp.float32))
        assert _rel_err(w, back) < 1e-2
        # per-column: outlier column's scale doesn't leak
        assert np.abs(w[:, 0] - back[:, 0]).max() < np.abs(w[:, 0]).max() * 0.02

    def test_int4_blockwise_packing(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(256, 64)).astype(np.float32)
        qd = quantize_kernel(w, bits=4, block=64)
        assert qd["q4"].shape == (128, 64)  # two rows per byte
        back = np.asarray(dequantize_kernel(qd, jnp.float32))
        assert back.shape == w.shape
        # 4-bit blockwise: coarse but bounded (max grid error = scale/2,
        # scale = blockmax/7)
        blocks = np.abs(w.reshape(4, 64, 64)).max(axis=1, keepdims=True)
        err = np.abs(w - back).reshape(4, 64, 64)
        assert np.all(err <= blocks / 7.0 * 0.51 + 1e-6)

    def test_int4_odd_block_fallback(self):
        w = np.random.default_rng(2).normal(size=(100, 32)).astype(np.float32)
        qd = quantize_kernel(w, bits=4, block=64)  # 64 ∤ 100 → halves to 4
        back = np.asarray(dequantize_kernel(qd, jnp.float32))
        assert back.shape == w.shape
        assert _rel_err(w, back) < 0.2

    def test_dense_transparent(self):
        from ssak_tpu.models.layers import dense

        rng = np.random.default_rng(3)
        w = rng.normal(size=(128, 96)).astype(np.float32) * 0.05
        b = rng.normal(size=(96,)).astype(np.float32) * 0.01
        x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
        dense_out = dense(x, {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)})
        q_out = dense(x, {"kernel": quantize_kernel(w, bits=8), "bias": jnp.asarray(b)})
        assert _rel_err(dense_out, q_out) < 2e-2


class TestModelQuant:
    def _tiny_whisper(self):
        from ssak_tpu.models import whisper

        cfg = whisper.make_config("tiny_test")
        params = whisper.init_params(jax.random.PRNGKey(0), cfg)
        return params, cfg

    def test_quantized_logits_close(self):
        from ssak_tpu.models import whisper

        params, cfg = self._tiny_whisper()
        qparams = quantize_params(params, bits=8, min_size=16)
        qb, db = quantized_bytes(qparams)
        assert qb > 0 and db == 2 * qb  # int8: half of bf16
        mel = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.n_mels, 2 * cfg.n_audio_ctx)) * 0.1
        toks = jnp.zeros((1, 8), jnp.int32)

        def logits(p):
            return whisper.decode_train(p, toks, whisper.encode(p, mel, cfg), cfg)

        l_dense = np.asarray(logits(params), np.float32)
        l_quant = np.asarray(logits(qparams), np.float32)
        # same argmax token at nearly every position is the behavioural bar
        agree = (l_dense.argmax(-1) == l_quant.argmax(-1)).mean()
        assert agree >= 0.8, agree

    def test_dequantize_params_roundtrip_structure(self):
        params, _ = self._tiny_whisper()
        q = quantize_params(params, bits=4, min_size=16)
        back = dequantize_params(q)
        flat_p = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(back)
        assert len(flat_p) == len(flat_b)
        assert all(np.asarray(a).shape == np.asarray(b).shape for a, b in zip(flat_p, flat_b))

    def test_partition_merge_identity(self):
        from ssak_tpu.models.lora import add_lora

        params, _ = self._tiny_whisper()
        params = add_lora(params, rank=2)
        q = quantize_params(params, bits=8, min_size=16)
        t, f = partition_trainable(q)
        merged = merge_partition(t, f)
        for (pa, la), (pb, lb) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(q), key=str),
            sorted(jax.tree_util.tree_leaves_with_path(merged), key=str),
        ):
            assert str(pa) == str(pb)
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        # with LoRA present, only lora_A/lora_B are trainable
        names = [str(p[-1]) for p, _ in jax.tree_util.tree_leaves_with_path(t)]
        assert names and all("lora" in n for n in names)


class TestQLoRATraining:
    def test_quantized_lora_step_trains(self):
        from ssak_tpu.models import whisper
        from ssak_tpu.models.lora import add_lora
        from ssak_tpu.train.steps import init_train_state, make_optimizer, make_whisper_train_step

        cfg = whisper.make_config("tiny_test")
        params = whisper.init_params(jax.random.PRNGKey(0), cfg)
        params = add_lora(params, rank=2, key=jax.random.PRNGKey(1))
        params = quantize_params(params, bits=8, min_size=16)
        base_snapshot = {
            "/".join(str(x) for x in p): np.asarray(l).copy()
            for p, l in jax.tree_util.tree_leaves_with_path(params)
            if np.asarray(l).dtype == np.int8
        }
        opt = make_optimizer(learning_rate=3e-2, warmup_steps=0, total_steps=20)
        state = init_train_state(params, opt, quantized=True)
        step = make_whisper_train_step(cfg, opt, quantized=True)
        batch = {
            "mel": jax.random.normal(jax.random.PRNGKey(2), (2, cfg.n_mels, 2 * cfg.n_audio_ctx)) * 0.1,
            "tokens_in": jnp.zeros((2, 8), jnp.int32),
            "tokens_out": jnp.ones((2, 8), jnp.int32),
            "token_mask": jnp.ones((2, 8), jnp.float32),
        }
        losses = []
        for _ in range(6):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses  # LoRA leaves learn
        # frozen int8 base untouched by the optimizer
        for p, l in jax.tree_util.tree_leaves_with_path(state["params"]):
            if np.asarray(l).dtype == np.int8:
                np.testing.assert_array_equal(np.asarray(l), base_snapshot["/".join(str(x) for x in p)])

    def test_ctc_infer_cli_8bit(self, tmp_path):
        """--load_in_8bit end-to-end through the CTC infer path (seeded model)."""
        from ssak_tpu.infer.ctc_infer import ctc_infer

        sr = 16000
        audio = (np.sin(2 * np.pi * 440 * np.arange(sr) / sr) * 0.1).astype(np.float32)
        outs = list(ctc_infer(None, [audio], seeded_test_config="wav2vec2", quantize_bits=8))
        assert len(outs) == 1 and isinstance(outs[0], str)

    def test_whisper_infer_8bit_sets_kv_int8_and_matches_bf16(self):
        """--load_in_8bit Whisper decode: int8 weights AND int8 KV caches
        (load_model flips cfg.kv_int8) must reproduce the full-precision
        transcripts on the seeded model (VERDICT r2 next #1 wiring)."""
        from ssak_tpu.infer.general import load_model
        from ssak_tpu.infer.whisper_infer import whisper_transcribe_batch

        sr = 16000
        rng = np.random.RandomState(0)
        audios = [
            (np.sin(2 * np.pi * 330 * np.arange(sr) / sr) * 0.1).astype(np.float32),
            (rng.randn(sr) * 0.05).astype(np.float32),
        ]
        m16 = load_model(None, seeded_test_config="whisper")
        m8 = load_model(None, seeded_test_config="whisper", quantize_bits=8)
        assert m8.cfg.kv_int8 and not m16.cfg.kv_int8
        assert any(np.asarray(l).dtype == np.int8 for l in jax.tree_util.tree_leaves(m8.params))
        t16 = whisper_transcribe_batch(m16, audios, max_tokens=8)
        t8 = whisper_transcribe_batch(m8, audios, max_tokens=8)
        same = sum(a == b for a, b in zip(t16, t8))
        assert same >= 1, (t16, t8)  # int8 noise may flip a marginal token

    def test_whisper_infer_4bit_sets_kv_int8_and_matches_bf16(self):
        """--load_in_4bit Whisper decode: blockwise int4 weights AND int8 KV
        caches (load_model flips cfg.kv_int8 for int4 too — the KV bytes,
        not the weights, bound the decode batch at large dims). Transcripts
        must track full precision on the seeded model; the fused TPU kernel
        path is pinned kernel-exact separately
        (test_ops_pallas.test_int4_matmul_interpret_parity + on-chip run,
        PERF.md 'int4 decode')."""
        from ssak_tpu.infer.general import load_model
        from ssak_tpu.infer.whisper_infer import whisper_transcribe_batch

        sr = 16000
        rng = np.random.RandomState(0)
        audios = [
            (np.sin(2 * np.pi * 330 * np.arange(sr) / sr) * 0.1).astype(np.float32),
            (rng.randn(sr) * 0.05).astype(np.float32),
        ]
        m16 = load_model(None, seeded_test_config="whisper")
        m4 = load_model(None, seeded_test_config="whisper", quantize_bits=4)
        assert m4.cfg.kv_int8 and not m16.cfg.kv_int8
        leaves = jax.tree_util.tree_leaves(m4.params)
        assert any(np.asarray(l).dtype == np.int8 for l in leaves)
        # transcript equality is ill-posed on a RANDOM model at 4 bits
        # (near-uniform logits: any quantizer flips ties; real checkpoints
        # decode confidently) — pin logit FIDELITY instead: teacher-forced
        # int4 logits must track full precision (measured 0.982 on the
        # seeded model — random full-range weights are blockwise-int4's
        # worst case; a broken dispatch/kernel correlates near 0)
        from ssak_tpu.models import whisper as W
        from ssak_tpu.ops.logmel import log_mel_spectrogram

        mel = log_mel_spectrogram(jnp.asarray(np.stack([
            np.pad(a, (0, m16.cfg.n_audio_ctx * 2 * 160 - len(a))) for a in audios
        ])), n_mels=m16.cfg.n_mels)
        toks = jnp.asarray([[m16.cfg.sot, 7, 23]] * 2, jnp.int32)
        l16 = np.asarray(W.decode_train(m16.params, toks, W.encode(m16.params, mel, m16.cfg), m16.cfg), np.float32)
        l4 = np.asarray(W.decode_train(m4.params, toks, W.encode(m4.params, mel, m4.cfg), m4.cfg), np.float32)
        c = np.corrcoef(l16.ravel(), l4.ravel())[0, 1]
        assert c > 0.97, c
        # and the full int4 decode path executes end-to-end
        t4 = whisper_transcribe_batch(m4, audios, max_tokens=8)
        assert len(t4) == 2 and all(isinstance(t, str) for t in t4)
