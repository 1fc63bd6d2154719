"""HF checkpoint import parity: build tiny HF torch models locally, save
them in HF format, import with ssak_tpu.models.hf_loader, and compare
forward outputs against the torch reference to float tolerance.

This validates the whole model stack (conv semantics, norms, attention,
positional embeddings, key mapping) against the implementations the
reference toolkit wraps — without network access.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_hf_wav2vec2(tmp_path_factory):
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    d = tmp_path_factory.mktemp("hf_w2v")
    cfg = Wav2Vec2Config(
        vocab_size=32,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        conv_dim=(32, 32, 32),
        conv_kernel=(10, 8, 8),
        conv_stride=(5, 8, 8),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2,
        do_stable_layer_norm=False,
        conv_bias=False,
        num_feat_extract_layers=3,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, final_dropout=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    model = Wav2Vec2ForCTC(cfg).eval()
    model.save_pretrained(str(d))
    return str(d), model


@pytest.fixture(scope="module")
def tiny_hf_whisper(tmp_path_factory):
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    d = tmp_path_factory.mktemp("hf_whisper")
    cfg = WhisperConfig(
        vocab_size=128,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        max_source_positions=100,
        max_target_positions=32,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        decoder_start_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(cfg).eval()
    model.save_pretrained(str(d))
    return str(d), model


class TestWav2Vec2Parity:
    def test_logits_match_torch(self, tiny_hf_wav2vec2):
        model_dir, tmodel = tiny_hf_wav2vec2
        from ssak_tpu.models import wav2vec2
        from ssak_tpu.models.hf_loader import load_wav2vec2

        params, cfg = load_wav2vec2(model_dir)
        assert cfg.hidden_size == 64 and cfg.num_layers == 2
        rng = np.random.RandomState(0)
        x = rng.randn(2, 3200).astype(np.float32) * 0.1
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x)).logits.numpy()
        cfg32 = wav2vec2.Wav2Vec2Config(**{**cfg.__dict__, "dtype": "float32"})
        ours, fl = wav2vec2.ctc_logits(params, jnp.asarray(x), cfg32)
        ours = np.asarray(ours)
        assert ours.shape == ref.shape
        err = np.abs(ours - ref).max()
        assert err < 5e-3, f"wav2vec2 logits mismatch: {err}"

    def test_stable_layer_norm_variant(self, tmp_path):
        from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

        from ssak_tpu.models import wav2vec2
        from ssak_tpu.models.hf_loader import load_wav2vec2

        cfg_t = Wav2Vec2Config(
            vocab_size=32, hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=128, conv_dim=(32, 32), conv_kernel=(10, 8), conv_stride=(5, 8),
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
            do_stable_layer_norm=True, conv_bias=True, feat_extract_norm="layer",
            num_feat_extract_layers=2,
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            feat_proj_dropout=0.0, layerdrop=0.0, final_dropout=0.0, apply_spec_augment=False,
        )
        torch.manual_seed(1)
        tmodel = Wav2Vec2ForCTC(cfg_t).eval()
        tmodel.save_pretrained(str(tmp_path))
        params, cfg = load_wav2vec2(str(tmp_path))
        assert cfg.do_stable_layer_norm
        rng = np.random.RandomState(1)
        x = rng.randn(1, 3200).astype(np.float32) * 0.1
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x)).logits.numpy()
        cfg32 = wav2vec2.Wav2Vec2Config(**{**cfg.__dict__, "dtype": "float32"})
        ours, _fl = wav2vec2.ctc_logits(params, jnp.asarray(x), cfg32)
        err = np.abs(np.asarray(ours) - ref).max()
        assert err < 5e-3, f"stable-LN variant mismatch: {err}"


class TestWhisperParity:
    def test_encoder_decoder_match_torch(self, tiny_hf_whisper):
        model_dir, tmodel = tiny_hf_whisper
        from ssak_tpu.models import whisper
        from ssak_tpu.models.hf_loader import load_whisper

        params, cfg = load_whisper(model_dir)
        cfg32 = whisper.WhisperConfig(**{**cfg.__dict__, "dtype": "float32"})
        rng = np.random.RandomState(0)
        mel = rng.randn(1, 80, 200).astype(np.float32) * 0.5
        tokens = np.array([[1, 5, 9, 20]], np.int64)
        with torch.no_grad():
            out = tmodel(input_features=torch.from_numpy(mel), decoder_input_ids=torch.from_numpy(tokens))
            ref_logits = out.logits.numpy()
            ref_enc = tmodel.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
        enc = np.asarray(whisper.encode(params, jnp.asarray(mel), cfg32))
        err_enc = np.abs(enc - ref_enc).max()
        assert err_enc < 5e-3, f"whisper encoder mismatch: {err_enc}"
        logits = np.asarray(whisper.decode_train(params, jnp.asarray(tokens.astype(np.int32)), jnp.asarray(enc), cfg32))
        err = np.abs(logits - ref_logits).max()
        assert err < 5e-2, f"whisper decoder logits mismatch: {err}"

    def test_greedy_matches_hf_generate(self, tiny_hf_whisper):
        model_dir, tmodel = tiny_hf_whisper
        from ssak_tpu.models import whisper
        from ssak_tpu.models.hf_loader import load_whisper

        params, cfg = load_whisper(model_dir)
        cfg32 = whisper.WhisperConfig(**{**cfg.__dict__, "dtype": "float32"})
        rng = np.random.RandomState(2)
        mel = rng.randn(1, 80, 200).astype(np.float32) * 0.5
        # ground truth: manual torch teacher-forced argmax chain (HF's
        # generate() pipeline adds logit processors that are not part of
        # the raw model semantics)
        seq = [1]
        with torch.no_grad():
            for _ in range(8):
                logits = tmodel(
                    input_features=torch.from_numpy(mel),
                    decoder_input_ids=torch.tensor([seq]),
                ).logits
                nxt = int(logits[0, -1].argmax())
                seq.append(nxt)
                if nxt == 2:
                    break
        ref_list = seq[1:]
        ours, lens = whisper.greedy_decode(params, jnp.asarray(mel), cfg32, prompt=[1], max_tokens=8)
        ours = [int(t) for t in np.asarray(ours[0])][: min(8, int(lens[0]) + 1)]
        n = min(len(ours), len(ref_list))
        assert ours[:n] == ref_list[:n], f"{ours} vs {ref_list}"
