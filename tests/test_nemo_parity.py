"""NeMo Conformer import parity (reference ssak/train/nemo/train_utils.py:15
get_base_model starts every NeMo recipe from a pretrained .nemo archive).

Oracles available offline:
- HF transformers' Wav2Vec2Conformer encoder layer implements the SAME
  ESPnet/Transformer-XL rel-pos attention + macaron block the NeMo
  Conformer uses — a torch reference for the block math and the
  rel-pos table layout.
- torch.stft for the NeMo preprocessor math (matmul-DFT equivalence).
- torch Conv2d for the striding2d pre-encode.
- An end-to-end .nemo archive (model_config.yaml + model_weights.ckpt in a
  tar) built locally, loaded through the infer/general facade.
"""

import io
import tarfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _f32_cfg(**kw):
    from ssak_tpu.models.conformer import ConformerConfig

    base = dict(
        n_mels=80, d_model=64, num_layers=2, num_heads=4, ff_expansion=4,
        conv_kernel=7, vocab_size=33, blank_id=32, dtype="float32",
        pos_type="relpos", subsampling="striding2d", conv_norm="affine",
        xscale=True, frontend="nemo",
    )
    base.update(kw)
    return ConformerConfig(**base)


class TestRelPosAttention:
    def test_relpos_table_matches_hf(self):
        """_relpos_table == HF Wav2Vec2ConformerRelPositionalEmbedding
        (the ESPnet layout NeMo checkpoints were trained against)."""
        from transformers import Wav2Vec2ConformerConfig
        from transformers.models.wav2vec2_conformer.modeling_wav2vec2_conformer import (
            Wav2Vec2ConformerRelPositionalEmbedding,
        )

        from ssak_tpu.models.conformer import _relpos_table

        T, d = 17, 64
        cfg = Wav2Vec2ConformerConfig(hidden_size=d, max_source_positions=64)
        emb = Wav2Vec2ConformerRelPositionalEmbedding(cfg).eval()
        with torch.no_grad():
            ref = emb(torch.zeros(1, T, d)).numpy()[0]  # (2T-1, d)
        ours = np.asarray(_relpos_table(T, d))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_block_matches_hf_conformer_layer(self):
        """One conformer block (macaron FFN halves, rel-pos MHSA with
        pos_bias_u/v, conv module with eval-mode BatchNorm folded to affine,
        final LN) vs torch Wav2Vec2ConformerEncoderLayer."""
        from transformers import Wav2Vec2ConformerConfig
        from transformers.models.wav2vec2_conformer.modeling_wav2vec2_conformer import (
            Wav2Vec2ConformerEncoderLayer,
            Wav2Vec2ConformerRelPositionalEmbedding,
        )

        from ssak_tpu.models import conformer as C
        from ssak_tpu.models import layers as L

        d, H, k = 64, 4, 7
        hcfg = Wav2Vec2ConformerConfig(
            hidden_size=d, num_attention_heads=H, intermediate_size=4 * d,
            hidden_act="silu", position_embeddings_type="relative",
            conv_depthwise_kernel_size=k, max_source_positions=64,
            attention_dropout=0.0, hidden_dropout=0.0, feat_proj_dropout=0.0,
            conformer_conv_dropout=0.0,
        )
        torch.manual_seed(0)
        layer = Wav2Vec2ConformerEncoderLayer(hcfg)
        # non-trivial BN running stats so the affine fold is actually tested
        bn = layer.conv_module.batch_norm
        with torch.no_grad():
            bn.running_mean.normal_(0, 0.5)
            bn.running_var.uniform_(0.5, 2.0)
            bn.weight.normal_(1.0, 0.2)
            bn.bias.normal_(0, 0.2)
        layer = layer.eval()
        sd = {kk: v.numpy() for kk, v in layer.state_dict().items()}

        from ssak_tpu.models.hf_loader import _fold_bn, _map_ln, _t, _conv_t

        def lin(pfx, bias=True):
            p = {"kernel": _t(sd[f"{pfx}.weight"])}
            if bias:
                p["bias"] = sd[f"{pfx}.bias"]
            return p

        blk = {
            "ff1_ln": _map_ln(sd, "ffn1_layer_norm"),
            "ff1": {"fc1": lin("ffn1.intermediate_dense"), "fc2": lin("ffn1.output_dense")},
            "attn_ln": _map_ln(sd, "self_attn_layer_norm"),
            "attn": {
                "query": lin("self_attn.linear_q"),
                "key": lin("self_attn.linear_k"),
                "value": lin("self_attn.linear_v"),
                "out": lin("self_attn.linear_out"),
                "linear_pos": lin("self_attn.linear_pos", bias=False),
                "pos_bias_u": sd["self_attn.pos_bias_u"],
                "pos_bias_v": sd["self_attn.pos_bias_v"],
            },
            "conv_ln": _map_ln(sd, "conv_module.layer_norm"),
            "conv": {
                "pointwise1": {"kernel": _t(sd["conv_module.pointwise_conv1.weight"][:, :, 0])},
                "depthwise": {"kernel": _conv_t(sd["conv_module.depthwise_conv.weight"])},
                "bn": _fold_bn(sd, "conv_module.batch_norm"),
                "pointwise2": {"kernel": _t(sd["conv_module.pointwise_conv2.weight"][:, :, 0])},
            },
            "ff2_ln": _map_ln(sd, "ffn2_layer_norm"),
            "ff2": {"fc1": lin("ffn2.intermediate_dense"), "fc2": lin("ffn2.output_dense")},
            "final_ln": _map_ln(sd, "final_layer_norm"),
        }
        blk = jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a, np.float32)), blk)

        cfg = _f32_cfg(conv_kernel=k)
        B, T = 2, 17
        rng = np.random.default_rng(1)
        x = rng.standard_normal((B, T, d)).astype(np.float32)

        emb = Wav2Vec2ConformerRelPositionalEmbedding(hcfg).eval()
        with torch.no_grad():
            xt = torch.from_numpy(x)
            ref = layer(xt, relative_position_embeddings=emb(xt))[0].numpy()

        xj = jnp.asarray(x)
        pad_mask = jnp.ones((B, T), bool)
        h = xj + 0.5 * L.mlp(L.layer_norm(xj, blk["ff1_ln"]), blk["ff1"], dtype=cfg.compute_dtype, activation=C._swish)
        h = h + C._attention_relpos(L.layer_norm(h, blk["attn_ln"]), blk["attn"], cfg, pad_mask)
        h = h + C._conv_module(L.layer_norm(h, blk["conv_ln"]), blk["conv"], cfg, pad_mask)
        h = h + 0.5 * L.mlp(L.layer_norm(h, blk["ff2_ln"]), blk["ff2"], dtype=cfg.compute_dtype, activation=C._swish)
        ours = np.asarray(L.layer_norm(h, blk["final_ln"]))
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestNemoFrontend:
    def test_logmel_matches_torch_stft(self):
        """nemo_log_mel_spectrogram (matmul-DFT) vs a torch.stft oracle
        implementing the NeMo preprocessor math (preemph 0.97, 400-pt hann
        in 512 fft, mag², slaney mel, ln + 2^-24 guard, per-feature norm)."""
        from ssak_tpu.ops.logmel import mel_filterbank, nemo_log_mel_spectrogram

        rng = np.random.default_rng(0)
        T = 16000
        lens = np.array([T, 12000], np.int32)
        audio = rng.standard_normal((2, T)).astype(np.float32) * 0.1
        audio[1, 12000:] = 0.0

        ours, flens = nemo_log_mel_spectrogram(jnp.asarray(audio), 80, jnp.asarray(lens))
        ours, flens = np.asarray(ours), np.asarray(flens)

        fb = torch.from_numpy(mel_filterbank(80, 512))
        for b in range(2):
            # NeMo computes the STFT on the zero-padded BATCH row and then
            # masks to seq_len (FilterbankFeatures.forward) — so the oracle
            # transforms the full padded row and slices to n valid frames.
            x = torch.from_numpy(audio[b]).double()
            x = torch.cat([x[:1], x[1:] - 0.97 * x[:-1]])
            spec = torch.stft(
                x, n_fft=512, hop_length=160, win_length=400,
                window=torch.hann_window(400, periodic=True).double(),
                center=True, pad_mode="reflect", return_complex=True,
            )
            n = int(lens[b]) // 160 + 1
            power = spec.abs()[:, :n] ** 2  # (257, n)
            mel = fb.double() @ power
            logmel = torch.log(mel + 2.0**-24)  # (80, n)
            mean = logmel.mean(dim=1, keepdim=True)
            std = logmel.std(dim=1, keepdim=True)  # unbiased
            ref = ((logmel - mean) / (std + 1e-5)).numpy()
            assert flens[b] == n
            np.testing.assert_allclose(ours[b, :, :n], ref, atol=2e-3)
        # frames past each utterance's length are zeroed
        assert np.all(ours[1, :, flens[1]:] == 0.0)

    def test_striding2d_matches_torch_conv2d(self):
        """NeMo pre_encode (2x strided Conv2d+ReLU over the mel image, then
        channel-major flatten + linear) vs a torch oracle."""
        from ssak_tpu.models import conformer as C
        from ssak_tpu.models.hf_loader import _conv2d_t, _t

        d, F, T = 16, 80, 37
        torch.manual_seed(0)
        c1 = torch.nn.Conv2d(1, d, 3, stride=2, padding=1)
        c2 = torch.nn.Conv2d(d, d, 3, stride=2, padding=1)
        f4 = C._sub2d_out_len(C._sub2d_out_len(F))
        proj = torch.nn.Linear(d * f4, d)
        with torch.no_grad():
            mel = torch.randn(2, F, T)
            x = mel.transpose(1, 2).unsqueeze(1)  # (B, 1, T, F)
            h = torch.relu(c2(torch.relu(c1(x))))  # (B, d, T4, F4)
            b, ch, t4, fr = h.shape
            ref = proj(h.transpose(1, 2).reshape(b, t4, ch * fr)).numpy()

        params = {"subsampling": {
            "conv1": {"kernel": jnp.asarray(_conv2d_t(c1.weight.detach().numpy())), "bias": jnp.asarray(c1.bias.detach().numpy())},
            "conv2": {"kernel": jnp.asarray(_conv2d_t(c2.weight.detach().numpy())), "bias": jnp.asarray(c2.bias.detach().numpy())},
            "proj": {"kernel": jnp.asarray(_t(proj.weight.detach().numpy())), "bias": jnp.asarray(proj.bias.detach().numpy())},
        }}
        cfg = _f32_cfg(d_model=d)
        ours = np.asarray(C._subsample_striding2d(params, jnp.asarray(mel.numpy()), cfg))
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def _build_tiny_nemo_archive(path, d=32, layers=2, heads=2, k=7, n_mels=80):
    """Write a .nemo tar (model_config.yaml + model_weights.ckpt) with
    random weights in the NeMo EncDecCTCModel key layout."""
    import yaml

    vocab = list(" abcdefghijklmnopqrstuvwxyz'")
    torch.manual_seed(0)
    sd = {}

    def lin(pfx, din, dout, bias=True):
        sd[f"{pfx}.weight"] = torch.randn(dout, din) * (din**-0.5)
        if bias:
            sd[f"{pfx}.bias"] = torch.randn(dout) * 0.01

    f4 = ((n_mels + 1) // 2 + 1) // 2
    sd["encoder.pre_encode.conv.0.weight"] = torch.randn(d, 1, 3, 3) * 0.2
    sd["encoder.pre_encode.conv.0.bias"] = torch.zeros(d)
    sd["encoder.pre_encode.conv.2.weight"] = torch.randn(d, d, 3, 3) * 0.05
    sd["encoder.pre_encode.conv.2.bias"] = torch.zeros(d)
    lin("encoder.pre_encode.out", d * f4, d)
    for i in range(layers):
        p = f"encoder.layers.{i}"
        for ln in ("norm_feed_forward1", "norm_self_att", "norm_conv", "norm_feed_forward2", "norm_out"):
            sd[f"{p}.{ln}.weight"] = torch.ones(d)
            sd[f"{p}.{ln}.bias"] = torch.zeros(d)
        lin(f"{p}.feed_forward1.linear1", d, 4 * d)
        lin(f"{p}.feed_forward1.linear2", 4 * d, d)
        lin(f"{p}.feed_forward2.linear1", d, 4 * d)
        lin(f"{p}.feed_forward2.linear2", 4 * d, d)
        for q in ("linear_q", "linear_k", "linear_v", "linear_out"):
            lin(f"{p}.self_attn.{q}", d, d)
        lin(f"{p}.self_attn.linear_pos", d, d, bias=False)
        sd[f"{p}.self_attn.pos_bias_u"] = torch.randn(heads, d // heads) * 0.1
        sd[f"{p}.self_attn.pos_bias_v"] = torch.randn(heads, d // heads) * 0.1
        sd[f"{p}.conv.pointwise_conv1.weight"] = torch.randn(2 * d, d, 1) * (d**-0.5)
        sd[f"{p}.conv.pointwise_conv1.bias"] = torch.zeros(2 * d)
        sd[f"{p}.conv.depthwise_conv.weight"] = torch.randn(d, 1, k) * 0.2
        sd[f"{p}.conv.depthwise_conv.bias"] = torch.zeros(d)
        sd[f"{p}.conv.batch_norm.weight"] = torch.ones(d)
        sd[f"{p}.conv.batch_norm.bias"] = torch.zeros(d)
        sd[f"{p}.conv.batch_norm.running_mean"] = torch.randn(d) * 0.1
        sd[f"{p}.conv.batch_norm.running_var"] = torch.ones(d)
        sd[f"{p}.conv.batch_norm.num_batches_tracked"] = torch.tensor(1)
        sd[f"{p}.conv.pointwise_conv2.weight"] = torch.randn(d, d, 1) * (d**-0.5)
        sd[f"{p}.conv.pointwise_conv2.bias"] = torch.zeros(d)
    sd["decoder.decoder_layers.0.weight"] = torch.randn(len(vocab) + 1, d, 1) * (d**-0.5)
    sd["decoder.decoder_layers.0.bias"] = torch.zeros(len(vocab) + 1)

    model_cfg = {
        "encoder": {
            "feat_in": n_mels, "d_model": d, "n_layers": layers, "n_heads": heads,
            "ff_expansion_factor": 4, "conv_kernel_size": k,
            "subsampling": "striding", "subsampling_factor": 4, "xscaling": True,
            "self_attention_model": "rel_pos",
        },
        "decoder": {"feat_in": d, "num_classes": len(vocab), "vocabulary": vocab},
        "labels": vocab,
    }
    wbuf = io.BytesIO()
    torch.save(sd, wbuf)
    ybuf = yaml.safe_dump(model_cfg).encode()
    with tarfile.open(path, "w") as tar:
        for name, data in [("model_config.yaml", ybuf), ("model_weights.ckpt", wbuf.getvalue())]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return model_cfg


class TestNemoArchive:
    def test_e2e_load_and_transcribe(self, tmp_path):
        """.nemo archive -> infer/general facade -> greedy transcription.
        Random weights: asserts the whole path runs with correct shapes,
        NeMo blank-last convention, and space-delimited char vocab."""
        from ssak_tpu.infer.general import (
            ModelType,
            compute_log_probas,
            decode_log_probas,
            get_model_type,
            load_model,
        )

        path = str(tmp_path / "tiny.nemo")
        _build_tiny_nemo_archive(path)
        assert get_model_type(path) == ModelType.CONFORMER_CTC

        model = load_model(path)
        assert model.cfg.blank_id == model.cfg.vocab_size - 1 == 28
        assert model.cfg.frontend == "nemo" and model.cfg.pos_type == "relpos"
        assert model.tokenizer.word_delimiter == " "

        rng = np.random.default_rng(0)
        audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
        lengths = jnp.asarray([16000, 8000], jnp.int32)
        lp, flens = compute_log_probas(model, jnp.asarray(audio), lengths)
        lp, flens = np.asarray(lp), np.asarray(flens)
        assert lp.shape[-1] == 29 and np.isfinite(lp).all()
        # subsampled frame lengths: mel frames T//160+1, two (n+1)//2 convs:
        # 16000 -> 101 -> 51 -> 26 ; 8000 -> 51 -> 26 -> 13
        assert flens[0] == 26 and flens[1] == 13
        texts = decode_log_probas(model, jnp.asarray(lp), jnp.asarray(flens))
        assert len(texts) == 2 and all(isinstance(t, str) for t in texts)

    def test_extracted_dir_load(self, tmp_path):
        """Extracted-archive layout (dir with model_config.yaml +
        model_weights.ckpt) loads identically."""
        import tarfile as tf

        from ssak_tpu.models.hf_loader import load_nemo_conformer

        arch = str(tmp_path / "m.nemo")
        _build_tiny_nemo_archive(arch)
        exdir = tmp_path / "extracted"
        exdir.mkdir()
        with tf.open(arch) as tar:
            tar.extractall(exdir, filter="data")
        p1, cfg1, v1 = load_nemo_conformer(arch)
        p2, cfg2, v2 = load_nemo_conformer(str(exdir))
        assert cfg1 == cfg2 and v1 == v2
        a = jax.tree_util.tree_leaves(p1)
        b = jax.tree_util.tree_leaves(p2)
        assert all(np.array_equal(x, y) for x, y in zip(a, b))


class TestNemoFineTuneChain:
    def test_import_train_finalize_infer(self, tmp_path):
        """The reference's NeMo workflow (train_utils.py:15 get_base_model:
        pretrained Parakeet -> fine-tune -> deploy) end to end: tiny .nemo
        archive -> CTCTrainer (conformer family, relpos+NeMo frontend) ->
        finalize export -> reload through infer facade -> decode."""
        import json
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["DATAPATH"] = "/root/reference/tests/data"
        arch = str(tmp_path / "base.nemo")
        _build_tiny_nemo_archive(arch)

        out = subprocess.run(
            [
                sys.executable, "-m", "ssak_tpu.train.cli",
                "/root/reference/tests/data/kaldi/minimal",
                "/root/reference/tests/data/kaldi/minimal",
                "--base_model", arch,
                "--output_dir", str(tmp_path / "runs"),
                "--batch_size", "2", "--max_steps", "2", "--eval_steps", "2",
                "--warmup_steps", "1", "--max_duration", "21", "--language", "fr",
            ],
            env=env, cwd="/root/repo", capture_output=True, text=True, timeout=900,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        run_dir = json.loads(out.stdout.strip().splitlines()[-1])["run_dir"]
        cfg_meta = json.load(open(os.path.join(run_dir, "ssak_config.json")))
        assert cfg_meta["model_type"] == "conformer_ctc"
        assert cfg_meta["config"]["pos_type"] == "relpos"

        out = subprocess.run(
            [sys.executable, "-m", "ssak_tpu.train.finalize", run_dir],
            env=env, cwd="/root/repo", capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        final_dir = out.stdout.strip().splitlines()[-1]
        meta = json.load(open(os.path.join(final_dir, "ssak_config.json")))
        assert meta["model_type"] == "conformer_ctc"

        out = subprocess.run(
            [
                sys.executable, "-m", "ssak_tpu.infer.ctc_infer",
                "/root/reference/tests/data/audio/bonjour.wav", final_dir,
            ],
            env=env, cwd="/root/repo", capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        assert out.stdout.startswith("bonjour")  # utt id column present
