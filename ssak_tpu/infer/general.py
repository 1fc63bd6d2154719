"""Backend-agnostic inference facade.

Counterpart of reference ssak/infer/general.py (load_model:32, infer:60,
compute_logits:76, decode_log_probas:103, get_model_vocab:123): one API over
the two model families (wav2vec2-CTC, Whisper seq2seq) with auto-detection
from a checkpoint directory's config.json.
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp


class ModelType:
    WAV2VEC2_CTC = "wav2vec2_ctc"
    WHISPER = "whisper"
    CONFORMER_CTC = "conformer_ctc"

CTC_TYPES = (ModelType.WAV2VEC2_CTC, ModelType.CONFORMER_CTC)


class LoadedModel:
    """Bundle of (params, config, tokenizer, type)."""

    def __init__(self, model_type, params, cfg, tokenizer):
        self.type = model_type
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer

    @property
    def sample_rate(self):
        return 16000

    def vocab(self):
        if self.type in CTC_TYPES:
            # padded to the model's logit dimension (config may round the
            # vocab up past the tokenizer size)
            n = max(len(self.tokenizer), getattr(self.cfg, "vocab_size", 0))
            return [self.tokenizer.id2tok.get(i, "") for i in range(n)]
        raise ValueError("vocab() only defined for CTC models")


def get_model_type(model_dir: str) -> str:
    # NeMo .nemo archive or extracted dir (model_config.yaml) -> Conformer
    # (reference loads these via nemo_toolkit, ssak/infer/kaldi_infer.py and
    # train/nemo/train_utils.py:15)
    if model_dir.endswith(".nemo") or os.path.exists(os.path.join(model_dir, "model_config.yaml")):
        return ModelType.CONFORMER_CTC
    with open(os.path.join(model_dir, "config.json"), encoding="utf-8") as f:
        cfg = json.load(f)
    archs = cfg.get("architectures") or []
    mt = (cfg.get("model_type") or "").lower()
    if any("whisper" in a.lower() for a in archs) or mt == "whisper":
        return ModelType.WHISPER
    if any("wav2vec2" in a.lower() for a in archs) or mt == "wav2vec2":
        return ModelType.WAV2VEC2_CTC
    raise ValueError(f"cannot determine model type of {model_dir}")


def load_model(model_dir: str, seeded_test_config: str = None, quantize_bits: int = 0) -> LoadedModel:
    """Load from an HF-format checkpoint dir OR a ssak_tpu exported dir
    (sak-finalize output). seeded_test_config builds a random tiny model
    instead (offline tests): 'whisper' or 'wav2vec2'.
    quantize_bits=8/4: weight-only quantize matmul kernels on load (the
    reference's load_in_8bit/load_in_4bit capability, models.quant) —
    halves/quarters weight HBM for big-model single-chip decode."""
    model = _load_model(model_dir, seeded_test_config)
    if quantize_bits:
        import jax.numpy as _jnp

        from ssak_tpu.models.quant import quantize_params

        # device-resident: quantize_params returns numpy leaves, and a
        # numpy leaf in a jit argument is re-transferred host->device on
        # EVERY call — over the remote TPU tunnel that turns a 2 s decode
        # into a 40 s one (measured, large-v3 int8)
        model.params = jax.tree_util.tree_map(
            _jnp.asarray, quantize_params(model.params, bits=quantize_bits)
        )
        if quantize_bits in (8, 4) and model.type == ModelType.WHISPER:
            # int8 KV caches ride along with int8/int4 weights:
            # autoregressive decode re-reads the full cross-attention K/V
            # every token step (the dominant HBM term at large-v3 —
            # PERF.md), so the --load_in_8bit/4bit capabilities halve
            # those bytes too (layers.decode_attention_int8); at int4
            # weights the KV bytes are what bound the batch, so this is
            # where the extra capacity actually comes from
            import dataclasses

            model.cfg = dataclasses.replace(model.cfg, kv_int8=True)
    return model


def _load_model(model_dir: str, seeded_test_config: str = None) -> LoadedModel:
    if seeded_test_config:
        return _seeded_model(seeded_test_config)
    if os.path.exists(os.path.join(model_dir, "ssak_config.json")):
        from ssak_tpu.train.finalize import load_exported

        mtype, params, cfg, tokenizer = load_exported(model_dir)
        import jax.numpy as _jnp

        params = jax.tree_util.tree_map(_jnp.asarray, params)
        return LoadedModel(mtype, params, cfg, tokenizer)
    mtype = get_model_type(model_dir)
    if mtype == ModelType.CONFORMER_CTC:
        from ssak_tpu.models.hf_loader import load_nemo_conformer
        from ssak_tpu.models.tokenizer import CTCTokenizer

        params, cfg, vocabulary = load_nemo_conformer(model_dir)
        # NeMo char vocabs use a literal space as the word delimiter and the
        # blank is the LAST id with no explicit token; BPE vocabs mark word
        # starts with '▁'. Synthesize an HF-style vocab dict either way.
        vocab = {tok: i for i, tok in enumerate(vocabulary)}
        vocab.setdefault("<pad>", cfg.blank_id)
        delim = "▁" if any(t.startswith("▁") for t in vocabulary) else " "
        tok = CTCTokenizer(vocab, word_delimiter=delim)
        return LoadedModel(mtype, params, cfg, tok)
    if mtype == ModelType.WHISPER:
        from ssak_tpu.models.hf_loader import load_whisper
        from ssak_tpu.models.tokenizer import WhisperTokenizer

        params, cfg = load_whisper(model_dir)
        tok = WhisperTokenizer(model_dir)
        return LoadedModel(mtype, params, cfg, tok)
    from ssak_tpu.models.hf_loader import load_wav2vec2
    from ssak_tpu.models.tokenizer import CTCTokenizer

    params, cfg = load_wav2vec2(model_dir)
    tok = CTCTokenizer(model_dir)
    return LoadedModel(mtype, params, cfg, tok)


def _seeded_model(kind: str) -> LoadedModel:
    """Random-but-deterministic model for offline tests/benches. kind is
    'whisper' or 'wav2vec2', optionally with a ':preset' suffix (e.g.
    'wav2vec2:base') so perf harnesses can drive PRODUCTION dims through
    the exact CLI code path."""
    family, _, preset = kind.partition(":")
    if family.startswith("whisper"):
        from ssak_tpu.models import whisper

        cfg = whisper.make_config(preset or "tiny_test")
        params = whisper.init_params(jax.random.PRNGKey(0), cfg)
        return LoadedModel(ModelType.WHISPER, params, cfg, None)
    from ssak_tpu.models import wav2vec2
    from ssak_tpu.models.tokenizer import CTCTokenizer

    if preset:
        cfg = wav2vec2.make_config(preset, vocab_size=48)
    else:
        cfg = wav2vec2.make_config("tiny_test")
    params = wav2vec2.init_params(jax.random.PRNGKey(0), cfg)
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4}
    for i, c in enumerate("abcdefghijklmnopqrstuvwxyz'-éèàùâêîôûç0123456789"[: cfg.vocab_size - 5]):
        vocab[c] = 5 + i
    return LoadedModel(ModelType.WAV2VEC2_CTC, params, cfg, CTCTokenizer(vocab))


def shard_model(model: LoadedModel, model_axis: int = None, mesh=None) -> "LoadedModel":
    """Tensor-parallel-shard a loaded model's weights over the 'model' mesh
    axis (megatron rules from ssak_tpu.parallel.sharding) for multi-chip
    inference — the capability BASELINE.md lists as 'sharded
    Whisper-large-v3 decode' (the reference only has accelerate
    device_map placement, whisper_train.py:432-439). The jitted decode
    programs pick the shardings up from the placed params; activations
    stay batch-local, XLA inserts the row-parallel all-reduces over ICI.

    model_axis defaults to all local devices. Returns the same LoadedModel
    with params re-placed and `.mesh` set."""
    from ssak_tpu.parallel.mesh import make_mesh, shard_params
    from ssak_tpu.parallel.sharding import CONFORMER_RULES, WAV2VEC2_RULES, WHISPER_RULES

    if mesh is None:
        model_axis = model_axis or len(jax.devices())
        mesh = make_mesh(model=model_axis)
    rules = {
        ModelType.WHISPER: WHISPER_RULES,
        ModelType.CONFORMER_CTC: CONFORMER_RULES,
    }.get(model.type, WAV2VEC2_RULES)
    model.params = shard_params(model.params, mesh, rules)
    model.mesh = mesh
    return model


_LOGPROB_CACHE = {}


def compute_log_probas(model: LoadedModel, audio, lengths=None):
    """CTC log-probs for a batch (B, T) -> ((B, F, V), frame_lengths).
    One compiled program per (config, batch shape), reused across calls."""
    assert model.type in CTC_TYPES
    if model.type == ModelType.CONFORMER_CTC:
        from ssak_tpu.models import conformer as family
    else:
        from ssak_tpu.models import wav2vec2 as family
    if lengths is None:
        lengths = jnp.full((audio.shape[0],), audio.shape[1], jnp.int32)
    key = (model.cfg, audio.shape)
    if key not in _LOGPROB_CACHE:
        cfg = model.cfg

        def _fn(p, a, l):
            if a.dtype == jnp.int16:
                # int16 wire format (PCM sample words; the remote h2d link
                # is ~37 MB/s — halving audio bytes halves ingest stalls)
                a = a.astype(jnp.float32) * (1.0 / 32768.0)
            return family.ctc_log_probs(p, a, cfg, l)

        _LOGPROB_CACHE[key] = jax.jit(_fn)
    return _LOGPROB_CACHE[key](model.params, audio, lengths)


def decode_log_probas(model: LoadedModel, log_probs, frame_lengths):
    """Greedy decode CTC log-probs to texts."""
    from ssak_tpu.ops.ctc import ctc_greedy_decode

    tokens, lengths = ctc_greedy_decode(log_probs, frame_lengths, blank_id=model.cfg.blank_id)
    tokens = np.asarray(tokens)
    lengths = np.asarray(lengths)
    return [model.tokenizer.decode(tokens[b, : lengths[b]]) for b in range(tokens.shape[0])]


def load_adapter(model: LoadedModel, model_dir: str, language: str) -> bool:
    """MMS-style per-language adapter swap (reference
    transformers_infer.py:205-214: tokenizer.set_target_lang +
    model.load_adapter). Merges adapter.<language>.safetensors into the
    params, switches the tokenizer to the language's sub-vocab when
    vocab.json is nested per-language, and resizes cfg.vocab_size to the
    language's lm_head. Returns False (no-op) when the checkpoint has no
    such adapter — same fallback as the reference's 'is not a
    multi-lingual' handling."""
    if model.type != ModelType.WAV2VEC2_CTC:
        return False
    from ssak_tpu.models.hf_loader import load_wav2vec2_adapter

    try:
        model.params = load_wav2vec2_adapter(model.params, model_dir, language)
    except FileNotFoundError:
        return False
    vp = os.path.join(model_dir, "vocab.json")
    if os.path.exists(vp):
        with open(vp, encoding="utf-8") as f:
            v = json.load(f)
        if language in v and isinstance(v[language], dict):
            from ssak_tpu.models.tokenizer import CTCTokenizer

            model.tokenizer = CTCTokenizer(v[language])
    new_v = int(model.params["lm_head"]["kernel"].shape[-1])
    if getattr(model.cfg, "vocab_size", new_v) != new_v:
        import dataclasses

        model.cfg = dataclasses.replace(model.cfg, vocab_size=new_v)
    return True


def infer(model: LoadedModel, audio_batches, language: str = None, **kwargs):
    """Generator of transcripts over batches of audio arrays (the
    reference's per-backend X_infer() generators unified)."""
    if model.type in CTC_TYPES:
        from ssak_tpu.infer.ctc_infer import ctc_transcribe_batch

        for batch in audio_batches:
            yield from ctc_transcribe_batch(model, batch)
    else:
        from ssak_tpu.infer.whisper_infer import whisper_transcribe_batch

        for batch in audio_batches:
            yield from whisper_transcribe_batch(model, batch, language=language, **kwargs)
