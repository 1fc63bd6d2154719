"""Native C++ n-gram scorer vs the pure-Python ArpaLM: exact parity
(same backoff semantics), binary-image roundtrip, batch API, and identical
beam-search outputs through the host prefix beam."""

import numpy as np
import pytest

from ssak_tpu.decode.lm import ArpaLM, train_ngram_lm, write_arpa

native_lm = pytest.importorskip("ssak_tpu.decode.native_lm")

if not native_lm.native_available():
    pytest.skip("native LM library not buildable", allow_module_level=True)


TEXTS = [
    "bonjour le monde", "bonjour les amis", "le monde est grand",
    "les amis du monde", "bonjour tout le monde", "tout est dit",
] * 4


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("lm")
    path = str(d / "lm.arpa")
    train_ngram_lm(TEXTS, order=3, output_arpa=path)
    return path


def _all_queries(py_lm):
    words = sorted(py_lm.vocab) + ["zzz_oov"]
    queries = []
    for w in words:
        queries.append((w, ()))
        for c1 in words[:8]:
            queries.append((w, (c1,)))
            for c2 in words[:4]:
                queries.append((w, (c1, c2)))
                queries.append((w, ("oov_ctx", c1, c2)))  # over-long + OOV ctx
    return queries


def test_score_parity_exhaustive(arpa_path):
    py_lm = ArpaLM(arpa_path)
    c_lm = native_lm.NativeNgramLM(arpa_path)
    assert c_lm.order == py_lm.order
    for w, ctx in _all_queries(py_lm):
        assert c_lm.score(w, ctx) == pytest.approx(py_lm.score(w, ctx), abs=1e-5), (w, ctx)


def test_batch_matches_scalar(arpa_path):
    py_lm = ArpaLM(arpa_path)
    c_lm = native_lm.NativeNgramLM(arpa_path)
    queries = _all_queries(py_lm)[:200]
    contexts = [c for _, c in queries]
    words = [w for w, _ in queries]
    batch = c_lm.score_batch(contexts, words)
    scalar = np.asarray([py_lm.score(w, c) for w, c in queries], np.float32)
    np.testing.assert_allclose(batch, scalar, atol=1e-5)


def test_binary_roundtrip(arpa_path, tmp_path):
    c_lm = native_lm.NativeNgramLM(arpa_path)
    bin_path = str(tmp_path / "lm.bin")
    c_lm.save_binary(bin_path)
    c_lm2 = native_lm.NativeNgramLM(bin_path)
    assert c_lm2.order == c_lm.order
    assert len(c_lm2) == len(c_lm)
    py_lm = ArpaLM(arpa_path)
    for w, ctx in _all_queries(py_lm)[::7]:
        assert c_lm2.score(w, ctx) == pytest.approx(c_lm.score(w, ctx), abs=1e-6)


def test_sentence_logprob_parity(arpa_path):
    py_lm = ArpaLM(arpa_path)
    c_lm = native_lm.NativeNgramLM(arpa_path)
    for sent in TEXTS[:6]:
        words = sent.split()
        assert c_lm.sentence_logprob(words) == pytest.approx(py_lm.sentence_logprob(words), abs=1e-4)


def test_prefix_beam_identical_with_native_lm(arpa_path):
    from ssak_tpu.decode.ctc_beam import ctc_prefix_beam_search

    vocab = ["<blank>", " ", "b", "o", "n", "j", "u", "r", "l", "e", "s", "m", "d", "a", "i", "t", "g"]
    rng = np.random.RandomState(0)
    T, V = 40, len(vocab)
    logits = rng.randn(T, V).astype(np.float32) * 2
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    py_lm = ArpaLM(arpa_path)
    c_lm = native_lm.NativeNgramLM(arpa_path)
    kw = dict(vocab=vocab, beam_width=16, alpha=0.7, beta=1.5, blank_id=0, word_delimiter=" ")
    ref = ctc_prefix_beam_search(log_probs, lm=py_lm, **kw)
    got = ctc_prefix_beam_search(log_probs, lm=c_lm, **kw)
    # identical hypotheses and ranking; scores equal up to f32-vs-f64 rounding
    assert [t for t, _ in got] == [t for t, _ in ref]
    for (_, sg), (_, sr) in zip(got, ref):
        assert sg == pytest.approx(sr, abs=1e-4)


def test_load_lm_prefers_native(arpa_path):
    lm = native_lm.load_lm(arpa_path)
    assert isinstance(lm, native_lm.NativeNgramLM)
    lm_py = native_lm.load_lm(arpa_path, prefer_native=False)
    assert isinstance(lm_py, ArpaLM)
