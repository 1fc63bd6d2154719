"""decode/table_cache.py — startup tables round-trip through the disk
cache bit-exactly, hits skip the builders, changed files miss."""

import numpy as np
import pytest


@pytest.fixture
def env_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("SSAK_TPU_CACHE", str(tmp_path / "cache"))
    return tmp_path


def _small_lexicon(tmp_path, words=("abc", "abd", "xy")):
    p = tmp_path / "lexicon.txt"
    p.write_text("\n".join(words) + "\n")
    from ssak_tpu.decode.lexicon import Lexicon

    return Lexicon.from_file(str(p)), str(p)


VOCAB = ["<pad>"] + list("abcdxy") + ["|"]


def test_lexicon_tables_cache_roundtrip(env_cache, monkeypatch):
    from ssak_tpu.decode import table_cache

    lex, path = _small_lexicon(env_cache)
    t1, a1, n1 = table_cache.lexicon_tables_cached(lex, path, VOCAB)
    # second call must HIT: the builder may not run again
    monkeypatch.setattr(
        type(lex), "device_tables",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("cache miss on identical inputs")))
    t2, a2, n2 = table_cache.lexicon_tables_cached(lex, path, VOCAB)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


def test_lexicon_cache_misses_on_changed_file(env_cache):
    from ssak_tpu.decode import table_cache

    lex, path = _small_lexicon(env_cache)
    t1, _a, _n = table_cache.lexicon_tables_cached(lex, path, VOCAB)
    lex2, _ = _small_lexicon(env_cache, words=("abc", "abd", "xy", "xyc"))
    t2, _a2, _n2 = table_cache.lexicon_tables_cached(lex2, path, VOCAB)
    assert np.asarray(t2).shape != np.asarray(t1).shape  # rebuilt, not stale


def test_word_lm_tables_cache_hits_without_parsing(env_cache):
    from ssak_tpu.decode import table_cache
    from ssak_tpu.decode.lm import train_ngram_lm, write_arpa

    lex, _p = _small_lexicon(env_cache)
    lm = train_ngram_lm(["abc abd xy abc", "xy abd"], order=3)
    arpa = env_cache / "lm.arpa"
    write_arpa(lm, str(arpa))
    words = lex.word_list()
    out1 = table_cache.word_lm_tables_cached(lm, str(arpa), words)
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return lm

    out2 = table_cache.word_lm_tables_cached(factory, str(arpa), words)
    assert calls["n"] == 0, "cache hit must not invoke the ARPA factory"
    assert out1["order"] == out2["order"] and out1["n_words"] == out2["n_words"]
    np.testing.assert_array_equal(out1["uni"], out2["uni"])
    for name in ("bi", "bi_backoff", "tri"):
        if name in out1:
            np.testing.assert_array_equal(out1[name].fp, out2[name].fp)
            np.testing.assert_array_equal(out1[name].val, out2[name].val)
            assert out1[name].max_probe == out2[name].max_probe
            assert out1[name].size == out2[name].size


def test_arpa_order_header_only(env_cache):
    from ssak_tpu.decode.lm import arpa_order, train_ngram_lm, write_arpa

    lm = train_ngram_lm(["a b c", "b c a"], order=2)
    p = env_cache / "o2.arpa"
    write_arpa(lm, str(p))
    assert arpa_order(str(p)) == 2


def test_ctc_infer_wordlm_results_identical_across_cache(env_cache, monkeypatch):
    """The e2e route: sak-infer word-LM decode must produce identical
    transcripts on a cold cache and a warm cache."""
    from ssak_tpu.decode.lm import train_ngram_lm, write_arpa
    from ssak_tpu.infer.ctc_infer import ctc_infer

    rng = np.random.RandomState(3)
    words = ["abc", "abd", "xy", "dax", "cab"]
    lexp = env_cache / "lex.txt"
    lexp.write_text("\n".join(words) + "\n")
    lm = train_ngram_lm([" ".join(rng.choice(words, size=5)) for _ in range(50)], order=3)
    arpap = env_cache / "lm.arpa"
    write_arpa(lm, str(arpap))
    audios = [(rng.randn(16000) * 0.1).astype(np.float32) for _ in range(2)]

    def run():
        return list(ctc_infer(None, audios, seeded_test_config="wav2vec2", beam_width=4,
                              lm_path=str(arpap), lexicon_path=str(lexp)))

    cold = run()
    warm = run()
    assert cold == warm and len(cold) == 2
