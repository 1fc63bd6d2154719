"""Beam search + LM tests: host beam vs greedy on easy logits, LM fusion
moves the decision, device beam matches host beam (no LM), ARPA roundtrip."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from ssak_tpu.decode import (
    ArpaLM,
    char_lm_table,
    ctc_beam_search_device,
    ctc_prefix_beam_search,
    train_ngram_lm,
)
from ssak_tpu.ops.ctc import ctc_greedy_decode

VOCAB = ["<pad>", "|", "a", "b", "c"]


def logits_for(path, V=5, peaked=3.0):
    lp = np.full((len(path), V), -peaked, np.float32)
    for t, k in enumerate(path):
        lp[t, k] = 0.0
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    return lp


def test_beam_equals_greedy_on_peaked():
    path = [2, 2, 0, 3, 0, 4, 1, 2]  # "ab c|a" -> text "abc a"
    lp = logits_for(path)
    res = ctc_prefix_beam_search(lp, VOCAB, beam_width=8)
    toks, lens = ctc_greedy_decode(jnp.asarray(lp[None]), jnp.asarray([len(path)]))
    greedy = "".join(VOCAB[t] for t in np.asarray(toks[0][: int(lens[0])])).replace("|", " ").strip()
    assert res[0][0] == greedy


def test_beam_sums_paths():
    """Beam must prefer a prefix whose total mass over paths is higher even
    if greedy picks another (classic CTC beam advantage)."""
    # frame probs designed so greedy gives blank-heavy path but 'a' has
    # more total mass split over two alignments
    lp = np.log(np.array([
        [0.4, 0.0, 0.6, 0.0, 0.0],
        [0.4, 0.0, 0.6, 0.0, 0.0],
    ], np.float32).clip(1e-9))
    res = ctc_prefix_beam_search(lp, VOCAB, beam_width=8)
    assert res[0][0] == "a"


def test_lm_fusion_changes_ranking():
    # ambiguous second char between 'b'(3) and 'c'(4)
    lp = np.log(np.array([
        [0.01, 0.01, 0.96, 0.01, 0.01],   # 'a'
        [0.01, 0.01, 0.01, 0.485, 0.495], # 'c' slightly over 'b'
        [0.01, 0.96, 0.01, 0.01, 0.01],   # '|'
    ], np.float32))
    no_lm = ctc_prefix_beam_search(lp, VOCAB, beam_width=8)
    assert no_lm[0][0] == "ac"
    # word LM strongly favouring "ab"
    lm = train_ngram_lm(["ab"] * 100 + ["ac"], order=2)
    with_lm = ctc_prefix_beam_search(lp, VOCAB, beam_width=8, lm=lm, alpha=2.0, beta=0.0)
    assert with_lm[0][0] == "ab"


def test_device_beam_matches_host_no_lm():
    rng = np.random.RandomState(0)
    for trial in range(3):
        T, V = 12, 5
        logits = rng.randn(T, V).astype(np.float32) * 2
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        host = ctc_prefix_beam_search(lp, VOCAB, beam_width=16)[0][0]
        toks, lens = ctc_beam_search_device(jnp.asarray(lp[None]), jnp.asarray([T]), beam_width=16)
        dev = "".join(VOCAB[t] for t in toks[0][: lens[0]]).replace("|", " ").strip()
        assert dev == host, f"trial {trial}: {dev!r} != {host!r}"


def test_device_beam_batched():
    rng = np.random.RandomState(1)
    lp1 = rng.randn(10, 5).astype(np.float32)
    lp2 = rng.randn(10, 5).astype(np.float32)
    lp = np.stack([lp1, lp2])
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    toks, lens = ctc_beam_search_device(jnp.asarray(lp), jnp.asarray([10, 6]), beam_width=8)
    assert toks.shape[0] == 2
    # each matches its own single decode
    t1, l1 = ctc_beam_search_device(jnp.asarray(lp1[None]), jnp.asarray([10]), beam_width=8)
    assert list(toks[0][: lens[0]]) == list(t1[0][: l1[0]])


def test_arpa_roundtrip(tmp_path):
    lm = train_ngram_lm(["bonjour le monde", "bonjour les amis"] * 10, order=2, output_arpa=str(tmp_path / "lm.arpa"))
    lm2 = ArpaLM(str(tmp_path / "lm.arpa"))
    assert abs(lm.score("le", ("bonjour",)) - lm2.score("le", ("bonjour",))) < 1e-4
    assert lm2.score("bonjour", ()) > lm2.score("xyz", ())


def test_sentence_logprob_backoff():
    lm = train_ngram_lm(["a b c"] * 5 + ["a c b"], order=3)
    good = lm.sentence_logprob(["a", "b", "c"])
    rare = lm.sentence_logprob(["c", "b", "a"])
    assert good > rare


def test_char_lm_table():
    lm = train_ngram_lm(["ab ab ab"], order=2, char_level=True)
    vocab = ["|", "a", "b"]
    table, order = char_lm_table(lm, vocab, order=2)
    assert table.shape == (3, 3)
    # P(b|a) should beat P(a|a)
    assert table[1, 2] > table[1, 1]
