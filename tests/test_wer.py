"""WER engine tests (reference methodology: exact counts on hand-checked
alignments; bootstrap CI sanity; two-system diff)."""

import pytest

from ssak_tpu.eval import align_tokens, compute_wer, compute_wer_differences, keyword_scores


def test_perfect():
    r = compute_wer(["bonjour tout le monde"], ["bonjour tout le monde"])
    assert r["wer"] == 0.0
    assert r["count"] == 4 and r["hits"] == 4


def test_counts():
    # ref: a b c d ; hyp: a x c  -> 1 sub (b->x), 1 del (d)
    r = compute_wer(["a b c d"], ["a x c"])
    assert r["sub"] == 0.25 and r["del"] == 0.25 and r["ins"] == 0.0
    assert r["wer"] == 0.5


def test_insertion():
    r = compute_wer(["a b"], ["a x b y"])
    assert r["wer"] == 1.0  # 2 insertions / 2 ref words
    assert r["ins"] == 1.0


def test_empty_reference_workaround():
    r = compute_wer([""], ["hello world"])
    # ref becomes "<empty>", pred "<empty> hello world" -> 2 ins / 1
    assert r["wer"] == 2.0


def test_character_level():
    r = compute_wer(["abc"], ["abd"], character_level=True)
    assert r["wer"] == pytest.approx(1 / 3)


def test_id_intersection():
    refs = {"u1": "a b", "u2": "c d", "u3": "e f"}
    preds = {"u2": "c d", "u3": "e x", "u4": "zz"}
    r = compute_wer(refs, preds)
    assert r["count"] == 4  # u2+u3 only
    assert r["wer"] == 0.25


def test_no_common_ids_raises():
    with pytest.raises(ValueError):
        compute_wer({"a": "x"}, {"b": "y"})


def test_normalization_mode():
    r = compute_wer(["Bonjour !"], ["bonjour"], normalization="fr")
    assert r["wer"] == 0.0
    # strong mode removes apostrophes/hyphens
    r = compute_wer(["c'est-à-dire"], ["c est à dire"], normalization="fr+")
    assert r["wer"] == 0.0


def test_alignment_ops():
    dist, ops = align_tokens(["a", "b", "c"], ["a", "c"])
    assert dist == 1
    assert [op for op, _i, _j in ops] == ["=", "D", "="]


def test_details_and_viz():
    r = compute_wer({"u1": "a b c"}, {"u1": "a x c"}, details=True)
    viz = r["alignments"][0]["viz"]
    assert "REF:" in viz and "HYP:" in viz and "S" in viz


def test_bootstrap_ci():
    refs = [f"w{i} common words here" for i in range(20)]
    preds = [(f"w{i} common words here" if i % 2 else f"w{i} common wrong here") for i in range(20)]
    r = compute_wer(refs, preds, bootstrap_ci=True, n_bootstrap=200)
    ci = r["ci"]
    assert ci["low"] <= r["wer"] <= ci["high"]


def test_wer_differences():
    refs = {"u1": "a b c", "u2": "d e f"}
    p1 = {"u1": "a b c", "u2": "d x f"}
    p2 = {"u1": "a b c", "u2": "d e f"}
    d = compute_wer_differences(refs, p1, p2)
    assert d["better"] == 1 and d["worse"] == 0
    assert d["diff"] < 0


def test_keyword_scores():
    refs = {"u1": "alpha beta alpha", "u2": "gamma"}
    preds = {"u1": "alpha beta", "u2": "gamma alpha"}
    s = keyword_scores(refs, preds, ["alpha"])
    assert s["alpha"]["tp"] == 1 and s["alpha"]["fn"] == 1 and s["alpha"]["fp"] == 1


def test_file_inputs(tmp_path):
    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    ref.write_text("u1 bonjour le monde\nu2 salut\n")
    hyp.write_text("u1 bonjour le monde\nu2 salut toi\n")
    r = compute_wer(str(ref), str(hyp))
    assert r["count"] == 4
    assert r["wer"] == 0.25


def test_align_tokens_brute_force_parity():
    """The vectorized prefix-min DP row must equal the textbook O(n*m)
    recurrence on random token sequences (including empty sides)."""
    import numpy as np

    from ssak_tpu.eval.wer import align_tokens

    def brute(ref, hyp):
        n, m = len(ref), len(hyp)
        D = [[0] * (m + 1) for _ in range(n + 1)]
        for i in range(n + 1):
            D[i][0] = i
        for j in range(m + 1):
            D[0][j] = j
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                D[i][j] = min(D[i - 1][j - 1] + (ref[i - 1] != hyp[j - 1]), D[i - 1][j] + 1, D[i][j - 1] + 1)
        return D[n][m]

    rng = np.random.RandomState(0)
    for _ in range(200):
        n, m = rng.randint(0, 18, 2)
        ref = [str(t) for t in rng.randint(0, 6, n)]
        hyp = [str(t) for t in rng.randint(0, 6, m)]
        d, ops = align_tokens(ref, hyp)
        assert d == brute(ref, hyp)
        assert sum(1 for op, _i, _j in ops if op in "SDI") == d


def test_align_tokens_corpus_scale():
    """Corpus-scale scoring stays fast: 10k utterance pairs in seconds
    (the Python-inner-loop DP took minutes)."""
    import time

    import numpy as np

    from ssak_tpu.eval.wer import align_tokens

    rng = np.random.RandomState(1)
    pairs = []
    for _ in range(10000):
        n = rng.randint(5, 30)
        ref = [str(t) for t in rng.randint(0, 50, n)]
        hyp = [str(t) if rng.rand() > 0.2 else str(rng.randint(0, 50)) for t in ref]
        pairs.append((ref, hyp))
    t0 = time.perf_counter()
    total = sum(align_tokens(r, h)[0] for r, h in pairs)
    dt = time.perf_counter() - t0
    assert total > 0
    assert dt < 30.0, f"10k pairs took {dt:.1f}s"
