"""ctypes wrapper over the native C++ n-gram scorer (libssaklm).

Drop-in replacement for ssak_tpu.decode.lm.ArpaLM in the host prefix beam
(same .order / .score(word, context) surface), the TPU-era counterpart of
the reference's KenLM C++ engine (ssak/infer/transformers_infer.py:284-289
builds a pyctcdecode decoder around a kenlm.Model). Word-level scoring is
the beam's host-side hot loop — the dense char-LM device table covers
on-device fusion, this covers large word LMs that cannot be densified.

The native library parses ARPA (KenLM's interchange format) and a flat
binary image for fast reload (save_binary / ngram_load auto-detects).
Build: python -m ssak_tpu.decode.native.build (auto-built on first use).
"""

import ctypes
import os

import numpy as np

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
    path = os.path.join(here, "libssaklm.so")
    if not os.path.exists(path):
        from ssak_tpu.decode.native.build import build

        path = build()
    lib = ctypes.CDLL(path)
    lib.ngram_load.restype = ctypes.c_void_p
    lib.ngram_load.argtypes = [ctypes.c_char_p]
    lib.ngram_save.restype = ctypes.c_int
    lib.ngram_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ngram_free.argtypes = [ctypes.c_void_p]
    lib.ngram_order.restype = ctypes.c_int
    lib.ngram_order.argtypes = [ctypes.c_void_p]
    lib.ngram_size.restype = ctypes.c_int64
    lib.ngram_size.argtypes = [ctypes.c_void_p]
    lib.ngram_vocab_size.restype = ctypes.c_int
    lib.ngram_vocab_size.argtypes = [ctypes.c_void_p]
    lib.ngram_word_id.restype = ctypes.c_int32
    lib.ngram_word_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ngram_word.restype = ctypes.c_char_p
    lib.ngram_word.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.ngram_score_ids.restype = ctypes.c_float
    lib.ngram_score_ids.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32]
    lib.ngram_score_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


class NativeNgramLM:
    """Backoff n-gram LM scored by the C++ core. Same interface as ArpaLM
    (score/order/vocab/sentence_logprob); scores are log10."""

    def __init__(self, path):
        self._lib = _load_lib()
        self._h = self._lib.ngram_load(os.fspath(path).encode())
        if not self._h:
            raise IOError(f"cannot load LM from {path}")
        self.order = self._lib.ngram_order(self._h)
        self._ids = {}  # word -> id cache (-1 = OOV)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ngram_free(self._h)
            self._h = None

    def __len__(self):
        return int(self._lib.ngram_size(self._h))

    @property
    def vocab(self):
        n = self._lib.ngram_vocab_size(self._h)
        return {self._lib.ngram_word(self._h, i).decode("utf-8", "replace") for i in range(n)}

    def save_binary(self, path):
        """Write the fast-reload binary image (the .klm counterpart)."""
        if self._lib.ngram_save(self._h, os.fspath(path).encode()) != 0:
            raise IOError(f"cannot write {path}")

    def _id(self, word) -> int:
        wid = self._ids.get(word)
        if wid is None:
            wid = self._lib.ngram_word_id(self._h, word.encode("utf-8"))
            self._ids[word] = wid
        return wid

    def score(self, word, context=()) -> float:
        """log10 P(word | context), context most-recent-last."""
        ctx = [self._id(w) for w in context]
        arr = (ctypes.c_int32 * len(ctx))(*ctx)
        return self._lib.ngram_score_ids(self._h, arr, len(ctx), self._id(word))

    def score_batch(self, contexts, words) -> np.ndarray:
        """Vectorized scoring: contexts list of word tuples, words list of
        strings. One FFI call for the whole candidate set of a beam step."""
        n = len(words)
        width = max((len(c) for c in contexts), default=0)
        ctxs = np.full((n, max(width, 1)), -1, np.int32)
        for i, c in enumerate(contexts):
            for j, w in enumerate(c):
                ctxs[i, max(width, 1) - len(c) + j] = self._id(w)
        wids = np.asarray([self._id(w) for w in words], np.int32)
        out = np.empty(n, np.float32)
        self._lib.ngram_score_batch(
            self._h, ctxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ctxs.shape[1],
            wids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def sentence_logprob(self, words, bos=True, eos=True) -> float:
        context = ("<s>",) if bos else ()
        total = 0.0
        for w in words:
            total += self.score(w, context)
            context = (context + (w,))[-(self.order - 1):] if self.order > 1 else ()
        if eos:
            total += self.score("</s>", context)
        return float(total)


def load_lm(path, prefer_native: bool = True):
    """Load an n-gram LM: native C++ scorer when buildable, else the pure-
    Python ArpaLM (identical scores — pinned by tests/test_native_lm.py)."""
    if prefer_native and not str(path).endswith(".gz") and native_available():
        return NativeNgramLM(path)
    from ssak_tpu.decode.lm import ArpaLM

    return ArpaLM(path)
