"""Disk cache for the on-device decode tables.

`sak-infer` builds two sets of dense tables at startup (ctc_infer): the
lexicon trie (`Lexicon.device_tables` + `node_word_ids`, ~0.6 s for a
12k-word lexicon on this host) and the hashed word-LM tables
(`word_lm_device_tables`, ~1.4 s + the ARPA parse itself). Both are pure
functions of their input FILES, so a production service restarting on
the same lexicon/LM pays them once: the arrays round-trip through an
npz in the user cache dir, keyed on the source file digests + the vocab
+ a format version. A changed lexicon/ARPA file changes the digest and
misses the cache — no invalidation logic to get wrong. Corrupt/partial
cache files (e.g. a killed process mid-write) fall back to a rebuild;
writes go through a tmp file + atomic rename so they cannot be observed
half-written.

Reference parallel: pyctcdecode/KenLM mmap their binarized LM for the
same reason (loading a text ARPA per process is the slow path).
"""

import os
import tempfile

import numpy as np

from ssak_tpu.utils.misc import get_cache_dir, hashmd5
from ssak_tpu.utils.monitoring import logger

FORMAT_VERSION = 1


def _file_digest(path: str) -> str:
    import hashlib

    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _cache_path(kind: str, key_parts) -> str:
    d = os.path.join(get_cache_dir(), "decode_tables")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{kind}-{hashmd5([FORMAT_VERSION, *key_parts])}.npz")


def _atomic_savez(path: str, **arrays):
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def lexicon_tables_cached(lexicon, lexicon_path: str, vocab, word_delimiter: str = "|"):
    """(trans, accept, node_word_ids) for `lexicon`, cached on disk keyed
    by the lexicon FILE digest + vocab + delimiter. `lexicon` is the
    already-loaded Lexicon (cheap to build; only the dense tables are
    expensive)."""
    path = _cache_path("lexicon", [_file_digest(lexicon_path), list(vocab), word_delimiter])
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                return z["trans"], z["accept"], z["node_word_ids"]
        except Exception as e:  # corrupt cache: rebuild
            logger.warning(f"decode-table cache unreadable ({e}); rebuilding {path}")
    trans, accept = lexicon.device_tables(vocab, word_delimiter=word_delimiter)
    nw = lexicon.node_word_ids()
    _atomic_savez(path, trans=np.asarray(trans), accept=np.asarray(accept), node_word_ids=np.asarray(nw))
    return trans, accept, nw


def word_lm_tables_cached(arpa, arpa_path: str, word_list):
    """word_lm_device_tables(arpa, word_list) with disk caching keyed by
    the ARPA file digest + the word-id space. HashedNgrams are serialized
    as their (fp, val, max_probe) arrays and reconstructed without
    re-running Robin Hood insertion.

    `arpa` may be a zero-arg CALLABLE returning the parsed ArpaLM — on a
    cache hit it is never called, so the full ARPA parse (the dominant
    startup cost for big LMs) is skipped too."""
    from ssak_tpu.decode.lm import HashedNgrams, word_lm_device_tables

    path = _cache_path("wordlm", [_file_digest(arpa_path), hashmd5(list(word_list))])
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                out = {
                    "order": int(z["order"]),
                    "uni": z["uni"],
                    "uni_backoff": z["uni_backoff"],
                    "bos": int(z["bos"]),
                    "pad": int(z["pad"]),
                    "n_words": int(z["n_words"]),
                }
                for name in ("bi", "bi_backoff", "tri"):
                    if f"{name}_fp" in z:
                        out[name] = HashedNgrams.from_arrays(
                            z[f"{name}_fp"], z[f"{name}_val"], int(z[f"{name}_max_probe"]))
                return out
        except Exception as e:
            logger.warning(f"decode-table cache unreadable ({e}); rebuilding {path}")
    out = word_lm_device_tables(arpa() if callable(arpa) else arpa, word_list)
    arrays = {k: np.asarray(out[k]) for k in ("order", "uni", "uni_backoff", "bos", "pad", "n_words")}
    for name in ("bi", "bi_backoff", "tri"):
        if name in out:
            h = out[name]
            arrays[f"{name}_fp"] = h.fp
            arrays[f"{name}_val"] = h.val
            arrays[f"{name}_max_probe"] = np.asarray(h.max_probe)
    _atomic_savez(path, **arrays)
    return out
