"""Dataset pipeline: Kaldi folders → manifests → padded device batches.

TPU-first re-design of reference ssak/utils/dataset.py
(kaldi_folder_to_dataset:27, process_dataset:498, to_audio_batches:647):

  * A *manifest* is a plain list of row dicts
    {id, audio, start, end, duration, text, speaker, gender} — cheap to
    cache (JSONL), hash, shard and filter; no HF-datasets dependency.
  * Weighted corpus mixes via list files ("<path> <weight>" lines, env vars
    substituted): fractional upsampling with unique id suffixes, matching
    the reference semantics (dataset.py:368-378).
  * Batching is *duration-bucketed with padded static shapes*: every batch
    is padded to its bucket's sample count so XLA compiles one executable
    per bucket instead of one per length (the reference pads per batch —
    fine for eager PyTorch, pathological for jit).
"""

import json
import os
import random

import numpy as np

from ssak_tpu.data import kaldi as K
from ssak_tpu.utils.misc import get_cache_dir, hashmd5
from ssak_tpu.utils.monitoring import logger


def kaldi_folder_to_manifest(
    path,
    online: bool = False,
    min_duration: float = None,
    max_duration: float = None,
    max_text_length: int = None,
    max_data: int = None,
    choose_data_with_max_duration: bool = False,
    shuffle: bool = False,
    sort_by_len: int = 0,
    weights: float = 1.0,
    seed: int = 69,
    use_cache: bool = False,
):
    """Load one Kaldi dir, a list file of dirs+weights, or a list of dirs.

    sort_by_len: 0 none, 1 ascending, -1 descending (reference
    dataset.py:278-291).  max_data caps the utterance count: a seeded random
    subset by default, or the max_data LONGEST utterances when
    choose_data_with_max_duration is set (reference dataset.py:244-282).
    use_cache: fingerprint the kaldi dir contents + filter args and reuse a
    JSONL manifest cache (reference dataset.py:426-480 CSV caching).
    Returns (meta, rows) where meta has totals.
    """
    if use_cache:
        key = _manifest_cache_key(
            path, min_duration=min_duration, max_duration=max_duration,
            max_text_length=max_text_length, max_data=max_data,
            choose_data_with_max_duration=choose_data_with_max_duration,
            shuffle=shuffle, sort_by_len=sort_by_len, weights=weights, seed=seed,
        )
        cached = _manifest_cache_path(key)
        if os.path.exists(cached):
            rows = load_manifest(cached)
            logger.info(f"manifest cache hit: {cached} ({len(rows)} rows)")
            return _manifest_meta(rows), rows
    rows = []
    if isinstance(path, str) and os.path.isfile(path):
        # list file: "<kaldi_dir> [weight]" per line
        with open(path, encoding="utf-8") as f:
            entries = []
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                d = os.path.expandvars(parts[0])
                w = float(parts[1]) if len(parts) > 1 else 1.0
                entries.append((d, w))
        for d, w in entries:
            _meta, sub = kaldi_folder_to_manifest(d, weights=w, seed=seed)
            _extend_unique(rows, sub)
    elif isinstance(path, (list, tuple)):
        for d in path:
            _meta, sub = kaldi_folder_to_manifest(d, seed=seed)
            _extend_unique(rows, sub)
    else:
        rows = _load_one_kaldi_dir(os.path.expandvars(path))
        rows = _apply_weight(rows, weights, seed=seed)

    n_before = len(rows)
    if min_duration is not None:
        rows = [r for r in rows if r["duration"] is None or r["duration"] >= min_duration]
    if max_duration is not None:
        rows = [r for r in rows if r["duration"] is None or r["duration"] <= max_duration]
    if max_text_length is not None:
        rows = [r for r in rows if len(r.get("text") or "") <= max_text_length]
    if len(rows) != n_before:
        logger.info(f"filtered {n_before - len(rows)}/{n_before} utterances (duration/text-length)")

    if max_data and max_data < len(rows):
        if choose_data_with_max_duration:
            # keep the max_data LONGEST utterances (reference dataset.py:278-282
            # sorts by (duration, text length) and takes the tail)
            rows.sort(key=lambda r: (r["duration"] or 0.0, len(r.get("text") or "")))
            rows = rows[-max_data:]
        else:
            rng = random.Random(seed)
            rows = rng.sample(rows, max_data)

    if shuffle:
        rng = random.Random(seed)
        rng.shuffle(rows)
    elif sort_by_len:
        rows.sort(key=lambda r: (r["duration"] or 0.0), reverse=sort_by_len < 0)

    if use_cache:
        cache_manifest(rows, key)
    return _manifest_meta(rows), rows


def _manifest_meta(rows):
    return {
        "samples": len(rows),
        "h duration": round(sum(r["duration"] or 0.0 for r in rows) / 3600.0, 6),
    }


def _extend_unique(rows, sub):
    """Merge corpora keeping utterance ids unique: colliding ids get a
    _dupN suffix (cross-corpus counterpart of reference dataset.py:368-378)."""
    seen = {r["id"] for r in rows}
    for r in sub:
        rid = r["id"]
        if rid in seen:
            n = 1
            while f"{rid}_dup{n}" in seen:
                n += 1
            r = {**r, "id": f"{rid}_dup{n}"}
        seen.add(r["id"])
        rows.append(r)


def _load_one_kaldi_dir(path):
    d = K.load_kaldi_dir(path)
    if "wav.scp" not in d:
        raise FileNotFoundError(f"{path}: not a Kaldi data dir (no wav.scp)")
    wavscp = d["wav.scp"]
    text = d.get("text", {})
    utt2spk = d.get("utt2spk", {})
    spk2gender = d.get("spk2gender", {})
    utt2dur = {k: float(v) for k, v in d.get("utt2dur", {}).items()}
    rows = []
    if "segments" in d:
        for utt, (rec, start, end) in d["segments"].items():
            if rec not in wavscp:
                continue
            spk = utt2spk.get(utt)
            rows.append(
                {
                    "id": utt,
                    "audio": wavscp[rec],
                    "start": start,
                    "end": end,
                    "duration": utt2dur.get(utt, end - start),
                    "text": text.get(utt),
                    "speaker": spk,
                    "gender": spk2gender.get(spk),
                }
            )
    else:
        for utt in text or wavscp:
            if utt not in wavscp:
                continue
            spk = utt2spk.get(utt)
            rows.append(
                {
                    "id": utt,
                    "audio": wavscp[utt],
                    "start": None,
                    "end": None,
                    "duration": utt2dur.get(utt),
                    "text": text.get(utt),
                    "speaker": spk,
                    "gender": spk2gender.get(spk),
                }
            )
    rows.sort(key=lambda r: r["id"])
    return rows


def _apply_weight(rows, weight: float, seed: int = 69):
    """Upsample by `weight` (float): full copies get _copyN id suffixes, the
    fractional part is a random subset (reference dataset.py:368-378)."""
    if weight == 1.0 or not rows:
        return rows
    out = list(rows)
    full = int(weight)
    frac = weight - full
    for c in range(1, full):
        out.extend({**r, "id": f"{r['id']}_copy{c}"} for r in rows)
    if frac > 0:
        rng = random.Random(seed)
        n = int(round(frac * len(rows)))
        picked = rng.sample(range(len(rows)), n)
        out.extend({**rows[i], "id": f"{rows[i]['id']}_copy{full}"} for i in sorted(picked))
    return out


# --- manifest caching -----------------------------------------------------

_KALDI_FILES = ("wav.scp", "text", "segments", "utt2spk", "utt2dur", "spk2gender")


def _dir_fingerprint(path):
    """(name, mtime_ns, size) per standard kaldi file — cheap invalidation
    (counterpart of the HF-datasets _fingerprint in reference dataset.py:444)."""
    fp = []
    for fn in _KALDI_FILES:
        p = os.path.join(path, fn)
        if os.path.exists(p):
            st = os.stat(p)
            fp.append((fn, st.st_mtime_ns, st.st_size))
    return (os.path.abspath(path), tuple(fp))


def _manifest_cache_key(path, **opts):
    if isinstance(path, str) and os.path.isfile(path):
        st = os.stat(path)
        src = ("listfile", os.path.abspath(path), st.st_mtime_ns, st.st_size,
               tuple(_dir_fingerprint(os.path.expandvars(l.split()[0]))
                     for l in open(path, encoding="utf-8") if l.split() and os.path.isdir(os.path.expandvars(l.split()[0]))))
    elif isinstance(path, (list, tuple)):
        src = ("list", tuple(_dir_fingerprint(os.path.expandvars(p)) for p in path))
    else:
        src = ("dir", _dir_fingerprint(os.path.expandvars(path)))
    return (src, tuple(sorted(opts.items())))


def _manifest_cache_path(key_obj) -> str:
    cache = os.path.join(get_cache_dir(), "manifests")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, hashmd5(key_obj) + ".jsonl")


def cache_manifest(rows, key_obj) -> str:
    """Write rows to a JSONL cache file keyed by a fingerprint; return path."""
    path = _manifest_cache_path(key_obj)
    if not os.path.exists(path):
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for r in rows:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
        os.replace(tmp, path)
    return path


def load_manifest(path) -> list:
    with open(path, encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


# --- batching -------------------------------------------------------------

AUDIO_SPEC_SEP = ":"


def _parse_audio_spec(spec: str):
    """'file.wav:3.2-5.4,7-8.5' -> (path, [(3.2,5.4),(7,8.5)]) (reference
    dataset.py:754-801)."""
    if AUDIO_SPEC_SEP in spec:
        path, ranges = spec.rsplit(AUDIO_SPEC_SEP, 1)
        try:
            windows = []
            for rng in ranges.split(","):
                a, b = rng.split("-")
                windows.append((float(a), float(b)))
            if os.path.exists(path):
                return path, windows
        except ValueError:
            pass
    return spec, None


def to_audio_batches(
    source,
    batch_size: int = 1,
    sample_rate: int = 16000,
    mono: bool = True,
    return_format: str = "array",
    output_ids: bool = False,
    sort_by_len: bool = False,
    io_threads: int = 0,
):
    """Universal input adapter: yields batches (lists) of audio arrays.

    source may be: a Kaldi dir, a list file / list of audio files, a single
    audio file (optionally with ':start-end' windows), a np.ndarray, or a
    list of ndarrays.  With output_ids=True, yields (audio, id) pairs.
    Matches reference dataset.py:647-826 semantics.

    io_threads>1 decodes/resamples files in an ordered thread pool
    (prefetch.prefetch_map) — the corpus-decode pipeline is otherwise
    ingest-bound on small hosts (PERF.md "sak-infer end-to-end").
    """
    from ssak_tpu.audio import load_audio

    def gen_rows():
        if isinstance(source, np.ndarray):
            yield {"id": "audio000", "array": source}
            return
        if isinstance(source, (list, tuple)):
            for i, item in enumerate(source):
                if isinstance(item, np.ndarray):
                    yield {"id": f"audio{i:03d}", "array": item}
                else:
                    yield from _file_rows(item)
            return
        if isinstance(source, str):
            if os.path.isdir(source):
                _meta, rows = kaldi_folder_to_manifest(source, sort_by_len=1 if sort_by_len else 0)
                yield from rows
                return
            yield from _file_rows(source)
            return
        raise ValueError(f"unsupported audio source: {type(source)}")

    def _file_rows(item):
        path, windows = _parse_audio_spec(item)
        ext = os.path.splitext(path)[1].lower()
        if ext in (".wav", ".mp3", ".flac") or path.rstrip().endswith("|"):
            base = os.path.splitext(os.path.basename(path))[0]
            if windows:
                for start, end in windows:
                    yield {"id": f"{base}_{start:.2f}-{end:.2f}", "audio": path, "start": start, "end": end}
            else:
                yield {"id": base, "audio": path, "start": None, "end": None}
        elif os.path.isfile(path):
            # treat as a list file of audio paths or kaldi dirs
            with open(path, encoding="utf-8") as f:
                for line in f:
                    line = os.path.expandvars(line.strip())
                    if not line:
                        continue
                    if os.path.isdir(line.split()[0]):
                        _meta, rows = kaldi_folder_to_manifest(line.split()[0])
                        yield from rows
                    else:
                        yield from _file_rows(line)
        else:
            raise FileNotFoundError(path)

    def _load_row(row):
        if "array" in row:
            return row, np.asarray(row["array"], dtype=np.float32)
        return row, load_audio(row["audio"], start=row.get("start"), end=row.get("end"), sample_rate=sample_rate, mono=mono)

    if io_threads and io_threads > 1:
        from ssak_tpu.data.prefetch import prefetch_map

        loaded = prefetch_map(_load_row, gen_rows(), workers=io_threads, depth=4 * io_threads)
    else:
        loaded = map(_load_row, gen_rows())

    batch, ids = [], []
    for row, audio in loaded:
        if return_format == "bytes":
            from ssak_tpu.audio import array_to_bytes

            audio = array_to_bytes(audio)
        elif return_format == "jax":
            import jax.numpy as jnp

            audio = jnp.asarray(audio)
        batch.append(audio)
        ids.append(row["id"])
        if len(batch) == batch_size:
            yield (batch, ids) if output_ids else batch
            batch, ids = [], []
    if batch:
        yield (batch, ids) if output_ids else batch


# --- TPU bucketed batching ------------------------------------------------

DEFAULT_BUCKETS = (1.0, 2.0, 4.0, 8.0, 15.0, 30.0)


def duration_buckets(rows, buckets=DEFAULT_BUCKETS):
    """Assign each row to the smallest bucket >= duration; returns dict
    bucket_seconds -> list of rows.  Rows longer than the largest bucket go
    to the largest (they will be chunked downstream)."""
    out = {b: [] for b in buckets}
    top = buckets[-1]
    for r in rows:
        d = r.get("duration") or 0.0
        for b in buckets:
            if d <= b:
                out[b].append(r)
                break
        else:
            out[top].append(r)
    return {b: rs for b, rs in out.items() if rs}


def padded_batch(audios, pad_to: int):
    """Stack 1-D float32 arrays into (B, pad_to) + lengths (B,)."""
    B = len(audios)
    x = np.zeros((B, pad_to), dtype=np.float32)
    lens = np.zeros((B,), dtype=np.int32)
    for i, a in enumerate(audios):
        n = min(len(a), pad_to)
        x[i, :n] = a[:n]
        lens[i] = n
    return x, lens


def bucketed_audio_batches(
    rows,
    batch_size: int,
    sample_rate: int = 16000,
    buckets=DEFAULT_BUCKETS,
    output_rows: bool = False,
    drop_remainder: bool = False,
    seed: int = None,
):
    """Yield (audio (B, T_bucket), lengths (B,), [rows]) with static T per
    bucket — one XLA compilation per (bucket, batch_size)."""
    from ssak_tpu.audio import load_audio

    by_bucket = duration_buckets(rows, buckets)
    order = list(by_bucket.items())
    if seed is not None:
        rng = random.Random(seed)
        for _b, rs in order:
            rng.shuffle(rs)
    for b, rs in order:
        pad_to = int(round(b * sample_rate))
        for i in range(0, len(rs), batch_size):
            chunk = rs[i : i + batch_size]
            if drop_remainder and len(chunk) < batch_size:
                continue
            audios = [
                load_audio(r["audio"], start=r.get("start"), end=r.get("end"), sample_rate=sample_rate)
                for r in chunk
            ]
            # pad the batch itself up to batch_size for fully static shapes
            while len(audios) < batch_size:
                audios.append(np.zeros(1, dtype=np.float32))
                chunk = chunk + [None]
            x, lens = padded_batch(audios, pad_to)
            if output_rows:
                yield x, lens, chunk
            else:
                yield x, lens
