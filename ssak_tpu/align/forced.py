"""CTC forced alignment: transcript -> word/char timestamps.

Counterpart of reference ssak/utils/align_transcriptions.py
(compute_alignment:294, get_trellis:27, backtrack:79, merge_repeats:141,
merge_words:159): the trellis DP runs as a vectorized lax.scan on device
(ssak_tpu.ops.ctc.ctc_alignment_trellis) instead of the reference's Python
time loop; host code merges the Viterbi path into char/word segments with
per-segment scores.
"""

from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp


@dataclass
class Segment:
    label: str
    start: int  # frame index
    end: int    # frame index (exclusive)
    score: float

    def to_seconds(self, ratio: float):
        return Segment(self.label, self.start * ratio, self.end * ratio, self.score)


def tokenize_transcript(transcript: str, vocab, word_delimiter: str = "|", fallback_char=None):
    """Map transcript chars to token ids with loose fallback (case,
    accent-stripping — reference loose_get_char_index:406)."""
    from ssak_tpu.text.basic import transliterate

    index = {}
    for i, tok in enumerate(vocab):
        index.setdefault(tok, i)
    ids = []
    chars = []
    text = transcript.replace(" ", word_delimiter)
    for ch in text:
        cand = [ch, ch.lower(), ch.upper(), transliterate(ch), transliterate(ch).lower()]
        tid = None
        for c in cand:
            if c in index:
                tid = index[c]
                break
        if tid is None:
            if fallback_char is not None and fallback_char in index:
                tid = index[fallback_char]
            else:
                continue  # drop unknown char
        ids.append(tid)
        chars.append(ch)
    return np.asarray(ids, np.int32), chars


def compute_alignment(
    log_probas: np.ndarray,
    transcript: str,
    vocab,
    blank_id: int = 0,
    word_delimiter: str = "|",
    use_max: bool = True,
):
    """Align one utterance.

    log_probas: (T, V) log-softmax frames. Returns (char_segments,
    word_segments, frame_ratio_placeholder) where segments hold frame
    indices; callers convert with seconds = frame * total_seconds / T.
    """
    from ssak_tpu.ops.ctc import ctc_alignment_trellis

    tokens, chars = tokenize_transcript(transcript, vocab, word_delimiter)
    if len(tokens) == 0:
        return [], []
    T = log_probas.shape[0]
    if T < len(tokens):
        # not enough frames: degenerate uniform alignment
        char_segs = [Segment(c, int(i * T / len(chars)), int((i + 1) * T / len(chars)), 0.0) for i, c in enumerate(chars)]
        return char_segs, merge_words(char_segs, word_delimiter)

    trellis, path = ctc_alignment_trellis(jnp.asarray(log_probas), jnp.asarray(tokens), blank_id=blank_id, use_max=use_max)
    path = np.asarray(path)  # (T,) state indices in extended graph (2U+1)
    probs = np.exp(np.asarray(log_probas))

    # state s odd -> label (s-1)//2 ; collect frames per label occurrence
    char_segs = []
    for u, ch in enumerate(chars):
        s = 2 * u + 1
        frames = np.where(path == s)[0]
        if len(frames) == 0:
            # label skipped by viterbi path: place at neighbor boundary
            prev_end = char_segs[-1].end if char_segs else 0
            char_segs.append(Segment(ch, prev_end, prev_end, 0.0))
            continue
        start, end = int(frames[0]), int(frames[-1]) + 1
        score = float(np.mean(probs[frames, tokens[u]]))
        char_segs.append(Segment(ch, start, end, score))
    return char_segs, merge_words(char_segs, word_delimiter)


def merge_words(char_segments, word_delimiter: str = "|"):
    """Group char segments into word segments with averaged scores
    (reference merge_words:159)."""
    words = []
    cur = []
    for seg in char_segments:
        if seg.label == word_delimiter or seg.label == " ":
            if cur:
                words.append(_merge(cur))
                cur = []
        else:
            cur.append(seg)
    if cur:
        words.append(_merge(cur))
    return words


def _merge(segs):
    label = "".join(s.label for s in segs)
    scores = [s.score for s in segs if s.end > s.start]
    return Segment(label, segs[0].start, segs[-1].end, float(np.mean(scores)) if scores else 0.0)


def align_audio_to_transcript(model, audio: np.ndarray, transcript: str, sample_rate: int = 16000):
    """Full pipeline for one utterance: model log-probs -> word timestamps
    in SECONDS. model: LoadedModel (CTC)."""
    from ssak_tpu.infer.ctc_infer import ctc_compute_logits_chunked

    lp = ctc_compute_logits_chunked(model, audio)
    vocab = model.vocab()
    chars, words = compute_alignment(lp, transcript, vocab, blank_id=model.cfg.blank_id)
    ratio = (len(audio) / sample_rate) / max(1, lp.shape[0])
    return [w.to_seconds(ratio) for w in words]
