"""Word-lexicon constraint for CTC beam decoding.

The Vosk/Kaldi capability row of SURVEY §2.3: the reference's most-used
production decoder (ssak/infer/kaldi_infer.py:119-175) decodes through a
WFST composed with a pronunciation lexicon, so hypotheses can only be
in-vocabulary words. Here the same constraint is a character trie composed
with the host prefix beam (decode/ctc_beam.ctc_prefix_beam_search): a
hypothesis may only grow along valid word prefixes, may only emit a word
delimiter on a complete word, and a trailing partial must be completable.
Stacks with n-gram shallow fusion (the graph-scale grammar role of the
WFST's G component).
"""

__all__ = ["Lexicon"]


class Lexicon:
    """Character-trie membership over a word list, stored as two hash sets
    (all prefixes + complete words): O(1) per beam extension, no pointer
    chasing, and small enough for million-word lexicons (a few hundred MB
    of Python strings at Vosk-model scale, same order as Vosk's HCLG)."""

    def __init__(self, words):
        self.words = set()
        self.prefixes = set()
        for w in words:
            w = w.strip()
            if not w:
                continue
            self.words.add(w)
            for i in range(1, len(w) + 1):
                self.prefixes.add(w[:i])

    def __len__(self):
        return len(self.words)

    @classmethod
    def from_file(cls, path: str):
        """One word per line, or Kaldi lexicon.txt ('word phone phone ...'
        — first column taken, the pronunciation is the WFST's business,
        not the CTC beam's)."""
        words = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                cols = line.split()
                if cols:
                    words.append(cols[0])
        return cls(words)

    def has_word(self, w: str) -> bool:
        return w in self.words

    def has_prefix(self, p: str) -> bool:
        return p in self.prefixes
