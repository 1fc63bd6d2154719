"""Tokenizers: Whisper BPE, wav2vec2 CTC character vocab, trainable BPE.

Replaces the reference's reliance on HF processors and SentencePiece
(speechbrain/wav2vec_train.py:583-604 trains SentencePiece; transformers
Wav2Vec2Processor holds the char vocab): Whisper's byte-level BPE is loaded
with the `tokenizers` runtime from a checkpoint dir; CTC char vocabs are
plain vocab.json files; new subword vocabs are trained with BPE (the
SentencePiece-equivalent capability).
"""

import json
import os
import re


class WhisperTokenizer:
    """Byte-level BPE tokenizer from a HF Whisper checkpoint directory."""

    def __init__(self, model_dir: str):
        from tokenizers import Tokenizer

        tk_json = os.path.join(model_dir, "tokenizer.json")
        if os.path.exists(tk_json):
            self.tk = Tokenizer.from_file(tk_json)
        else:
            from tokenizers import ByteLevelBPETokenizer

            self.tk = ByteLevelBPETokenizer(
                os.path.join(model_dir, "vocab.json"),
                os.path.join(model_dir, "merges.txt"),
            )
        self._special = {}
        added = os.path.join(model_dir, "added_tokens.json")
        if os.path.exists(added):
            with open(added, encoding="utf-8") as f:
                self._special.update(json.load(f))
        # special tokens also live in the tokenizer itself
        for tok in ("<|startoftranscript|>", "<|endoftext|>", "<|transcribe|>", "<|translate|>", "<|notimestamps|>", "<|nospeech|>", "<|startofprev|>", "<|nocaptions|>"):
            tid = self.tk.token_to_id(tok)
            if tid is not None:
                self._special[tok] = tid

    def token_id(self, token: str):
        return self._special.get(token, self.tk.token_to_id(token))

    @property
    def sot(self):
        return self.token_id("<|startoftranscript|>")

    @property
    def eot(self):
        return self.token_id("<|endoftext|>")

    @property
    def no_timestamps(self):
        return self.token_id("<|notimestamps|>")

    @property
    def sot_prev(self):
        return self.token_id("<|startofprev|>")

    @property
    def no_speech(self):
        # large-v3-era checkpoints call it <|nospeech|>, older ones <|nocaptions|>
        return self.token_id("<|nospeech|>") or self.token_id("<|nocaptions|>")

    @property
    def timestamp_begin(self):
        # first timestamp token <|0.00|> follows <|notimestamps|>
        tid = self.token_id("<|0.00|>")
        return tid if tid is not None else (self.no_timestamps + 1)

    def language_token(self, language: str):
        tid = self.token_id(f"<|{language}|>")
        if tid is None:
            raise ValueError(f"unknown language token: {language}")
        return tid

    def sot_sequence(self, language: str = None, task: str = "transcribe", timestamps: bool = False):
        seq = [self.sot]
        if language:
            seq.append(self.language_token(language))
            seq.append(self.token_id(f"<|{task}|>"))
        if not timestamps:
            seq.append(self.no_timestamps)
        return seq

    def encode(self, text: str):
        return self.tk.encode(text, add_special_tokens=False).ids

    def decode(self, ids, skip_special: bool = True):
        ids = [int(i) for i in ids]
        if skip_special:
            specials = set(self._special.values())
            ids = [i for i in ids if i not in specials and i < (self.eot or 10**9)]
        return self.tk.decode(ids)


class CTCTokenizer:
    """Character (or word-piece) vocab for CTC models, HF wav2vec2-style:
    vocab.json maps token -> id; '|' is the word delimiter; id of '<pad>'
    is the CTC blank."""

    def __init__(self, vocab, word_delimiter: str = "|", blank_token: str = "<pad>", unk_token: str = "<unk>"):
        if isinstance(vocab, str):
            path = vocab if vocab.endswith(".json") else os.path.join(vocab, "vocab.json")
            with open(path, encoding="utf-8") as f:
                vocab = json.load(f)
        self.vocab = dict(vocab)
        self.id2tok = {v: k for k, v in self.vocab.items()}
        self.word_delimiter = word_delimiter
        self.blank_id = self.vocab.get(blank_token, 0)
        self.unk_id = self.vocab.get(unk_token, self.blank_id)
        self.special = {blank_token, unk_token, "<s>", "</s>"}

    def __len__(self):
        return len(self.vocab)

    @classmethod
    def from_corpus(cls, texts, extra_tokens=("<pad>", "<s>", "</s>", "<unk>")):
        """Build a char vocab from corpus text (reference wav2vec_train
        builds vocab from dataset characters)."""
        chars = sorted({c for t in texts for c in t.replace(" ", "|")})
        vocab = {}
        for t in extra_tokens:
            vocab[t] = len(vocab)
        for c in chars:
            if c not in vocab:
                vocab[c] = len(vocab)
        return cls(vocab)

    def encode(self, text: str):
        text = text.replace(" ", self.word_delimiter)
        return [self.vocab.get(c, self.unk_id) for c in text]

    def decode(self, ids):
        toks = [self.id2tok.get(int(i), "") for i in ids if int(i) >= 0]
        out = "".join(t for t in toks if t not in self.special)
        return out.replace(self.word_delimiter, " ").strip()

    def save(self, path: str):
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.vocab, f, ensure_ascii=False, indent=1)


def train_bpe_tokenizer(texts, vocab_size: int = 1000, save_path: str = None, special_tokens=("<pad>", "<s>", "</s>", "<unk>")):
    """Train a BPE subword tokenizer on corpus text — the SentencePiece-
    equivalent capability (reference speechbrain/wav2vec_train.py:583-604)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tk = Tokenizer(models.BPE(unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(vocab_size=vocab_size, special_tokens=list(special_tokens))
    tk.train_from_iterator(texts, trainer)
    if save_path:
        tk.save(save_path)
    return tk
