"""Composable corpus -> Kaldi importer framework.

Counterpart of reference ssak/utils/kaldi_converter.py (Reader2Kaldi:12
executing ordered ToKaldi processors merged on ids): each processor
contributes columns for a set of row ids; Reader2Kaldi runs them in order,
merges on id, and emits a KaldiDataset ready to save().
"""

import os
import re

from ssak_tpu.data.kaldi_dataset import KaldiDataset, KaldiDatasetRow
from ssak_tpu.utils.misc import walk_files


class ToKaldi:
    """Base processor: returns {row_id: {column: value}} updates."""

    def process(self, rows: dict, root: str) -> dict:
        raise NotImplementedError


class AudioFolder2Kaldi(ToKaldi):
    """Discover audio files under a folder; id = filename stem
    (reference AudioFolder2Kaldi:111)."""

    def __init__(self, subdir: str = "", extensions=(".wav", ".mp3", ".flac"), id_from=os.path.basename):
        self.subdir = subdir
        self.extensions = extensions
        self.id_from = id_from

    def process(self, rows, root):
        folder = os.path.join(root, self.subdir)
        for path in walk_files(folder):
            if path.lower().endswith(self.extensions):
                rid = os.path.splitext(self.id_from(path))[0]
                rows.setdefault(rid, {})["audio_path"] = path
        return rows


class TextFolder2Kaldi(ToKaldi):
    """One .txt per utterance id (reference TextFolder2Kaldi:144)."""

    def __init__(self, subdir: str = "", extension: str = ".txt"):
        self.subdir = subdir
        self.extension = extension

    def process(self, rows, root):
        folder = os.path.join(root, self.subdir)
        for path in walk_files(folder):
            if path.endswith(self.extension):
                rid = os.path.splitext(os.path.basename(path))[0]
                with open(path, encoding="utf-8") as f:
                    rows.setdefault(rid, {})["text"] = f.read().strip()
        return rows


class ColumnFile2Kaldi(ToKaldi):
    """Delimited file with one row per utterance; columns named by
    `columns` (use 'id', 'text', 'speaker', 'start', 'end', 'gender',
    'audio_path', or None to skip) (reference ColumnFile2Kaldi:244)."""

    def __init__(self, path: str, columns, sep: str = "\t", skip_header: bool = False):
        self.path = path
        self.columns = columns
        self.sep = sep
        self.skip_header = skip_header

    def process(self, rows, root):
        path = os.path.join(root, self.path)
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if self.skip_header and i == 0:
                    continue
                vals = line.rstrip("\n").split(self.sep)
                entry = {c: v for c, v in zip(self.columns, vals) if c}
                rid = entry.pop("id", None)
                if rid is None:
                    continue
                for k in ("start", "end"):
                    if k in entry:
                        entry[k] = float(entry[k])
                rows.setdefault(rid, {}).update(entry)
        return rows


class Row2Info(ToKaldi):
    """Derive a column from the id via regex (reference Row2Info:217),
    e.g. speaker from 'spk1-utt003'."""

    def __init__(self, column: str, pattern: str, group: int = 1):
        self.column = column
        self.rx = re.compile(pattern)
        self.group = group

    def process(self, rows, root):
        for rid, cols in rows.items():
            m = self.rx.search(rid)
            if m:
                cols.setdefault(self.column, m.group(self.group))
        return rows


class Row2Duration(ToKaldi):
    """Compute duration from the audio header (reference Row2Duration:235)."""

    def process(self, rows, root):
        from ssak_tpu.audio import get_audio_duration

        for rid, cols in rows.items():
            if "duration" not in cols and cols.get("audio_path"):
                try:
                    cols["duration"] = get_audio_duration(cols["audio_path"])
                except Exception:
                    pass
        return rows


class TextRegexFilter(ToKaldi):
    """Drop rows whose text matches (or doesn't match) a regex
    (reference TextRegexFilter:195)."""

    def __init__(self, pattern: str, keep_matching: bool = False):
        self.rx = re.compile(pattern)
        self.keep = keep_matching

    def process(self, rows, root):
        out = {}
        for rid, cols in rows.items():
            has = bool(self.rx.search(cols.get("text", "")))
            if has == self.keep:
                out[rid] = cols
        return out


class Reader2Kaldi:
    """Run processors in order over a corpus root; merge on ids
    (reference Reader2Kaldi:12)."""

    def __init__(self, root: str, processors):
        self.root = root
        self.processors = processors

    def load(self, require=("audio_path",)) -> KaldiDataset:
        rows = {}
        for proc in self.processors:
            rows = proc.process(rows, self.root)
        ds = KaldiDataset(name=os.path.basename(os.path.normpath(self.root)))
        for rid in sorted(rows):
            cols = rows[rid]
            if any(cols.get(k) is None for k in require):
                continue
            ds.append(KaldiDatasetRow(id=rid, **{k: v for k, v in cols.items() if k in KaldiDatasetRow.__dataclass_fields__}))
        return ds
