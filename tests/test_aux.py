"""Auxiliary subsystems: gender, language-ID, YAML config, tarred datasets,
profiler helper."""

import os

import numpy as np
import pytest


class TestGender:
    def _voice(self, f0, sr=16000, dur=1.0):
        t = np.arange(int(sr * dur)) / sr
        # glottal-ish: f0 + harmonics
        x = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, 5))
        return (0.3 * x / np.abs(x).max()).astype(np.float32)

    def test_pitch_estimate(self):
        from ssak_tpu.utils.gender import estimate_f0_autocorr

        f0 = estimate_f0_autocorr(self._voice(120.0))
        assert abs(f0 - 120) < 15
        f0 = estimate_f0_autocorr(self._voice(220.0))
        assert abs(f0 - 220) < 20

    def test_predict_gender_heuristic(self):
        from ssak_tpu.utils.gender import predict_gender

        assert predict_gender(self._voice(110.0)) == "m"
        assert predict_gender(self._voice(230.0)) == "f"
        p = predict_gender(self._voice(230.0), return_proba=True)
        assert p["f"] > 0.8


class TestLanguageID:
    def test_detect(self):
        from ssak_tpu.utils.language import detect_language

        assert detect_language("le chat est sur la table et il mange")[0] == "fr"
        assert detect_language("the cat is on the table and it eats")[0] == "en"
        assert detect_language("привет как дела сегодня")[0] == "ru"
        assert detect_language("مرحبا كيف حالك اليوم")[0] == "ar"

    def test_check_language(self):
        from ssak_tpu.utils.language import check_language

        assert check_language("bonjour tout le monde c'est une belle journée", "fr")
        assert not check_language("привет мир", "fr")

    def test_hate_filter(self):
        from ssak_tpu.utils.language import is_hate_speech

        assert not is_hate_speech("bonjour tout le monde", "fr")
        assert is_hate_speech("espèce de connard", "fr")


class TestConfig:
    def test_load_with_refs_and_overrides(self, tmp_path):
        from ssak_tpu.utils.config import load_config

        p = tmp_path / "c.yaml"
        p.write_text(
            "base_lr: 0.001\noptim:\n  lr: ${base_lr}\n  steps: 100\ndata:\n  path: /x/${name}\nname: run1\n"
        )
        cfg = load_config(str(p), overrides=["optim.steps=200", "name=run2"])
        assert cfg["optim"]["lr"] == 0.001
        assert cfg["optim"]["steps"] == 200
        assert cfg["data"]["path"] == "/x/run2"

    def test_flatten(self):
        from ssak_tpu.utils.config import flatten_config

        assert flatten_config({"a": {"b": 1}, "c": 2}) == {"a.b": 1, "c": 2}


class TestTarredDataset:
    def test_roundtrip(self, tmp_path, tmp_audio_dir):
        from ssak_tpu.data.tarred import create_tarred_dataset, iterate_tarred_dataset

        tone = os.path.join(tmp_audio_dir, "tone16k.wav")
        rows = [
            {"id": f"u{i}", "audio": tone, "start": 0.0, "end": 0.5 + 0.2 * (i % 3), "duration": 0.5 + 0.2 * (i % 3), "text": f"t{i}"}
            for i in range(10)
        ]
        out = str(tmp_path / "tarred")
        meta = create_tarred_dataset(rows, out, buckets=(1.0, 2.0), shard_size=4)
        assert sum(b["n_utts"] for b in meta["buckets"].values()) == 10
        seen = []
        for x, lens, batch_rows in iterate_tarred_dataset(out, batch_size=4):
            assert x.shape[1] in (16000, 32000)
            assert x.dtype == np.float32
            seen.extend(r["id"] for r in batch_rows if r)
        assert sorted(seen) == sorted(r["id"] for r in rows)

    def test_multihost_interleave(self, tmp_path, tmp_audio_dir):
        from ssak_tpu.data.tarred import create_tarred_dataset, iterate_tarred_dataset

        tone = os.path.join(tmp_audio_dir, "tone16k.wav")
        rows = [{"id": f"u{i}", "audio": tone, "start": 0.0, "end": 0.5, "duration": 0.5, "text": ""} for i in range(8)]
        out = str(tmp_path / "tarred2")
        create_tarred_dataset(rows, out, buckets=(1.0,), shard_size=2)  # 4 shards
        ids0 = [r["id"] for _x, _l, rs in iterate_tarred_dataset(out, 2, process_index=0, process_count=2) for r in rs if r]
        ids1 = [r["id"] for _x, _l, rs in iterate_tarred_dataset(out, 2, process_index=1, process_count=2) for r in rs if r]
        assert not (set(ids0) & set(ids1))
        assert len(ids0) + len(ids1) == 8


class TestDocExtraction:
    """Stdlib-only office-document text extraction (reference
    tools/scraping/scrape_docs.py doc2text:31)."""

    def _mk_docx(self, path):
        import zipfile

        doc = (
            '<?xml version="1.0"?>'
            '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
            "<w:body><w:p><w:r><w:t>Bonjour tout le monde.</w:t></w:r></w:p>"
            "<w:p><w:r><w:t>Deuxième </w:t></w:r><w:r><w:t>paragraphe.</w:t></w:r></w:p>"
            "</w:body></w:document>"
        )
        with zipfile.ZipFile(path, "w") as z:
            z.writestr("word/document.xml", doc)

    def _mk_odt(self, path):
        import zipfile

        content = (
            '<?xml version="1.0"?>'
            '<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
            'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
            "<office:body><office:text><text:p>Un texte ODT.</text:p>"
            "<text:h>Titre</text:h></office:text></office:body></office:document-content>"
        )
        with zipfile.ZipFile(path, "w") as z:
            z.writestr("content.xml", content)

    def _mk_xlsx(self, path):
        import zipfile

        shared = (
            '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<si><t>cellule</t></si></sst>"
        )
        sheet = (
            '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            '<sheetData><row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row></sheetData></worksheet>'
        )
        with zipfile.ZipFile(path, "w") as z:
            z.writestr("xl/sharedStrings.xml", shared)
            z.writestr("xl/worksheets/sheet1.xml", sheet)

    def _mk_pdf(self, path):
        import zlib

        content = b"BT /F1 12 Tf (Hello PDF world) Tj ET"
        compressed = zlib.compress(content)
        pdf = (
            b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(compressed)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + compressed + b"\nendstream\nendobj\n%%EOF\n"
        )
        with open(path, "wb") as f:
            f.write(pdf)

    def test_docx(self, tmp_path):
        from ssak_tpu.utils.docs import doc2text

        p = tmp_path / "a.docx"
        self._mk_docx(str(p))
        text = doc2text(str(p))
        assert "Bonjour tout le monde." in text
        assert "Deuxième paragraphe." in text

    def test_odt(self, tmp_path):
        from ssak_tpu.utils.docs import doc2text

        p = tmp_path / "a.odt"
        self._mk_odt(str(p))
        assert doc2text(str(p)) == "Un texte ODT.\nTitre"

    def test_xlsx(self, tmp_path):
        from ssak_tpu.utils.docs import doc2text

        p = tmp_path / "a.xlsx"
        self._mk_xlsx(str(p))
        assert doc2text(str(p)) == "cellule\t42"

    def test_pdf(self, tmp_path):
        from ssak_tpu.utils.docs import doc2text

        p = tmp_path / "a.pdf"
        self._mk_pdf(str(p))
        assert "Hello PDF world" in doc2text(str(p))

    def test_scrape_docs_cli(self, tmp_path):
        import subprocess
        import sys

        d = tmp_path / "docs"
        d.mkdir()
        self._mk_docx(str(d / "a.docx"))
        self._mk_odt(str(d / "b.odt"))
        r = subprocess.run([sys.executable, "/root/repo/tools/scrape_docs.py", str(d),
                            "--output_dir", str(tmp_path / "txt")],
                           capture_output=True, text=True, cwd=str(tmp_path), timeout=300)
        assert r.returncode == 0, r.stderr[-1500:]
        assert sorted(os.listdir(tmp_path / "txt")) == ["a.txt", "b.txt"]


class TestClusterFiles:
    def test_touch_and_corrupt(self, tmp_path):
        import subprocess
        import sys

        d = tmp_path / "data"
        d.mkdir()
        (d / "x.txt").write_text("hello")
        r = subprocess.run([sys.executable, "/root/repo/tools/cluster_files.py", "touch", str(d)],
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0 and "touched 1 files" in r.stdout

        src = d / "tone.bin"
        src.write_bytes(bytes(range(256)) * 8)
        dst = tmp_path / "corrupted.bin"
        r = subprocess.run([sys.executable, "/root/repo/tools/cluster_files.py", "corrupt",
                            str(src), str(dst), "--bits", "3", "--seed", "7"],
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr[-800:]
        a, b = src.read_bytes(), dst.read_bytes()
        assert len(a) == len(b) and a != b
        assert a[:128] == b[:128]  # header preserved
        diff_bits = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
        assert diff_bits == 3


class TestTranslateGate:
    def test_offline_raises(self, monkeypatch):
        import pytest as _pytest

        from ssak_tpu.utils.language import translate_language

        monkeypatch.delenv("SSAK_TRANSLATE_ENDPOINT", raising=False)
        with _pytest.raises(RuntimeError, match="translation service"):
            translate_language("bonjour", dest="en")
