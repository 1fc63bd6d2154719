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
