"""Transcription/diarization format tests + remote client against a local
stub HTTP server (no network)."""

import json
import os
import threading

import pytest


class TestTranscription:
    def test_from_text(self):
        from ssak_tpu.formats import to_transcription

        out = to_transcription("bonjour tout le monde", format="text")
        assert out["transcription_result"] == "bonjour tout le monde"
        assert len(out["segments"]) == 1

    def test_from_whisper_json(self):
        from ssak_tpu.formats import to_transcription

        d = {
            "text": "bonjour monde",
            "segments": [
                {"start": 0.0, "end": 1.0, "text": " bonjour", "words": [{"word": " bonjour", "start": 0.0, "end": 1.0, "probability": 0.9}]},
                {"start": 1.0, "end": 2.0, "text": " monde", "words": [{"word": " monde", "start": 1.0, "end": 2.0, "probability": 0.8}]},
            ],
        }
        out = to_transcription(d)
        assert out["transcription_result"] == "bonjour monde"
        assert out["segments"][0]["words"][0]["word"] == "bonjour"

    def test_from_srt(self):
        from ssak_tpu.formats import to_transcription

        srt = "1\n00:00:01,000 --> 00:00:02,500\nBonjour !\n\n2\n00:00:03,000 --> 00:00:04,000\nAu revoir.\n"
        out = to_transcription(srt, format="srt")
        assert len(out["segments"]) == 2
        assert out["segments"][0]["start"] == 1.0
        assert out["segments"][1]["segment"] == "Au revoir."

    def test_from_textgrid(self):
        from ssak_tpu.formats import to_transcription

        tg = '''File type = "ooTextFile"
    item [1]:
        intervals [1]:
            xmin = 0.5
            xmax = 1.5
            text = "bonjour"
        intervals [2]:
            xmin = 1.5
            xmax = 2.0
            text = ""
'''
        out = to_transcription(tg, format="textgrid")
        assert len(out["segments"]) == 1
        assert out["segments"][0]["segment"] == "bonjour"

    def test_from_csv(self):
        from ssak_tpu.formats import to_transcription

        csv = "start,end,speaker,text\n0.0,1.0,spk1,bonjour\n1.0,2.0,spk2,salut\n"
        out = to_transcription(csv, format="csv")
        assert out["segments"][1]["spk_id"] == "spk2"

    def test_hallucination_filter(self):
        from ssak_tpu.formats import remove_hallucinations

        t = remove_hallucinations("bonjour Sous-titres réalisés par la communauté d'Amara.org")
        assert t == "bonjour"

    def test_diarization_merge(self):
        from ssak_tpu.formats.transcription import SpeechSegment, TranscriptionResult, Word

        r = TranscriptionResult(segments=[
            SpeechSegment(start=0, end=4, raw_segment="a b c d", segment="a b c d",
                          words=[Word("a", 0, 1), Word("b", 1, 2), Word("c", 2, 3), Word("d", 3, 4)])
        ])
        diar = [{"spk_id": "s1", "seg_begin": 0, "seg_end": 2}, {"spk_id": "s2", "seg_begin": 2, "seg_end": 4}]
        r.set_diarization(diar)
        assert len(r.segments) == 2
        assert r.segments[0].spk_id == "s1" and r.segments[0].segment == "a b"
        assert r.segments[1].spk_id == "s2" and r.segments[1].segment == "c d"


class TestDiarization:
    def test_rttm_roundtrip(self, tmp_path):
        from ssak_tpu.formats import import_rttm, json2rttm, to_diarization

        rttm = "SPEAKER file 1 0.50 1.00 <NA> <NA> spkA <NA> <NA>\nSPEAKER file 1 2.00 1.50 <NA> <NA> spkB <NA> <NA>\n"
        segs = import_rttm(rttm.splitlines())
        assert segs[0] == {"spk_id": "spkA", "seg_begin": 0.5, "seg_end": 1.5}
        d = to_diarization(segs)
        assert [s["spk_id"] for s in d["speakers"]] == ["spkA", "spkB"]
        back = json2rttm(d)
        segs2 = import_rttm(back.splitlines())
        assert segs2 == segs

    def test_overlap_removal(self):
        from ssak_tpu.formats import to_diarization

        segs = [
            {"spk_id": "a", "seg_begin": 0.0, "seg_end": 3.0},
            {"spk_id": "b", "seg_begin": 2.0, "seg_end": 5.0},
        ]
        d = to_diarization(segs)
        assert d["segments"][0]["seg_end"] == d["segments"][1]["seg_begin"] == 2.5


class TestRemoteClient:
    @pytest.fixture()
    def stub_server(self):
        """Minimal LinTO-like HTTP server."""
        from http.server import BaseHTTPRequestHandler, HTTPServer

        state = {"polls": 0}

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                assert b"transcriptionConfig" in body
                self._json({"jobid": "job42"})

            def do_GET(self):
                if self.path.startswith("/job/"):
                    state["polls"] += 1
                    if state["polls"] < 2:
                        self._json({"state": "started"})
                    else:
                        self._json({"state": "done", "result_id": "res7"})
                elif self.path.startswith("/results/"):
                    self._json({"transcription_result": "bonjour", "raw_transcription": "bonjour", "confidence": 0.9, "segments": []})
                else:
                    self.send_error(404)

            def _json(self, obj):
                data = json.dumps(obj).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        srv = HTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_port}"
        srv.shutdown()

    def test_remote_transcribe(self, stub_server, tmp_audio_dir):
        import os

        from ssak_tpu.remote import remote_transcribe

        out = remote_transcribe(
            stub_server, os.path.join(tmp_audio_dir, "tone16k.wav"), ping_interval=0.05
        )
        assert out["transcription_result"] == "bonjour"

    def test_config_builder(self):
        from ssak_tpu.remote import build_transcription_config

        cfg = build_transcription_config(language="fr", diarization=True, n_speakers=2)
        assert cfg["diarizationConfig"]["enableDiarization"] is True
        assert cfg["diarizationConfig"]["numberOfSpeaker"] == 2


class TestVoiceLab:
    """Round-trip of the LeVoiceLab exchange format (reference
    tools/LeVoiceLab/kaldi_to_voicelab.py / voicelab_to_kaldi.py)."""

    def _mk_kaldi(self, tmp_path):
        import numpy as np

        from ssak_tpu.audio import save_audio
        from ssak_tpu.data.kaldi_dataset import KaldiDataset, KaldiDatasetRow

        wav = tmp_path / "rec one.wav"
        sr = 16000
        t = np.arange(sr * 3) / sr
        save_audio(str(wav), (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), sr)
        rows = [
            KaldiDatasetRow(id="u1", audio_id="rec", audio_path=str(wav), start=0.1, end=0.9,
                            text="bonjour madame", speaker="Alice_Dupont", gender="f"),
            # overlapping the first -> must be clipped at the midpoint
            KaldiDatasetRow(id="u2", audio_id="rec", audio_path=str(wav), start=0.7, end=1.8,
                            text="merci bien", speaker="Bob_Martin", gender="m"),
        ]
        d = tmp_path / "kd"
        KaldiDataset(rows).save(str(d))
        return str(d)

    def test_export_import_roundtrip(self, tmp_path):
        import json

        from ssak_tpu.formats.voicelab import kaldi_to_voicelab, voicelab_to_kaldi

        kd = self._mk_kaldi(tmp_path)
        db = str(tmp_path / "db")
        kaldi_to_voicelab(kd, db, name="TestCorpus")

        meta = json.load(open(os.path.join(db, "meta.json")))
        assert meta["num_audio_files"] == 1
        assert meta["sample_rate"] == 16000
        assert meta["extra"]["num_speakers"] == 2
        assert meta["extra"]["gender"] == {"female": 1, "male": 1}
        audio_files = [f for f in os.listdir(db) if f.endswith(".audio.wav")]
        assert len(audio_files) == 1

        annotdirs = [d for d in os.listdir(db) if os.path.isdir(os.path.join(db, d))]
        assert len(annotdirs) == 1
        annots = [f for f in os.listdir(os.path.join(db, annotdirs[0])) if f.endswith(".annotations.json")]
        a = json.load(open(os.path.join(db, annotdirs[0], annots[0])))
        ts = a["transcripts"]
        assert len(ts) == 2
        # overlap clipped at midpoint of [0.7, 0.9] = 0.8
        assert ts[0]["timestamp_end_milliseconds"] == 800
        assert ts[1]["timestamp_start_milliseconds"] == 800
        assert ts[0]["speaker"] == "Alice_Dupont"

        out_kd = str(tmp_path / "kd2")
        voicelab_to_kaldi(db, out_kd)
        text = {l.split()[0]: " ".join(l.split()[1:]) for l in open(os.path.join(out_kd, "text"))}
        assert sorted(text.values()) == ["bonjour madame", "merci bien"]
        segs = [l.split() for l in open(os.path.join(out_kd, "segments"))]
        assert len(segs) == 2
        u2s = dict(l.split() for l in open(os.path.join(out_kd, "utt2spk")))
        assert "alicedupont" in set(u2s.values())

    def test_augment_database(self, tmp_path):
        import json

        import numpy as np

        from ssak_tpu.audio import load_audio
        from ssak_tpu.formats.voicelab import augment_database, kaldi_to_voicelab

        kd = self._mk_kaldi(tmp_path)
        db = str(tmp_path / "db")
        kaldi_to_voicelab(kd, db, name="TestCorpus")
        out = str(tmp_path / "db_aug")
        augment_database(db, out, seed=1)
        meta = json.load(open(os.path.join(out, "meta.json")))
        assert meta["contains_augmented_speech"] is True
        orig_wav = next(f for f in os.listdir(db) if f.endswith(".audio.wav"))
        a0 = load_audio(os.path.join(db, orig_wav))
        a1 = load_audio(os.path.join(out, orig_wav))
        assert len(a0) == len(a1)  # timestamps stay valid
        assert not np.allclose(a0, a1)
        # annotations copied verbatim
        annotdir = next(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
        assert any(f.endswith(".annotations.json") for f in os.listdir(os.path.join(out, annotdir)))

    def test_voicelab_cli(self, tmp_path):
        import subprocess
        import sys

        kd = self._mk_kaldi(tmp_path)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run([sys.executable, "/root/repo/tools/voicelab.py", "export", kd, str(tmp_path / "dbc")],
                           capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=300)
        assert r.returncode == 0, r.stderr[-1500:]
        r = subprocess.run([sys.executable, "/root/repo/tools/voicelab.py", "import", str(tmp_path / "dbc"), str(tmp_path / "kdc")],
                           capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=300)
        assert r.returncode == 0, r.stderr[-1500:]
        assert os.path.exists(tmp_path / "kdc" / "wav.scp")
