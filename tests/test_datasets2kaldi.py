"""End-to-end tests of the dataset-specific importers (tools/datasets2kaldi.py)
and the new stm/vtt corpus2kaldi subcommands, on tiny synthetic corpora laid
out like the real datasets (reference tools/kaldi/datasets2kaldi/*)."""

import os
import subprocess
import sys

import numpy as np
import pytest


def _tool(args, cwd, env_extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    return subprocess.run([sys.executable, *args], cwd=cwd, env=env, capture_output=True, text=True, timeout=600)


def _tone(path, seconds=1.0, sr=16000):
    from ssak_tpu.audio import save_audio

    t = np.arange(int(sr * seconds)) / sr
    save_audio(str(path), (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), sr)


def _read_kaldi(d):
    out = {}
    for f in ("text", "wav.scp", "utt2spk", "segments", "spk2gender", "utt2dur"):
        p = os.path.join(d, f)
        if os.path.exists(p):
            out[f] = [l.split() for l in open(p, encoding="utf-8").read().splitlines()]
    return out


class TestMls:
    def test_mls(self, tmp_path):
        root = tmp_path / "mls"
        (root / "dev" / "audio" / "1234" / "5678").mkdir(parents=True)
        _tone(root / "dev" / "audio" / "1234" / "5678" / "1234_5678_000001.wav")
        _tone(root / "dev" / "audio" / "1234" / "5678" / "1234_5678_000002.wav")
        (root / "dev" / "transcripts.txt").write_text(
            "1234_5678_000001\tbonjour tout le monde\n1234_5678_000002\tau revoir\n")
        (root / "metainfo.txt").write_text(
            "SPEAKER | GENDER | PARTITION\n1234 | F | dev\n")
        out = _tool(["/root/repo/tools/datasets2kaldi.py", "mls", str(root), str(tmp_path / "out"),
                     "--splits", "dev"], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-2000:]
        k = _read_kaldi(str(tmp_path / "out" / "dev"))
        assert len(k["text"]) == 2
        assert k["utt2spk"][0][1] == "1234"
        assert dict((s, g) for s, g in k["spk2gender"])["1234"] == "f"
        assert all(float(d[1]) > 0 for d in k["utt2dur"])


class TestTedx:
    def test_tedx(self, tmp_path):
        root = tmp_path / "tedx" / "valid"
        (root / "txt").mkdir(parents=True)
        (root / "wav").mkdir()
        _tone(root / "wav" / "talk1.wav", seconds=2.0)
        (root / "txt" / "segments").write_text(
            "talk1_0001 talk1 0.0 0.8\ntalk1_0002 talk1 0.9 1.9\n")
        (root / "txt" / "valid.fr").write_text("bonjour\nmerci beaucoup\n")
        out = _tool(["/root/repo/tools/datasets2kaldi.py", "tedx", str(tmp_path / "tedx"),
                     str(tmp_path / "out"), "--splits", "valid"], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-2000:]
        k = _read_kaldi(str(tmp_path / "out" / "valid"))
        assert [l[1:] for l in k["text"]] == [["bonjour"], ["merci", "beaucoup"]]
        assert k["segments"][0][1] == k["segments"][1][1]  # same recording
        assert k["utt2spk"][0][1] == "talk1"


TEXTGRID = """File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 2
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "transcript"
        xmin = 0
        xmax = 2
        intervals: size = 3
        intervals [1]:
            xmin = 0.0
            xmax = 0.8
            text = "bonjour"
        intervals [2]:
            xmin = 0.8
            xmax = 1.2
            text = ""
        intervals [3]:
            xmin = 1.2
            xmax = 1.9
            text = "salut"
"""


class TestPfc:
    def test_pfc(self, tmp_path):
        root = tmp_path / "pfc" / "sub"
        root.mkdir(parents=True)
        (root / "rec1.TextGrid").write_text(TEXTGRID)
        _tone(root / "rec1.mp3".replace(".mp3", ".wav"), seconds=2.0)  # wav accepted too
        out = _tool(["/root/repo/tools/datasets2kaldi.py", "pfc", str(tmp_path / "pfc"),
                     str(tmp_path / "out")], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-2000:]
        k = _read_kaldi(str(tmp_path / "out"))
        assert len(k["text"]) == 2
        assert k["segments"][0][2:] == ["0.000", "0.800"] or float(k["segments"][0][2]) == 0.0


TEI = """<?xml version="1.0" encoding="UTF-8"?>
<TEI xmlns="http://www.tei-c.org/ns/1.0">
 <teiHeader>
  <particDesc>
    <person xml:id="LOC1" sex="2"><persName>A</persName></person>
    <person xml:id="LOC2" sex="1"><persName>B</persName></person>
  </particDesc>
 </teiHeader>
 <text>
  <timeline>
    <when xml:id="T1" absolute="00:00:00.50"/>
    <when xml:id="T2" absolute="00:00:01.40"/>
    <when xml:id="T3" absolute="00:00:02.20"/>
  </timeline>
  <body>
    <anchor synch="#T1"/>
    <u who="#LOC1"><w>bonjour</w><w>madame</w><anchor synch="#T2"/></u>
    <anchor synch="#T2"/>
    <u who="#LOC2"><w>merci</w><w>bien</w><anchor synch="#T3"/></u>
  </body>
 </text>
</TEI>
"""


class TestClapi:
    def test_clapi(self, tmp_path):
        root = tmp_path / "clapi"
        root.mkdir()
        (root / "conv1.xml").write_text(TEI)
        _tone(root / "conv1.wav", seconds=3.0)
        out = _tool(["/root/repo/tools/datasets2kaldi.py", "clapi", str(root), str(tmp_path / "out")],
                    cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-2000:]
        k = _read_kaldi(str(tmp_path / "out"))
        texts = {" ".join(l[1:]) for l in k["text"]}
        assert "bonjour madame" in texts and "merci bien" in texts
        g = dict((s, v) for s, v in k["spk2gender"])
        assert set(g.values()) == {"m", "f"}
        # segment times come from the timeline
        seg = {l[0]: (float(l[2]), float(l[3])) for l in k["segments"]}
        assert any(abs(s - 0.5) < 1e-6 and abs(e - 1.4) < 1e-6 for s, e in seg.values())


class TestLesVocaux:
    def test_lesvocaux(self, tmp_path):
        root = tmp_path / "lv"
        (root / "txt").mkdir(parents=True)
        (root / "audio").mkdir()
        (root / "txt" / "spk1_001.txt").write_text("bonjour <nib> et au revoir…")
        _tone(root / "audio" / "spk1_001.wav")
        (root / "Speaker_metadata_fixed.csv").write_text("spk1,f\n")
        out = _tool(["/root/repo/tools/datasets2kaldi.py", "lesvocaux", str(root), str(tmp_path / "out")],
                    cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-2000:]
        k = _read_kaldi(str(tmp_path / "out"))
        assert " ".join(k["text"][0][1:]) == "bonjour [beep] et au revoir..."
        assert k["utt2spk"][0][1] == "spk1"
        assert k["spk2gender"][0] == ["spk1", "f"]


class TestHf:
    def test_hf_segment_schema(self, tmp_path):
        datasets = pytest.importorskip("datasets")
        sr = 16000
        arr = (0.1 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        ds = datasets.Dataset.from_dict({
            "audio_id": ["recA"],
            "speaker_id": ["spkX"],
            "gender": ["female"],
            "audio": [{"path": "recA.wav", "array": arr, "sampling_rate": sr}],
            "segments": [[{"transcript": "bonjour", "start": 0.0, "end": 0.5},
                          {"transcript": "oui", "start": 0.5, "end": 0.9}]],
        })
        local = tmp_path / "hfds"
        ds.save_to_disk(str(local))
        out = _tool(["/root/repo/tools/datasets2kaldi.py", "hf", str(local), str(tmp_path / "out")],
                    cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-2000:]
        k = _read_kaldi(str(tmp_path / "out"))
        assert len(k["text"]) == 2
        assert k["utt2spk"][0][1] == "spkX"
        assert os.path.exists(tmp_path / "out" / "wavs" / "recA.wav")


class TestStmVtt:
    def test_stm(self, tmp_path):
        audio_root = tmp_path / "wavs"
        audio_root.mkdir()
        _tone(audio_root / "rec-one.wav", seconds=2.0)
        stm = tmp_path / "corpus.stm"
        stm.write_text(
            "rec_one 1 spk1 0.20 0.90 <o,f0,female> bonjour tout le monde\n"
            "rec_one 1 spk2 1.00 1.80 <o,f0,male> merci\n")
        out = _tool(["/root/repo/tools/corpus2kaldi.py", "stm", str(stm), str(audio_root), str(tmp_path / "out")],
                    cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-2000:]
        k = _read_kaldi(str(tmp_path / "out"))
        assert len(k["text"]) == 2
        genders = {l[0].split("-")[0]: l[1] for l in k["spk2gender"]}
        assert set(k["spk2gender"][0][1]) <= {"f", "m"}
        assert k["segments"][0][2:] == ["0.200", "0.900"] or float(k["segments"][0][2]) == 0.2

    def test_vtt(self, tmp_path):
        vdir = tmp_path / "vtt"
        adir = tmp_path / "audio"
        vdir.mkdir(); adir.mkdir()
        _tone(adir / "vid01.wav", seconds=2.0)
        (vdir / "vid01.fr.vtt").write_text(
            "WEBVTT\n\n00:00:00.100 --> 00:00:00.900\nbonjour\n\n"
            "00:00:01.000 --> 00:00:01.800\nmerci <i>beaucoup</i>\n\n"
            "00:00:05.000 --> 00:00:06.000\ntrop tard\n")
        out = _tool(["/root/repo/tools/corpus2kaldi.py", "vtt", str(vdir), str(adir), str(tmp_path / "out")],
                    cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-2000:]
        k = _read_kaldi(str(tmp_path / "out"))
        # third caption starts past the 2 s audio -> dropped
        assert len(k["text"]) == 2
        assert " ".join(k["text"][1][1:]) == "merci beaucoup"
