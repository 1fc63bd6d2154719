"""KaldiDataset OO API, converter framework, transcriber parser, and the
kaldi_tools / corpus2kaldi CLIs."""

import os
import subprocess
import sys

import pytest

from ssak_tpu.data.kaldi_dataset import KaldiDataset, KaldiDatasetRow


def _tool(args, cwd, env_extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    return subprocess.run([sys.executable, *args], cwd=cwd, env=env, capture_output=True, text=True, timeout=300)


class TestKaldiDataset:
    def _make(self, tmp_audio_dir):
        tone = os.path.join(tmp_audio_dir, "tone16k.wav")
        ds = KaldiDataset(name="t")
        for i in range(6):
            ds.append(KaldiDatasetRow(
                id=f"u{i}", text=f"texte {i}", audio_path=tone, audio_id="rec",
                start=float(i) * 0.3, end=float(i) * 0.3 + 0.3,
                speaker=f"spk{i % 3}", gender="f" if i % 2 else "m",
            ))
        return ds

    def test_append_validates(self):
        ds = KaldiDataset()
        ok = ds.append(KaldiDatasetRow(id="bad", start=2.0, end=1.0), show_warnings=False)
        assert not ok and len(ds) == 0

    def test_save_load_roundtrip(self, tmp_audio_dir, tmp_path):
        ds = self._make(tmp_audio_dir)
        out = str(tmp_path / "kd")
        ds.save(out)
        ds2 = KaldiDataset.load(out)
        assert len(ds2) == 6
        assert ds2.speakers() == ["spk0", "spk1", "spk2"]
        assert abs(ds2.total_duration() - 1.8) < 1e-3

    def test_filters(self, tmp_audio_dir):
        ds = self._make(tmp_audio_dir)
        assert len(ds.filter_by_speaker(["spk0"])) == 2
        assert len(ds.filter_by_speaker(["spk0"], keep=False)) == 4
        assert len(ds.filter_by_duration(min_duration=0.29)) == 6

    def test_normalize(self, tmp_audio_dir):
        ds = self._make(tmp_audio_dir)
        ds.rows[0].text = "Bonjour 42 !"
        ds.normalize_dataset("fr")
        assert ds.rows[0].text == "bonjour quarante-deux"

    def test_split_speaker_disjoint(self, tmp_audio_dir):
        ds = self._make(tmp_audio_dir)
        tr, dev, te = ds.split(ratios=(0.4, 0.3, 0.3), seed=1)
        all_spk = [set(p.speakers()) for p in (tr, dev, te)]
        assert not (all_spk[0] & all_spk[1]) and not (all_spk[0] & all_spk[2])

    def test_audio_checks(self, tmp_audio_dir):
        ds = self._make(tmp_audio_dir)
        ds.rows[0].audio_path = "/nonexistent.wav"
        # one shared bad source affects only rows pointing at it
        bad = ds.audio_checks()
        assert bad == ["u0"]


class TestConverterFramework:
    def test_reader2kaldi(self, tmp_path, tmp_audio_dir):
        import shutil

        from ssak_tpu.data.kaldi_converter import AudioFolder2Kaldi, Reader2Kaldi, Row2Duration, Row2Info, TextFolder2Kaldi

        root = tmp_path / "corpus"
        (root / "audio").mkdir(parents=True)
        (root / "txt").mkdir()
        shutil.copy(os.path.join(tmp_audio_dir, "tone16k.wav"), root / "audio" / "spk1-utt1.wav")
        shutil.copy(os.path.join(tmp_audio_dir, "noise8k.wav"), root / "audio" / "spk2-utt2.wav")
        (root / "txt" / "spk1-utt1.txt").write_text("bonjour")
        (root / "txt" / "spk2-utt2.txt").write_text("salut")
        ds = Reader2Kaldi(
            str(root),
            [
                AudioFolder2Kaldi("audio"),
                TextFolder2Kaldi("txt"),
                Row2Info("speaker", r"^(spk\d+)-"),
                Row2Duration(),
            ],
        ).load()
        assert len(ds) == 2
        by_id = {r.id: r for r in ds}
        assert by_id["spk1-utt1"].speaker == "spk1"
        assert by_id["spk1-utt1"].text == "bonjour"
        assert abs(by_id["spk1-utt1"].duration - 2.0) < 0.01


class TestTranscriber:
    def test_parse_trs(self, tmp_path):
        from ssak_tpu.formats.transcriber import read_transcriber

        trs = """<?xml version="1.0" encoding="UTF-8"?>
<Trans scribe="x" audio_filename="a" version="1">
<Speakers>
<Speaker id="spk1" name="Alice" type="female"/>
</Speakers>
<Episode><Section type="report" startTime="0" endTime="4">
<Turn startTime="0" endTime="4" speaker="spk1">
<Sync time="0"/>bonjour tout le monde
<Sync time="2"/>il fait <Event desc="noise" type="noise" extent="instantaneous"/> beau
</Turn>
</Section></Episode></Trans>"""
        p = tmp_path / "x.trs"
        p.write_text(trs)
        segs = read_transcriber(str(p))
        assert len(segs) == 2
        assert segs[0]["speaker"] == "Alice" and segs[0]["gender"] == "f"
        assert segs[0]["text"] == "bonjour tout le monde"
        assert "<noise>" in segs[1]["text"] and "beau" in segs[1]["text"]
        # anonymization
        segs2 = read_transcriber(str(p), anonymize_speakers=True)
        assert segs2[0]["speaker"] == "spk001"


class TestCLIs:
    def test_kaldi_tools_stats_and_subsample(self, reference_data_dir, tmp_path):
        out = _tool(
            ["/root/repo/tools/kaldi_tools.py", "stats", os.path.join(reference_data_dir, "kaldi", "minimal")],
            cwd=str(tmp_path), env_extra={"DATAPATH": reference_data_dir},
        )
        assert out.returncode == 0, out.stderr[-1500:]
        import json

        stats = json.loads(out.stdout.splitlines()[0])
        assert stats["utterances"] == 4
        assert stats["total_hours"] > 0

        out = _tool(
            ["/root/repo/tools/kaldi_tools.py", "subsample",
             os.path.join(reference_data_dir, "kaldi", "minimal"), str(tmp_path / "sub"), "--n", "2"],
            cwd=str(tmp_path), env_extra={"DATAPATH": reference_data_dir},
        )
        assert out.returncode == 0, out.stderr[-1500:]
        assert len((tmp_path / "sub" / "text").read_text().splitlines()) == 2

    def test_corpus2kaldi_srt(self, tmp_path, tmp_audio_dir):
        srt = tmp_path / "subs.srt"
        srt.write_text("1\n00:00:00,100 --> 00:00:01,000\nbonjour\n\n2\n00:00:01,200 --> 00:00:01,900\nsalut\n")
        out = _tool(
            ["/root/repo/tools/corpus2kaldi.py", "srt", os.path.join(tmp_audio_dir, "tone16k.wav"), str(srt), str(tmp_path / "kd")],
            cwd=str(tmp_path),
        )
        assert out.returncode == 0, out.stderr[-1500:]
        segs = (tmp_path / "kd" / "segments").read_text().splitlines()
        assert len(segs) == 2


class TestSegmentOps:
    def _mk(self, tmp_audio_dir):
        from ssak_tpu.data.kaldi_dataset import KaldiDataset, KaldiDatasetRow

        wav = os.path.join(tmp_audio_dir, "tone16k.wav")
        rows = [
            # spk1 turn torn in two by spk2 overlapping it
            KaldiDatasetRow(id="u1", audio_id="rec", audio_path=wav, start=0.0, end=0.5, text="bonjour", speaker="spk1"),
            KaldiDatasetRow(id="u2", audio_id="rec", audio_path=wav, start=0.4, end=0.8, text="oui", speaker="spk2"),
            KaldiDatasetRow(id="u3", audio_id="rec", audio_path=wav, start=0.6, end=1.0, text="tout le monde", speaker="spk1"),
            # far-away segment: never glued (gap > max_silence)
            KaldiDatasetRow(id="u4", audio_id="rec", audio_path=wav, start=5.0, end=5.5, text="fin", speaker="spk1"),
        ]
        return KaldiDataset(rows)

    def test_find_overlaps(self, tmp_audio_dir):
        from ssak_tpu.data.segment_ops import find_overlapping_segments

        ds = self._mk(tmp_audio_dir)
        over = find_overlapping_segments(ds)
        assert "u2" in over or "u1" in over
        assert "u4" not in over

    def test_glue_overlap_mode(self, tmp_audio_dir):
        from ssak_tpu.data.segment_ops import glue_overlapping_segments

        ds = self._mk(tmp_audio_dir)
        glued = glue_overlapping_segments(ds, max_silence=0.5, max_duration=15.0, mode="overlap")
        by_id = {r.id: r for r in glued}
        # u1+u3 merged (same speaker, overlap-flagged, gap 0.1s)
        assert "u1" in by_id and "u3" not in by_id
        assert by_id["u1"].text == "bonjour tout le monde"
        assert by_id["u1"].end == 1.0
        # u4 untouched
        assert by_id["u4"].text == "fin"
        assert len(glued) == 3

    def test_glue_respects_max_duration(self, tmp_audio_dir):
        from ssak_tpu.data.segment_ops import glue_overlapping_segments

        ds = self._mk(tmp_audio_dir)
        glued = glue_overlapping_segments(ds, max_silence=0.5, max_duration=0.7, mode="all")
        # merged u1..u3 span would be 1.0s > 0.7 -> not merged
        assert {r.id for r in glued} == {"u1", "u2", "u3", "u4"}

    def test_rename_ids(self, tmp_audio_dir):
        from ssak_tpu.data.segment_ops import rename_ids

        ds = self._mk(tmp_audio_dir)
        rename_ids(ds, "u", "x", rename_speakers=False)
        assert {r.id for r in ds} == {"x1", "x2", "x3", "x4"}
        assert all(r.speaker.startswith("spk") for r in ds)


class TestKaldiToolsNewCommands:
    def test_glue_cli(self, reference_data_dir, tmp_path):
        import json

        out = _tool(
            ["/root/repo/tools/kaldi_tools.py", "glue",
             os.path.join(reference_data_dir, "kaldi", "complete"), str(tmp_path / "glued"), "--mode", "all"],
            cwd=str(tmp_path), env_extra={"DATAPATH": reference_data_dir},
        )
        assert out.returncode == 0, out.stderr[-1500:]
        stats = json.loads(out.stdout.strip().splitlines()[-1])
        assert stats["segments_after"] < stats["segments_before"]
        assert (tmp_path / "glued" / "segments").exists()

    def test_rename_cli(self, reference_data_dir, tmp_path):
        out = _tool(
            ["/root/repo/tools/kaldi_tools.py", "rename",
             os.path.join(reference_data_dir, "kaldi", "minimal"), str(tmp_path / "ren"),
             "--char", "-", "--replacement", "_"],
            cwd=str(tmp_path), env_extra={"DATAPATH": reference_data_dir},
        )
        assert out.returncode == 0, out.stderr[-1500:]
        for line in (tmp_path / "ren" / "text").read_text().splitlines():
            assert "-" not in line.split()[0]

    def test_duration_cli(self, reference_data_dir, tmp_path):
        out = _tool(
            ["/root/repo/tools/kaldi_tools.py", "duration",
             os.path.join(reference_data_dir, "audio", "bonjour.wav")],
            cwd=str(tmp_path),
        )
        assert out.returncode == 0, out.stderr[-1500:]
        assert "Total Duration of 1 files:" in out.stdout
