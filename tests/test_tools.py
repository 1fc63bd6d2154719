"""CLI tool tests run as subprocesses from a temp cwd (reference
tests/unittests/utils.py assertRun methodology)."""

import os
import subprocess
import sys

import pytest


def run_tool(args, cwd, env_extra=None, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, *args], cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout
    )


def test_align_audio_transcript_splits(reference_data_dir, tmp_path):
    out = run_tool(
        [
            "/root/repo/tools/align_audio_transcript.py",
            os.path.join(reference_data_dir, "kaldi", "minimal"),
            str(tmp_path / "split"),
            "--max_duration", "5", "--seeded_test_config", "wav2vec2",
        ],
        cwd=str(tmp_path),
        env_extra={"DATAPATH": reference_data_dir},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    d = tmp_path / "split"
    for f in ("wav.scp", "segments", "text", "utt2spk", "utt2dur", "spk2utt"):
        assert (d / f).exists(), f
    segments = (d / "segments").read_text().splitlines()
    # cfpp (10s) and separation_per_14 (20s) must be cut; toy_bonjour kept
    ids = [l.split()[0] for l in segments]
    assert any(i.startswith("cfpp_cut") for i in ids)
    assert "toy_bonjour" in ids
    # long recordings produce multiple cuts (a single aligned word may
    # exceed max_duration — words are never split, as in the reference)
    assert sum(1 for i in ids if "_cut" in i) >= 3
    durs = [float(l.split()[3]) - float(l.split()[2]) for l in segments]
    assert sum(durs) > 0 and min(durs) >= 0


def test_get_word_positions(reference_data_dir, tmp_path):
    out = run_tool(
        [
            "/root/repo/tools/get_word_positions.py",
            os.path.join(reference_data_dir, "kaldi", "minimal"),
            "--seeded_test_config", "wav2vec2",
            "--output", str(tmp_path / "words.txt"),
        ],
        cwd=str(tmp_path),
        env_extra={"DATAPATH": reference_data_dir},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = (tmp_path / "words.txt").read_text().splitlines()
    assert len(lines) > 0
    parts = lines[0].split()
    assert len(parts) == 5
    float(parts[2]); float(parts[3]); float(parts[4])


class TestManifestPipeline:
    """NeMo-style manifest pipeline subcommands (reference tools/nemo/)."""

    def _manifest(self, tmp_path, n=12):
        import json

        rows = []
        for i in range(n):
            rows.append({"audio_filepath": f"a{i}.wav", "duration": 1.0,
                         "text": f"phrase numero {i}", "utt_id": f"u{i}",
                         "speaker": f"spk{i % 4}"})
        path = tmp_path / "m.jsonl"
        path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        return str(path)

    def test_tokenizer_bpe_and_char(self, tmp_path):
        import json

        m = self._manifest(tmp_path)
        out = run_tool(["/root/repo/tools/kaldi2manifest.py", "tokenizer", str(tmp_path / "tk"),
                        "--manifest", m, "--vocab_size", "60"], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-1500:]
        info = json.loads(out.stdout.strip().splitlines()[-1])
        assert info["type"] == "bpe" and info["vocab_size"] <= 60
        assert (tmp_path / "tk" / "tokenizer.json").exists()

        out = run_tool(["/root/repo/tools/kaldi2manifest.py", "tokenizer", str(tmp_path / "tkc"),
                        "--manifest", m, "--type", "char"], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-1500:]
        assert (tmp_path / "tkc" / "vocab.json").exists()

    def test_split_speaker_disjoint(self, tmp_path):
        import json

        m = self._manifest(tmp_path)
        out = run_tool(["/root/repo/tools/kaldi2manifest.py", "split", m, str(tmp_path / "sp"),
                        "--ratios", "0.5", "0.25", "0.25"], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-1500:]
        parts = {}
        for name in ("train", "validation", "test"):
            f = tmp_path / "sp" / f"{name}.jsonl"
            if f.exists():
                parts[name] = [json.loads(l) for l in f.read_text().splitlines()]
        total = sum(len(v) for v in parts.values())
        assert total == 12
        spk_sets = [set(r["speaker"] for r in v) for v in parts.values()]
        for i in range(len(spk_sets)):
            for j in range(i + 1, len(spk_sets)):
                assert not (spk_sets[i] & spk_sets[j])

    def test_clean(self, tmp_path):
        import json

        m = tmp_path / "m.jsonl"
        m.write_text(json.dumps({"text": "Il y a 3 chats.", "utt_id": "u0"}) + "\n")
        out = run_tool(["/root/repo/tools/kaldi2manifest.py", "clean", str(m), str(tmp_path / "c.jsonl"),
                        "--language", "fr"], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-1500:]
        cleaned = json.loads((tmp_path / "c.jsonl").read_text())
        assert "trois" in cleaned["text"]
        assert "3" not in cleaned["text"]

    def test_listfiles(self, tmp_path):
        root = tmp_path / "corpora"
        (root / "CorpusA" / "nocasepunc").mkdir(parents=True)
        (root / "CorpusA" / "nocasepunc" / "wav.scp").write_text("x y\n")
        (root / "CorpusB_test").mkdir(parents=True)
        (root / "CorpusB_test" / "wav.scp").write_text("x y\n")
        (root / "CorpusC" / "nocasepunc" / "split1").mkdir(parents=True)
        (root / "CorpusC" / "nocasepunc" / "split1" / "wav.scp").write_text("x y\n")
        lst = tmp_path / "list.txt"
        lst.write_text("CorpusA\nCorpusB_test\nCorpusC\nMissing\n")
        out = run_tool(["/root/repo/tools/kaldi2manifest.py", "listfiles", str(lst), str(root),
                        str(tmp_path / "train.lst"), "--mode", "train", "--subset", "nocasepunc"],
                       cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-1500:]
        lines = (tmp_path / "train.lst").read_text().splitlines()
        assert any(l.endswith("CorpusA/nocasepunc") for l in lines)
        assert any(l.endswith("split1") for l in lines)
        assert not any("CorpusB_test" in l for l in lines)
        out = run_tool(["/root/repo/tools/kaldi2manifest.py", "listfiles", str(lst), str(root),
                        str(tmp_path / "test.lst"), "--mode", "test", "--subset", "nocasepunc"],
                       cwd=str(tmp_path))
        assert out.returncode == 0
        assert "CorpusB_test" in (tmp_path / "test.lst").read_text()
