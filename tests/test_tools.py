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
