"""Finalize/export: train 2 steps -> finalize -> load with infer -> decode,
plus LM-fused CLI decoding (the full train->deploy->decode chain)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def test_train_finalize_infer_chain(reference_data_dir, tmp_path):
    env = dict(os.environ)
    env["DATAPATH"] = reference_data_dir
    env["JAX_PLATFORMS"] = "cpu"
    # 1. short training run
    out = subprocess.run(
        [
            sys.executable, "-m", "ssak_tpu.train.cli",
            os.path.join(reference_data_dir, "kaldi", "minimal"),
            os.path.join(reference_data_dir, "kaldi", "minimal"),
            "--output_dir", str(tmp_path / "runs"),
            "--batch_size", "2", "--max_steps", "2", "--eval_steps", "2",
            "--warmup_steps", "1", "--max_duration", "21",
        ],
        env=env, cwd="/root/repo", capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    run_dir = json.loads(out.stdout.strip().splitlines()[-1])["run_dir"]

    # 2. finalize
    out = subprocess.run(
        [sys.executable, "-m", "ssak_tpu.train.finalize", run_dir],
        env=env, cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    final_dir = out.stdout.strip().splitlines()[-1]
    assert os.path.exists(os.path.join(final_dir, "weights.npz"))
    assert os.path.exists(os.path.join(final_dir, "ssak_config.json"))
    assert os.path.exists(os.path.join(final_dir, "vocab.json"))

    # 3. decode with the exported model via the CLI (greedy)
    out = subprocess.run(
        [
            sys.executable, "-m", "ssak_tpu.infer.ctc_infer",
            os.path.join(reference_data_dir, "audio", "bonjour.wav"),
            final_dir,
        ],
        env=env, cwd="/root/repo", capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]

    # 4. decode with an ARPA LM (shallow fusion path)
    from ssak_tpu.decode.lm import train_ngram_lm

    lm_path = str(tmp_path / "lm.arpa")
    train_ngram_lm(["bonjour le monde", "bonjour"], order=2, output_arpa=lm_path)
    out = subprocess.run(
        [
            sys.executable, "-m", "ssak_tpu.infer.ctc_infer",
            os.path.join(reference_data_dir, "audio", "bonjour.wav"),
            final_dir, "--lm", lm_path, "--beam_width", "8",
        ],
        env=env, cwd="/root/repo", capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert out.stdout.startswith("bonjour ")  # id column
