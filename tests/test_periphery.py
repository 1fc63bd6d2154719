"""Periphery: anonymization, viewer plots, scraping (offline parts),
demo webapp (real HTTP round trip), SpecAugment in the train step."""

import json
import os
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest


def test_anonymize_kaldi_dir(tmp_path, tmp_audio_dir):
    from ssak_tpu.audio import load_audio
    from ssak_tpu.data.kaldi_dataset import KaldiDataset, KaldiDatasetRow
    from ssak_tpu.utils.anonymize import anonymize_kaldi_dir
    from ssak_tpu.utils.gender import estimate_f0_autocorr

    # build a tiny dir with a 150 Hz voice
    sr = 16000
    t = np.arange(sr) / sr
    voice = (0.4 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
    from ssak_tpu.audio import save_audio

    src = tmp_path / "src"
    wav = tmp_path / "v.wav"
    save_audio(str(wav), voice, sr)
    ds = KaldiDataset()
    ds.append(KaldiDatasetRow(id="u1", text="bonjour", audio_path=str(wav), speaker="alice"))
    ds.save(str(src), check=False)

    out = anonymize_kaldi_dir(str(src), str(tmp_path / "anon"), seed=3)
    ds2 = KaldiDataset.load(out)
    assert len(ds2) == 1
    r = ds2.rows[0]
    assert r.speaker.startswith("spk")  # renamed
    anon = load_audio(r.audio_path, sample_rate=sr)
    f0 = estimate_f0_autocorr(anon, sr)
    assert abs(f0 - 150) > 12  # pitch moved


def test_viewer_plots(tmp_path, tmp_audio_dir):
    from ssak_tpu.audio import load_audio
    from ssak_tpu.utils.viewer import plot_spectrogram, plot_waveform

    a = load_audio(os.path.join(tmp_audio_dir, "tone16k.wav"))
    p1 = plot_waveform(a, output=str(tmp_path / "w.png"), segments=[{"start": 0.5, "end": 1.0, "label": "x"}])
    p2 = plot_spectrogram(a, output=str(tmp_path / "s.png"))
    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000


def test_scraping_offline_parts():
    from ssak_tpu.utils.scraping import extract_text, find_all_links

    html = '<html><body><a href="/a.mp3">x</a><script>var a=1;</script><audio src="b.wav"></audio><p>Bonjour</p></body></html>'
    links = find_all_links(html, base_url="http://example.org/dir/")
    assert "http://example.org/a.mp3" in links
    assert "http://example.org/dir/b.wav" in links
    assert find_all_links(html, pattern=r"\.wav$") == ["b.wav"]
    assert "Bonjour" in extract_text(html) and "var a" not in extract_text(html)


def test_specaugment_train_step():
    import jax
    import jax.numpy as jnp

    from ssak_tpu.models import wav2vec2
    from ssak_tpu.train.steps import init_train_state, make_ctc_train_step, make_optimizer

    cfg = wav2vec2.make_config("tiny_test")
    params = wav2vec2.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(warmup_steps=1, total_steps=10)
    state = init_train_state(params, opt)
    step = make_ctc_train_step(cfg, opt, mask_time_prob=0.2)
    rng = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(rng.randn(2, 3200).astype(np.float32) * 0.1),
        "audio_lengths": jnp.asarray([3200, 3200], np.int32),
        "labels": jnp.asarray([[5, 6], [7, 8]], np.int32),
        "label_lengths": jnp.asarray([2, 2], np.int32),
    }
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_demo_webapp_http(reference_data_dir, tmp_path):
    """Boot the demo server with a seeded model, POST a real wav, check the
    transcript page comes back."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "demo/webapp_transcription.py", "--seeded_test_config", "wav2vec2", "--port", "0"],
        cwd="/root/repo", env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        line = ""
        for _ in range(600):
            line = proc.stdout.readline()
            if "listening on" in line:
                break
        assert "listening on" in line, line
        url = line.strip().split()[-1]
        # GET the form
        with urllib.request.urlopen(url, timeout=30) as resp:
            page = resp.read().decode()
        assert "Transcribe" in page
        # POST an audio file
        wav = open(os.path.join(reference_data_dir, "audio", "bonjour.wav"), "rb").read()
        boundary = "XxX"
        body = (
            f"--{boundary}\r\nContent-Disposition: form-data; name=\"audio\"; filename=\"b.wav\"\r\n"
            "Content-Type: audio/wav\r\n\r\n"
        ).encode() + wav + (
            f"\r\n--{boundary}\r\nContent-Disposition: form-data; name=\"language\"\r\n\r\nfr\r\n--{boundary}--\r\n"
        ).encode()
        req = urllib.request.Request(
            url + "/transcribe", data=body,
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            result = resp.read().decode()
        assert "Transcript" in result
        assert "data:image/png" in result  # waveform rendered
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_train_cli_yaml_config(reference_data_dir, tmp_path):
    cfgfile = tmp_path / "train.yaml"
    cfgfile.write_text("batch_size: 2\nmax_steps: 1\neval_steps: 5\nwarmup_steps: 1\nmax_duration: 11\n")
    env = dict(os.environ)
    env["DATAPATH"] = reference_data_dir
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable, "-m", "ssak_tpu.train.cli",
            os.path.join(reference_data_dir, "kaldi", "minimal"),
            os.path.join(reference_data_dir, "kaldi", "minimal"),
            "--output_dir", str(tmp_path / "runs"),
            "--config", str(cfgfile), "--set", "max_steps=2",
        ],
        env=env, cwd="/root/repo", capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    with open(os.path.join(result["run_dir"], "trainer_state.json")) as f:
        ts = json.load(f)
    assert ts["global_step"] == 2  # override beat the YAML value
