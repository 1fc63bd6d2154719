"""PERF.md's bench table must be generated, not hand-written: the r3 and
r4 verdicts both caught hand-transcribed numbers drifting from the driver's
BENCH_r*.json numbers of record. These tests make drift a suite failure."""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "perf_table", os.path.join(REPO, "tools", "perf_table.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_perf_table_in_sync():
    """The committed PERF.md table must equal what tools/perf_table.py
    generates from the bench records in the repo. If this fails, run:
    python tools/perf_table.py"""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "perf_table.py"), "--check"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, f"PERF.md bench table is stale:\n{out.stderr}"


def test_load_record_driver_wrapper(tmp_path):
    """Parses the driver's BENCH_r*.json shape (stdout tail embedded as a
    string, possibly truncated mid-line) and raw bench.py JSONL."""
    pt = _load_tool()
    wrapper = {
        "rc": 0,
        "tail": 'garbage prefix", "value": 1.0}\n'
                '{"metric": "a_metric", "value": 123.4, "unit": "x", "tflops": 9.9, "mfu": 0.25}\n'
                '{"metric": "b_metric", "value": 5.0, "unit": "x", "vs_baseline": null}\n',
        "parsed": {"metric": "b_metric", "value": 5.0, "unit": "x"},
    }
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps(wrapper))
    rec = pt.load_record(str(p))
    assert rec["a_metric"]["value"] == 123.4 and rec["a_metric"]["mfu"] == 0.25
    assert rec["b_metric"]["value"] == 5.0

    q = tmp_path / "bench_r99_local.jsonl"
    q.write_text('{"metric": "a_metric", "value": 100.0, "unit": "x"}\n')
    rec2 = pt.load_record(str(q))
    assert rec2["a_metric"]["value"] == 100.0
    # range rendering spans both sources
    table = pt.render_table([str(p), str(q)])
    assert "BENCH_r99.json" in table and "bench_r99_local.jsonl" in table


def test_render_table_ranges(tmp_path):
    pt = _load_tool()
    a = tmp_path / "a.jsonl"
    a.write_text('{"metric": "ctc_train_audio_s_per_s", "value": 1600.0, "unit": "x"}\n')
    b = tmp_path / "b.jsonl"
    b.write_text('{"metric": "ctc_train_audio_s_per_s", "value": 1677.0, "unit": "x", "tflops": 53.0, "mfu": 0.27}\n')
    table = pt.render_table([str(a), str(b)])
    assert "1600-1677" in table
    assert "27%" in table  # tflops/mfu from the newest source that has them


def test_check_guards(tmp_path):
    """check() enforces (1) self-consistency with the cited sources and
    (2) a tolerance band against the newest driver record — a regression
    or a hand-edited number fails, ordinary relay drift does not."""
    pt = _load_tool()
    pt.REPO = str(tmp_path)
    pt.PERF = str(tmp_path / "PERF.md")
    src = tmp_path / "bench_r01_local.jsonl"
    src.write_text('{"metric": "ctc_train_audio_s_per_s", "value": 1000.0, "unit": "x"}\n')
    block = pt.render_table([str(src)])
    (tmp_path / "PERF.md").write_text("# doc\n\n" + block + "\n\nprose\n")
    assert pt.check() == 0  # no BENCH record yet: self-consistency only

    newer = tmp_path / "BENCH_r02.json"
    newer.write_text(json.dumps(
        {"tail": '{"metric": "ctc_train_audio_s_per_s", "value": 1150.0, "unit": "x"}\n'}))
    assert pt.check() == 0  # +15%: inside the relay-drift band

    newer.write_text(json.dumps(
        {"tail": '{"metric": "ctc_train_audio_s_per_s", "value": 200.0, "unit": "x"}\n'}))
    assert pt.check() == 1  # 5x regression: outside the band

    newer.unlink()
    doc = (tmp_path / "PERF.md").read_text().replace("| 1000 |", "| 9999 |")
    (tmp_path / "PERF.md").write_text(doc)
    assert pt.check() == 1  # hand edit: self-consistency fails
