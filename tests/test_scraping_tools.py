"""YouTube harvesting pipeline (tools/scrape_youtube.py +
ssak_tpu.utils.scraping parsers), remote-transcription CLI
(tools/transcribe_remote.py), and transcript serializers — all offline:
local fixture pages/payloads and a stub HTTP server."""

import json
import os
import subprocess
import sys
import threading

import numpy as np
import pytest


def _tool(args, cwd, env_extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    return subprocess.run([sys.executable, *args], cwd=cwd, env=env, capture_output=True, text=True, timeout=600)


WATCH_HTML = (
    '<html><script>var ytInitialPlayerResponse = {"videoDetails":'
    '{"videoId":"abc123def45","title":"Une vidéo","author":"Chan",'
    '"lengthSeconds":"120"},"captions":{"playerCaptionsTracklistRenderer":'
    '{"captionTracks":[{"languageCode":"fr","baseUrl":"http://x/tt",'
    '"name":{"simpleText":"French"}},{"languageCode":"en","baseUrl":"u2",'
    '"kind":"asr"}]}}};</script>'
    '<a href="/watch?v=abc123def45">self</a>'
    '<a href="/watch?v=zzz999zzz99">other</a></html>'
)

TIMEDTEXT_XML = (
    '<?xml version="1.0"?><transcript>'
    '<text start="0.5" dur="1.2">bonjour &amp; bienvenue</text>'
    '<text start="2.0" dur="0.8">merci</text></transcript>'
)


class TestParsers:
    def test_extract_video_ids(self):
        from ssak_tpu.utils.scraping import extract_video_ids

        ids = extract_video_ids(WATCH_HTML)
        assert "abc123def45" in ids and "zzz999zzz99" in ids
        assert len(ids) == len(set(ids))

    def test_player_response_metadata(self):
        from ssak_tpu.utils.scraping import extract_player_response, video_metadata

        meta = video_metadata(extract_player_response(WATCH_HTML))
        assert meta["video_id"] == "abc123def45"
        assert meta["duration_seconds"] == 120.0
        tracks = {t["language_code"]: t for t in meta["caption_tracks"]}
        assert tracks["fr"]["is_automatic"] is False
        assert tracks["en"]["is_automatic"] is True

    def test_parse_timedtext_both_formats(self):
        from ssak_tpu.utils.scraping import parse_timedtext

        xml_segs = parse_timedtext(TIMEDTEXT_XML)
        assert xml_segs[0] == ("bonjour & bienvenue", 0.5, 1.2)
        j3 = json.dumps({"events": [
            {"tStartMs": 100, "dDurationMs": 900, "segs": [{"utf8": "salut"}]},
            {"tStartMs": 2000},  # no segs -> skipped
        ]})
        assert parse_timedtext(j3) == [("salut", 0.1, 0.9)]

    def test_transcript_csv_roundtrip(self, tmp_path):
        from ssak_tpu.utils.scraping import read_transcript_csv, write_transcript_csv

        segs = [("bonjour; oui", 0.5, 1.25), ("deux", 3.0, 0.5)]
        write_transcript_csv(segs, str(tmp_path / "t.csv"))
        back = read_transcript_csv(str(tmp_path / "t.csv"))
        assert back == [("bonjour; oui", 0.5, 1.25), ("deux", 3.0, 0.5)]


class TestScrapeYoutubeCli:
    def test_ids_and_metadata_and_captions(self, tmp_path):
        page = tmp_path / "watch.html"
        page.write_text(WATCH_HTML)
        out = _tool(["/root/repo/tools/scrape_youtube.py", "ids", str(page), "--out", str(tmp_path / "ids.txt")], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-1500:]
        assert "abc123def45" in (tmp_path / "ids.txt").read_text()

        out = _tool(["/root/repo/tools/scrape_youtube.py", "metadata", str(page), "--out", str(tmp_path / "meta.csv")], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-1500:]
        meta = (tmp_path / "meta.csv").read_text()
        assert "abc123def45" in meta and "True" in meta  # has manual captions

        tt = tmp_path / "abc123def45.xml"
        tt.write_text(TIMEDTEXT_XML)
        out = _tool(["/root/repo/tools/scrape_youtube.py", "captions", str(tt), "--out_dir", str(tmp_path / "tr")], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-1500:]
        csv_text = (tmp_path / "tr" / "abc123def45.csv").read_text()
        assert "bonjour & bienvenue" in csv_text

    def test_tokaldi(self, tmp_path):
        from ssak_tpu.audio import save_audio
        from ssak_tpu.utils.scraping import write_transcript_csv

        adir = tmp_path / "audio"
        tdir = tmp_path / "tr"
        adir.mkdir(); tdir.mkdir()
        sr = 16000
        t = np.arange(sr * 3) / sr
        save_audio(str(adir / "vid42.wav"), (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), sr)
        write_transcript_csv([("bonjour", 0.2, 0.8), ("apres la fin", 5.0, 1.0)], str(tdir / "vid42.csv"))
        out = _tool(["/root/repo/tools/scrape_youtube.py", "tokaldi", str(adir), str(tdir),
                     str(tmp_path / "kd"), "--extension", "wav"], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-1500:]
        text = (tmp_path / "kd" / "text").read_text().splitlines()
        assert len(text) == 1  # the past-the-end segment is dropped
        assert text[0].endswith("bonjour")
        assert text[0].startswith("youtube_vid42")


class TestSerializers:
    def test_srt_vtt_roundtrip(self):
        from ssak_tpu.formats import to_transcription, transcription_to

        tr = {"segments": [
            {"start": 0.5, "end": 1.75, "segment": "bonjour"},
            {"start": 2.0, "end": 3.25, "segment": "salut <tout> le monde"},
        ]}
        srt = transcription_to(tr, "srt")
        assert "00:00:00,500 --> 00:00:01,750" in srt
        back = to_transcription(srt, format="srt")
        assert [s["segment"] for s in back["segments"]] == ["bonjour", "salut le monde"]
        assert abs(back["segments"][1]["start"] - 2.0) < 1e-6

        vtt = transcription_to(tr, "vtt")
        assert vtt.startswith("WEBVTT")
        assert "00:00:02.000 --> 00:00:03.250" in vtt

    def test_text_csv_textgrid(self):
        from ssak_tpu.formats import to_transcription, transcription_to

        tr = {"segments": [{"start": 0.0, "end": 1.0, "segment": 'il a dit "oui"'}]}
        assert transcription_to(tr, "text") == 'il a dit "oui"'
        csv_out = transcription_to(tr, "csv")
        assert '"il a dit ""oui"""' in csv_out
        tg = transcription_to(tr, "textgrid")
        back = to_transcription(tg, format="textgrid")
        assert back["segments"][0]["end"] == 1.0


class TestTranscribeRemoteCli:
    @pytest.fixture()
    def stub_server(self):
        from http.server import BaseHTTPRequestHandler, HTTPServer

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                self.rfile.read(int(self.headers.get("Content-Length", 0)))
                self._json({"jobid": "j1"})

            def do_GET(self):
                if self.path.startswith("/job/"):
                    self._json({"state": "done", "result_id": "r1"})
                else:
                    self._json({
                        "transcription_result": "bonjour le monde",
                        "raw_transcription": "bonjour le monde",
                        "confidence": 0.9,
                        "segments": [{"start": 0.0, "end": 1.5, "segment": "bonjour le monde",
                                      "raw_segment": "bonjour le monde", "words": []}],
                    })

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

    def test_request_json_and_srt(self, stub_server, tmp_audio_dir, tmp_path):
        wav = os.path.join(tmp_audio_dir, "tone16k.wav")
        out = _tool(["/root/repo/tools/transcribe_remote.py", "request", wav,
                     "--server", stub_server], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-1500:]
        assert json.loads(out.stdout)["transcription_result"] == "bonjour le monde"

        out = _tool(["/root/repo/tools/transcribe_remote.py", "request", wav,
                     "--server", stub_server, "--output_format", "srt",
                     "--output_dir", str(tmp_path / "o")], cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr[-1500:]
        srt_files = os.listdir(tmp_path / "o")
        assert len(srt_files) == 1
        content = (tmp_path / "o" / srt_files[0]).read_text()
        assert "bonjour le monde" in content and "-->" in content


def test_scrape_news_offline(tmp_path):
    """scrape_news on cached HTML: discovery by URL pattern from a seed
    page, headline+paragraph extraction, slugged output, resume skip."""
    import subprocess
    import sys

    art1 = tmp_path / "article-un.html"
    art1.write_text(
        "<html><head><script>var x=1;</script></head><body>"
        "<nav><p>menu menu menu menu menu</p></nav>"
        "<h1>Le grand titre de l'article</h1>"
        "<p>Ceci est le premier paragraphe de taille raisonnable pour le corpus.</p>"
        "<p>court</p>"
        "<p>Un second paragraphe avec suffisamment de mots pour franchir le filtre.</p>"
        "<footer><p>copyright footer mentions legales ici</p></footer>"
        "</body></html>", encoding="utf-8")
    art2 = tmp_path / "article-deux.html"
    art2.write_text("<h1>Autre titre</h1><p>Des mots assez nombreux pour un paragraphe valide ici.</p>",
                    encoding="utf-8")

    out_dir = tmp_path / "corpus"
    corpus = tmp_path / "all.txt"
    cmd = [sys.executable, "/root/repo/tools/scrape_news.py",
           "--from_files", str(art1), str(art2),
           "--output_dir", str(out_dir), "--corpus_file", str(corpus)]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    files = sorted(os.listdir(out_dir))
    assert len(files) == 2, files
    body = (out_dir / "le-grand-titre-de-l-article.txt").read_text(encoding="utf-8") \
        if (out_dir / "le-grand-titre-de-l-article.txt").exists() else (out_dir / files[0]).read_text(encoding="utf-8")
    assert "premier paragraphe" in body
    assert "menu menu" not in body and "copyright" not in body and "court" not in body
    assert "var x" not in body
    ctext = corpus.read_text(encoding="utf-8")
    assert "second paragraphe" in ctext

    # resume: running again writes nothing new
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    assert r2.returncode == 0
    assert "0 articles" in r2.stdout, r2.stdout


def test_scrape_news_discovery(tmp_path):
    from importlib import util as _u

    spec = _u.spec_from_file_location("scrape_news", "/root/repo/tools/scrape_news.py")
    mod = _u.module_from_spec(spec)
    spec.loader.exec_module(mod)
    seed = tmp_path / "seed.html"
    seed.write_text(
        '<a href="/article/2024/un.html">un</a> <a href="/autre/page.html">x</a>'
        ' <a href="https://site.fr/article/deux.html">deux</a>', encoding="utf-8")
    urls = mod.discover_articles([str(seed)], article_pattern=r"/article/")
    assert len(urls) == 2, urls
