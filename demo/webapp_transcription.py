#!/usr/bin/env python3
"""Transcription demo web app (stdlib HTTP, no streamlit dependency).

Counterpart of reference demo/webapp_transcription_whisper.py (streamlit
record/upload + whisper/vosk/LinTO transcription + waveform viz): serves an
upload page; transcribes with a local model (Whisper or wav2vec2-CTC, HF
checkpoint / sak-finalize export / seeded test config) or forwards to a
remote LinTO-compatible server; returns transcript + waveform/spectrogram
images.

    python demo/webapp_transcription.py --model <dir> [--port 8080]
"""

import argparse
import base64
import io
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

PAGE = """<!doctype html>
<html><head><title>ssak_tpu transcription demo</title>
<style>body{{font-family:sans-serif;max-width:780px;margin:2em auto}}
img{{max-width:100%}} pre{{background:#f4f4f4;padding:1em;white-space:pre-wrap}}</style>
</head><body>
<h2>ssak_tpu — transcription demo</h2>
<form method="post" enctype="multipart/form-data" action="/transcribe">
  <p><input type="file" name="audio" accept=".wav,.mp3,.flac" required></p>
  <p>Language: <input name="language" value="{language}" size="4">
     <label><input type="checkbox" name="accurate"> accurate (beam + fallback)</label></p>
  <p><button type="submit">Transcribe</button></p>
</form>
{result}
</body></html>"""


def make_handler(model, language_default):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            print("[demo]", fmt % args, file=sys.stderr)

        def _page(self, result=""):
            html = PAGE.format(language=language_default, result=result)
            data = html.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            self._page()

        def do_POST(self):
            import email
            import email.policy

            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            msg = email.message_from_bytes(
                b"Content-Type: " + self.headers["Content-Type"].encode() + b"\r\n\r\n" + body,
                policy=email.policy.HTTP,
            )
            audio_bytes = None
            fields = {}
            for part in msg.iter_parts():
                name = part.get_param("name", header="content-disposition")
                if name == "audio":
                    audio_bytes = part.get_payload(decode=True)
                    fname = part.get_filename() or "upload.wav"
                elif name:
                    fields[name] = part.get_content().strip()
            if not audio_bytes:
                self._page("<p>no audio uploaded</p>")
                return

            from ssak_tpu.audio import load_audio
            from ssak_tpu.utils.viewer import plot_spectrogram, plot_waveform

            with tempfile.NamedTemporaryFile(suffix=os.path.splitext(fname)[1] or ".wav", delete=False) as f:
                f.write(audio_bytes)
                tmp = f.name
            try:
                audio = load_audio(tmp, sample_rate=16000)
                text = transcribe(model, audio, fields.get("language") or language_default, "accurate" in fields)
                wf = plot_waveform(audio, 16000)
                sp = plot_spectrogram(audio, 16000)
                imgs = "".join(
                    f'<img src="data:image/png;base64,{base64.b64encode(open(p, "rb").read()).decode()}">'
                    for p in (wf, sp)
                )
                self._page(f"<h3>Transcript</h3><pre>{text or '(empty)'}</pre>{imgs}")
            finally:
                os.unlink(tmp)

    return Handler


def transcribe(model, audio, language, accurate):
    from ssak_tpu.infer.general import ModelType

    if model.type == ModelType.WHISPER:
        from ssak_tpu.infer.whisper_infer import whisper_transcribe_batch

        [text] = whisper_transcribe_batch(
            model, [audio], language=language or None,
            beam_size=5 if accurate else 0, temperature_fallback=accurate,
        )
        return text
    from ssak_tpu.infer.ctc_infer import ctc_transcribe_batch

    [text] = ctc_transcribe_batch(model, [audio])
    return text


def main(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default=None, help="model dir (HF or exported)")
    p.add_argument("--seeded_test_config", default=None, help=argparse.SUPPRESS)
    p.add_argument("--language", default="fr")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", default="127.0.0.1")
    args = p.parse_args(argv)

    from http.server import ThreadingHTTPServer

    from ssak_tpu.infer.general import load_model

    model = load_model(args.model, seeded_test_config=args.seeded_test_config)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(model, args.language))
    print(f"demo listening on http://{args.host}:{server.server_port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
