"""Streaming recognition: block decoder consistency + full websocket round
trip (our server <-> our client protocol)."""

import asyncio
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model():
    from ssak_tpu.infer.general import _seeded_model

    return _seeded_model("wav2vec2")


def test_streaming_matches_offline(model, monkeypatch):
    """With a frame-local acoustic stub (token = energy bucket of the
    frame), streaming block decode must equal offline decode exactly —
    isolates the block/context/emission bookkeeping from model numerics
    (a random NN flips argmax with any context change)."""
    import jax.numpy as jnp

    import ssak_tpu.infer.general as G
    from ssak_tpu.infer.ctc_infer import ctc_transcribe_batch
    from ssak_tpu.infer.streaming import StreamingCTCDecoder

    V = model.cfg.vocab_size
    stride = 320

    def stub_log_probas(mdl, audio, lengths=None):
        x = np.asarray(audio)
        B, T = x.shape
        F = T // stride
        frames = x[:, : F * stride].reshape(B, F, stride)
        rms = np.sqrt((frames**2).mean(-1))
        tok = np.where(rms < 0.02, 0, 5 + (np.minimum(rms, 0.5) * 40).astype(np.int32) % (V - 6))
        lp = np.full((B, F, V), -10.0, np.float32)
        for b in range(B):
            lp[b, np.arange(F), tok[b]] = 0.0
        fl = (np.asarray(lengths) // stride) if lengths is not None else np.full((B,), F)
        return jnp.asarray(lp), jnp.asarray(fl, np.int32)

    monkeypatch.setattr(G, "compute_log_probas", stub_log_probas)

    # piecewise-constant "audio": runs of distinct amplitudes
    rng = np.random.RandomState(0)
    pieces = []
    for amp in (0.05, 0.0, 0.2, 0.4, 0.0, 0.11, 0.3):
        pieces.append(np.full(stride * rng.randint(3, 9), amp, np.float32))
    audio = np.concatenate(pieces)

    dec = StreamingCTCDecoder(model, block_seconds=0.5, context_seconds=0.32)
    for i in range(0, len(audio), 2048):
        dec.accept_waveform(audio[i : i + 2048])
    streamed = dec.finalize()
    [offline] = ctc_transcribe_batch(model, [audio])
    assert streamed == offline, f"{streamed!r} vs {offline!r}"


def test_streaming_partials_accumulate(model):
    from ssak_tpu.infer.streaming import StreamingCTCDecoder

    rng = np.random.RandomState(0)
    dec = StreamingCTCDecoder(model, block_seconds=0.5, context_seconds=0.25)
    partials = []
    for _ in range(6):
        if dec.accept_waveform(rng.randn(4000).astype(np.float32) * 0.1):
            partials.append(dec.partial_result())
    final = dec.finalize()
    assert len(partials) >= 2
    # partials only grow (prefix property of streaming greedy)
    for a, b in zip(partials, partials[1:]):
        assert b.startswith(a[: max(0, len(a) - 3)])
    assert final.startswith(partials[0][: max(0, len(partials[0]) - 3)])


def test_websocket_roundtrip(model, reference_data_dir):
    """Our ws server <-> our remote_streaming client on a real wav."""
    from ssak_tpu.audio import load_audio
    from ssak_tpu.infer.streaming import serve_streaming
    from ssak_tpu.remote import remote_streaming

    audio = load_audio(os.path.join(reference_data_dir, "audio", "bonjour.wav"), sample_rate=16000)
    partials = []

    async def run():
        server = await serve_streaming(model, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        try:
            text = await remote_streaming(
                f"ws://127.0.0.1:{port}", audio, on_partial=partials.append
            )
        finally:
            server.close()
            await server.wait_closed()
        return text

    text = asyncio.run(run())
    assert isinstance(text, str) and len(text) > 0


def test_protocol_schema_golden(model, reference_data_dir):
    """Raw-websocket conformance against the pinned LinTO schema golden
    (tests/expected/streaming_protocol.json): drives the server exactly the
    way the reference client does (ssak/utils/linstt.py:283-350) — a
    blocking recv() after EVERY chunk send — so a server that only replies
    per decoded block would deadlock this test."""
    import json

    from ssak_tpu.audio import array_to_bytes, load_audio
    from ssak_tpu.infer.streaming import serve_streaming

    with open(os.path.join(os.path.dirname(__file__), "expected", "streaming_protocol.json")) as f:
        schema = json.load(f)

    audio = load_audio(os.path.join(reference_data_dir, "audio", "bonjour.wav"), sample_rate=16000)

    async def run():
        import websockets

        server = await serve_streaming(model, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        replies, final, closed_ok = [], None, False
        try:
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                await ws.send(json.dumps(schema["client_config"]))
                chunk = 2048
                for i in range(0, len(audio), chunk):
                    await ws.send(array_to_bytes(audio[i : i + chunk]))
                    # reference client blocks here; 5 s turns deadlock into failure
                    msg = await asyncio.wait_for(ws.recv(), timeout=5.0)
                    replies.append(json.loads(msg))
                await ws.send(json.dumps(schema["client_eof"]))
                final = json.loads(await asyncio.wait_for(ws.recv(), timeout=5.0))
                try:
                    await asyncio.wait_for(ws.recv(), timeout=5.0)
                except websockets.ConnectionClosedOK:
                    closed_ok = True
        finally:
            server.close()
            await server.wait_closed()
        return replies, final, closed_ok

    replies, final, closed_ok = asyncio.run(run())
    allowed = set(schema["per_chunk_reply"]["exactly_one_key_of"])
    assert replies, "server must reply to every chunk"
    for r in replies:
        assert isinstance(r, dict) and len(r) == 1
        (key,) = r.keys()
        assert key in allowed
        assert isinstance(r[key], str)
    assert isinstance(final, dict) and set(final.keys()) == {schema["final_reply"]["key"]}
    assert isinstance(final["text"], str)
    assert closed_ok, "server must close the connection after the final text"


def test_streaming_chunk_to_partial_latency(model):
    """Loopback latency (VERDICT r3 next #8): time from each binary chunk
    send to its {"partial"} reply, through the real websocket server.
    Chunks that complete a decode block pay the model forward; the others
    are protocol-only. Reports median/max to stdout (PERF.md carries the
    real-chip numbers at production dims) and pins a sanity bound."""
    import json
    import time

    pytest.importorskip("websockets")

    from ssak_tpu.infer.streaming import serve_streaming

    async def run():
        import websockets

        server = await serve_streaming(model, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        lat = []
        try:
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                await ws.send(json.dumps({"config": {"sample_rate": 16000}}))
                rng = np.random.RandomState(0)
                pcm = (np.clip(rng.randn(16000) * 0.1, -1, 1) * 32767).astype("<i2").tobytes()
                for _ in range(8):  # 8 x 1 s chunks -> ~3 decoded blocks
                    t0 = time.perf_counter()
                    await ws.send(pcm)
                    msg = json.loads(await asyncio.wait_for(ws.recv(), timeout=30.0))
                    lat.append(time.perf_counter() - t0)
                    assert "partial" in msg
                await ws.send(json.dumps({"eof": 1}))
                final = json.loads(await asyncio.wait_for(ws.recv(), timeout=30.0))
        finally:
            server.close()
            await server.wait_closed()
        return lat, final

    lat, final = asyncio.run(run())
    assert "text" in final
    s = sorted(lat)
    print(f"\nstreaming chunk->partial latency: median {s[len(s)//2]*1000:.1f} ms, "
          f"max {s[-1]*1000:.1f} ms over {len(lat)} chunks")
    # generous CPU-tiny-model bound: decode-block chunks include a jitted
    # forward; anything near this bound means the pipeline is broken
    assert s[len(s) // 2] < 5.0
