"""Streaming CTC recognition: block-wise decoder + websocket server.

Capability counterpart of the reference's Vosk streaming recognizer
(kaldi_infer.py KaldiRecognizer 8 kB chunks :221-253) and the LinTO
websocket service consumed by linstt_streaming (ssak/utils/linstt.py:283):

* `StreamingCTCDecoder` — feed arbitrary waveform chunks; blocks of
  `block_seconds` run through the acoustic model with `context_seconds` of
  left context (recomputed, conv/attention context approximation); greedy
  tokens collapse across blocks; partial results after every block, final
  on `finalize()`.
* `serve_streaming` — websocket server speaking the client protocol of
  ssak_tpu.remote.remote_streaming: JSON config, binary int16 chunks,
  {"eof": 1} -> {"partial"} / {"text"} messages.
"""

import asyncio
import json

import numpy as np


class StreamingCTCDecoder:
    def __init__(
        self,
        model,
        sample_rate: int = 16000,
        block_seconds: float = 2.0,
        context_seconds: float = 0.64,
    ):
        self.model = model
        self.sample_rate = sample_rate
        self.block = int(block_seconds * sample_rate)
        self.context = int(context_seconds * sample_rate)
        self.reset()

    def reset(self):
        self._buffer = np.zeros(0, np.float32)
        self._tokens = []
        self._pending_partial = ""

    def accept_waveform(self, chunk) -> bool:
        """Feed float32 samples (or int16 bytes). Returns True when a new
        block was decoded (partial result available)."""
        if isinstance(chunk, (bytes, bytearray)):
            chunk = np.frombuffer(chunk, "<i2").astype(np.float32) / 32768.0
        self._buffer = np.concatenate([self._buffer, np.asarray(chunk, np.float32)])
        decoded = False
        while len(self._buffer) >= self.block + self.context:
            self._decode_block(self._buffer[: self.block + self.context], emit=self.block)
            self._buffer = self._buffer[self.block:]
            decoded = True
        return decoded

    def _decode_block(self, audio, emit: int):
        """Run the model on [left_context + block]; keep tokens whose frames
        fall inside the emitted span."""
        import jax.numpy as jnp

        from ssak_tpu.infer.general import compute_log_probas
        from ssak_tpu.ops.ctc import ctc_greedy_decode

        pad = int(np.ceil(len(audio) / self.block)) * self.block + self.context
        x = np.zeros((1, pad), np.float32)
        x[0, : len(audio)] = audio
        lp, fl = compute_log_probas(self.model, jnp.asarray(x), jnp.asarray([len(audio)], np.int32))
        total_frames = int(fl[0])
        # frames belonging to previously-emitted audio (all but last `emit`)
        skip_frames = int(round(total_frames * (len(audio) - emit) / max(1, len(audio))))
        best = np.asarray(jnp.argmax(lp[0, :total_frames], axis=-1))
        prev = self._tokens[-1] if self._tokens else self.model.cfg.blank_id
        for t in range(skip_frames, total_frames):
            tok = int(best[t])
            if tok != self.model.cfg.blank_id and tok != prev:
                self._tokens.append(tok)
            prev = tok

    def partial_result(self) -> str:
        return self.model.tokenizer.decode(self._tokens)

    def finalize(self) -> str:
        if len(self._buffer) > self.sample_rate // 50:
            self._decode_block(self._buffer, emit=len(self._buffer))
        self._buffer = np.zeros(0, np.float32)
        return self.partial_result()


async def _handle_connection(ws, model):
    decoder = None
    async for msg in ws:
        if isinstance(msg, (bytes, bytearray)):
            if decoder is None:
                decoder = StreamingCTCDecoder(model)
            decoder.accept_waveform(msg)
            # the LinTO/Vosk protocol replies to EVERY audio chunk — the
            # reference client recv()s after each send (linstt.py:313-320)
            # and would deadlock otherwise
            await ws.send(json.dumps({"partial": decoder.partial_result()}, ensure_ascii=False))
        else:
            data = json.loads(msg)
            if "config" in data:
                decoder = StreamingCTCDecoder(model, sample_rate=data["config"].get("sample_rate", 16000))
            elif data.get("eof"):
                if decoder is None:
                    decoder = StreamingCTCDecoder(model)
                await ws.send(json.dumps({"text": decoder.finalize()}, ensure_ascii=False))
                return


async def serve_streaming(model, host: str = "127.0.0.1", port: int = 0):
    """Start the websocket ASR service; returns the server object (use
    server.sockets[0].getsockname() for the bound port)."""
    import websockets

    return await websockets.serve(lambda ws: _handle_connection(ws, model), host, port)


def main(argv=None):
    import argparse

    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description="Streaming CTC websocket ASR server")
    p.add_argument("--model", default=None)
    p.add_argument("--seeded_test_config", default=None, help=argparse.SUPPRESS)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=2700)
    args = p.parse_args(argv)

    from ssak_tpu.infer.general import load_model

    model = load_model(args.model, seeded_test_config=args.seeded_test_config)

    async def run():
        server = await serve_streaming(model, args.host, args.port)
        addr = server.sockets[0].getsockname()
        print(f"streaming ASR listening on ws://{addr[0]}:{addr[1]}", flush=True)
        await asyncio.Future()

    asyncio.run(run())


if __name__ == "__main__":
    main()
