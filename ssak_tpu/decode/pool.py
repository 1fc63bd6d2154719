"""Process-pool host prefix-beam decoding.

The host prefix beam (decode/ctc_beam.ctc_prefix_beam_search) is the only
path for word-LM orders > 3 or OOV-permissive decoding (the device beam
constrains hypotheses to the lexicon), and it is pure Python per utterance.
The reference parallelized the identical problem with a process pool
(ssak/infer/kaldi_infer.py:175 multiprocessing over utterances); this is
the same move, shaped for this runtime:

* workers are SPAWNED, never forked — the parent holds a live TPU client
  whose runtime threads do not survive fork;
* workers never import jax (this module and decode.ctc_beam/lm/lexicon are
  jax-free at import time), so each worker costs one ARPA load, not a
  60 s device-runtime init;
* the LM/lexicon are loaded once per worker from their paths (an ArpaLM
  table can be hundreds of MB — shipping it per task would drown the win);
  only the (T, V) log-prob arrays cross the pipe.
"""

import os

_WORKER = {}


def _init_worker(lm_path, lexicon_path, vocab, blank_id, beam_width, alpha, beta):
    # never let a worker touch a device even if someone later imports jax.
    # The env var alone is NOT enough on this runtime: a sitecustomize has
    # already imported jax with the TPU plugin by the time this initializer
    # runs in the spawned worker, so the platform must be re-pinned through
    # jax.config (apply_platform_env) — advisor r3 finding.
    os.environ["JAX_PLATFORMS"] = "cpu"
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    lm = None
    if lm_path:
        from ssak_tpu.decode.lm import ArpaLM

        lm = ArpaLM(lm_path)
    lexicon = None
    if lexicon_path:
        from ssak_tpu.decode.lexicon import Lexicon

        lexicon = Lexicon.from_file(lexicon_path)
    _WORKER.update(
        lm=lm, lexicon=lexicon, vocab=list(vocab), blank_id=blank_id,
        beam_width=beam_width, alpha=alpha, beta=beta,
    )


def _decode_one(lp):
    from ssak_tpu.decode.ctc_beam import ctc_prefix_beam_search

    res = ctc_prefix_beam_search(
        lp, _WORKER["vocab"], blank_id=_WORKER["blank_id"],
        beam_width=_WORKER["beam_width"], lm=_WORKER["lm"],
        alpha=_WORKER["alpha"], beta=_WORKER["beta"], lexicon=_WORKER["lexicon"],
    )
    return res[0][0] if res else ""


class HostBeamPool:
    """Decode (T, V) log-prob arrays to text across worker processes.

    Create once per run (worker startup = ARPA load), feed it every batch,
    close at the end. Capability match: reference kaldi_infer.py:175."""

    def __init__(self, n_workers, lm_path=None, lexicon_path=None, vocab=(),
                 blank_id: int = 0, beam_width: int = 25,
                 alpha: float = 0.5, beta: float = 1.5):
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        self.pool = ctx.Pool(
            max(1, n_workers), initializer=_init_worker,
            initargs=(lm_path, lexicon_path, list(vocab), blank_id, beam_width, alpha, beta),
        )

    def decode(self, log_probs_list):
        """log_probs_list: list of (T_b, V) float32 numpy arrays (already
        length-trimmed). Returns list of transcripts, order-preserving."""
        return self.pool.map(_decode_one, log_probs_list, chunksize=1)

    def decode_async(self, log_probs_list):
        """Non-blocking decode: returns a handle whose .get() yields the
        transcripts. Lets the caller enqueue the NEXT batch's device work
        while the workers chew on this one (ctc_infer's batch pipeline)."""
        return self.pool.map_async(_decode_one, log_probs_list, chunksize=1)

    def close(self):
        self.pool.close()
        self.pool.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
