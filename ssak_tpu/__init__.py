"""ssak_tpu — a TPU-native speech toolkit.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
linto-ai/ssak ("Speech Swiss Army Knife"): Kaldi-format corpus ingest,
ASR inference (CTC and seq2seq), training, text normalization, WER
evaluation, forced alignment, VAD, augmentation and data curation —
built for TPU hardware (SPMD meshes, pjit, Pallas kernels) rather than
wrapping PyTorch ecosystems.

Layer map (mirrors reference SURVEY.md §1):
  L0 audio/system      ssak_tpu.audio, ssak_tpu.utils
  L1 kaldi format      ssak_tpu.data.kaldi*
  L2 dataset pipeline  ssak_tpu.data.dataset
  L3 text norm         ssak_tpu.text
  L4 inference         ssak_tpu.infer, ssak_tpu.models, ssak_tpu.decode
  L5 training          ssak_tpu.train
  L6 evaluation        ssak_tpu.eval
  L7 alignment etc.    ssak_tpu.align, ssak_tpu.augment
"""

from ssak_tpu.version import __version__

__all__ = ["__version__"]
