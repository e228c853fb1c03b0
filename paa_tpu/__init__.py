"""paa_tpu — TPU-native psychoacoustic adversarial attacks on CTC ASR.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference PyTorch codebase `tomer-erez/Psychoacoustic-adverserial-attacks`:
universal adversarial perturbations against frozen Wav2Vec2-CTC models,
projected onto psychoacoustic feasibility sets (ISO-226 equal-loudness
based Fletcher-Munson norm, max-phon clipping, frequency band masks, and
time-domain l2/linf/SNR/TV norms), trained with PGD or Adam, evaluated by
CTC loss and WER — with every attack step compiled as a single XLA program
and sharded over a TPU mesh.

Layout (mirrors SURVEY.md §7):
  ops/       pure-function compute ops: DSP (STFT), ISO-226, projections,
             CTC loss/decode, WER, Pallas kernels
  models/    Flax Wav2Vec2-CTC (base/large) + HF checkpoint conversion
  attack/    the jitted attack step (forward + grad wrt p + update + project)
  parallel/  mesh construction and sharding specs (data / sweep axes)
  data/      dataset adapters + synthetic corpus + batching pipeline
  train/     epoch orchestration, checkpointing, artifacts, logging
  cli/       argparse-compatible flag surface + run_attack / sweep entries
  native/    C host-side helpers (batched Levenshtein for WER)
"""

__version__ = "0.1.0"
