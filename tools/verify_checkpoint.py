"""Real-checkpoint readiness verifier — one command, pass/fail JSON.

The reference's quality numbers are measured against pretrained
``facebook/wav2vec2-large-960h-lv60-self`` weights fetched from the HF
hub (reference: src/training_utils/build.py:225-231). This build
environment is zero-egress, so those weights cannot be fetched — but
the moment someone HAS them locally, this tool proves the whole path in
one command:

    python tools/verify_checkpoint.py --checkpoint /path/to/model.safetensors

Stages (each recorded in the report JSON, overall ``pass`` is the AND):

  1. convert       — torch-free read (models/checkpoint_io.py) and
                     HF-layout → Flax-tree conversion (models/convert.py),
                     with the architecture inferred from tensor shapes.
  2. torch_parity  — logits fingerprint vs the *installed* torch HF
                     ``Wav2Vec2ForCTC`` carrying the same weights, on a
                     fixed probe waveform (skipped cleanly when torch /
                     transformers are absent).
  3. clean_wer     — greedy-decode WER through the real ingestion +
                     eval path on a chosen corpus (``--dataset
                     librispeech --data_root ...`` for real speech;
                     synthetic by default so the tool itself is testable
                     offline).
  4. attack_smoke  — N fused attack steps (untargeted PGD, linf) must
                     move the training CTC loss up: proves the frozen
                     model is differentiable-through and the attack loop
                     runs against these exact weights.

A ``skipif``-gated pytest wrapper lives in tests/test_real_checkpoint.py
— green-skipped until real weights exist, green-run the day they do.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

# runnable as a plain script from anywhere: the repo root (parent of
# tools/) must resolve paa_tpu
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


# --- stage 1: load + convert -------------------------------------------------

def find_weights_file(path: str) -> str:
    """Accept a file or an HF checkpoint directory."""
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                return cand
        # non-HF layouts: accept a lone weights file of either format
        loose = sorted(
            os.path.join(path, n) for n in os.listdir(path)
            if n.endswith((".safetensors", ".bin"))
        )
        if len(loose) == 1:
            return loose[0]
        raise FileNotFoundError(
            f"no model.safetensors / pytorch_model.bin (or single "
            f"*.safetensors/*.bin) under {path!r}; candidates: {loose}"
        )
    return path


def infer_config(sd: dict):
    """Infer the Wav2Vec2Config from state-dict tensor shapes.

    Named presets are matched on (hidden_size, num_layers); anything else
    becomes a custom config (heads assumed hidden/64, HF's convention for
    this family). ``do_stable_layer_norm`` is not recoverable from tensor
    shapes — HF ties it to feat_extract_norm=="layer" across the wav2vec2
    family, and we follow that here.
    """
    from paa_tpu.models import wav2vec2

    hidden = sd["wav2vec2.feature_projection.projection.weight"].shape[0]
    layers = 1 + max(
        int(k.split(".")[3]) for k in sd if k.startswith("wav2vec2.encoder.layers.")
    )
    n_conv = 1 + max(
        int(k.split(".")[3])
        for k in sd
        if k.startswith("wav2vec2.feature_extractor.conv_layers.")
        and k.endswith("conv.weight")
    )
    conv_dim = tuple(
        int(sd[f"wav2vec2.feature_extractor.conv_layers.{i}.conv.weight"].shape[0])
        for i in range(n_conv)
    )
    conv_bias = "wav2vec2.feature_extractor.conv_layers.0.conv.bias" in sd
    feat_norm = (
        "layer"
        if "wav2vec2.feature_extractor.conv_layers.1.layer_norm.weight" in sd
        else "group"
    )
    vocab = int(sd["lm_head.weight"].shape[0])
    inter = int(
        sd["wav2vec2.encoder.layers.0.feed_forward.intermediate_dense.weight"].shape[0]
    )
    for name, preset in wav2vec2.PRESETS.items():
        if (preset.hidden_size, preset.num_hidden_layers) == (hidden, layers):
            return name, wav2vec2.get_config(
                name, vocab_size=vocab, conv_bias=conv_bias,
                feat_extract_norm=feat_norm,
            )
    cfg = wav2vec2.Wav2Vec2Config(
        vocab_size=vocab,
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=max(1, hidden // 64),
        intermediate_size=inter,
        conv_dim=conv_dim,
        conv_bias=conv_bias,
        feat_extract_norm=feat_norm,
        do_stable_layer_norm=(feat_norm == "layer"),
        do_normalize=(feat_norm == "layer"),
    )
    return "custom", cfg


# --- stage 2: torch logits parity -------------------------------------------

def torch_parity(sd: dict, cfg, probe_audio: np.ndarray, tol: float) -> dict:
    """Compare our Flax forward against torch HF carrying the same weights.

    Both sides see the identical raw waveform, so the comparison runs our
    model with do_normalize=False (HF's normalization lives in the
    processor, not the torch module). float32 end to end.
    """
    try:
        import torch
        from transformers import Wav2Vec2Config as HFConfig
        from transformers import Wav2Vec2ForCTC as TorchW2V
    except ImportError as e:  # torch-free deployment: skip, don't fail
        return {"ok": "skipped", "reason": f"torch/transformers unavailable: {e}"}

    import jax.numpy as jnp

    from paa_tpu.models import convert, wav2vec2

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim),
        conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride),
        conv_bias=cfg.conv_bias,
        feat_extract_norm=cfg.feat_extract_norm,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch_model = TorchW2V(hf_cfg).eval()
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    # legacy weight-norm naming → the parametrizations naming the torch
    # module registers (transformers handles this inside from_pretrained;
    # plain load_state_dict does not)
    pce = "wav2vec2.encoder.pos_conv_embed.conv"
    module_keys = set(torch_model.state_dict())
    for old, new in ((f"{pce}.weight_g", f"{pce}.parametrizations.weight.original0"),
                     (f"{pce}.weight_v", f"{pce}.parametrizations.weight.original1")):
        if old in tsd and new in module_keys:
            tsd[new] = tsd.pop(old)
    missing, unexpected = torch_model.load_state_dict(tsd, strict=False)
    # masked_spec_embed only matters under spec-augment (disabled here)
    blocking = [k for k in missing if "masked_spec_embed" not in k]
    if blocking:
        return {"ok": False, "reason": f"torch load missing keys: {blocking[:8]}"}

    cmp_cfg = dataclasses.replace(
        cfg, do_normalize=False, compute_dtype="float32",
        attention_impl="xla", conv_impl="conv",
    )
    params = convert.convert_hf_state_dict(sd, cmp_cfg)
    ours = np.asarray(
        wav2vec2.Wav2Vec2ForCTC(cmp_cfg).apply(
            {"params": params}, jnp.asarray(probe_audio)
        ),
        dtype=np.float32,
    )
    with torch.no_grad():
        theirs = torch_model(
            input_values=torch.from_numpy(probe_audio)
        ).logits.numpy()
    max_abs = float(np.max(np.abs(ours - theirs)))
    scale = float(np.max(np.abs(theirs)) + 1e-12)
    return {
        "ok": bool(max_abs <= tol * scale),
        "max_abs_diff": max_abs,
        "logits_scale": scale,
        "rel_tol": tol,
        "unexpected_keys": [k for k in unexpected][:8],
        "fingerprint": {
            "mean": float(ours.mean()),
            "std": float(ours.std()),
            "first8": [float(v) for v in ours.ravel()[:8]],
        },
    }


# --- stage 3 + 4: WER and attack smoke --------------------------------------

def clean_wer(params, cfg, pipe, batch_size: int) -> dict:
    import jax

    from paa_tpu.models import wav2vec2
    from paa_tpu.train import pretrain

    logits_fn = pretrain.make_logits_fn(wav2vec2.Wav2Vec2ForCTC(cfg))
    wer, ctc = pretrain.evaluate_wer(
        logits_fn, jax.tree.map(np.asarray, params), pipe.eval, batch_size
    )
    return {"wer": float(wer), "ctc_mean": float(ctc), "n_eval": len(pipe.eval)}


def attack_smoke(params, cfg, pipe, steps: int, batch_size: int) -> dict:
    """A few untargeted PGD/linf steps must push the training CTC up."""
    import jax.numpy as jnp

    from paa_tpu.attack import optimizers, step as attack_step
    from paa_tpu.config import AttackConfig, ConstraintParams
    from paa_tpu.models import wav2vec2
    from paa_tpu.ops import psycho

    acfg = AttackConfig(
        norm_type="linf", optimizer_type="pgd", lr=1e-3,
        batch_size=batch_size, remat=False,
    )
    model = wav2vec2.Wav2Vec2ForCTC(cfg)
    apply_fn = lambda prm, a: model.apply({"params": prm}, a)
    tables = psycho.build_tables(acfg)
    cparams = ConstraintParams.create(linf_size=1e-3)
    train = attack_step.make_train_step(acfg, apply_fn, tables)
    lr = jnp.float32(acfg.lr)

    batch = next(iter(pipe.train.batches(batch_size, drop_remainder=True)))
    audio = jnp.asarray(batch.audio)
    labels = jnp.asarray(batch.labels)
    pads = jnp.asarray(batch.label_paddings)
    weights = jnp.asarray(batch.weights)
    p = jnp.zeros((1, audio.shape[1]), jnp.float32)
    opt = optimizers.init_opt_state(acfg, p)
    losses = []
    for _ in range(steps):
        p, opt, m = train(params, p, opt, audio, labels, pads, weights, cparams, lr)
        losses.append(float(m.ctc_loss))
    return {
        "ok": bool(losses[-1] > losses[0]) and bool(np.isfinite(losses).all()),
        "ctc_first": losses[0],
        "ctc_last": losses[-1],
        "steps": steps,
    }


def verify(checkpoint: str, dataset: str = "synthetic", data_root: str | None = None,
           max_wer: float = 0.5, parity_rel_tol: float = 2e-4,
           smoke_steps: int = 10, batch_size: int = 8,
           skip_torch: bool = False, synthetic_samples: int = 256) -> dict:
    """Run every stage; return the report dict (see module docstring)."""
    from paa_tpu.data import datasets, pipeline as pipeline_lib
    from paa_tpu.models import checkpoint_io, convert

    report: dict = {"checkpoint": os.path.abspath(checkpoint), "stages": {}}

    weights = find_weights_file(checkpoint)
    sd = checkpoint_io.load_state_dict(weights)
    preset, cfg = infer_config(sd)
    params = convert.convert_hf_state_dict(sd, cfg)
    n_params = int(sum(np.asarray(v).size for v in
                       __import__("jax").tree.leaves(params)))
    report["preset"] = preset
    report["stages"]["convert"] = {
        "ok": True, "weights_file": weights, "n_params": n_params,
        "hidden_size": cfg.hidden_size, "num_layers": cfg.num_hidden_layers,
        "feat_extract_norm": cfg.feat_extract_norm,
    }

    rng = np.random.default_rng(0)
    probe = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    if skip_torch:
        report["stages"]["torch_parity"] = {"ok": "skipped", "reason": "--skip_torch"}
    else:
        report["stages"]["torch_parity"] = torch_parity(sd, cfg, probe, parity_rel_tol)

    samples = datasets.load_dataset_tuples(
        dataset, seed=0, data_root=data_root, synthetic_samples=synthetic_samples
    )
    pipe = pipeline_lib.build_pipeline(samples, seed=0)
    wer_stage = clean_wer(params, cfg, pipe, batch_size)
    wer_stage["dataset"] = dataset
    wer_stage["max_wer"] = max_wer
    wer_stage["ok"] = bool(wer_stage["wer"] <= max_wer)
    report["stages"]["clean_wer"] = wer_stage

    report["stages"]["attack_smoke"] = attack_smoke(
        params, cfg, pipe, smoke_steps, batch_size
    )

    report["pass"] = all(
        s["ok"] in (True, "skipped") for s in report["stages"].values()
    )
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", required=True,
                    help="model.safetensors / pytorch_model.bin, or an HF "
                         "checkpoint directory containing one")
    ap.add_argument("--dataset", default="synthetic",
                    help="corpus for clean WER + smoke (synthetic | librispeech | ...)")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--max_wer", type=float, default=0.5,
                    help="clean-WER pass bar (reference's union clean WER "
                         "is 0.41, README.md:91-93)")
    ap.add_argument("--parity_rel_tol", type=float, default=2e-4,
                    help="torch-vs-Flax logits max-abs tolerance, relative "
                         "to the logits scale")
    ap.add_argument("--smoke_steps", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--synthetic_samples", type=int, default=256)
    ap.add_argument("--skip_torch", action="store_true",
                    help="skip the torch parity stage")
    ap.add_argument("--out", default=None, help="write the report JSON here")
    ap.add_argument("--platform", default=None, help="jax platform pin (tpu/cpu)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    report = verify(
        args.checkpoint, dataset=args.dataset, data_root=args.data_root,
        max_wer=args.max_wer, parity_rel_tol=args.parity_rel_tol,
        smoke_steps=args.smoke_steps, batch_size=args.batch_size,
        skip_torch=args.skip_torch, synthetic_samples=args.synthetic_samples,
    )
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
