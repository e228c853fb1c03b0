"""HF PyTorch Wav2Vec2ForCTC checkpoint → paa_tpu Flax parameter tree.

The reference loads ``facebook/wav2vec2-large-960h-lv60-self`` through
HF transformers (reference: src/training_utils/build.py:225-231). The
TPU build loads the same checkpoints by converting the torch state_dict
into the Flax tree of models/wav2vec2.py (encoder layers stacked along a
leading axis for the scan-based encoder).

Conversion is pure numpy — no torch needed at attack time — and is
verified by logits-parity tests against the torch implementation on
random-init weights (tests/test_wav2vec2.py), so correctness does not
depend on network access to the real checkpoints.
"""

from __future__ import annotations

import numpy as np

from paa_tpu.models.wav2vec2 import Wav2Vec2Config


def _t(x) -> np.ndarray:
    """torch tensor / array → numpy float32."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def convert_hf_state_dict(sd: dict, cfg: Wav2Vec2Config) -> dict:
    """Convert an HF ``Wav2Vec2ForCTC`` state_dict to our param pytree.

    Accepts either torch tensors or numpy arrays as values. Handles both
    the modern weight-norm parametrization naming
    (``...parametrizations.weight.original0/1``) and the legacy
    ``weight_g``/``weight_v`` naming used by older checkpoint dumps.
    """
    sd = {k: v for k, v in sd.items()}
    get = lambda k: _t(sd[k])

    def linear(prefix: str) -> dict:
        return {
            "kernel": get(f"{prefix}.weight").T,
            "bias": get(f"{prefix}.bias"),
        }

    def norm(prefix: str) -> dict:
        return {
            "scale": get(f"{prefix}.weight"),
            "bias": get(f"{prefix}.bias"),
        }

    params: dict = {}

    # Feature extractor -----------------------------------------------------
    fe: dict = {}
    for i in range(len(cfg.conv_dim)):
        pre = f"wav2vec2.feature_extractor.conv_layers.{i}"
        # torch Conv1d (out, in, K) → our (K, in, out) WIO layout, which
        # every conv_impl shares (models/wav2vec2.py ConvLayer)
        w = get(f"{pre}.conv.weight").transpose(2, 1, 0)
        layer = {"conv_kernel": w}
        if cfg.conv_bias:
            layer["conv_bias"] = get(f"{pre}.conv.bias")
        if (cfg.feat_extract_norm == "group" and i == 0) or cfg.feat_extract_norm == "layer":
            layer["layer_norm"] = norm(f"{pre}.layer_norm")
        fe[f"conv_layers_{i}"] = layer
    params["feature_extractor"] = fe

    # Feature projection ----------------------------------------------------
    params["feature_projection"] = {
        "layer_norm": norm("wav2vec2.feature_projection.layer_norm"),
        "projection": linear("wav2vec2.feature_projection.projection"),
    }

    # Positional conv embedding (weight-normed grouped conv) ----------------
    pce = "wav2vec2.encoder.pos_conv_embed.conv"
    if f"{pce}.parametrizations.weight.original0" in sd:
        g = get(f"{pce}.parametrizations.weight.original0")  # (1, 1, K)
        v = get(f"{pce}.parametrizations.weight.original1")  # (out, in/g, K)
    else:  # legacy naming
        g = get(f"{pce}.weight_g")
        v = get(f"{pce}.weight_v")
    pos_conv = {
        "weight_g": g,
        "weight_v": v.transpose(2, 1, 0),  # → (K, in/g, out)
        "bias": get(f"{pce}.bias"),
    }

    # Encoder ---------------------------------------------------------------
    def layer_tree(i: int) -> dict:
        pre = f"wav2vec2.encoder.layers.{i}"
        return {
            "attention": {
                name: linear(f"{pre}.attention.{name}")
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "layer_norm": norm(f"{pre}.layer_norm"),
            "final_layer_norm": norm(f"{pre}.final_layer_norm"),
            "feed_forward": {
                "intermediate_dense": linear(f"{pre}.feed_forward.intermediate_dense"),
                "output_dense": linear(f"{pre}.feed_forward.output_dense"),
            },
        }

    import jax

    per_layer = [layer_tree(i) for i in range(cfg.num_hidden_layers)]
    stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *per_layer)

    params["encoder"] = {
        "pos_conv_embed": pos_conv,
        "layer_norm": norm("wav2vec2.encoder.layer_norm"),
        "layers": stacked,
    }

    # CTC head ---------------------------------------------------------------
    params["lm_head"] = linear("lm_head")
    return params


def export_hf_state_dict(params: dict, cfg: Wav2Vec2Config) -> dict:
    """Inverse of :func:`convert_hf_state_dict`: Flax param pytree → HF
    ``Wav2Vec2ForCTC`` state_dict layout (numpy float32 values).

    Lets in-repo trained models (train/pretrain.py) ship as standard HF
    checkpoint files readable by ``--checkpoint_path`` (and by HF torch
    itself). Uses the modern weight-norm parametrization naming; verified
    round-trip-exact against ``convert_hf_state_dict`` in tests.
    """
    f32 = lambda x: np.asarray(x, dtype=np.float32)
    sd: dict = {}

    fe = params["feature_extractor"]
    for i in range(len(cfg.conv_dim)):
        layer = fe[f"conv_layers_{i}"]
        pre = f"wav2vec2.feature_extractor.conv_layers.{i}"
        # our (K, in, out) WIO layout → torch Conv1d (out, in, K)
        sd[f"{pre}.conv.weight"] = f32(layer["conv_kernel"]).transpose(2, 1, 0)
        if cfg.conv_bias:
            sd[f"{pre}.conv.bias"] = f32(layer["conv_bias"])
        if "layer_norm" in layer:
            sd[f"{pre}.layer_norm.weight"] = f32(layer["layer_norm"]["scale"])
            sd[f"{pre}.layer_norm.bias"] = f32(layer["layer_norm"]["bias"])

    fp = params["feature_projection"]
    sd["wav2vec2.feature_projection.layer_norm.weight"] = f32(fp["layer_norm"]["scale"])
    sd["wav2vec2.feature_projection.layer_norm.bias"] = f32(fp["layer_norm"]["bias"])
    sd["wav2vec2.feature_projection.projection.weight"] = f32(fp["projection"]["kernel"]).T
    sd["wav2vec2.feature_projection.projection.bias"] = f32(fp["projection"]["bias"])

    enc = params["encoder"]
    pce = "wav2vec2.encoder.pos_conv_embed.conv"
    sd[f"{pce}.parametrizations.weight.original0"] = f32(enc["pos_conv_embed"]["weight_g"])
    sd[f"{pce}.parametrizations.weight.original1"] = f32(
        enc["pos_conv_embed"]["weight_v"]
    ).transpose(2, 1, 0)
    sd[f"{pce}.bias"] = f32(enc["pos_conv_embed"]["bias"])
    sd["wav2vec2.encoder.layer_norm.weight"] = f32(enc["layer_norm"]["scale"])
    sd["wav2vec2.encoder.layer_norm.bias"] = f32(enc["layer_norm"]["bias"])

    layers = enc["layers"]  # stacked (L, ...) along axis 0
    for i in range(cfg.num_hidden_layers):
        pre = f"wav2vec2.encoder.layers.{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin = layers["attention"][name]
            sd[f"{pre}.attention.{name}.weight"] = f32(lin["kernel"][i]).T
            sd[f"{pre}.attention.{name}.bias"] = f32(lin["bias"][i])
        for norm_name in ("layer_norm", "final_layer_norm"):
            sd[f"{pre}.{norm_name}.weight"] = f32(layers[norm_name]["scale"][i])
            sd[f"{pre}.{norm_name}.bias"] = f32(layers[norm_name]["bias"][i])
        for dense in ("intermediate_dense", "output_dense"):
            lin = layers["feed_forward"][dense]
            sd[f"{pre}.feed_forward.{dense}.weight"] = f32(lin["kernel"][i]).T
            sd[f"{pre}.feed_forward.{dense}.bias"] = f32(lin["bias"][i])

    sd["lm_head.weight"] = f32(params["lm_head"]["kernel"]).T
    sd["lm_head.bias"] = f32(params["lm_head"]["bias"])
    return sd


def _find_cached_weights(repo: str) -> str | None:
    """Locate model.safetensors / pytorch_model.bin in the standard HF hub
    cache layout without importing huggingface_hub."""
    import glob
    import os

    cache = os.environ.get(
        "HF_HUB_CACHE",
        os.path.join(
            os.environ.get(
                "HF_HOME", os.path.expanduser("~/.cache/huggingface")
            ),
            "hub",
        ),
    )
    repo_dir = os.path.join(cache, "models--" + repo.replace("/", "--"))
    # Resolve the snapshot the way huggingface_hub would: refs/main names
    # the current revision. Snapshot dir names are commit SHAs — sorting
    # them lexicographically picks an ARBITRARY revision, so without a
    # ref we fall back to the most recently created snapshot instead.
    ref = os.path.join(repo_dir, "refs", "main")
    snapshots = []
    if os.path.exists(ref):
        with open(ref) as fh:
            snapshots = [os.path.join(repo_dir, "snapshots", fh.read().strip())]
        # a ref pointing at a pruned/absent snapshot must not shadow the
        # mtime fallback — other snapshots may still hold the weights
        snapshots = [s for s in snapshots if os.path.isdir(s)]
    if not snapshots:
        snapshots = sorted(
            glob.glob(os.path.join(repo_dir, "snapshots", "*")),
            key=os.path.getmtime,
            reverse=True,
        )
    for snap in snapshots:
        for fname in ("model.safetensors", "pytorch_model.bin"):
            hit = os.path.join(snap, fname)
            if os.path.exists(hit):
                return hit
    return None


def load_hf_checkpoint(model_name: str, cfg: Wav2Vec2Config) -> dict:
    """Load + convert an HF checkpoint (requires local cache or network).

    Tries a torch-free read of the HF hub cache first
    (models/checkpoint_io.py); only falls back to transformers'
    ``from_pretrained`` when no cached weights file exists. In the
    zero-egress build environment this raises a clear error; the pipeline
    then falls back to random init (documented divergence: absolute
    CTC/WER values need the real weights, relative attack dynamics and
    all throughput numbers do not).
    """
    hf_names = {
        "wav2vec2-base": "facebook/wav2vec2-base-960h",
        "wav2vec2-large-lv60": "facebook/wav2vec2-large-960h-lv60-self",
    }
    repo = hf_names.get(model_name, model_name)
    cached = _find_cached_weights(repo)
    if cached is not None:
        from paa_tpu.models import checkpoint_io

        return convert_hf_state_dict(checkpoint_io.load_state_dict(cached), cfg)
    try:
        import os

        os.environ.setdefault("HF_HUB_OFFLINE", "0")
        from transformers import Wav2Vec2ForCTC as TorchW2V

        torch_model = TorchW2V.from_pretrained(repo, local_files_only=bool(
            int(os.environ.get("PAA_HF_LOCAL_ONLY", "1"))
        ))
    except Exception as e:  # pragma: no cover - environment dependent
        raise RuntimeError(
            f"Could not load HF checkpoint {repo!r} (offline environment?). "
            "Use random init or a local checkpoint path."
        ) from e
    return convert_hf_state_dict(torch_model.state_dict(), cfg)
