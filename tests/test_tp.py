"""Tensor-parallel (Megatron) layout tests.

The reference never shards the model (one whole model per GPU,
reference: submit_scan_range.py:52-66); parallel/tp.py adds the
TPU-native second axis — encoder q/k/v + FFN-in column-sharded,
out/FFN-out row-sharded over a ``model`` mesh axis — expressed as GSPMD
param shardings. These tests pin (a) the per-leaf spec mapping against
the real flax param tree, (b) dp×tp numerical parity with the
single-device step on the 8-device virtual CPU mesh, and (c) the
divisibility validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from paa_tpu.attack import optimizers, step as attack_step
from paa_tpu.config import AttackConfig, ConstraintParams
from paa_tpu.models import wav2vec2
from paa_tpu.ops import psycho, text
from paa_tpu.parallel import mesh as mesh_lib, tp

B, T = 8, 4000


@pytest.fixture(scope="module")
def setup():
    mcfg = wav2vec2.get_config("wav2vec2-tiny")
    params = wav2vec2.init_params(mcfg, example_len=T)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, audio: model.apply({"params": prm}, audio)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.05)
    labels, pads = text.encode_batch(["hello world", "testing"] * (B // 2))
    return mcfg, params, apply_fn, audio, jnp.asarray(labels), jnp.asarray(pads)


# -- spec mapping --------------------------------------------------------------


def test_param_specs_cover_megatron_layout(setup):
    """Every q/k/v + FFN-in kernel is column-sharded, every out/FFN-out
    kernel row-sharded, and everything else replicated — checked against
    the REAL flax tree (scanned encoder: kernels carry a leading L axis)."""
    mcfg, params, *_ = setup
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    col = row = repl = 0
    for path, leaf in flat:
        names = tuple(str(getattr(k, "key", k)) for k in path)
        spec = tp.param_spec(names, leaf.ndim)
        owner, leaf = names[-2], names[-1]
        if owner in ("q_proj", "k_proj", "v_proj", "intermediate_dense"):
            assert spec[-1] == "model", names
            assert all(s is None for s in spec[:-1]), names
            col += 1
        elif owner in ("out_proj", "output_dense") and leaf == "kernel":
            assert spec[-2] == "model" and spec[-1] is None, names
            row += 1
        else:
            assert spec == P(), names
            repl += 1
    # tiny model: 2 layers × (4 col kernels + 4 col biases) and
    # 2 layers × 2 row kernels — scanned, so one stacked leaf each.
    assert col == 8 and row == 2 and repl > 0


def test_param_shardings_replicated_without_model_axis(setup):
    """On a mesh with no ``model`` axis the helper degrades to fully
    replicated, so callers can use it unconditionally."""
    _, params, *_ = setup
    mesh = mesh_lib.data_mesh(8)
    sh = tp.param_shardings(params, mesh)
    assert all(s.spec == P() for s in jax.tree.leaves(sh))


def test_check_model_axis_divisibility():
    mcfg = wav2vec2.get_config("wav2vec2-tiny")  # heads=4, ffn=128
    tp.check_model_axis(mcfg, 1)
    tp.check_model_axis(mcfg, 2)
    tp.check_model_axis(mcfg, 4)
    with pytest.raises(ValueError, match="num_attention_heads"):
        tp.check_model_axis(mcfg, 8)
    lv60 = wav2vec2.get_config("wav2vec2-large-lv60")  # heads=16, ffn=4096
    tp.check_model_axis(lv60, 8)


def test_tp_mesh_shape_and_validation():
    mesh = mesh_lib.tp_mesh(2, n_devices=8)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    with pytest.raises(ValueError, match="divide"):
        mesh_lib.tp_mesh(3, n_devices=8)


def test_decide_mesh_single_home():
    """decide_mesh is the one home for the run-mesh choice (shared by
    AttackRunner and the model's attn_mesh): tp>1 → (data, model); else
    data when the batch divides the devices; else None."""
    m = mesh_lib.decide_mesh(2, batch_size=8, n_devices=8)
    assert m.axis_names == ("data", "model") and m.shape["model"] == 2
    m = mesh_lib.decide_mesh(1, batch_size=8, n_devices=8)
    assert m.axis_names == ("data",) and m.shape["data"] == 8
    assert mesh_lib.decide_mesh(1, batch_size=6, n_devices=8) is None
    assert mesh_lib.decide_mesh(1, batch_size=8, n_devices=1) is None
    # equal to what AttackRunner/tp paths build — interchangeable meshes
    assert mesh_lib.decide_mesh(2, 8, 8) == mesh_lib.tp_mesh(2, n_devices=8)
    assert mesh_lib.decide_mesh(1, 8, 8) == mesh_lib.data_mesh(8)


def test_decide_mesh_is_the_single_error_site():
    """The flag-named divisibility errors live in decide_mesh itself, so
    cli/run_attack.load_model_bundle and AttackRunner surface identical
    messages no matter which resolves the mesh first (ADVICE r3)."""
    with pytest.raises(ValueError, match=r"--tp 3 must divide the device count 8"):
        mesh_lib.decide_mesh(3, batch_size=8, n_devices=8)
    with pytest.raises(ValueError, match=r"batch_size 6 must divide over the data axis"):
        mesh_lib.decide_mesh(2, batch_size=6, n_devices=8)
    # tp consuming ALL devices leaves no data axis to divide over
    m = mesh_lib.decide_mesh(8, batch_size=7, n_devices=8)
    assert m.shape["model"] == 8 and m.shape["data"] == 1


# -- numerical parity ----------------------------------------------------------


def test_tp_train_step_matches_single(setup):
    """dp×tp (4 data × 2 model) train step == the single-device step:
    same loss, same updated perturbation. XLA partitions the encoder
    matmuls over ``model`` and all-reduces each residual branch; the
    result must be bit-comparable to the replicated program."""
    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig(norm_type="linf", optimizer_type="pgd", lr=1e-3)
    tables = psycho.build_tables(cfg)
    cparams = ConstraintParams.create(linf_size=0.05)

    single = attack_step.make_train_step(cfg, apply_fn, tables)
    mesh = mesh_lib.tp_mesh(2, n_devices=8)
    tp.check_model_axis(mcfg, 2)
    psh = tp.param_shardings(params, mesh)
    sharded = attack_step.make_sharded_step(
        cfg, apply_fn, tables, mesh, params_sharding=psh
    )
    tp_params = tp.shard_params(params, mesh)

    p0 = jnp.zeros((1, T), jnp.float32)
    lr = jnp.float32(cfg.lr)
    w = jnp.ones((B,), jnp.float32)
    p_a, _, m_a = single(
        params, p0, optimizers.init_opt_state(cfg, p0),
        audio, labels, pads, w, cparams, lr,
    )
    p_b, _, m_b = sharded(
        tp_params, jnp.zeros((1, T), jnp.float32),
        optimizers.init_opt_state(cfg, p0),
        audio, labels, pads, w, cparams, lr,
    )
    np.testing.assert_allclose(float(m_a.ctc_loss), float(m_b.ctc_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), atol=1e-7)


def test_tp_eval_step_matches_single(setup):
    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig(norm_type="linf")
    single = attack_step.make_eval_step(cfg, apply_fn)
    mesh = mesh_lib.tp_mesh(2, n_devices=8)
    psh = tp.param_shardings(params, mesh)
    sharded = attack_step.make_sharded_eval_step(
        cfg, apply_fn, mesh, params_sharding=psh
    )
    tp_params = tp.shard_params(params, mesh)
    w = jnp.ones((B,), jnp.float32)
    p = jnp.full((1, T), 0.01, jnp.float32)
    m_a = single(params, p, audio, labels, pads, w)
    m_b = sharded(tp_params, p, audio, labels, pads, w)
    np.testing.assert_allclose(float(m_a.ctc_loss), float(m_b.ctc_loss), rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(m_a.greedy_ids), np.asarray(m_b.greedy_ids)
    )


def test_runner_builds_tp_mesh_and_trains():
    """AttackRunner with cfg.tp=2 builds the (data=4, model=2) mesh,
    places the params sliced, and a real train epoch + eval run finite —
    the CLI path behind ``--tp`` end to end."""
    from paa_tpu.data import datasets, pipeline as pipeline_lib
    from paa_tpu.train import loop

    mcfg = wav2vec2.get_config("wav2vec2-tiny")
    params = wav2vec2.init_params(mcfg, example_len=4000)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, audio: model.apply({"params": prm}, audio)
    samples = datasets.load_dataset_tuples("synthetic", synthetic_samples=48)
    pipe = pipeline_lib.build_pipeline(samples, seed=5)

    cfg = AttackConfig(
        norm_type="linf", optimizer_type="pgd", lr=5e-3, batch_size=8,
        num_epochs=1, seed=5, model_name="wav2vec2-tiny", tp=2,
    )
    runner = loop.AttackRunner(
        cfg, apply_fn, params, pipe,
        cparams=ConstraintParams.create(linf_size=0.02),
    )
    assert dict(runner.mesh.shape) == {"data": 4, "model": 2}
    p = runner.init_perturbation(seed=5)
    opt = optimizers.init_opt_state(cfg, p)
    p, opt, scores, _ = runner.train_epoch(p, opt, 0, np.random.default_rng(0))
    assert np.isfinite(scores.ctc)
    ev = runner.evaluate(pipe.eval, p, perturbed=True)
    assert np.isfinite(ev.ctc)


def test_runner_tp_rejects_bad_sizes():
    from paa_tpu.data import datasets, pipeline as pipeline_lib
    from paa_tpu.train import loop

    mcfg = wav2vec2.get_config("wav2vec2-tiny")
    params = wav2vec2.init_params(mcfg, example_len=4000)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, audio: model.apply({"params": prm}, audio)
    samples = datasets.load_dataset_tuples("synthetic", synthetic_samples=48)
    pipe = pipeline_lib.build_pipeline(samples, seed=5)
    cfg = AttackConfig(
        norm_type="linf", optimizer_type="pgd", batch_size=8,
        model_name="wav2vec2-tiny", tp=3,
    )
    with pytest.raises(ValueError, match="divide"):
        loop.AttackRunner(
            cfg, apply_fn, params, pipe,
            cparams=ConstraintParams.create(linf_size=0.02),
        )


# -- manual attention partitioning (shard_map over the Pallas kernel) ----------


def _apply_fn_for(mcfg):
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    return lambda prm, audio: model.apply({"params": prm}, audio)


@pytest.mark.parametrize("mesh_kind", ["tp", "dp"])
def test_fused_attention_manual_shard_matches_xla(setup, mesh_kind):
    """The fused Pallas attention inside the jax.shard_map manual region
    (models/wav2vec2.py ``_manual_shard``) over a (data, model) / (data,)
    mesh matches the dense XLA path — logits AND the gradient w.r.t. the
    waveform (the attack's only gradient). A pallas_call has no GSPMD
    partitioning rule; this pins that each device's kernel runs on its
    local (rows, heads) shard and composes with tp's head-sharded q/k/v."""
    mcfg, params, _, audio, *_ = setup
    mesh = (
        mesh_lib.tp_mesh(2, n_devices=8)
        if mesh_kind == "tp"
        else mesh_lib.data_mesh(8)
    )
    fused_cfg = wav2vec2.get_config(
        "wav2vec2-tiny", attention_impl="fused", attn_interpret=True,
        attn_mesh=mesh,
    )
    xla_fn = _apply_fn_for(mcfg)
    fused_fn = _apply_fn_for(fused_cfg)
    prm = tp.shard_params(params, mesh) if mesh_kind == "tp" else params

    p0 = jnp.zeros((1, T), jnp.float32)
    loss = lambda fn, prm_: lambda p: jnp.sum(jnp.abs(fn(prm_, audio + p)))
    ref_v, ref_g = jax.value_and_grad(loss(xla_fn, params))(p0)
    got_v, got_g = jax.jit(jax.value_and_grad(loss(fused_fn, prm)))(p0)
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got_g), np.asarray(ref_g),
        rtol=1e-4, atol=1e-6 * float(jnp.abs(ref_g).max()),
    )


def test_fused_attention_manual_shard_under_remat(setup):
    """The manual attention region composes with encoder remat (the
    production memory config): same loss/grad as the un-remat'd xla path."""
    mcfg, params, _, audio, *_ = setup
    mesh = mesh_lib.tp_mesh(2, n_devices=8)
    fused_cfg = wav2vec2.get_config(
        "wav2vec2-tiny", attention_impl="fused", attn_interpret=True,
        attn_mesh=mesh, remat=True, remat_policy="save_cheap",
    )
    prm = tp.shard_params(params, mesh)
    p0 = jnp.zeros((1, T), jnp.float32)
    loss = lambda fn, prm_: lambda p: jnp.sum(jnp.abs(fn(prm_, audio + p)))
    ref_v, ref_g = jax.value_and_grad(loss(_apply_fn_for(mcfg), params))(p0)
    got_v, got_g = jax.jit(
        jax.value_and_grad(loss(_apply_fn_for(fused_cfg), prm))
    )(p0)
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got_g), np.asarray(ref_g),
        rtol=1e-4, atol=1e-6 * float(jnp.abs(ref_g).max()),
    )


def test_tp_fused_train_step_matches_single(setup):
    """Full dp×tp train step with the manually-sharded fused attention ==
    the single-device xla-attention step: same loss, same updated p —
    the end-to-end contract behind ``--tp`` with default (auto) kernels."""
    mcfg, params, _, audio, labels, pads = setup
    cfg = AttackConfig(norm_type="linf", optimizer_type="pgd", lr=1e-3)
    tables = psycho.build_tables(cfg)
    cparams = ConstraintParams.create(linf_size=0.05)
    mesh = mesh_lib.tp_mesh(2, n_devices=8)
    fused_cfg = wav2vec2.get_config(
        "wav2vec2-tiny", attention_impl="fused", attn_interpret=True,
        attn_mesh=mesh,
    )
    single = attack_step.make_train_step(cfg, _apply_fn_for(mcfg), tables)
    sharded = attack_step.make_sharded_step(
        cfg, _apply_fn_for(fused_cfg), tables, mesh,
        params_sharding=tp.param_shardings(params, mesh),
    )
    p0 = jnp.zeros((1, T), jnp.float32)
    lr = jnp.float32(cfg.lr)
    w = jnp.ones((B,), jnp.float32)
    p_a, _, m_a = single(
        params, p0, optimizers.init_opt_state(cfg, p0),
        audio, labels, pads, w, cparams, lr,
    )
    p_b, _, m_b = sharded(
        tp.shard_params(params, mesh), jnp.zeros((1, T), jnp.float32),
        optimizers.init_opt_state(cfg, p0),
        audio, labels, pads, w, cparams, lr,
    )
    np.testing.assert_allclose(float(m_a.ctc_loss), float(m_b.ctc_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), atol=1e-6)


def test_manual_shard_identity_without_mesh_axes():
    """_manual_shard is the identity when no non-trivial data/model axis
    exists (single device, or a trivial mesh) — the single-chip fast path
    bench.py measures is untouched — and an axis the traced shape does
    not divide over is dropped instead of failing at shard_map's strict
    divisibility check (e.g. --accum_steps microbatches smaller than the
    data axis)."""
    fn = lambda q, k, v: q + k + v
    assert wav2vec2._manual_shard(fn, None, 8, 4) is fn
    one = mesh_lib.data_mesh(1)
    assert wav2vec2._manual_shard(fn, one, 8, 4) is fn
    # batch 6 doesn't divide the 8-way data axis -> identity (no model axis)
    assert wav2vec2._manual_shard(fn, mesh_lib.data_mesh(8), 6, 4) is fn
    # batch indivisible but heads divide the model axis -> still wrapped
    tpm = mesh_lib.tp_mesh(2, n_devices=8)
    assert wav2vec2._manual_shard(fn, tpm, 6, 4) is not fn
    # heads indivisible too -> identity
    assert wav2vec2._manual_shard(fn, tpm, 6, 3) is fn


def test_fused_manual_shard_accum_microbatch_smaller_than_data_axis(setup):
    """Regression: with --accum_steps the step's lax.scan feeds the model
    microbatches of B/A rows; when that is smaller than the data axis the
    manual region must drop the data axis (running the kernel replicated
    along it, the pre-manual-region semantics) rather than fail
    shard_map's divisibility check at trace time."""
    mcfg, params, _, audio, labels, pads = setup
    mesh = mesh_lib.tp_mesh(2, n_devices=8)  # data axis 4
    fused_cfg = wav2vec2.get_config(
        "wav2vec2-tiny", attention_impl="fused", attn_interpret=True,
        attn_mesh=mesh,
    )
    # B=8, accum=4 -> microbatch 2, indivisible by the 4-way data axis
    cfg = AttackConfig(
        norm_type="linf", optimizer_type="pgd", lr=1e-3, accum_steps=4
    )
    tables = psycho.build_tables(cfg)
    cparams = ConstraintParams.create(linf_size=0.05)
    single = attack_step.make_train_step(cfg, _apply_fn_for(mcfg), tables)
    sharded = attack_step.make_sharded_step(
        cfg, _apply_fn_for(fused_cfg), tables, mesh,
        params_sharding=tp.param_shardings(params, mesh),
    )
    p0 = jnp.zeros((1, T), jnp.float32)
    lr = jnp.float32(cfg.lr)
    w = jnp.ones((B,), jnp.float32)
    p_a, _, m_a = single(
        params, p0, optimizers.init_opt_state(cfg, p0),
        audio, labels, pads, w, cparams, lr,
    )
    p_b, _, m_b = sharded(
        tp.shard_params(params, mesh), jnp.zeros((1, T), jnp.float32),
        optimizers.init_opt_state(cfg, p0),
        audio, labels, pads, w, cparams, lr,
    )
    np.testing.assert_allclose(float(m_a.ctc_loss), float(m_b.ctc_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), atol=1e-6)


def test_tp_params_actually_sharded(setup):
    """The placed params really live sliced: a column-parallel kernel's
    addressable shard on one device holds 1/n_model of the output dim."""
    _, params, *_ = setup
    mesh = mesh_lib.tp_mesh(2, n_devices=8)
    tp_params = tp.shard_params(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(tp_params)[0]
    found = False
    for path, leaf in flat:
        names = tuple(str(getattr(k, "key", k)) for k in path)
        if len(names) >= 2 and names[-2] == "q_proj" and names[-1] == "kernel":
            shard = leaf.addressable_shards[0]
            assert shard.data.shape[-1] * 2 == leaf.shape[-1], names
            found = True
    assert found
