"""Attack-step tests: loss movement, optimizer parity, sharding.

Integration strategy per SURVEY.md §4: tiny random-init CTC model +
synthetic audio; assert the untargeted attack *increases* CTC loss over
steps, the targeted attack *decreases* it, PGD matches its closed-form
update, and the sharded/sweep variants agree with the single-device step
on the 8-device virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paa_tpu.attack import optimizers, step as attack_step
from paa_tpu.config import AttackConfig, ConstraintParams
from paa_tpu.models import wav2vec2
from paa_tpu.ops import psycho, text
from paa_tpu.parallel import mesh as mesh_lib

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


def _run_steps(cfg, setup, n_steps=8, lr=None):
    mcfg, params, apply_fn, audio, labels, pads = setup
    tables = psycho.build_tables(cfg)
    cparams = ConstraintParams.create(linf_size=0.05, l2_size=2.0, snr_db=10.0)
    train = attack_step.make_train_step(cfg, apply_fn, tables)

    p = jnp.zeros((1, T), jnp.float32)
    opt_state = optimizers.init_opt_state(cfg, p)
    lr = jnp.float32(lr if lr is not None else cfg.lr)
    w = jnp.ones((B,), jnp.float32)
    losses = []
    for _ in range(n_steps):
        p, opt_state, m = train(params, p, opt_state, audio, labels, pads, w, cparams, lr)
        losses.append(float(m.ctc_loss))
    return p, losses


def test_untargeted_pgd_increases_loss(setup):
    cfg = AttackConfig(
        norm_type="linf", optimizer_type="pgd", attack_mode="untargeted", lr=5e-3
    )
    p, losses = _run_steps(cfg, setup)
    assert losses[-1] > losses[0], losses
    assert float(jnp.max(jnp.abs(p))) <= 0.05 + 1e-6  # projected


def test_targeted_pgd_decreases_loss(setup):
    cfg = AttackConfig(
        norm_type="linf",
        optimizer_type="pgd",
        attack_mode="targeted",
        lr=5e-3,
        target="delete",
        target_reps=2,
    )
    mcfg, params, apply_fn, audio, _, _ = setup
    # targeted labels: repeated phrase (reference: loss_helpers.py:13-15)
    t_labels, t_pads = text.encode_batch(
        text.clean_transcripts(text.targeted_texts(cfg.target, cfg.target_reps, B))
    )
    tables = psycho.build_tables(cfg)
    cparams = ConstraintParams.create(linf_size=0.05)
    train = attack_step.make_train_step(cfg, apply_fn, tables)
    p = jnp.zeros((1, T), jnp.float32)
    opt_state = optimizers.init_opt_state(cfg, p)
    losses = []
    w = jnp.ones((B,), jnp.float32)
    for _ in range(8):
        p, opt_state, m = train(
            params, p, opt_state, audio, jnp.asarray(t_labels), jnp.asarray(t_pads), w, cparams, jnp.float32(cfg.lr)
        )
        losses.append(float(m.ctc_loss))
    assert losses[-1] < losses[0], losses


def test_adam_runs_and_projects(setup):
    cfg = AttackConfig(norm_type="l2", optimizer_type="adam", lr=1e-2)
    p, losses = _run_steps(cfg, setup, n_steps=5)
    assert float(jnp.linalg.norm(p)) <= 2.0 * (1 + 1e-5)
    assert np.isfinite(losses).all()


def test_pgd_update_closed_form(setup):
    """One PGD step == p + lr·sign(grad) followed by projection."""
    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig(norm_type="linf", optimizer_type="pgd", lr=1e-3)
    tables = psycho.build_tables(cfg)
    cparams = ConstraintParams.create(linf_size=1.0)  # wide: projection no-op
    train = attack_step.make_train_step(cfg, apply_fn, tables)

    p0 = jnp.zeros((1, T), jnp.float32)
    w = jnp.ones((B,), jnp.float32)
    # compute the closed form first: the train step donates its p buffer
    grad = jax.grad(
        lambda p: attack_step._loss_fn(p, audio, labels, pads, w, apply_fn, params, cfg)[0]
    )(p0)
    expected = p0 + cfg.lr * jnp.sign(grad)

    opt_state = optimizers.init_opt_state(cfg, p0)
    p1, _, _ = train(params, p0, opt_state, audio, labels, pads, w, cparams, jnp.float32(cfg.lr))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(expected), atol=1e-7)


def test_eval_step_no_clamp(setup):
    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig()
    ev = attack_step.make_eval_step(cfg, apply_fn)
    w = jnp.ones((B,), jnp.float32)
    big_p = jnp.full((1, T), 3.0, jnp.float32)  # beyond [-1, 1]
    m = ev(params, big_p, audio, labels, pads, w)
    assert np.isfinite(float(m.ctc_loss))
    zero = ev(params, jnp.zeros((1, T), jnp.float32), audio, labels, pads, w)
    assert float(zero.ctc_loss) != float(m.ctc_loss)


def test_accum_steps_matches_monolithic(setup):
    """Microbatched grad accumulation == the monolithic step (the 'sum'
    CTC reduction is linear in the batch), including greedy ids order."""
    mcfg, params, apply_fn, audio, labels, pads = setup
    base = AttackConfig(norm_type="linf", optimizer_type="pgd", lr=1e-3)
    tables = psycho.build_tables(base)
    cparams = ConstraintParams.create(linf_size=0.05)
    w = jnp.ones((B,), jnp.float32)
    lr = jnp.float32(base.lr)

    results = {}
    for accum in (1, 4):
        cfg = base.replace(accum_steps=accum)
        train = attack_step.make_train_step(cfg, apply_fn, tables)
        p = jnp.zeros((1, T), jnp.float32)
        opt = optimizers.init_opt_state(cfg, p)
        p, opt, m = train(params, p, opt, audio, labels, pads, w, cparams, lr)
        results[accum] = (np.asarray(p), float(m.ctc_loss), np.asarray(m.greedy_ids))

    np.testing.assert_allclose(results[1][0], results[4][0], atol=1e-7)
    np.testing.assert_allclose(results[1][1], results[4][1], rtol=1e-5)
    np.testing.assert_array_equal(results[1][2], results[4][2])


def test_remat_feature_extractor_matches(setup):
    """FE remat changes memory, not values: identical loss and grad."""
    mcfg, params, apply_fn, audio, labels, pads = setup
    w = jnp.ones((B,), jnp.float32)
    cfg = AttackConfig(norm_type="linf", optimizer_type="pgd")
    outs = []
    for remat_fe in (False, True):
        m2 = wav2vec2.Wav2Vec2ForCTC(
            wav2vec2.get_config("wav2vec2-tiny", remat_feature_extractor=remat_fe)
        )
        fn = lambda prm, a: m2.apply({"params": prm}, a)
        loss, grad = jax.jit(
            jax.value_and_grad(
                lambda p: attack_step._loss_fn(
                    p, audio, labels, pads, w, fn, params, cfg
                )[0]
            )
        )(jnp.zeros((1, T), jnp.float32))
        outs.append((float(loss), np.asarray(grad)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-4, atol=1e-5)


# -- sharded variants ---------------------------------------------------------


def test_sharded_step_matches_single(setup):
    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig(norm_type="linf", optimizer_type="pgd", lr=1e-3)
    tables = psycho.build_tables(cfg)
    cparams = ConstraintParams.create(linf_size=0.05)

    single = attack_step.make_train_step(cfg, apply_fn, tables)
    mesh = mesh_lib.data_mesh(8)
    sharded = attack_step.make_sharded_step(cfg, apply_fn, tables, mesh)

    p0 = jnp.zeros((1, T), jnp.float32)
    s0 = optimizers.init_opt_state(cfg, p0)
    lr = jnp.float32(cfg.lr)
    w = jnp.ones((B,), jnp.float32)
    p_a, _, m_a = single(params, p0, s0, audio, labels, pads, w, cparams, lr)
    p_b, _, m_b = sharded(
        params, jnp.zeros((1, T), jnp.float32), optimizers.init_opt_state(cfg, p0),
        audio, labels, pads, w, cparams, lr,
    )
    np.testing.assert_allclose(float(m_a.ctc_loss), float(m_b.ctc_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), atol=1e-7)


def test_sharded_eval_matches_single(setup):
    """Eval sharded over the 8-device mesh == the single-device eval step
    (same unclamped-add semantics, batch split along 'data')."""
    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig(norm_type="linf")
    single = attack_step.make_eval_step(cfg, apply_fn)
    sharded = attack_step.make_sharded_eval_step(cfg, apply_fn, mesh_lib.data_mesh(8))
    w = jnp.ones((B,), jnp.float32)
    p = jnp.full((1, T), 0.01, jnp.float32)
    m_a = single(params, p, audio, labels, pads, w)
    m_b = sharded(params, p, audio, labels, pads, w)
    np.testing.assert_allclose(float(m_a.ctc_loss), float(m_b.ctc_loss), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_a.greedy_ids), np.asarray(m_b.greedy_ids))


def test_sharded_step_with_accum_matches(setup):
    """Data-parallel mesh × microbatch accumulation — the reshape to
    (A, B/A, ...) must stay consistent with the batch sharding."""
    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig(norm_type="linf", optimizer_type="pgd", lr=1e-3, accum_steps=2)
    tables = psycho.build_tables(cfg)
    cparams = ConstraintParams.create(linf_size=0.05)
    single = attack_step.make_train_step(cfg.replace(accum_steps=1), apply_fn, tables)
    sharded = attack_step.make_sharded_step(cfg, apply_fn, tables, mesh_lib.data_mesh(4))
    p0 = jnp.zeros((1, T), jnp.float32)
    lr = jnp.float32(cfg.lr)
    w = jnp.ones((B,), jnp.float32)
    p_a, _, m_a = single(
        params, p0, optimizers.init_opt_state(cfg, p0), audio, labels, pads, w, cparams, lr
    )
    p_b, _, m_b = sharded(
        params, jnp.zeros((1, T), jnp.float32),
        optimizers.init_opt_state(cfg, p0), audio, labels, pads, w, cparams, lr,
    )
    np.testing.assert_allclose(float(m_a.ctc_loss), float(m_b.ctc_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), atol=1e-7)


def test_sweep_step_matches_per_epsilon(setup):
    """3-cell linf epsilon sweep on a (sweep=4, data=2) mesh... sweep=4
    needs 4 cells; use 4 epsilons."""
    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig(norm_type="linf", optimizer_type="pgd", lr=5e-3)
    tables = psycho.build_tables(cfg)
    epsilons = np.asarray([1e-3, 5e-3, 2e-2, 1e-1], dtype=np.float32)
    S = len(epsilons)

    base = ConstraintParams.create()
    cparams_s = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,)), base)
    cparams_s = cparams_s._replace(linf_size=jnp.asarray(epsilons))

    mesh = mesh_lib.sweep_mesh(n_sweep=4, n_devices=8)
    sweep = attack_step.make_sweep_step(cfg, apply_fn, tables, mesh)

    p_s = jnp.zeros((S, 1, T), jnp.float32)
    opt_s = jax.vmap(lambda p: optimizers.init_opt_state(cfg, p))(p_s)
    lr = jnp.float32(cfg.lr)
    w = jnp.ones((B,), jnp.float32)
    active = jnp.ones((S,), jnp.float32)
    p_s, opt_s, m = sweep(params, p_s, opt_s, audio, labels, pads, w, cparams_s, active, lr)
    assert m.ctc_loss.shape == (S,)
    # all cells see the same batch => identical pre-projection update;
    # per-cell projection enforces each epsilon
    for i, eps in enumerate(epsilons):
        assert float(jnp.max(jnp.abs(p_s[i]))) <= eps + 1e-7

    # cell results equal the single-device step with that epsilon
    single = attack_step.make_train_step(cfg, apply_fn, tables)
    p1, _, m1 = single(
        params, jnp.zeros((1, T), jnp.float32),
        optimizers.init_opt_state(cfg, jnp.zeros((1, T), jnp.float32)),
        audio, labels, pads, w, base._replace(linf_size=jnp.float32(epsilons[2])), lr,
    )
    np.testing.assert_allclose(np.asarray(p_s[2]), np.asarray(p1), atol=1e-7)
    np.testing.assert_allclose(float(m.ctc_loss[2]), float(m1.ctc_loss), rtol=1e-5)


def test_sweep_step_active_mask_freezes_cells(setup):
    """Early-stopped cells (active=0) keep p and opt state bit-frozen
    while live cells train."""
    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig(norm_type="linf", optimizer_type="adam", lr=5e-3)
    tables = psycho.build_tables(cfg)
    S = 2
    base = ConstraintParams.create(linf_size=0.05)
    cparams_s = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,)), base)
    mesh = mesh_lib.sweep_mesh(n_sweep=2, n_devices=8)
    sweep = attack_step.make_sweep_step(cfg, apply_fn, tables, mesh)
    rng = np.random.default_rng(1)
    p0 = jnp.asarray(rng.standard_normal((S, 1, T)).astype(np.float32) * 1e-3)
    opt_s = jax.vmap(lambda p: optimizers.init_opt_state(cfg, p))(p0)
    w = jnp.ones((B,), jnp.float32)
    active = jnp.asarray([1.0, 0.0], jnp.float32)
    p_s, opt_s, _ = sweep(
        params, p0, opt_s, audio, labels, pads, w, cparams_s, active, jnp.float32(cfg.lr)
    )
    assert float(jnp.max(jnp.abs(p_s[0] - p0[0]))) > 0  # live cell moved
    np.testing.assert_array_equal(np.asarray(p_s[1]), np.asarray(p0[1]))  # frozen


def test_sweep_step_one_cell_per_chip_s8(setup):
    """S=8 cells × 8 devices on a (sweep=8, data=1) mesh — the layout a
    real v5e-8 slice would run (one cell per chip, the direct analogue
    of the reference's one-SLURM-job-per-GPU, submit_scan_range.py:54).
    Per-cell numerics must equal the single-device step at that cell's
    epsilon: each chip's program IS the single-cell program, so the
    vmapped form costs nothing extra per chip (docs/PERF.md crossover
    argument)."""
    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig(norm_type="fletcher_munson", optimizer_type="pgd", lr=5e-3)
    tables = psycho.build_tables(cfg)
    epsilons = np.asarray(
        [0.5, 1.0, 2.0, 4.0, 8.9, 16.0, 32.0, 64.0], dtype=np.float32
    )
    S = len(epsilons)

    base = ConstraintParams.create()
    cparams_s = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,)), base)
    cparams_s = cparams_s._replace(fm_epsilon=jnp.asarray(epsilons))

    mesh = mesh_lib.sweep_mesh(n_sweep=8, n_devices=8)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"sweep": 8, "data": 1}
    sweep = attack_step.make_sweep_step(cfg, apply_fn, tables, mesh)

    rng = np.random.default_rng(7)
    p0 = jnp.asarray(
        np.tile(rng.standard_normal((1, 1, T)).astype(np.float32) * 1e-3, (S, 1, 1))
    )
    opt_s = jax.vmap(lambda p: optimizers.init_opt_state(cfg, p))(p0)
    lr = jnp.float32(cfg.lr)
    w = jnp.ones((B,), jnp.float32)
    active = jnp.ones((S,), jnp.float32)
    p_s, opt_s, m = sweep(
        params, p0, opt_s, audio, labels, pads, w, cparams_s, active, lr
    )
    assert m.ctc_loss.shape == (S,)

    single = attack_step.make_train_step(cfg, apply_fn, tables)
    for i in (0, 4, 7):  # smallest, reference fm=8.9, largest
        p1, _, m1 = single(
            params, p0[0], optimizers.init_opt_state(cfg, p0[0]),
            audio, labels, pads, w,
            base._replace(fm_epsilon=jnp.float32(epsilons[i])), lr,
        )
        np.testing.assert_allclose(
            np.asarray(p_s[i]), np.asarray(p1), atol=1e-6,
            err_msg=f"cell {i} (fm_epsilon={epsilons[i]})",
        )
        np.testing.assert_allclose(float(m.ctc_loss[i]), float(m1.ctc_loss), rtol=1e-5)


def test_sweep_step_max_phon_traced(setup):
    """max_phon sweeps through the generic traced-epsilon path: per-cell
    contours are enforced exactly at their own levels (no host-built
    per-cell tables)."""
    from paa_tpu.ops import dsp, iso226

    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig(norm_type="max_phon", optimizer_type="pgd", lr=5e-2)
    tables = psycho.build_tables(cfg)
    levels = np.asarray([15.0, 25.0, 35.0, 45.0], np.float32)  # reference grid values
    S = len(levels)
    base = ConstraintParams.create()
    cparams_s = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,)), base)
    cparams_s = cparams_s._replace(max_phon_level=jnp.asarray(levels))
    mesh = mesh_lib.sweep_mesh(n_sweep=4, n_devices=8)
    sweep = attack_step.make_sweep_step(cfg, apply_fn, tables, mesh)
    rng = np.random.default_rng(0)
    p_s = jnp.asarray(rng.standard_normal((S, 1, T)).astype(np.float32))
    opt_s = jax.vmap(lambda p: optimizers.init_opt_state(cfg, p))(p_s)
    w = jnp.ones((B,), jnp.float32)
    active = jnp.ones((S,), jnp.float32)
    p_s, _, m = sweep(
        params, p_s, opt_s, audio, labels, pads, w, cparams_s, active, jnp.float32(cfg.lr)
    )
    assert np.isfinite(np.asarray(m.ctc_loss)).all()
    bins = dsp.rfft_bin_freqs(cfg.n_fft, cfg.sr)
    for i, lvl in enumerate(levels):
        # contour used on device == exact host ISO-226 threshold at lvl
        exact = iso226.phon_threshold(bins, float(lvl))
        dev = np.asarray(psycho.phon_contour(tables, jnp.float32(lvl)))
        np.testing.assert_allclose(dev, exact, rtol=1e-6, atol=1e-5)
        # single-pass resynthesis leakage is bounded (same as single-run path)
        spec = dsp.stft(p_s[i], cfg.n_fft, cfg.hop_length, cfg.win_length)
        mag_db = 20.0 * np.log10(np.abs(np.asarray(spec)) + 1e-8)
        scaled = exact - exact.max() + cfg.phon_reference_db
        assert mag_db.max() <= scaled.max() + 6.0


def test_sweep_step_honors_accum_steps(setup):
    """Regression: sweep cells must microbatch too (review finding —
    accum_steps was silently dropped in sweep mode)."""
    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg1 = AttackConfig(norm_type="linf", optimizer_type="pgd", lr=5e-3, accum_steps=1)
    cfg2 = cfg1.replace(accum_steps=4)
    tables = psycho.build_tables(cfg1)
    mesh = mesh_lib.sweep_mesh(n_sweep=2, n_devices=8)
    epsilons = np.asarray([1e-3, 1e-2], np.float32)
    base = ConstraintParams.create()
    cparams_s = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,)), base)
    cparams_s = cparams_s._replace(linf_size=jnp.asarray(epsilons))
    w = jnp.ones((B,), jnp.float32)
    outs = []
    active = jnp.ones((2,), jnp.float32)
    for cfg in (cfg1, cfg2):
        sweep = attack_step.make_sweep_step(cfg, apply_fn, tables, mesh)
        p_s = jnp.zeros((2, 1, T), jnp.float32)
        opt_s = jax.vmap(lambda p: optimizers.init_opt_state(cfg, p))(p_s)
        p_s, _, m = sweep(
            params, p_s, opt_s, audio, labels, pads, w, cparams_s, active, jnp.float32(cfg.lr)
        )
        outs.append((np.asarray(p_s), np.asarray(m.ctc_loss)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-7)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5)


def test_multiplexed_sweep_matches_vmapped(setup):
    """On a mesh whose sweep axis is 1 the sweep step lowers to S
    host-dispatched single-cell steps (the single-chip schedule fix —
    monolithic sweep programs overflow HBM and host-offload,
    docs/PERF.md round 3); it must match the vmapped form on a
    cell-sharded mesh — same losses, ids, p, opt state — including
    under accumulation and with a frozen cell."""
    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig(
        norm_type="linf", optimizer_type="adam", lr=5e-3, accum_steps=2
    )
    tables = psycho.build_tables(cfg)
    S = 2
    epsilons = np.asarray([1e-3, 1e-2], np.float32)
    base = ConstraintParams.create()
    cparams_s = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,)), base)
    cparams_s = cparams_s._replace(linf_size=jnp.asarray(epsilons))
    rng = np.random.default_rng(3)
    p0 = jnp.asarray(rng.standard_normal((S, 1, T)).astype(np.float32) * 1e-3)
    w = jnp.ones((B,), jnp.float32)
    active = jnp.asarray([1.0, 0.0], jnp.float32)  # one frozen cell

    outs = []
    for n_sweep in (2, 1):  # vmapped vs folded
        mesh = mesh_lib.sweep_mesh(n_sweep=n_sweep, n_devices=8)
        sweep = attack_step.make_sweep_step(cfg, apply_fn, tables, mesh)
        opt_s = jax.vmap(lambda p: optimizers.init_opt_state(cfg, p))(p0)
        p_s, opt_s, m = sweep(
            params, jnp.array(p0), opt_s, audio, labels, pads, w,
            cparams_s, active, jnp.float32(cfg.lr),
        )
        outs.append((
            np.asarray(p_s), np.asarray(m.ctc_loss), np.asarray(m.greedy_ids),
            jax.tree.map(np.asarray, opt_s),
        ))
    (p_a, l_a, g_a, o_a), (p_b, l_b, g_b, o_b) = outs
    np.testing.assert_allclose(p_a, p_b, atol=1e-7)
    np.testing.assert_allclose(l_a, l_b, rtol=1e-5)
    np.testing.assert_array_equal(g_a, g_b)
    # Adam moments see grad-accumulation ROUNDING-order differences
    # (scatter-add chain vs in-vmap scan); ~1e-6 absolute on f32 moments
    for x, y in zip(jax.tree.leaves(o_a), jax.tree.leaves(o_b)):
        np.testing.assert_allclose(x, y, atol=5e-6, rtol=5e-3)


def test_step_lr_schedule():
    cfg = AttackConfig(lr=1e-4, gamma=0.9, step_size=2)
    assert optimizers.step_lr(cfg, 0) == pytest.approx(1e-4)
    assert optimizers.step_lr(cfg, 1) == pytest.approx(1e-4)
    assert optimizers.step_lr(cfg, 2) == pytest.approx(0.9e-4)
    assert optimizers.step_lr(cfg, 5) == pytest.approx(1e-4 * 0.9**2)


NORM_TEST_SIZES = dict(
    linf_size=0.05, l2_size=2.0, l1_size=20.0, snr_db=10.0, tv_epsilon=0.05,
    fm_epsilon=5.0, max_phon_level=40.0, min_freq=120.0, max_freq=2000.0,
)


@pytest.mark.parametrize("norm", [
    "linf", "l2", "l1", "snr", "tv",
    "min_max_freqs", "fletcher_munson", "max_phon",
])
def test_every_norm_through_the_fused_step(setup, norm):
    """The COMPOSED step (forward → grad → PGD → projection) runs for
    every norm in the zoo, moves p, stays finite, and leaves p (already
    projected inside the step) a fixed point of its own projection —
    approximately for the STFT-domain norms, whose single-pass iSTFT
    resynthesis leaks by design (reference formulation; see the
    faithful-behavior note in .claude/skills/verify/SKILL.md)."""
    from paa_tpu.ops import projections

    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig(norm_type=norm, optimizer_type="pgd", lr=5e-3)
    tables = psycho.build_tables(cfg)
    cparams = ConstraintParams.create(**NORM_TEST_SIZES)
    train = attack_step.make_train_step(cfg, apply_fn, tables)
    p = jnp.zeros((1, T), jnp.float32)
    opt = optimizers.init_opt_state(cfg, p)
    w = jnp.ones((B,), jnp.float32)
    for _ in range(3):
        p, opt, m = train(
            params, p, opt, audio, labels, pads, w, cparams, jnp.float32(cfg.lr)
        )
    assert np.isfinite(float(m.ctc_loss)), norm
    assert bool(jnp.all(jnp.isfinite(p))), norm
    assert float(jnp.max(jnp.abs(p))) > 0, f"{norm}: step never moved p"
    p2 = projections.perturbation_constraint(p, audio, cfg, cparams, tables)
    rel = float(jnp.linalg.norm(p2 - p) / (jnp.linalg.norm(p) + 1e-9))
    tol = 0.35 if norm in ("min_max_freqs", "fletcher_munson", "max_phon") else 1e-4
    assert rel < tol, (norm, rel)


def test_sweep_step_fm_adam_on_mesh_matches_single(setup):
    """The psychoacoustic (STFT-domain fletcher_munson) projection and
    Adam optimizer state cross the (sweep x data) mesh correctly: each
    cell of a 4-cell fm sweep equals the single-device Adam step run at
    that cell's epsilon (the pinned twin of __graft_entry__'s
    dryrun_multichip check)."""
    mcfg, params, apply_fn, audio, labels, pads = setup
    cfg = AttackConfig(norm_type="fletcher_munson", optimizer_type="adam", lr=1e-2)
    tables = psycho.build_tables(cfg)
    epsilons = np.asarray([0.5, 1.0, 2.0, 4.0], dtype=np.float32)
    S = len(epsilons)
    base = ConstraintParams.create()
    cparams_s = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,)), base)
    cparams_s = cparams_s._replace(fm_epsilon=jnp.asarray(epsilons))

    mesh = mesh_lib.sweep_mesh(n_sweep=4, n_devices=8)
    sweep = attack_step.make_sweep_step(cfg, apply_fn, tables, mesh)
    p_s = jnp.zeros((S, 1, T), jnp.float32)
    opt_s = jax.vmap(lambda p: optimizers.init_opt_state(cfg, p))(p_s)
    w = jnp.ones((B,), jnp.float32)
    active = jnp.ones((S,), jnp.float32)
    lr = jnp.float32(cfg.lr)
    for _ in range(2):  # two steps so Adam moments are non-trivial
        p_s, opt_s, m = sweep(
            params, p_s, opt_s, audio, labels, pads, w, cparams_s, active, lr
        )
    assert bool(jnp.all(jnp.isfinite(p_s)))

    single = attack_step.make_train_step(cfg, apply_fn, tables)
    p1 = jnp.zeros((1, T), jnp.float32)
    opt1 = optimizers.init_opt_state(cfg, p1)
    cp1 = base._replace(fm_epsilon=jnp.float32(epsilons[1]))
    for _ in range(2):
        p1, opt1, m1 = single(params, p1, opt1, audio, labels, pads, w, cp1, lr)
    np.testing.assert_allclose(np.asarray(p_s[1]), np.asarray(p1), atol=2e-6)
    np.testing.assert_allclose(float(m.ctc_loss[1]), float(m1.ctc_loss), rtol=1e-4)
