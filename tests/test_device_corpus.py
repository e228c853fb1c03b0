"""Device-resident corpus cache (data/pipeline.py:DeviceCorpus).

The cache stages a whole split to device HBM once and forms batches by
on-device gather, so steady-state training moves only a (B,) int32 row
vector per step instead of (B, T) audio — the TPU-native replacement for
the reference's per-batch DataLoader feed (reference: build.py:211-213).
These tests pin the gather feed to the host-collate feed bit-for-bit and
the tri-state resolution logic.
"""

import jax
import numpy as np
import pytest

from paa_tpu.attack import optimizers
from paa_tpu.config import AttackConfig, ConstraintParams
from paa_tpu.data import datasets, pipeline as pipeline_lib
from paa_tpu.models import wav2vec2
from paa_tpu.train import loop


@pytest.fixture(scope="module")
def split():
    samples = datasets.load_dataset_tuples("synthetic", synthetic_samples=36)
    pipe = pipeline_lib.build_pipeline(samples, seed=5)
    return pipe.train


def test_device_batches_match_host_collate(split):
    """Every field of every batch (incl. the padded final one) matches the
    host path; padding rows carry weight 0 so their gathered row-0 audio is
    masked out of the loss."""
    corpus = pipeline_lib.DeviceCorpus(split)
    B = 8
    host = list(split.batches(B))
    dev = list(corpus.batches(B))
    assert len(host) == len(dev) and len(split) % B != 0  # exercises padding
    for hb, db in zip(host, dev):
        # padding rows differ by design: host collate zeroes them, the
        # device gather reuses row 0 — both carry weight 0, which is what
        # the step's loss/metrics mask on. Compare valid rows only.
        v = pipeline_lib.host_mask(hb)
        np.testing.assert_array_equal(hb.audio[v], np.asarray(db.audio)[v])
        np.testing.assert_array_equal(hb.labels[v], np.asarray(db.labels)[v])
        np.testing.assert_array_equal(
            hb.label_paddings[v], np.asarray(db.label_paddings)[v]
        )
        np.testing.assert_array_equal(hb.weights, np.asarray(db.weights))
        np.testing.assert_array_equal(hb.indices, db.indices)
        # host-side mask never needs a device sync
        assert isinstance(db.host_weights, np.ndarray)
        np.testing.assert_array_equal(
            pipeline_lib.host_mask(db), pipeline_lib.host_mask(hb)
        )


def test_device_batches_shuffle_matches_host(split):
    """Same shuffle_rng seed -> same batch order in both feeds."""
    corpus = pipeline_lib.DeviceCorpus(split)
    host = list(split.batches(8, shuffle_rng=np.random.default_rng(3)))
    dev = list(corpus.batches(8, shuffle_rng=np.random.default_rng(3)))
    for hb, db in zip(host, dev):
        np.testing.assert_array_equal(hb.indices, db.indices)
        v = pipeline_lib.host_mask(hb)
        np.testing.assert_array_equal(hb.audio[v], np.asarray(db.audio)[v])


def test_maybe_device_corpus_tristate(split):
    # explicit off
    assert pipeline_lib.maybe_device_corpus(split, False) is None
    # auto: CPU backend -> host feed (cache only pays off on TPU)
    assert jax.default_backend() == "cpu"
    assert pipeline_lib.maybe_device_corpus(split, None) is None
    # explicit on wins regardless of backend
    corpus = pipeline_lib.maybe_device_corpus(split, True)
    assert isinstance(corpus, pipeline_lib.DeviceCorpus)


def test_batch_source_dispatch(split):
    corpus = pipeline_lib.DeviceCorpus(split)
    via_corpus = list(pipeline_lib.batch_source(split, 8, corpus))
    via_host = list(pipeline_lib.batch_source(split, 8, None))
    assert len(via_corpus) == len(via_host)
    for cb, hb in zip(via_corpus, via_host):
        v = pipeline_lib.host_mask(hb)
        np.testing.assert_array_equal(
            np.asarray(cb.audio)[v], np.asarray(hb.audio)[v]
        )


def test_host_mask_prefetch_no_device_weights(split):
    """prefetch_to_device keeps a host copy of the weights; host_mask must
    use it (reading the device array back per step costs a full tunnel
    round trip on remote TPUs)."""
    b = next(pipeline_lib.prefetch_to_device(split.batches(8)))
    assert isinstance(b.host_weights, np.ndarray)
    m = pipeline_lib.host_mask(b)
    assert m.dtype == np.bool_ and m.all()


def test_train_epoch_identical_with_and_without_cache():
    """One full epoch through AttackRunner with the cache forced on equals
    the host-feed epoch bit-for-bit (same p, same metrics)."""
    mcfg = wav2vec2.get_config("wav2vec2-tiny")
    params = wav2vec2.init_params(mcfg, example_len=4000)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, audio: model.apply({"params": prm}, audio)
    samples = datasets.load_dataset_tuples("synthetic", synthetic_samples=36)
    pipe = pipeline_lib.build_pipeline(samples, seed=5)

    results = []
    for cache in (False, True):
        cfg = AttackConfig(
            norm_type="linf", optimizer_type="pgd", lr=5e-3, batch_size=8,
            num_epochs=1, seed=5, model_name="wav2vec2-tiny",
            cache_data_on_device=cache,
        )
        runner = loop.AttackRunner(
            cfg, apply_fn, params, pipe,
            cparams=ConstraintParams.create(linf_size=0.02), use_mesh=False,
        )
        p = runner.init_perturbation(seed=5)
        opt = optimizers.init_opt_state(cfg, p)
        p, opt, scores, _ = runner.train_epoch(
            p, opt, 0, shuffle_rng=np.random.default_rng(7)
        )
        ev = runner.evaluate(pipe.eval, p, perturbed=True)
        results.append((np.asarray(p), scores.ctc, ev.ctc, ev.wer))

    (p0, tc0, ec0, ew0), (p1, tc1, ec1, ew1) = results
    np.testing.assert_array_equal(p0, p1)
    assert tc0 == tc1 and ec0 == ec1 and ew0 == ew1


# -- mesh-sharded staging ---------------------------------------------------


def test_sharded_corpus_matches_host_collate(split):
    """Corpus rows sharded over the mesh's data axis (with row padding to
    divide the axis); gathered batches equal the host feed on valid rows
    and come out sharded along the batch dimension."""
    from paa_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.data_mesh()
    assert len(split) % mesh.shape["data"] != 0  # exercises row padding
    corpus = pipeline_lib.DeviceCorpus(split, mesh=mesh)
    host = list(split.batches(8))
    dev = list(corpus.batches(8))
    assert len(host) == len(dev)
    for hb, db in zip(host, dev):
        v = pipeline_lib.host_mask(hb)
        np.testing.assert_array_equal(hb.audio[v], np.asarray(db.audio)[v])
        np.testing.assert_array_equal(hb.labels[v], np.asarray(db.labels)[v])
        np.testing.assert_array_equal(hb.weights, np.asarray(db.weights))
    # batches are device-sharded along batch dim over the data axis
    shard_shapes = {s.data.shape for s in dev[0].audio.addressable_shards}
    assert shard_shapes == {(1, split.audio_len)}


def test_sharded_train_epoch_identical_with_cache():
    """AttackRunner on the 8-device mesh: forced device cache reproduces
    the host-feed epoch (same p, same metrics) through the sharded step."""
    mcfg = wav2vec2.get_config("wav2vec2-tiny")
    params = wav2vec2.init_params(mcfg, example_len=4000)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, audio: model.apply({"params": prm}, audio)
    samples = datasets.load_dataset_tuples("synthetic", synthetic_samples=36)
    pipe = pipeline_lib.build_pipeline(samples, seed=5)

    results = []
    for cache in (False, True):
        cfg = AttackConfig(
            norm_type="l2", optimizer_type="adam", lr=5e-3, batch_size=8,
            num_epochs=1, seed=5, model_name="wav2vec2-tiny",
            cache_data_on_device=cache,
        )
        runner = loop.AttackRunner(
            cfg, apply_fn, params, pipe,
            cparams=ConstraintParams.create(l2_size=0.5), use_mesh=True,
        )
        assert runner.mesh is not None  # 8-device CPU mesh in tests
        p = runner.init_perturbation(seed=5)
        opt = optimizers.init_opt_state(cfg, p)
        p, opt, scores, _ = runner.train_epoch(
            p, opt, 0, shuffle_rng=np.random.default_rng(7)
        )
        ev = runner.evaluate(pipe.eval, p, perturbed=True)
        results.append((np.asarray(p), scores.ctc, ev.ctc, ev.wer))

    (p0, tc0, ec0, ew0), (p1, tc1, ec1, ew1) = results
    np.testing.assert_array_equal(p0, p1)
    assert tc0 == tc1 and ec0 == ec1 and ew0 == ew1




def test_auto_tier_picks_cached_past_budget(split, monkeypatch):
    """maybe_device_corpus auto: oversized split -> CachedCorpus holding
    everything the budget allows (x data-axis width), not the host feed
    and not the streaming feed (link-bound on the tunneled chip —
    docs/PERF.md round 4)."""
    from paa_tpu.parallel import mesh as mesh_lib

    monkeypatch.setattr(pipeline_lib.jax, "default_backend", lambda: "tpu")
    mesh = mesh_lib.data_mesh()
    n_data = mesh.shape["data"]
    # pretend the budget only fits part of the split
    row_bytes = split.audio_len * 4 + split.labels.itemsize * split.labels.shape[1] \
        + 4 * split.labels.shape[1]
    budget = (len(split) // 2) * row_bytes // n_data
    monkeypatch.setattr(pipeline_lib, "_DEVICE_CACHE_AUTO_LIMIT", budget)
    c = pipeline_lib.maybe_device_corpus(split, None, mesh=mesh)
    assert isinstance(c, pipeline_lib.CachedCorpus)
    assert 0 < c.n_cached < len(split)
    assert c.n_cached % n_data == 0  # rows shard evenly
    # under the budget -> full resident corpus
    monkeypatch.setattr(
        pipeline_lib, "_DEVICE_CACHE_AUTO_LIMIT", 64 << 30
    )
    c2 = pipeline_lib.maybe_device_corpus(split, None, mesh=mesh)
    assert isinstance(c2, pipeline_lib.DeviceCorpus)


# -- hybrid row-cache feed (data/pipeline.py:CachedCorpus) ----------------


def _half_cache_bytes(split, frac=0.5):
    row_bytes = (split.audio_len * 4
                 + split.labels.itemsize * split.labels.shape[1]
                 + 4 * split.labels.shape[1])
    return int(len(split) * frac) * row_bytes


def test_cached_batches_match_host_collate(split):
    """With only half the rows resident, every batch still equals the host
    feed on valid rows (misses host-filled, hits gathered on device) —
    the same contract the auto tier relies on to swap feeds silently."""
    cc = pipeline_lib.CachedCorpus(split, cache_bytes=_half_cache_bytes(split))
    assert 0 < cc.n_cached < len(split)
    B = 8
    host = list(split.batches(B))
    dev = list(cc.batches(B))
    assert len(host) == len(dev) and len(split) % B != 0  # padded final batch
    for hb, db in zip(host, dev):
        v = pipeline_lib.host_mask(hb)
        np.testing.assert_array_equal(hb.audio[v], np.asarray(db.audio)[v])
        np.testing.assert_array_equal(hb.labels[v], np.asarray(db.labels)[v])
        np.testing.assert_array_equal(
            hb.label_paddings[v], np.asarray(db.label_paddings)[v]
        )
        np.testing.assert_array_equal(hb.weights, np.asarray(db.weights))
        np.testing.assert_array_equal(hb.indices, db.indices)
        assert isinstance(db.host_weights, np.ndarray)


def test_cached_shuffle_matches_host(split):
    """Shuffled epochs mix hits and misses within single batches; same
    shuffle_rng seed -> identical batches."""
    cc = pipeline_lib.CachedCorpus(split, cache_bytes=_half_cache_bytes(split))
    host = list(split.batches(8, shuffle_rng=np.random.default_rng(3)))
    dev = list(cc.batches(8, shuffle_rng=np.random.default_rng(3)))
    for hb, db in zip(host, dev):
        np.testing.assert_array_equal(hb.indices, db.indices)
        v = pipeline_lib.host_mask(hb)
        np.testing.assert_array_equal(hb.audio[v], np.asarray(db.audio)[v])
        np.testing.assert_array_equal(hb.labels[v], np.asarray(db.labels)[v])


def test_cached_fully_resident_moves_no_miss_rows(split):
    """cache_bytes covering the whole split -> every batch is all-hit and
    the single zero miss buffer is staged once and reused (CachedCorpus
    degenerates to DeviceCorpus)."""
    cc = pipeline_lib.CachedCorpus(split, cache_bytes=64 << 30)
    assert cc.n_cached == len(split)
    staged = []
    orig = cc._put_miss
    cc._put_miss = lambda x: staged.append(1) or orig(x)
    batches = list(cc.batches(8))
    assert len(staged) == 1  # the shared zero buffer, once
    host = list(split.batches(8))
    for hb, db in zip(host, batches):
        v = pipeline_lib.host_mask(hb)
        np.testing.assert_array_equal(hb.audio[v], np.asarray(db.audio)[v])


def test_cached_tiny_cache_all_miss(split):
    """cache_bytes below one row still works: one resident row, everything
    else host-filled — the graceful-degradation end of the design."""
    cc = pipeline_lib.CachedCorpus(split, cache_bytes=1)
    assert cc.n_cached == 1
    host = list(split.batches(8))
    dev = list(cc.batches(8))
    for hb, db in zip(host, dev):
        v = pipeline_lib.host_mask(hb)
        np.testing.assert_array_equal(hb.audio[v], np.asarray(db.audio)[v])


def test_cached_sharded_batches(split):
    """Mesh variant: cache rows shard over the data axis, batches come out
    batch-sharded, equal to the host feed on valid rows."""
    from paa_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.data_mesh()
    cc = pipeline_lib.CachedCorpus(
        split, cache_bytes=_half_cache_bytes(split), mesh=mesh
    )
    assert cc.n_cached % mesh.shape["data"] == 0
    host = list(split.batches(8))
    dev = list(cc.batches(8))
    assert len(host) == len(dev)
    for hb, db in zip(host, dev):
        v = pipeline_lib.host_mask(hb)
        np.testing.assert_array_equal(hb.audio[v], np.asarray(db.audio)[v])
        np.testing.assert_array_equal(hb.weights, np.asarray(db.weights))
    shard_shapes = {s.data.shape for s in dev[0].audio.addressable_shards}
    assert shard_shapes == {(1, split.audio_len)}


def test_cached_train_epoch_identical(split):
    """A full AttackRunner epoch fed by a half-resident CachedCorpus equals
    the host-feed epoch bit-for-bit (same p, same metrics)."""
    mcfg = wav2vec2.get_config("wav2vec2-tiny")
    params = wav2vec2.init_params(mcfg, example_len=4000)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, audio: model.apply({"params": prm}, audio)
    samples = datasets.load_dataset_tuples("synthetic", synthetic_samples=36)
    pipe = pipeline_lib.build_pipeline(samples, seed=5)

    results = []
    for cached in (False, True):
        cfg = AttackConfig(
            norm_type="l2", optimizer_type="adam", lr=5e-3, batch_size=8,
            num_epochs=1, seed=5, model_name="wav2vec2-tiny",
            cache_data_on_device=False,
        )
        runner = loop.AttackRunner(
            cfg, apply_fn, params, pipe,
            cparams=ConstraintParams.create(l2_size=0.5), use_mesh=False,
        )
        if cached:
            cc = pipeline_lib.CachedCorpus(
                pipe.train, cache_bytes=_half_cache_bytes(pipe.train)
            )
            assert 0 < cc.n_cached < len(pipe.train)
            runner._corpus_cache._corpora[id(pipe.train)] = cc
        p = runner.init_perturbation(seed=5)
        opt = optimizers.init_opt_state(cfg, p)
        p, opt, scores, _ = runner.train_epoch(
            p, opt, 0, shuffle_rng=np.random.default_rng(7)
        )
        results.append((np.asarray(p), scores.ctc, scores.wer))

    (p0, tc0, tw0), (p1, tc1, tw1) = results
    np.testing.assert_array_equal(p0, p1)
    assert tc0 == tc1 and tw0 == tw1


def test_cached_sharded_tiny_cache(split):
    """A budget below one row per device still constructs on a mesh: the
    cache rounds UP to n_data rows (one per device, the P('data')
    minimum), rows past the split stay zero and are never gathered."""
    from paa_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.data_mesh()
    n_data = mesh.shape["data"]
    cc = pipeline_lib.CachedCorpus(split, cache_bytes=1, mesh=mesh)
    assert cc.n_cached == n_data
    host = list(split.batches(8))
    dev = list(cc.batches(8))
    assert len(host) == len(dev)
    for hb, db in zip(host, dev):
        v = pipeline_lib.host_mask(hb)
        np.testing.assert_array_equal(hb.audio[v], np.asarray(db.audio)[v])
        np.testing.assert_array_equal(hb.weights, np.asarray(db.weights))
