"""Batching pipeline: length filter, splits, fixed-shape collate, prefetch.

Reproduces the reference's data semantics (src/training_utils/build.py):
  * length stats from the first 300 samples; keep lengths within the
    [q10, q(relative_audio_length)] window (build.py:186-192),
  * crop/zero-pad every waveform to the window's upper quantile so all
    batches are one static shape (build.py:41-61 collate),
  * deterministic shuffle + 80/10/10 train/eval/test split (build.py:198-208).

TPU-first additions:
  * labels are tokenized ONCE per split (the reference re-tokenizes every
    batch inside the hot loop, src/core/loss_helpers.py:19),
  * the final partial batch is padded to the static batch shape with a
    per-example weight mask (0.0 for padding rows) instead of going
    ragged — eval covers every sample with zero recompiles,
  * an async device prefetcher overlaps host→device transfer of batch
    k+1 with compute of batch k.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Iterator, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from paa_tpu.ops import text as text_ops

logger = logging.getLogger(__name__)


class Batch(NamedTuple):
    audio: np.ndarray  # (B, T) float32
    labels: np.ndarray  # (B, L) int32
    label_paddings: np.ndarray  # (B, L) float32
    weights: np.ndarray  # (B,) float32 — 0.0 on padding rows
    indices: np.ndarray  # (B,) int32 — row index into the split (−1 pad)
    # set by prefetch_to_device: the original HOST weights, so hot loops
    # can build row masks without a device→host readback (one readback
    # per step costs a full round trip — ~0.8 s on a tunneled TPU — and
    # serializes the async dispatch pipeline)
    host_weights: np.ndarray | None = None


def host_mask(batch: Batch) -> np.ndarray:
    """Boolean valid-row mask from the host-side weights copy (falls back
    to the ``weights`` field for batches that never went through
    ``prefetch_to_device``). Never syncs a device array in a hot loop."""
    w = batch.host_weights if batch.host_weights is not None else batch.weights
    return np.asarray(w) > 0


@dataclasses.dataclass
class Split:
    """One data split: variable-length waveforms + pre-tokenized labels."""

    waveforms: list  # list[np.ndarray (Ti,)]
    texts: list  # cleaned transcripts
    labels: np.ndarray  # (N, L) int32
    label_paddings: np.ndarray  # (N, L) float32
    audio_len: int

    def __len__(self):
        return len(self.waveforms)

    def collate(self, idx: Sequence[int], batch_size: int) -> Batch:
        """Fixed-shape batch from rows ``idx`` (padded to batch_size)."""
        B, T = batch_size, self.audio_len
        audio = np.zeros((B, T), dtype=np.float32)
        weights = np.zeros((B,), dtype=np.float32)
        rows = np.full((B,), -1, dtype=np.int32)
        L = self.labels.shape[1]
        labels = np.full((B, L), text_ops.PAD_ID, dtype=np.int32)
        paddings = np.ones((B, L), dtype=np.float32)
        for j, i in enumerate(idx):
            w = self.waveforms[i]
            n = min(len(w), T)  # crop or zero-pad (reference: build.py:49-53)
            audio[j, :n] = w[:n]
            labels[j] = self.labels[i]
            paddings[j] = self.label_paddings[i]
            weights[j] = 1.0
            rows[j] = i
        return Batch(audio, labels, paddings, weights, rows)

    def batches(
        self,
        batch_size: int,
        shuffle_rng: np.random.Generator | None = None,
        drop_remainder: bool = False,
    ) -> Iterator[Batch]:
        for rows in _batch_rows(len(self), batch_size, shuffle_rng, drop_remainder):
            yield self.collate(rows[rows >= 0], batch_size)

    def num_batches(self, batch_size: int, drop_remainder: bool = False) -> int:
        n = len(self)
        return n // batch_size if drop_remainder else -(-n // batch_size)


def _batch_rows(
    n: int,
    batch_size: int,
    shuffle_rng: np.random.Generator | None = None,
    drop_remainder: bool = False,
) -> Iterator[np.ndarray]:
    """Yield ``(batch_size,)`` int32 row vectors (−1 = padding row) over a
    length-``n`` split. The ONE source of order/shuffle/remainder
    semantics for both feeds — the host collate (:meth:`Split.batches`)
    and the device gather (:meth:`DeviceCorpus.batches`) must stay
    bit-identical, since the tri-state auto switch silently picks either
    per backend/split size and runs are compared across them."""
    order = np.arange(n)
    if shuffle_rng is not None:
        shuffle_rng.shuffle(order)
    for start in range(0, n, batch_size):
        chunk = order[start : start + batch_size]
        if len(chunk) < batch_size and drop_remainder:
            return
        rows = np.full((batch_size,), -1, dtype=np.int32)
        rows[: len(chunk)] = chunk
        yield rows


class DataPipeline(NamedTuple):
    train: Split
    eval: Split
    test: Split
    audio_len: int


def _make_split(samples: list, texts: list[str], audio_len: int, label_len: int) -> Split:
    labels, paddings = text_ops.encode_batch(texts, pad_to=label_len)
    return Split(
        waveforms=[np.asarray(w, dtype=np.float32).reshape(-1) for (w, _, _) in samples],
        texts=texts,
        labels=labels,
        label_paddings=paddings,
        audio_len=audio_len,
    )


def _to_target_sr(w, sr: int, target_sr: int):
    """Polyphase-resample one waveform to ``target_sr`` (no-op if equal).

    The HF adapters cast to 16 kHz at load (datasets.py); local WAV/FLAC
    trees keep their native rate, and silently treating e.g. 44.1 kHz
    samples as 16 kHz would corrupt the model features, the STFT bin
    frequencies behind every psychoacoustic table, and the exported WAVs.
    """
    if sr == target_sr or sr <= 0:
        return w
    try:
        from scipy.signal import resample_poly
    except ImportError as e:  # pragma: no cover - scipy ships in the env
        raise RuntimeError(
            f"corpus sample rate {sr} != target {target_sr}; resampling "
            "requires scipy (or pre-convert the audio tree)"
        ) from e
    import math

    g = math.gcd(int(sr), int(target_sr))
    return resample_poly(
        np.asarray(w, np.float32).reshape(-1), target_sr // g, sr // g
    ).astype(np.float32)


def build_pipeline(
    samples: list,
    relative_audio_length: float = 0.80,
    seed: int = 5,
    target_size: int | None = None,
    target_sr: int = 16000,
) -> DataPipeline:
    """Length-filter, split and pre-tokenize a materialized corpus.

    Mirrors reference semantics: quantile window from the first 300
    samples (build.py:186-192), deterministic shuffle, 80/10/10 split
    (build.py:198-208). Samples whose rate differs from ``target_sr``
    are resampled first (see :func:`_to_target_sr`).
    """
    samples = [(_to_target_sr(w, sr, target_sr), target_sr, t) for (w, sr, t) in samples]
    lengths = np.asarray(
        [len(np.asarray(w).reshape(-1)) for (w, _, _) in samples[: min(300, len(samples))]],
        dtype=np.float64,
    )
    min_len = int(np.quantile(lengths, 0.10))
    audio_len = int(np.quantile(lengths, relative_audio_length))

    kept = [
        s
        for s in samples
        if min_len <= len(np.asarray(s[0]).reshape(-1)) <= audio_len
    ]
    if target_size is not None:
        kept = kept[:target_size]
    if len(kept) < 3:
        raise ValueError(
            f"Too few samples after length filtering ({len(kept)}); "
            f"window=[{min_len}, {audio_len}]"
        )

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(kept))
    kept = [kept[i] for i in order]

    # 80/10/10 with reference int-floor semantics (build.py:203-208) —
    # but never an empty eval/test split: with a tiny corpus
    # int(0.1·n) is 0 and every eval would silently score inf
    n_train = int(0.8 * len(kept))
    n_eval = int(0.1 * len(kept))
    if n_eval == 0:
        n_eval = 1
        n_train = len(kept) - 2  # leaves exactly one test sample
    groups = {
        "train": kept[:n_train],
        "eval": kept[n_train : n_train + n_eval],
        "test": kept[n_train + n_eval :],
    }
    assert all(groups.values()), {k: len(v) for k, v in groups.items()}
    # One shared label width for every split → a single eval-step shape.
    # Transcripts are cleaned once here and handed to the splits.
    all_texts = text_ops.clean_transcripts([t for (_, _, t) in kept])
    label_len = max((len(text_ops.encode(t)) for t in all_texts), default=1)
    text_groups = {
        "train": all_texts[:n_train],
        "eval": all_texts[n_train : n_train + n_eval],
        "test": all_texts[n_train + n_eval :],
    }

    return DataPipeline(
        train=_make_split(groups["train"], text_groups["train"], audio_len, label_len),
        eval=_make_split(groups["eval"], text_groups["eval"], audio_len, label_len),
        test=_make_split(groups["test"], text_groups["test"], audio_len, label_len),
        audio_len=audio_len,
    )


class DeviceCorpus:
    """A split staged to device HBM once; batches form via on-device gather.

    Steady-state training then moves only a ``(B,)`` int32 row vector per
    step instead of the full ``(B, T)`` audio — the TPU-native answer to
    the reference's DataLoader feed (reference: build.py:211-213). This
    matters doubly on remote/tunneled chips, where per-batch host→device
    copies are bandwidth-bound (measured 1175 → 348 ms/step end-to-end,
    docs/PERF.md).

    With a ``mesh``, the corpus rows are SHARDED over the mesh's ``data``
    axis (each chip holds N/n_data rows) and the jitted gather emits
    batches already sharded along the batch dimension — XLA turns the
    row lookup into ICI collective gathers, keeping the per-step feed
    entirely on-device for multi-chip runs too.

    Padding rows of a short final batch gather row 0 with weight 0 — the
    step's loss and all metrics are weight-masked, so they contribute
    nothing (attack/step.py:58).
    """

    def __init__(self, split: "Split", mesh=None):
        N, T = len(split), split.audio_len
        n_pad = 0
        if mesh is not None:
            # pad the row dimension to the data-axis size so P("data")
            # divides evenly; padding rows are never gathered (row
            # indices stay < N)
            n_data = mesh.shape["data"]
            n_pad = (-N) % n_data
        audio = np.zeros((N + n_pad, T), dtype=np.float32)
        for i, w in enumerate(split.waveforms):
            n = min(len(w), T)
            audio[i, :n] = w[:n]
        labels = split.labels
        pads = split.label_paddings
        if n_pad:
            labels = np.concatenate([labels, np.zeros((n_pad,) + labels.shape[1:], labels.dtype)])
            pads = np.concatenate([pads, np.ones((n_pad,) + pads.shape[1:], pads.dtype)])
        if mesh is None:
            put = jax.device_put
            self._gather = _gather_rows
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            corpus_sh = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            batch_sh = NamedSharding(mesh, P("data"))
            put = lambda x: jax.device_put(x, corpus_sh)
            self._gather = jax.jit(
                _gather_rows_fn,
                in_shardings=(corpus_sh, corpus_sh, corpus_sh, repl),
                out_shardings=(batch_sh, batch_sh, batch_sh, batch_sh),
            )
            self._rows_sharding = repl
        self.mesh = mesh
        self.audio = put(audio)
        self.labels = put(labels)
        self.label_paddings = put(pads)
        self.split = split

    @staticmethod
    def nbytes(split: "Split") -> int:
        return (
            len(split) * split.audio_len * 4
            + split.labels.nbytes
            + split.label_paddings.nbytes
        )

    def batches(
        self,
        batch_size: int,
        shuffle_rng: np.random.Generator | None = None,
        drop_remainder: bool = False,
    ) -> Iterator[Batch]:
        for rows in _batch_rows(
            len(self.split), batch_size, shuffle_rng, drop_remainder
        ):
            host_w = (rows >= 0).astype(np.float32)
            dev_rows = jnp.asarray(rows)
            if self.mesh is not None:
                dev_rows = jax.device_put(dev_rows, self._rows_sharding)
            audio, labels, pads, weights = self._gather(
                self.audio, self.labels, self.label_paddings, dev_rows
            )
            yield Batch(audio, labels, pads, weights, rows, host_w)


def _gather_rows_fn(audio, labels, pads, rows):
    safe = jnp.maximum(rows, 0)
    w = (rows >= 0).astype(jnp.float32)
    return audio[safe], labels[safe], pads[safe], w


_gather_rows = jax.jit(_gather_rows_fn)


def _combine_cached_fn(cache_a, cache_l, cache_p, miss_a, miss_l, miss_p,
                       sel_cache, sel_miss, use_miss, rows):
    """Assemble one batch from the resident row cache + a host-filled
    miss buffer: two gathers and a select — (B,T)-sized HBM traffic,
    no host bytes for cache hits. ``rows`` only feeds the weights mask
    (same −1-padding contract as :func:`_gather_rows_fn`)."""
    um = use_miss[:, None]
    audio = jnp.where(um, miss_a[sel_miss], cache_a[sel_cache])
    labels = jnp.where(um, miss_l[sel_miss], cache_l[sel_cache])
    pads = jnp.where(um, miss_p[sel_miss], cache_p[sel_cache])
    w = (rows >= 0).astype(jnp.float32)
    return audio, labels, pads, w


_combine_cached = jax.jit(_combine_cached_fn)


class CachedCorpus:
    """Hybrid feed for splits past the resident budget: a device-resident
    ROW CACHE plus host fill of the overflow rows only.

    Why not just stream: on the tunneled single-tenant chip the
    host→device link SERIALIZES with compute, so any feed that moves the
    full audio every step is link-bound no matter how it is chunked —
    measured 2026-08-19 (tools/bench_feed.py): host per-batch feed
    871 ms/step, double-buffered streaming super-blocks 960 ms/step
    (that StreamingCorpus feed was removed in round 5: 0.91× the host
    feed with no winning link available to justify it),
    against ~235 ms of step compute. :class:`DeviceCorpus` wins 3.4× by
    moving ~zero bytes per step, but needs the whole split resident.

    This feed stages the first ``C`` rows of the split (everything the
    budget allows) exactly like :class:`DeviceCorpus`; each batch then
    gathers its cache hits on-device and transfers ONLY the miss rows —
    per-step host bytes shrink by the resident fraction (95% resident →
    20× fewer bytes). Batches stay bit-identical to the host and gather
    feeds: ``_batch_rows`` still owns order/shuffle/remainder semantics,
    and the on-device combine reassembles rows in batch order.

    Miss buffers are padded up to ``MISS_BUCKET`` multiples so the
    combine compiles for at most ``B/MISS_BUCKET + 1`` shapes instead of
    one program per distinct miss count, and the next batch's miss
    transfer is dispatched one step ahead (same overlap idiom as
    :func:`prefetch_to_device`).

    With a ``mesh`` the cache rows shard over the ``data`` axis and the
    combine is jitted with batch-sharded outputs — each chip keeps only
    its cache shard, the (small) miss buffer is replicated, and XLA
    inserts the gather collectives (same pattern as
    :class:`DeviceCorpus`'s sharded gather).

    At true reference scale (30k clips ≈ 19 GB, reference:
    src/training_utils/build.py:114) a single chip's resident fraction
    is ~3% and this degrades gracefully toward the host feed; the
    multi-host answer remains per-host sharded staging, which this
    class's mesh variant is the single-host template for.
    """

    # 8 rows ≈ 5 MB at the 10 s shape ≈ 70 ms on the measured ~71 MB/s
    # effective link — the quantization overhead that keeps the ≥2×
    # end-to-end win at ~95% resident fraction (16 rows measured the
    # link cost into ~1.9×); at most B/8 + 1 combine programs compile
    MISS_BUCKET = 8

    def __init__(self, split: "Split", cache_bytes: int, mesh=None):
        N, T = len(split), split.audio_len
        L = split.labels.shape[1]
        row_bytes = T * 4 + split.labels.itemsize * L + 4 * L
        C = max(1, min(N, int(cache_bytes) // max(row_bytes, 1)))
        n_data = 1
        if mesh is not None:
            n_data = mesh.shape["data"]
            # Shard rows evenly: C must be a positive multiple of the
            # data-axis width or the P("data") device_put below raises.
            # A tiny budget (or a split smaller than the mesh) rounds UP
            # to one row per device; rows past len(split) stay zero and
            # are never gathered (batch row indices are always < N).
            C = max(n_data, C - C % n_data)
        audio = np.zeros((C, T), dtype=np.float32)
        for i in range(min(C, N)):
            w = split.waveforms[i]
            n = min(len(w), T)
            audio[i, :n] = w[:n]
        self.split = split
        self.mesh = mesh
        self.n_cached = C
        if mesh is None:
            put = jax.device_put
            self._put_miss = jax.device_put
            self._combine = _combine_cached
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            cache_sh = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            batch_sh = NamedSharding(mesh, P("data"))
            put = lambda x: jax.device_put(x, cache_sh)
            self._put_miss = lambda x: jax.device_put(x, repl)
            self._combine = jax.jit(
                _combine_cached_fn,
                in_shardings=(cache_sh, cache_sh, cache_sh,
                              repl, repl, repl, repl, repl, repl, repl),
                out_shardings=(batch_sh, batch_sh, batch_sh, batch_sh),
            )
        labels = np.zeros((C, L), dtype=split.labels.dtype)
        labels[: min(C, N)] = split.labels[: min(C, N)]
        label_paddings = np.ones((C, L), dtype=split.label_paddings.dtype)
        label_paddings[: min(C, N)] = split.label_paddings[: min(C, N)]
        self.audio = put(audio)
        self.labels = put(labels)
        self.label_paddings = put(label_paddings)
        self._zero_miss = None  # staged once, reused for all-hit batches

    @staticmethod
    def cache_bytes_for(budget_per_device: int, n_data: int) -> int:
        return budget_per_device * max(n_data, 1)

    def _stage_miss(self, rows: np.ndarray, batch_size: int):
        split, C = self.split, self.n_cached
        T, L = split.audio_len, split.labels.shape[1]
        use_miss = rows >= C
        miss_rows = rows[use_miss]
        m = len(miss_rows)
        bucket = self.MISS_BUCKET
        m_pad = max(bucket, -(-m // bucket) * bucket) if m else bucket
        m_pad = min(m_pad, max(batch_size, bucket))
        audio = np.zeros((m_pad, T), dtype=np.float32)
        labels = np.zeros((m_pad, L), dtype=split.labels.dtype)
        pads = np.ones((m_pad, L), dtype=np.float32)
        for j, i in enumerate(miss_rows):
            w = split.waveforms[i]
            n = min(len(w), T)
            audio[j, :n] = w[:n]
            labels[j] = split.labels[i]
            pads[j] = split.label_paddings[i]
        sel_miss = np.zeros((batch_size,), np.int32)
        sel_miss[use_miss] = np.arange(m, dtype=np.int32)
        sel_cache = np.where(use_miss, 0, np.maximum(rows, 0)).astype(np.int32)
        if m == 0:
            # all-hit batch: no rows to transfer — reuse one staged zero
            # buffer so a fully-resident epoch moves zero audio bytes
            # (this makes CachedCorpus ≡ DeviceCorpus when it all fits)
            if self._zero_miss is None:
                self._zero_miss = self._put_miss((audio, labels, pads))
            dev_miss = self._zero_miss
        else:
            dev_miss = self._put_miss((audio, labels, pads))
        host_w = (rows >= 0).astype(np.float32)
        return (dev_miss, jnp.asarray(sel_cache), jnp.asarray(sel_miss),
                jnp.asarray(use_miss), jnp.asarray(rows), rows, host_w)

    def batches(
        self,
        batch_size: int,
        shuffle_rng: np.random.Generator | None = None,
        drop_remainder: bool = False,
    ) -> Iterator[Batch]:
        import collections

        queue = collections.deque()

        def emit(staged) -> Batch:
            (miss, sel_cache, sel_miss, use_miss, dev_rows, rows,
             host_w) = staged
            audio, labels, pads, weights = self._combine(
                self.audio, self.labels, self.label_paddings,
                miss[0], miss[1], miss[2],
                sel_cache, sel_miss, use_miss, dev_rows,
            )
            return Batch(audio, labels, pads, weights, rows, host_w)

        for rows in _batch_rows(
            len(self.split), batch_size, shuffle_rng, drop_remainder
        ):
            queue.append(self._stage_miss(rows, batch_size))
            if len(queue) >= 2:
                yield emit(queue.popleft())
        while queue:
            yield emit(queue.popleft())


_DEVICE_CACHE_AUTO_LIMIT = 512 << 20  # bytes per device


def maybe_device_corpus(
    split: "Split", enable: bool | None, mesh=None
) -> "DeviceCorpus | CachedCorpus | None":
    """Resolve the device-cache tri-state for one split.

    ``None`` (auto) on a TPU backend picks, by the split's PER-DEVICE
    staged share:
      * ≤512 MiB — :class:`DeviceCorpus`: whole split resident, batches
        by on-device gather (fastest; zero per-step feed);
      * larger — :class:`CachedCorpus`: everything the budget allows
        stays resident, only the overflow rows transfer per batch —
        measured 2.4× the host feed at a 540 MB split (docs/PERF.md
        round 4; a streaming super-block feed was measured too and
        removed — on this tunneled link any full-bytes feed is
        link-bound: 0.91× the host feed).
    With a ``mesh`` all variants shard over its ``data`` axis, so the
    budgets scale with the slice. Explicit True/False still wins (True
    forces the full staging — the caller asked for it; False keeps the
    host feed).
    """
    if enable is False:
        return None
    n_data = mesh.shape["data"] if mesh is not None else 1
    if enable is None:
        if jax.default_backend() != "tpu":
            return None
        if mesh is None and jax.device_count() != 1:
            return None
        if DeviceCorpus.nbytes(split) > _DEVICE_CACHE_AUTO_LIMIT * n_data:
            return CachedCorpus(
                split,
                cache_bytes=CachedCorpus.cache_bytes_for(
                    _DEVICE_CACHE_AUTO_LIMIT, n_data
                ),
                mesh=mesh,
            )
    return DeviceCorpus(split, mesh=mesh)


def batch_source(
    split: "Split",
    batch_size: int,
    corpus: DeviceCorpus | None,
    shuffle_rng: np.random.Generator | None = None,
) -> Iterator[Batch]:
    """Device-gather batches when a corpus is staged, else host collate +
    prefetch — one call site for both feeds."""
    if corpus is not None:
        return corpus.batches(batch_size, shuffle_rng=shuffle_rng)
    return prefetch_to_device(split.batches(batch_size, shuffle_rng=shuffle_rng))


class CorpusCache:
    """Lazy per-split device staging under the ``cache_data_on_device``
    tri-state, keyed by split identity — the ONE home for the idiom the
    single-run loop (train/loop.py:AttackRunner) and the sweep driver
    (cli/sweep.py) both need, so staging policy and logging cannot
    drift between them."""

    def __init__(self, enable: bool | None, mesh=None):
        self._enable = enable
        self._mesh = mesh
        self._corpora: dict[int, DeviceCorpus | None] = {}

    def corpus(self, split: "Split") -> DeviceCorpus | None:
        key = id(split)
        if key not in self._corpora:
            c = maybe_device_corpus(split, self._enable, mesh=self._mesh)
            if isinstance(c, CachedCorpus):
                logger.info(
                    "split exceeds the resident-HBM budget (%d clips, %.0f MB) "
                    "— caching the first %d rows on device (%.0f%%), host-"
                    "filling only the overflow per batch",
                    len(split), DeviceCorpus.nbytes(split) / 1e6,
                    c.n_cached, 100.0 * c.n_cached / len(split),
                )
            elif c is not None:
                logger.info(
                    "staged split to device HBM: %d clips, %.0f MB — batches "
                    "now form by on-device gather",
                    len(split), DeviceCorpus.nbytes(split) / 1e6,
                )
            self._corpora[key] = c
        return self._corpora[key]

    def batches(
        self,
        split: "Split",
        batch_size: int,
        shuffle_rng: np.random.Generator | None = None,
    ) -> Iterator[Batch]:
        return batch_source(
            split, batch_size, self.corpus(split), shuffle_rng=shuffle_rng
        )


def prefetch_to_device(iterator: Iterator[Batch], size: int = 2) -> Iterator[Batch]:
    """Move batches to device ``size`` steps ahead of consumption.

    JAX dispatch is async, so one batch of lookahead is enough to overlap
    the host→device copy with the previous step's compute — the TPU
    replacement for the reference's DataLoader worker prefetch.
    """
    import collections

    queue = collections.deque()
    for batch in iterator:
        # Only the fields the compiled step consumes go to the device;
        # ``indices`` stays host-side (it is pure bookkeeping) and the
        # original weights are kept as ``host_weights`` so per-step row
        # masks never read back from the device (see host_mask).
        audio, labels, pads, weights = jax.device_put(
            (batch.audio, batch.labels, batch.label_paddings, batch.weights)
        )
        queue.append(Batch(audio, labels, pads, weights,
                           batch.indices, batch.weights))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
