"""Image super-resolution dataset bases.

Reference: datasets/_isr.py. Exact semantics preserved:
- TRAIN index virtualization: ``index // num_patches``, length =
  files × num_patches (:123-127)
- paired datasets: random LR-grid patch with ignored boundary (:87-107)
- bicubic datasets: random HR patch of size lr_patch·scale + 2·boundary·scale,
  MATLAB-exact downscale, then boundary shave on both (:198-222)
- augmentation: vflip / hflip / transpose, each p=0.5, shared between lr & hr
  (:109-121)
- EVAL: HR cropped to a multiple of scale, LR degraded from it (:216-222)

Arrays are HWC uint8 until the final conversion to float32 [0,1] (the
reference's to_tensor). Output layout is NHWC.
"""

import os

import numpy as np

from mobilesuperresolution_tpu.core import modes
from mobilesuperresolution_tpu.data.io_cache import ArrayCache, load_image

# Degradation: the native C++ core when built (bit-identical, ~7x faster on
# the single-core TPU hosts), numpy fallback otherwise.
from mobilesuperresolution_tpu.data.native_imresize import imresize_u8 as imresize_np


def update_argparser(parser):
    import mobilesuperresolution_tpu.data as data_pkg

    data_pkg.update_argparser(parser)
    parser.add_argument("--scale", default=2, type=int)
    parser.add_argument("--lr_patch_size", default=48, type=int)
    parser.add_argument("--ignored_boundary_size", default=2, type=int)
    parser.add_argument("--num_patches", default=100, type=int)
    parser.set_defaults(train_batch_size=16, eval_batch_size=1, image_mean=0.5)


def _to_float(img):
    return np.ascontiguousarray(img).astype(np.float32) / 255.0


def _augment(rng, lr, hr):
    if rng.random() < 0.5:
        lr, hr = lr[::-1], hr[::-1]
    if rng.random() < 0.5:
        lr, hr = lr[:, ::-1], hr[:, ::-1]
    if rng.random() < 0.5:
        lr, hr = np.swapaxes(lr, 0, 1), np.swapaxes(hr, 0, 1)
    return lr, hr


class ImageSRDataset:
    """Paired LR/HR files."""

    def __init__(self, mode, params, lr_files, hr_files, cache_dir=None):
        self.mode = mode
        self.params = params
        self.lr_files = lr_files  # [(name, path), ...]
        self.hr_files = hr_files
        self.cache = (
            ArrayCache(cache_dir, compress=bool(getattr(params, "cache_compress", 1)))
            if cache_dir
            else None
        )
        self.rng = np.random.default_rng(getattr(params, "seed", 0))
        if self.cache is not None:
            for name, path in list(lr_files) + list(hr_files):
                if name not in self.cache:
                    self.cache.add(name, load_image(path))
            self.cache.log_build_stats(f"{type(self).__name__} cache")

    def _load(self, files, index):
        name, path = files[index]
        if self.cache is not None:
            return np.asarray(self.cache.get(name))
        return load_image(path)

    def _load_item(self, index):
        return self._load(self.lr_files, index), self._load(self.hr_files, index)

    def _sample_patch(self, lr, hr, rng):
        p = self.params
        if self.mode == modes.TRAIN:
            b = p.ignored_boundary_size
            x = rng.integers(b, lr.shape[0] - p.lr_patch_size + 1 - b)
            y = rng.integers(b, lr.shape[1] - p.lr_patch_size + 1 - b)
            lr = lr[x : x + p.lr_patch_size, y : y + p.lr_patch_size]
            hr = hr[
                x * p.scale : (x + p.lr_patch_size) * p.scale,
                y * p.scale : (y + p.lr_patch_size) * p.scale,
            ]
        else:
            hr = hr[: lr.shape[0] * p.scale, : lr.shape[1] * p.scale]
        return lr, hr

    def __len__(self):
        if self.mode == modes.TRAIN:
            return len(self.lr_files) * self.params.num_patches
        return len(self.lr_files)

    def __getitem__(self, index):
        return self.item(index, self.rng)

    def item(self, index, rng):
        """__getitem__ with the random stream passed in. ``_batches`` derives
        ``rng`` purely from (epoch seed, index), which makes the training
        stream a pure function of (seed, epoch, index): independent of batch
        arrival order, prefetch depth, process count — and resumable
        mid-epoch bit-for-bit (train/preemption.py)."""
        if self.mode == modes.TRAIN:
            index = index // self.params.num_patches
        lr, hr = self._load_item(index)
        lr, hr = self._sample_patch(lr, hr, rng)
        if self.mode == modes.TRAIN:
            lr, hr = _augment(rng, lr, hr)
            return _to_float(lr), _to_float(hr)
        name = os.path.splitext(self.hr_files[index][0])[0]
        return name, _to_float(lr), _to_float(hr)


class ImageSRBicubicDataset(ImageSRDataset):
    """HR-only files; LR synthesized with the MATLAB-exact bicubic."""

    def __init__(self, mode, params, hr_files, cache_dir=None):
        super().__init__(mode, params, hr_files, hr_files, cache_dir)

    def _load_item(self, index):
        hr = self._load(self.hr_files, index)
        return hr, hr

    def _sample_patch(self, lr, hr, rng):
        p = self.params
        if self.mode == modes.TRAIN:
            hb = p.ignored_boundary_size * p.scale
            hp = p.lr_patch_size * p.scale + 2 * hb
            x = rng.integers(0, hr.shape[0] - hp + 1)
            y = rng.integers(0, hr.shape[1] - hp + 1)
            hr = hr[x : x + hp, y : y + hp]
            lr = imresize_np(hr, scalar_scale=1.0 / p.scale)
            b = p.ignored_boundary_size
            if b:
                lr = lr[b:-b, b:-b]
                hr = hr[hb:-hb, hb:-hb]
        else:
            if hr.shape[0] % p.scale:
                hr = hr[: -(hr.shape[0] % p.scale)]
            if hr.shape[1] % p.scale:
                hr = hr[:, : -(hr.shape[1] % p.scale)]
            lr = imresize_np(hr, scalar_scale=1.0 / p.scale)
        return lr, hr


def _item(dataset, index, seed):
    """Fetch one item with a random stream derived purely from (seed, index)
    — order/prefetch/process-count independent, hence exactly replayable."""
    if hasattr(dataset, "item"):
        return dataset.item(index, np.random.default_rng([seed, index]))
    return dataset[index]


def _batches(dataset, batch_size, shuffle, seed, drop_last,
             shard_by_process=False, start_batch=0):
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    if shard_by_process:
        # per-host sharding — the DistributedSampler role (pretrain.py:182);
        # every process shuffles identically (same seed) then takes its slice.
        # Pad with wrap-around to a multiple of process_count first (exactly
        # DistributedSampler's padding): every process MUST see the same
        # number of batches — the train step is a cross-host collective, so
        # one host running an extra step while the others have moved on to
        # the checkpoint barrier deadlocks the job.
        import jax

        p = jax.process_count()
        if len(order) % p:
            order = np.concatenate([order, order[: p - len(order) % p]])
        order = order[jax.process_index() :: p]
    for bidx, start in enumerate(range(0, len(order), batch_size)):
        idx = order[start : start + batch_size]
        if len(idx) == 0 or (drop_last and len(idx) < batch_size):
            return
        if bidx < start_batch:
            continue  # mid-epoch resume: already-consumed batches skip free
        items = [_item(dataset, int(i), seed) for i in idx]
        if isinstance(items[0], tuple) and len(items[0]) == 3:
            for name, lr, hr in items:
                yield name, lr[None], hr[None]
        else:
            lrs = np.stack([it[0] for it in items])
            hrs = np.stack([it[1] for it in items])
            yield lrs, hrs


def batch_iterator(
    dataset,
    batch_size,
    shuffle=False,
    seed=0,
    drop_last=False,
    prefetch=2,
    shard_by_process=False,
    start_batch=0,
):
    """Host-side batcher with background-thread prefetch so patch sampling +
    bicubic degradation overlap the device step (the DataLoader-worker role of
    the reference, num_workers=8 — pretrain.py:192-207). TRAIN items are
    (lr, hr) stacked to (B, h, w, C); EVAL items are (name, lr, hr) with batch
    dim 1 (reference eval_batch_size=1). ``shard_by_process`` slices the
    (identically-shuffled) index order per host for multi-host training.
    Random patch/flip draws derive purely from (seed, item index), so the
    stream is a function of its arguments alone; ``start_batch`` resumes an
    interrupted epoch exactly (train/preemption.py)."""
    gen = _batches(dataset, batch_size, shuffle, seed, drop_last,
                   shard_by_process, start_batch)
    if prefetch <= 0:
        yield from gen
        return

    import queue
    import threading

    q = queue.Queue(maxsize=prefetch)
    _END = object()

    def worker():
        # dataset errors re-raise in the consumer — a silently swallowed
        # exception here would look like a clean (truncated) end-of-epoch.
        # BaseExceptions (SystemExit raised by library code, a
        # KeyboardInterrupt delivered to this thread) are ALSO transported —
        # the consumer blocks on q.get(), so a worker that dies without
        # enqueuing anything would hang training forever — and then
        # re-raised here so interpreter-level signals still terminate the
        # thread rather than masquerade as handled dataset errors.
        try:
            for item in gen:
                q.put(item)
            q.put(_END)
        except Exception as e:  # noqa: BLE001 — transported, not handled
            q.put(e)
        except BaseException as e:
            q.put(e)
            raise

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
