"""ctypes wrapper for the native C++ record loader (native/cnfrec_loader.cc).

The native layer provides what the reference gets from TensorFlow's C++
runtime (TFRecord reading + parse, conv_cINN_base_functions.py:26-65):
zero-copy mmap of the record blob, threaded batch gather, and CRC
verification.  Falls back transparently to the pure-Python reader in
``data.records`` when the shared library cannot be built (g++ missing).

The library is compiled on first use and cached next to the source.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcnfrec.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            # make is timestamp-aware: a no-op when the cached .so is current,
            # a rebuild when cnfrec_loader.cc changed since it was built
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                if not os.path.exists(_LIB_PATH):
                    raise  # no prebuilt library to fall back to
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:
            _lib_failed = True
            return None
        lib.cnf_open.restype = ctypes.c_void_p
        lib.cnf_open.argtypes = [ctypes.c_char_p]
        lib.cnf_close.argtypes = [ctypes.c_void_p]
        lib.cnf_count.restype = ctypes.c_int64
        lib.cnf_count.argtypes = [ctypes.c_void_p]
        lib.cnf_record_bytes.restype = ctypes.c_int64
        lib.cnf_record_bytes.argtypes = [ctypes.c_void_p]
        lib.cnf_header_json.restype = ctypes.c_char_p
        lib.cnf_header_json.argtypes = [ctypes.c_void_p]
        lib.cnf_verify_crc.restype = ctypes.c_int
        lib.cnf_verify_crc.argtypes = [ctypes.c_void_p]
        lib.cnf_gather.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.cnf_gather_multi.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        if hasattr(lib, "cnf_crc32c"):  # absent in pre-update cached builds
            lib.cnf_crc32c.restype = ctypes.c_uint32
            lib.cnf_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        _lib = lib
        return _lib


def crc32c_native(data: bytes) -> Optional[int]:
    """CRC32C via the native library; None when it isn't available."""
    lib = _load_library()
    if lib is None or not hasattr(lib, "cnf_crc32c"):
        return None
    return int(lib.cnf_crc32c(data, len(data)))


def native_available() -> bool:
    return _load_library() is not None


class NativeRecordFile:
    """One open .cnfrec file backed by the native loader (or the Python
    mmap reader as fallback)."""

    def __init__(self, path: str, verify: bool = False):
        self.path = path
        self._lib = _load_library()
        if self._lib is not None:
            self._h = self._lib.cnf_open(path.encode())
            if not self._h:
                raise IOError(f"cnf_open failed for {path}")
            self.header = json.loads(self._lib.cnf_header_json(self._h).decode())
            if verify and not self._lib.cnf_verify_crc(self._h):
                raise IOError(f"{path}: CRC mismatch (native)")
        else:
            from arl_conditional_normalizing_flows_tpu.data import records

            self._h = None
            self.header = records.read_header(path)
            self._arr = records.read_records(path, verify=verify)
        self.count = int(self.header["count"])
        self.record_shape = tuple(self.header["shape"])
        self.dtype = np.dtype(self.header["dtype"])

    def gather(self, indices: np.ndarray, out: Optional[np.ndarray] = None,
               nthreads: int = 0) -> np.ndarray:
        """Batch gather records[indices] into a contiguous array."""
        indices = np.ascontiguousarray(indices, np.int64)
        # the native memcpy path has no bounds checks — validate here so a
        # bad index raises like the Python fallback instead of reading
        # out-of-bounds memory into the batch
        if len(indices) and (
            indices.min() < 0 or indices.max() >= self.count
        ):
            raise IndexError(
                f"record indices out of range [0, {self.count}) for {self.path}"
            )
        n = len(indices)
        if out is None:
            out = np.empty((n,) + self.record_shape, self.dtype)
        if self._h is not None:
            if nthreads <= 0:
                nthreads = min(8, os.cpu_count() or 1)
            self._lib.cnf_gather(
                self._h,
                indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n,
                out.ctypes.data_as(ctypes.c_void_p),
                nthreads,
            )
        elif hasattr(self, "_arr"):
            out[...] = self._arr[indices]
        else:  # native-backed file after close(): _h is None and no _arr
            raise ValueError(f"gather on closed NativeRecordFile {self.path}")
        return out

    def close(self):
        if self._h is not None and self._lib is not None:
            self._lib.cnf_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def gather_multi(files: Sequence[NativeRecordFile], file_ids: np.ndarray,
                 indices: np.ndarray, nthreads: int = 0) -> np.ndarray:
    """Gather across several per-class files in one call."""
    lib = _load_library()
    file_ids = np.ascontiguousarray(file_ids, np.int32)
    indices = np.ascontiguousarray(indices, np.int64)
    n = len(indices)
    f0 = files[0]
    out = np.empty((n,) + f0.record_shape, f0.dtype)
    closed = [f.path for f in files if f._h is None and not hasattr(f, "_arr")]
    if closed:  # closed native files would mis-route to the _arr fallback
        raise ValueError(f"gather_multi on closed NativeRecordFile(s): {closed}")
    for f in files[1:]:
        # the output stride is uniform — mixed record shapes would make the
        # native path write with the wrong stride (heap overflow / garbage)
        if f.record_shape != f0.record_shape or f.dtype != f0.dtype:
            raise ValueError(
                "gather_multi needs identical record shapes/dtypes: "
                f"{f0.path}={f0.record_shape}/{f0.dtype} vs "
                f"{f.path}={f.record_shape}/{f.dtype}"
            )
    if len(indices):
        counts = np.asarray([f.count for f in files], np.int64)
        if int(file_ids.min()) < 0 or int(file_ids.max()) >= len(files):
            raise IndexError(f"file_ids out of range [0, {len(files)})")
        if (indices < 0).any() or (indices >= counts[file_ids]).any():
            raise IndexError("record indices out of range for their files")
    if lib is not None and all(f._h is not None for f in files):
        handles = (ctypes.c_void_p * len(files))(*[f._h for f in files])
        if nthreads <= 0:
            nthreads = min(8, os.cpu_count() or 1)
        lib.cnf_gather_multi(
            handles,
            file_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            out.ctypes.data_as(ctypes.c_void_p),
            nthreads,
        )
    else:
        for i in range(n):
            out[i] = files[file_ids[i]]._arr[indices[i]]
    return out


def _prefetched(schedule, assemble, prefetch: int = 2):
    """Run ``assemble(item)`` for each schedule item in a background thread,
    yielding results with a bounded queue (the tf.data-prefetch role,
    conv_cINN.py:328-329). Abandon-safe: breaking out of the generator stops
    and reaps the worker."""
    import queue

    q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
    stop = threading.Event()

    def worker():
        for item in schedule:
            batch = assemble(item)
            while not stop.is_set():
                try:
                    q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue
            if stop.is_set():
                return
        q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except Exception:
            pass
        t.join(timeout=5.0)


class StreamingClassSource:
    """Bounded-memory drop-in for ``data.images.ClassConditionalSource``
    backed by per-class ``.cnfrec`` files (VERDICT round-1 item 5: the
    records path must not materialize whole datasets in host RAM).

    The epoch SCHEDULE — per-class example shuffle, class-pure slots,
    slot-order shuffle, per-slot noise keys, multi-host slot groups — is
    derived from the shared key exactly as in ClassConditionalSource, so the
    two sources yield numerically identical batch streams for the same key
    (tested). Only the row storage differs: batches are gathered on demand
    by the native loader and logit-transformed per batch in a background
    prefetch thread (host-side numpy; no device dispatch off-thread), with
    at most ``prefetch`` assembled batches resident.
    """

    def __init__(self, paths, which_classes, batch_size, use_logits=False,
                 logit_a=0.01, noise_floor_alpha=0.98, prefetch=2,
                 nthreads=0):
        from arl_conditional_normalizing_flows_tpu.data.images import (
            class_labels_01,
        )

        self.which_classes = [int(c) for c in which_classes]
        self.batch_size = int(batch_size)
        self.use_logits = use_logits
        self.logit_a = logit_a
        self.noise_floor_alpha = noise_floor_alpha
        self.prefetch = prefetch
        self.nthreads = nthreads
        self.files = [
            p if isinstance(p, NativeRecordFile) else NativeRecordFile(p)
            for p in paths
        ]
        assert len(self.files) == len(self.which_classes)
        self._label_values = class_labels_01(len(self.which_classes))
        b = self.batch_size
        self._counts = [(f.count // b) * b for f in self.files]
        assert all(c > 0 for c in self._counts), (
            "a class file has fewer records than batch_size — zero "
            f"class-pure batches (counts {[f.count for f in self.files]}, "
            f"batch_size {b}; per-class truncation, conv_cINN.py:271-304)"
        )
        bounds, start = [], 0
        for c in self._counts:
            bounds.append((start, start + c))
            start += c
        self._class_bounds = bounds
        self.num_batches = start // b
        h, w = self.files[0].record_shape[:2]
        d = self.files[0].record_shape[2] if len(self.files[0].record_shape) > 2 else 1
        self.xy_shape = (h, w, d + 1)

    # --- scheduling: identical derivations to ClassConditionalSource -------

    def _epoch_keys(self, key, epoch_idx: int):
        import jax

        return jax.random.split(jax.random.fold_in(key, epoch_idx), 3)

    def _example_perms(self, k_shuf):
        import jax

        return [
            np.asarray(jax.random.permutation(jax.random.fold_in(k_shuf, ci), n))
            for ci, n in enumerate(self._counts)
        ]

    def slot_groups(self, num_shards: int):
        b = self.batch_size
        groups = []
        for s, e in self._class_bounds:
            slots = list(range(s // b, e // b))
            for g in range(len(slots) // num_shards):
                groups.append(slots[g * num_shards : (g + 1) * num_shards])
        return groups

    def _slot_class(self, slot: int):
        b = self.batch_size
        for ci, (s, e) in enumerate(self._class_bounds):
            if s // b <= slot < e // b:
                return ci, slot - s // b
        raise IndexError(slot)

    # --- epoch iteration ---------------------------------------------------

    def _iter_slots(self, slots, perms, k_noise):
        import jax
        import jax.numpy as jnp

        from arl_conditional_normalizing_flows_tpu.ops.logit import logitify_np

        b = self.batch_size
        h, w = self.xy_shape[:2]

        def assemble(slot):
            ci, local = self._slot_class(int(slot))
            idx = perms[ci][local * b : (local + 1) * b]
            x = self.files[ci].gather(idx, nthreads=self.nthreads)
            x = x.reshape((b, h, w, -1)).astype(np.float32)
            if self.use_logits:
                x = logitify_np(x, self.logit_a)
            return int(slot), ci, x

        for slot, ci, x in _prefetched(
            iter(list(slots)), assemble, self.prefetch
        ):
            yplane = jnp.full((b, h, w, 1), float(self._label_values[ci]),
                             jnp.float32)
            xy = jnp.concatenate([jnp.asarray(x), yplane], axis=-1)
            if self.noise_floor_alpha < 1.0:
                k = jax.random.fold_in(k_noise, slot)
                eps = jax.random.normal(k, xy.shape, xy.dtype)
                xy = self.noise_floor_alpha * xy + (1 - self.noise_floor_alpha) * eps
            yield xy

    def epoch(self, key, epoch_idx: int = 0):
        import jax

        k_perm, k_shuf, k_noise = self._epoch_keys(key, epoch_idx)
        order = np.asarray(jax.random.permutation(k_perm, self.num_batches))
        perms = self._example_perms(k_shuf)
        yield from self._iter_slots(order, perms, k_noise)

    def epoch_distributed(self, key, epoch_idx: int, num_shards: int,
                          shard_id: int):
        import jax

        if num_shards == 1:
            yield from self.epoch(key, epoch_idx)
            return
        assert 0 <= shard_id < num_shards
        k_perm, k_shuf, k_noise = self._epoch_keys(key, epoch_idx)
        groups = self.slot_groups(num_shards)
        assert groups, (
            f"no class has {num_shards} class-pure batches per epoch"
        )
        order = np.asarray(jax.random.permutation(k_perm, len(groups)))
        perms = self._example_perms(k_shuf)
        slots = [groups[int(g)][shard_id] for g in order]
        yield from self._iter_slots(slots, perms, k_noise)

    def close(self):
        for f in self.files:
            f.close()


class StreamingSRSource:
    """Bounded-memory drop-in for ``data.images.SRSource`` over a combined
    ``.cnfrec`` file: hires rows are gathered per batch in a prefetch thread
    and the SR pair construction (``preprocess_sr``) runs per batch instead
    of over the whole dataset. Schedule (example permutation, per-batch
    noise keys, multi-host grouping) matches SRSource for the same key."""

    def __init__(self, path, model_type, batch_size, residual=True,
                 noise_floor_alpha=0.98, prefetch=2, nthreads=0):
        self.file = path if isinstance(path, NativeRecordFile) else NativeRecordFile(path)
        self.model_type = model_type
        self.batch_size = int(batch_size)
        self.residual = residual
        self.noise_floor_alpha = noise_floor_alpha
        self.prefetch = prefetch
        self.nthreads = nthreads
        n = (self.file.count // self.batch_size) * self.batch_size
        assert n > 0, (
            f"dataset ({self.file.count} records) smaller than batch_size"
        )
        self._n = n
        self.num_batches = n // self.batch_size
        h, w = self.file.record_shape[:2]
        d = self.file.record_shape[2] if len(self.file.record_shape) > 2 else 1
        if model_type == "SR4,2":
            h, w = h // 2, w // 2
        self.xy_shape = (h, w, 2 * d)

    def _batches(self, key, epoch_idx, batch_ids):
        import jax
        import jax.numpy as jnp

        from arl_conditional_normalizing_flows_tpu.data.images import (
            preprocess_sr,
        )

        k_perm, k_noise = jax.random.split(jax.random.fold_in(key, epoch_idx))
        # SRSource permutes the TRUNCATED example range with this key
        order = np.asarray(jax.random.permutation(k_perm, self._n))
        b = self.batch_size

        def assemble(i):
            idx = order[i * b : (i + 1) * b]
            rows = self.file.gather(np.sort(idx), nthreads=self.nthreads)
            # gather in sorted order for locality, then restore batch order
            rows = rows[np.argsort(np.argsort(idx))]
            h0, w0 = self.file.record_shape[:2]
            return i, rows.reshape((b, h0, w0, -1)).astype(np.float32)

        for i, rows in _prefetched(iter(list(batch_ids)), assemble, self.prefetch):
            xy = preprocess_sr(jnp.asarray(rows), self.model_type, self.residual)
            if self.noise_floor_alpha < 1.0:
                k = jax.random.fold_in(k_noise, i)
                eps = jax.random.normal(k, xy.shape, xy.dtype)
                xy = self.noise_floor_alpha * xy + (1 - self.noise_floor_alpha) * eps
            yield xy

    def epoch(self, key, epoch_idx: int = 0):
        yield from self._batches(key, epoch_idx, range(self.num_batches))

    def epoch_distributed(self, key, epoch_idx: int, num_shards: int,
                          shard_id: int):
        if num_shards == 1:
            yield from self.epoch(key, epoch_idx)
            return
        assert 0 <= shard_id < num_shards
        num_groups = self.num_batches // num_shards
        assert num_groups > 0, (
            f"{self.num_batches} batches per epoch is fewer than the "
            f"{num_shards} hosts"
        )
        ids = [g * num_shards + shard_id for g in range(num_groups)]
        yield from self._batches(key, epoch_idx, ids)

    def close(self):
        self.file.close()


class PrefetchingEpochLoader:
    """Double-buffered host-side epoch feeder: a background thread assembles
    the NEXT batch (native gather) while the device computes on the current
    one — the role tf.data's prefetch plays in the reference
    (conv_cINN.py:328-329)."""

    def __init__(self, file: NativeRecordFile, batch_size: int):
        self.file = file
        self.batch_size = batch_size

    def epoch(self, order: np.ndarray):
        import queue

        order = np.asarray(order, np.int64)
        nb = len(order) // self.batch_size
        q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()

        def worker():
            for i in range(nb):
                idx = order[i * self.batch_size : (i + 1) * self.batch_size]
                batch = self.file.gather(idx)
                # bounded put so an abandoned generator (consumer breaks out
                # of the epoch early) can't leave this thread blocked forever
                # pinning the batch buffers and the open file
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # unblock a worker waiting on a full queue, then reap it
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
