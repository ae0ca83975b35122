"""Native C++ record loader vs the pure-Python reader."""

import numpy as np
import pytest

from arl_conditional_normalizing_flows_tpu.data import records
from arl_conditional_normalizing_flows_tpu.data import native_loader


@pytest.fixture
def record_file(tmp_path, rng):
    arr = rng.normal(size=(100, 6, 6, 2)).astype(np.float32)
    path = str(tmp_path / "t.cnfrec")
    records.write_records(path, arr, label=1)
    return path, arr


def test_native_available():
    # g++ is in the image; the library must build
    assert native_loader.native_available()


def test_header_and_count(record_file):
    path, arr = record_file
    f = native_loader.NativeRecordFile(path, verify=True)
    assert f.count == 100
    assert f.record_shape == (6, 6, 2)
    assert f.dtype == np.float32
    f.close()


def test_gather_matches_python(record_file, rng):
    path, arr = record_file
    f = native_loader.NativeRecordFile(path)
    idx = rng.integers(0, 100, size=37)
    got = f.gather(idx)
    np.testing.assert_array_equal(got, arr[idx])
    f.close()


def test_gather_multi(tmp_path, rng):
    arrs, files = [], []
    for c in range(3):
        a = rng.normal(size=(20, 4, 4, 1)).astype(np.float32)
        p = str(tmp_path / f"c{c}.cnfrec")
        records.write_records(p, a, label=c)
        arrs.append(a)
        files.append(native_loader.NativeRecordFile(p))
    fid = rng.integers(0, 3, size=50).astype(np.int32)
    idx = rng.integers(0, 20, size=50)
    got = native_loader.gather_multi(files, fid, idx)
    want = np.stack([arrs[f][i] for f, i in zip(fid, idx)])
    np.testing.assert_array_equal(got, want)
    for f in files:
        f.close()


def test_crc_detects_corruption(tmp_path, rng):
    arr = rng.normal(size=(10, 4)).astype(np.float32)
    path = str(tmp_path / "c.cnfrec")
    records.write_records(path, arr)
    # flip a byte in the blob
    with open(path, "r+b") as f:
        f.seek(-1, 2)
        b = f.read(1)
        f.seek(-1, 2)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(IOError):
        native_loader.NativeRecordFile(path, verify=True)


def test_prefetching_epoch_loader(record_file, rng):
    path, arr = record_file
    f = native_loader.NativeRecordFile(path)
    order = rng.permutation(100)
    batches = list(native_loader.PrefetchingEpochLoader(f, 10).epoch(order))
    assert len(batches) == 10
    got = np.concatenate(batches)
    np.testing.assert_array_equal(got, arr[order[:100]])
    f.close()


def test_gather_after_close_raises(record_file):
    path, _ = record_file
    f = native_loader.NativeRecordFile(path)
    f.close()
    with pytest.raises(ValueError, match="closed"):
        f.gather(np.arange(4))
    with pytest.raises(ValueError, match="closed"):
        native_loader.gather_multi([f], np.zeros(2, np.int32), np.arange(2))


def test_prefetch_loader_abandoned_generator_reaps_worker(record_file, rng):
    """Breaking out of an epoch mid-way must not leave the worker thread
    blocked on the bounded queue forever."""
    import threading
    import time

    path, _ = record_file
    f = native_loader.NativeRecordFile(path)
    before = threading.active_count()
    gen = native_loader.PrefetchingEpochLoader(f, 10).epoch(rng.permutation(100))
    next(gen)  # take one batch, abandon the rest
    gen.close()  # triggers GeneratorExit at the yield
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    f.close()


def test_native_crc32c_known_vector_and_python_agreement(rng):
    from arl_conditional_normalizing_flows_tpu.data.tfrecord_compat import (
        _crc32c_tables,
        crc32c,
    )

    assert crc32c(b"123456789") == 0xE3069283  # standard CRC32C test vector
    if native_loader.native_available():
        data = rng.normal(size=1000).astype(np.float32).tobytes()
        # python slice-by-8 fallback agrees with the native kernel
        t0, t1, t2, t3, t4, t5, t6, t7 = _crc32c_tables()
        crc = 0xFFFFFFFF
        n8 = len(data) // 8 * 8
        mv = memoryview(data)
        for i in range(0, n8, 8):
            w = int.from_bytes(mv[i : i + 8], "little") ^ crc
            crc = (
                t7[w & 0xFF] ^ t6[(w >> 8) & 0xFF] ^ t5[(w >> 16) & 0xFF]
                ^ t4[(w >> 24) & 0xFF] ^ t3[(w >> 32) & 0xFF]
                ^ t2[(w >> 40) & 0xFF] ^ t1[(w >> 48) & 0xFF]
                ^ t0[(w >> 56) & 0xFF]
            )
        for b in mv[n8:]:
            crc = t0[(crc ^ b) & 0xFF] ^ (crc >> 8)
        assert (crc ^ 0xFFFFFFFF) == native_loader.crc32c_native(data)


def test_truncated_file_rejected(tmp_path, rng):
    """A file truncated mid-header or mid-blob must fail cnf_open cleanly
    (IOError), not SIGBUS later."""
    arr = rng.normal(size=(20, 4, 4, 2)).astype(np.float32)
    path = str(tmp_path / "t.cnfrec")
    records.write_records(path, arr)
    full = open(path, "rb").read()
    for cut in (12, 20, len(full) - 100):  # header-length, header, blob
        p2 = str(tmp_path / f"cut{cut}.cnfrec")
        with open(p2, "wb") as f:
            f.write(full[:cut])
        if native_loader.native_available():
            with pytest.raises(IOError):
                native_loader.NativeRecordFile(p2)


def test_extra_crc32_key_does_not_shadow_checksum(tmp_path, rng):
    """The header's free-form extra dict may contain a key named crc32; the
    native parser must read the TOP-LEVEL checksum (first-occurrence
    matching read the nested one and failed verification on valid files)."""
    arr = rng.normal(size=(10, 3, 3, 1)).astype(np.float32)
    path = str(tmp_path / "x.cnfrec")
    records.write_records(path, arr, extra={"crc32": 1, "count": 999})
    f = native_loader.NativeRecordFile(path, verify=True)  # must not raise
    assert f.count == 10  # and count must not be shadowed either
    np.testing.assert_array_equal(f.gather(np.arange(10)), arr)
    f.close()


def test_out_of_range_indices_raise(record_file):
    path, _ = record_file
    f = native_loader.NativeRecordFile(path)
    with pytest.raises(IndexError):
        f.gather(np.array([0, 100]))  # count == 100
    with pytest.raises(IndexError):
        f.gather(np.array([-1]))
    with pytest.raises(IndexError):
        native_loader.gather_multi([f], np.zeros(1, np.int32), np.array([100]))
    f.close()


def test_gather_multi_mixed_shapes_rejected(tmp_path, rng):
    a = rng.normal(size=(4, 2, 2, 1)).astype(np.float32)
    b = rng.normal(size=(4, 3, 3, 1)).astype(np.float32)
    pa, pb = str(tmp_path / "a.cnfrec"), str(tmp_path / "b.cnfrec")
    records.write_records(pa, a)
    records.write_records(pb, b)
    fa, fb = native_loader.NativeRecordFile(pa), native_loader.NativeRecordFile(pb)
    with pytest.raises(ValueError, match="identical record shapes"):
        native_loader.gather_multi([fa, fb], np.array([1], np.int32), np.array([0]))
    fa.close()
    fb.close()


# ---------------------------------------------------------------------------
# streaming sources (bounded-memory records path)
# ---------------------------------------------------------------------------


def _class_records(tmp_path, batch=8, per_class=20, size=8):
    from arl_conditional_normalizing_flows_tpu.data.images import synthetic_digits

    imgs, labels = synthetic_digits(num_per_class=per_class, num_classes=2, size=size)
    records.write_class_sorted_dataset(
        str(tmp_path), "train", imgs, labels, [0, 1], combined=False
    )
    return imgs, labels


def test_streaming_class_source_matches_in_ram(tmp_path):
    """Same key -> numerically identical batch stream as
    ClassConditionalSource (schedule parity is the design contract)."""
    import jax

    from arl_conditional_normalizing_flows_tpu.data.images import (
        ClassConditionalSource,
    )

    imgs, labels = _class_records(tmp_path)
    ram = ClassConditionalSource(imgs, labels, [0, 1], 8, use_logits=True)
    stream = native_loader.StreamingClassSource(
        [str(tmp_path / "train_class0.cnfrec"),
         str(tmp_path / "train_class1.cnfrec")],
        [0, 1], 8, use_logits=True,
    )
    assert stream.num_batches == ram.num_batches
    assert stream.xy_shape == ram.xy_shape
    key = jax.random.PRNGKey(5)
    a = [np.asarray(b) for b in ram.epoch(key, 3)]
    b = [np.asarray(x) for x in stream.epoch(key, 3)]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-6)
    stream.close()


def test_streaming_class_source_distributed_matches(tmp_path):
    import jax

    from arl_conditional_normalizing_flows_tpu.data.images import (
        ClassConditionalSource,
    )

    imgs, labels = _class_records(tmp_path, per_class=32)
    ram = ClassConditionalSource(imgs, labels, [0, 1], 8, use_logits=True)
    stream = native_loader.StreamingClassSource(
        [str(tmp_path / "train_class0.cnfrec"),
         str(tmp_path / "train_class1.cnfrec")],
        [0, 1], 8, use_logits=True,
    )
    key = jax.random.PRNGKey(9)
    assert stream.slot_groups(2) == ram.slot_groups(2)
    for shard in range(2):
        a = [np.asarray(x) for x in ram.epoch_distributed(key, 1, 2, shard)]
        b = [np.asarray(x) for x in stream.epoch_distributed(key, 1, 2, shard)]
        assert len(a) == len(b) > 0
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, atol=2e-6)
    stream.close()


def test_streaming_sr_source_matches_in_ram(tmp_path):
    import jax

    from arl_conditional_normalizing_flows_tpu.data.images import (
        SRSource,
        synthetic_digits,
    )

    imgs, _ = synthetic_digits(num_per_class=16, num_classes=2, size=8)
    records.write_class_sorted_dataset(
        str(tmp_path), "train", imgs, np.zeros(len(imgs), np.int32), [0],
        combined=True,
    )
    ram = SRSource(imgs, "SR2,1", 8)
    stream = native_loader.StreamingSRSource(
        str(tmp_path / "train_combined.cnfrec"), "SR2,1", 8
    )
    assert stream.num_batches == ram.num_batches
    assert stream.xy_shape == ram.xy_shape
    key = jax.random.PRNGKey(2)
    a = [np.asarray(b) for b in ram.epoch(key, 0)]
    b = [np.asarray(x) for x in stream.epoch(key, 0)]
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-6)
    # SR4,2 halves the io shape
    s42 = native_loader.StreamingSRSource(
        str(tmp_path / "train_combined.cnfrec"), "SR4,2", 8
    )
    assert s42.xy_shape == (4, 4, 2)
    stream.close()
    s42.close()


def test_logitify_np_matches_jnp():
    import jax.numpy as jnp

    from arl_conditional_normalizing_flows_tpu.ops.logit import (
        logitify,
        logitify_np,
    )

    x = np.random.default_rng(0).uniform(0, 1, size=(4, 5, 5, 1)).astype(np.float32)
    np.testing.assert_allclose(
        logitify_np(x), np.asarray(logitify(jnp.asarray(x))), atol=1e-6
    )
