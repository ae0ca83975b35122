"""TFRecord-compat reader vs real TF-written files (the reference's dataset
format, create_tfrecords.py:197-250)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from arl_conditional_normalizing_flows_tpu.data import tfrecord_compat as tfc


def _write_reference_style_tfrecord(path, imgs, one_hot):
    """Serialize exactly like create_tfrecords.py:_convert_to_example."""
    with tf.io.TFRecordWriter(str(path)) as w:
        for img, lab in zip(imgs, one_hot):
            h, wd, d = img.shape
            feats = {
                "img": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[img.tobytes()])
                ),
                "height": tf.train.Feature(int64_list=tf.train.Int64List(value=[h])),
                "width": tf.train.Feature(int64_list=tf.train.Int64List(value=[wd])),
                "depth": tf.train.Feature(int64_list=tf.train.Int64List(value=[d])),
                "label": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[lab.tobytes()])
                ),
            }
            ex = tf.train.Example(features=tf.train.Features(feature=feats))
            w.write(ex.SerializeToString())


@pytest.fixture
def ref_tfrecord(tmp_path, rng):
    imgs = rng.uniform(0, 1, size=(7, 6, 6, 1)).astype(np.float32)
    one_hot = np.zeros((7, 4), np.float32)
    one_hot[:, 2] = 1.0
    path = tmp_path / "x_train_test_c2.tfrecords"
    _write_reference_style_tfrecord(path, imgs, one_hot)
    return str(path), imgs, one_hot


def test_read_reference_tfrecords(ref_tfrecord):
    path, imgs, one_hot = ref_tfrecord
    got_imgs, got_labels = tfc.read_reference_tfrecords(path, verify=True)
    np.testing.assert_array_equal(got_imgs, imgs)
    np.testing.assert_array_equal(got_labels, one_hot)


def test_crc32c_matches_tf_masking(ref_tfrecord):
    # verify=True above already checks frame CRCs against TF's writer;
    # additionally spot-check the crc32c primitive on a known vector
    assert tfc.crc32c(b"123456789") == 0xE3069283


def test_convert_to_cnfrec(ref_tfrecord, tmp_path):
    path, imgs, _ = ref_tfrecord
    out = str(tmp_path / "c2.cnfrec")
    shape = tfc.convert_to_cnfrec(path, out)
    assert tuple(shape) == imgs.shape
    from arl_conditional_normalizing_flows_tpu.data import records

    back = records.read_records(out, verify=True)
    np.testing.assert_array_equal(np.asarray(back), imgs)
    assert records.read_header(out)["label"] == 2


def test_write_reference_tfrecords_roundtrip(tmp_path):
    """Our TF-free writer -> our CRC-verifying reader."""
    rng = np.random.default_rng(3)
    imgs = rng.random((5, 4, 4, 2), np.float32)
    lab = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 5)]
    path = str(tmp_path / "w.tfrecords")
    n = tfc.write_reference_tfrecords(path, imgs, lab)
    assert n == 5
    rimgs, rlab = tfc.read_reference_tfrecords(path, verify=True)
    np.testing.assert_array_equal(rimgs, imgs)
    np.testing.assert_array_equal(rlab, lab)


def test_written_tfrecords_readable_by_tensorflow(tmp_path):
    """Files produced by the TF-free writer parse through the REAL
    tf.data.TFRecordDataset pipeline exactly as the reference's
    _parse_example (conv_cINN_base_functions.py:26-65) expects."""
    rng = np.random.default_rng(4)
    imgs = rng.random((4, 6, 6, 1), np.float32)
    lab = np.eye(2, dtype=np.float32)[rng.integers(0, 2, 4)]
    path = str(tmp_path / "interop.tfrecords")
    tfc.write_reference_tfrecords(path, imgs, lab)

    feature_desc = {
        "img": tf.io.FixedLenFeature([], tf.string),
        "height": tf.io.FixedLenFeature([], tf.int64),
        "width": tf.io.FixedLenFeature([], tf.int64),
        "depth": tf.io.FixedLenFeature([], tf.int64),
        "label": tf.io.FixedLenFeature([], tf.string),
    }
    got = []
    for raw in tf.data.TFRecordDataset(path):
        ex = tf.io.parse_single_example(raw, feature_desc)
        img = tf.reshape(
            tf.io.decode_raw(ex["img"], tf.float32),
            (ex["height"], ex["width"], ex["depth"]),
        )
        got.append((img.numpy(), tf.io.decode_raw(ex["label"], tf.float32).numpy()))
    np.testing.assert_array_equal(np.stack([g[0] for g in got]), imgs)
    np.testing.assert_array_equal(np.stack([g[1] for g in got]), lab)
