"""Native array-record dataset format (the TPU-side replacement for the
reference's TFRecords, create_tfrecords.py:1-409).

The reference serializes every image as a protobuf Example with raw-bytes
features and reads them back with a per-record parse op
(conv_cINN_base_functions.py:26-65) — useless work for fixed-shape tensors.
This format stores ONE contiguous, aligned ndarray blob per file plus a JSON
header, so the reader is a zero-copy ``np.memmap`` and a whole epoch can be
fed to the device with no per-record decode. Layout:

    [8B magic "CNFREC01"][8B LE header length][header JSON][pad to 64][blob]

Header keys: dtype, shape (per-record), count, label (optional class id),
extra (free-form dict). A per-file CRC32 of the blob supports integrity
verification (the reference's verify step, create_tfrecords.py:366-400).

Files follow the reference's dataset conventions (create_tfrecords.py:54-67):
one combined file for SR training, one file per class for class-conditional
training (class purity of batches is preserved downstream).
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Dict, List, Optional, Sequence

import numpy as np

MAGIC = b"CNFREC01"
_ALIGN = 64


def write_records(
    path: str,
    array: np.ndarray,
    *,
    label: Optional[int] = None,
    extra: Optional[Dict] = None,
    with_crc: bool = True,
):
    """Write (count, *record_shape) ``array`` as one record file."""
    array = np.ascontiguousarray(array)
    # one zero-copy view for both CRC and write (tobytes() would materialize
    # a full copy of the blob each time — 2x peak memory on big datasets)
    blob = memoryview(array).cast("B")
    header = {
        "dtype": array.dtype.str,
        "shape": list(array.shape[1:]),
        "count": int(array.shape[0]),
        "label": label,
        "extra": extra or {},
        "crc32": zlib.crc32(blob) if with_crc else None,
    }
    hbytes = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(len(hbytes).to_bytes(8, "little"))
        f.write(hbytes)
        pos = len(MAGIC) + 8 + len(hbytes)
        f.write(b"\0" * (-pos % _ALIGN))
        f.write(blob)


def read_header(path: str) -> Dict:
    with open(path, "rb") as f:
        magic = f.read(8)
        assert magic == MAGIC, f"{path}: not a CNFREC01 file"
        hlen = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(hlen).decode())
    header["_data_offset"] = (8 + 8 + hlen) + (-(8 + 8 + hlen) % _ALIGN)
    return header


def read_records(path: str, *, mmap: bool = True, verify: bool = False) -> np.ndarray:
    """Load the record blob: (count, *record_shape). Zero-copy by default."""
    header = read_header(path)
    shape = (header["count"], *header["shape"])
    dtype = np.dtype(header["dtype"])
    if mmap:
        arr = np.memmap(
            path, dtype=dtype, mode="r", offset=header["_data_offset"], shape=shape
        )
    else:
        with open(path, "rb") as f:
            f.seek(header["_data_offset"])
            arr = np.frombuffer(f.read(), dtype=dtype).reshape(shape)
    if verify and header.get("crc32") is not None:
        crc = zlib.crc32(np.ascontiguousarray(arr).tobytes())
        assert crc == header["crc32"], f"{path}: CRC mismatch"
    return arr


def class_file(directory: str, split: str, label: int) -> str:
    """Per-class file naming (the reference's one-file-per-class layout for
    class-conditional training, create_tfrecords.py:64-67)."""
    return os.path.join(directory, f"{split}_class{label}.cnfrec")


def combined_file(directory: str, split: str) -> str:
    return os.path.join(directory, f"{split}_combined.cnfrec")


def write_class_sorted_dataset(
    directory: str,
    split: str,
    images: np.ndarray,
    labels: np.ndarray,
    which_classes: Sequence[int],
    combined: bool,
):
    """Build the dataset files from (images, labels) — the offline stage the
    reference performs in create_tfrecords.py:295-364 (sort by class, then
    one combined file or one file per class)."""
    os.makedirs(directory, exist_ok=True)
    images = np.asarray(images, np.float32)
    if images.ndim == 3:
        images = images[..., None]
    written = []
    if combined:
        mask = np.isin(labels, which_classes)
        path = combined_file(directory, split)
        write_records(path, images[mask], extra={"classes": list(map(int, which_classes))})
        written.append(path)
    else:
        for c in which_classes:
            path = class_file(directory, split, int(c))
            write_records(path, images[labels == c], label=int(c))
            written.append(path)
    return written


def verify_records(paths: Sequence[str]) -> Dict[str, Dict]:
    """CRC + shape sanity over a set of files (analogue of
    create_tfrecords.py:366-400's visual verify, minus matplotlib)."""
    out = {}
    for p in paths:
        arr = read_records(p, verify=True)
        out[p] = {
            "count": arr.shape[0],
            "shape": arr.shape[1:],
            "min": float(arr.min()) if arr.size else None,
            "max": float(arr.max()) if arr.size else None,
        }
    return out
