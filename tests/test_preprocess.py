"""Raw-format readers + converters: round-trip synthetic NRRD/NIfTI files
through the pure-numpy readers and the LA/ACDC conversion pipelines."""

import gzip
import os
import struct

import h5py
import numpy as np
import pytest

from bcp_tpu.data import preprocess


def write_nrrd(path, array, encoding="raw"):
    """Minimal NRRD writer for tests (sizes fastest-first like pynrrd)."""
    dtype_name = {np.dtype(np.uint8): "uint8",
                  np.dtype(np.int16): "short",
                  np.dtype(np.float32): "float"}[array.dtype]
    payload = np.asfortranarray(array).tobytes(order="F")
    if encoding == "gzip":
        payload = gzip.compress(payload)
    with open(path, "wb") as f:
        f.write(b"NRRD0004\n")
        f.write(f"type: {dtype_name}\n".encode())
        f.write(f"dimension: {array.ndim}\n".encode())
        f.write(("sizes: " + " ".join(map(str, array.shape))
                 + "\n").encode())
        f.write(f"encoding: {encoding}\n".encode())
        f.write(b"endian: little\n\n")
        f.write(payload)


def write_nifti(path, array):
    """Minimal NIfTI-1 writer for tests; array given in (x, y, z)."""
    hdr = bytearray(352)
    struct.pack_into("<i", hdr, 0, 348)
    dim = [array.ndim] + list(array.shape) + [1] * (7 - array.ndim)
    struct.pack_into("<8h", hdr, 40, *dim)
    datatype = {np.dtype(np.uint8): 2, np.dtype(np.int16): 4,
                np.dtype(np.float32): 16}[array.dtype]
    struct.pack_into("<h", hdr, 70, datatype)
    struct.pack_into("<h", hdr, 72, array.dtype.itemsize * 8)
    struct.pack_into("<f", hdr, 108, 352.0)   # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)     # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)     # scl_inter
    hdr[344:348] = b"n+1\x00"
    data = np.asfortranarray(array).tobytes(order="F")
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wb") as f:
        f.write(bytes(hdr) + data)


@pytest.mark.parametrize("encoding", ["raw", "gzip"])
def test_nrrd_roundtrip(tmp_path, encoding):
    arr = np.random.default_rng(0).integers(
        0, 255, size=(7, 6, 5)).astype(np.uint8)
    p = str(tmp_path / "x.nrrd")
    write_nrrd(p, arr, encoding)
    got, header = preprocess.read_nrrd(p)
    np.testing.assert_array_equal(got, arr)


def test_nifti_roundtrip(tmp_path):
    arr = np.random.default_rng(1).normal(size=(6, 5, 4)).astype(np.float32)
    p = str(tmp_path / "x.nii.gz")
    write_nifti(p, arr)
    got = preprocess.read_nifti(p)
    # reader returns (z, y, x) like sitk.GetArrayFromImage
    np.testing.assert_allclose(got, arr.transpose(2, 1, 0), rtol=1e-6)


def test_library_write_nifti_roundtrip(tmp_path):
    """The package's own writer (used by the eval CLIs' --save_result)
    must invert the package reader exactly."""
    arr = np.random.default_rng(2).normal(size=(5, 6, 7)).astype(np.float32)
    p = str(tmp_path / "y.nii.gz")
    preprocess.write_nifti(p, arr, spacing=(1.0, 1.0, 10.0))
    np.testing.assert_allclose(preprocess.read_nifti(p), arr, rtol=1e-6)
    # non-float input follows the reference's .astype(np.float32) dumps
    lab = np.random.default_rng(3).integers(0, 2, size=(4, 4, 3))
    p2 = str(tmp_path / "lab.nii")
    preprocess.write_nifti(p2, lab.astype(np.float32))
    np.testing.assert_array_equal(preprocess.read_nifti(p2), lab)


def test_convert_la(tmp_path):
    root = str(tmp_path)
    case_dir = os.path.join(root, "2018LA_Seg_Training Set", "case0")
    os.makedirs(case_dir)
    rng = np.random.default_rng(2)
    img = rng.normal(size=(160, 160, 100)).astype(np.float32)
    lab = np.zeros((160, 160, 100), np.uint8)
    lab[60:100, 60:100, 40:70] = 255
    write_nrrd(os.path.join(case_dir, "lgemri.nrrd"), img)
    write_nrrd(os.path.join(case_dir, "laendo.nrrd"), lab)
    n = preprocess.convert_la(root, seed=0)
    assert n == 1
    with h5py.File(os.path.join(case_dir, "mri_norm2.h5")) as f:
        image, label = f["image"][:], f["label"][:]
    assert set(np.unique(label)) <= {0, 1}
    assert label.sum() == (lab == 255).sum()     # crop keeps whole label
    assert abs(float(img.mean())) >= 0           # z-scored crop exists
    assert image.ndim == 3


def test_convert_acdc(tmp_path):
    image_dir = os.path.join(str(tmp_path), "image")
    os.makedirs(image_dir)
    rng = np.random.default_rng(3)
    vol = rng.normal(size=(32, 32, 5)).astype(np.float32)  # (x, y, z)
    lab = (vol > 0.5).astype(np.uint8)
    write_nifti(os.path.join(image_dir, "patient001.nii.gz"), vol)
    label_dir = image_dir.replace("image", "label")
    os.makedirs(label_dir, exist_ok=True)
    write_nifti(os.path.join(label_dir, "patient001_gt.nii.gz"), lab)
    out = os.path.join(str(tmp_path), "slices")
    n = preprocess.convert_acdc(image_dir, out)
    assert n == 5                                 # z slices
    with h5py.File(os.path.join(out, "patient001_slice_0.h5")) as f:
        sl = f["image"][:]
        assert sl.shape == (32, 32)
        assert 0.0 <= sl.min() and sl.max() <= 1.0
