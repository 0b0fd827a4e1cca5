"""Native mmap safetensors reader vs the Python package."""

import numpy as np
import pytest

from qdm_tpu.utils.native_loader import get_lib, load_file, NativeSafetensors


@pytest.fixture(scope="module")
def st_file(tmp_path_factory):
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("st")
    rng = np.random.default_rng(0)
    tensors = {
        "a|kernel": rng.standard_normal((64, 32)).astype(np.float32),
        "b|bias": rng.standard_normal((7,)).astype(np.float32),
        "c|codes": rng.integers(-128, 127, (16, 16)).astype(np.int8),
        "d|ids": rng.integers(0, 1000, (3, 5)).astype(np.int64),
    }
    p = str(d / "t.safetensors")
    save_file(tensors, p, metadata={"framework": "qdm_tpu"})
    return p, tensors


def test_native_reader_matches(st_file):
    if get_lib() is None:
        pytest.skip("no g++ available")
    path, want = st_file
    got = load_file(path)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])
        assert got[k].dtype == want[k].dtype


def test_native_reader_zero_copy(st_file):
    if get_lib() is None:
        pytest.skip("no g++ available")
    path, want = st_file
    with NativeSafetensors(path) as f:
        assert set(f.keys()) == set(want)
        t = f.tensors(copy=False)
        np.testing.assert_array_equal(t["a|kernel"], want["a|kernel"])


def _write(tmp_path, name, header: bytes, data: bytes = b"",
           hdr_len: int = None):
    import struct

    p = tmp_path / name
    n = len(header) if hdr_len is None else hdr_len
    p.write_bytes(struct.pack("<Q", n) + header + data)
    return str(p)


def test_native_reader_rejects_corrupt_files(tmp_path):
    """Untrusted-header hardening: every malformed file must fail st_open
    cleanly (OSError) instead of handing Python an OOB pointer."""
    if get_lib() is None:
        pytest.skip("no g++ available")

    cases = {
        # header length wraps 8 + hdr_len past UINT64_MAX
        "wrap.safetensors": _write(
            tmp_path, "w.st", b"{}", hdr_len=2**64 - 4),
        # header length exceeds the file
        "oversize.safetensors": _write(tmp_path, "o.st", b"{}", hdr_len=1 << 40),
        # data_offsets end beyond the data section
        "oob.safetensors": _write(
            tmp_path, "oob.st",
            b'{"t":{"dtype":"F32","shape":[4],"data_offsets":[0,16]}}',
            data=b"\0" * 8),
        # begin > end
        "inverted.safetensors": _write(
            tmp_path, "inv.st",
            b'{"t":{"dtype":"F32","shape":[1],"data_offsets":[8,4]}}',
            data=b"\0" * 16),
        # nbytes disagrees with shape x dtype (frombuffer would OOB-read)
        "mismatch.safetensors": _write(
            tmp_path, "mm.st",
            b'{"t":{"dtype":"F32","shape":[100],"data_offsets":[0,8]}}',
            data=b"\0" * 8),
        # negative shape dim
        "negshape.safetensors": _write(
            tmp_path, "ns.st",
            b'{"t":{"dtype":"F32","shape":[-4],"data_offsets":[0,8]}}',
            data=b"\0" * 8),
        # shape product overflows uint64
        "overflow.safetensors": _write(
            tmp_path, "of.st",
            b'{"t":{"dtype":"F32","shape":[4294967296,4294967296,16],'
            b'"data_offsets":[0,8]}}',
            data=b"\0" * 8),
    }
    for label, path in cases.items():
        with pytest.raises(OSError):
            NativeSafetensors(path), label


def test_native_reader_accepts_wellformed_after_hardening(tmp_path):
    if get_lib() is None:
        pytest.skip("no g++ available")
    path = _write(
        tmp_path, "ok.st",
        b'{"t":{"dtype":"F32","shape":[2],"data_offsets":[0,8]}}',
        data=np.asarray([1.5, -2.5], np.float32).tobytes())
    got = load_file(path)
    np.testing.assert_array_equal(got["t"], np.asarray([1.5, -2.5], np.float32))
