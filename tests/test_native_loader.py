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
