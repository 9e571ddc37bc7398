"""Native maskops (C++/ctypes) vs pure-Python RLE decoding."""

import numpy as np
import pytest

from tpupose.native import (
    load_maskops,
    rle_counts_to_mask_native,
    rle_decode_native,
)


def _mask_to_counts(mask: np.ndarray) -> np.ndarray:
    """Encode a mask as column-major alternating run lengths (0-run
    first)."""
    flat = mask.T.reshape(-1)
    change = np.flatnonzero(np.diff(flat))
    counts = np.diff(np.concatenate([[0], change + 1, [flat.size]]))
    if flat[0] == 1:
        counts = np.concatenate([[0], counts])
    return counts


def _leb_encode(counts) -> str:
    """COCO compressed-RLE char encoding (inverse of the decoders)."""
    out = []
    cl = list(map(int, counts))
    for i, x in enumerate(cl):
        if i > 2:
            x = x - cl[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (c & 0x10)) \
                and not (x == -1 and (c & 0x10))
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


@pytest.fixture(scope="module")
def lib():
    lib = load_maskops()
    if lib is None:
        pytest.skip("g++ unavailable; native maskops not built")
    return lib


def test_counts_roundtrip(lib):
    rng = np.random.RandomState(0)
    for trial in range(3):
        h, w = rng.randint(5, 80), rng.randint(5, 80)
        mask = (rng.rand(h, w) < 0.3).astype(np.uint8)
        counts = _mask_to_counts(mask)
        out = rle_counts_to_mask_native(counts, h, w)
        assert out is not None
        np.testing.assert_array_equal(out, mask)


def test_compressed_string_native_vs_python(lib, monkeypatch):
    import tpupose.native as native_mod
    from tpupose.data import coco_json

    rng = np.random.RandomState(1)
    h, w = 37, 53
    mask = (rng.rand(h, w) < 0.25).astype(np.uint8)
    s = _leb_encode(_mask_to_counts(mask))

    native = rle_decode_native(s, h, w)
    assert native is not None
    monkeypatch.setattr(native_mod, "rle_decode_native", lambda *a: None)
    python = coco_json.decode_compressed_rle(s, h, w)
    np.testing.assert_array_equal(native, python)
    np.testing.assert_array_equal(native, mask)


def test_malformed_string_returns_none(lib):
    # chr(0x20 + 48) sets the continuation flag with no following byte ->
    # graceful failure, not a crash.
    assert rle_decode_native(chr(0x20 + 48), 4, 4) is None
    # counts overflowing the mask area also fail cleanly
    assert rle_counts_to_mask_native([100], 4, 4) is None
