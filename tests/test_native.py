"""Native C++ host ops: build, crop/flip parity with numpy, LZW decode."""

import numpy as np
import pytest

from repmode_tpu import native
from repmode_tpu.data.sampler import apply_crop_flip


@pytest.fixture(scope="module")
def cdll():
    lib = native.lib()
    if lib is None:
        pytest.skip("native lib unavailable (no g++?)")
    return lib


class TestCropFlip:
    def test_matches_numpy(self, cdll, rng):
        patch = (4, 6, 8)
        volumes, starts, flips = [], [], []
        for i in range(5):
            shape = (8 + i, 12, 16)
            s = rng.standard_normal(shape).astype(np.float32)
            t = rng.standard_normal(shape).astype(np.float32)
            volumes.append((s, t))
            starts.append([
                rng.integers(0, d - p + 1) for d, p in zip(shape, patch)
            ])
            flips.append(rng.integers(0, 2, 3))
        starts = np.asarray(starts, np.int64)
        flips = np.asarray(flips, np.uint8)

        out = native.crop_flip_batch(volumes, starts, flips, patch)
        assert out is not None
        sig, tgt = out
        for i, (s, t) in enumerate(volumes):
            np.testing.assert_array_equal(
                sig[i], apply_crop_flip(s, starts[i], flips[i], patch)
            )
            np.testing.assert_array_equal(
                tgt[i], apply_crop_flip(t, starts[i], flips[i], patch)
            )

    def test_sampler_native_matches_numpy_path(self):
        from repmode_tpu.data.sampler import PatchSampler
        from repmode_tpu.data.synthetic import synthetic_store

        store = synthetic_store(("a", "b"), volumes_per_task=2, vol_shape=(8, 16, 16))
        kw = dict(batch_size=3, patch_size=(4, 8, 8), seed=11, prefetch=0)
        s_native = PatchSampler(store, use_native=True, **kw)
        s_numpy = PatchSampler(store, use_native=False, **kw)
        for b1, b2 in zip(s_native.epoch(), s_numpy.epoch()):
            np.testing.assert_array_equal(b1["signal"], b2["signal"])
            np.testing.assert_array_equal(b1["target"], b2["target"])
            np.testing.assert_array_equal(b1["task"], b2["task"])


class TestLZW:
    @staticmethod
    def _tiff_lzw_encode(data: bytes) -> bytes:
        """Minimal TIFF-LZW encoder (string-table variant with early change)
        used only to exercise the decoder."""
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        code_bits = 9
        out_bits = []

        def put(code):
            out_bits.extend((code >> (code_bits - 1 - b)) & 1 for b in range(code_bits))

        put(256)  # clear
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
            else:
                put(table[w])
                table[wc] = next_code
                next_code += 1
                # early change: encoder widens at (1<<bits)-1
                if next_code == (1 << code_bits) - 1 and code_bits < 12:
                    code_bits += 1
                if next_code >= 4094:
                    put(256)
                    table = {bytes([i]): i for i in range(256)}
                    next_code = 258
                    code_bits = 9
                w = bytes([ch])
        if w:
            put(table[w])
        put(257)  # eoi
        while len(out_bits) % 8:
            out_bits.append(0)
        by = bytearray()
        for i in range(0, len(out_bits), 8):
            v = 0
            for b in out_bits[i : i + 8]:
                v = (v << 1) | b
            by.append(v)
        return bytes(by)

    @pytest.mark.parametrize("payload", [
        b"",
        b"A",
        b"TOBEORNOTTOBEORTOBEORNOT",
        bytes(range(256)) * 4,
        b"\x00" * 5000,
    ])
    def test_roundtrip(self, cdll, payload):
        enc = self._tiff_lzw_encode(payload)
        dec = native.lzw_decode(enc, max(len(payload), 1))
        assert dec == payload

    def test_random_roundtrip(self, cdll, rng):
        payload = rng.integers(0, 255, 20000).astype(np.uint8).tobytes()
        enc = self._tiff_lzw_encode(payload)
        dec = native.lzw_decode(enc, len(payload))
        assert dec == payload

    def test_malformed_raises(self, cdll):
        with pytest.raises(ValueError):
            native.lzw_decode(b"\xff\xff\xff\xff\xff\xff", 10)
