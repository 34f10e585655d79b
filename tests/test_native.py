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
    """Round-trips against tests/lzw_ref.tiff_lzw_encode — which is itself
    pinned to libtiff by TestLZWOracle below, so these are no longer
    self-referential."""

    @staticmethod
    def _tiff_lzw_encode(data: bytes) -> bytes:
        from tests.lzw_ref import tiff_lzw_encode

        return tiff_lzw_encode(data)

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


class TestLZWOracle:
    """Independent-codec conformance: our decoder vs libtiff's encoder and
    libtiff's decoder vs our encoder (via Pillow, which wraps libtiff).

    This is the test class the round-2 review demanded: the previous suite
    round-tripped decoder against a same-file encoder sharing an early-change
    off-by-one, so both were green while rejecting / being rejected by real
    libtiff streams. Reference capability: aicsimage/io/czifile.py:1181-1184
    decodes ZISRAW compression-2 subblocks with tifffile's TIFF-LZW.
    """

    @staticmethod
    def _payloads(rng):
        return {
            # compressible: long repeated strings, KwKwK cases
            "compressible": (b"TOBEORNOTTOBEORTOBEORNOT" * 200)[:4096],
            # incompressible 64 KiB: forces 10/11/12-bit codes and an
            # encoder-side table clear mid-stream
            "random": rng.integers(0, 256, 256 * 256, dtype=np.uint8).tobytes(),
            # constant: maximal string growth
            "constant": b"\xab" * 16384,
        }

    def test_decode_libtiff_stream(self, cdll, rng):
        """native.lzw_decode must byte-exactly decode genuine libtiff output."""
        pytest.importorskip("PIL")
        from tests.lzw_ref import pillow_lzw_strips

        for name, data in self._payloads(rng).items():
            h = len(data) // 256
            strips, rows = pillow_lzw_strips(data, 256, h)
            row_bytes = 256 * rows
            dec = b"".join(
                native.lzw_decode(s, min(row_bytes, len(data) - i * row_bytes))
                for i, s in enumerate(strips)
            )
            assert dec == data, f"payload {name!r}: native decode != libtiff input"

    def test_pillow_decodes_our_encoder(self, rng):
        """libtiff must byte-exactly decode the test encoder's streams (so the
        round-trip tests above are anchored to a conformant codec)."""
        pytest.importorskip("PIL")
        import io

        from PIL import Image

        from tests.lzw_ref import tiff_lzw_encode, wrap_tiff_gray8

        for name, data in self._payloads(rng).items():
            h = len(data) // 256
            tif = wrap_tiff_gray8(tiff_lzw_encode(data), 256, h)
            out = np.asarray(Image.open(io.BytesIO(tif))).tobytes()
            assert out == data, f"payload {name!r}: libtiff decode != our encoder input"
