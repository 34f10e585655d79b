"""CZI reader: round-trip against a spec-conformant writer.

We synthesize a minimal ZISRAW file (header + metadata + subblocks +
directory, 32-byte aligned segments) and verify CziFile/CziVolumeReader
recover the exact pixel data, axes, metadata, and channel volumes — covering
the format features the Allen Institute corpus uses (uncompressed Gray16,
CZYX0 dimension entries, multi-subblock assembly).
"""

import struct

import numpy as np
import pytest

from repmode_tpu.data.czi import CziFile, CziVolumeReader


def _segment(sid: bytes, payload: bytes, min_payload: int = 0) -> bytes:
    used = len(payload)
    payload = payload + b"\x00" * max(0, min_payload - used)
    alloc = (len(payload) + 31) // 32 * 32
    payload = payload + b"\x00" * (alloc - len(payload))
    return struct.pack("<16sqq", sid, alloc, used) + payload


def _dir_entry(pixel_type: int, file_position: int, dims, compression: int = 0) -> bytes:
    out = b"DV"
    out += struct.pack("<i", pixel_type)
    out += struct.pack("<q", file_position)
    out += struct.pack("<i", 0)  # file_part
    out += struct.pack("<i", compression)
    out += b"\x00" * 6           # pyramid_type + spare
    out += struct.pack("<i", len(dims))
    for (name, start, size, stored) in dims:
        out += struct.pack("<4sii f i".replace(" ", ""), name.encode(), start, size, 0.0, stored)
    return out


def write_czi(path, data: np.ndarray, axes="CZYX", xml=b"<ImageDocument><Metadata><Scaling><Items><Distance Id=\"X\"><Value>1.08e-07</Value></Distance></Items></Scaling></Metadata></ImageDocument>", compression=0):
    """data: (C, Z, Y, X) uint16; one subblock per channel.

    compression=2 stores each subblock TIFF-LZW-compressed (ZISRAW
    compression type 2), using the libtiff-verified test encoder."""
    c, z, y, x = data.shape
    segments = []
    pos = 0

    # file header segment: 512-byte payload
    header_payload_size = 512
    file_header_total = 32 + header_payload_size

    # metadata after header
    meta_payload = struct.pack("<ii", len(xml), 0) + b"\x00" * 248 + xml
    meta_seg = _segment(b"ZISRAWMETADATA", meta_payload)
    metadata_position = file_header_total

    # subblocks: one per channel (full CZYX block per channel here)
    sub_positions = []
    sub_segs = []
    pos = metadata_position + len(meta_seg)
    entries = []
    for ci in range(c):
        block = data[ci]  # (Z, Y, X)
        # On-disk dimension entries are fastest-axis-first (X first), the
        # reverse of the C-contiguous data order — matching real Zeiss files
        # and the reference parser's reversal (czifile.py:650-652).
        dims = [("X", 0, x, x), ("Y", 0, y, y), ("Z", 0, z, z), ("C", ci, 1, 1)]
        entry = _dir_entry(1, pos, dims, compression)
        raw = block.astype("<u2").tobytes()
        if compression == 2:
            from tests.lzw_ref import tiff_lzw_encode

            raw = tiff_lzw_encode(raw)
        elif compression != 0:
            raise ValueError(f"writer does not support compression={compression}")
        head = struct.pack("<iiq", 0, 0, len(raw))  # metadata/attachment/data sizes
        inline = head + entry
        # data begins at max(256, entry_size+16) from payload start
        entry_size = 32 + 20 * len(dims)
        pad_to = max(256, entry_size + 16)
        inline = inline + b"\x00" * (pad_to - len(inline))
        seg = _segment(b"ZISRAWSUBBLOCK", inline + raw)
        sub_positions.append(pos)
        entries.append((entry, pos))
        sub_segs.append(seg)
        pos += len(seg)

    # directory
    dir_payload = struct.pack("<i", c) + b"\x00" * 124
    for entry, p in entries:
        dir_payload += entry
    dir_seg = _segment(b"ZISRAWDIRECTORY", dir_payload)
    directory_position = pos

    # file header
    hdr = struct.pack("<iiii", 1, 0, 0, 0)
    hdr += b"\x00" * 32          # GUIDs
    hdr += struct.pack("<i", 0)  # file_part
    hdr += struct.pack("<q", directory_position)
    hdr += struct.pack("<q", metadata_position)
    hdr += struct.pack("<i", 0)  # update_pending
    hdr += struct.pack("<q", 0)  # attachment dir
    hdr += b"\x00" * (header_payload_size - len(hdr))
    hdr_seg = struct.pack("<16sqq", b"ZISRAWFILE", header_payload_size, header_payload_size) + hdr

    with open(path, "wb") as f:
        f.write(hdr_seg)
        f.write(meta_seg)
        for seg in sub_segs:
            f.write(seg)
        f.write(dir_seg)


@pytest.fixture
def czi_path(tmp_path, rng):
    data = rng.integers(0, 65535, size=(2, 4, 8, 10)).astype(np.uint16)
    path = str(tmp_path / "test.czi")
    write_czi(path, data)
    return path, data


def test_axes_and_shape(czi_path):
    path, data = czi_path
    with CziFile(path) as czi:
        assert czi.axes == "CZYX0"
        assert czi.shape() == (2, 4, 8, 10, 1)


def test_asarray_roundtrip(czi_path):
    path, data = czi_path
    with CziFile(path) as czi:
        arr = czi.asarray()
    np.testing.assert_array_equal(arr[..., 0], data)


def test_metadata_xml(czi_path):
    path, _ = czi_path
    with CziFile(path) as czi:
        meta = czi.metadata()
    assert meta is not None
    assert meta.tag == "ImageDocument"


def test_volume_reader(czi_path):
    path, data = czi_path
    r = CziVolumeReader(path)
    for c in range(2):
        np.testing.assert_array_equal(r.get_volume(c), data[c])
    assert r.get_size("Z") == 4
    scales = r.get_scales()
    np.testing.assert_allclose(scales["x"], 0.108)


def test_unsupported_compression_raises(tmp_path, czi_path):
    """Unknown compression -> loud NotImplementedError, not silent junk."""
    path, data = czi_path
    blob = bytearray(open(path, "rb").read())
    idx = blob.find(b"DV")
    while idx != -1:
        struct.pack_into("<i", blob, idx + 18, 4)  # 4 = JPEG-XR (unsupported)
        idx = blob.find(b"DV", idx + 2)
    bad = tmp_path / "bad.czi"
    bad.write_bytes(bytes(blob))
    with CziFile(str(bad)) as czi:
        with pytest.raises(NotImplementedError):
            czi.asarray()


def test_lzw_compressed_czi_roundtrip(tmp_path, rng):
    """A genuinely LZW-compressed synthetic CZI decodes end-to-end through
    CziFile.asarray() (ZISRAW compression 2; ref czifile.py:1181-1184). The
    encoder used here is pinned to libtiff by test_native.TestLZWOracle."""
    from repmode_tpu import native

    if native.lib() is None:
        pytest.skip("native lib unavailable")
    data = rng.integers(0, 65535, size=(2, 4, 16, 20)).astype(np.uint16)
    path = str(tmp_path / "lzw.czi")
    write_czi(path, data, compression=2)
    with CziFile(path) as czi:
        assert all(e.compression == 2 for e in czi.entries)
        arr = czi.asarray()
    np.testing.assert_array_equal(arr[..., 0], data)
    r = CziVolumeReader(path)
    for ci in range(2):
        np.testing.assert_array_equal(r.get_volume(ci), data[ci])


def test_lzw_compressed_garbage_rejected(tmp_path, czi_path):
    """compression=2 routes to the native LZW decoder, which must reject a
    stream that isn't LZW rather than return junk."""
    from repmode_tpu import native

    if native.lib() is None:
        pytest.skip("native lib unavailable")
    path, data = czi_path
    blob = bytearray(open(path, "rb").read())
    idx = blob.find(b"DV")
    while idx != -1:
        struct.pack_into("<i", blob, idx + 18, 2)  # LZW
        idx = blob.find(b"DV", idx + 2)
    bad = tmp_path / "bad2.czi"
    bad.write_bytes(bytes(blob))
    with CziFile(str(bad)) as czi:
        with pytest.raises(ValueError):
            czi.asarray()
