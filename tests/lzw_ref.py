"""Reference-grade TIFF-LZW encoder + minimal TIFF wrapper for tests.

The encoder implements the TIFF6 "early change" variant and is verified
against libtiff: Pillow decodes its output byte-exact
(tests/test_native.py::TestLZWOracle::test_pillow_decodes_our_encoder).
It exists purely to exercise repmode_tpu.native.lzw_decode and the
LZW-compressed CZI path; production never encodes LZW.

Reference capability being tested: aicsimage/io/czifile.py:1181-1184
(ZISRAW compression type 2 = TIFF-variant LZW subblocks).
"""

import struct


def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encode (MSB-first codes, 9->12 bits, early change).

    Early-change pairing (verified empirically vs libtiff both directions):
    this encoder adds a table entry on its FIRST emitted code while a decoder
    adds none, so its free-entry counter runs one ahead; it must widen when
    ``next_code == (1 << bits)`` to match a decoder that widens at
    ``(1 << bits) - 1``.
    """
    table = {bytes([i]): i for i in range(256)}
    next_code, code_bits = 258, 9
    out_bits = []

    def put(code, bits):
        out_bits.extend((code >> (bits - 1 - b)) & 1 for b in range(bits))

    put(256, code_bits)  # clear
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            put(table[w], code_bits)
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << code_bits) and code_bits < 12:
                code_bits += 1
            if next_code >= 4094:  # libtiff clears before the table fills
                put(256, code_bits)
                table = {bytes([i]): i for i in range(256)}
                next_code, code_bits = 258, 9
            w = bytes([ch])
    if w:
        put(table[w], code_bits)
    put(257, code_bits)  # eoi
    while len(out_bits) % 8:
        out_bits.append(0)
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        v = 0
        for b in out_bits[i : i + 8]:
            v = (v << 1) | b
        by.append(v)
    return bytes(by)


def wrap_tiff_gray8(strip: bytes, width: int, height: int) -> bytes:
    """Wrap one LZW strip as a minimal little-endian 8-bit gray TIFF."""
    hdr = b"II*\x00" + struct.pack("<I", 8)
    entries = []

    def tag(t, typ, cnt, val):
        entries.append(struct.pack("<HHII", t, typ, cnt, val))

    n = 8
    data_off = 8 + 2 + 12 * n + 4
    tag(256, 3, 1, width)       # ImageWidth
    tag(257, 3, 1, height)      # ImageLength
    tag(258, 3, 1, 8)           # BitsPerSample
    tag(259, 3, 1, 5)           # Compression = LZW
    tag(262, 3, 1, 1)           # Photometric = BlackIsZero
    tag(273, 4, 1, data_off)    # StripOffsets
    tag(278, 3, 1, height)      # RowsPerStrip
    tag(279, 4, 1, len(strip))  # StripByteCounts
    ifd = struct.pack("<H", n) + b"".join(entries) + struct.pack("<I", 0)
    return hdr + ifd + strip


def pillow_lzw_strips(data: bytes, width: int, height: int):
    """Encode ``data`` (uint8, width*height bytes) with Pillow/libtiff and
    return the raw LZW strip(s) — an independent-oracle fixture source."""
    import io

    import numpy as np
    from PIL import Image

    arr = np.frombuffer(data, np.uint8).reshape(height, width)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="TIFF", compression="tiff_lzw")
    raw = buf.getvalue()
    endian = "<" if raw[:2] == b"II" else ">"
    (off,) = struct.unpack(endian + "I", raw[4:8])
    (n,) = struct.unpack(endian + "H", raw[off : off + 2])
    tags = {}
    for i in range(n):
        e = raw[off + 2 + 12 * i : off + 2 + 12 * i + 12]
        t, typ, cnt = struct.unpack(endian + "HHI", e[:8])
        (val,) = struct.unpack(endian + "I", e[8:12])
        tags[t] = (typ, cnt, val)

    def vals(t):
        typ, cnt, val = tags[t]
        size = {3: 2, 4: 4}[typ]
        fmt = {3: "H", 4: "I"}[typ]
        if cnt * size <= 4:
            if cnt == 1:
                return [val]
            packed = struct.pack(endian + "I", val)[: cnt * size]
            return list(struct.unpack(endian + fmt * cnt, packed))
        return list(struct.unpack(endian + fmt * cnt, raw[val : val + cnt * size]))

    offs, cnts = vals(273), vals(279)
    rows_per_strip = vals(278)[0] if 278 in tags else height
    strips = [raw[o : o + c] for o, c in zip(offs, cnts)]
    return strips, rows_per_strip
