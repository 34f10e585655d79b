"""Load the reference's vendored czifile parser as a parity oracle.

The reference parser (/root/reference/aicsimage/io/czifile.py) needs exactly
four symbols from the absent ``tifffile`` package (czifile.py:119:
``FileHandle, decode_lzw, lazyattr, stripnull``) plus two Python-2 builtins
(``unicode``, ``basestring``). This module shims them and imports the parser
by path, so tests can byte-diff our clean-room reader
(repmode_tpu/data/czi.py) against the exact code the reference pipeline ran.

decode_lzw is backed by repmode_tpu.native.lzw_decode — NOT circular for
container parsing, and the codec itself is independently pinned to libtiff in
tests/test_native.py::TestLZWOracle.
"""

import importlib.util
import os
import sys
import types

import numpy as np

REFERENCE_CZIFILE = "/root/reference/aicsimage/io/czifile.py"


class FileHandle:
    """Minimal read-side stand-in for tifffile.FileHandle (open-by-name or
    wrap an open binary file / another FileHandle)."""

    def __init__(self, arg, mode="rb", name=None, offset=0, size=None):
        if isinstance(arg, str):
            self._fh = open(arg, "rb")
            self.name = name or os.path.basename(arg)
            self.path = arg
            self._close = True
        else:
            self._fh = getattr(arg, "_fh", arg)
            self.name = name or getattr(arg, "name", "<buffer>")
            self.path = getattr(arg, "path", self.name)
            self._close = False
        self._offset = offset
        if size is None:
            pos = self._fh.tell()
            self._fh.seek(0, 2)
            size = self._fh.tell() - offset
            self._fh.seek(pos)
        self.size = size
        self._fh.seek(offset)

    def read(self, size=-1):
        return self._fh.read(size)

    def read_array(self, dtype, count=-1):
        dtype = np.dtype(dtype)
        n = count * dtype.itemsize if count >= 0 else -1
        return np.frombuffer(self._fh.read(n), dtype=dtype, count=count).copy()

    def seek(self, offset, whence=0):
        if whence == 0:
            self._fh.seek(self._offset + offset)
        else:
            self._fh.seek(offset, whence)

    def tell(self):
        return self._fh.tell() - self._offset

    def close(self):
        if self._close:
            self._fh.close()


def decode_lzw(data):
    """TIFF-variant LZW decode returning bytes (tifffile.decode_lzw shape).

    Backed by the first-party native codec; sized generously and trimmed by
    the caller's reshape."""
    from repmode_tpu import native

    out = native.lzw_decode(bytes(data), max(16, len(data) * 64))
    if out is None:
        raise RuntimeError("native LZW codec unavailable")
    return out


class lazyattr:
    """Attribute whose value is computed on first access (tifffile.lazyattr)."""

    def __init__(self, func):
        self.func = func
        self.__doc__ = getattr(func, "__doc__", None)
        self.__name__ = func.__name__

    def __get__(self, instance, owner):
        if instance is None:
            return self
        value = self.func(instance)
        instance.__dict__[self.__name__] = value
        return value


def stripnull(string):
    """Truncate at the first NUL byte (tifffile.stripnull)."""
    i = string.find(b"\x00")
    return string if i < 0 else string[:i]


def load_reference_czifile():
    """Import the reference parser with shimmed dependencies; returns the
    module (cached). Raises ImportError if the reference tree is absent."""
    if "reference_czifile" in sys.modules:
        return sys.modules["reference_czifile"]
    if not os.path.exists(REFERENCE_CZIFILE):
        raise ImportError(f"reference parser not found at {REFERENCE_CZIFILE}")

    shim = types.ModuleType("tifffile")
    inner = types.ModuleType("tifffile.tifffile")
    for mod in (shim, inner):
        mod.FileHandle = FileHandle
        mod.decode_lzw = decode_lzw
        mod.lazyattr = lazyattr
        mod.stripnull = stripnull
    shim.tifffile = inner

    had = {k: sys.modules.get(k) for k in ("tifffile", "tifffile.tifffile")}
    sys.modules["tifffile"] = shim
    sys.modules["tifffile.tifffile"] = inner
    try:
        spec = importlib.util.spec_from_file_location(
            "reference_czifile", REFERENCE_CZIFILE
        )
        module = importlib.util.module_from_spec(spec)
        # py2 builtins the 2015-era source still references
        module.__dict__["unicode"] = (
            lambda s, enc="utf-8": s.decode(enc) if isinstance(s, bytes) else str(s)
        )
        module.__dict__["basestring"] = (str, bytes)
        sys.modules["reference_czifile"] = module
        spec.loader.exec_module(module)
    finally:
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return module
