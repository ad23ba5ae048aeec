"""Multi-frame TIFF stack I/O for fluorescence microscopy.

The reference reads/writes multi-frame TIFF stacks via tifffile (SURVEY.md
§2 'TIFF/stack I/O'). tifffile is not in this environment, so this module
implements a self-contained baseline-TIFF codec in numpy:

* ``write_stack``: uncompressed little-endian grayscale TIFF, one IFD per
  frame, single strip per frame — uint8/uint16/uint32/float32.
* ``read_stack``: parses IFDs directly for uncompressed grayscale TIFFs
  (the fast path for microscopy stacks); anything else (compressed, RGB,
  big-endian) falls back to PIL if available.

Host-side by design: frames stream from here into the double-buffered
host->HBM prefetch (``sequitr_tpu.data.prefetch``).
"""

from __future__ import annotations

import struct
from typing import List

import numpy as np

__all__ = ["read_stack", "write_stack"]

_DTYPES = {
    np.dtype("uint8"): (8, 1),
    np.dtype("uint16"): (16, 1),
    np.dtype("uint32"): (32, 1),
    np.dtype("float32"): (32, 3),
}
_INV_DTYPES = {
    (8, 1): np.uint8,
    (16, 1): np.uint16,
    (32, 1): np.uint32,
    (16, 3): np.float16,
    (32, 3): np.float32,
}

_II = b"II"
_TYPE_SHORT, _TYPE_LONG = 3, 4


def write_stack(path: str, stack: np.ndarray) -> None:
    """Write (T, H, W) or (H, W) array as a multi-page grayscale TIFF."""
    stack = np.asarray(stack)
    if stack.ndim == 2:
        stack = stack[None]
    if stack.ndim != 3:
        raise ValueError(f"expected (T, H, W) or (H, W), got {stack.shape}")
    dt = stack.dtype
    if dt not in _DTYPES:
        raise ValueError(f"unsupported dtype {dt}; use uint8/16/32 or float32")
    bits, sample_format = _DTYPES[dt]
    t, h, w = stack.shape

    def entry(tag, typ, count, value):
        return struct.pack("<HHI4s", tag, typ, count, value)

    with open(path, "wb") as f:
        f.write(_II + struct.pack("<HI", 42, 8))
        offset = 8
        for i in range(t):
            frame = np.ascontiguousarray(stack[i])
            data = frame.astype("<" + dt.str[1:]).tobytes()
            n_entries = 9
            ifd_size = 2 + n_entries * 12 + 4
            data_offset = offset + ifd_size
            next_ifd = data_offset + len(data) if i < t - 1 else 0

            def val(v, typ=_TYPE_LONG):
                if typ == _TYPE_SHORT:
                    return struct.pack("<HH", v, 0)
                return struct.pack("<I", v)

            entries = [
                entry(256, _TYPE_LONG, 1, val(w)),  # ImageWidth
                entry(257, _TYPE_LONG, 1, val(h)),  # ImageLength
                entry(258, _TYPE_SHORT, 1, val(bits, _TYPE_SHORT)),  # BitsPerSample
                entry(259, _TYPE_SHORT, 1, val(1, _TYPE_SHORT)),  # Compression=none
                entry(262, _TYPE_SHORT, 1, val(1, _TYPE_SHORT)),  # Photometric=minisblack
                entry(273, _TYPE_LONG, 1, val(data_offset)),  # StripOffsets
                entry(278, _TYPE_LONG, 1, val(h)),  # RowsPerStrip
                entry(279, _TYPE_LONG, 1, val(len(data))),  # StripByteCounts
                entry(339, _TYPE_SHORT, 1, val(sample_format, _TYPE_SHORT)),
            ]
            f.write(struct.pack("<H", n_entries))
            f.write(b"".join(entries))
            f.write(struct.pack("<I", next_ifd))
            f.write(data)
            offset = data_offset + len(data)


def _read_entry_value(buf, offset_pos, typ, count, endian):
    raw = buf[offset_pos : offset_pos + 4]
    if typ == _TYPE_SHORT and count == 1:
        return struct.unpack(endian + "H", raw[:2])[0]
    if typ == _TYPE_LONG and count == 1:
        return struct.unpack(endian + "I", raw)[0]
    # value is an offset to an array
    off = struct.unpack(endian + "I", raw)[0]
    size = 2 if typ == _TYPE_SHORT else 4
    fmt = "H" if typ == _TYPE_SHORT else "I"
    return list(
        struct.unpack(endian + fmt * count, buf[off : off + size * count])
    )


def read_stack(path: str) -> np.ndarray:
    """Read a multi-page grayscale TIFF into (T, H, W); (H, W) if T == 1."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"II":
        endian = "<"
    elif buf[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF file")
    magic, first_ifd = struct.unpack(endian + "HI", buf[2:8])
    if magic != 42:
        raise ValueError("not a baseline TIFF")

    frames: List[np.ndarray] = []
    ifd = first_ifd
    try:
        while ifd:
            n = struct.unpack(endian + "H", buf[ifd : ifd + 2])[0]
            tags = {}
            for j in range(n):
                e = ifd + 2 + j * 12
                tag, typ, count = struct.unpack(endian + "HHI", buf[e : e + 8])
                tags[tag] = _read_entry_value(buf, e + 8, typ, count, endian)
            ifd = struct.unpack(
                endian + "I", buf[ifd + 2 + n * 12 : ifd + 6 + n * 12]
            )[0]

            if tags.get(259, 1) != 1:
                raise ValueError("compressed TIFF; falling back to PIL")
            w, h = tags[256], tags[257]
            bits = tags.get(258, 8)
            bits = bits[0] if isinstance(bits, list) else bits
            fmt = tags.get(339, 1)
            fmt = fmt[0] if isinstance(fmt, list) else fmt
            spp = tags.get(277, 1)
            if spp != 1:
                raise ValueError("non-grayscale TIFF; falling back to PIL")
            dt = np.dtype(_INV_DTYPES[(bits, fmt)]).newbyteorder(endian)
            offs = tags[273]
            counts = tags[279]
            offs = offs if isinstance(offs, list) else [offs]
            counts = counts if isinstance(counts, list) else [counts]
            data = b"".join(buf[o : o + c] for o, c in zip(offs, counts))
            frames.append(
                np.frombuffer(data, dtype=dt).reshape(h, w).astype(dt.newbyteorder("="))
            )
    except (ValueError, KeyError):
        return _read_with_pil(path)

    stack = np.stack(frames)
    return stack[0] if stack.shape[0] == 1 else stack


def _read_with_pil(path: str) -> np.ndarray:
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise ValueError(f"unsupported TIFF and PIL unavailable: {path}") from e
    img = Image.open(path)
    frames = []
    for i in range(getattr(img, "n_frames", 1)):
        img.seek(i)
        frames.append(np.asarray(img))
    stack = np.stack(frames)
    return stack[0] if stack.shape[0] == 1 else stack
