"""EXR reader/writer tests: write-read roundtrip + hand-built ZIP files.

The ZIP test constructs an EXR byte-by-byte in Python (header, offset table,
zlib-compressed scanline blocks with OpenEXR's interleave+delta filter) so the
native reader's inflate path is exercised without any binary fixture.
"""

import struct
import zlib

import numpy as np
import pytest

from vrenderer_pathtracer_tpu import native


def test_exr_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 4, (24, 33, 3)).astype(np.float32)
    p = tmp_path / "rt.exr"
    native.write_exr(str(p), img)
    back = native.load_exr(str(p))
    assert back.shape == img.shape
    # HALF storage: ~3 decimal digits of precision.
    np.testing.assert_allclose(back, img, rtol=2e-3, atol=1e-3)


def _exr_filter(data: bytes) -> bytes:
    """OpenEXR pre-compression transform: de-interleave halves, delta-encode."""
    n = len(data)
    half = (n + 1) // 2
    out = bytearray(n)
    # interleave inverse: t1 gets even positions, t2 odd
    out[:half] = data[0::2]
    out[half:] = data[1::2]
    enc = bytearray(n)
    prev = 0
    for i, b in enumerate(out):
        if i == 0:
            enc[0] = b
        else:
            enc[i] = (b - prev + 128) & 0xFF
        prev = b
    return bytes(enc)


def _attr(name: str, typ: str, data: bytes) -> bytes:
    return name.encode() + b"\0" + typ.encode() + b"\0" + struct.pack("<i", len(data)) + data


def _build_zip_exr(img: np.ndarray, lines_per_block: int) -> bytes:
    """Single-part scanline EXR, FLOAT channels, ZIP/ZIPS compression."""
    h, w, _ = img.shape
    comp = 3 if lines_per_block == 16 else 2
    chl = b""
    for cn in (b"B", b"G", b"R"):
        chl += cn + b"\0" + struct.pack("<iiii", 2, 0, 1, 1)  # FLOAT
    chl += b"\0"
    header = struct.pack("<II", 20000630, 2)
    header += _attr("channels", "chlist", chl)
    header += _attr("compression", "compression", bytes([comp]))
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\0")
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    blocks = []
    for y0 in range(0, h, lines_per_block):
        nl = min(lines_per_block, h - y0)
        raw = b""
        for y in range(y0, y0 + nl):
            # channels alphabetical B, G, R; full row each
            for c in (2, 1, 0):
                raw += img[y, :, c].astype("<f4").tobytes()
        packed = zlib.compress(_exr_filter(raw))
        if len(packed) >= len(raw):
            packed = raw
        blocks.append((y0, packed))

    n_blocks = len(blocks)
    table_pos = len(header)
    data_start = table_pos + 8 * n_blocks
    offsets, chunks = [], []
    pos = data_start
    for y0, packed in blocks:
        offsets.append(pos)
        chunk = struct.pack("<ii", y0, len(packed)) + packed
        chunks.append(chunk)
        pos += len(chunk)
    out = header + b"".join(struct.pack("<Q", o) for o in offsets) + b"".join(chunks)
    return out


@pytest.mark.parametrize("lines_per_block", [1, 16])  # ZIPS, ZIP
def test_exr_zip_read(tmp_path, lines_per_block):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 10, (37, 21, 3)).astype(np.float32)
    p = tmp_path / f"z{lines_per_block}.exr"
    p.write_bytes(_build_zip_exr(img, lines_per_block))
    back = native.load_exr(str(p))
    np.testing.assert_array_equal(back, img)  # FLOAT channels: bit-exact


def test_exr_rejects_garbage(tmp_path):
    p = tmp_path / "bad.exr"
    p.write_bytes(b"not an exr at all")
    with pytest.raises(IOError):
        native.load_exr(str(p))
