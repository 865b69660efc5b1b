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


def test_exr_corrupt_block_y0_is_an_error_not_a_crash(tmp_path):
    """A block header with y0 far outside the data window must surface as a
    clean error (round-1 advisor finding: the unvalidated y0 made the
    wanted-size computation wrap and abort the process)."""
    img = np.ones((20, 8, 3), np.float32)
    data = bytearray(_build_zip_exr(img, 16))
    # First block chunk starts right after header + offset table; its first
    # int32 is y0.  Find it via the recorded offset.
    # Header ends where the offset table begins; easiest: rebuild offsets.
    # The first offset is stored little-endian at the end of the header.
    # Locate by scanning for the first chunk: y0 == 0 at its offset.
    # Instead of parsing, patch via the known layout of _build_zip_exr.
    header_len = data.index(b"\0", data.index(b"screenWindowWidth")) + 0
    # simpler: the first offset value equals table_pos + 8*n_blocks
    n_blocks = (20 + 15) // 16
    # find table start: search for the 8-byte LE value that equals its own
    # position + 8*n_blocks
    table_pos = None
    for i in range(len(data) - 8):
        (v,) = struct.unpack_from("<Q", data, i)
        if v == i + 8 * n_blocks:
            table_pos = i
            break
    assert table_pos is not None
    first_chunk = table_pos + 8 * n_blocks
    struct.pack_into("<i", data, first_chunk, 10_000)  # y0 way past h
    p = tmp_path / "y0.exr"
    p.write_bytes(bytes(data))
    with pytest.raises(IOError, match="corrupt"):
        native.load_exr(str(p))


# ---------------------------------------------------------------------------
# RLE (compression 1) — independent Python encoder exercises the decoder.
# ---------------------------------------------------------------------------


def _rle_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(run - 1)
            out.append(data[i])
            i += run
        else:
            j = i + 1
            while (j < n and j - i < 127
                   and not (j + 1 < n and data[j] == data[j + 1])):
                j += 1
            out.append(256 - (j - i))
            out.extend(data[i:j])
            i = j
    return bytes(out)


def _build_exr(img, comp, lines_per_block, pack_block):
    h, w, _ = img.shape
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
            for c in (2, 1, 0):
                raw += img[y, :, c].astype("<f4").tobytes()
        packed = pack_block(raw, nl)
        if len(packed) >= len(raw):
            packed = raw
        blocks.append((y0, packed))

    n_blocks = len(blocks)
    data_start = len(header) + 8 * n_blocks
    offsets, chunks = [], []
    pos = data_start
    for y0, packed in blocks:
        offsets.append(pos)
        chunk = struct.pack("<ii", y0, len(packed)) + packed
        chunks.append(chunk)
        pos += len(chunk)
    return header + b"".join(struct.pack("<Q", o) for o in offsets) + \
        b"".join(chunks)


def test_exr_rle_read(tmp_path):
    rng = np.random.default_rng(2)
    # Quantized values give RLE some actual runs.
    img = (rng.integers(0, 4, (13, 9, 3)) * 0.5).astype(np.float32)

    def pack(raw, nl):
        return _rle_encode(_exr_filter(raw))

    p = tmp_path / "rle.exr"
    p.write_bytes(_build_exr(img, 1, 1, pack))
    back = native.load_exr(str(p))
    np.testing.assert_array_equal(back, img)


# ---------------------------------------------------------------------------
# PXR24 (compression 5) — independent Python encoder (float -> top 3 bytes,
# per-plane horizontal delta, zlib).
# ---------------------------------------------------------------------------


def test_exr_pxr24_read(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 10, (37, 14, 3)).astype(np.float32)
    w = img.shape[1]

    def pack(raw, nl):
        # The per-line delta is on the COMBINED 24-bit word (carries
        # propagate between byte planes), matching the system OpenEXR —
        # tests/test_exr_golden.py validates the decoder against the real
        # library; this synthetic encoder mirrors the same scheme.
        arr = np.frombuffer(raw, "<u4").reshape(nl, 3, w)
        planes = bytearray()
        for line in arr:
            for chan in line:
                p24 = (chan >> 8).astype(np.uint32)
                d = np.diff(p24.astype(np.int64),
                            prepend=np.int64(0)).astype(np.uint32) & 0xFFFFFF
                for sh in (16, 8, 0):
                    planes.extend(((d >> sh) & 0xFF).astype(np.uint8).tobytes())
        return zlib.compress(bytes(planes))

    p = tmp_path / "pxr24.exr"
    p.write_bytes(_build_exr(img, 5, 16, pack))
    back = native.load_exr(str(p))
    # PXR24 truncates floats to their top 24 bits.
    expected = (img.view(np.uint32) & np.uint32(0xFFFFFF00)).view(np.float32)
    np.testing.assert_array_equal(back, expected)


# ---------------------------------------------------------------------------
# PIZ (compression 4) — native writer round-trip (wavelet + Huffman codec).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(32, 48), (33, 47), (7, 5), (70, 11)])
def test_exr_piz_roundtrip(tmp_path, shape):
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 4, shape + (3,)).astype(np.float32)
    img[img < 0.3] = 0.0  # exercise the bitmap/LUT path
    p = tmp_path / "piz.exr"
    native.write_exr(str(p), img, compression="piz")
    back = native.load_exr(str(p))
    np.testing.assert_allclose(back, img, rtol=2e-3, atol=1e-3)  # HALF


# ---------------------------------------------------------------------------
# Tiled layout (version flag 0x200) — hand-built single-part tiled files.
# ---------------------------------------------------------------------------


def _build_tiled_exr(img, tile_w, tile_h, level_mode=0):
    """Single-part tiled EXR, FLOAT channels, ZIP-compressed tiles.

    level_mode 0 = ONE_LEVEL; 1 = MIPMAP (level-(0,0) tiles carry the
    image, higher levels carry garbage-free filler the reader must skip).
    """
    h, w, _ = img.shape
    chl = b""
    for cn in (b"B", b"G", b"R"):
        chl += cn + b"\0" + struct.pack("<iiii", 2, 0, 1, 1)  # FLOAT
    chl += b"\0"
    header = struct.pack("<II", 20000630, 2 | 0x200)
    header += _attr("channels", "chlist", chl)
    header += _attr("compression", "compression", bytes([3]))  # ZIP
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\0")
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    # tiledesc: xSize, ySize, mode (level_mode | roundingMode<<4; round down)
    header += _attr("tiles", "tiledesc",
                    struct.pack("<IIB", tile_w, tile_h, level_mode))
    header += b"\0"

    def tile_chunk(level_img, tdx, tdy, lx, ly):
        lh, lw, _ = level_img.shape
        x0, y0 = tdx * tile_w, tdy * tile_h
        bw = min(tile_w, lw - x0)
        bh = min(tile_h, lh - y0)
        raw = b""
        for y in range(y0, y0 + bh):
            for c in (2, 1, 0):  # B, G, R rows per line
                raw += level_img[y, x0:x0 + bw, c].astype("<f4").tobytes()
        packed = zlib.compress(_exr_filter(raw))
        if len(packed) >= len(raw):
            packed = raw
        return struct.pack("<iiiii", tdx, tdy, lx, ly, len(packed)) + packed

    levels = [(img, 0)]
    if level_mode == 1:
        lv, n = img, 1
        while max(lv.shape[0], lv.shape[1]) > 1:
            lv = lv[::2, ::2]  # round-down mip (contents don't matter)
            levels.append((np.zeros_like(lv), n))
            n += 1

    chunks = []
    for lv, l in levels:
        ntx = -(-lv.shape[1] // tile_w)
        nty = -(-lv.shape[0] // tile_h)
        for tdy in range(nty):
            for tdx in range(ntx):
                chunks.append(tile_chunk(lv, tdx, tdy, l, l))

    data_start = len(header) + 8 * len(chunks)
    offsets, pos = [], data_start
    for c in chunks:
        offsets.append(pos)
        pos += len(c)
    return header + b"".join(struct.pack("<Q", o) for o in offsets) + \
        b"".join(chunks)


@pytest.mark.parametrize("tile", [(16, 16), (32, 8), (13, 7)])
def test_exr_tiled_one_level(tmp_path, tile):
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 10, (37, 29, 3)).astype(np.float32)
    p = tmp_path / "tiled.exr"
    p.write_bytes(_build_tiled_exr(img, *tile))
    back = native.load_exr(str(p))
    np.testing.assert_array_equal(back, img)  # FLOAT: bit-exact


def test_exr_tiled_mipmap_reads_level0(tmp_path):
    """MIPMAP files: only the (0,0) plane is scattered; mip tiles skipped."""
    rng = np.random.default_rng(6)
    img = rng.uniform(0, 4, (24, 40, 3)).astype(np.float32)
    p = tmp_path / "mip.exr"
    p.write_bytes(_build_tiled_exr(img, 16, 16, level_mode=1))
    back = native.load_exr(str(p))
    np.testing.assert_array_equal(back, img)


def test_exr_piz_compresses_smooth_data(tmp_path):
    """A smooth gradient (the realistic HDRI case) must actually shrink."""
    y = np.linspace(0, 1, 64)[:, None, None]
    x = np.linspace(0, 2, 96)[None, :, None]
    img = np.broadcast_to(y + x, (64, 96, 3)).astype(np.float32).copy()
    p = tmp_path / "piz.exr"
    native.write_exr(str(p), img, compression="piz")
    raw_bytes = 64 * 96 * 3 * 2
    assert p.stat().st_size < 0.6 * raw_bytes
    back = native.load_exr(str(p))
    np.testing.assert_allclose(back, img, rtol=2e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# B44 / B44A (compressions 6/7) — independent Python block encoder.
# ---------------------------------------------------------------------------


def _b44_transform(h):
    """Half bits -> monotonic unsigned ordering (the codec's t-space)."""
    if (h & 0x7C00) == 0x7C00:
        return 0x8000
    return (~h & 0xFFFF) if (h & 0x8000) else (h | 0x8000)


_B44_CHAIN = [(0, 4), (4, 8), (8, 12), (0, 1), (4, 5), (8, 9), (12, 13),
              (1, 2), (5, 6), (9, 10), (13, 14), (2, 3), (6, 7), (10, 11),
              (14, 15)]


def _b44_pack14(t16):
    """16 t-space values -> 14 bytes (shift 0: requires chain deltas in
    [-32, 31], which makes the round trip LOSSLESS)."""
    codes = []
    for a, b in _B44_CHAIN:
        d = t16[b] - t16[a] + 0x20
        assert 0 <= d <= 0x3F, "test data must be shift-0 encodable"
        codes.append(d)
    out = bytearray([t16[0] >> 8, t16[0] & 0xFF])
    fields = [0] + codes  # shift, then 15 codes: four 4x6-bit groups
    for g in range(4):
        x = 0
        for v in fields[4 * g: 4 * g + 4]:
            x = (x << 6) | v
        out += bytes([(x >> 16) & 0xFF, (x >> 8) & 0xFF, x & 0xFF])
    return bytes(out)


def _build_b44_exr(img_half, comp=6, flat_blocks=()):
    """Single-part scanline EXR with HALF B,G,R channels, B44(A) blocks.

    ``img_half``: [h,w,3] uint16 half bits.  ``flat_blocks``: set of
    (channel, band, blockcol) encoded as 3-byte B44A flat blocks (their
    16 t-values must be equal).
    """
    h, w, _ = img_half.shape
    chl = b""
    for cn in (b"B", b"G", b"R"):
        chl += cn + b"\0" + struct.pack("<iiii", 1, 0, 1, 1)  # HALF
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
    for y0 in range(0, h, 32):
        nl = min(32, h - y0)
        bx, by = -(-w // 4), -(-nl // 4)
        payload = bytearray()
        for c in (2, 1, 0):  # B, G, R channel order
            # pad plane to block multiples by edge replication
            plane = img_half[y0:y0 + nl, :, c]
            plane = np.pad(plane, ((0, by * 4 - nl), (0, bx * 4 - w)),
                           mode="edge")
            tplane = np.vectorize(_b44_transform)(plane.astype(np.int32))
            for r in range(by):
                for b in range(bx):
                    blk = tplane[r * 4:r * 4 + 4, b * 4:b * 4 + 4]
                    t16 = [int(blk[i // 4, i % 4]) for i in range(16)]
                    if (2 - c, r, b) in flat_blocks:
                        assert len(set(t16)) == 1
                        payload += bytes([t16[0] >> 8, t16[0] & 0xFF, 0xFC])
                    else:
                        payload += _b44_pack14(t16)
        blocks.append((y0, bytes(payload)))

    data_start = len(header) + 8 * len(blocks)
    offsets, chunks, pos = [], [], data_start
    for y0, packed in blocks:
        offsets.append(pos)
        chunks.append(struct.pack("<ii", y0, len(packed)) + packed)
        pos += len(chunks[-1])
    return header + b"".join(struct.pack("<Q", o) for o in offsets) + \
        b"".join(chunks)


def _halves(img_half):
    return np.vectorize(
        lambda h: np.frombuffer(
            np.uint16(h).tobytes() + b"\0\0", "<u2")[0])(img_half)


def test_exr_b44_read(tmp_path):
    """Gentle half ramps are shift-0 encodable -> bit-exact round trip."""
    h, w = 37, 29
    yy, xx = np.mgrid[0:h, 0:w]
    base = 0x3800  # 0.5 in half
    img = np.stack([(base + ((yy * 2 + xx) % 24) + c * 7) for c in range(3)],
                   axis=2).astype(np.uint16)
    p = tmp_path / "b44.exr"
    p.write_bytes(_build_b44_exr(img, comp=6))
    back = native.load_exr(str(p))
    expect = np.frombuffer(img.astype("<u2").tobytes(), "<u2")
    got = np.zeros_like(expect)
    # compare as halves: convert expectation via the reader's own output
    import struct as _s
    def h2f(u):
        s = (u >> 15) & 1; e = (u >> 10) & 0x1F; m = u & 0x3FF
        if e == 0 and m == 0: v = 0.0
        elif e == 0: v = (m / 1024.0) * 2.0 ** -14
        elif e == 31: v = float("nan")
        else: v = (1 + m / 1024.0) * 2.0 ** (e - 15)
        return -v if s else v
    expect_f = np.array([h2f(int(u)) for u in expect], np.float32).reshape(h, w, 3)
    np.testing.assert_array_equal(back, expect_f)


def test_exr_b44a_flat_blocks(tmp_path):
    """B44A 3-byte flat blocks decode to the constant value."""
    h, w = 8, 8  # 2x2 blocks per channel
    img = np.full((h, w, 3), 0x3C00, np.uint16)  # all 1.0 -> every block flat
    img[4:8, 4:8, :] += np.arange(3, dtype=np.uint16)[None, None, :]
    flat = {(c, r, b) for c in range(3) for r in range(2) for b in range(2)
            if not (r == 1 and b == 1)}
    p = tmp_path / "b44a.exr"
    p.write_bytes(_build_b44_exr(img, comp=7, flat_blocks=flat))
    back = native.load_exr(str(p))
    assert back.shape == (h, w, 3)
    np.testing.assert_allclose(back[0, 0], [1.0, 1.0, 1.0])
    np.testing.assert_allclose(back[:4, :4], 1.0)


@pytest.mark.parametrize("shape", [(24, 33), (16, 8), (17, 5)])
def test_exr_zip_write_read_roundtrip(tmp_path, shape):
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 4, shape + (3,)).astype(np.float32)
    p = tmp_path / "z.exr"
    native.write_exr(str(p), img, compression="zip")
    back = native.load_exr(str(p))
    np.testing.assert_allclose(back, img, rtol=2e-3, atol=1e-3)  # HALF
    # Smooth data must actually shrink.
    y = np.linspace(0, 1, 64)[:, None, None]
    smooth = np.broadcast_to(y, (64, 96, 3)).astype(np.float32).copy()
    p2 = tmp_path / "smooth.exr"
    native.write_exr(str(p2), smooth, compression="zip")
    assert p2.stat().st_size < 0.5 * 64 * 96 * 3 * 2


@pytest.mark.parametrize("comp", ["rle", "zips", "pxr24"])
@pytest.mark.parametrize("shape", [(24, 33), (17, 5)])
def test_exr_new_write_modes_roundtrip(tmp_path, comp, shape):
    """RLE/ZIPS/PXR24 write modes (all lossless for HALF data) round-trip
    through our own reader; golden decode-by-OpenEXR coverage lives in
    tests/test_exr_golden.py::test_write_read_by_openexr."""
    rng = np.random.default_rng(11)
    img = rng.uniform(0, 4, shape + (3,)).astype(np.float32)
    p = tmp_path / f"{comp}.exr"
    native.write_exr(str(p), img, compression=comp)
    back = native.load_exr(str(p))
    np.testing.assert_allclose(back, img, rtol=2e-3, atol=1e-3)  # HALF
    # Compressible data must actually shrink.
    y = np.linspace(0, 1, 64)[:, None, None]
    smooth = np.broadcast_to(y, (64, 96, 3)).astype(np.float32).copy()
    p2 = tmp_path / f"{comp}_smooth.exr"
    native.write_exr(str(p2), smooth, compression=comp)
    assert p2.stat().st_size < 0.8 * 64 * 96 * 3 * 2


def test_exr_b44_write_read_roundtrip(tmp_path):
    """B44 is lossy but bounded: smooth data round-trips within a small
    relative error, and the fixed-rate stream actually shrinks."""
    y = np.linspace(0, 1, 37)[:, None, None]
    x = np.linspace(0, 2, 29)[None, :, None]
    img = np.broadcast_to(0.3 + y * x, (37, 29, 3)).astype(np.float32).copy()
    p = tmp_path / "b44w.exr"
    native.write_exr(str(p), img, compression="b44")
    back = native.load_exr(str(p))
    np.testing.assert_allclose(back, img, rtol=2e-2, atol=2e-3)
    assert p.stat().st_size < 0.8 * 37 * 29 * 3 * 2  # 14B per 16 halves


def test_exr_dwaa_roundtrip(tmp_path):
    """DWAA write/read roundtrip (lossy DCT: smooth content survives to
    quantization tolerance; csrc/dwa.cc)."""
    yy, xx = np.mgrid[0:40, 0:72].astype(np.float32)
    img = np.stack([0.1 + yy / 40, 0.2 + xx / 72, 2.0 - yy / 40], axis=-1)
    p = tmp_path / "dwaa.exr"
    native.write_exr(str(p), img, compression="dwaa")
    back = native.load_exr(str(p))
    np.testing.assert_allclose(back, img, rtol=0.02, atol=5e-3)
    assert p.stat().st_size < 40 * 72 * 3 * 2  # beats raw halfs on smooth data


def test_exr_dwab_roundtrip(tmp_path):
    """DWAB: same stream as DWAA at 256-line chunks (one chunk here)."""
    yy, xx = np.mgrid[0:40, 0:72].astype(np.float32)
    img = np.stack([0.1 + yy / 40, 0.2 + xx / 72, 2.0 - yy / 40], axis=-1)
    p = tmp_path / "dwab.exr"
    native.write_exr(str(p), img, compression="dwab")
    back = native.load_exr(str(p))
    np.testing.assert_allclose(back, img, rtol=0.02, atol=5e-3)
