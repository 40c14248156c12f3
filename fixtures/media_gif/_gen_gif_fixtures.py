#!/usr/bin/env python3
"""Generate committed animated-GIF fixtures and the q_media_frames_gif
oracle VALUES by an INDEPENDENT replay of the frame-hash math.

The writer is a from-scratch GIF89a encoder (no PIL, no JVM): global
8-gray palette, full-size frames, no transparency, and the classic
"uncompressed GIF" LZW stream — literal codes at fixed width with a
CLEAR emitted before the dictionary would force a width change. Every
pixel index is therefore stored verbatim, so the JVM's ImageIO decode
must recover these exact pixels.

Per-frame hash replay (Multimodal.imageCells + perceptualHash):
  cell c (8x8 grid)   = integer mean over its pixel block of
                        (299r + 587g + 114b) / 1000   (integer div)
  bit j (j = 0..62)   = cells[j] >= cells[j+1]

Fixture design (16x16, 8-gray palette, indices 0..7 -> value 32*i):
  vid_000.gif  4 frames: a bright 8x8 block walking the corners
  vid_001.gif  vid_000 with every index +1 (uniform brightness shift,
               order-preserving -> IDENTICAL per-frame hashes)
  vid_002.gif  6 frames: horizontal gradient rotating by frame
"""
import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))
W = H = 16
# 8 grays: index i -> (32*i, 32*i, 32*i); index 7 stays 224 (not 255)
# so the +1 shift in vid_001 is in-palette
PALETTE = [(32 * i,) * 3 for i in range(8)]


def lzw_uncompressed(indices):
    """Fixed-width literal LZW: min code size 3 -> 4-bit codes,
    CLEAR(8)/EOI(9), dictionary reset every 4 literals so code width
    never grows past 4 bits."""
    codes = [8]
    since_clear = 0
    for px in indices:
        if since_clear == 4:
            codes.append(8)
            since_clear = 0
        codes.append(px)
        since_clear += 1
    codes.append(9)
    # pack 4-bit codes LSB-first
    out, acc, nbits = bytearray(), 0, 0
    for c in codes:
        acc |= c << nbits
        nbits += 4
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def write_gif(name, frames):
    """frames: list of W*H index arrays (row-major)."""
    b = bytearray()
    b += b"GIF89a"
    # logical screen: WxH, GCT present, 8 entries (2^(2+1)), bg 0
    b += struct.pack("<HHBBB", W, H, 0x80 | 0x02, 0, 0)
    for rgb in PALETTE:
        b += bytes(rgb)
    for f in frames:
        # graphic control: no transparency, no disposal, 10cs delay
        b += bytes([0x21, 0xF9, 0x04, 0x00, 10, 0, 0, 0x00])
        # image descriptor: full frame, no local palette
        b += b"\x2C" + struct.pack("<HHHHB", 0, 0, W, H, 0)
        b += bytes([3])  # LZW min code size
        data = lzw_uncompressed(f)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            b += bytes([len(chunk)]) + chunk
        b += b"\x00"
    b += b"\x3B"
    with open(os.path.join(HERE, name), "wb") as fh:
        fh.write(b)


def block_frame(cx, cy):
    """Dark (index 1) background with a bright (index 7) 8x8 block whose
    top-left corner sits at (cx, cy)."""
    f = [1] * (W * H)
    for y in range(cy, cy + 8):
        for x in range(cx, cx + 8):
            f[y * W + x] = 7
    return f


def gradient_frame(shift):
    """Row-major horizontal gradient of the 8 grays, rotated by shift."""
    return [((x // 2 + shift) % 8) for y in range(H) for x in range(W)]


VID_000 = [block_frame(0, 0), block_frame(8, 0),
           block_frame(8, 8), block_frame(0, 8)]
VID_001 = [[min(7, i + 1) for i in f] for f in VID_000]
VID_002 = [gradient_frame(s) for s in range(6)]

FIXTURES = [("vid_000.gif", VID_000), ("vid_001.gif", VID_001),
            ("vid_002.gif", VID_002)]


def frame_phash(indices):
    cells = []
    for c in range(64):
        x0, x1 = (c % 8) * W // 8, (c % 8 + 1) * W // 8
        y0, y1 = (c // 8) * H // 8, (c // 8 + 1) * H // 8
        s = 0
        for y in range(y0, y1):
            for x in range(x0, x1):
                r, g, bl = PALETTE[indices[y * W + x]]
                s += (299 * r + 587 * g + 114 * bl) // 1000
        cells.append(s // ((x1 - x0) * (y1 - y0)))
    h = 0
    for j in range(63):
        if cells[j] >= cells[j + 1]:
            h |= 1 << j
    return h


if __name__ == "__main__":
    rows = []
    for name, frames in FIXTURES:
        write_gif(name, frames)
        doc_id = int(name[4:7])
        for idx, f in enumerate(frames):
            rows.append((doc_id, idx, len(frames), frame_phash(f)))
    print("VALUES rows (doc_id, frame_idx, n_frames, phash):")
    for r in rows:
        print(" (CAST(%d AS BIGINT), %d, %d, CAST(%d AS BIGINT))," % r)
    # sanity: the brightness shift preserves every hash
    for (d0, i0, _, h0), (d1, i1, _, h1) in zip(rows[0:4], rows[4:8]):
        assert h0 == h1, (i0, h0, h1)
    print("-- shift-invariance sanity: vid_001 hashes == vid_000 hashes")
