#!/usr/bin/env python3
"""Generate committed AVI fixtures and the q_media_frames_avi oracle
VALUES by an INDEPENDENT replay of the frame-hash math.

The writer is a from-scratch RIFF/AVI muxer (no PIL, no JVM) carrying
UNCOMPRESSED DIB video ('00db' chunks: bottom-up BGR24 rows padded to
4 bytes — biCompression=0, biBitCount=24). Every pixel is stored
verbatim, so the engine's AVI raster decode must recover these exact
bytes; the oracle VALUES below replay the identical integer cell/bit
math over the SAME arrays with no decoder in the loop (the
media_gif/_gen_gif_fixtures.py discipline, applied to a true video
container).

Per-frame hash replay (Multimodal.imageCells + dHash63):
  cell c (8x8 grid)   = integer mean over its pixel block of
                        (299r + 587g + 114b) / 1000   (integer div)
  bit j (j = 0..62)   = cells[j] >= cells[j+1]

Fixture design (16x16, REAL RGB this time — the GIF set was gray-only,
so the 299/587/114 luminance weights were never distinguished from a
plain mean; these frames use saturated channels where a wrong weight
flips cells):
  avi_000.avi  3 frames: a bright block walking left->center->right
               over a dark red background
  avi_001.avi  avi_000 with every channel value +16 (uniform
               brightness shift, order-preserving -> IDENTICAL
               per-frame hashes)
  avi_002.avi  5 frames: a green/blue gradient rotating by frame
"""
import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))
W = H = 16


def luminance(px):
    r, g, b = px
    return (299 * r + 587 * g + 114 * b) // 1000


def cells(frame):
    out = []
    for c in range(64):
        x0 = (c % 8) * W // 8
        x1 = (c % 8 + 1) * W // 8
        y0 = (c // 8) * H // 8
        y1 = (c // 8 + 1) * H // 8
        s = sum(luminance(frame[y][x])
                for y in range(y0, y1) for x in range(x0, x1))
        out.append(s // ((x1 - x0) * (y1 - y0)))
    return out


def dhash63(cs):
    h = 0
    for j in range(63):
        if cs[j] >= cs[j + 1]:
            h |= 1 << j
    return h


def chunk(fourcc, data):
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def lst(list_type, payload):
    return chunk(b"LIST", list_type + payload)


def dib_bytes(frame):
    """Bottom-up BGR24 rows, each padded to 4 bytes."""
    stride = (W * 3 + 3) // 4 * 4
    rows = []
    for y in range(H - 1, -1, -1):
        row = bytearray()
        for x in range(W):
            r, g, b = frame[y][x]
            row += bytes((b, g, r))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    return b"".join(rows)


def write_avi(name, frames):
    n = len(frames)
    frame_bytes = [dib_bytes(f) for f in frames]
    buf_size = max(len(fb) for fb in frame_bytes)
    # MainAVIHeader (56 bytes)
    avih = struct.pack(
        "<14I",
        100000,      # dwMicroSecPerFrame (10 fps)
        buf_size * 10,  # dwMaxBytesPerSec
        0,           # dwPaddingGranularity
        0x10,        # dwFlags (AVIF_HASINDEX off; 0x10 = was captured — inert)
        n,           # dwTotalFrames
        0,           # dwInitialFrames
        1,           # dwStreams
        buf_size,    # dwSuggestedBufferSize
        W, H,        # dwWidth, dwHeight
        0, 0, 0, 0)  # dwReserved[4]
    # AVISTREAMHEADER (56 bytes)
    strh = (b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIIi", 0, 0, 0, 0, 1, 10, 0, n, buf_size, 0, -1)
        + struct.pack("<4H", 0, 0, W, H))
    # BITMAPINFOHEADER (40 bytes)
    strf = struct.pack("<IiiHHIIiiII",
                       40, W, H, 1, 24, 0, len(frame_bytes[0]), 0, 0, 0, 0)
    hdrl = lst(b"hdrl",
               chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    riff_payload = b"AVI " + hdrl + movi
    with open(os.path.join(HERE, name), "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)


def block_walk_frames(shift=0):
    """3 frames: bright block at x-band 0-5 / 5-11 / 11-16 over dark red."""
    frames = []
    for step, (bx0, bx1) in enumerate(((0, 5), (5, 11), (11, 16))):
        frame = []
        for y in range(H):
            row = []
            for x in range(W):
                if bx0 <= x < bx1 and 4 <= y < 12:
                    px = (200, 220, 180)  # bright, green-leaning
                else:
                    px = (90, 10, 20)     # dark red: luminance ~ 33
                row.append(tuple(min(255, v + shift) for v in px))
            frame.append(row)
        frames.append(frame)
    return frames


def gradient_frames():
    """5 frames: green/blue diagonal gradient rotating by frame."""
    frames = []
    for k in range(5):
        frame = []
        for y in range(H):
            row = []
            for x in range(W):
                t = ((x + y + 3 * k) % 16) / 15.0
                row.append((0, int(40 + 200 * t), int(240 - 200 * t)))
            frame.append(row)
        frames.append(frame)
    return frames


def main():
    sets = [
        ("avi_000.avi", block_walk_frames(0)),
        ("avi_001.avi", block_walk_frames(16)),
        ("avi_002.avi", gradient_frames()),
    ]
    rows = []
    for doc_id, (name, frames) in enumerate(sets):
        write_avi(name, frames)
        for i, fr in enumerate(frames):
            rows.append((doc_id, i, len(frames), dhash63(cells(fr))))
    print("-- q_media_frames_avi oracle VALUES (independent replay):")
    for doc_id, i, n, h in rows:
        print(f" (CAST({doc_id} AS BIGINT), {i}, {n}, "
              f"CAST({h if h < 2**63 else h - 2**64} AS BIGINT)),")


if __name__ == "__main__":
    main()
