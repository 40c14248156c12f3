#!/usr/bin/env python3
"""Generate the committed WAV fixtures and the q_media_audio oracle
VALUES by an INDEPENDENT replay of Multimodal.audioProfile's integer
math (python `wave` + `struct`, no JVM involved):

  frames         = interleaved_samples / channels
  duration_ms    = frames * 1000 // sample_rate
  peak           = max |s| over ALL interleaved samples
  rms            = isqrt(sum(s^2) // n_samples)      (math.isqrt)
  zero_crossings = sign flips over CHANNEL 0 only ((prev<0) != (cur<0))

Fixture design:
  au_000  mono 8000 Hz square wave (period 20, amp 12000, 800 frames)
  au_001  au_000 at half amplitude — same zero crossings, half rms
  au_002  mono 8000 Hz silence (400 frames) — all-zero features
  au_003  stereo 16000 Hz: L sawtooth, R constant 1000 — zc reads L only
  au_004  mono 11025 Hz LCG noise (1000 frames, seed 42)
"""
import math
import os
import struct
import wave

HERE = os.path.dirname(os.path.abspath(__file__))


def write_wav(name, rate, channels, frames):
    """frames: list of per-frame tuples (len == channels), 16-bit PCM."""
    with wave.open(os.path.join(HERE, name), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(
            struct.pack("<" + "h" * channels, *f) for f in frames))


def square(n, period, amp):
    return [(amp if (i % period) < period // 2 else -amp,) for i in range(n)]


def lcg_noise(n, seed=42):
    out, x = [], seed
    for _ in range(n):
        x = (1103515245 * x + 12345) % (2 ** 31)
        out.append(((x % 24001) - 12000,))
    return out


FIXTURES = [
    ("au_000.wav", 8000, 1, square(800, 20, 12000)),
    ("au_001.wav", 8000, 1, square(800, 20, 6000)),
    ("au_002.wav", 8000, 1, [(0,)] * 400),
    ("au_003.wav", 16000, 2,
     [((i % 200) * 120 - 12000, 1000) for i in range(600)]),
    ("au_004.wav", 11025, 1, lcg_noise(1000)),
]


def profile(path):
    with wave.open(path, "rb") as w:
        rate, channels, frames = w.getframerate(), w.getnchannels(), w.getnframes()
        raw = w.readframes(frames)
    samples = list(struct.unpack("<" + "h" * (len(raw) // 2), raw))
    peak = max((abs(s) for s in samples), default=0)
    rms = math.isqrt(sum(s * s for s in samples) // len(samples)) if samples else 0
    ch0 = samples[::channels]
    zc = sum(1 for a, b in zip(ch0, ch0[1:]) if (a < 0) != (b < 0))
    return (rate, channels, frames, frames * 1000 // rate, peak, rms, zc)


if __name__ == "__main__":
    rows = []
    for name, rate, ch, frames in FIXTURES:
        write_wav(name, rate, ch, frames)
        doc_id = int(name[3:6])
        p = profile(os.path.join(HERE, name))
        rows.append((doc_id,) + p)
    print("VALUES rows (doc_id, sample_rate, channels, n_frames,"
          " duration_ms, peak, rms, zero_crossings, decoded):")
    for r in rows:
        print(" (CAST(%d AS BIGINT), %d, %d, CAST(%d AS BIGINT), "
              "CAST(%d AS BIGINT), %d, CAST(%d AS BIGINT), "
              "CAST(%d AS BIGINT), TRUE)," % r)
