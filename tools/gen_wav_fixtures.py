#!/usr/bin/env python3
"""Deterministic WAV fixture generator for the real audio codec
(Multimodal.decodeWav). Filenames carry the sample-pattern parameters —
`wav_<a>_<b>_<n>_<ch>.wav` holds 16-bit PCM with flat interleaved sample
j = ((a*j + b) % 2001) - 1000 — so the DuckDB oracle can recompute every
decoded value analytically from the name alone (the mm2 solid-color-PNG
trick, applied to audio). All magnitudes <= 1000 < 2^10, so s/32768 is
exact in float32 and the Spark/DuckDB hashes can agree bit-for-bit.
Run once; output is committed under fixtures/audio/.
"""
import os, struct, wave

ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "audio")
os.makedirs(ROOT, exist_ok=True)

CASES = [  # (a, b, n_frames, channels)
    (3, 7, 40, 1),
    (5, 11, 32, 2),
    (2, 0, 48, 1),
    (17, 1234, 25, 2),
]

for a, b, n, ch in CASES:
    path = os.path.join(ROOT, f"wav_{a}_{b}_{n}_{ch}.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(8000)
        frames = b"".join(
            struct.pack("<h", ((a * j + b) % 2001) - 1000)
            for j in range(n * ch))
        w.writeframes(frames)

# A non-WAV byte blob: the codec must return null (corrupt-sample row).
with open(os.path.join(ROOT, "corrupt.wav"), "wb") as f:
    f.write(b"\x00NOTRIFF" + bytes(range(48)))

print("wrote", sorted(os.listdir(ROOT)))
