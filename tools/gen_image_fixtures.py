#!/usr/bin/env python3
"""Gradient grayscale PNG fixtures for the perceptual-hash dedup gate
(mm6_image_phash). Each image is exactly 9x8 (the dHash input size, so the
decode path's resize is the identity) with pixel value

    v(x, y) = (a*x + b*y + c*x*y) % 256

and the parameters in the filename (grad_<a>_<b>_<c>[_dup].png), so the
DuckDB oracle recomputes every dHash bit analytically. Pure stdlib (zlib
CRC/deflate) - no imaging library in this environment. Run once; output is
committed under fixtures/images_grad/.
"""
import os, struct, zlib

W, H = 9, 8
ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "images_grad")


def chunk(tag, data):
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def png_gray(pix):
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in pix)
    return (sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def pixels(a, b, c):
    return [[(a * x + b * y + c * x * y) % 256 for x in range(W)]
            for y in range(H)]


def dhash(pix):
    h = 0
    for y in range(H):
        for x in range(W - 1):
            if pix[y][x + 1] > pix[y][x]:
                h |= 1 << (y * (W - 1) + x)
    return h


PARAMS = [
    (40, 3, 0, ""),      # wrapping ramp
    (40, 3, 0, "_dup"),  # exact duplicate (hamming 0)
    (40, 3, 1, ""),      # near-duplicate of the ramp
    (150, 90, 5, ""),    # busy pattern, far from the ramp
    (1, 0, 0, ""),       # monotone ascend (all bits 1)
    (255, 0, 0, ""),     # monotone descend mod 256 (all bits 0)
]

if __name__ == "__main__":
    os.makedirs(ROOT, exist_ok=True)
    hashes = {}
    for a, b, c, sfx in PARAMS:
        name = f"grad_{a}_{b}_{c}{sfx}.png"
        pix = pixels(a, b, c)
        with open(os.path.join(ROOT, name), "wb") as f:
            f.write(png_gray(pix))
        hashes[name] = dhash(pix)
        print(f"{name}: {dhash(pix):016x}")
    names = sorted(hashes)
    for i, na in enumerate(names):
        for nb in names[i + 1:]:
            d = bin(hashes[na] ^ hashes[nb]).count("1")
            # band collision (4 x 16-bit) => candidate pair
            bands = any((hashes[na] >> (k * 16)) & 0xFFFF ==
                        (hashes[nb] >> (k * 16)) & 0xFFFF for k in range(4))
            print(f"{na} ~ {nb}: hamming={d} candidate={bands}")
