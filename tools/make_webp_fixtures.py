#!/usr/bin/env python3
"""Generate WebP-lossless (VP8L) conformance fixtures for WebpCodecSpec.

Drives the container's system libwebp (the reference implementation,
/usr/lib/x86_64-linux-gnu/libwebp.so.7) through ctypes to encode a set
of deterministic synthetic images chosen to make the encoder emit every
VP8L feature the decoder must handle: predictor/cross-color/
subtract-green transforms, color-indexing with all three pixel-bundling
widths, color cache, LZ77 backward references (incl. the 120-entry 2D
near-distance map), meta-Huffman groups on larger images, and native
alpha. Each fixture is written as NAME.webp plus NAME.rgba — the raw
RGBA pixels libwebp ITSELF decodes back out — so the Scala decoder is
checked byte-for-byte against an independent implementation, not
against its own round-trip.

This is a fixture GENERATOR, run once at build-authoring time; the
library under test (src/main) never links or shells out to libwebp.
Deterministic: same script -> same bytes (libwebp lossless encoding is
deterministic for a fixed input and version; the encoded .webp files
are committed, so tests do not re-run this).
"""
import ctypes
import os
import struct
import sys

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
LIB.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
LIB.WebPEncodeLosslessRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
LIB.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeLosslessRGBA.argtypes = LIB.WebPEncodeLosslessRGB.argtypes
LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
LIB.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LIB.WebPFree.argtypes = [ctypes.c_void_p]

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "webp")


def encode(rgb: bytes, w: int, h: int, alpha: bool) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    fn = LIB.WebPEncodeLosslessRGBA if alpha else LIB.WebPEncodeLosslessRGB
    stride = w * (4 if alpha else 3)
    n = fn(rgb, w, h, stride, ctypes.byref(out))
    if n == 0:
        raise RuntimeError("encode failed")
    data = ctypes.string_at(out, n)
    LIB.WebPFree(out)
    return data


def decode_rgba(data: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise RuntimeError("decode failed")
    raw = ctypes.string_at(p, w.value * h.value * 4)
    LIB.WebPFree(p)
    return w.value, h.value, raw


def lcg(seed):
    s = seed & 0xFFFFFFFF
    while True:
        s = (s * 1103515245 + 12345) & 0xFFFFFFFF
        yield (s >> 16) & 0xFF


def gradient(w, h):  # smooth -> predictor + subtract-green transforms
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(((x * 255 // max(w - 1, 1)),
                         (y * 255 // max(h - 1, 1)),
                         ((x + y) % 256)))
    return bytes(px)


def noise(w, h, seed):  # high-entropy -> color cache, varied literals
    g = lcg(seed)
    return bytes(next(g) for _ in range(w * h * 3))


def smooth_noise(w, h, seed):  # photo-ish: noise blurred by running mean
    g = lcg(seed)
    px = bytearray(w * h * 3)
    prev = [128, 128, 128]
    i = 0
    for _ in range(w * h):
        for c in range(3):
            prev[c] = (prev[c] * 3 + next(g)) // 4
            px[i] = prev[c]
            i += 1
    return bytes(px)


def palette(w, h, colors, seed):  # -> color-indexing transform
    g = lcg(seed)
    pal = [(next(g), next(g), next(g)) for _ in range(colors)]
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(pal[(x * 7 + y * 13 + next(g)) % colors])
    return bytes(px)


def tiles(w, h, t, seed):  # exact repeats -> LZ77 incl. 2D near distances
    base = noise(t, t, seed)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            s = ((y % t) * t + (x % t)) * 3
            px += base[s:s + 3]
    return bytes(px)


def quadrants(w, h, seed):  # wildly different region statistics ->
    # per-block entropy groups (meta-Huffman image)
    g = lcg(seed)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            if x < w // 2 and y < h // 2:
                px += bytes((200, 60, 60))          # flat
            elif x >= w // 2 and y < h // 2:
                px += bytes((next(g), next(g), next(g)))  # noise
            elif x < w // 2:
                px += bytes((x % 256, y % 256, (x + y) % 256))  # gradient
            else:
                t = ((x % 8) * 8 + (y % 8) * 29) % 256          # tiles
                px += bytes((t, 255 - t, t ^ 0x55))
    return bytes(px)


def rgba_rings(w, h):  # native VP8L alpha channel
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes((x % 256, y % 256, (x * y) % 256,
                         255 - ((x + 2 * y) % 128)))
    return bytes(px)


def main():
    os.makedirs(OUT, exist_ok=True)
    fixtures = [
        ("gradient_64x48", gradient(64, 48), 64, 48, False),
        ("smooth_128x96", smooth_noise(128, 96, 7), 128, 96, False),
        ("noise_48x32", noise(48, 32, 99), 48, 32, False),
        ("pal2_33x17", palette(33, 17, 2, 3), 33, 17, False),
        ("pal4_40x40", palette(40, 40, 4, 4), 40, 40, False),
        ("pal13_57x23", palette(57, 23, 13, 5), 57, 23, False),
        ("pal40_64x64", palette(64, 64, 40, 6), 64, 64, False),
        ("tiles_64x64", tiles(64, 64, 16, 11), 64, 64, False),
        ("tiles_96x80", tiles(96, 80, 8, 12), 96, 80, False),
        ("big_300x200", smooth_noise(300, 200, 21), 300, 200, False),
        ("quads_400x300", quadrants(400, 300, 31), 400, 300, False),
        ("wide_256x1", gradient(256, 1), 256, 1, False),
        ("tall_1x256", gradient(1, 256), 1, 256, False),
        ("tiny_7x5", gradient(7, 5), 7, 5, False),
        ("one_1x1", bytes((17, 203, 88)), 1, 1, False),
        ("alpha_80x60", rgba_rings(80, 60), 80, 60, True),
    ]
    manifest = []
    for name, px, w, h, alpha in fixtures:
        data = encode(px, w, h, alpha)
        dw, dh, rgba = decode_rgba(data)
        assert (dw, dh) == (w, h), (name, dw, dh)
        with open(os.path.join(OUT, name + ".webp"), "wb") as f:
            f.write(data)
        with open(os.path.join(OUT, name + ".rgba"), "wb") as f:
            f.write(rgba)
        fourcc = data[12:16].decode()
        manifest.append(f"{name} {w} {h} {len(data)} {fourcc}")
        print(manifest[-1])
    with open(os.path.join(OUT, "MANIFEST.txt"), "w") as f:
        f.write("\n".join(manifest) + "\n")


if __name__ == "__main__":
    sys.exit(main())
