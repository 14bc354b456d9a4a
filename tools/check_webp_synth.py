#!/usr/bin/env python3
"""Validate WebpCodec.synth output against the system libwebp.

Usage: check_webp_synth.py <file.webp> <w> <h> <seed>

Decodes a Scala-synthesized VP8L stream with libwebp (the reference
implementation) and asserts every pixel matches the closed-form
gradient (x mod 256, y mod 256, (x+y+seed) mod 256). This is the
encoder-direction counterpart of WebpCodecSpec's fixture tests.
"""
import ctypes
import sys

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
LIB.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LIB.WebPFree.argtypes = [ctypes.c_void_p]


def main(path, w, h, seed):
    data = open(path, "rb").read()
    dw = ctypes.c_int()
    dh = ctypes.c_int()
    p = LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(dw), ctypes.byref(dh))
    assert p, "libwebp rejected the synth stream"
    raw = ctypes.string_at(p, dw.value * dh.value * 4)
    LIB.WebPFree(p)
    assert (dw.value, dh.value) == (w, h), (dw.value, dh.value)
    for y in range(h):
        for x in range(w):
            o = (y * w + x) * 4
            exp = (x % 256, y % 256, (x + y + seed) % 256, 255)
            got = tuple(raw[o:o + 4])
            assert got == exp, (x, y, got, exp)
    print(f"OK: libwebp decodes synth {w}x{h} seed={seed} pixel-exactly")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], *map(int, sys.argv[2:5])))
