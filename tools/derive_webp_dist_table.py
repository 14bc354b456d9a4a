#!/usr/bin/env python3
"""Empirically derive the VP8L 2D near-distance map from libwebp.

VP8L LZ77 distance codes 1..120 are a table of (dx, dy) screen offsets
rather than linear distances. Instead of trusting a transcription of
the table, this probe hand-crafts a minimal VP8L bitstream per code —
145 literal pixels whose (red, blue) channels encode their own index,
then ONE length-1 backward reference with distance code k — decodes it
with the container's libwebp (the reference implementation), and reads
back which source pixel the copy fetched. That pins (dx, dy) for every
k from the decoder everyone actually runs, and doubles as an end-to-end
check of the probe author's understanding of the bitstream (huffman
framing, bit order, prefix codes): libwebp rejects or mis-decodes the
stream if any of it is wrong.

Output: a Scala array literal for WebpCodec.DistMap, printed to stdout.
Also verifies linear codes (>120) for a couple of values.
"""
import ctypes
import sys

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
LIB.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LIB.WebPFree.argtypes = [ctypes.c_void_p]

W, H = 17, 9          # 153 pixels; copy lands at index 145
COPY_AT = 145

CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
            14, 15]


class Bw:
    """LSB-first bit writer (VP8L bit order)."""

    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, bits):          # value, LSB-first
        self.acc |= (v & ((1 << bits) - 1)) << self.n
        self.n += bits
        while self.n >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def put_code(self, code, length):  # huffman code, MSB-first bit by bit
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def done(self):
        if self.n:
            self.bytes.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.bytes)


def put_green_code(b):
    """Normal code: symbols 0 and 256 at length 1 (literal green=0, len code 0)."""
    b.put(0, 1)                      # not simple
    b.put(0, 4)                      # num_code_lengths = 4 -> [17,18,0,1]
    for cl in (0, 1, 0, 1):          # 17:0 18:1 0:0 1:1
        b.put(cl, 3)
    b.put(0, 1)                      # no max_symbol
    # CL huffman: syms {1,18} len 1 -> code(1)=0, code(18)=1
    b.put_code(0, 1)                 # symbol 0 gets length 1
    b.put_code(1, 1); b.put(127, 7)  # 18: repeat 0 x138  (syms 1..138)
    b.put_code(1, 1); b.put(106, 7)  # 18: repeat 0 x117  (syms 139..255)
    b.put_code(0, 1)                 # symbol 256 gets length 1
    b.put_code(1, 1); b.put(12, 7)   # 18: repeat 0 x23   (syms 257..279)


def put_flat8_code(b):
    """Normal code: all 256 symbols at length 8 (code(s) = s)."""
    b.put(0, 1)                      # not simple
    b.put(8, 4)                      # num_code_lengths = 12 -> ...8 last
    for i in range(11):
        b.put(0, 3)
    b.put(1, 3)                      # CL symbol 8 -> length 1 (single: 0 bits)
    b.put(0, 1)                      # no max_symbol
    # 256 zero-bit reads of '8' follow implicitly: nothing to write


def put_simple_single(b, sym):
    b.put(1, 1)                      # simple
    b.put(0, 1)                      # 1 symbol
    b.put(1, 1)                      # 8-bit symbol
    b.put(sym, 8)


def dist_prefix(v):
    """Inverse of the VP8L prefix decode: value v -> (code, extra, bits)."""
    if v <= 4:
        return v - 1, 0, 0
    vm = v - 1                       # decoded value = offset + extra + 1
    hi = vm.bit_length() - 1         # so vm = (2+(c&1))<<e | extra
    e = hi - 1
    top = vm >> e                    # 2 or 3
    code = 2 * e + (top & 1) + 2 - 2
    code = (e << 1) + (top - 2)      # e = (code-2)>>1... re-derive:
    code = 2 + (top - 2) + 2 * e     # code = 2e + 2 + (top-2)
    extra = vm & ((1 << e) - 1)
    return code, extra, e


def probe_stream(dist_value):
    b = Bw()
    b.put(0x2F, 8)
    b.put(W - 1, 14)
    b.put(H - 1, 14)
    b.put(0, 1)                      # no alpha
    b.put(0, 3)                      # version
    b.put(0, 1)                      # no transforms
    b.put(0, 1)                      # no color cache
    b.put(0, 1)                      # no meta huffman
    code, extra, ebits = dist_prefix(dist_value)
    put_green_code(b)
    put_flat8_code(b)                # red
    put_flat8_code(b)                # blue
    put_simple_single(b, 255)        # alpha
    put_simple_single(b, code)       # distance: single known code
    def literal(i):
        b.put_code(0, 1)             # green sym 0
        b.put_code(i & 0xFF, 8)      # red
        b.put_code((i >> 8) & 0xFF, 8)  # blue
    for i in range(COPY_AT):
        literal(i)
    b.put_code(1, 1)                 # green sym 256: length code 0 -> len 1
    if ebits:
        b.put(extra, ebits)          # distance extra bits (sym itself: 0 bits)
    for i in range(COPY_AT + 1, W * H):
        literal(i)
    payload = b.done()
    if len(payload) % 2:
        payload += b"\x00"
    riff = b"WEBPVP8L" + len(payload).to_bytes(4, "little") + payload
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def decode(data):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    raw = ctypes.string_at(p, w.value * h.value * 4)
    LIB.WebPFree(p)
    return w.value, h.value, raw


def main():
    table = []
    for dist_code in range(1, 121):
        out = decode(probe_stream(dist_code))
        if out is None:
            print(f"code {dist_code}: libwebp REJECTED stream", file=sys.stderr)
            return 1
        w, h, raw = out
        r = raw[COPY_AT * 4]
        bl = raw[COPY_AT * 4 + 2]
        src = r | (bl << 8)
        dist = COPY_AT - src
        dy = (dist + 8) // W
        dx = dist - dy * W
        table.append((dx, dy))
    # sanity: linear codes decode to dist = code - 120
    for v in (121, 130, 150):
        w, h, raw = decode(probe_stream(v))
        r = raw[COPY_AT * 4]
        bl = raw[COPY_AT * 4 + 2]
        assert COPY_AT - (r | (bl << 8)) == v - 120, v
    print("// derived from libwebp 7.1.5 by tools/derive_webp_dist_table.py")
    print("// (dx, dy) packed as (dy << 8) | (dx + 8)")
    vals = [f"0x{(dy << 8) | (dx + 8):03x}" for dx, dy in table]
    for i in range(0, 120, 10):
        print("    " + ", ".join(vals[i:i + 10]) + ",")
    for i in range(0, 120, 8):
        print("//", table[i:i + 8])
    return 0


if __name__ == "__main__":
    sys.exit(main())
