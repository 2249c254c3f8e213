#!/usr/bin/env python3
"""Independent ground truth for q_mm_phash_real (driver-side tooling,
never on the engine classpath).

Pure-Python PNG decode (zlib inflate + scanline unfilter -- no image
library, the q_mm_image_decode precedent) of the committed fixtures,
then the same 8x8 luma-grid aHash spec as Multimodal.phashLuma:
integer Rec.709 fixed-point luma sums per ((y*gh)//h, (x*gw)//w) cell,
bit set iff cellSum * totalPx > totalSum * cellPx (exact integers).

Usage: python3 tools/phash_truth.py src/test/resources/media/img_*.png
Prints (media_id, w, h, signed-64-bit phash) rows for the oracle VALUES.
"""
import struct, sys, zlib


def decode_png(path):
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", path
    pos, idat, w, h, ct = 8, b"", None, None, None
    while pos < len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h, bitd, ct = struct.unpack(">IIBB", chunk[:10])
            assert bitd == 8 and ct in (2, 6), (path, bitd, ct)
        elif typ == b"IDAT":
            idat += chunk
        pos += 12 + ln
    raw = zlib.decompress(idat)
    ch = {2: 3, 6: 4}[ct]
    stride = w * ch
    out, prev, pos = bytearray(), bytearray(stride), 0
    for _ in range(h):
        f = raw[pos]
        pos += 1
        line = bytearray(raw[pos:pos + stride])
        pos += stride
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 1:
                line[x] = (line[x] + a) & 255
            elif f == 2:
                line[x] = (line[x] + b) & 255
            elif f == 3:
                line[x] = (line[x] + (a + b) // 2) & 255
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 255
        out += line
        prev = line
    return w, h, ch, out


def phash(path, gw=8, gh=8):
    w, h, ch, px = decode_png(path)
    sums = [0] * (gw * gh)
    cnts = [0] * (gw * gh)
    for y in range(h):
        base = y * w * ch
        gy = (y * gh // h) * gw
        for x in range(w):
            o = base + x * ch
            cell = gy + x * gw // w
            sums[cell] += 2126 * px[o] + 7152 * px[o + 1] + 722 * px[o + 2]
            cnts[cell] += 1
    tot, npx = sum(sums), w * h
    bits = 0
    for c in range(gw * gh):
        if cnts[c] and sums[c] * npx > tot * cnts[c]:
            bits |= 1 << c
    if bits >= 1 << 63:
        bits -= 1 << 64
    return w, h, bits


if __name__ == "__main__":
    import re
    rows = []
    for p in sorted(sys.argv[1:]):
        mid = int(re.search(r"img_(\d+)", p).group(1))
        rows.append((mid,) + phash(p))
    for r in rows:
        print(r)
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            x = (rows[i][3] ^ rows[j][3]) & ((1 << 64) - 1)
            print(f"hamming({rows[i][0]},{rows[j][0]}) =", bin(x).count("1"))
