"""Multimodal column plumbing (driver brief): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The Spark-side contract — schemas, partitioning, batch shape, UDF signatures
— is real and tested. Decoding is pure-python/stdlib where the format allows:
full pixel/sample decode for BMP, PPM, PNG (zlib inflate + filter reversal),
JPEG — BOTH baseline-sequential AND progressive (Huffman entropy decode
incl. spectral selection + successive approximation + dequant + matrix IDCT
+ chroma upsample + YCbCr→RGB, ITU T.81 Annexes F and G) — and WAV PCM;
header-true metadata (true dimensions / duration / cadence, no entropy
decode) for WebP (VP8/VP8L/VP8X),
MP4 (ISO-BMFF box walk), AVI, MKV/WebM (EBML walk), FLAC (STREAMINFO) and
MP3 (frame header + Xing). Only formats whose
METADATA needs a codec library (HEIC/AVIF/AAC/Opus/...) are stubbed behind a
loud ``NotImplementedError``; swapping in PIL/ffmpeg is a one-function change
per modality — everything around it (how bytes flow through Arrow, how
features land in columns, how work is partitioned) is the production design.

Scale notes: media bytes never hit the driver; ``mapInPandas`` streams Arrow
record batches through the Python worker, so peak memory is one batch, not
one partition (`spark.sql.execution.arrow.maxRecordsPerBatch` bounds rows per
batch — set it low for large blobs). Partition by content id so a later join
back to metadata is co-partitioned.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata for an opaque media blob (the lakehouse-standard shape:
# bytes + enough metadata to filter WITHOUT decoding).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),  # -1 when unknown/NA
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image_stub(content: bytes) -> "object":
    """STUB for COMPRESSED formats: real implementation would be
    ``PIL.Image.open(BytesIO(content))``. Raises so accidental production use
    is loud. Uncompressed BMP and PPM decode FOR REAL via ``decode_image``
    below — no external library needed."""
    raise NotImplementedError(
        "compressed-media decoding is stubbed in this environment — plug "
        "PIL/ffmpeg here (BMP/PPM decode natively via decode_image)"
    )


def _decode_bmp(b: bytes) -> dict | None:
    """Pure-python decode of an uncompressed 24-bit BMP (BITMAPINFOHEADER):
    true dimensions + mean RGB. Returns None if not a BMP; dims-only (means
    None) for BMP variants this parser doesn't walk (other bpp/compression)."""
    import struct

    if len(b) < 54 or b[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", b, 10)[0]
    w = struct.unpack_from("<i", b, 18)[0]
    h_raw = struct.unpack_from("<i", b, 22)[0]
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    h = abs(h_raw)
    out = {"width": w, "height": h, "mean_r": None, "mean_g": None, "mean_b": None}
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return out
    row_size = ((w * 3 + 3) // 4) * 4  # rows padded to 4 bytes
    if len(b) < data_off + h * row_size:
        return out
    sr = sg = sb = 0
    for r in range(h):
        off = data_off + r * row_size
        row = b[off : off + w * 3]
        sb += sum(row[0::3])  # pixels are stored B,G,R
        sg += sum(row[1::3])
        sr += sum(row[2::3])
    n = w * h
    out.update(mean_r=sr / n, mean_g=sg / n, mean_b=sb / n)
    return out


def _decode_ppm(b: bytes) -> dict | None:
    """Pure-python decode of a binary PPM (P6): dimensions + mean RGB."""
    if b[:2] != b"P6":
        return None
    # header: "P6" <ws> width <ws> height <ws> maxval <single-ws> raster
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(b):
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        token = b[start:pos]
        if not token.isdigit():
            return None  # "P6" magic but corrupt header — not a PPM
        fields.append(int(token))
    pos += 1  # the single whitespace after maxval
    if len(fields) < 3:
        return None
    w, h, maxval = fields
    out = {"width": w, "height": h, "mean_r": None, "mean_g": None, "mean_b": None}
    raster = b[pos : pos + w * h * 3]
    if maxval > 255 or len(raster) < w * h * 3:
        return out  # 16-bit or truncated: dims only
    n = w * h
    out.update(
        mean_r=sum(raster[0::3]) / n,
        mean_g=sum(raster[1::3]) / n,
        mean_b=sum(raster[2::3]) / n,
    )
    return out


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filtering (types 0-4: None/Sub/Up/Average/Paeth).
    ``raw`` is the inflated IDAT stream: h rows of 1 filter byte + w*bpp
    sample bytes."""
    stride = w * bpp
    out = bytearray(h * stride)
    prev_off = -1
    pos = 0
    for r in range(h):
        ftype = raw[pos]
        pos += 1
        row_off = r * stride
        line = raw[pos : pos + stride]
        pos += stride
        if ftype == 0:  # None
            out[row_off : row_off + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                left = out[row_off + i - bpp] if i >= bpp else 0
                out[row_off + i] = (line[i] + left) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                up = out[prev_off + i] if prev_off >= 0 else 0
                out[row_off + i] = (line[i] + up) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[row_off + i - bpp] if i >= bpp else 0
                up = out[prev_off + i] if prev_off >= 0 else 0
                out[row_off + i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = out[row_off + i - bpp] if i >= bpp else 0
                b = out[prev_off + i] if prev_off >= 0 else 0
                c = out[prev_off + i - bpp] if (prev_off >= 0 and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[row_off + i] = (line[i] + pred) & 0xFF
        else:  # unknown filter type: give up on pixel data
            raise ValueError(f"bad PNG filter {ftype}")
        prev_off = row_off
    return out


def _decode_png(b: bytes) -> dict | None:
    """Pure-python PNG decode — a real COMPRESSED-format path, stdlib only:
    chunk walk → zlib-inflate IDAT → reverse scanline filters → mean RGB.
    Supports the dominant shapes (8-bit truecolor RGB/RGBA, non-interlaced);
    other color types / interlacing return dims-only (means None), never a
    wrong answer. Returns None if the blob is not a PNG."""
    import zlib

    if len(b) < 8 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos : pos + 4], "big")
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, interlace = ihdr[8], ihdr[9], ihdr[12]
    out = {"width": w, "height": h, "mean_r": None, "mean_g": None, "mean_b": None}
    if depth != 8 or ctype not in (2, 6) or interlace != 0 or w <= 0 or h <= 0:
        return out
    bpp = 3 if ctype == 2 else 4
    try:
        raw = zlib.decompress(b"".join(idat))
        if len(raw) < h * (1 + w * bpp):
            return out
        px = _png_unfilter(raw, w, h, bpp)
    except Exception:
        return out
    n = w * h
    out.update(
        mean_r=sum(px[0::bpp]) / n,
        mean_g=sum(px[1::bpp]) / n,
        mean_b=sum(px[2::bpp]) / n,
    )
    return out


def _exif_orientation(t: bytes) -> int | None:
    """Orientation (tag 0x0112) from a TIFF blob (the bytes after APP1's
    ``Exif\\0\\0`` preamble). Walks IFD0 only — orientation lives there."""
    if len(t) < 8:
        return None
    if t[:2] == b"II":
        endian = "little"
    elif t[:2] == b"MM":
        endian = "big"
    else:
        return None
    if int.from_bytes(t[2:4], endian) != 42:
        return None
    off = int.from_bytes(t[4:8], endian)
    if off + 2 > len(t):
        return None
    cnt = int.from_bytes(t[off : off + 2], endian)
    for i in range(cnt):
        e = off + 2 + 12 * i
        if e + 12 > len(t):
            return None
        if int.from_bytes(t[e : e + 2], endian) == 0x0112:
            # value type is SHORT: first 2 bytes of the 4-byte value field
            v = int.from_bytes(t[e + 8 : e + 10], endian)
            return v if 1 <= v <= 8 else None
    return None


# Zigzag scan order (ITU T.81 Figure A.6): index i in scan order → natural
# row-major position _ZIGZAG[i] in the 8×8 block.
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any non-stuffing marker (RST/EOI/next segment)."""

    __slots__ = ("data", "pos", "bits", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d, p = self.data, self.pos
        if p >= len(d):
            return False
        byte = d[p]
        if byte == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2  # stuffed data byte
            else:
                return False  # real marker: no more entropy data
        else:
            self.pos = p + 1
        self.bits = (self.bits << 8) | byte
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                raise EOFError("truncated entropy data")
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return out

    def align_to_marker(self) -> int | None:
        """Drop partial-byte padding and return the marker byte at the
        cursor (0xD0-0xD7 for restarts), advancing past it."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1  # fill bytes
        if p + 1 < len(d) and d[p] == 0xFF:
            self.pos = p + 2
            return d[p + 1]
        return None


def _jpeg_huff_table(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman decode table from a DHT segment's BITS/HUFFVAL
    (T.81 Annex C): maps (code_length, code) → symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_huff_decode(r: _JpegBitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    """DC/AC magnitude-category sign extension (T.81 F.2.2.1)."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _jpeg_decode_block_prog(
    reader, blk, tdc, tac, ss, se, ah, al, pred, eobrun
):
    """Decode ONE block's contribution for one PROGRESSIVE scan (T.81
    Annex G; the traversal mirrors the spec's G.1.2.2/G.1.2.3 flow).
    Returns (new_pred, new_eobrun)."""
    if ss == 0:  # DC scan
        if ah == 0:  # first pass: diff-coded, scaled by 2^Al
            s = _jpeg_huff_decode(reader, tdc)
            pred += _jpeg_extend(reader.read(s), s) if s else 0
            blk[0] = pred << al
        else:  # refinement: one appended bit
            if reader.read(1):
                blk[0] |= 1 << al
        return pred, eobrun
    if ah == 0:  # AC first pass over the spectral band
        if eobrun > 0:
            return pred, eobrun - 1
        k = ss
        while k <= se:
            rs = _jpeg_huff_decode(reader, tac)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read(r)
                    return pred, eobrun
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[_ZIGZAG[k]] = _jpeg_extend(reader.read(s), s) * (1 << al)
            k += 1
        return pred, eobrun
    # AC refinement pass: correction bits for known coefficients, ±2^Al
    # births for new ones
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _jpeg_huff_decode(reader, tac)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if reader.read(1) else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read(r)
                break
            while k <= se:  # skip r zero-history coefs, correcting en route
                z = _ZIGZAG[k]
                if blk[z] != 0:
                    if reader.read(1) and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[_ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:  # EOB span: corrections only through the band's end
        while k <= se:
            z = _ZIGZAG[k]
            if blk[z] != 0:
                if reader.read(1) and (blk[z] & p1) == 0:
                    blk[z] += p1 if blk[z] >= 0 else m1
            k += 1
        eobrun -= 1
    return pred, eobrun


def _jpeg_decode_block_seq(reader, blk, tdc, tac, pred):
    """Sequential-baseline block decode: DC diff + AC run-length (T.81
    F.2.2). Returns the new DC prediction."""
    s = _jpeg_huff_decode(reader, tdc)
    pred += _jpeg_extend(reader.read(s), s) if s else 0
    blk[0] = pred
    z = 1
    while z < 64:
        rs = _jpeg_huff_decode(reader, tac)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                break  # EOB
            z += 16
            continue
        z += r
        if z > 63:
            raise ValueError("AC run past block end")
        blk[_ZIGZAG[z]] = _jpeg_extend(reader.read(s), s)
        z += 1
    return pred


def _jpeg_decode_pixels(b: bytes) -> tuple[int, int, bytes] | None:
    """Huffman JPEG → interleaved RGB888 raster, pure python + numpy
    (public spec, ITU T.81): marker walk → DQT/DHT/DRI/SOF/SOS(es) →
    entropy decode into per-component coefficient grids → dequantize →
    batched matrix IDCT (one einsum per component) → integer-ratio
    chroma upsample → YCbCr→RGB. Covers BOTH frame types that dominate
    the web: SOF0 baseline-sequential AND SOF2 progressive (spectral
    selection + successive approximation, DC and AC first/refinement
    scans, interleaved and non-interleaved, restart markers, multi-scan
    table redefinition). Returns None for anything outside that scope
    (arithmetic coding, 12-bit, lossless/hierarchical, fractional
    sampling) so callers fall back to the header-only path. Grayscale
    replicates Y into all three channels."""
    import numpy as np

    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → decode table
    frame = None  # (h, w, comps, progressive) comps: [(cid, hs, vs, tq)]
    restart_interval = 0
    grids: list | None = None  # per comp (blocks_y, blocks_x, 64) int32
    nat_dims: list | None = None  # per comp non-interleaved (bh, bw)
    geom = None  # (mcus_x, mcus_y)
    saw_scan = False
    pos, n = 2, len(b)
    while pos + 2 <= n:
        if b[pos] != 0xFF:
            pos += 1
            continue
        while pos < n and b[pos] == 0xFF:
            pos += 1
        if pos >= n:
            break
        marker = b[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        if pos + 2 > n:
            break
        seglen = int.from_bytes(b[pos : pos + 2], "big")
        if seglen < 2:
            break
        payload = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            q = 0
            while q + 1 <= len(payload):
                pq, tq = payload[q] >> 4, payload[q] & 0xF
                q += 1
                if pq == 0:
                    vals = list(payload[q : q + 64])
                    q += 64
                else:
                    vals = [
                        int.from_bytes(payload[q + 2 * i : q + 2 * i + 2], "big")
                        for i in range(64)
                    ]
                    q += 128
                if len(vals) < 64:
                    return None
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZIGZAG] = vals  # store in natural order
                qt[tq] = tab.reshape(8, 8)
        elif marker == 0xC4:  # DHT (may redefine tables between scans)
            q = 0
            while q + 17 <= len(payload):
                tc, th = payload[q] >> 4, payload[q] & 0xF
                bits = list(payload[q + 1 : q + 17])
                cnt = sum(bits)
                vals = payload[q + 17 : q + 17 + cnt]
                if len(vals) < cnt:
                    return None
                huff[(tc, th)] = _jpeg_huff_table(bits, vals)
                q += 17 + cnt
        elif marker == 0xDD and len(payload) >= 2:  # DRI
            restart_interval = int.from_bytes(payload[:2], "big")
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if len(payload) < 6 or payload[0] != 8:
                return None
            fh = int.from_bytes(payload[1:3], "big")
            fw = int.from_bytes(payload[3:5], "big")
            nc = payload[5]
            if nc not in (1, 3) or len(payload) < 6 + 3 * nc or not fh or not fw:
                return None
            comps = []
            for i in range(nc):
                cid, samp, tqi = payload[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0xF, tqi))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if hmax == 0 or vmax == 0:
                return None
            for _, hs, vs, _ in comps:
                if hs == 0 or vs == 0 or hmax % hs or vmax % vs:
                    return None  # fractional sampling: out of scope
            mcus_x = -(-fw // (8 * hmax))
            mcus_y = -(-fh // (8 * vmax))
            geom = (mcus_x, mcus_y)
            grids = [
                np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int32)
                for _, hs, vs, _ in comps
            ]
            # non-interleaved scans code the component's TRUE block grid
            # (no MCU padding blocks): ceil(ceil(dim*samp/max)/8)
            def _ceil(a, b):
                return -(-a // b)

            nat_dims = [
                (
                    _ceil(_ceil(fh * vs, vmax), 8),
                    _ceil(_ceil(fw * hs, hmax), 8),
                )
                for _, hs, vs, _ in comps
            ]
            frame = (fh, fw, comps, marker == 0xC2)
        elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # arithmetic/lossless/hierarchical: out of scope
        elif marker == 0xDA:  # SOS — decode this scan's entropy data now
            if frame is None or len(payload) < 4:
                return None
            fh, fw, comps, progressive = frame
            ns = payload[0]
            if len(payload) < 1 + 2 * ns + 3:
                return None
            scan_comps = []  # (ci, tdc table | None, tac table | None)
            for i in range(ns):
                cs, tt = payload[1 + 2 * i : 3 + 2 * i]
                ci = next(
                    (j for j, c in enumerate(comps) if c[0] == cs), None
                )
                if ci is None:
                    return None
                scan_comps.append((ci, tt >> 4, tt & 0xF))
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            if ss > se or se > 63 or (ss == 0 and progressive and se != 0):
                return None
            if ss > 0 and ns != 1:
                return None  # AC scans are single-component by spec
            resolved = []
            for ci, td, ta in scan_comps:
                need_dc = (ss == 0 and ah == 0) or not progressive
                need_ac = ss > 0 or not progressive
                tdc = huff.get((0, td))
                tac = huff.get((1, ta))
                if (need_dc and tdc is None) or (need_ac and tac is None):
                    return None
                resolved.append((ci, tdc, tac))
            mcus_x, mcus_y = geom
            interleaved = ns > 1
            units = (
                mcus_x * mcus_y
                if interleaved
                else nat_dims[resolved[0][0]][0] * nat_dims[resolved[0][0]][1]
            )
            reader = _JpegBitReader(b, pos + seglen)
            pred = [0] * len(comps)
            eobrun = 0
            try:
                for u in range(units):
                    if restart_interval and u and u % restart_interval == 0:
                        m = reader.align_to_marker()
                        if m is None or not 0xD0 <= m <= 0xD7:
                            return None
                        pred = [0] * len(comps)
                        eobrun = 0
                    if interleaved:
                        my, mx = divmod(u, mcus_x)
                        for ci, tdc, tac in resolved:
                            _, hs, vs, _ = comps[ci]
                            for v in range(vs):
                                for hh in range(hs):
                                    blk = grids[ci][my * vs + v, mx * hs + hh]
                                    if progressive:
                                        pred[ci], eobrun = _jpeg_decode_block_prog(
                                            reader, blk, tdc, tac,
                                            ss, se, ah, al, pred[ci], eobrun,
                                        )
                                    else:
                                        pred[ci] = _jpeg_decode_block_seq(
                                            reader, blk, tdc, tac, pred[ci]
                                        )
                    else:
                        ci, tdc, tac = resolved[0]
                        bw = nat_dims[ci][1]
                        by_, bx_ = divmod(u, bw)
                        blk = grids[ci][by_, bx_]
                        if progressive:
                            pred[ci], eobrun = _jpeg_decode_block_prog(
                                reader, blk, tdc, tac,
                                ss, se, ah, al, pred[ci], eobrun,
                            )
                        else:
                            pred[ci] = _jpeg_decode_block_seq(
                                reader, blk, tdc, tac, pred[ci]
                            )
            except (EOFError, ValueError):
                return None
            saw_scan = True
            reader.bits = reader.nbits = 0
            pos = reader.pos  # resume the marker walk after entropy data
            continue
        pos += seglen
    if frame is None or not saw_scan or grids is None:
        return None
    fh, fw, comps, _ = frame
    mcus_x, mcus_y = geom
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # dequantize + batched IDCT per component (A.T @ C @ A, orthonormal
    # DCT-II basis), then stitch blocks into the component plane
    k8 = np.arange(8)
    A = np.cos((2 * k8[None, :] + 1) * k8[:, None] * np.pi / 16) * 0.5
    A[0, :] *= 1 / np.sqrt(2.0)
    planes = []
    for ci, (_, hs, vs, tqi) in enumerate(comps):
        if tqi not in qt:
            return None
        g = grids[ci]
        by, bx = g.shape[:2]
        blocks = (g.reshape(-1, 8, 8) * qt[tqi][None, :, :]).astype(np.float64)
        px = np.einsum("ij,njk,kl->nil", A.T, blocks, A) + 128.0
        plane = px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(
            by * 8, bx * 8
        )
        plane = np.repeat(np.repeat(plane, vmax // vs, 0), hmax // hs, 1)
        planes.append(plane[:fh, :fw])
    out = np.empty((fh, fw, 3), dtype=np.float64)
    if len(planes) == 1:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = planes[0]
    else:
        y, cb, cr = planes
        out[:, :, 0] = y + 1.402 * (cr - 128.0)
        out[:, :, 1] = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        out[:, :, 2] = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return fw, fh, rgb.tobytes()


def _decode_jpeg(b: bytes) -> dict | None:
    """JPEG decode — marker-walk to the SOF0/SOF2 frame header (precision,
    height, width, components) and EXIF orientation from APP1 so
    rotated-capture photos report their DISPLAY dimensions (orientations
    5-8 transpose). For Huffman files — BASELINE and PROGRESSIVE alike —
    the pixel means are REAL: the full pure-python entropy decode
    (:func:`_jpeg_decode_pixels`) runs and averages the RGB raster;
    arithmetic-coded/12-bit files stay header-true with means None.
    Returns None if not JPEG."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    orientation, width, height, ncomp, progressive = 1, None, None, None, False
    pos, n = 2, len(b)
    while pos + 2 <= n:
        if b[pos] != 0xFF:
            pos += 1  # resync on stray byte
            continue
        while pos < n and b[pos] == 0xFF:
            pos += 1  # fill bytes
        if pos >= n:
            break
        marker = b[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no length
        if marker in (0xD9, 0xDA):  # EOI / SOS: entropy data follows
            break
        if pos + 2 > n:
            break
        seglen = int.from_bytes(b[pos : pos + 2], "big")
        if seglen < 2:
            break
        payload = b[pos + 2 : pos + seglen]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if len(payload) >= 6:
                height = int.from_bytes(payload[1:3], "big")
                width = int.from_bytes(payload[3:5], "big")
                ncomp = payload[5]
                progressive = marker == 0xC2
            break  # APP segments precede SOF; nothing more to learn
        if marker == 0xE1 and payload[:6] == b"Exif\x00\x00":
            orientation = _exif_orientation(payload[6:]) or orientation
        pos += seglen
    if width is None or height is None:
        return None  # SOI magic but no frame header: treat as undecodable
    if orientation >= 5:  # 5-8 are the transposed orientations
        width, height = height, width
    mean_r = mean_g = mean_b = None
    px = _jpeg_decode_pixels(b)
    if px is not None:
        import numpy as np

        _, _, raw = px
        means = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).mean(0)
        mean_r, mean_g, mean_b = (round(float(m), 3) for m in means)
    return {
        "width": width,
        "height": height,
        "mean_r": mean_r,
        "mean_g": mean_g,
        "mean_b": mean_b,
        "components": ncomp,
        "orientation": orientation,
        "progressive": progressive,
    }


def _gif_lzw(data: bytes, min_code: int, n_pixels: int) -> bytearray | None:
    """GIF-variant LZW decompress (variable code width, LSB-first bit
    order, clear/end codes) → palette-index bytes; None on a corrupt
    stream. Stops once ``n_pixels`` indices are produced."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    base = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
    table = list(base)
    out = bytearray()
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = list(base)
                width = min_code + 1
                prev = None
                continue
            if code == end:
                return out if len(out) >= n_pixels else None
            if code < len(table):
                entry = table[code]
                if not entry and prev is None:
                    return None
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                return None  # corrupt: code beyond the table
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
                # width grows when the NEXT code could index the new slot
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                return out
    return out if len(out) >= n_pixels else None


def _decode_gif(b: bytes) -> dict | None:
    """Pure-python decode of a GIF87a/89a FIRST frame: LZW decompress
    (variable-width, LSB-first), de-interlace if flagged, map palette →
    true dimensions + mean RGB. Same no-external-libs precedent as the
    PNG inflate + JPEG Huffman/IDCT decoders; animation frames beyond the
    first are ignored (the mean is the first frame's). Returns None if
    not a GIF; dims-only for streams this parser can't finish."""
    import struct

    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh, packed = struct.unpack_from("<HHB", b, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = b[pos : pos + 3 * n]
        pos += 3 * n
    out = {"width": sw, "height": sh, "mean_r": None, "mean_g": None,
           "mean_b": None}
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return out
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:  # unknown block: bail with dims
            return out
        if pos + 9 > len(b):
            return out
        _, _, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = b[pos : pos + 3 * n]
            pos += 3 * n
        if pos >= len(b) or pal is None or w == 0 or h == 0:
            return out
        min_code = b[pos]
        pos += 1
        if not (2 <= min_code <= 11):
            return out
        lzw = bytearray()
        while pos < len(b) and b[pos] != 0:
            ln = b[pos]
            lzw += b[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _gif_lzw(bytes(lzw), min_code, w * h)
        if idx is None:
            return out
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            deinter = bytearray(w * h)
            src = 0
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                for row in range(start, h, step):
                    deinter[row * w : (row + 1) * w] = idx[src : src + w]
                    src += w
            idx = deinter
        sr = sg = sb = 0
        npal = len(pal) // 3
        for i in idx[: w * h]:
            if i >= npal:
                return out
            sr += pal[3 * i]
            sg += pal[3 * i + 1]
            sb += pal[3 * i + 2]
        n = w * h
        out.update(width=w, height=h, mean_r=sr / n, mean_g=sg / n,
                   mean_b=sb / n)
        return out
    return out


def _decode_webp(b: bytes) -> dict | None:
    """WebP header decode — dimensions without any codec, covering all three
    container layouts: VP8X (extended: 24-bit canvas dims), VP8L (lossless:
    14-bit packed dims), VP8 (lossy: 14-bit dims in the keyframe header).
    Pixel means stay None. Returns None if not RIFF/WEBP."""
    if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    out = {"width": None, "height": None,
           "mean_r": None, "mean_g": None, "mean_b": None}
    four, body = b[12:16], 20
    if four == b"VP8X" and len(b) >= 30:
        w = int.from_bytes(b[24:27], "little") + 1
        h = int.from_bytes(b[27:30], "little") + 1
        out.update(width=w, height=h)
    elif four == b"VP8L" and len(b) >= 25 and b[body] == 0x2F:
        bits = int.from_bytes(b[body + 1 : body + 5], "little")
        out.update(width=(bits & 0x3FFF) + 1, height=((bits >> 14) & 0x3FFF) + 1)
    elif four == b"VP8 " and len(b) >= 30 and b[body + 3 : body + 6] == b"\x9d\x01\x2a":
        w = int.from_bytes(b[body + 6 : body + 8], "little") & 0x3FFF
        h = int.from_bytes(b[body + 8 : body + 10], "little") & 0x3FFF
        out.update(width=w, height=h)
    if out["width"] is None:
        return None  # WEBP magic but unreadable header: stay loud
    return out


def _decode_tiff(b: bytes) -> dict | None:
    """TIFF header decode (both byte orders): walk the first IFD for
    ImageWidth (256) / ImageLength (257) — dimensions without a codec
    (pixel data may be any of TIFF's many compressions, so means stay
    None, the WebP precedent). Returns None if not TIFF; None rather than
    dims-only when the IFD is unreadable (magic alone proves nothing —
    stay loud)."""
    import struct

    if len(b) < 8 or b[:4] not in (b"II*\x00", b"MM\x00*"):
        return None
    end = "<" if b[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(end + "I", b, 4)
    if ifd_off + 2 > len(b):
        return None
    (n_entries,) = struct.unpack_from(end + "H", b, ifd_off)
    w = h = None
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(b):
            break
        tag, typ, cnt = struct.unpack_from(end + "HHI", b, off)
        if tag not in (256, 257) or cnt != 1:
            continue
        if typ == 3:  # SHORT: value left-justified in the 4-byte field
            (val,) = struct.unpack_from(end + "H", b, off + 8)
        elif typ == 4:  # LONG
            (val,) = struct.unpack_from(end + "I", b, off + 8)
        else:
            continue
        if tag == 256:
            w = val
        else:
            h = val
    if w is None or h is None:
        return None
    return {"width": w, "height": h,
            "mean_r": None, "mean_g": None, "mean_b": None}


def decode_image(content: bytes, codecs: dict | None = None) -> dict:
    """Decode an image blob to {width, height, mean_r, mean_g, mean_b}.

    Real decode: uncompressed BMP 24-bit and PPM P6, PNG 8-bit RGB/RGBA
    (zlib inflate + filter reversal), and JPEG — baseline AND progressive
    (pure-python Huffman entropy decode with spectral selection +
    successive approximation, matrix IDCT, chroma upsample, YCbCr→RGB —
    the dominant web format fully decoded without a codec library).
    WebP (VP8/VP8L/VP8X headers) decodes header-true with pixel means
    None. Formats needing codec libraries (HEIC/AVIF/...) raise
    NotImplementedError via the stub — loudly, per the environment
    contract.

    ``codecs`` is the PLUGGABLE DECODER SEAM: a ``{format_name: fn}`` dict
    of ``bytes -> dict | None`` callables (None = "not my format"), tried
    in insertion order BEFORE the built-ins so a cluster user can mount
    PIL/libheif without touching engine code — e.g.
    ``{"heic": lambda b: pil_decode(b) if b[4:12] == b"ftypheic" else None}``.
    The format_name key is documentation; dispatch is each codec's own
    sniff. Executor-side requirement: the callable must be picklable (a
    module-level function or a closure over picklable state).
    """
    for parser in (
        *(codecs or {}).values(),
        _decode_bmp, _decode_ppm, _decode_png, _decode_jpeg,
        _decode_gif, _decode_webp, _decode_tiff,
    ):
        out = parser(content)
        if out is not None:
            return out
    return _decode_image_stub(content)  # raises


IMAGE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def decode_image_features(
    media: DataFrame, codecs: dict | None = None
) -> DataFrame:
    """media (MEDIA_SCHEMA) → IMAGE_DECODE_SCHEMA via ``mapInPandas``:
    TRUE decoded dimensions + mean RGB for natively-decodable formats
    (BMP/PPM), ``decoded=false`` rows (metadata dims passthrough) for
    formats whose decoder is stubbed. Same Arrow-batched shape as
    ``extract_image_features`` — one batch in memory at a time, bytes never
    on the driver. ``codecs`` (see ``decode_image``) rides into the Arrow
    workers via closure capture — injected decoders run executor-side on
    every batch, no engine change needed to mount PIL/libheif."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta_w, meta_h in zip(
                pdf["media_id"], pdf["content"], pdf["width"], pdf["height"]
            ):
                try:
                    d = decode_image(bytes(content or b""), codecs)
                    rows.append(
                        {
                            "media_id": mid,
                            "width": d["width"],
                            "height": d["height"],
                            "mean_r": d["mean_r"],
                            "mean_g": d["mean_g"],
                            "mean_b": d["mean_b"],
                            "decoded": True,
                        }
                    )
                except NotImplementedError:
                    rows.append(
                        {
                            "media_id": mid,
                            "width": meta_w,
                            "height": meta_h,
                            "mean_r": None,
                            "mean_g": None,
                            "mean_b": None,
                            "decoded": False,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_DECODE_SCHEMA])

    imgs = media.where(F.col("kind") == "image").select(
        "media_id", "content", "width", "height"
    )
    return imgs.mapInPandas(_decode, schema=IMAGE_DECODE_SCHEMA)


def _decode_wav(b: bytes) -> dict | None:
    """Pure-python decode of a RIFF/WAVE file: true sample rate, channels,
    bit depth, duration, and RMS amplitude for PCM8/PCM16 data (the two
    uncompressed layouts a header walk can handle; compressed codecs return
    format metadata with ``rms=None``). Returns None if not RIFF/WAVE."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            fmt = (audio_fmt, n_ch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        return None
    audio_fmt, n_ch, rate, bits = fmt
    out = {
        "sample_rate": rate,
        "n_channels": n_ch,
        "bits": bits,
        "duration_ms": None,
        "rms": None,
    }
    if data is None or n_ch == 0 or rate == 0 or bits == 0:
        return out
    frame_size = n_ch * (bits // 8)
    if frame_size == 0:
        return out
    n_frames = len(data) // frame_size
    out["duration_ms"] = int(n_frames * 1000 / rate)
    if audio_fmt != 1:  # not plain PCM: duration from byte math only
        return out
    if bits == 16:
        n = len(data) // 2
        samples = struct.unpack(f"<{n}h", data[: n * 2])
        scale = 32768.0
    elif bits == 8:  # PCM8 is unsigned, midpoint 128
        samples = [x - 128 for x in data]
        scale = 128.0
    else:
        return out
    if samples:
        acc = 0.0
        for s in samples:
            acc += s * s
        out["rms"] = (acc / len(samples)) ** 0.5 / scale
    return out


def _decode_flac(b: bytes) -> dict | None:
    """FLAC STREAMINFO header decode — sample rate, channels, bit depth and
    exact duration without any DSP: the mandatory first metadata block packs
    them as bitfields (rate:20, channels-1:3, bits-1:5, total_samples:36
    starting at bit 80 of the 34-byte block). Audio DATA stays compressed;
    ``rms`` is None. Returns None if the blob is not FLAC."""
    if len(b) < 42 or b[:4] != b"fLaC":
        return None
    # first metadata block header: 1 byte (last<<7 | type), 3 bytes length
    if b[4] & 0x7F != 0:  # STREAMINFO is type 0 and MUST come first
        return None
    info = b[8:42]  # 34-byte STREAMINFO body
    bits_ = int.from_bytes(info[10:18], "big")  # bytes 10..17 hold the packed tail
    rate = (bits_ >> 44) & 0xFFFFF
    n_ch = ((bits_ >> 41) & 0x7) + 1
    depth = ((bits_ >> 36) & 0x1F) + 1
    total = bits_ & 0xFFFFFFFFF
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "bits": depth,
        "duration_ms": int(total * 1000 / rate) if rate and total else None,
        "rms": None,
    }


_MP3_RATES = {0: 44100, 1: 48000, 2: 32000}  # MPEG-1; halved for MPEG-2(.5)
_MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                      224, 256, 320, 0]


def _decode_mp3(b: bytes) -> dict | None:
    """MP3 frame-header decode: sample rate / channel mode from the first
    sync frame; duration from the Xing/Info frame count when present, else
    the CBR byte-math estimate (documented approximation — a VBR file
    without Xing reports the first frame's rate). Returns None if no sync
    word is found in the first 64 KiB (after any ID3v2 tag)."""
    pos = 0
    if b[:3] == b"ID3" and len(b) > 10:  # skip ID3v2: syncsafe 28-bit size
        sz = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
        pos = 10 + sz
    end = min(len(b) - 4, pos + 65536)
    while pos <= end:
        if b[pos] == 0xFF and (b[pos + 1] & 0xE0) == 0xE0:
            break
        pos += 1
    else:
        return None
    h = int.from_bytes(b[pos : pos + 4], "big")
    version = (h >> 19) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (h >> 17) & 0x3    # 1=III
    bitrate_idx = (h >> 12) & 0xF
    rate_idx = (h >> 10) & 0x3
    mode = (h >> 6) & 0x3
    # Layer III only: the spf constants (1152/576) and the bitrate table
    # below are Layer-III-specific; Layer I (384 spf) / Layer II would get
    # wrong durations, so they fall through to the loud decode_audio stub.
    if rate_idx == 3 or layer != 1:
        return None
    rate = _MP3_RATES[rate_idx]
    if version == 2:
        rate //= 2
    elif version == 0:
        rate //= 4
    n_ch = 1 if mode == 3 else 2
    out = {
        "sample_rate": rate,
        "n_channels": n_ch,
        "bits": None,  # lossy codec: no fixed sample depth
        "duration_ms": None,
        "rms": None,
    }
    spf = 1152 if version == 3 else 576  # samples per Layer-III frame
    # Xing/Info header (VBR): sits after the side-info block, whose size
    # depends on MPEG version and channel mode
    if version == 3:
        xing_off = pos + 4 + (17 if n_ch == 1 else 32)
    else:
        xing_off = pos + 4 + (9 if n_ch == 1 else 17)
    tag = b[xing_off : xing_off + 4]
    if tag in (b"Xing", b"Info") and len(b) >= xing_off + 12:
        flags = int.from_bytes(b[xing_off + 4 : xing_off + 8], "big")
        if flags & 1:
            n_frames = int.from_bytes(b[xing_off + 8 : xing_off + 12], "big")
            out["duration_ms"] = int(n_frames * spf * 1000 / rate)
            return out
    kbps = _MP3_BITRATES_V1L3[bitrate_idx] if version == 3 and layer == 1 else 0
    if kbps:
        out["duration_ms"] = int((len(b) - pos) * 8 / (kbps * 1000) * 1000)
    return out


def decode_audio(content: bytes, codecs: dict | None = None) -> dict:
    """Decode an audio blob to {sample_rate, n_channels, bits, duration_ms,
    rms}. Real decode for RIFF/WAVE PCM8/PCM16 (including RMS); header-true
    metadata for FLAC (STREAMINFO) and MP3 (frame header + Xing). Other
    codecs (AAC/Opus/...) raise NotImplementedError (plug ffmpeg/soundfile
    there), keeping the environment contract loud. ``codecs``: injected
    ``{name: bytes -> dict | None}`` decoders tried before the built-ins —
    same pluggable seam as ``decode_image``."""
    for parser in (*(codecs or {}).values(), _decode_wav, _decode_flac,
                   _decode_mp3):
        out = parser(content)
        if out is not None:
            return out
    raise NotImplementedError(
        "non-WAV/FLAC/MP3 audio decoding is stubbed in this environment — "
        "plug ffmpeg/soundfile here (WAV PCM decodes natively; FLAC/MP3 "
        "headers parse natively)"
    )


AUDIO_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def decode_audio_features(
    media: DataFrame, codecs: dict | None = None
) -> DataFrame:
    """media (MEDIA_SCHEMA) → AUDIO_DECODE_SCHEMA via ``mapInPandas``: true
    sample rate / channels / duration / RMS for WAV PCM, ``decoded=false``
    (metadata duration passthrough) for stubbed codecs. Same Arrow-batched
    shape as the image path: one batch in memory, bytes never on the
    driver. ``codecs``: injected decoders (see ``decode_audio``)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta_dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                try:
                    d = decode_audio(bytes(content or b""), codecs)
                    rows.append(
                        {
                            "media_id": mid,
                            "sample_rate": d["sample_rate"],
                            "n_channels": d["n_channels"],
                            "bits": d["bits"],
                            "duration_ms": d["duration_ms"],
                            "rms": d["rms"],
                            "decoded": True,
                        }
                    )
                except NotImplementedError:
                    rows.append(
                        {
                            "media_id": mid,
                            "sample_rate": None,
                            "n_channels": None,
                            "bits": None,
                            "duration_ms": meta_dur,
                            "rms": None,
                            "decoded": False,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_DECODE_SCHEMA])

    auds = media.where(F.col("kind") == "audio").select(
        "media_id", "content", "duration_ms"
    )
    return auds.mapInPandas(_decode, schema=AUDIO_DECODE_SCHEMA)


def _byte_entropy(b: bytes) -> float:
    """Cheap no-decode feature: Shannon entropy of the byte histogram."""
    import math

    if not b:
        return 0.0
    counts: dict[int, int] = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    n = len(b)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def _fake_embedding(b: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a model embedding: a dim-bucket byte
    histogram, L1-normalized. Replaces the decode→model path until the
    decoder stub is filled; same shape, same determinism guarantees."""
    buckets = [0] * dim
    for x in b:
        buckets[x % dim] += 1
    total = sum(buckets) or 1
    return [float(c) / total for c in buckets]


def extract_image_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """media (MEDIA_SCHEMA) → IMAGE_FEATURE_SCHEMA via ``mapInPandas``.

    Streams Arrow batches; only image rows are processed (filter pushed
    before the Python stage so non-image bytes never cross the Arrow
    boundary)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b or b"")),
                    "byte_entropy": content.map(lambda b: _byte_entropy(b or b"")),
                    "feature": content.map(
                        lambda b: _fake_embedding(b or b"", feature_dim)
                    ),
                }
            )

    imgs = media.where(F.col("kind") == "image").select("media_id", "content")
    return imgs.mapInPandas(_extract, schema=IMAGE_FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling PLAN: explode each video into (media_id,
    frame_ts_ms) rows at a fixed cadence using only metadata — the actual
    frame extraction joins this plan against the decode stage. Pure native
    expressions; no bytes move."""
    v = media.where(F.col("kind") == "video")
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return v.select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_ts_ms"),
    )


def _avi_raw_frames(b: bytes) -> tuple[int, int, float, list[bytes]] | None:
    """(width, height, fps, frames) for an AVI whose video stream is
    UNCOMPRESSED 24-bit DIB ('00db' chunks in the movi list; bottom-up BGR
    rows like BMP, converted here to top-down RGB). Codec-compressed AVIs
    ('00dc') return an empty frame list — header metadata still flows.
    Returns None when the blob is not RIFF/AVI."""
    import struct

    d = _decode_avi(b)
    if d is None:
        return None
    w, h = d["width"], d["height"]
    frames: list[bytes] = []

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            cid = b[pos : pos + 4]
            size = struct.unpack_from("<I", b, pos + 4)[0]
            if cid == b"LIST":
                yield from walk(pos + 12, min(pos + 8 + size, hi))
            else:
                yield cid, b[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size & 1)

    row_size = ((w * 3 + 3) // 4) * 4
    for cid, body in walk(12, len(b)):
        if cid == b"00db" and len(body) >= h * row_size:
            out = bytearray(w * h * 3)
            for y in range(h):
                src = (h - 1 - y) * row_size  # DIB rows are bottom-up BGR
                row = body[src : src + w * 3]
                for x in range(w):
                    o = (y * w + x) * 3
                    out[o] = row[x * 3 + 2]
                    out[o + 1] = row[x * 3 + 1]
                    out[o + 2] = row[x * 3]
            frames.append(bytes(out))
    return w, h, d["fps"], frames


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("raw_rgb", T.BinaryType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def extract_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """EXECUTE the frame-sample plan for decodable containers: uncompressed
    AVI streams yield real top-down RGB888 rasters at the requested cadence
    (nearest frame by timestamp); codec-compressed videos yield
    ``decoded=false`` cadence rows (the plan rows of
    :func:`frame_sample_plan`, plumbing intact). Same mapInPandas shape as
    every other modality path — one Arrow batch resident, bytes never on
    the driver."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, mdur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                parsed = _avi_raw_frames(bytes(content or b""))
                if parsed is None or not parsed[3]:
                    dur = mdur if mdur and mdur > 0 else 0
                    for i, ts in enumerate(range(0, max(int(dur), 1), every_ms)):
                        rows.append(
                            {
                                "media_id": mid,
                                "frame_idx": i,
                                "frame_ts_ms": ts,
                                "width": None,
                                "height": None,
                                "raw_rgb": None,
                                "decoded": False,
                            }
                        )
                    continue
                w, h, fps, frames = parsed
                dur_ms = len(frames) / fps * 1000 if fps else 0
                for i, ts in enumerate(range(0, max(int(dur_ms), 1), every_ms)):
                    src = min(int(ts / 1000 * fps), len(frames) - 1) if fps else 0
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_ts_ms": ts,
                            "width": w,
                            "height": h,
                            "raw_rgb": frames[src],
                            "decoded": True,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    vids = media.where(F.col("kind") == "video").select(
        "media_id", "content", "duration_ms"
    )
    return vids.mapInPandas(_extract, schema=FRAME_SCHEMA)


def _decode_rgb(b: bytes) -> tuple[int, int, bytes] | None:
    """Interleaved top-down RGB888 raster for the pixel-decodable formats
    (BMP 24-bit, PPM P6, PNG 8-bit RGB/RGBA, JPEG baseline AND
    progressive). Returns None when only header metadata is available
    (WebP/...) — callers fall back to the metadata path."""
    import struct

    if b[:2] == b"\xff\xd8":
        return _jpeg_decode_pixels(b)

    if len(b) >= 54 and b[:2] == b"BM":
        data_off = struct.unpack_from("<I", b, 10)[0]
        w = struct.unpack_from("<i", b, 18)[0]
        h_raw = struct.unpack_from("<i", b, 22)[0]
        bpp = struct.unpack_from("<H", b, 28)[0]
        comp = struct.unpack_from("<I", b, 30)[0]
        h = abs(h_raw)
        row_size = ((w * 3 + 3) // 4) * 4
        if bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return None
        if len(b) < data_off + h * row_size:
            return None
        out = bytearray(w * h * 3)
        for y in range(h):
            # bottom-up storage unless height is negative
            src = data_off + ((h - 1 - y) if h_raw > 0 else y) * row_size
            row = b[src : src + w * 3]
            for x in range(w):
                o = (y * w + x) * 3
                out[o] = row[x * 3 + 2]      # R (stored B,G,R)
                out[o + 1] = row[x * 3 + 1]  # G
                out[o + 2] = row[x * 3]      # B
        return w, h, bytes(out)
    if b[:2] == b"P6":
        d = _decode_ppm(b)
        if d is None or d["mean_r"] is None:
            return None
        w, h = d["width"], d["height"]
        # re-walk the header to find the raster offset (same parse as
        # _decode_ppm, which validated it)
        pos, fields = 2, 0
        while fields < 3 and pos < len(b):
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if b[pos : pos + 1] == b"#":
                while pos < len(b) and b[pos] != 0x0A:
                    pos += 1
                continue
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            fields += 1
        pos += 1
        return w, h, bytes(b[pos : pos + w * h * 3])
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        import zlib

        d = _decode_png(b)
        if d is None or d["mean_r"] is None:
            return None
        w, h = d["width"], d["height"]
        # re-inflate (bounded: decodable PNGs already passed this walk)
        pos, ihdr, idat = 8, None, []
        while pos + 8 <= len(b):
            ln = int.from_bytes(b[pos : pos + 4], "big")
            typ = b[pos + 4 : pos + 8]
            if typ == b"IHDR":
                ihdr = b[pos + 8 : pos + 8 + ln]
            elif typ == b"IDAT":
                idat.append(b[pos + 8 : pos + 8 + ln])
            elif typ == b"IEND":
                break
            pos += 12 + ln
        bpp = 3 if ihdr[9] == 2 else 4
        px = _png_unfilter(zlib.decompress(b"".join(idat)), w, h, bpp)
        if bpp == 3:
            return w, h, bytes(px)
        out = bytearray(w * h * 3)
        for i in range(w * h):  # strip alpha
            out[i * 3 : i * 3 + 3] = px[i * 4 : i * 4 + 3]
        return w, h, bytes(out)
    return None


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("raw_rgb", T.BinaryType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def resize_to_raw(media: DataFrame, side: int = 32) -> DataFrame:
    """REAL resize: decode pixel-decodable images (BMP/PPM/PNG/baseline
    JPEG) and
    nearest-neighbor resample to a fixed ``side``×``side`` RGB888 raster —
    the normalized raw-tensor input a training pipeline feeds its image
    encoder. Formats with header-only decode emit ``decoded=false`` rows
    (plumbing intact, bytes untouched). Same mapInPandas shape as the
    other modality paths: one Arrow batch in memory, bytes never on the
    driver; output is exactly ``side²·3`` bytes per row regardless of
    input size, so downstream batches are fixed-width."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                rgb = _decode_rgb(bytes(content or b""))
                if rgb is None:
                    rows.append(
                        {
                            "media_id": mid,
                            "width": side,
                            "height": side,
                            "raw_rgb": None,
                            "decoded": False,
                        }
                    )
                    continue
                w, h, px = rgb
                out = bytearray(side * side * 3)
                for ty in range(side):
                    sy = ty * h // side
                    for tx in range(side):
                        sx = tx * w // side
                        s = (sy * w + sx) * 3
                        o = (ty * side + tx) * 3
                        out[o : o + 3] = px[s : s + 3]
                rows.append(
                    {
                        "media_id": mid,
                        "width": side,
                        "height": side,
                        "raw_rgb": bytes(out),
                        "decoded": True,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA])

    imgs = media.where(F.col("kind") == "image").select("media_id", "content")
    return imgs.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def resize_metadata(
    media: DataFrame, max_side: int = 512
) -> DataFrame:
    """Resize PLANNING as native expressions: compute target dimensions
    preserving aspect ratio (the byte-level resample happens in the decode
    stage). Filterable without touching content."""
    w, h = F.col("width"), F.col("height")
    scale = F.when(
        (w > 0) & (h > 0), F.least(F.lit(1.0), max_side / F.greatest(w, h))
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
        (scale < 1.0).alias("needs_resize"),
    )


def _decode_avi(b: bytes) -> dict | None:
    """Pure-python decode of a RIFF/AVI container: true width, height, frame
    count, and fps from the MainAVIHeader ('avih' inside LIST hdrl) — the
    same header-walk approach as the WAV path, one level of LIST recursion
    deeper. Frame DATA stays codec-compressed (that decode is stubbed);
    dimensions/cadence are what the frame-sample planner needs. Returns
    None if the blob is not RIFF/AVI."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            cid = b[pos : pos + 4]
            size = struct.unpack_from("<I", b, pos + 4)[0]
            if cid == b"LIST":
                yield from walk(pos + 12, min(pos + 8 + size, hi))
            else:
                yield cid, b[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size & 1)  # word-aligned

    for cid, body in walk(12, len(b)):
        if cid == b"avih" and len(body) >= 40:
            us_per_frame, _, _, _, n_frames = struct.unpack_from("<5I", body, 0)
            w, h = struct.unpack_from("<II", body, 32)
            fps = 1_000_000.0 / us_per_frame if us_per_frame else None
            dur = (
                int(n_frames * us_per_frame / 1000)
                if us_per_frame and n_frames
                else None
            )
            return {
                "width": w,
                "height": h,
                "n_frames": n_frames,
                "fps": fps,
                "duration_ms": dur,
            }
    return None


def _decode_mp4(b: bytes) -> dict | None:
    """MP4 / ISO-BMFF header decode — metadata-true WITHOUT any codec: box
    walk to ``moov/mvhd`` (movie timescale + duration), each ``trak``'s
    ``tkhd`` (16.16 fixed-point display dimensions), ``hdlr`` (handler type,
    to pick the video track) and ``stbl/stsz`` (sample count = frame count).
    Frame DATA stays codec-compressed; dimensions/duration/cadence — what a
    frame-sample planner or corpus filter needs — are exact. Returns None if
    the blob has no leading ``ftyp`` box."""
    import struct

    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    containers = {b"moov", b"mdia", b"minf", b"stbl"}

    def boxes(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            size = struct.unpack_from(">I", b, pos)[0]
            body = pos + 8
            typ = b[pos + 4 : pos + 8]
            if size == 1:  # 64-bit largesize
                if pos + 16 > hi:
                    return
                size = struct.unpack_from(">Q", b, pos + 8)[0]
                body = pos + 16
            elif size == 0:  # box extends to end of enclosing scope
                size = hi - pos
            if size < 8 or pos + size > hi:
                return
            yield typ, body, pos + size
            pos += size

    timescale = duration = None
    traks: list[dict] = []

    def parse_trak(lo: int, hi: int, info: dict) -> dict:
        for typ, body, end in boxes(lo, hi):
            if typ in containers:
                parse_trak(body, end, info)
            elif typ == b"tkhd" and body < len(b):
                ver = b[body]
                off = body + 4 + (32 if ver == 1 else 20) + 52
                if off + 8 <= end:
                    info["w"] = int(struct.unpack_from(">I", b, off)[0] / 65536)
                    info["h"] = int(
                        struct.unpack_from(">I", b, off + 4)[0] / 65536
                    )
            elif typ == b"hdlr" and body + 12 <= end:
                info["handler"] = b[body + 8 : body + 12]
            elif typ == b"stsz" and body + 12 <= end:
                info["n_samples"] = struct.unpack_from(">I", b, body + 8)[0]
        return info

    def walk(lo: int, hi: int) -> None:
        nonlocal timescale, duration
        for typ, body, end in boxes(lo, hi):
            if typ == b"moov":
                walk(body, end)
            elif typ == b"mvhd" and body < len(b):
                ver = b[body]
                if ver == 1:
                    timescale = struct.unpack_from(">I", b, body + 20)[0]
                    duration = struct.unpack_from(">Q", b, body + 24)[0]
                elif body + 20 <= end:
                    timescale = struct.unpack_from(">I", b, body + 12)[0]
                    duration = struct.unpack_from(">I", b, body + 16)[0]
            elif typ == b"trak":
                traks.append(parse_trak(body, end, {}))

    walk(0, len(b))
    if timescale is None and not traks:
        return None  # ftyp magic but no moov metadata: treat as undecodable
    vt = next((t for t in traks if t.get("handler") == b"vide"), None)
    if vt is None:
        vt = next((t for t in traks if t.get("w")), {})
    secs = duration / timescale if timescale and duration is not None else None
    n_frames = vt.get("n_samples")
    return {
        "width": vt.get("w"),
        "height": vt.get("h"),
        "n_frames": n_frames,
        "fps": (n_frames / secs) if n_frames and secs else None,
        "duration_ms": int(secs * 1000) if secs is not None else None,
    }


def _decode_mkv(b: bytes) -> dict | None:
    """MKV/WebM header decode — a minimal EBML walk: Segment → Info
    (TimestampScale, Duration) and Tracks → TrackEntry → Video
    (PixelWidth/PixelHeight). Variable-length ids keep their marker bit,
    sizes strip it — the two varint flavors of EBML. Frame DATA stays
    codec-compressed; ``n_frames``/``fps`` are not in the header (they live
    in Cues/Clusters) and stay None. Returns None if the blob has no EBML
    magic."""
    if len(b) < 8 or b[:4] != b"\x1a\x45\xdf\xa3":
        return None

    def vint(pos: int, keep_marker: bool):
        if pos >= len(b):
            return None
        first = b[pos]
        if first == 0:
            return None
        length = 1
        while not first & (0x80 >> (length - 1)):
            length += 1
        if pos + length > len(b):
            return None
        val = first if keep_marker else first & ((0x80 >> (length - 1)) - 1)
        for i in range(1, length):
            val = (val << 8) | b[pos + i]
        return val, pos + length

    MASTERS = {0x18538067, 0x1549A966, 0x1654AE6B, 0xAE, 0xE0}
    found: dict = {}

    def walk(lo: int, hi: int) -> None:
        pos = lo
        while pos < hi:
            r = vint(pos, True)
            if r is None:
                return
            eid, pos = r
            r = vint(pos, False)
            if r is None:
                return
            size, pos = r
            end = min(pos + size, hi)
            if eid in MASTERS:
                walk(pos, end)
            elif eid == 0x2AD7B1:  # TimestampScale (ns per tick)
                found["scale"] = int.from_bytes(b[pos:end], "big")
            elif eid == 0x4489:  # Duration (float, in ticks)
                import struct

                if size == 4:
                    found["dur"] = struct.unpack(">f", b[pos:end])[0]
                elif size == 8:
                    found["dur"] = struct.unpack(">d", b[pos:end])[0]
            elif eid == 0xB0:  # PixelWidth
                found.setdefault("w", int.from_bytes(b[pos:end], "big"))
            elif eid == 0xBA:  # PixelHeight
                found.setdefault("h", int.from_bytes(b[pos:end], "big"))
            pos = end

    walk(0, len(b))
    if not found:
        return None  # EBML magic but nothing readable: stay loud
    scale = found.get("scale", 1_000_000)  # spec default: 1 ms ticks
    dur = found.get("dur")
    return {
        "width": found.get("w"),
        "height": found.get("h"),
        "n_frames": None,
        "fps": None,
        "duration_ms": int(dur * scale / 1_000_000) if dur is not None else None,
    }


def decode_video(content: bytes, codecs: dict | None = None) -> dict:
    """Decode a video blob to {width, height, n_frames, fps, duration_ms}.
    Real container parse for RIFF/AVI, MP4/ISO-BMFF (box walk — the
    dominant real-corpus container) and MKV/WebM (EBML walk), all
    header-true with no codec; anything else raises NotImplementedError
    (plug ffmpeg there), keeping the environment contract loud. ``codecs``:
    injected ``{name: bytes -> dict | None}`` decoders tried before the
    built-ins — same pluggable seam as ``decode_image``; mount ffmpeg/PyAV
    here for frame-accurate n_frames/fps on codec formats."""
    for parser in (*(codecs or {}).values(), _decode_avi, _decode_mp4,
                   _decode_mkv):
        out = parser(content)
        if out is not None:
            return out
    raise NotImplementedError(
        "unrecognized-container video decoding is stubbed in this "
        "environment — plug ffmpeg/PyAV here (AVI, MP4 and MKV/WebM "
        "headers parse natively)"
    )


VIDEO_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def decode_video_features(
    media: DataFrame, codecs: dict | None = None
) -> DataFrame:
    """media (MEDIA_SCHEMA) → VIDEO_DECODE_SCHEMA via ``mapInPandas``: true
    container dimensions/cadence for AVI, ``decoded=false`` metadata
    passthrough for stubbed containers — the same Arrow-batched shape as
    the image/audio paths, so all three modalities share one plumbing
    pattern (reference has none of this; engine-added surface).
    ``codecs``: injected decoders (see ``decode_video``)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, mw, mh, mdur in zip(
                pdf["media_id"], pdf["content"], pdf["width"],
                pdf["height"], pdf["duration_ms"],
            ):
                try:
                    d = decode_video(bytes(content or b""), codecs)
                    rows.append(
                        {
                            "media_id": mid,
                            "width": d["width"],
                            "height": d["height"],
                            "n_frames": d["n_frames"],
                            "fps": d["fps"],
                            "duration_ms": d["duration_ms"],
                            "decoded": True,
                        }
                    )
                except NotImplementedError:
                    rows.append(
                        {
                            "media_id": mid,
                            "width": mw,
                            "height": mh,
                            "n_frames": None,
                            "fps": None,
                            "duration_ms": mdur,
                            "decoded": False,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_DECODE_SCHEMA])

    vids = media.where(F.col("kind") == "video").select(
        "media_id", "content", "width", "height", "duration_ms"
    )
    return vids.mapInPandas(_decode, schema=VIDEO_DECODE_SCHEMA)
