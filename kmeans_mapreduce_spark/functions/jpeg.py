"""Minimal baseline JPEG (ITU T.81) codec — pure Python + numpy.

Why this exists: the multimodal pipeline's video column supports real
UNCOMPRESSED RIFF/AVI (``multimodal._decode_avi``); the honest next
step past it is MJPEG — an AVI whose frame chunks are baseline JPEGs —
which needs an actual JPEG entropy/DCT decode. This container has no
codec packages (no PIL/pyav/ffmpeg), so the decode is implemented here
from the public spec, stdlib + numpy only.

Decoder (:func:`decode_baseline_jpeg`): a GENERIC baseline sequential
decoder — parses SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS from the stream
(arbitrary quantization + Huffman tables, restart markers honored),
entropy-decodes with byte-unstuffing, dequantizes, inverse-zigzags,
8×8 IDCT via an orthonormal DCT matrix multiply, JFIF YCbCr→RGB for
3-component scans. Sampling is fully general for integer ratios: MCUs
carry Hi×Vi blocks per component, subsampled planes decode at their
own resolution and are nearest-neighbor upsampled — so real-world
4:2:0 and 4:2:2 files decode, not just 4:4:4/grayscale. Progressive
(SOF2) and other non-baseline frames raise ``ValueError`` with the
exact unsupported feature named — degrade-don't-die callers turn that
into ``decoded=false`` rows.

Encoder (:func:`encode_baseline_jpeg`): a fixture generator for tests
and synthetic corpora — 4:4:4 (or grayscale) with ALL-ONES
quantization tables (near-lossless: roundtrip error comes only from
the RGB↔YCbCr rounding and float DCT, ≤ ~2/255 per channel) and
simple fixed-length Huffman tables declared in the DHT segment (valid
canonical codes; the decoder reads whatever DHT declares, so
spec-standard Annex-K tables in real files decode identically).

Reference parity note: the reference engine has no media path at all —
this extends SURVEY §2's LLM-pipeline surface (multimodal decode),
not a reference operator.
"""

from __future__ import annotations

import struct

import numpy as np

# Hard ceiling on the decoder's estimated PEAK working set (decode
# planes + upsample copies + the YCbCr→RGB float64 temporaries — see
# the budget computation in _decode_scan; ~15×8 B/px for 4:4:4 color).
# 2 GiB decodes a ~17 MP color image — above any corpus image this
# pipeline handles — while a hostile SOF claiming 65500×65500 (~500 GB
# peak) is refused up-front instead of taking the executor down.
# Module-level so a cluster deployment with genuinely huge scans can
# raise it.
MAX_DECODE_PLANE_BYTES = 2 << 30

# zigzag scan order: ZIGZAG[k] = raster index of the k-th scanned coeff
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix C: forward = C @ B @ C.T."""
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    C *= np.sqrt(2.0 / 8.0)
    C[0, :] *= np.sqrt(0.5)
    return C


_C = _dct_matrix()


# ---------------------------------------------------------------- bits
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing inside entropy-coded data
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker (0xFF followed by non-zero, non-RST)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        if p >= len(d):
            raise ValueError("JPEG entropy data truncated")
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt == 0x00:
                self.pos = p + 2  # stuffed 0xFF data byte
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # real marker (EOI etc.) — no more entropy bits; the
                # spec pads the tail with 1s, so synthesize them
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Drop partial byte and consume an RST marker (after a
        restart interval)."""
        self.nbits = 0
        d, p = self.data, self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        if p + 1 < len(d) and 0xD0 <= d[p + 1] <= 0xD7:
            p += 2
        self.pos = p


class _RestartMarker(ValueError):
    """An RST marker reached mid-entropy-read. With restart intervals
    consumed proactively (``align_to_marker`` before each interval)
    this only fires on corrupt streams, so it doubles as the
    malformed-stream ValueError callers already handle."""

    def __init__(self, marker: int) -> None:
        super().__init__(f"unexpected restart marker {marker:#x} mid-MCU")
        self.marker = marker


# ------------------------------------------------------------- huffman
class _HuffTable:
    """Canonical JPEG Huffman table from the DHT (BITS, HUFFVAL)."""

    def __init__(self, bits: list[int], values: list[int]) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                k += 1
                code += 1
            code <<= 1
        self.bits = bits
        self.values = values
        # encoder view: symbol -> (code, length)
        self.enc: dict[int, tuple[int, int]] = {
            v: (c, l) for (l, c), v in self.lookup.items()
        }

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude decode (T.81 F.2.2.1 EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# encoder's simple tables: every DC category at 8 bits, every AC
# (run, size) symbol at 12 bits — valid canonical codes; bulkier than
# Annex K but unambiguous and trivially correct.
_ENC_DC_BITS = [0] * 16
_ENC_DC_BITS[7] = 12  # 12 symbols, all length 8
_ENC_DC_VALUES = list(range(12))
_ENC_AC_BITS = [0] * 16
_ENC_AC_BITS[10] = 128  # symbols 0x00-0x7f at length 11
_ENC_AC_BITS[11] = 128  # symbols 0x80-0xff at length 12 (BITS is u8,
_ENC_AC_VALUES = list(range(256))  # so 256 can't share one length)


# ------------------------------------------------------------- encoder
def _edge_pad(pl: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Pad a plane to (rows, cols) by replicating the last row/col."""
    h, w = pl.shape
    p = np.empty((rows, cols))
    p[:h, :w] = pl
    p[h:, :w] = pl[h - 1 : h, :]
    p[:, w:] = p[:, w - 1 : w]
    return p


def encode_baseline_jpeg(
    width: int, height: int, content: bytes, subsample: bool = False
) -> bytes:
    """Encode RGB24 (len == 3*w*h) or grayscale (len == w*h) content as
    a baseline JPEG with all-ones quant tables. Default 4:4:4 (or
    single-component) is near-lossless by construction — the test
    fixture and MJPEG frame generator. ``subsample=True`` (RGB only)
    emits real 4:2:0: chroma box-averaged 2×2, Y at sampling 2×2 —
    the layout virtually every camera/ffmpeg JPEG uses, kept here so
    the decoder's general MCU walk is exercised by files this module
    itself can produce."""
    n = width * height
    if len(content) == 3 * n:
        rgb = np.frombuffer(content, np.uint8).reshape(height, width, 3)
        rgb = rgb.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    elif len(content) == n:
        if subsample:
            raise ValueError("subsample=True needs RGB content")
        planes = [
            np.frombuffer(content, np.uint8)
            .reshape(height, width)
            .astype(np.float64)
        ]
    else:
        raise ValueError(
            f"content is {len(content)} bytes; want {3 * n} (RGB) or {n} (gray)"
        )
    ncomp = len(planes)
    if subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
        # 2×2 box-average chroma at even-padded geometry
        for ci in (1, 2):
            p = _edge_pad(
                planes[ci], (height + 1) // 2 * 2, (width + 1) // 2 * 2
            )
            planes[ci] = (
                p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
            ) / 4.0
    else:
        samp = [(1, 1)] * ncomp
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: 8-bit table 0, all ones (near-lossless)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
    for cid in range(1, ncomp + 1):
        hi, vi = samp[cid - 1]
        out += struct.pack("BBB", cid, (hi << 4) | vi, 0)
    # DHT: DC table 0 and AC table 0 (shared by all components)
    dc_tbl = _HuffTable(_ENC_DC_BITS, _ENC_DC_VALUES)
    ac_tbl = _HuffTable(_ENC_AC_BITS, _ENC_AC_VALUES)
    dht = b"\x00" + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALUES)
    dht += b"\x10" + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALUES)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        out += struct.pack("BB", cid, 0x00)
    out += b"\x00\x3f\x00"

    bw = _BitWriter()
    bw_pred = [0] * ncomp
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    padded = [
        _edge_pad(pl, mcuy * vi * 8, mcux * hi * 8)
        for pl, (hi, vi) in zip(planes, samp)
    ]

    def emit_block(ci: int, block: np.ndarray) -> None:
        coeffs = _C @ (block - 128.0) @ _C.T
        q = np.rint(coeffs).astype(np.int64)  # quant table = 1
        zz = q.flatten()[ZIGZAG]
        diff = int(zz[0]) - bw_pred[ci]
        bw_pred[ci] = int(zz[0])
        t = _category(diff)
        code, ln = dc_tbl.enc[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            if k > last_nz:
                break
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tbl.enc[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            t = _category(v)
            code, ln = ac_tbl.enc[(run << 4) | t]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << t) - 1, t)
            run = 0
        if last_nz < 63:
            code, ln = ac_tbl.enc[0x00]  # EOB
            bw.write(code, ln)

    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hi, vi = samp[ci]
                for byy in range(vi):
                    for bxx in range(hi):
                        y0 = (my * vi + byy) * 8
                        x0 = (mx * hi + bxx) * 8
                        emit_block(
                            ci, padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder
def decode_baseline_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline sequential JPEG. Returns
    ``(width, height, n_components, content)`` where content is RGB24
    (3 components, JFIF YCbCr→RGB) or grayscale bytes (1 component).
    Any integer sampling layout decodes (4:4:4, 4:2:0, 4:2:2, …);
    progressive scans (SOF2) and other non-baseline frame types raise
    ``ValueError`` naming the feature. EVERY malformed stream raises
    ``ValueError`` — truncated segments, missing tables, and bad
    references surface as struct/index/key errors internally and are
    translated here, so degrade-don't-die callers need to catch one
    exception type only (fuzz-tested against mutated streams).
    ``MemoryError`` is deliberately NOT translated: with the
    ``MAX_DECODE_PLANE_BYTES`` allocation cap, declared geometry can no
    longer cause one, so a MemoryError here means genuine executor
    memory exhaustion — degrade-don't-die callers must surface that,
    not drop the row as \"malformed\"."""
    try:
        return _decode_baseline_jpeg_inner(data)
    except (struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(f"malformed JPEG stream: {e!r}") from e


def _decode_baseline_jpeg_inner(data: bytes) -> tuple[int, int, int, bytes]:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    restart_interval = 0
    frame = None  # (h, w, comps) comps: list of (cid, qt_id)
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker byte at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: fill bytes before a marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # parameterless markers (TEM, RSTn, stray SOI): no length
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG header")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i : i + 64], np.uint8).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(
                        seg[i : i + 128], ">u2"
                    ).astype(np.int64)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                values = list(seg[i + 17 : i + 17 + nvals])
                huff[(tc, th)] = _HuffTable(bits, values)
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            comps = []
            for c in range(nc):
                cid, sampling, tq = seg[6 + 3 * c : 9 + 3 * c]
                hi, vi = sampling >> 4, sampling & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"bad sampling factors {sampling:#x} for "
                        f"component {cid}"
                    )
                comps.append((cid, hi, vi, tq))
            # integer upsampling ratios only (every real-world file)
            hmax = max(hi for _, hi, _, _ in comps)
            vmax = max(vi for _, _, vi, _ in comps)
            for cid, hi, vi, _ in comps:
                if hmax % hi or vmax % vi:
                    raise ValueError(
                        f"non-integer sampling ratio for component {cid} "
                        f"({hi}x{vi} vs max {hmax}x{vmax})"
                    )
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(only baseline sequential SOF0 is implemented)"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cid, tbls = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tbls >> 4, tbls & 0xF)
            return _decode_scan(
                data, pos + 2 + seglen, frame, qt, huff, scan_tables,
                restart_interval,
            )
        # APPn/COM/others: skip
        pos += 2 + seglen
    raise ValueError("no SOS marker — not a decodable JPEG stream")


def _decode_scan(data, pos, frame, qt, huff, scan_tables, restart_interval):
    """Interleaved baseline scan, general sampling: each MCU carries
    Hi×Vi blocks per component (so 4:2:0 = 4 Y + Cb + Cr per 16×16 px
    MCU); subsampled planes are decoded at their own resolution and
    nearest-neighbor upsampled by the integer (Hmax/Hi, Vmax/Vi)
    ratio before color conversion."""
    h, w, comps = frame
    ncomp = len(comps)
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # GEOMETRY SANITY: every 8×8 block costs ≥2 entropy bits (one DC
    # code + one EOB), so declared dimensions the stream cannot
    # possibly encode are a corrupt/hostile header — refuse BEFORE the
    # O(h·w) allocation (a flipped SOF byte can claim 65500×65500 →
    # ~34 GB of plane + a CPU-hour of MCU loop otherwise).
    blocks_per_mcu = sum(hi * vi for _, hi, vi, _ in comps)
    min_bits = mcux * mcuy * blocks_per_mcu * 2
    if min_bits > 8 * max(0, len(data) - pos):
        raise ValueError(
            f"declared geometry {w}x{h} needs ≥{min_bits // 8} entropy "
            f"bytes but only {max(0, len(data) - pos)} remain — corrupt "
            "SOF dimensions"
        )
    # ABSOLUTE ALLOCATION CAP: the entropy bound above is relative
    # (2 bits/block ≈ 0.25 B per 64 px vs 8 B/px of float64 plane →
    # ~2048× amplification still possible: a 10 MB hostile stream can
    # claim geometry needing ~20 GB of working set and pass it). Cap
    # the decoder's PEAK working set — not just the decode planes: the
    # tail of this function upsamples subsampled planes to full padded
    # geometry (np.repeat copies, originals pinned by views) and the
    # YCbCr→RGB conversion fills a 3-plane RGB cube. The conversion is
    # allocation-disciplined (channels written into the preallocated
    # cube one 1-plane temp at a time, cb/cr copied then their padded
    # buffers released, rint/clip in-place), so the live set tops out
    # at ~7–8 full-geometry float64 planes for color (3 pinned padded
    # planes + 3-plane cube + 1 temp + upsample transients) and ~2 for
    # grayscale. Budget = decode planes + 12× (color) / 2× (grayscale)
    # padded full plane bounds that end-to-end peak with margin, so
    # declared geometry alone can never exhaust executor memory within
    # the cap — and MemoryError stays a real signal (it is NOT
    # translated to ValueError; degrade-don't-die callers must not
    # silently drop rows on genuine executor memory pressure).
    full_plane = (mcuy * vmax * 8) * (mcux * hmax * 8) * 8
    plane_bytes = sum(
        (mcuy * vi * 8) * (mcux * hi * 8) * 8 for _, hi, vi, _ in comps
    )
    peak_bytes = plane_bytes + (12 if ncomp > 1 else 2) * full_plane
    if peak_bytes > MAX_DECODE_PLANE_BYTES:
        raise ValueError(
            f"declared geometry {w}x{h} needs ~{peak_bytes} decode peak "
            f"bytes (planes + upsample/RGB working set) > cap "
            f"{MAX_DECODE_PLANE_BYTES} — raise "
            "jpeg.MAX_DECODE_PLANE_BYTES to decode images this large"
        )
    planes = [
        np.empty((mcuy * vi * 8, mcux * hi * 8)) for _, hi, vi, _ in comps
    ]
    br = _BitReader(data, pos)
    preds = [0] * ncomp
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align_to_marker()
                preds = [0] * ncomp
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                dc_id, ac_id = scan_tables[cid]
                dc = huff[(0, dc_id)]
                ac = huff[(1, ac_id)]
                for byy in range(vi):
                    for bxx in range(hi):
                        zz = np.zeros(64, np.int64)
                        t = dc.decode(br)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = ac.decode(br)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError(
                                        f"bad AC symbol {sym:#x}"
                                    )
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        block = np.zeros(64, np.int64)
                        block[ZIGZAG] = zz * qt[tq]
                        spatial = (
                            _C.T @ block.reshape(8, 8).astype(np.float64) @ _C
                        )
                        y0 = (my * vi + byy) * 8
                        x0 = (mx * hi + bxx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial + 128.0
            mcu += 1
    # upsample subsampled planes to full geometry, then crop
    full = []
    for (cid, hi, vi, tq), p in zip(comps, planes):
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    planes = full
    if ncomp == 1:
        gray = np.rint(planes[0])
        del planes, full  # release the padded decode buffer
        np.clip(gray, 0.0, 255.0, out=gray)
        return w, h, 1, gray.astype(np.uint8).tobytes()
    if ncomp != 3:
        raise ValueError(f"unsupported component count {ncomp}")
    # Allocation-disciplined YCbCr→RGB (keeps the decode inside the
    # 12×full_plane budget asserted above): channel math is written
    # into the preallocated cube with at most one 1-plane temporary
    # live, each source plane is dropped as soon as it is consumed,
    # and rint/clip run in-place. Evaluation order per channel matches
    # the previous expression form bit-for-bit:
    #   r = y + 1.402·cr; g = (y − 0.344136·cb) − 0.714136·cr;
    #   b = y + 1.772·cb.
    y, cb, cr = planes
    del planes, full
    cb = cb - 128.0  # rebind: exact (h,w) copy, padded buffer released
    cr = cr - 128.0
    rgb = np.empty((h, w, 3))
    rgb[:, :, 0] = y
    rgb[:, :, 0] += 1.402 * cr
    rgb[:, :, 1] = y
    rgb[:, :, 1] -= 0.344136 * cb
    rgb[:, :, 1] -= 0.714136 * cr
    rgb[:, :, 2] = y
    del y
    rgb[:, :, 2] += 1.772 * cb
    del cb, cr
    np.rint(rgb, out=rgb)
    np.clip(rgb, 0.0, 255.0, out=rgb)
    return w, h, 3, rgb.astype(np.uint8).tobytes()
